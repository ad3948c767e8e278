"""Deterministic rule-based NP-chunk mention detector.

Stands in for the reference's spaCy ``noun_chunks`` mention generator
(reference ``src/deepex/data/np.py:6-68``) — spaCy is not available in this
environment, and SURVEY.md §7.0 pins goldens against this deterministic
provider. Output contract matches the reference's mentions dict: candidate
surface strings + char positions ``[start_char, end_char)`` within the
sentence (``np.py:26-27``), later shifted to doc level by the alignment
stage (``re_data.py:235-236``).

Rules (pure function of the sentence text):
* pronouns (the reference's ``re_pronouns`` list, ``text_handler.py:14-18``)
  form single-token chunks;
* an optional determiner followed by a run of content tokens forms a chunk;
  runs longer than ``max_np_len`` content tokens are split into consecutive
  chunks of at most ``max_np_len`` (spaCy chunks are short; this also bounds
  kernel cost on pathological unpunctuated text);
* stop tokens (aux/verbs/prepositions/conjunctions/punctuation/digit-only)
  break chunks and are never part of one, except determiners which may only
  *lead* a chunk.
"""

from __future__ import annotations

PRONOUNS = {
    "he", "we", "you", "she", "it", "they",
    "me", "us", "him", "her", "them",
    "my", "our", "your", "his", "their", "its",
    "mine", "ours", "yours", "hers", "theirs",
    "myself", "ourselves", "yourself", "herself", "himself", "themselves", "itself",
    "i",
}

DETERMINERS = {"the", "a", "an", "this", "that", "these", "those", "some", "any",
               "each", "every", "no", "another", "such"}

STOP = {
    # auxiliaries / copulas
    "is", "am", "are", "was", "were", "be", "been", "being",
    "has", "have", "had", "having", "do", "does", "did", "doing",
    "will", "would", "can", "could", "may", "might", "must", "shall", "should",
    # common verbs that appear in relation position
    "said", "says", "say", "born", "made", "make", "makes", "called", "calls",
    "located", "founded", "used", "uses", "use", "known", "became", "become",
    "served", "serves", "won", "wrote", "written", "works", "worked", "work",
    "lives", "lived", "live", "died", "joined", "led", "leads", "holds", "held",
    "includes", "included", "include", "produced", "produces", "directed",
    "married", "plays", "played", "play", "runs", "ran", "moved", "went", "goes", "go",
    # prepositions / particles
    "of", "in", "on", "at", "by", "for", "with", "from", "to", "as", "into",
    "onto", "over", "under", "about", "after", "before", "between", "during",
    "through", "against", "among", "within", "without", "upon", "near", "off",
    "up", "down", "out",
    # conjunctions / misc function words
    "and", "or", "but", "nor", "so", "yet", "if", "then", "than", "because",
    "while", "when", "where", "which", "who", "whom", "whose", "what", "how",
    "there", "here", "also", "not", "only", "both", "either", "neither",
    "more", "most", "less", "least", "very", "too", "now", "just", "still",
}


def _is_word(tok: str) -> bool:
    return any(c.isalnum() for c in tok)


def _verbish(tok: str) -> bool:
    """Lowercase -ed/-ing forms are treated as verbs (chunk breakers);
    capitalized words (proper nouns like 'United') are exempt."""
    return (
        tok[:1].islower()
        and len(tok) > 4
        and (tok.endswith("ed") or tok.endswith("ing"))
    )


def np_chunks(
    sent_tokens: list[tuple[str, int, int]], text: str, max_np_len: int = 3
) -> list[tuple[str, int, int]]:
    """``sent_tokens`` = [(token, start, end)] from basic tokenization of the
    sentence text. Returns [(surface, start_char, end_char)] mention chunks.
    """
    chunks: list[tuple[int, int]] = []  # (first_tok_idx, last_tok_idx)
    n = len(sent_tokens)
    i = 0
    while i < n:
        tok, s, e = sent_tokens[i]
        low = tok.lower()
        if not _is_word(tok) or low in STOP or _verbish(tok):
            i += 1
            continue
        if low in PRONOUNS and low not in DETERMINERS:
            chunks.append((i, i))
            i += 1
            continue
        det = i if low in DETERMINERS else None
        j = i + 1 if det is not None else i
        # collect the content run
        run: list[int] = []
        while j < n:
            t2 = sent_tokens[j][0]
            l2 = t2.lower()
            if not _is_word(t2) or l2 in STOP or l2 in DETERMINERS or _verbish(t2) or (
                l2 in PRONOUNS and not run
            ):
                break
            # don't span wide whitespace gaps (length-preserving paren
            # blanking leaves space runs; a chunk must stay contiguous text)
            prev_end = sent_tokens[j - 1][2] if j > 0 else sent_tokens[j][1]
            if sent_tokens[j][1] - prev_end > 2:
                break
            run.append(j)
            j += 1
        if not run:
            if det is None:
                # single content token at i (the while above starts at j=i)
                i += 1
            else:
                i = j if j > i else i + 1
            continue
        # split long runs into consecutive chunks of max_np_len
        start_idx = 0
        first_chunk = True
        while start_idx < len(run):
            grp = run[start_idx : start_idx + max_np_len]
            lead = det if (first_chunk and det is not None) else grp[0]
            chunks.append((lead, grp[-1]))
            first_chunk = False
            start_idx += max_np_len
        i = j
    out = []
    for a, b in chunks:
        s = sent_tokens[a][1]
        e = sent_tokens[b][2]
        out.append((text[s:e], s, e))
    return out
