"""Keyword (alias) matching + rule lemmatizer — flashtext/spaCy stand-ins.

Re-creates the semantics of the reference's alias matchers
(``scripts/rc/string_matcher.py``):

* ``KeywordTrie``: case-insensitive, word-boundary, NON-overlapping,
  LONGEST-match keyword extraction with char spans — flashtext
  ``KeywordProcessor.extract_keywords(span_info=True)`` behaviour.
* ``lemmatize_with_spans``: deterministic rule lemmatizer producing the
  lemmatized string plus the new-span -> old-span table (``ns2os``) used to
  map matches on the lemmatized text back to raw char spans
  (``string_matcher.py:25-55``). spaCy's statistical lemmatizer is replaced
  by suffix rules + an exception table (deterministic provider, SURVEY.md
  §7.0).
"""

from __future__ import annotations

import re

_WORD = re.compile(r"\S+")

_LEMMA_EXCEPTIONS = {
    "is": "be", "are": "be", "was": "be", "were": "be", "been": "be",
    "am": "be", "being": "be",
    "has": "have", "had": "have", "having": "have",
    "does": "do", "did": "do", "done": "do", "doing": "do",
    "said": "say", "says": "say",
    "made": "make", "went": "go", "gone": "go", "goes": "go",
    "wrote": "write", "written": "write",
    "won": "win", "ran": "run", "led": "lead", "held": "hold",
    "became": "become", "founded": "found", "born": "bear",
    "children": "child", "men": "man", "women": "woman", "people": "person",
    "mice": "mouse", "feet": "foot", "teeth": "tooth",
    "better": "good", "best": "good", "worse": "bad", "worst": "bad",
}

_VOWELS = set("aeiou")


def lemma(word: str) -> str:
    """Deterministic lowercase lemma by exception table + suffix rules."""
    w = word.lower()
    if w in _LEMMA_EXCEPTIONS:
        return _LEMMA_EXCEPTIONS[w]
    if len(w) > 4 and w.endswith("ies"):
        return w[:-3] + "y"
    if len(w) > 3 and w.endswith(("ches", "shes", "xes", "sses", "zes")):
        return w[:-2]
    if len(w) > 3 and w.endswith("s") and not w.endswith(("ss", "us", "is")):
        return w[:-1]
    if len(w) > 4 and w.endswith("ing"):
        stem = w[:-3]
        if len(stem) > 2 and stem[-1] == stem[-2]:  # running -> run
            stem = stem[:-1]
        return stem if stem else w
    if len(w) > 3 and w.endswith("ed"):
        stem = w[:-2]
        if len(stem) > 2 and stem[-1] == stem[-2]:  # stopped -> stop
            stem = stem[:-1]
        return stem if stem else w
    return w


def lemmatize_with_spans(text: str):
    """-> (lemmatized_text, ns2os) where ns2os[i] = [new_span, old_span]
    per token, spans as [start, end) (string_matcher.py:29-42 contract:
    lemmas joined by single spaces)."""
    result = []
    ns2os = []
    offset = -1
    for m in _WORD.finditer(text):
        word = lemma(m.group())
        result.append(word)
        new_span = [offset + 1, offset + 1 + len(word)]
        old_span = [m.start(), m.end()]
        ns2os.append([new_span, old_span])
        offset += 1 + len(word)
    return " ".join(result), ns2os


class KeywordTrie:
    """Word-level trie; longest non-overlapping case-insensitive matches."""

    __slots__ = ("root",)
    _END = "\0"

    def __init__(self, keywords=()):
        self.root: dict = {}
        for k in keywords:
            self.add(k)

    def add(self, keyword: str) -> None:
        words = keyword.lower().split()
        if not words:
            return
        node = self.root
        for w in words:
            node = node.setdefault(w, {})
        node[self._END] = keyword.lower()

    def extract(self, text: str):
        """-> [(keyword, start_char, end_char)] — longest match wins, the
        scan resumes after each match (flashtext semantics)."""
        tokens = [(m.group().lower(), m.start(), m.end()) for m in _WORD.finditer(text)]
        out = []
        i = 0
        n = len(tokens)
        while i < n:
            node = self.root
            j = i
            best = None  # (keyword, end_token_idx)
            while j < n and tokens[j][0] in node:
                node = node[tokens[j][0]]
                if self._END in node:
                    best = (node[self._END], j)
                j += 1
            if best is not None:
                kw, jend = best
                out.append((kw, tokens[i][1], tokens[jend][2]))
                i = jend + 1
            else:
                i += 1
        return out
