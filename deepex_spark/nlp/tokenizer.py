"""Deterministic WordPiece-style tokenizer (pure Python, executor-side).

The reference uses HuggingFace ``BertTokenizerFast.batch_encode_plus`` with
``max_length=256, truncation=True, return_special_tokens_mask=True,
return_offsets_mapping=True`` (reference ``src/deepex/data/re_data.py:205-212``).
transformers is not available in this environment, so this module provides a
deterministic re-implementation with the same *interface contract* the
downstream kernel depends on:

* basic tokenization: whitespace split + every non-alphanumeric char is its
  own token (BERT basic-tokenizer behaviour, case preserved = '-cased');
* wordpiece: words longer than ``wordpiece_max_chars`` are split into a head
  piece plus ``##``-prefixed continuation pieces so the kernel's ``##``
  edge-pruning logic (reference ``kgm.py:58-76``) and detokenization
  (``" ".join(tokens).replace(" ##", "")``, ``kgm.py:47-50``) are exercised
  and round-trip exactly;
* ``[CLS]`` ... ``[SEP]`` wrapping with special_tokens_mask and (0,0)
  offset-mapping entries (HF convention the alignment loop keys off:
  ``re_data.py:221-223``);
* truncation to ``max_length`` total tokens. No padding — Spark carries
  ragged arrays fine; the reference's max_length padding existed only for
  tensor batching.

Detokenization is exact: join pieces with spaces and drop " ##" junctions.
"""

from __future__ import annotations

from dataclasses import dataclass

CLS = "[CLS]"
SEP = "[SEP]"


@dataclass
class Encoding:
    tokens: list[str]            # wordpiece tokens incl [CLS]/[SEP]
    offsets: list[tuple[int, int]]  # char span per token; (0,0) for specials
    special_mask: list[int]      # 1 for [CLS]/[SEP]


def basic_tokens(text: str) -> list[tuple[str, int, int]]:
    """Whitespace + punctuation split with char spans [start, end)."""
    out: list[tuple[str, int, int]] = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch.isspace():
            i += 1
            continue
        if not ch.isalnum():
            out.append((ch, i, i + 1))
            i += 1
            continue
        j = i
        while j < n and text[j].isalnum():
            j += 1
        out.append((text[i:j], i, j))
        i = j
    return out


def wordpieces(word: str, start: int, max_chars: int, piece_chars: int):
    """Split a long word into deterministic ## pieces with char spans."""
    if len(word) <= max_chars:
        return [(word, start, start + len(word))]
    pieces = []
    pos = 0
    first = True
    while pos < len(word):
        chunk = word[pos : pos + piece_chars]
        tok = chunk if first else "##" + chunk
        pieces.append((tok, start + pos, start + pos + len(chunk)))
        pos += len(chunk)
        first = False
    return pieces


def encode(
    text: str,
    max_length: int = 256,
    wordpiece_max_chars: int = 6,
    wordpiece_piece_chars: int = 4,
) -> Encoding:
    toks: list[str] = [CLS]
    offs: list[tuple[int, int]] = [(0, 0)]
    spec: list[int] = [1]
    budget = max_length - 2
    done = False
    for word, s, e in basic_tokens(text):
        for tok, ps, pe in wordpieces(word, s, wordpiece_max_chars, wordpiece_piece_chars):
            if len(toks) - 1 >= budget:
                done = True
                break
            toks.append(tok)
            offs.append((ps, pe))
            spec.append(0)
        if done:
            break
    toks.append(SEP)
    offs.append((0, 0))
    spec.append(1)
    return Encoding(tokens=toks, offsets=offs, special_mask=spec)


def detokenize(tokens: list[str]) -> str:
    """Reference BERT detokenization (kgm.py:47-50)."""
    return " ".join(tokens).replace(" ##", "").strip()


def detok_single(token: str) -> str:
    """Reference quirk: ``convert_tokens_to_string`` called on a *single str*
    iterates its characters (kgm.py:301-303), so 'ab' -> 'a b'. Replicated
    exactly — downstream does substring checks against '!=?'."""
    return " ".join(token).replace(" ##", "").strip()
