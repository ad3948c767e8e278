"""Sentence segmentation (O3) — JVM-side for typical pages, linear
per-doc reconstruction for mega-docs.

The reference sentencizes with spaCy's rule sentencizer and records each
sentence's char offset as ``full_text.find(sentence.text)`` — the FIRST
occurrence, so duplicate sentences share the first offset (faithful quirk,
reference ``src/deepex/data/text_handler.py:58-59``).

This engine uses a deterministic regex rule: a sentence boundary is
sentence-final punctuation ``[.!?]`` followed by whitespace. Implemented as
``regexp_replace`` (insert \\x01 marker) + ``split`` + ``posexplode`` —
whole-stage-codegen'd, oracle-checkable in ANSI SQL, and ~100x cheaper than
a Python sentencizer at 100 TB.

Offsets come in three modes (``mode`` param / ``cfg.sentencize_offsets``):

* ``"scan"`` (reference-faithful): ``instr`` — the first occurrence of the
  sentence STRING anywhere in the doc, exactly the reference's
  ``full_text.find``. Cost is O(n_sents x doc_len) PER DOC, serial within
  one task (the stage runs before any exchange): measured 13 s for a
  single 484 KB / 12 k-sentence page (EXPLAIN.md §6). Fine for bounded web
  pages; pathological mega-docs serialize one core.
* ``"reconstruct"``: linear per doc, no scan — a LOOKAHEAD boundary keeps
  the inter-sentence whitespace in the next piece, so each sentence's
  actual aligned offset is the running sum of raw piece lengths plus the
  piece's leading-whitespace width. Computed by a per-DOC pandas UDF (one
  Python pass per document — NOT per sentence; a pure-JVM
  ``aggregate``+``array_append`` fold was tried first and is itself O(n^2)
  in accumulator copies). The sentence TEXT is byte-identical to scan mode
  everywhere: pieces after the first lstrip exactly the ASCII ``\\s+``
  boundary run that scan mode's ``regexp_replace`` consumes, then every
  piece trims ONLY ``' '`` (0x20) on both ends, matching ``F.trim``
  (SPARK-17299: trim strips spaces, not tabs/newlines/controls). Only the
  OFFSET deviates, and only by construction: a duplicate sentence gets its
  own occurrence offset (not the first copy's), and a sentence embedded as
  a substring of earlier text gets its aligned position (not the embedded
  one). Pinned by tests/test_sentencize.py (incl. doc-edge tabs/newlines).
* ``"auto"`` (default, the 100-TB path): per-doc switch in ONE pass over
  the source — docs with ``length(text) <= scan_max_len`` take the
  reference-faithful JVM scan branch; longer docs take the linear
  reconstruct branch. The pandas UDF's input is ``when(is_long, text)`` so
  short docs ship only a null slot through Arrow (no text bytes cross the
  Python boundary for the common case), and there is no second source scan
  or duplicated upstream exchange as a filter+union plan would cost.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SENT_BOUNDARY_SRC = r"([.!?])\s+"
SENT_MARKER = "\x01"
# docs longer than this take the linear reconstruct branch in auto mode
DEFAULT_SCAN_MAX_LEN = 64 * 1024

# reconstruct mode: lookahead keeps the boundary whitespace in the next
# piece so raw lengths sum to the original length. \s under re.ASCII ==
# Java regex \s (no UNICODE_CHARACTER_CLASS): [ \t\n\r\f\x0b].
_BOUNDARY_KEEP = re.compile(r"([.!?])(?=\s)", re.ASCII)
_ASCII_WS = " \t\n\r\f\x0b"


def _reconstruct_doc(text: str):
    if text is None:
        return None
    out = []
    pos = 0
    first = True
    for piece in _BOUNDARY_KEEP.sub(lambda m: m.group(1) + SENT_MARKER, text).split(
        SENT_MARKER
    ):
        # pieces after the first start with the \s+ run that scan mode's
        # regexp_replace consumed — drop it, then trim ONLY ' ' on both
        # ends to match F.trim exactly (text parity with scan mode)
        body = piece if first else piece.lstrip(_ASCII_WS)
        lt = body.lstrip(" ")
        out.append((lt.rstrip(" "), pos + (len(piece) - len(lt))))
        pos += len(piece)
        first = False
    return out


def _reconstruct_series(s: pd.Series) -> pd.Series:
    return s.map(_reconstruct_doc, na_action="ignore")


_PIECES_TYPE = "array<struct<sent:string, off:long>>"


def _scan_pieces(text_col: str) -> Column:
    """JVM-side (sent, first-occurrence off) array over the raw split
    pieces — same semantics as the classic scan plan, shaped to union with
    the reconstruct UDF output inside one CASE expression."""
    marked = F.regexp_replace(F.col(text_col), SENT_BOUNDARY_SRC, "$1" + SENT_MARKER)
    return F.transform(
        F.split(marked, SENT_MARKER),
        lambda s: F.struct(
            F.trim(s).alias("sent"),
            (F.instr(F.col(text_col), F.trim(s)) - F.lit(1)).cast("long").alias("off"),
        ),
    )


def _explode_pieces(df: DataFrame, docid_col: str, pieces: Column) -> DataFrame:
    exploded = df.select(
        F.col(docid_col).alias("docid"),
        F.posexplode(pieces).alias("sent_pos", "_p"),
    )
    return exploded.select(
        "docid",
        "sent_pos",
        F.col("_p.off").cast("int").alias("sent_offset"),
        F.col("_p.sent").alias("sent_text"),
    ).filter(F.length("sent_text") > 0)


def sentencize(
    df: DataFrame,
    text_col: str = "text",
    docid_col: str = "docid",
    mode: str = "auto",
    scan_max_len: int = DEFAULT_SCAN_MAX_LEN,
) -> DataFrame:
    """(docid, text, ...) -> (docid, sent_pos, sent_offset, sent_text).

    sent_pos = ordinal of the sentence within the doc (drives faithful
    ordering downstream); sent_offset per ``mode`` (module docstring):
    first-occurrence ``instr`` scan (reference text_handler.py:59
    semantics), linear aligned-offset reconstruction, or the per-doc
    ``auto`` switch at ``scan_max_len`` chars.
    """
    if mode == "reconstruct":
        from pyspark.sql.functions import pandas_udf

        recon = pandas_udf(_reconstruct_series, _PIECES_TYPE)
        return _explode_pieces(df, docid_col, recon(F.col(text_col)))
    if mode == "auto":
        from pyspark.sql.functions import pandas_udf

        recon = pandas_udf(_reconstruct_series, _PIECES_TYPE)
        is_long = F.length(F.col(text_col)) > F.lit(int(scan_max_len))
        pieces = F.when(
            is_long, recon(F.when(is_long, F.col(text_col)))
        ).otherwise(_scan_pieces(text_col))
        return _explode_pieces(df, docid_col, pieces)
    if mode != "scan":
        raise ValueError("sentencize mode must be 'scan', 'reconstruct' or 'auto'")
    # the scan branch IS auto's short-doc arm — one definition of the
    # semantics (_scan_pieces), so the two modes cannot silently diverge
    return _explode_pieces(df, docid_col, _scan_pieces(text_col))
