"""Sentence segmentation (O3) — entirely JVM-side, no Python UDF.

The reference sentencizes with spaCy's rule sentencizer and records each
sentence's char offset as ``full_text.find(sentence.text)`` — the FIRST
occurrence, so duplicate sentences share the first offset (faithful quirk,
reference ``src/deepex/data/text_handler.py:58-59``).

This engine uses a deterministic regex rule: a sentence boundary is
sentence-final punctuation ``[.!?]`` followed by whitespace. Implemented as
``regexp_replace`` (insert \\x01 marker) + ``split`` + ``posexplode`` —
whole-stage-codegen'd, oracle-checkable in ANSI SQL, and ~100x cheaper than
a Python sentencizer at 100 TB.

Offsets come in two modes (``mode`` param / ``cfg.sentencize_offsets``):

* ``"scan"`` (default, reference-faithful): ``instr`` — the first
  occurrence of the sentence STRING anywhere in the doc, exactly the
  reference's ``full_text.find``. Cost is O(n_sents x doc_len) PER DOC,
  serial within one task (the stage runs before any exchange): measured
  13 s for a single 484 KB / 12 k-sentence page (EXPLAIN.md §7). Fine for
  bounded web pages; pathological mega-docs serialize one core.
* ``"reconstruct"`` (opt-in scale path): linear per doc, no scan — a
  LOOKAHEAD boundary preserves the inter-sentence whitespace, so each
  sentence's actual aligned offset is the running sum of raw piece
  lengths plus the piece's leading-whitespace width. Computed by a
  per-DOC pandas UDF (one Python pass per document — NOT per sentence —
  in the same Arrow stage that already runs ``blank_parens``; a pure-JVM
  ``aggregate``+``array_append`` fold was tried first and is itself
  O(n^2) in accumulator copies). Deviates from the reference quirk ONLY
  where offsets differ by construction: a duplicate sentence gets its own
  occurrence offset (not the first copy's), and a sentence embedded as a
  substring of earlier text gets its aligned position (not the embedded
  one). Pinned by tests/test_sentencize.py.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SENT_BOUNDARY_SRC = r"([.!?])\s+"
SENT_MARKER = "\x01"

# reconstruct mode: Java's \s under re.ASCII, lookahead so the whitespace
# stays in the next piece and raw lengths sum to the original length
_BOUNDARY_KEEP = re.compile(r"([.!?])(?=\s)", re.ASCII)
# JVM trim strips chars <= U+0020 — mirror exactly (str.strip() also eats
# unicode whitespace like \xa0, which the scan mode's trim keeps)
_JVM_WS = "".join(chr(i) for i in range(0x21))


def _reconstruct_doc(text: str):
    if text is None:
        return None
    out = []
    pos = 0
    for piece in _BOUNDARY_KEEP.sub(lambda m: m.group(1) + SENT_MARKER, text).split(
        SENT_MARKER
    ):
        lt = piece.lstrip(_JVM_WS)
        out.append((lt.rstrip(_JVM_WS), pos + (len(piece) - len(lt))))
        pos += len(piece)
    return out


def _reconstruct_series(s: pd.Series) -> pd.Series:
    return s.map(_reconstruct_doc, na_action="ignore")


def sentencize(
    df: DataFrame,
    text_col: str = "text",
    docid_col: str = "docid",
    mode: str = "scan",
) -> DataFrame:
    """(docid, text, ...) -> (docid, sent_pos, sent_offset, sent_text).

    sent_pos = ordinal of the sentence within the doc (drives faithful
    ordering downstream); sent_offset per ``mode`` (module docstring):
    first-occurrence ``instr`` scan (reference text_handler.py:59
    semantics) or linear aligned-offset reconstruction.
    """
    if mode == "reconstruct":
        from pyspark.sql.functions import pandas_udf

        recon = pandas_udf(_reconstruct_series, "array<struct<sent:string, off:long>>")
        exploded = df.select(
            F.col(docid_col).alias("docid"),
            F.posexplode(recon(F.col(text_col))).alias("sent_pos", "_p"),
        )
        return exploded.select(
            "docid",
            "sent_pos",
            F.col("_p.off").cast("int").alias("sent_offset"),
            F.col("_p.sent").alias("sent_text"),
        ).filter(F.length("sent_text") > 0)
    if mode != "scan":
        raise ValueError("sentencize mode must be 'scan' or 'reconstruct'")
    marked = F.regexp_replace(F.col(text_col), SENT_BOUNDARY_SRC, "$1" + SENT_MARKER)
    exploded = df.select(
        F.col(docid_col).alias("docid"),
        F.col(text_col).alias("_doc_text"),
        F.posexplode(F.split(marked, SENT_MARKER)).alias("sent_pos", "_raw_sent"),
    )
    return (
        exploded.withColumn("sent_text", F.trim(F.col("_raw_sent")))
        .filter(F.length("sent_text") > 0)
        .withColumn("sent_offset", F.instr(F.col("_doc_text"), F.col("sent_text")) - F.lit(1))
        .select("docid", "sent_pos", "sent_offset", "sent_text")
    )
