"""Sentence segmentation (O3) — entirely JVM-side, no Python UDF.

The reference sentencizes with spaCy's rule sentencizer and records each
sentence's char offset as ``full_text.find(sentence.text)`` — the FIRST
occurrence, so duplicate sentences share the first offset (faithful quirk,
reference ``src/deepex/data/text_handler.py:58-59``).

This engine uses a deterministic regex rule: a sentence boundary is
sentence-final punctuation ``[.!?]`` followed by whitespace. Implemented as
``regexp_replace`` (insert \\x01 marker) + ``split`` + ``posexplode`` —
whole-stage-codegen'd, oracle-checkable in ANSI SQL, and ~100x cheaper than
a Python sentencizer at 100 TB. Offsets via ``instr`` (first occurrence,
preserving the reference quirk).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SENT_BOUNDARY_SRC = r"([.!?])\s+"
SENT_MARKER = "\x01"


def sentencize(df: DataFrame, text_col: str = "text", docid_col: str = "docid") -> DataFrame:
    """(docid, text, ...) -> (docid, sent_pos, sent_offset, sent_text).

    sent_pos = ordinal of the sentence within the doc (drives faithful
    ordering downstream); sent_offset = first-occurrence char offset into
    the normalized doc text (text_handler.py:59 semantics).
    """
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
