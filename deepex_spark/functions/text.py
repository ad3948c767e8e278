"""Text normalization & string functions (O2 and friends).

The reference's normalization chain, reproduced byte-identically per url:

1. ingest char swap: ``line.replace('(', ' ').replace(')', ' ')``
   (reference ``scripts/manager.py:26,44``) — pure column expr (JVM-side);
2. length-preserving paren blanking: ``((...))`` then ``(...)`` replaced by
   runs of spaces of identical length so all char offsets stay stable
   (reference ``src/deepex/data/text_handler.py:50-51``). Spark's builtin
   ``regexp_replace`` cannot emit a match-length-dependent replacement, so
   this one stage is a vectorized scalar pandas UDF;
3. docid zero-pad to 40 chars (``text_handler.py:59``) — ``lpad``;
4. non-ASCII scrub for relations (``distillation.py:100-101``) — builtin
   ``regexp_replace``;
5. exact Python ``str.title()`` (``kgm.py:131-132``) — pandas UDF, because
   Spark's ``initcap`` differs on digits/apostrophes. (The pipeline itself
   title-cases inside the kernel; this column function exists for
   standalone/relational use.)
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_DOUBLE_PARENS = re.compile(r"\(\(.*?\)\)")
_PARENS = re.compile(r"\(.*?\)")


def blank_parens_py(text: str) -> str:
    """Reference text_handler.py:50-51, length-preserving."""
    if text is None:
        return None
    text = _DOUBLE_PARENS.sub(lambda m: " " * len(m.group()), text)
    text = _PARENS.sub(lambda m: " " * len(m.group()), text)
    return text


def _blank_parens_series(s: pd.Series) -> pd.Series:
    return s.map(blank_parens_py, na_action="ignore")


def blank_parens(col: Column) -> Column:
    # UDFs are built lazily: pyspark 4 resolves the return type against the
    # active session, which doesn't exist at import time.
    return pandas_udf(_blank_parens_series, "string")(col)


def ingest_charswap(col: Column) -> Column:
    """manager.py:26 — '(' / ')' to spaces; JVM-side translate."""
    return F.translate(col, "()", "  ")


def zero_pad_docid(col: Column) -> Column:
    """text_handler.py:59 — 40-char zero-padded doc id."""
    return F.lpad(col.cast("string"), 40, "0")


def scrub_non_ascii(col: Column) -> Column:
    """distillation.py:100-101 — non-ASCII runs to single space, trimmed."""
    return F.trim(F.regexp_replace(col, r"[^\x00-\x7F]+", " "))


def _py_title_series(s: pd.Series) -> pd.Series:
    return s.map(lambda x: x.title(), na_action="ignore")


def py_title(col: Column) -> Column:
    return pandas_udf(_py_title_series, "string")(col)


def html_to_text_py(html: bytes | str) -> str:
    """Deterministic HTML -> text for the input_hint's ``html BINARY`` column:
    drop script/style blocks, strip tags, decode the few entities the
    synthetic corpus uses, collapse nothing (offsets derive from the *text*
    column downstream; this feeds the text column when it is null)."""
    if html is None:
        return None
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    html = re.sub(r"(?is)<(script|style)[^>]*>.*?</\1>", " ", html)
    html = re.sub(r"(?s)<[^>]+>", " ", html)
    for ent, ch in (("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&nbsp;", " ")):
        html = html.replace(ent, ch)
    return " ".join(html.split())


def _html_to_text_series(s: pd.Series) -> pd.Series:
    return s.map(html_to_text_py, na_action="ignore")


def html_to_text(col: Column) -> Column:
    return pandas_udf(_html_to_text_series, "string")(col)


def nfc_normalize_py(text: str) -> str:
    """Unicode NFC canonical composition — the crawl-ingest normalization
    that makes byte-level dedup/fingerprints see 'a'+COMBINING ACUTE and
    the precomposed 'á' as the same document. Pure stdlib
    (unicodedata.normalize), no external deps; DuckDB's nfc_normalize is
    the independent oracle (queries.py::text_nfc)."""
    if text is None:
        return None
    return unicodedata.normalize("NFC", text)


def _nfc_series(s: pd.Series) -> pd.Series:
    return s.map(nfc_normalize_py, na_action="ignore")


def nfc_normalize(col: Column) -> Column:
    # Arrow-batched; built lazily like blank_parens (pyspark 4 resolves
    # the return type against the active session)
    return pandas_udf(_nfc_series, "string")(col)
