"""KG serialization exports — the interop boundary where the built
graph leaves the lakehouse (reference: deepex publishes ranked triples
as JSON per task, ``scripts/run.py`` output files; a downstream KG
consumer needs a standard graph format instead).

W3C N-Triples (RFC-compliant subset): one triple per line,
``<subj-iri> <pred-iri> <obj-iri-or-literal> .``. Everything is
row-local string algebra (concat + literal replace chains — no regex,
no UDF, no shuffle), so at 100 TB the export runs inside the scan
stage and writes straight to a text sink; ordering is left to the
sink (N-Triples is order-insensitive).

Escaping specs implemented exactly and mirrored by the SQL oracle and
the pure-Python reference in tests/test_export.py:

* IRI path segments: percent-encode the minimal set that cannot appear
  in an IRI — ``%`` FIRST (so encoded bytes never double-encode), then
  space, ``<``, ``>``, ``"``, ``{``, ``}``, ``|``, ``\\``, ``^``,
  `` ` `` — each to its uppercase %XX form.
* String literals: backslash FIRST (``\\`` → ``\\\\``), then ``"``,
  LF, CR, TAB to their two-char escapes. All other characters pass
  through (N-Triples permits raw UTF-8 in literals).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (char, %XX) in application order — '%' must come first
IRI_ENC = [
    ("%", "%25"),
    (" ", "%20"),
    ("<", "%3C"),
    (">", "%3E"),
    ('"', "%22"),
    ("{", "%7B"),
    ("}", "%7D"),
    ("|", "%7C"),
    ("\\", "%5C"),
    ("^", "%5E"),
    ("`", "%60"),
]

# (char, escape) in application order — backslash must come first
LIT_ESC = [
    ("\\", "\\\\"),
    ('"', '\\"'),
    ("\n", "\\n"),
    ("\r", "\\r"),
    ("\t", "\\t"),
]


def iri_segment(col: Column) -> Column:
    """Percent-encode a value for use as an IRI path segment."""
    c = col.cast("string")
    for ch, enc in IRI_ENC:
        c = F.replace(c, F.lit(ch), F.lit(enc))
    return c


def literal_escape(col: Column) -> Column:
    """Escape a value for use inside a double-quoted N-Triples literal."""
    c = col.cast("string")
    for ch, esc in LIT_ESC:
        c = F.replace(c, F.lit(ch), F.lit(esc))
    return c


def ntriples_edges(
    edges: DataFrame,
    base: str = "http://kg.local/",
    src: str = "src",
    rel: str = "rel",
    dst: str = "dst",
) -> DataFrame:
    """One ``(line)`` row per edge: entity–predicate–entity triples with
    both endpoints as ``<base>e/<id>`` IRIs and the predicate as
    ``<base>p/<encoded rel>``."""
    return edges.select(
        F.concat(
            F.lit(f"<{base}e/"),
            iri_segment(F.col(src)),
            F.lit(f"> <{base}p/"),
            iri_segment(F.col(rel)),
            F.lit(f"> <{base}e/"),
            iri_segment(F.col(dst)),
            F.lit("> ."),
        ).alias("line")
    )


def ntriples_labels(
    vertices: DataFrame,
    id_col: str,
    label_col: str,
    base: str = "http://kg.local/",
) -> DataFrame:
    """One ``rdfs:label`` literal line per vertex."""
    return vertices.select(
        F.concat(
            F.lit(f"<{base}e/"),
            iri_segment(F.col(id_col)),
            F.lit('> <http://www.w3.org/2000/01/rdf-schema#label> "'),
            literal_escape(F.col(label_col)),
            F.lit('" .'),
        ).alias("line")
    )


def iri_segment_decode(col: Column) -> Column:
    """Exact inverse of :func:`iri_segment`: decode every %XX of the
    reserved set, ``%25`` LAST (the encoder applied ``%`` first, so in
    encoded text every ``%`` is followed by ``25`` and no spurious %XX
    can match early)."""
    c = col.cast("string")
    for ch, enc in reversed(IRI_ENC):
        c = F.replace(c, F.lit(enc), F.lit(ch))
    return c


def parse_ntriples_edges(
    lines: DataFrame, base: str = "http://kg.local/", line_col: str = "line"
) -> DataFrame:
    """Inverse of :func:`ntriples_edges`: parse entity–predicate–entity
    statement lines back to ``(src, rel, dst)`` strings (callers cast
    ids as needed). Row-local regexp_extract + the decode chain; lines
    that are not e/p/e statements under ``base`` (e.g. label literals)
    parse to empty strings and are dropped."""
    e = base + "e/"
    p = base + "p/"
    import re as _re

    pat = (
        "^<" + _re.escape(e) + "([^>]*)> <" + _re.escape(p)
        + "([^>]*)> <" + _re.escape(e) + "([^>]*)> \\.$"
    )
    c = F.col(line_col)
    out = lines.select(
        iri_segment_decode(F.regexp_extract(c, pat, 1)).alias("src"),
        iri_segment_decode(F.regexp_extract(c, pat, 2)).alias("rel"),
        iri_segment_decode(F.regexp_extract(c, pat, 3)).alias("dst"),
    )
    return out.where(
        (F.col("src") != "") & (F.col("rel") != "") & (F.col("dst") != "")
    )
