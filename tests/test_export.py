"""N-Triples export (operators/export.py): escaping specs vs a
pure-Python reference, and line-shape checks."""

from pyspark.sql import functions as F

from deepex_spark.operators.export import (
    IRI_ENC,
    LIT_ESC,
    ntriples_edges,
    ntriples_labels,
)


def _py_iri(s):
    for ch, enc in IRI_ENC:
        s = s.replace(ch, enc)
    return s


def _py_lit(s):
    for ch, esc in LIT_ESC:
        s = s.replace(ch, esc)
    return s


def test_edge_lines(spark):
    rows = [
        (1, "rel with space", 2),
        (3, "a%b", 4),          # % must not double-encode
        (5, 'q"<>{}|\\^`', 6),  # the full reserved set
    ]
    df = spark.createDataFrame(rows, ["src", "rel", "dst"])
    got = sorted(r["line"] for r in ntriples_edges(df).collect())
    want = sorted(
        f"<http://kg.local/e/{s}> <http://kg.local/p/{_py_iri(r)}> "
        f"<http://kg.local/e/{d}> ."
        for s, r, d in rows
    )
    assert got == want
    assert "<http://kg.local/p/rel%20with%20space>" in " ".join(got)
    assert "%25" in " ".join(got) and "%255" not in " ".join(got)


def test_label_literal_escaping(spark):
    labels = [
        (1, 'say "hi"'),
        (2, "back\\slash"),
        (3, "line\nbreak\ttab\rcr"),
        (4, "café — naïveté"),  # raw UTF-8 passes through
    ]
    df = spark.createDataFrame(labels, ["entity_id", "canonical"])
    got = {
        r["line"]
        for r in ntriples_labels(df, "entity_id", "canonical").collect()
    }
    for i, lab in labels:
        want = (
            f"<http://kg.local/e/{i}> "
            f'<http://www.w3.org/2000/01/rdf-schema#label> "{_py_lit(lab)}" .'
        )
        assert want in got, (want, got)
    # escaped output never contains a raw newline/cr/tab or bare quote
    for line in got:
        body = line.split('"', 1)[1].rsplit('"', 1)[0]
        assert "\n" not in body and "\r" not in body and "\t" not in body


def test_escape_roundtrip():
    """The literal escape is invertible (apply the two-char escapes in
    reverse) — no information loss in the export."""
    import re

    def unescape(s):
        out = []
        i = 0
        while i < len(s):
            if s[i] == "\\" and i + 1 < len(s):
                out.append(
                    {"\\": "\\", '"': '"', "n": "\n", "r": "\r", "t": "\t"}[
                        s[i + 1]
                    ]
                )
                i += 2
            else:
                out.append(s[i])
                i += 1
        return "".join(out)

    for s in ['a\\"b', "\\\\", 'x"\n\r\t\\y', "plain", '\\n"literal"']:
        assert unescape(_py_lit(s)) == s


def test_build_kg_export_ntriples_end_to_end(spark, tmp_path):
    """--export-ntriples publishes one text-line table: every line is a
    well-formed N-Triples statement (IRI triple or rdfs:label literal),
    edges and vertices both present."""
    import re

    from deepex_spark.plans.catalog import Catalog
    from deepex_spark.sources.pages import synth_pages
    from jobs.build_kg import main

    src = tmp_path / "pages"
    synth_pages(spark, n_docs=8, seed=5).write.parquet(str(src))
    out = tmp_path / "kg"
    main(
        [
            "--input", str(src),
            "--output", str(out),
            "--run-id", "nt1",
            "--export-ntriples",
            "--dist-const", "2",
            "--beam-size", "2",
        ]
    )
    cat = Catalog(str(out))
    lines = [
        r["line"]
        for r in cat.read_snapshot(spark, "ntriples").collect()
    ]
    assert lines
    iri = re.compile(r"^<[^<>\s]+> <[^<>\s]+> (<[^<>\s]+>|\"[^\n\r]*\") \.$")
    assert all(iri.match(ln) for ln in lines), [
        ln for ln in lines if not iri.match(ln)
    ][:3]
    assert any("rdf-schema#label" in ln for ln in lines)
    assert any("/p/" in ln for ln in lines)


def test_parse_is_exact_inverse(spark):
    """parse(export(edges)) == edges for adversarial ids/relations
    (reserved chars, %-sequences that could double-decode), and label
    lines are skipped by the parser."""
    from deepex_spark.operators.export import (
        ntriples_edges,
        ntriples_labels,
        parse_ntriples_edges,
    )

    rows = [
        ("a b", "rel with space", "c%20d"),   # literal %20 in the ID
        ("x%y", "p%25q", "<z>"),
        ("plain", 'q"{}|\\^`', "w"),
    ]
    df = spark.createDataFrame(rows, ["src", "rel", "dst"])
    lines = ntriples_edges(df).unionByName(
        ntriples_labels(
            spark.createDataFrame([(1, "lbl")], ["i", "l"]), "i", "l"
        )
    )
    got = sorted(
        map(tuple, parse_ntriples_edges(lines).collect())
    )
    assert got == sorted(rows)
