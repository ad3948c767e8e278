"""spark-submit entry point: SPARQL-lite queries over a published KG.

Closes the lakehouse loop — ``build_kg.py`` writes the graph,
``maintain_kg.py`` folds deltas in, and this job reads it back by
pattern without anyone hand-writing joins:

    zip -r deepex_spark.zip deepex_spark
    spark-submit --py-files deepex_spark.zip jobs/query_kg.py \\
        --catalog /warehouse/kg \\
        --query 'SELECT ?s ?o WHERE { ?s <capital_of> ?o . }' \\
        --output /warehouse/kg_answers/run42

The query runs against the CURRENT edge snapshot (``plans/catalog.py``
serves snapshot-versioned tables at their published version, so a
concurrent ``maintain_kg`` merge never tears a half-written table under
this job). The full documented fragment applies — BGP joins, FILTER
(comparisons + STRSTARTS/STRENDS/CONTAINS/REGEX), OPTIONAL, UNION,
NOT EXISTS/MINUS, property paths with per-step alternation, VALUES,
aggregates, ORDER BY/LIMIT, plus the CONSTRUCT (derived edge-shaped
graph, writable straight back through maintain_kg) and ASK (one-row
boolean) query forms (``operators/sparql.py``) — compiled to DataFrame
algebra, so Catalyst/AQE plans the physical joins against however large
the snapshot is; nothing in this job ever collects to the driver unless
``--show`` asks for a preview.

Column mapping: the built edge table stores (subj_id, pred_canon,
obj_id); ``--cols`` overrides for foreign tables (any 3 columns of one
DataFrame work — the operator is storage-agnostic).
"""

from __future__ import annotations

import argparse
import sys


def _compile(edges, query: str, cols: tuple, allow_product: bool = False):
    """Dispatch on the query form: SELECT -> bgp, CONSTRUCT -> derived
    edge-shaped graph (same schema as the snapshot — writable straight
    back through maintain_kg), ASK -> one-row boolean."""
    from deepex_spark.operators import sparql

    head = query.split(None, 1)[0].upper() if query.split() else ""
    if head == "CONSTRUCT":
        return sparql.construct(edges, query, cols=cols, allow_product=allow_product)
    if head == "ASK":
        return sparql.ask(edges, query, cols=cols, allow_product=allow_product)
    return sparql.bgp(edges, query, cols=cols, allow_product=allow_product)


def run_query(spark, catalog, query: str, table: str = "edges",
              cols: tuple = ("subj_id", "pred_canon", "obj_id")):
    """Resolve the edge snapshot and compile+run the query. Returns the
    result DataFrame (columns = the SELECT variables; edge columns for
    CONSTRUCT; a single boolean ``ask`` for ASK)."""
    edges = catalog.read(spark, table)
    return _compile(edges, query, cols)


def main(argv=None):
    from deepex_spark.plans.catalog import Catalog
    from deepex_spark.session import build_session

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--catalog", required=True, help="catalog base dir")
    p.add_argument("--catalog-format", default="parquet",
                   choices=["parquet", "iceberg"])
    p.add_argument("--query", required=True,
                   help="SPARQL-lite query string (see operators/sparql.py)")
    p.add_argument("--edges-table", default="edges")
    p.add_argument("--cols", default="subj_id,pred_canon,obj_id",
                   help="comma-separated (subject,predicate,object) columns")
    p.add_argument("--output", default=None,
                   help="parquet output path; omit to just --show")
    p.add_argument("--show", type=int, default=0,
                   help="print the first N result rows to stdout")
    p.add_argument("--allow-product", action="store_true",
                   help="opt in to a disconnected (cartesian) pattern")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    cols = tuple(c.strip() for c in args.cols.split(","))
    if len(cols) != 3:
        p.error("--cols needs exactly three comma-separated column names")

    spark = build_session(master=args.master) if args.master else build_session()
    catalog = Catalog(args.catalog, fmt=args.catalog_format, spark=spark)
    edges = catalog.read(spark, args.edges_table)
    out = _compile(edges, args.query, cols, args.allow_product)
    if args.output:
        out.write.mode("overwrite").parquet(args.output)
        print(f"wrote {args.output}")
    if args.show:
        for row in out.limit(args.show).collect():
            print("\t".join("" if v is None else str(v) for v in row))
    if not args.output and not args.show:
        # neither sink requested: still validate end-to-end cheaply
        print(f"rows: {out.count()}")
    return out


if __name__ == "__main__":
    main(sys.argv[1:])
