"""spark-submit entry point: end-to-end KG construction over a pages table.

The north_rule deployment shape:

    zip -r deepex_spark.zip deepex_spark
    spark-submit --py-files deepex_spark.zip jobs/build_kg.py \\
        --input s3://bucket/crawl --input-format iceberg \\
        --output /warehouse/kg --run-id run42 --repartition 4096 \\
        --alias-json aliases.json --resume

On N vs 4N executors the job is identical; only --repartition (and the
cluster) changes. --resume skips docid buckets already present in the
triples checkpoint manifest (per-partition lineage lives in the manifest
and in run_id/bucket columns).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="pages path/table (url, warc_ts, html, text, lang)")
    p.add_argument("--input-format", default="parquet",
                   choices=["parquet", "iceberg", "json", "jsonl", "warc"],
                   help="warc = raw Common-Crawl-style .warc/.warc.gz files: "
                        "parsed by sources/warc.py (exact Content-Length walk, "
                        "one task per file), projected to the pages shape with "
                        "text rendered from html and lang guessed — implies "
                        "--derive-text semantics at the scan")
    p.add_argument("--output", required=True, help="catalog base dir (or Iceberg namespace)")
    p.add_argument("--output-format", default="parquet", choices=["parquet", "iceberg"])
    p.add_argument("--run-id", default="run0")
    p.add_argument("--repartition", type=int, default=None, help="repartition(n, xxhash64(url)) after ingest")
    p.add_argument("--alias-json", default=None, help="JSON {alias: canonical} for entity linking")
    p.add_argument(
        "--mine-aliases",
        action="store_true",
        help="mine the entity-linking alias dictionary from the crawl's own "
        "anchor texts (anchor_alias_dict over the FULL input, before any "
        "resume filtering); explicit --alias-json entries take precedence",
    )
    p.add_argument("--min-alias-pages", type=int, default=2,
                   help="mined aliases need this many distinct linking pages")
    p.add_argument("--min-alias-conf", type=float, default=0.5,
                   help="mined aliases need this dominant-target page share")
    p.add_argument(
        "--derive-text",
        action="store_true",
        help="derive the text column from raw html at ingest "
        "(operators/urls.py::html_to_text — script/style/comment strip, "
        "block-tag newlines, entity unescape, whitespace normalize; "
        "row-local JVM regex, runs inside the scan stage) instead of "
        "trusting a pre-extracted text column",
    )
    p.add_argument(
        "--strip-boilerplate",
        action="store_true",
        help="remove per-host template lines (nav bars, footers — lines on "
        ">=50%% of a host's pages) from page text before extraction, so the "
        "kernel never mints triples from boilerplate",
    )
    p.add_argument("--link-strategy", default="broadcast", choices=["broadcast", "salted"])
    p.add_argument("--dist-const", type=int, default=2048)
    p.add_argument("--beam-size", type=int, default=6)
    p.add_argument("--max-kernel-tokens", type=int, default=None)
    p.add_argument("--no-rerank", action="store_true")
    p.add_argument("--resume", action="store_true", help="skip completed checkpoint buckets")
    p.add_argument(
        "--resolve-entities",
        action="store_true",
        help="merge near-identical canonical entities (blocked Levenshtein "
        "matcher + connected components) before building vertices/edges",
    )
    p.add_argument(
        "--export-adjacency",
        action="store_true",
        help="publish a serving-layer adjacency snapshot (per-entity "
        "degree + canonical top-8 neighbor pack) from the built edges",
    )
    p.add_argument(
        "--export-ntriples",
        action="store_true",
        help="serialize the built edges + vertex labels as W3C "
        "N-Triples text (the interop export a downstream graph store "
        "loads); row-local replace-chain escaping, written through the "
        "snapshot catalog",
    )
    p.add_argument(
        "--walk-corpus",
        type=int,
        default=None,
        metavar="LEN",
        help="publish a deterministic DeepWalk corpus snapshot (one "
        "LEN-step walk per entity) for embedding training",
    )
    p.add_argument(
        "--lang",
        default=None,
        metavar="CODE",
        help="keep only pages whose lang column equals CODE (ingest "
        "gate; a partition-prunable scan filter when the table is "
        "partitioned by lang)",
    )
    p.add_argument(
        "--canonicalize-urls",
        action="store_true",
        help="dedup re-fetches at ingest: keep the newest page per canonical "
        "url and re-key docids by it (stable across surface url variants)",
    )
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from deepex_spark.config import DeepExConfig
    from deepex_spark.operators.linking import alias_entity_table
    from deepex_spark.pipeline import build_knowledge_graph
    from deepex_spark.plans.catalog import Catalog
    from deepex_spark.session import build_session
    from deepex_spark.sources.pages import read_pages

    preexisting = SparkSession.getActiveSession() is not None
    spark = build_session(app_name=f"deepex-kg-{args.run_id}")
    cfg = DeepExConfig.task(
        dist_const=args.dist_const,
        beam_size=args.beam_size,
        max_kernel_tokens=args.max_kernel_tokens,
        repartition_by_url=args.repartition,
        rerank_sorted=not args.no_rerank,
        run_id=args.run_id,
    )
    catalog = Catalog(args.output, fmt=args.output_format)
    if args.input_format == "warc":
        from deepex_spark.sources.warc import read_warc, warc_to_pages

        # text is rendered from html inside the projection, so the
        # --derive-text re-render below would be a no-op; skip it
        pages = warc_to_pages(read_warc(spark, args.input))
        args.derive_text = False
    else:
        pages = read_pages(spark, args.input, fmt=args.input_format)
    if args.lang:
        pages = pages.where(pages["lang"] == args.lang)
    if args.derive_text:
        # FIRST, so every downstream consumer (boilerplate detection,
        # alias mining, the kernel) sees the freshly rendered text
        from pyspark.sql import functions as F

        from deepex_spark.operators.urls import html_to_text

        pages = pages.withColumn("text", html_to_text(F.col("html")))
    if args.canonicalize_urls:
        # BEFORE the resume anti-join: resumed docids must be canonical,
        # or a re-crawl under a new surface url re-processes a done page
        from deepex_spark.operators.urls import dedup_refetches

        pages = dedup_refetches(pages)
    if args.strip_boilerplate:
        # detection over the full corpus (like alias mining, before any
        # resume filtering); the join replaces text per page, keyed on
        # url — the same url-hash partitioning the ingest layout uses
        from deepex_spark.operators.curate import strip_boilerplate

        cleaned = strip_boilerplate(pages)
        pages = (
            pages.drop("text")
            .join(cleaned, "url")
            .withColumnRenamed("clean_text", "text")
        )
    mined_df = None
    if args.mine_aliases:
        # over the full (re-fetch-deduped) crawl, BEFORE the resume
        # anti-join: alias evidence from already-processed pages still
        # belongs in the dictionary
        from pyspark.sql import functions as F

        from deepex_spark.operators.urls import anchor_alias_dict

        mined_df = (
            anchor_alias_dict(pages, min_pages=args.min_alias_pages)
            .where(F.col("confidence") >= args.min_alias_conf)
            .select("alias", F.col("dst_canon").alias("canonical"))
        )
    if args.resume and catalog.exists("triples"):
        pages = catalog.pending(pages.withColumnRenamed("url", "docid"), "triples").withColumnRenamed(
            "docid", "url"
        ).drop("bucket")

    alias_df = None
    if args.alias_json:
        with open(args.alias_json) as f:
            alias_df = alias_entity_table(spark, json.load(f))
    if mined_df is not None:
        # deterministic precedence: an explicit JSON alias shadows the
        # mined entry for the same key (left-anti, not dropDuplicates —
        # union order must never decide the dictionary)
        alias_df = (
            mined_df
            if alias_df is None
            else alias_df.unionByName(mined_df.join(alias_df, "alias", "left_anti"))
        )

    t0 = time.time()
    triples, vertices, edges = build_knowledge_graph(
        pages, cfg, alias_df=alias_df, catalog=catalog,
        link_strategy=args.link_strategy, resolve=args.resolve_entities,
    )
    n_t, n_v, n_e = triples.count(), vertices.count(), edges.count()
    if args.export_ntriples:
        from pyspark.sql import functions as F

        from deepex_spark.operators.export import ntriples_edges, ntriples_labels

        nt = ntriples_edges(
            edges, src="subj_id", rel="pred_canon", dst="obj_id"
        ).unionByName(ntriples_labels(vertices, "entity_id", "canonical"))
        catalog.write_snapshot(nt, "ntriples", run_id=f"{args.run_id}-nt")
    if args.export_adjacency or args.walk_corpus:
        from pyspark.sql import functions as F

        from deepex_spark.operators.graph import adjacency_export, random_walks

        e = edges.select(
            F.col("subj_id").alias("src"),
            F.col("obj_id").alias("dst"),
            F.col("pred_canon").alias("rel"),
        )
        if args.export_adjacency:
            # idempotent per run_id, same publish protocol as the tables
            catalog.write_snapshot(
                adjacency_export(e), "adjacency", run_id=f"{args.run_id}-adj"
            )
        if args.walk_corpus:
            catalog.write_snapshot(
                random_walks(e.select("src", "dst"), walk_len=args.walk_corpus),
                "walks",
                run_id=f"{args.run_id}-walks",
            )
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "run_id": args.run_id,
                "triples": n_t,
                "vertices": n_v,
                "edges": n_e,
                "wall_sec": round(wall, 2),
                "triples_per_sec": round(n_t / wall, 1),
            }
        )
    )
    if not preexisting:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
