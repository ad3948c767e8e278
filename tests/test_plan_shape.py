"""Plan-shape guards: exchange counts the 100-TB design depends on.

These assert on the OPTIMIZED LOGICAL plan (stable node names, no AQE
rewriting) so the guarantees survive Spark version/AQE churn:
exactly ONE repartition reaches the kernel stage whether the url-hash
exchange is configured or not.
"""

from dataclasses import replace

from deepex_spark.config import DeepExConfig


def _pages(spark, n=6):
    rows = [(f"http://x/{i}", f"Obama lives in Hawaii number {i}.") for i in range(n)]
    return spark.createDataFrame(rows, "url string, text string")


def _logical_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def _count(plan: str, token: str) -> int:
    return plan.count(token)


def test_single_exchange_before_kernel_roundrobin(spark):
    """Default config: the kernel's round-robin repartition is the only
    pre-kernel exchange."""
    from deepex_spark.functions.sentencize import sentencize
    from deepex_spark.operators.extract import extract_candidates
    from deepex_spark.pipeline import normalize_pages

    cfg = DeepExConfig.small()
    assert not cfg.repartition_by_url
    cand = extract_candidates(sentencize(normalize_pages(_pages(spark), cfg)), cfg)
    plan = _logical_plan(cand)
    assert _count(plan, "Repartition") == 1, plan


def test_single_exchange_with_url_hash_partitioning(spark):
    """repartition_by_url set: normalize_pages' url-hash exchange is the
    only one — the kernel stage must NOT add a second round-robin."""
    from deepex_spark.pipeline import extract_triples

    cfg = replace(DeepExConfig.small(), repartition_by_url=8)
    triples = extract_triples(_pages(spark), cfg, rerank=False)
    plan = _logical_plan(triples)
    assert _count(plan, "RepartitionByExpression") == 1, plan
    # and no residual round-robin Repartition on top of it
    assert _count(plan, "Repartition ") == 0, plan

    # output parity: skipping the second exchange must not change results
    cfg_rr = DeepExConfig.small()
    a = {tuple(r) for r in extract_triples(_pages(spark), cfg, rerank=False)
         .select("docid", "subj", "rel", "obj", "score").collect()}
    b = {tuple(r) for r in extract_triples(_pages(spark), cfg_rr, rerank=False)
         .select("docid", "subj", "rel", "obj", "score").collect()}
    assert a == b


def test_pr_curve_window_runs_over_preaggregate(spark, tmp_path):
    """The registered o30_pr_curve must carry the scale-safe shape: the
    global (un-partitioned) cumulative window consumes the DISTINCT-score
    Aggregate, never the raw prediction rows — so the single-reducer input
    is |distinct scores|, bounded regardless of corpus size."""
    import pandas as pd

    from deepex_spark.queries import REGISTRY

    sf = tmp_path / "sf"
    sf.mkdir()
    pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "user_id": [1, 1, 2, 2],
            "event_type": ["click", "view", "click", "view"],
            "value": [0.9, 0.9, 0.5, 0.1],
        }
    ).to_parquet(sf / "events.parquet", index=False)
    df = REGISTRY["o30_pr_curve"].spark_fn(spark, str(sf))
    plan = _logical_plan(df)
    # Window directly above Aggregate: the Aggregate line must appear, and
    # every Window node must come BEFORE (above) it with no second Window
    # below the Aggregate reading raw rows
    assert "Window" in plan and "Aggregate" in plan, plan
    assert plan.index("Window") < plan.index("Aggregate"), plan
    assert plan.count("Window [") == 1, plan
    # ties are indivisible: one output row per distinct score
    rows = {tuple(r) for r in df.collect()}
    assert rows == {(0.9, 2, 1), (0.5, 3, 2), (0.1, 4, 2)}


def test_kg_adjacency_single_exchange(spark):
    """Serving-layer adjacency export: the explicit src repartition must
    satisfy the triple distinct, the row_number window and the final
    groupBy (subset rule) — exactly ONE hash exchange in the executed
    plan, and the neighbor collect must be the bounded conditional form
    (no unbounded collect below a filter)."""
    from deepex_spark.queries import REGISTRY

    df = REGISTRY["kg_adjacency"].spark_fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_scd2_history_single_exchange(spark):
    """Temporal fold: one entity-key exchange serves the (key, ts) dedup
    aggregate and both windows (see also tests/test_temporal.py)."""
    from deepex_spark.queries import REGISTRY

    df = REGISTRY["kg_edge_history"].spark_fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_skipgram_epoch_single_aggregate_no_join(spark):
    """Epoch 1 of the embedding trainer must stay join-free (hash-init
    parameters are computed in place) with exactly ONE aggregate — the
    (side, node, j) integer gradient sum. A Join or second Aggregate
    here means the parameter-server read leaked into the hash path."""
    from deepex_spark.operators.kgq import hash_embedding, skipgram_epoch

    pos = spark.createDataFrame(
        [(1, 2, 3)], ["center", "context", "n_pairs"]
    )
    neg = spark.createDataFrame([(2, 3)], ["center", "context"])
    out = skipgram_epoch(
        pos, neg, hash_embedding("e"), hash_embedding("c"), dim=4
    )
    plan = _logical_plan(out)
    assert _count(plan, "Join") == 0, plan
    assert _count(plan, "Aggregate") == 1, plan


def test_html_page_text_no_exchange(spark):
    """HTML→text extraction must be a pure row-local projection — no
    Join, Aggregate, or Repartition may appear; at 100 TB it runs
    entirely inside the scan stage."""
    from deepex_spark.operators.urls import extract_page_text

    pages = spark.createDataFrame(
        [("u1", bytearray(b"<p>x</p>"))], ["url", "html"]
    )
    plan = _logical_plan(extract_page_text(pages))
    for token in ("Join", "Aggregate", "Repartition", "Sort"):
        assert _count(plan, token) == 0, (token, plan)
