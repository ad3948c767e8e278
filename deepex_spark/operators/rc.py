"""RC (relation classification) Spark operators: dataset preparation
(O29), distributed extraction, and zero-shot evaluation (O31).

Dataflow mirrors the reference's FewRel/TACRED path
(``scripts/rc/dataset_preparation.py``, ``scripts/rc/evaluation.py``):

1. ``prepare_rc_dataset``: raw instances (id, tokens, subject_spans,
   object_spans, true_relation) + broadcast alias dictionaries ->
   ``rel_candidates`` via the lemmatized/unlemmatized matchers merged by
   char span (O27/O28);
2. ``extract_rc_candidates``: one ``mapInPandas`` running the RC kernel
   (exhaustive relation-span search) per record;
3. the shared distill/rerank stages apply unchanged ('.sorted' mode);
4. ``evaluate_rc``: per item keep the k smallest ``contrastive_dis``
   triples, map each predicted relation surface through the alias ->
   relations dictionary, correct if the true relation is in the union
   (``evaluation.py:95-141``); P = correct/|predicted|, R = correct/|gold|.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from deepex_spark.config import DeepExConfig
from deepex_spark.operators.extract import CANDIDATE_SCHEMA, _COLUMNS
from deepex_spark.operators.linking import match_aliases

RC_INPUT_DDL = (
    "id string, tokens array<string>, subject_spans array<array<int>>, "
    "object_spans array<array<int>>, true_relation string"
)


def prepare_rc_dataset(
    raw: DataFrame,
    lem_aliases: dict[str, list[str]],
    unlem_aliases: dict[str, list[str]],
) -> DataFrame:
    """Attach rel_candidates by alias matching over the joined token text."""
    with_text = raw.withColumn("text", F.concat_ws(" ", F.col("tokens")))
    return match_aliases(with_text, "text", lem_aliases, unlem_aliases)


def extract_rc_candidates(rc_df: DataFrame, cfg: DeepExConfig) -> DataFrame:
    """rc records (with rel_candidates) -> candidate triples (same schema
    as the IE extract stage, so distill/rerank compose unchanged)."""
    n_parts = cfg.repartition_by_url or (
        rc_df.sparkSession.sparkContext.defaultParallelism * 2
    )
    rc_df = rc_df.repartition(n_parts)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from deepex_spark.kernel.rc_kernel import process_rc_record
        from deepex_spark.nlp.attention import get_attention_provider

        provider = get_attention_provider(cfg)
        for pdf in batches:
            rows: list[dict] = []
            for _, rec in pdf.iterrows():
                record = {
                    "tokens": list(rec["tokens"]),
                    "subject_spans": [list(s) for s in rec["subject_spans"]],
                    "object_spans": [list(s) for s in rec["object_spans"]],
                    "rel_candidates": [
                        {
                            "aliase": c["aliase"],
                            "relation": list(c["relation"]),
                            "len": c["len"],
                            "char_span": list(c["char_span"]),
                        }
                        for c in rec["rel_candidates"]
                    ],
                }
                for r in process_rc_record(str(rec["id"]), record, cfg, provider):
                    r["sent_pos"] = 0
                    rows.append(r)
            yield pd.DataFrame(rows, columns=_COLUMNS)

    return rc_df.mapInPandas(run, schema=CANDIDATE_SCHEMA)


def rc_pipeline(rc_df: DataFrame, cfg: DeepExConfig) -> DataFrame:
    """records -> reranked triples ('.sorted' mode)."""
    from deepex_spark.operators.distill import distill_triples
    from deepex_spark.operators.rerank import rerank_triples

    cands = extract_rc_candidates(rc_df, cfg)
    return rerank_triples(distill_triples(cands, cfg), cfg)


def evaluate_rc(
    triples: DataFrame,
    gold: DataFrame,
    alias2rel: dict[str, list[str]],
    topk: int = 1,
) -> dict:
    """Zero-shot RC scoring (evaluation.py:95-141). gold: (id,
    true_relation). Returns {'precision', 'recall', 'f1', 'n_correct',
    'n_predicted', 'n_gold'}."""
    spark = triples.sparkSession
    w = Window.partitionBy("docid").orderBy(F.asc("contrastive_dis"), F.asc("rank"))
    top = (
        triples.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= topk)
        .select(F.col("docid").alias("id"), F.lower(F.trim("rel")).alias("pred_rel"))
    )
    a2r_rows = [(k.lower(), [r for r in v]) for k, v in alias2rel.items()]
    a2r = spark.createDataFrame(a2r_rows, "pred_rel string, relations array<string>")
    scored = (
        top.join(F.broadcast(a2r), "pred_rel", "left")
        .groupBy("id")
        .agg(F.flatten(F.collect_list("relations")).alias("pred_relations"))
    )
    joined = gold.select(
        F.col("id").cast("string").alias("id"), "true_relation"
    ).join(scored, "id", "left")
    res = joined.select(
        F.count("*").alias("n_gold"),
        F.sum(F.when(F.col("pred_relations").isNotNull(), 1).otherwise(0)).alias("n_predicted"),
        F.sum(
            F.when(
                F.array_contains(
                    F.coalesce("pred_relations", F.array().cast("array<string>")),
                    F.col("true_relation"),
                ),
                1,
            ).otherwise(0)
        ).alias("n_correct"),
    ).collect()[0]
    n_gold, n_pred, n_corr = res["n_gold"], res["n_predicted"] or 0, res["n_correct"] or 0
    p = n_corr / n_pred if n_pred else 0.0
    r = n_corr / n_gold if n_gold else 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return {
        "precision": p,
        "recall": r,
        "f1": f1,
        "n_correct": int(n_corr),
        "n_predicted": int(n_pred),
        "n_gold": int(n_gold),
    }
