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
   relations dictionary, accept with the reference's TACRED/FewRel rules
   (colon-split label normalization, ``no_relation`` convention,
   ``main subject`` -> ``part of``; ``evaluation.py:82-141``);
   P = correct/|predicted|, R = correct/|gold|.
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

# the 16 FewRel dev relations the reference restricts candidates to
# (dataset_preparation.py:41)
FEWREL_DEV_RELATIONS = [
    "crosses", "original language of film or TV show", "competition class",
    "part of", "sport", "constellation",
    "position played on team / speciality",
    "located in or next to body of water", "voice type", "follows", "spouse",
    "military rank", "mother", "member of", "child", "main subject",
]


def prepare_fewrel_raw(spark, val_wiki_path: str, pid2name_path: str) -> DataFrame:
    """Flatten the raw FewRel ``val_wiki.json`` + ``pid2name.json`` into RC
    records (dataset_preparation.py:42-57): one row per instance with
    sequential string ids, subject/object spans = the FIRST position list of
    the head/tail entity, true_relation = pid2name[pid][0].

    The two files are small benchmark metadata (a few MB even for full
    FewRel), and their instance values are heterogeneous JSON arrays
    (``h = [name, qid, [[positions]]]``) that Spark's schema inference
    cannot type; they are parsed driver-side — which also preserves the
    reference's dict-insertion-order sequential ids — and parallelized
    into a DataFrame for the distributed pipeline stages that follow."""
    import json

    with open(val_wiki_path) as f:
        data_dict = json.load(f)
    with open(pid2name_path) as f:
        pid2name = json.load(f)
    rows = []
    index = 0
    for k, vs in data_dict.items():
        for v in vs:
            rows.append(
                (
                    str(index),
                    [str(t) for t in v["tokens"]],
                    [[int(i) for i in v["h"][2][0]]],
                    [[int(i) for i in v["t"][2][0]]],
                    str(pid2name[k][0]),
                )
            )
            index += 1
    return spark.createDataFrame(rows, RC_INPUT_DDL)


def prepare_tacred_raw(spark, test_json_path: str) -> DataFrame:
    """Flatten the raw TACRED ``test.json`` (a top-level JSON array) into RC
    records (dataset_preparation.py:72-86): subject/object spans = the
    inclusive token ranges [subj_start..subj_end] / [obj_start..obj_end].

    Spark-native: ``spark.read.json(multiLine=True)`` parses the array into
    one row per instance; sequential ids follow file order (a multiLine
    JSON file is a single split, so ``monotonically_increasing_id`` is
    file-ordered and the row_number window — single-partition, fine for a
    one-time small-file prep — assigns 0-based sequential ids without
    leaving the DataFrame API)."""
    df = (
        spark.read.option("multiLine", True)
        .json(test_json_path)
        .select("token", "subj_start", "subj_end", "obj_start", "obj_end", "relation")
    )
    w = Window.orderBy(F.monotonically_increasing_id())
    indexed = df.withColumn("id", (F.row_number().over(w) - 1).cast("string"))
    return indexed.select(
        "id",
        F.col("token").alias("tokens"),
        F.array(F.sequence(F.col("subj_start").cast("int"), F.col("subj_end").cast("int")))
        .alias("subject_spans"),
        F.array(F.sequence(F.col("obj_start").cast("int"), F.col("obj_end").cast("int")))
        .alias("object_spans"),
        F.col("relation").alias("true_relation"),
    )


def prepare_rc_dataset(
    raw: DataFrame,
    lem_aliases: dict[str, list[str]],
    unlem_aliases: dict[str, list[str]],
    dev_relations: list[str] | None = None,
) -> DataFrame:
    """Attach rel_candidates by alias matching over the joined token text.

    ``dev_relations`` (FewRel: the 16-dev-relation restriction,
    dataset_preparation.py:61-68) intersects each candidate's relation list
    with the allowed set and drops candidates left empty."""
    with_text = raw.withColumn("text", F.concat_ws(" ", F.col("tokens")))
    matched = match_aliases(with_text, "text", lem_aliases, unlem_aliases)
    if dev_relations is not None:
        dev = F.array(*[F.lit(r) for r in dev_relations])
        pruned = F.transform(
            "rel_candidates",
            lambda c: c.withField("relation", F.array_intersect(c["relation"], dev)),
        )
        matched = matched.withColumn(
            "rel_candidates",
            F.filter(pruned, lambda c: F.size(c["relation"]) > 0),
        )
    return matched


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
            for rid, toks, sspans, ospans, cands in zip(
                pdf["id"], pdf["tokens"], pdf["subject_spans"],
                pdf["object_spans"], pdf["rel_candidates"],
            ):
                record = {
                    "tokens": list(toks),
                    "subject_spans": [list(s) for s in sspans],
                    "object_spans": [list(s) for s in ospans],
                    "rel_candidates": [
                        {
                            "aliase": c["aliase"],
                            "relation": list(c["relation"]),
                            "len": c["len"],
                            "char_span": list(c["char_span"]),
                        }
                        for c in cands
                    ],
                }
                for r in process_rc_record(str(rid), record, cfg, provider):
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
    alias2rel: dict[str, list[str]] | None = None,
    topk: int = 1,
    items: DataFrame | None = None,
) -> dict:
    """Zero-shot RC scoring with the reference's acceptance rules
    (evaluation.py:82-141). gold: (id, true_relation). Returns
    {'precision', 'recall', 'f1', 'n_correct', 'n_predicted', 'n_gold'}.

    An item is correct if ANY of its top-k predicted relation surfaces
    (smallest contrastive distance) is accepted:

    * surface known in the alias dictionary -> accepted when its relation
      list contains the TACRED-normalized gold label
      (``true_relation.split(':')[1].replace('_', ' ')`` — evaluation.py:97;
      empty string when there is no colon, matching the reference's bare
      ``except``), OR the raw gold label, OR — the FewRel quirk — when the
      gold label is ``main subject`` and the list contains ``part of``
      (evaluation.py:101);
    * surface NOT in the dictionary -> accepted iff the gold label is
      ``no_relation`` (the TACRED convention, evaluation.py:82).

    Items that produced no prediction at all are never correct and do not
    count toward the precision denominator (reference: accuracy /
    len(our_result)).

    The dictionary consulted follows the reference's PER-ITEM scope
    (``val_data[k]["alias2relation"][v]``, evaluation.py:95-101): pass
    ``items`` = the prepared RC records (id, rel_candidates) and the map
    is derived by exploding each item's candidates and set-unioning
    relation lists per surface — the per-item union
    ``post_process.py:27-42`` builds — then joined to the predictions by
    (id, surface), a plain distributed equi-join. One documented KEY
    deviation: the reference keys the per-item map by the raw
    ``char_span`` text slice with a case-sensitive lookup
    (``get_id_alias2relations_dict``), while this map is keyed by
    ``lower(trim(aliase))`` (the same normalization the global-dict
    fallback and the prediction side use) — results can differ when the
    dictionary surface form differs in case/whitespace from the matched
    text slice. The ``alias2rel`` global-dict form remains as a fallback
    (broadcast lookup); it differs from per-item scope only when one
    surface maps to different relation sets in different items
    (``tests/test_rc.py`` pins the difference)."""
    spark = triples.sparkSession
    if (alias2rel is None) == (items is None):
        raise ValueError("evaluate_rc needs exactly one of alias2rel / items")
    w = Window.partitionBy("docid").orderBy(F.asc("contrastive_dis"), F.asc("rank"))
    top = (
        triples.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= topk)
        .select(F.col("docid").alias("id"), F.lower(F.trim("rel")).alias("pred_rel"))
    )
    if items is not None:
        a2r = (
            items.select(
                F.col("id").cast("string").alias("id"),
                F.explode("rel_candidates").alias("c"),
            )
            .select(
                "id",
                F.lower(F.trim(F.col("c.aliase"))).alias("pred_rel"),
                F.col("c.relation").alias("rels"),
            )
            .groupBy("id", "pred_rel")
            .agg(F.array_distinct(F.flatten(F.collect_list("rels"))).alias("relations"))
        )
        preds = top.join(a2r, ["id", "pred_rel"], "left")
    else:
        a2r_rows = [(k.lower(), [r for r in v]) for k, v in alias2rel.items()]
        a2r = spark.createDataFrame(a2r_rows, "pred_rel string, relations array<string>")
        preds = top.join(F.broadcast(a2r), "pred_rel", "left")
    joined = gold.select(
        F.col("id").cast("string").alias("id"), "true_relation"
    ).join(preds, "id", "left")
    parts = F.split("true_relation", ":")
    norm_true = F.when(
        F.size(parts) >= 2, F.regexp_replace(F.element_at(parts, 2), "_", " ")
    ).otherwise(F.lit(""))
    accept = (
        F.when(F.col("pred_rel").isNull(), F.lit(False))
        .when(F.col("relations").isNull(), F.col("true_relation") == "no_relation")
        .otherwise(
            F.array_contains("relations", norm_true)
            | F.array_contains("relations", F.col("true_relation"))
            | (
                (F.col("true_relation") == "main subject")
                & F.array_contains("relations", "part of")
            )
        )
    )
    per_item = joined.groupBy("id").agg(
        F.max(accept).alias("correct"),
        F.max(F.col("pred_rel").isNotNull()).alias("predicted"),
    )
    res = per_item.select(
        F.count("*").alias("n_gold"),
        F.sum(F.col("predicted").cast("int")).alias("n_predicted"),
        F.sum(F.col("correct").cast("int")).alias("n_correct"),
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
