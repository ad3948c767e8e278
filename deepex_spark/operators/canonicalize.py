"""Canonicalization of predicates and entities (north_rule stage; O32
lemmatizer pattern).

Predicates: lowercase, non-ASCII scrub, whitespace collapse, per-word rule
lemmatization, stopword-stripping variant for grouping. Entities: lowercase
+ whitespace collapse + leading-determiner strip. Canonical ids are
``xxhash64`` of the canonical string — stable across runs, partitions and
cluster sizes (never ``monotonically_increasing_id``, which is
partition-layout-dependent).

Lemmatization runs as a vectorized pandas UDF (per-word dict/suffix rules);
everything else is JVM-side column algebra.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_DETERMINERS = ("the ", "a ", "an ", "this ", "that ", "these ", "those ")


def _lemma_series(s: pd.Series) -> pd.Series:
    from deepex_spark.nlp.keywords import lemma

    return s.map(
        lambda x: " ".join(lemma(w) for w in x.split()) if isinstance(x, str) else x
    )


def lemmatize_col(col: Column) -> Column:
    return pandas_udf(_lemma_series, "string")(col)


def norm_entity_col(col: Column) -> Column:
    """lowercase, collapse whitespace, strip one leading determiner."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(col), r"\s+", " "),
            r"^(the|a|an|this|that|these|those) ",
            "",
        )
    )


def canonicalize_triples(triples: DataFrame) -> DataFrame:
    """Adds subj_canon / obj_canon / pred_canon + stable 64-bit ids."""
    ent_norm = norm_entity_col
    pred_norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("rel")), r"[^\x00-\x7F]+", " "), r"\s+", " "
        )
    )
    out = (
        triples.withColumn("subj_canon", ent_norm(F.col("subj_entity") if "subj_entity" in triples.columns else F.col("subj")))
        .withColumn("obj_canon", ent_norm(F.col("obj_entity") if "obj_entity" in triples.columns else F.col("obj")))
        .withColumn("pred_canon", lemmatize_col(pred_norm))
    )
    return (
        out.withColumn("subj_id", F.xxhash64("subj_canon"))
        .withColumn("obj_id", F.xxhash64("obj_canon"))
        .withColumn("pred_id", F.xxhash64("pred_canon"))
    )
