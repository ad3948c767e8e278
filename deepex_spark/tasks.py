"""Task-level entry points — the reference's ``scripts/manager.py`` stage
chain (prep -> beam search -> post-processing -> ranking -> evaluation) as
one-call Spark jobs. A user of the reference's ``bash tasks/OIE_2016.sh``
runs ``run_oie_task``; FewRel/TACRED users run ``run_rc_task``.

Stage mapping (manager.py:118-179):
  stage 0  PreprocessData + processing.sh  -> normalize + sentencize + extract
  stage 1  post_processing.sh              -> distill (fwd+rev, doc sort)
  stage 2  ranking.py (.unsort/.sorted)    -> rerank (contrastive) or beam order
  stage 3  evaluate_oie.py                 -> eval-format TSV + top-k + O30 P/R

The OIE ingest applies the line-level char swap (manager.py:26: parens ->
spaces) before the pipeline, exactly like PreprocessData.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deepex_spark.config import DeepExConfig
from deepex_spark.functions.text import ingest_charswap, zero_pad_docid
from deepex_spark.operators.rerank import topk_per_doc

# top-k per sentence by task (evaluate_oie.py:70-71)
TASK_TOPK = {"OIE_2016": 3, "WEB": 1, "NYT": 1, "PENN": 1}


def prepare_oie_corpus(lines: DataFrame, id_col: str = "id", text_col: str = "text") -> DataFrame:
    """PreprocessData (manager.py:14-47): one sentence per line, ids are
    1-based line numbers zero-padded to 40 chars, '('/')' -> spaces."""
    return lines.select(
        zero_pad_docid(F.col(id_col)).alias("url"),
        ingest_charswap(F.col(text_col)).alias("text"),
    )


def run_oie_task(
    docs: DataFrame,
    task: str = "OIE_2016",
    cfg: DeepExConfig | None = None,
    sort_mode: str = "sorted",
) -> DataFrame:
    """docs(url, text) -> per-doc top-k eval-ready triples.

    sort_mode 'sorted' reranks by contrastive distance (ranking.py:44-45);
    'unsort' keeps beam ranking."""
    from deepex_spark.pipeline import extract_triples

    cfg = cfg or DeepExConfig.task()
    triples = extract_triples(docs, cfg, rerank=(sort_mode == "sorted"))
    k = TASK_TOPK.get(task, 3)
    return topk_per_doc(triples, k, order_col="rank")


def to_eval_tsv(triples: DataFrame, docs: DataFrame, sort_mode: str = "sorted") -> DataFrame:
    """O33 eval-format sink (evaluate_oie.py:57-69): one row per triple,
    ``id \\t "subj-by-span" \\t "rel" \\t "obj-by-span" \\t score`` with
    subj/obj re-extracted from the doc text by char span; the score column
    is the beam score for .unsort and -contrastive_dis for .sorted."""
    d = docs.select(F.col("url").alias("docid"), F.col("text").alias("_doc_text"))
    j = triples.join(d, "docid")
    subj_txt = F.expr("substring(_doc_text, subj_s + 1, subj_e - subj_s)")
    obj_txt = F.expr("substring(_doc_text, obj_s + 1, obj_e - obj_s)")
    score = (
        -F.col("contrastive_dis") if sort_mode == "sorted" else F.col("score")
    )
    line = F.concat_ws(
        "\t",
        F.col("docid"),
        F.concat(F.lit('"'), subj_txt, F.lit('"')),
        F.concat(F.lit('"'), F.col("rel"), F.lit('"')),
        F.concat(F.lit('"'), obj_txt, F.lit('"')),
        score.cast("string"),
    )
    return j.select(F.col("docid"), F.col("rank"), line.alias("line")).orderBy("docid", "rank")


def evaluate_oie_task(pred: DataFrame, gold: DataFrame) -> dict:
    """O30: P/R + optimal F1 against gold extractions. pred: the triples
    frame (sentence, rel, subj, obj, contrastive_dis or score); gold:
    (sent, rel, args array<string>).

    Fully distributed: the greedy matcher runs in a sentence-key cogroup
    (evaluate.match_rows_spark) and the PR scan over distinct scores; only
    final scalar counters reach the driver — at 100x data the old
    gold.collect()+pred.collect() path was THE driver OOM."""
    from deepex_spark.operators.evaluate import evaluate_oie_spark

    return evaluate_oie_spark(pred, gold)


def run_rc_task(
    raw: DataFrame,
    lem_aliases: dict,
    unlem_aliases: dict,
    alias2rel: dict | None = None,
    cfg: DeepExConfig | None = None,
    topk: int = 1,
) -> dict:
    """FewRel/TACRED chain: prepare (O29) -> RC pipeline -> evaluate (O31).

    Scoring consults each item's OWN alias->relations map derived from its
    prepared ``rel_candidates`` (reference evaluation.py:95-101 semantics);
    pass ``alias2rel`` to force the legacy global-dictionary fallback."""
    from deepex_spark.operators.rc import evaluate_rc, prepare_rc_dataset, rc_pipeline

    cfg = cfg or DeepExConfig.task(beam_mode="RC")
    rc_df = prepare_rc_dataset(raw, lem_aliases, unlem_aliases)
    triples = rc_pipeline(rc_df, cfg)
    gold = raw.select("id", "true_relation")
    if alias2rel is not None:
        return evaluate_rc(triples, gold, alias2rel, topk=topk)
    return evaluate_rc(triples, gold, topk=topk, items=rc_df)
