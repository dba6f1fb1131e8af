"""DSIR importance resampling — the production materialize-first shape
(r6) behind the oracled ``dsir_resample`` registry query.

The query form recomputes the bigram LM and the cluster assignment inside
one SQL statement so DuckDB can mirror it, which re-scans the corpus per
CTE reference (Spark inlines CTEs) — fine at gate scale, wrong at 100 TB.
This module is the same train-once / materialize-once split as
``engine/lm``:

- :func:`assign_clusters` — every embedding to its nearest frozen-codebook
  centroid: in-row exact quantized-L2 argmin over the 16 broadcast
  literals, ZERO Exchange (pinned row-equal to the oracled
  ``embedding_cluster_assign``).
- :func:`materialize_scored` — ONE LM-scoring pass over the corpus
  (``engine.lm.score_docs``: count tables broadcast) joined with the
  assignment (one scan of embeddings; free co-location when both tables
  are id-bucketed) and persisted. Every subsequent resampling sweep reads
  this table instead of recomputing either model.
- :func:`resample` — the keep decision from the materialized table alone:
  one bounded partial-agg histogram shuffle on (cluster_id, rounded
  score), rank windows over that TINY aggregate only, the per-(cluster,
  score) rate table broadcast back onto the scored rows, deterministic
  integer-md5 draw. Changing the keep-rate curve (the exponent) re-runs
  ONLY this step.

Construction parity with the registry query is pinned in
tests/test_report.py: same quantized-L2 tie-breaks, same rounding, same
rate arithmetic and md5 draw — row-equal output on the same corpus.

Reference analog: the M9 train-once/score-many discipline
(urdu_recognition_utrnet.py:53-96) composed across TWO frozen models.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from engine import lm
from engine.ann import l2_q
from engine.ann_codebook import TRAINED_CQ


def assign_clusters(embeddings: DataFrame) -> DataFrame:
    """(vec_id, cluster_id) via the frozen codebook: in-row argmin, ties ->
    lowest cid (array_position finds the FIRST minimum), zero shuffle."""
    cents = (
        "array("
        + ", ".join(
            "array(" + ", ".join(f"CAST({x} AS BIGINT)" for x in cq) + ")"
            for cq in TRAINED_CQ
        )
        + ")"
    )
    dist = l2_q("q", "c")
    return (
        embeddings.selectExpr(
            "vec_id",
            "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000)"
            " AS BIGINT)) AS q",
        )
        .selectExpr("vec_id", f"transform({cents}, c -> {dist}) AS d")
        .selectExpr(
            "vec_id",
            "CAST(array_position(d, array_min(d)) - 1 AS BIGINT) AS cluster_id",
        )
    )


def materialize_scored(
    spark: SparkSession,
    docs: DataFrame,
    embeddings: DataFrame,
    model_path: str,
    out_path: str,
    train: bool = True,
) -> None:
    """Persist (doc_id, cluster_id, nll_r): the expensive half of DSIR,
    run once per corpus snapshot. ``train=False`` reuses an existing LM
    model at ``model_path`` (the score-many path)."""
    if train:
        lm.train_bigram_lm(docs, model_path)
    scored = lm.score_docs(spark, docs, model_path)
    assign = assign_clusters(embeddings)
    (
        scored.join(assign, scored["doc_id"] == assign["vec_id"])
        .select("doc_id", "cluster_id", "nll_r")
        .write.mode("overwrite")
        .parquet(out_path)
    )


def resample(spark: SparkSession, scored_path: str) -> DataFrame:
    """(doc_id, cluster_id, nll_r, keep) from the materialized score
    table: keep_rate = (1 - pct)^2, pct = exact percent-rank of the
    rounded NLL within the doc's cluster, decided by the 32-bit md5
    uniform — bit-identical to the oracled query's arithmetic."""
    s = spark.read.parquet(scored_path)
    hist = s.groupBy("cluster_id", "nll_r").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    w_below = (
        Window.partitionBy("cluster_id")
        .orderBy("nll_r")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_cluster = Window.partitionBy("cluster_id")
    rates = (
        hist.select(
            "cluster_id",
            "nll_r",
            F.coalesce(F.sum("cnt").over(w_below), F.lit(0)).alias("n_lower"),
            F.sum("cnt").over(w_cluster).alias("n_c"),
        )
        .selectExpr(
            "cluster_id",
            "nll_r",
            "floor(pow(1.0 - n_lower * 1.0 /"
            " (CASE WHEN n_c > 1 THEN n_c - 1 ELSE 1 END), 2)"
            " * 4294967296) AS thr",
        )
    )
    u = "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT)"
    return s.join(F.broadcast(rates), ["cluster_id", "nll_r"]).selectExpr(
        "doc_id",
        "cluster_id",
        "nll_r",
        f"CAST(CASE WHEN {u} < thr THEN 1 ELSE 0 END AS BIGINT) AS keep",
    )
