"""Bigram language-model quality scoring — the production train-once /
score-many shape (r5) behind the oracled ``lm_bigram_nll`` registry query.

The query form recomputes the model inside one SQL statement so DuckDB can
mirror it, which costs extra reference-slice scans (Spark inlines CTEs) —
fine at gate scale, wrong at 100 TB. This module is the M9 pattern
(train once, probe many — SURVEY M9, urdu_recognition_utrnet.py:53-96):

- :func:`train_bigram_lm` makes ONE pass over the reference slice and
  persists the vocabulary-sized count tables (bigrams, left-context
  unigrams derived from them, and the vocab size) as a parquet model.
- :func:`score_docs` scans the corpus ONCE: in-row bigrams explode and
  join the broadcast count tables; average add-1-smoothed negative
  log-likelihood per document.

Construction parity with the registry query is pinned in
tests/test_report.py — same tokenizer rule, same smoothing, same
rounding, row-equal output on the same corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# THE source of truth for the LM construction — the registry query's SQL
# is BUILT from these (the minhash sharing discipline), so tokenizer rule,
# bigram transform, and reference-slice rule cannot drift between the
# oracled query and this production path.
REF_RULE = "doc_id % 7 = 0"
TOKENS_EXPR = "filter(split(text, ' '), w -> w != '')"
# slice length is self-guarding (greatest(..., 0)) so a zero-token doc is
# safe even if Catalyst ever stops pushing the size(ws) >= 2 filter below
# the Generate in the registry query's LATERAL VIEW form (ADVICE r5)
BIGRAMS_EXPR = (
    "transform(slice(ws, 1, greatest(size(ws) - 1, 0)), "
    "(w, i) -> struct(w AS w1, ws[i + 1] AS w2))"
)


def _tokens(docs: DataFrame) -> DataFrame:
    return docs.select("doc_id", F.expr(TOKENS_EXPR).alias("ws"))


def _bigrams(docs: DataFrame) -> DataFrame:
    return (
        _tokens(docs)
        .where("size(ws) >= 2")
        .select("doc_id", F.explode(F.expr(BIGRAMS_EXPR)).alias("b"))
        .select("doc_id", "b.w1", "b.w2")
    )


def train_bigram_lm(docs: DataFrame, model_path: str) -> None:
    """Persist the model from the reference slice: ``{model_path}/bigrams``
    (w1, w2, c2), ``{model_path}/unigrams`` (w1, c1 — sum of outgoing
    bigrams, exactly the query's refuni), and ``{model_path}/meta``
    (v = distinct reference tokens). Costs two reference-slice scans
    (bigram counts + vocab — different aggregate keys, and materializing
    the token stream to save the second scan would cost more than the
    scan at corpus scale) plus one read-back of the vocabulary-sized
    bigrams table; training runs rarely, scoring is the hot path."""
    ref = docs.where(REF_RULE)
    bi = (
        _bigrams(ref)
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c2"))
    )
    bi.write.mode("overwrite").parquet(f"{model_path}/bigrams")
    spark = docs.sparkSession
    spark.read.parquet(f"{model_path}/bigrams").groupBy("w1").agg(
        F.sum("c2").cast("bigint").alias("c1")
    ).write.mode("overwrite").parquet(f"{model_path}/unigrams")
    _tokens(ref).select(F.explode("ws").alias("w")).agg(
        F.countDistinct("w").alias("v")
    ).write.mode("overwrite").parquet(f"{model_path}/meta")


def score_docs(
    spark: SparkSession, docs: DataFrame, model_path: str
) -> DataFrame:
    """(doc_id, n_bigrams, nll_r): ONE corpus scan; the vocabulary-sized
    count tables broadcast (Catalyst size stats), so nothing corpus-sized
    shuffles to be scored."""
    v = spark.read.parquet(f"{model_path}/meta").first()["v"]
    bigrams = spark.read.parquet(f"{model_path}/bigrams")
    unigrams = spark.read.parquet(f"{model_path}/unigrams")
    d = _bigrams(docs).alias("d")
    scored = (
        d.join(bigrams.alias("r"), ["w1", "w2"], "left")
        .join(unigrams.alias("u"), ["w1"], "left")
        .selectExpr(
            "doc_id",
            f"-ln((coalesce(c2, 0) + 1) * 1.0 / (coalesce(c1, 0) + {int(v)})) AS nll",
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_bigrams"),
        F.expr("CAST(round(avg(nll), 4) AS DOUBLE)").alias("nll_r"),
    )
