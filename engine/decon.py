"""Benchmark decontamination — the production gate behind the oracled
``decontaminate`` registry query, composed with the r7 runtime
bloom-filter scan pruning.

The query form synthesizes its benchmark slice inline so DuckDB can
mirror it; this module takes the REAL shape: a corpus and a WRITTEN
benchmark-gram table (the n-gram digests of every eval benchmark —
Gopher/GPT-3-style 8-gram decontamination). Scale design:

- :func:`doc_grams` — per-doc 8-gram integer digests, all in-row
  (split/slice/md5/conv JVM expressions): gram TEXT never leaves the
  row, the shuffle key is a fixed-width BIGINT.
- :func:`decontaminate` — the per-doc contamination tally via a
  LEFT SEMI join of the corpus gram stream against the benchmark gram
  table. The benchmark side is usually dim-sized (Catalyst broadcasts it
  from parquet stats); when it is NOT (hundreds of benchmarks x
  paraphrase expansions forcing a shuffle join), Spark's runtime bloom
  filter injects a might_contain probe on the CORPUS gram stream ahead
  of the Exchange — corpus grams that cannot match never shuffle. Both
  plans are valid; tests pin the bloom shape under the forced-shuffle
  confs and row-equality with the oracled query's construction.

Reference analog: the F3-style allow/deny gate (SURVEY §2.2) applied at
training-set hygiene level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# THE source of truth for the 8-gram digest rule (mirrored by the oracled
# query's _DECON_GRAM_SPARK and its DuckDB twin): first 8 md5-hex chars of
# the space-joined gram as a BIGINT.
GRAM_N = 8
GRAM_EXPR = (
    "transform(sequence(0, size(toks) - {n}), "
    "i -> CAST(conv(substring(md5(array_join(slice(toks, i + 1, {n}), ' ')), "
    "1, 8), 16, 10) AS BIGINT))"
)


def doc_grams(docs: DataFrame, n: int = GRAM_N) -> DataFrame:
    """(doc_id, gram BIGINT) — every n-gram digest at every offset."""
    return (
        docs.selectExpr("doc_id", "split(text, ' ') AS toks")
        .where(f"size(toks) >= {int(n)}")
        .selectExpr(
            "doc_id", f"explode({GRAM_EXPR.format(n=int(n))}) AS gram"
        )
    )


def decontaminate(
    docs: DataFrame,
    bench_grams: DataFrame,
    n: int = GRAM_N,
    staged_grams_path: str | None = None,
) -> DataFrame:
    """(doc_id, contaminated, n_shared_grams) — row-equal to the oracled
    ``decontaminate`` query when fed its benchmark construction.

    ``bench_grams``: a (gram BIGINT[, n INT]) table, typically read from
    parquet (a written benchmark-digest table is what lets Catalyst see
    its size). Real digest tables carry SEVERAL gram sizes (8-gram decon
    and 13-gram exact-match are both standard), so when an ``n`` column
    is present the gate filters to its own size — a Filter-over-scan,
    which is what Spark's runtime bloom filter needs on a creation side
    (an Aggregate there blocks the rule — and the semi join + DISTINCT
    tally make a dedup of the benchmark side unnecessary anyway).

    ``staged_grams_path``: when given, the corpus gram stream is WRITTEN
    there once and the join reads it back. Two reasons, both the
    materialize-first discipline: a decon sweep over many benchmarks
    re-reads the (doc_id, gram) pairs instead of re-tokenizing the
    corpus per probe, and the runtime bloom filter — which cannot trace
    an application side through the gram explode (Generate) — sees a
    plain FileScan it can prune (plan-pinned in tests/test_decon)."""
    b = bench_grams
    if "n" in b.columns:
        b = b.where(F.col("n") == int(n))
    g = doc_grams(docs, n)
    if staged_grams_path is not None:
        g.write.mode("overwrite").parquet(staged_grams_path)
        g = docs.sparkSession.read.parquet(staged_grams_path)
    hits = (
        g.join(b.select("gram"), "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.countDistinct("gram").cast("bigint").alias("n_hits"))
    )
    return (
        docs.select("doc_id")
        .join(hits, "doc_id", "left")
        .selectExpr(
            "doc_id",
            "CAST(CASE WHEN n_hits IS NULL THEN 0 ELSE 1 END AS BIGINT)"
            " AS contaminated",
            "CAST(coalesce(n_hits, 0) AS BIGINT) AS n_shared_grams",
        )
    )
