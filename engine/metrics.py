"""Per-partition lineage metrics — the engine recast of the reference's
no-ground-truth evaluation counters (``evaluation.py:64-133``): coverage,
script distribution, and failure counts, grouped by partition so stragglers
and data-quality problems localize to a partition (FIXTURES.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def partition_metrics(extracted: DataFrame, run_id: str, wall_ms: int = -1) -> DataFrame:
    """`_metrics` rows per (run_id, part_id) from an extracted DataFrame."""
    return (
        extracted.groupBy("part_id")
        .agg(
            F.count("*").alias("docs_in"),
            F.sum(F.when(F.col("status") == "ok", 1).otherwise(0)).alias("docs_ok"),
            F.sum(F.when(F.col("status").startswith("error"), 1).otherwise(0)).alias(
                "docs_error"
            ),
            F.sum(F.when(F.col("status") == "empty", 1).otherwise(0)).alias(
                "docs_empty"
            ),
            F.sum("n_blocks").alias("blocks_total"),
            F.sum("n_kept").alias("blocks_kept"),
            F.sum(F.expr("size(filter(spans, x -> x.lang = 'rtl'))")).alias(
                "count_rtl"
            ),
            F.sum(F.expr("size(filter(spans, x -> x.lang = 'ltr'))")).alias(
                "count_ltr"
            ),
        )
        .withColumn("run_id", F.lit(run_id))
        .withColumn("wall_ms", F.lit(wall_ms))
    )
