"""Explicit url-salted repartitioning with giant-page skew isolation.

The north rule demands explicit partitioning/skew handling: AQE rebalances
*shuffle* partitions at runtime but cannot split a single giant input row
(SURVEY.md §4 O6). Two-level strategy, the web recast of the reference's
strip-chunking fix (``english_ocr_pipeline.py:87-124``):

1. Normal pages hash-salt by url into ``num_parts`` partitions —
   deterministic, key-independent of input order.
2. Giant pages (html larger than ``giant_threshold`` bytes) get a dedicated
   salt domain of the SAME width (``num_parts .. 2*num_parts``): giant bytes
   dominate total bytes on web corpora, so they must spread across as many
   partitions as normal rows do (a narrower domain concentrates ~90% of the
   parse work on few cores — measured 3× slower at local[32]); the dedicated
   domain still guarantees normal partitions never queue behind giants and
   keeps Arrow batches of giants small. Within the pipeline the segmenter
   additionally chunks giant blocks (``extraction.segment.CHUNK_CHARS``) so
   no single Arrow row dominates.

At cluster scale the same expression partitions 10^12 docs: ``xxhash64`` is
uniform over urls, and the giant domain size scales with the giant-page
fraction (a few % of Common Crawl).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

GIANT_HTML_BYTES = 256 * 1024


def with_url_salt(
    df: DataFrame,
    num_parts: int,
    num_giant_parts: int | None = None,
    giant_threshold: int = GIANT_HTML_BYTES,
) -> DataFrame:
    """Add a deterministic ``salt`` column (int) over the url + size class."""
    if num_giant_parts is None:
        num_giant_parts = num_parts
    base = F.pmod(F.xxhash64(F.col("url")), F.lit(num_parts))
    giant = F.lit(num_parts) + F.pmod(F.xxhash64(F.col("url")), F.lit(num_giant_parts))
    is_giant = F.length(F.col("html")) > F.lit(giant_threshold)
    return df.withColumn("salt", F.when(is_giant, giant).otherwise(base).cast("int"))


def salted_repartition(
    df: DataFrame,
    num_parts: int,
    num_giant_parts: int | None = None,
    giant_threshold: int = GIANT_HTML_BYTES,
) -> DataFrame:
    if num_giant_parts is None:
        num_giant_parts = num_parts
    salted = with_url_salt(df, num_parts, num_giant_parts, giant_threshold)
    return salted.repartition(num_parts + num_giant_parts, F.col("salt")).drop("salt")
