"""Alternate ingestion sources (SURVEY §2.1 S1): crawl dumps land as JSONL
(and event logs as CSV) at least as often as parquet. These readers produce
the exact pages/events schemas the parquet path uses, so every downstream
stage is source-agnostic — byte identity across sources is test-pinned.

JSON cannot carry binary, so the JSONL interchange format stores ``html``
base64-encoded (``html_b64``); the reader decodes it back to ``binary``
JVM-side (``unbase64`` — no Python in the path). Schemas are explicit:
schema inference would re-scan the source and can drift column types.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

PAGES_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html_b64", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)

EVENTS_CSV_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def write_pages_jsonl(pages: DataFrame, path: str) -> None:
    """Parquet-schema pages -> JSONL interchange (html base64-encoded)."""
    pages.select(
        "url",
        "warc_ts",
        F.base64("html").alias("html_b64"),
        "text",
        "lang",
    ).write.mode("overwrite").json(path)


def read_pages_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSONL crawl dump -> the canonical pages DataFrame (html as binary).

    Corrupt lines surface as null columns via Spark's PERMISSIVE mode and
    flow into the extraction error-row path rather than failing the read."""
    raw = spark.read.schema(PAGES_JSONL_SCHEMA).json(path)
    return raw.select(
        "url",
        "warc_ts",
        F.unbase64("html_b64").alias("html"),
        "text",
        "lang",
    )


def read_events_csv(spark: SparkSession, path: str) -> DataFrame:
    """CSV event log -> the canonical events DataFrame (explicit schema +
    header; timestamps parsed in the session timezone, which the engine
    pins to UTC)."""
    return spark.read.schema(EVENTS_CSV_SCHEMA).option("header", "true").csv(path)
