"""TableIO edge cases: missing-table reads, atomic replace, empty updates,
and the Iceberg routing guard."""

from __future__ import annotations

import os

from engine import pipeline, tableio


def test_read_missing_table_returns_none(spark, tmp_path):
    assert tableio.read_table(spark, str(tmp_path / "nope")) is None


def test_write_table_atomic_replace(spark, pages_unit_path, tmp_path):
    out = str(tmp_path / "t")
    pages = spark.read.parquet(pages_unit_path)
    tableio.write_table(pages.limit(10).select("url"), out)
    assert spark.read.parquet(out).count() == 10
    tableio.write_table(pages.limit(3).select("url"), out)  # replace
    assert spark.read.parquet(out).count() == 3
    assert not [d for d in os.listdir(tmp_path) if ".tmp-" in d]  # no tmp leftovers


def test_merge_with_empty_updates_is_noop(spark, pages_unit_path, tmp_path):
    out = str(tmp_path / "t")
    pages = spark.read.parquet(pages_unit_path)
    ext = pipeline.run_extract(pages.limit(12), run_id="a")
    tableio.merge_by_url(spark, out, ext)
    before = {r["url"] for r in spark.read.parquet(out).collect()}
    tableio.merge_by_url(spark, out, ext.filter("1 = 0"))  # empty updates
    after = {r["url"] for r in spark.read.parquet(out).collect()}
    assert before == after and len(before) == 12


def test_iceberg_unavailable_in_sandbox(spark):
    assert tableio.iceberg_available(spark) is False  # documented sandbox fact
