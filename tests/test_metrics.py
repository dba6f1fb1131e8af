"""Metrics table (FIXTURES.md §4): per-partition counters must total to the
exact oracle counts on sf-unit — the engine form of the reference's
evaluation counters (``evaluation.py:64-97``)."""

from __future__ import annotations

from pyspark.sql import functions as F

from engine import pipeline
from engine.metrics import partition_metrics


def test_metrics_totals_match_oracle(spark, pages_unit_path, goldens_unit):
    pages = spark.read.parquet(pages_unit_path)
    extracted = pipeline.run_extract(pages, num_parts=4, run_id="m")
    m = partition_metrics(extracted, "m", wall_ms=123)
    totals = m.agg(
        F.sum("docs_in").alias("docs_in"),
        F.sum("docs_ok").alias("docs_ok"),
        F.sum("docs_error").alias("docs_error"),
        F.sum("docs_empty").alias("docs_empty"),
        F.sum("blocks_total").alias("blocks_total"),
        F.sum("blocks_kept").alias("blocks_kept"),
        F.sum("count_rtl").alias("count_rtl"),
        F.sum("count_ltr").alias("count_ltr"),
    ).collect()[0]

    exp_ok = sum(1 for g in goldens_unit if g["status"] == "ok")
    exp_err = sum(1 for g in goldens_unit if g["status"].startswith("error"))
    exp_empty = sum(1 for g in goldens_unit if g["status"] == "empty")
    exp_blocks = sum(g["n_blocks"] for g in goldens_unit)
    exp_kept = sum(g["n_kept"] for g in goldens_unit)
    exp_rtl = sum(1 for g in goldens_unit for s in g["spans"] if s["lang"] == "rtl")
    exp_ltr = sum(1 for g in goldens_unit for s in g["spans"] if s["lang"] == "ltr")

    assert totals["docs_in"] == len(goldens_unit) == 64
    assert totals["docs_ok"] == exp_ok
    assert totals["docs_error"] == exp_err
    assert totals["docs_empty"] == exp_empty
    assert totals["blocks_total"] == exp_blocks
    assert totals["blocks_kept"] == exp_kept
    assert totals["count_rtl"] == exp_rtl
    assert totals["count_ltr"] == exp_ltr
    assert all(r["run_id"] == "m" and r["wall_ms"] == 123 for r in m.collect())
