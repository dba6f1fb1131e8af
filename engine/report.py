"""Run-level evaluation report — the engine analog of the reference's
``evaluation.py`` (coverage, script distribution, failure metrics, runtime,
summary; ``evaluation.py:103-133``), computed distributed from the extracted
table + per-partition metrics and returned as one JSON-able dict."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def evaluation_report(extracted: DataFrame, wall_ms: int = -1) -> dict:
    agg = extracted.agg(
        F.count("*").alias("docs_total"),
        F.sum(F.when(F.col("status") == "ok", 1).otherwise(0)).alias("docs_ok"),
        F.sum(F.when(F.col("status") == "empty", 1).otherwise(0)).alias("docs_empty"),
        F.sum(F.when(F.col("status").startswith("error"), 1).otherwise(0)).alias(
            "docs_error"
        ),
        F.sum("n_blocks").alias("blocks_total"),
        F.sum("n_kept").alias("blocks_kept"),
        F.sum(F.expr("size(filter(spans, x -> x.lang = 'rtl'))")).alias("blocks_rtl"),
        F.sum(F.expr("size(filter(spans, x -> x.lang = 'ltr'))")).alias("blocks_ltr"),
        F.sum(F.length("extracted_text")).alias("chars_total"),
        F.countDistinct("part_id").alias("n_partitions"),
    ).collect()[0]

    docs_total = agg["docs_total"] or 0
    blocks_total = agg["blocks_total"] or 0
    report = {
        # ref evaluation.py "ocr_coverage"
        "coverage": {
            "docs_total": docs_total,
            "docs_ok": agg["docs_ok"],
            "docs_empty": agg["docs_empty"],
            "blocks_total": blocks_total,
            "blocks_kept": agg["blocks_kept"],
            "kept_ratio": round((agg["blocks_kept"] or 0) / max(blocks_total, 1), 4),
        },
        # ref "script_distribution"
        "script_distribution": {
            "rtl_blocks": agg["blocks_rtl"],
            "ltr_blocks": agg["blocks_ltr"],
        },
        # ref "failure_metrics"
        "failure_metrics": {
            "docs_error": agg["docs_error"],
            "docs_failed_or_empty": (agg["docs_empty"] or 0)
            + (agg["docs_error"] or 0),
        },
        # ref "runtime_metrics" (evaluation.py:119-127)
        "runtime_metrics": {
            "total_time_ms": wall_ms,
            "avg_time_per_doc_ms": round(wall_ms / max(docs_total, 1), 2)
            if wall_ms >= 0
            else -1,
            "n_partitions": agg["n_partitions"],
        },
        "summary": {
            "chars_extracted": agg["chars_total"],
            "ok_ratio": round((agg["docs_ok"] or 0) / max(docs_total, 1), 4),
        },
    }
    return report
