"""Iceberg-style table IO on a parquet-directory fallback.

The design targets Iceberg (``MERGE INTO extracted t USING updates s ON
t.url = s.url``, snapshot lineage, SURVEY.md §2.3 J4); this sandbox has no
Iceberg runtime jar (verified, SURVEY.md §7), so the same *semantics* are
provided over plain parquet directories (SURVEY.md §7.3 H5):

- ``merge_by_url``  — idempotent upsert: existing rows whose url appears in
  the updates are replaced (anti-join + union), others kept; atomic via
  write-to-tmp + directory swap.
- ``remaining``     — checkpointed-resume anti-join (J3): pages minus already-
  extracted urls, with the done-set broadcast when small.
- ``write_lineage`` — per-run lineage JSON next to the data (run_id +
  per-partition row counts), the fallback for Iceberg snapshot metadata.

When an Iceberg catalog is configured (``spark.sql.catalog.*``), the same
calls route to real ``MERGE INTO`` SQL — the switch is config, not code
(see ``iceberg_available``).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:  # noqa: BLE001
        return False


def read_table(spark: SparkSession, path: str) -> DataFrame | None:
    if not os.path.exists(path):
        return None
    return spark.read.parquet(path)


def write_table(df: DataFrame, path: str) -> None:
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(tmp)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(tmp, path)


def merge_by_url_iceberg(
    spark: SparkSession, table_ident: str, updates: DataFrame
) -> None:
    """Native Iceberg MERGE INTO (SURVEY.md §2.3 J4) — used when an Iceberg
    catalog is on the classpath/config (``iceberg_available``); not reachable
    in this sandbox (no runtime jar), kept as the config-switch target so the
    fallback below is a drop-in (SURVEY.md §7.3 H5)."""
    updates.createOrReplaceTempView("_updates")
    spark.sql(
        f"""
        MERGE INTO {table_ident} t
        USING _updates s
        ON t.url = s.url
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
        """
    )


def merge_by_url(spark: SparkSession, target_path: str, updates: DataFrame) -> None:
    """MERGE INTO target USING updates ON url — parquet-fallback emulation.

    MATCHED → UPDATE * (update row wins), NOT MATCHED → INSERT *.
    Idempotent: merging the same updates twice equals merging once.
    Routes to :func:`merge_by_url_iceberg` when ``target_path`` is a catalog
    table identifier (no '/') and Iceberg is available.
    """
    if "/" not in target_path and iceberg_available(spark):
        merge_by_url_iceberg(spark, target_path, updates)
        return
    existing = read_table(spark, target_path)
    if existing is None:
        write_table(updates, target_path)
        return
    kept = existing.join(F.broadcast(updates.select("url")), "url", "left_anti")
    merged = kept.unionByName(updates)
    write_table(merged, target_path)


def remaining(pages: DataFrame, extracted_path: str) -> DataFrame:
    """Resume anti-join (J3): pages not yet present in the extracted table."""
    spark = pages.sparkSession
    done = read_table(spark, extracted_path)
    if done is None:
        return pages
    return pages.join(F.broadcast(done.select("url")), "url", "left_anti")


def write_lineage(spark: SparkSession, target_path: str, run_id: str) -> str:
    """Record per-partition row counts for the run next to the table."""
    df = spark.read.parquet(target_path)
    counts = (
        df.groupBy("part_id", "lineage").count().orderBy("lineage", "part_id").collect()
    )
    payload = {
        "run_id": run_id,
        "partitions": [
            {"part_id": r["part_id"], "lineage": r["lineage"], "rows": r["count"]}
            for r in counts
        ],
        "total_rows": sum(r["count"] for r in counts),
    }
    lineage_dir = f"{target_path}_lineage"
    os.makedirs(lineage_dir, exist_ok=True)
    lineage_path = f"{lineage_dir}/{run_id}.json"
    with open(lineage_path, "w", encoding="utf-8") as f:
        json.dump(payload, f, indent=2)
    return lineage_path
