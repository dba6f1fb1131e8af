"""Mirror of the driver's correctness gate: run every ``queries()`` entry on
Spark and its ``oracle_sql()`` twin on DuckDB over the same sf0.001 parquet,
compare row count, column names, and order-insensitive values."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SF_DIR), reason="driver testdata not present"
)


def _duck_conn():
    con = duckdb.connect()
    for name in entry_mod._TABLES:
        path = f"{SF_DIR}/{name}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon_value(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    return str(v)


def _canon_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon_value(r[i]) for i in idx) for r in rows)


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"url", "extracted_text", "status"} <= set(df.columns)


def test_hll_sketch_within_tolerance(spark):
    """HLL coverage: approx_count_distinct sketches are engine-specific, so
    the CORRECTNESS row now uses the deterministic KMV estimator instead
    (exact cross-engine match); the HLL operator itself stays pinned here —
    the estimate must sit within its published ~2.3% rsd (10% margin)."""
    entry_mod._load(spark, SF_DIR, "events")
    rows = spark.sql(
        "SELECT event_type, approx_count_distinct(user_id) AS a, "
        "count(DISTINCT user_id) AS e FROM events GROUP BY event_type"
    ).collect()
    assert rows
    for r in rows:
        assert abs(r.a - r.e) <= max(2, 0.1 * r.e), r


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_matches_oracle(spark, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    oracles = entry_mod.oracle_sql()
    if name not in oracles:
        assert len(spark_rows) >= 0  # rows-only check
        return

    con = _duck_conn()
    res = con.execute(oracles[name])
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    a = _canon_rows(spark_cols, spark_rows)
    b = _canon_rows(duck_cols, duck_rows)
    mismatch = [i for i, (x, y) in enumerate(zip(a, b)) if x != y]
    assert not mismatch, (
        f"{name}: {len(mismatch)} value mismatches, first: "
        f"{a[mismatch[0]]} vs {b[mismatch[0]]}"
    )
