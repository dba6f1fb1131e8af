"""Mirror the driver's correctness gate at an arbitrary scale factor.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet directory, comparing row counts, column names,
and order-insensitive canonicalized values — exactly the comparison the
driver records into CORRECTNESS_r{N}.json (tests/test_entry_contract.py is
the pytest twin pinned to sf0.001; this script defaults to sf0.01, the
driver's gate scale).

    python scripts/check_gate.py [--sf /root/testdata/sf0.01] [--only name ...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _canon(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{v:.6g}"
    return str(v)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--master", default="local[16]")
    ap.add_argument("--json", default=None,
                    help="also write driver-format CORRECTNESS json here")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as em
    from engine.session import get_spark

    spark = get_spark(app_name="check-gate", master=args.master)
    con = duckdb.connect()
    for t in em._TABLES:
        p = f"{args.sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    names = args.only or sorted(em.queries().keys())
    failures: list[str] = []
    results: dict[str, dict] = {}
    t_all = time.monotonic()
    for name in names:
        t0 = time.monotonic()
        try:
            sdf = em.queries()[name](spark, args.sf)
            cols = [c.lower() for c in sdf.columns]
            srows = sdf.collect()
            res = con.execute(em.oracle_sql()[name])
            dcols = [d[0].lower() for d in res.description]
            drows = res.fetchall()
            si = sorted(range(len(cols)), key=lambda i: cols[i])
            di = sorted(range(len(dcols)), key=lambda i: dcols[i])
            a = sorted(tuple(_canon(r[i]) for i in si) for r in srows)
            b = sorted(tuple(_canon(r[i]) for i in di) for r in drows)
            ok = sorted(cols) == sorted(dcols) and a == b
            detail = f"{len(a)} rows" if ok else (
                f"cols {cols} vs {dcols}" if sorted(cols) != sorted(dcols)
                else f"{len(a)}/{len(b)} rows, first diff: "
                + next((f"{x} vs {y}" for x, y in zip(a, b) if x != y), "row count")
            )
            results[name] = {
                "rows_match": len(a) == len(b),
                "schema_match": sorted(cols) == sorted(dcols),
                "hash_match": ok,
                "spark_rows": len(a),
                "oracle_rows": len(b),
                "err": None,
            }
        except Exception as e:  # noqa: BLE001 — report, keep checking
            ok, detail = False, f"EXC {e!r:.200}"
            results[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": None,
                "oracle_rows": None, "err": repr(e)[:300],
            }
        status = "ok " if ok else "FAIL"
        print(f"{status} {name:28s} {time.monotonic() - t0:6.1f}s  {detail}")
        if not ok:
            failures.append(name)
    print(f"-- {len(names)} queries in {time.monotonic() - t_all:.0f}s; "
          f"failures: {failures or 'none'}")
    if args.json:
        import json as _json

        with open(args.json, "w", encoding="utf-8") as f:
            _json.dump(results, f, indent=2)
        print(f"wrote {args.json}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
