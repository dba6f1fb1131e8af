"""Per-query isolation bench (r8, guide §1.4): times selected registry
queries with the SAME methodology as the frozen driver bench.py (noop sink,
best-of-N, warm table touch) without modifying it. Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py q1 q2 ...
    python bench_extra.py --runs 3 ann_ivf_topk substring_dedup

Prints one JSON line {"queries": {name: best_sec}, "spread": {...}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    args = [a for a in sys.argv[1:]]
    runs = 2
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]
    import __spark_entry__ as em
    from engine.session import get_spark

    spark = get_spark(app_name="bench-extra", master=f"local[{CPUS}]")
    for t in ("documents", "events", "lineitem", "orders", "customer",
              "nation", "region", "part", "embeddings"):
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            spark.read.parquet(p).count()
    qs = em.queries()
    timings, spread = {}, {}
    for name in args:
        samples = []
        for _ in range(runs):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.monotonic()
            _force(qs[name](spark, SF_DIR))
            samples.append(time.monotonic() - t0)
            spark.sparkContext.setJobDescription(None)
        timings[name] = round(min(samples), 3)
        spread[name] = round(max(samples) - min(samples), 3)
    print(json.dumps({
        "queries": timings, "spread": spread,
        "sf": SF_DIR.rstrip("/").split("sf")[-1], "cpus": CPUS, "runs": runs,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
