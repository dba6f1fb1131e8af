"""One throughput measurement at a given parallelism level (fresh JVM).

Invoked by bench_scaling.py as a subprocess per level so each level gets its
own SparkSession/JVM (one JVM cannot switch local[N]):

    python BENCH/run_throughput.py --master local[8] --pages <parquet> \
        [--parts 24] [--warmup 512]

Prints one JSON line {"master", "docs", "wall_sec", "docs_per_sec"}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from engine.pipeline import run_extract  # noqa: E402
from engine.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", required=True)
    ap.add_argument("--pages", required=True)
    ap.add_argument("--parts", type=int, default=None,
                    help="enable url-salted repartition with this many parts "
                         "(default: scan partitioning, zero shuffle)")
    ap.add_argument("--warmup", type=int, default=2048)
    args = ap.parse_args()

    cores = int(args.master[args.master.find("[") + 1 : args.master.find("]")])
    parts = args.parts

    # fine-grained input splits at every level so low-core runs don't suffer
    # coarse-wave imbalance (default split target scales with cores)
    spark = get_spark(
        app_name=f"throughput-{cores}",
        master=args.master,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "8m",
            "spark.sql.files.openCostInBytes": "1m",
        },
    )
    pages = spark.read.parquet(args.pages)
    n = pages.count()

    # warm-up: JIT, Arrow channel, python worker pool
    run_extract(pages.limit(args.warmup), mode="fused", num_parts=None).write.format(
        "noop"
    ).mode("overwrite").save()

    t0 = time.monotonic()
    run_extract(pages, mode="fused", num_parts=parts).write.format("noop").mode(
        "overwrite"
    ).save()
    wall = time.monotonic() - t0

    print(
        json.dumps(
            {
                "master": args.master,
                "docs": n,
                "parts": parts if parts is not None else "scan",
                "wall_sec": round(wall, 3),
                "docs_per_sec": round(n / wall, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
