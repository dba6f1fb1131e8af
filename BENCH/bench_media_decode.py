"""Media-decode throughput: pure-Python decoders vs the JVM mediadec twin.

The r3 verdict's one perf-weak finding was per-pixel pure-Python media
decode; the fix is engine/java/mediadec (javax.imageio / javax.sound inside
the JVM). This bench measures both paths on the SAME synthesized payload
corpus (real PNGs + real baseline JPEGs, bigger rasters than the gate's tiny
ones so per-pixel cost dominates) and prints the throughput ratio.

Measurement discipline (CLAUDE.md): each (path, format) sample runs in a
FRESH subprocess (own JVM), interleaved A/B, best-of-N; numbers on this VM
wobble 2-3x, so the artifact records all samples plus the spread.

    python BENCH/bench_media_decode.py [--n 4000] [--runs 3] [--wh 96x64]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _build_corpus(out_dir: str, n: int, w: int, h: int) -> None:
    """Write payload parquet once (driver-side synthesis, not timed):
    n real PNGs (all five filters cycling) + n real DC-only JPEGs."""
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.jpeg import build_jpeg
    from engine.multimodal import encode_png

    rng = random.Random(42)
    png_rows, jpg_rows = [], []
    for i in range(n):
        pix = bytes(rng.randrange(256) for _ in range(w * h * 3))
        png_rows.append((i, encode_png(w, h, 3, pix, filter_of_row=lambda r: r % 5)))
        blk = [rng.randrange(-24, 25)] + [0] * 63
        mcus = ((w + 7) // 8) * ((h + 7) // 8)
        jpg_rows.append((i, build_jpeg(w, h, [8] * 64, [[list(blk)] * mcus])))
    for name, rows in (("png", png_rows), ("jpeg", jpg_rows)):
        tbl = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "payload": pa.array([r[1] for r in rows], pa.binary()),
            }
        )
        pq.write_table(tbl, os.path.join(out_dir, f"{name}.parquet"))


_WORKER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from engine.session import get_spark
from engine.multimodal import decode_images, decode_images_jvm

spark = get_spark(app_name="bench-media", master="local[{cores}]")
df = spark.read.parquet({src!r})
n = df.count()
fn = decode_images_jvm if {jvm} else decode_images
# warm-up: JIT / Arrow channel / python worker pool on a slice
fn(df.limit(256)).agg(F.sum("n_pixel_bytes")).collect()
t0 = time.monotonic()
# aggregate over the decode output so Catalyst cannot prune the decode
row = fn(df).agg(F.sum("n_pixel_bytes").alias("b"),
                 F.count(F.when(F.col("status") == "ok", 1)).alias("ok")).collect()[0]
dt = time.monotonic() - t0
print(json.dumps({{"docs": n, "ok": row["ok"], "bytes": int(row["b"]),
                   "wall_sec": round(dt, 3),
                   "docs_per_sec": round(n / dt, 1)}}))
"""


def _sample(src: str, jvm: bool, cores: int) -> dict:
    code = _WORKER.format(repo=REPO, src=src, jvm=jvm, cores=cores)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, check=True,
        cwd=REPO,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4000)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--wh", default="96x64")
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--out", default="/tmp/bench_media_corpus")
    args = ap.parse_args()
    w, h = (int(x) for x in args.wh.split("x"))

    os.makedirs(args.out, exist_ok=True)
    marker = os.path.join(args.out, f"built_{args.n}_{args.wh}")
    if not os.path.exists(marker):
        t0 = time.monotonic()
        _build_corpus(args.out, args.n, w, h)
        open(marker, "w").close()
        print(f"corpus: {args.n} PNGs + {args.n} JPEGs at {w}x{h} "
              f"({time.monotonic() - t0:.1f}s)", file=sys.stderr)

    result: dict = {"n": args.n, "wh": args.wh, "cores": args.cores, "formats": {}}
    for fmt in ("png", "jpeg"):
        src = os.path.join(args.out, f"{fmt}.parquet")
        py_samples, jvm_samples = [], []
        for _ in range(args.runs):  # interleaved A/B, fresh JVM each
            py_samples.append(_sample(src, jvm=False, cores=args.cores))
            jvm_samples.append(_sample(src, jvm=True, cores=args.cores))
        best_py = max(s["docs_per_sec"] for s in py_samples)
        best_jvm = max(s["docs_per_sec"] for s in jvm_samples)
        result["formats"][fmt] = {
            "python_docs_per_sec": best_py,
            "jvm_docs_per_sec": best_jvm,
            "speedup": round(best_jvm / best_py, 2),
            "python_samples": [s["docs_per_sec"] for s in py_samples],
            "jvm_samples": [s["docs_per_sec"] for s in jvm_samples],
            "spread_python": round(
                best_py / min(s["docs_per_sec"] for s in py_samples), 2
            ),
            "spread_jvm": round(
                best_jvm / min(s["docs_per_sec"] for s in jvm_samples), 2
            ),
        }
        print(f"{fmt}: python {best_py}/s  jvm {best_jvm}/s  "
              f"speedup {result['formats'][fmt]['speedup']}x", file=sys.stderr)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
