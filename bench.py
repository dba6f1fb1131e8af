"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The flagship number is the extraction pipeline over a ≥20k-doc synthesized
pages corpus with a skewed size distribution (BASELINE.md protocol); docs/sec
is reported alongside. Scaling evidence (local[8] vs local[32]) lives in
BENCH/bench_scaling.py → BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
BENCH_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "20000"))


def bench_pages_path(n: int) -> str:
    path = f"/tmp/spark_graft_bench_pages_{n}_v5.parquet"
    if not os.path.exists(path):
        from fixtures.gen_pages import gen_rows, write_parquet

        write_parquet(gen_rows(n, seed=42), path)
    return path


def _force(df) -> int:
    """Fully evaluate a DataFrame (noop sink — no write-side I/O cost)."""
    df.write.format("noop").mode("overwrite").save()
    return 0


REFERENCE_TIMINGS_PATH = os.path.join(REPO, "BENCH", "reference_timings.json")


def load_reference_timings(
    path: str = REFERENCE_TIMINGS_PATH,
    sf: str | None = None,
    cpus: str | None = None,
) -> dict[str, float]:
    """Committed good-window per-query timings (seconds). Missing file ->
    empty dict (the spread heuristic still applies). The reference is
    scoped to the scale factor / core count it was measured at (review
    r5): a run at a different SPARK_GRAFT_SF_DIR or SPARK_GRAFT_CPUS is
    honestly slower, not throttled, so a mismatch disables the
    cross-run comparison instead of mass-flagging every query."""
    try:
        with open(path, encoding="utf-8") as f:
            payload = json.load(f)
        if sf is not None and "sf" in payload and str(payload["sf"]) != str(sf):
            return {}
        if (
            cpus is not None
            and "cpus" in payload
            and str(payload["cpus"]) != str(cpus)
        ):
            return {}
        return {k: float(v) for k, v in payload["queries"].items()}
    except (OSError, KeyError, ValueError):
        return {}


# Per-entry cross-run ratio overrides. The local[8] scaling probe gets a
# TIGHTER threshold (VERDICT r5 #2): the committed reference wall (from
# the best-of-1 subprocess, 4789 docs/s) already sits ~25% below the
# BASELINE.md healthy-window peak (~6400), so the throttled BENCH_r05
# probe (2234 docs/s — 2.9x under the peak) was only 2.1x over the
# reference and the default 3x let it ship flag-free. 2.0x on the probe
# catches that dip while staying above the ~1.0-1.5x wobble the probe
# shows inside healthy windows.
REF_RATIO_OVERRIDES = {"extract_fused_local8": 2.0}


def throttle_flags(
    timings: dict[str, float],
    spread: dict[str, float],
    reference: dict[str, float],
    spread_ratio: float = 2.0,
    ref_ratio: float = 3.0,
    ref_ratio_overrides: dict[str, float] | None = None,
) -> list[str]:
    """Per-query throttle suspicion (VERDICT r4 #4). Two signals:

    - intra-run: spread/best > ``spread_ratio`` (both samples must straddle
      the window edge for this to fire — the r2 heuristic);
    - cross-run: best > ``ref_ratio`` x the committed good-window reference
      (catches a whole-run throttle window where every sample is slow and
      the spread looks clean — the r4 driver artifact carried an 8x simhash
      spike the spread-only heuristic missed). Entries in
      ``ref_ratio_overrides`` (default :data:`REF_RATIO_OVERRIDES`) use
      their own ratio — the local8 scaling probe flags at 2x.

    Queries absent from the reference fall back to spread-only."""
    if ref_ratio_overrides is None:
        ref_ratio_overrides = REF_RATIO_OVERRIDES
    flagged = set()
    for name, best in timings.items():
        if best <= 0:
            continue
        if spread.get(name, 0.0) / best > spread_ratio:
            flagged.add(name)
        ref = reference.get(name)
        ratio = ref_ratio_overrides.get(name, ref_ratio)
        if ref is not None and ref > 0 and best > ratio * ref:
            flagged.add(name)
    return sorted(flagged)


def main() -> None:
    import __spark_entry__ as em
    from engine.pipeline import run_extract
    from engine.session import get_spark

    spark = get_spark(app_name="spark-extract-bench", master=f"local[{CPUS}]")
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    timings: dict[str, float] = {}
    # per-query best AND spread (VERDICT r2 #8): two r2 throttle spikes read
    # as regressions until the judge reran them — spread/best > 2 now flags
    # a throttling window right in the artifact.
    spread: dict[str, float] = {}

    # --- flagship: extraction over the skewed bench corpus ----------------
    pages_path = bench_pages_path(BENCH_DOCS)
    pages = spark.read.parquet(pages_path)
    n_docs = pages.count()
    # warm-up (JVM/Arrow/python-worker spin-up), small slice
    _force(run_extract(pages.limit(512), mode="fused"))
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "128")
    # best of 3: this VM shows host-level throttling windows (CLAUDE.md)
    runs = []
    for _ in range(3):
        t0 = time.monotonic()
        _force(run_extract(pages, mode="fused"))
        runs.append(time.monotonic() - t0)
    timings["extract_fused"] = round(min(runs), 3)
    spread["extract_fused"] = round(max(runs) - min(runs), 3)
    docs_per_sec = round(n_docs / timings["extract_fused"], 1)

    # staged ships tiny block rows -> big Arrow batches win (see engine/stages.py)
    # best of 2: staged is the widest wobble on this host (three Python
    # stages x throttling windows), so single runs mislead round-over-round
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
    staged_runs = []
    for _ in range(2):
        t0 = time.monotonic()
        _force(run_extract(pages, mode="staged"))
        staged_runs.append(time.monotonic() - t0)
    timings["extract_staged"] = round(min(staged_runs), 3)
    spread["extract_staged"] = round(max(staged_runs) - min(staged_runs), 3)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "128")

    # --- headline operator queries at SF_DIR ------------------------------
    # warm-touch every table once so the first timed query does not absorb
    # the parquet footer reads / first-touch page cache for its tables
    for t in ("documents", "events", "lineitem", "orders", "customer",
              "nation", "region", "part", "embeddings"):
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            spark.read.parquet(p).count()
    qs = em.queries()
    for name in (
        "tpch_q1",
        "tpch_q3_top10",
        "sessionize",
        "window_rollup",
        "dedup_exact",
        "minhash_signatures",
        "simhash_fingerprint",
        "embedding_topk",
        "ann_ivf_topk",
        "ann_ivf_topk_trained",
        "ann_ivf_topk_trained_hr",
        "substring_dedup",
        "url_blocklist_gate",
        "asof_join",
        "quality_score",
        "broadcast_rollup",
        # r7 additions
        "domain_rank",
        "bpe_encode_tokens",
    ):
        q_runs = []
        for _ in range(2):
            t0 = time.monotonic()
            _force(qs[name](spark, SF_DIR))
            q_runs.append(time.monotonic() - t0)
        timings[name] = round(min(q_runs), 3)
        spread[name] = round(max(q_runs) - min(q_runs), 3)

    # --- media decode A/B (r4): JVM javax.imageio twin vs the pure-Python
    # oracle decoder, same 96x64 real-PNG corpus — the r3 perf-weak fix,
    # reported as top-level docs/sec so the headline query set stays
    # comparable across rounds. Full fresh-JVM interleaved A/B lives in
    # BENCH/bench_media_decode.py; this inline probe tracks the ratio.
    media_png_python_dps = None
    media_png_jvm_dps = None
    try:
        from BENCH.bench_media_decode import _build_corpus
        from engine.multimodal import decode_images, decode_images_jvm

        media_dir = "/tmp/spark_graft_bench_media_v1"
        marker = os.path.join(media_dir, "built_2000_96x64")
        if not os.path.exists(marker):
            os.makedirs(media_dir, exist_ok=True)
            _build_corpus(media_dir, 2000, 96, 64)
            open(marker, "w").close()
        pngs = spark.read.parquet(f"{media_dir}/png.parquet")
        n_media = pngs.count()
        for fn in (decode_images, decode_images_jvm):  # warm both paths
            _force(fn(pngs.limit(128)))
        t0 = time.monotonic()
        _force(decode_images(pngs))
        media_png_python_dps = round(n_media / (time.monotonic() - t0), 1)
        t0 = time.monotonic()
        _force(decode_images_jvm(pngs))
        media_png_jvm_dps = round(n_media / (time.monotonic() - t0), 1)
    except Exception:  # noqa: BLE001 — bench must still emit its JSON line
        pass

    # local[8] flagship in a fresh subprocess (one JVM can't switch local[N];
    # CLAUDE.md measurement discipline) — makes per-round scaling regressions
    # visible in BENCH_r{N}.json without rerunning BENCH/bench_scaling.py.
    local8_docs_per_sec = None
    local8_wall_sec = None
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "BENCH", "run_throughput.py"),
             "--master", "local[8]", "--pages", pages_path, "--warmup", "512"],
            capture_output=True, text=True, timeout=600, cwd=REPO,
        )
        local8 = json.loads(out.stdout.strip().splitlines()[-1])
        # top-level, NOT in timings (ADVICE r2 #2): folding a sometimes-
        # missing probe into total_wall_sec made round-over-round totals
        # incomparable depending on whether the subprocess succeeded.
        local8_wall_sec = local8["wall_sec"]
        local8_docs_per_sec = local8["docs_per_sec"]
    except Exception:  # noqa: BLE001 — bench must still emit its JSON line
        pass

    total = round(sum(timings.values()), 3)
    # The scaling probe joins the FLAG computation but stays out of
    # `timings`/total (ADVICE r2 #2: totals must stay round-comparable
    # whether or not the subprocess succeeded). VERDICT r5 #2: BENCH_r05
    # carried a 2.9x-low local8 probe flag-free because only headline
    # queries were compared — now the probe's wall time is checked against
    # its own good-window reference like any query.
    flag_timings = dict(timings)
    if local8_wall_sec is not None:
        flag_timings["extract_fused_local8"] = local8_wall_sec
    throttled = throttle_flags(
        flag_timings, spread, load_reference_timings(sf=sf, cpus=CPUS)
    )
    print(
        json.dumps(
            {
                "metric": "bench_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "spread": spread,
                "throttling_suspected": throttled,
                "sf": sf,
                "cpus": CPUS,
                "n": 3,
                "extract_docs": n_docs,
                "extract_docs_per_sec": docs_per_sec,
                "extract_fused_local8_wall_sec": local8_wall_sec,
                "extract_docs_per_sec_local8": local8_docs_per_sec,
                "media_decode_png_python_docs_per_sec": media_png_python_dps,
                "media_decode_png_jvm_docs_per_sec": media_png_jvm_dps,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
