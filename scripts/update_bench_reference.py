"""Refresh BENCH/reference_timings.json (the throttle detector's
good-window per-query reference) from a bench artifact measured in a
HEALTHY host window.

Discipline (CLAUDE.md): probe local[8] first and only record from a
window where the extract probe clears ~5000 docs/s — a reference captured
inside a throttle window would mask future spikes.

    python scripts/update_bench_reference.py path/to/bench_rN_local.json
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "BENCH", "reference_timings.json")


def main() -> None:
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    src = sys.argv[1]
    if len(sys.argv) > 2 and sys.argv[2] == "--merge" and not sys.argv[3:]:
        # ADVICE r7: a bare --merge used to fall through to full-replace
        sys.exit("usage: update_bench_reference.py ARTIFACT --merge Q1 [Q2 ...]")
    merge_only = sys.argv[3:] if len(sys.argv) > 3 and sys.argv[2] == "--merge" else None
    with open(src, encoding="utf-8") as f:
        artifact = json.load(f)
    flagged = set(artifact.get("throttling_suspected") or [])
    if merge_only is None:
        if flagged:
            sys.exit(
                f"refusing: {src} itself flags throttling_suspected="
                f"{sorted(flagged)} — measure in a clean window"
            )
        queries = dict(artifact["queries"])
    else:
        # Per-query merge (r7): the host stalls intermittently for single
        # reps even inside otherwise-healthy windows, so a 20-query
        # artifact is rarely flag-free end to end. Merging ONLY named
        # queries that the source artifact did NOT flag keeps the honesty
        # property per entry — each reference number still comes from a
        # window where THAT query measured clean — while letting new
        # queries gain throttle coverage without waiting for a perfect
        # all-20 run (the r6 'new queries ship flag-free' hole).
        bad = sorted(set(merge_only) & flagged)
        if bad:
            sys.exit(f"refusing --merge: {bad} are flagged in {src}")
        missing = sorted(set(merge_only) - set(artifact["queries"]))
        if missing:
            sys.exit(f"refusing --merge: {missing} not in {src}")
        with open(OUT, encoding="utf-8") as f:
            existing = json.load(f)
        queries = existing["queries"]
        # ADVICE r7: most entries are carried over from the existing file,
        # so its sf/cpus scope must match the artifact's — refuse a merge
        # that would silently mix scales
        for k in ("sf", "cpus"):
            if str(existing.get(k)) != str(artifact.get(k, existing.get(k))):
                sys.exit(
                    f"refusing --merge: {k}={artifact.get(k)} in {src} vs "
                    f"{existing.get(k)} in {OUT}"
                )
        for name in merge_only:
            queries[name] = artifact["queries"][name]
    # VERDICT r5 #2: the local8 scaling probe is part of the flag coverage;
    # carry its good-window wall into the reference whenever the artifact
    # has one, so a future throttled probe can't ship flag-free.
    if merge_only is None and artifact.get("extract_fused_local8_wall_sec") is not None:
        queries["extract_fused_local8"] = artifact["extract_fused_local8_wall_sec"]
    payload = {
        "_comment": (
            "Per-query good-window reference for bench.py's throttle "
            "detector (VERDICT r4 #4): best-of-N seconds measured in a "
            "healthy host window at sf0.1 local[32]. Refresh via "
            "scripts/update_bench_reference.py when code changes move a "
            "query's honest cost."
        ),
        "source": os.path.relpath(src, REPO)
        if merge_only is None
        else existing.get("source", "")
        + f" + merge[{','.join(merge_only)}]:{os.path.relpath(src, REPO)}",
        "sf": artifact.get("sf") if merge_only is None else existing.get("sf"),
        "cpus": artifact.get("cpus", "32")
        if merge_only is None
        else existing.get("cpus", "32"),
        "queries": queries,
    }
    with open(OUT, "w", encoding="utf-8") as f:
        json.dump(payload, f, indent=2)
    print(f"wrote {OUT} from {src} ({len(queries)} queries)")


if __name__ == "__main__":
    main()
