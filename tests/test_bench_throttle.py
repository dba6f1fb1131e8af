"""bench.py throttle heuristic (VERDICT r4 #4): the r4 driver artifact
carried an 8x simhash host-throttle spike that the spread-only detector
missed (both samples sat inside the slow window, so the spread looked
clean). The detector now also compares each query's best against the
committed good-window reference (BENCH/reference_timings.json) and flags
>3x divergence."""

from __future__ import annotations

import bench


def test_reference_artifact_is_committed_and_loads():
    ref = bench.load_reference_timings()
    assert ref and all(v > 0 for v in ref.values())
    # the query whose r4 spike motivated the detector must be covered
    assert "simhash_fingerprint" in ref


def test_whole_window_spike_is_flagged_by_reference():
    """The exact r4 miss, replayed: simhash 11.47 s vs a 1.42 s good-window
    reference with a clean 0.2 s spread — must now be flagged."""
    ref = {"simhash_fingerprint": 1.42}
    timings = {"simhash_fingerprint": 11.47}
    spread = {"simhash_fingerprint": 0.2}
    assert bench.throttle_flags(timings, spread, ref) == ["simhash_fingerprint"]


def test_honest_wobble_is_not_flagged():
    """2-3x is this VM's documented normal wobble — below both thresholds."""
    assert bench.throttle_flags({"q": 2.9}, {"q": 0.5}, {"q": 1.0}) == []


def test_spread_heuristic_still_fires_without_reference():
    assert bench.throttle_flags({"q": 1.0}, {"q": 2.5}, {}) == ["q"]


def test_both_signals_union_and_sort():
    got = bench.throttle_flags(
        {"a": 1.0, "b": 10.0, "c": 1.0},
        {"a": 3.0, "b": 0.1, "c": 0.1},
        {"b": 1.0, "c": 1.0},
    )
    assert got == ["a", "b"]


def test_throttled_local8_probe_is_flagged():
    """VERDICT r5 #2's mechanism: the scaling probe flags at its own 2.0x
    ratio (the r5 artifact's 2.1x-slow probe shipped flag-free under the
    default 3x — that hole must stay closed). Pinned RELATIVE to the
    committed reference, not to a frozen wall: honest good-window
    refreshes legitimately move the probe's reference (4.176 s in r5,
    4.764 s in r7) and must not decay this pin into a stale constant."""
    ref = bench.load_reference_timings()
    assert "extract_fused_local8" in ref
    wall = ref["extract_fused_local8"]
    timings = {"extract_fused": 1.69, "extract_fused_local8": wall * 2.1}
    spread = {"extract_fused": 0.1}
    assert bench.throttle_flags(timings, spread, ref) == ["extract_fused_local8"]
    # the reference's own healthy-window probe: clean
    assert bench.throttle_flags({"extract_fused_local8": wall}, {}, ref) == []
    # honest wobble below 2x stays clean on the probe too
    assert bench.throttle_flags(
        {"extract_fused_local8": wall * 1.9}, {}, ref
    ) == []


def test_missing_reference_file_degrades_gracefully(tmp_path):
    assert bench.load_reference_timings(str(tmp_path / "nope.json")) == {}


def test_reference_is_scoped_to_its_sf_and_cpus(tmp_path):
    """Review r5: a run at a different scale factor or core count is
    honestly slower, not throttled — the cross-run comparison must
    disable itself instead of mass-flagging the whole suite."""
    import json

    p = str(tmp_path / "ref.json")
    json.dump({"sf": "0.1", "cpus": "32", "queries": {"q": 1.0}}, open(p, "w"))
    assert bench.load_reference_timings(p, sf="0.1", cpus="32") == {"q": 1.0}
    assert bench.load_reference_timings(p, sf="1", cpus="32") == {}
    assert bench.load_reference_timings(p, sf="0.1", cpus="8") == {}
    # committed reference carries its scope
    ref = json.load(open(bench.REFERENCE_TIMINGS_PATH))
    assert ref.get("sf") and ref.get("cpus")


def test_reference_merge_refuses_flagged_queries(tmp_path):
    """r7: the per-query --merge path must refuse a query the source
    artifact itself flagged (each reference entry must come from a window
    where THAT query measured clean)."""
    import json
    import subprocess
    import sys

    src = tmp_path / "art.json"
    src.write_text(json.dumps({
        "queries": {"q_ok": 1.0, "q_bad": 9.0},
        "throttling_suspected": ["q_bad"],
        "sf": "0.1", "cpus": "32",
    }))
    out = subprocess.run(
        [sys.executable, "scripts/update_bench_reference.py",
         str(src), "--merge", "q_bad"],
        capture_output=True, text=True,
    )
    assert out.returncode != 0 and "q_bad" in (out.stdout + out.stderr)
    out2 = subprocess.run(
        [sys.executable, "scripts/update_bench_reference.py",
         str(src), "--merge", "nope"],
        capture_output=True, text=True,
    )
    assert out2.returncode != 0 and "nope" in (out2.stdout + out2.stderr)
