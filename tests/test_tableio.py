"""TableIO edge cases: missing-table reads, atomic replace, empty updates,
and the Iceberg routing guard."""

from __future__ import annotations

import os

from engine import pipeline, tableio


def test_read_missing_table_returns_none(spark, tmp_path):
    assert tableio.read_table(spark, str(tmp_path / "nope")) is None


def test_write_table_atomic_replace(spark, pages_unit_path, tmp_path):
    out = str(tmp_path / "t")
    pages = spark.read.parquet(pages_unit_path)
    tableio.write_table(pages.limit(10).select("url"), out)
    assert spark.read.parquet(out).count() == 10
    tableio.write_table(pages.limit(3).select("url"), out)  # replace
    assert spark.read.parquet(out).count() == 3
    assert not [d for d in os.listdir(tmp_path) if ".tmp-" in d]  # no tmp leftovers


def test_merge_with_empty_updates_is_noop(spark, pages_unit_path, tmp_path):
    out = str(tmp_path / "t")
    pages = spark.read.parquet(pages_unit_path)
    ext = pipeline.run_extract(pages.limit(12), run_id="a")
    tableio.merge_by_url(spark, out, ext)
    before = {r["url"] for r in spark.read.parquet(out).collect()}
    tableio.merge_by_url(spark, out, ext.filter("1 = 0"))  # empty updates
    after = {r["url"] for r in spark.read.parquet(out).collect()}
    assert before == after and len(before) == 12


def test_iceberg_unavailable_in_sandbox(spark):
    assert tableio.iceberg_available(spark) is False  # documented sandbox fact


def test_iceberg_merge_statement_parses(spark):
    """SQL contract for the unreachable Iceberg path (VERDICT r1): Spark's
    own parser must accept the exact statement merge_by_url_iceberg runs and
    produce a MergeIntoTable plan with both WHEN clauses — catching syntax
    rot without needing the runtime jar."""
    sql = tableio.merge_sql("cat.db.extracted")
    plan = spark._jsparkSession.sessionState().sqlParser().parsePlan(sql)
    assert plan.getClass().getSimpleName() == "MergeIntoTable"
    s = plan.toString()
    assert "UpdateStarAction" in s or "update" in s.lower()
    assert "InsertStarAction" in s or "insert" in s.lower()


def _bucket_state(path):
    """{bucket dir -> sorted [(file, mtime_ns, size)]} for swap detection."""
    state = {}
    for d in os.listdir(path):
        if not d.startswith("bucket="):
            continue
        full = os.path.join(path, d)
        state[d] = sorted(
            (f, os.stat(os.path.join(full, f)).st_mtime_ns,
             os.stat(os.path.join(full, f)).st_size)
            for f in os.listdir(full)
            if f.endswith(".parquet")
        )
    return state


def test_merge_rewrites_only_dirty_buckets(spark, pages_unit_path, tmp_path):
    """Incremental merge is O(updates): buckets the updates do not hash into
    keep their exact files and mtimes (VERDICT r1 #4)."""
    out = str(tmp_path / "t")
    pages = spark.read.parquet(pages_unit_path)
    full = pipeline.run_extract(pages, run_id="a")
    tableio.merge_by_url(spark, out, full, n_buckets=8)
    before = _bucket_state(out)
    assert len(before) > 1  # corpus spans several buckets

    one_url = spark.read.parquet(out).select("url").first()["url"]
    upd = pipeline.run_extract(pages.filter(pages.url == one_url), run_id="b")
    tableio.merge_by_url(spark, out, upd, n_buckets=8)
    after = _bucket_state(out)

    from pyspark.sql import functions as F

    dirty = (
        spark.createDataFrame([(one_url,)], "url string")
        .select(F.pmod(F.xxhash64("url"), F.lit(8)).cast("int").alias("b"))
        .first()["b"]
    )
    assert before.keys() == after.keys()
    for d in before:
        if d == f"bucket={dirty}":
            assert before[d] != after[d]  # dirty bucket rewritten
        else:
            assert before[d] == after[d], d  # clean bucket untouched

    # semantics unchanged: still one row per url, update won
    final = spark.read.parquet(out)
    assert final.groupBy("url").count().filter("count > 1").count() == 0
    assert final.filter(f"url = '{one_url}'").first()["lineage"] == "b"


def test_read_url_prunes_to_one_bucket(spark, pages_unit_path, tmp_path):
    """Point lookup reads only the bucket the url hashes into: result equals
    the full-table filter, its scan lists exactly one bucket=N directory,
    and misses/flat layouts degrade gracefully."""
    out = str(tmp_path / "t")
    pages = spark.read.parquet(pages_unit_path)
    tableio.merge_by_url(spark, out, pipeline.run_extract(pages, run_id="a"),
                         n_buckets=8)
    assert os.path.exists(os.path.join(out, "_layout.json"))
    url = spark.read.parquet(out).select("url").first()["url"]

    got = tableio.read_url(spark, out, url)
    full = spark.read.parquet(out).drop("bucket").filter(f"url = '{url}'")
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in full.collect()]
    # the pruned plan's file index lists exactly ONE path (the bucket dir;
    # long paths are truncated in the plan string, so match the count)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryFileIndex(1 paths)" in plan, plan
    # miss: empty result, same schema
    miss = tableio.read_url(spark, out, "no-such-url")
    assert miss.count() == 0 and set(miss.columns) == set(full.columns)
    # flat layout fallback
    flat = str(tmp_path / "flat")
    tableio.write_table(pipeline.run_extract(pages.limit(8), run_id="b"), flat)
    u2 = spark.read.parquet(flat).select("url").first()["url"]
    assert tableio.read_url(spark, flat, u2).count() == 1
    assert tableio.read_url(spark, str(tmp_path / "absent"), "x") is None


def test_merge_migrates_flat_layout(spark, pages_unit_path, tmp_path):
    """A table written flat (write_table) is migrated to buckets on first
    merge, with upsert semantics intact."""
    out = str(tmp_path / "t")
    pages = spark.read.parquet(pages_unit_path)
    tableio.write_table(pipeline.run_extract(pages, run_id="a"), out)
    assert not any(d.startswith("bucket=") for d in os.listdir(out))
    upd = pipeline.run_extract(pages.limit(5), run_id="b")
    tableio.merge_by_url(spark, out, upd, n_buckets=8)
    assert any(d.startswith("bucket=") for d in os.listdir(out))
    final = spark.read.parquet(out)
    assert final.count() == 64
    assert final.filter("lineage = 'b'").count() == 5
    assert final.groupBy("url").count().filter("count > 1").count() == 0


def test_merge_respects_existing_layout_and_lookup_survives(spark, tmp_path):
    """ADVICE r2 #1: a merge invoked with a DIFFERENT n_buckets than the
    table's recorded layout must not scatter rows into wrong buckets — the
    table's _layout.json wins, and the point lookup still finds every url."""
    from engine import tableio

    target = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(f"u{i}", f"t{i}") for i in range(20)], "url string, extracted_text string"
    )
    tableio.merge_by_url(spark, target, base, n_buckets=8)
    upd = spark.createDataFrame(
        [("u3", "NEW3"), ("u99", "NEW99")], "url string, extracted_text string"
    )
    # caller passes the wrong bucket count; recorded layout (8) must win
    tableio.merge_by_url(spark, target, upd, n_buckets=3)
    import json
    import os

    with open(os.path.join(target, "_layout.json"), encoding="utf-8") as f:
        assert json.load(f)["n_buckets"] == 8
    assert tableio.read_url(spark, target, "u3").collect()[0][
        "extracted_text"
    ] == "NEW3"
    assert tableio.read_url(spark, target, "u99").count() == 1
    assert tableio.read_table(spark, target).count() == 21


def test_read_url_falls_back_on_stale_manifest(spark, tmp_path):
    """A manifest claiming fewer buckets than the directories present is
    inconsistent — read_url must fall back to the (correct) pruned full-table
    plan instead of hashing into the wrong bucket and returning empty."""
    import json
    import os

    from engine import tableio

    target = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(f"u{i}", f"t{i}") for i in range(20)], "url string, extracted_text string"
    )
    tableio.merge_by_url(spark, target, base, n_buckets=8)
    with open(os.path.join(target, "_layout.json"), "w", encoding="utf-8") as f:
        json.dump({"n_buckets": 2}, f)  # stale: dirs go up to bucket=7
    for i in range(20):
        got = tableio.read_url(spark, target, f"u{i}")
        assert got.count() == 1, f"u{i} lost under stale manifest"


def test_compact_buckets_preserves_content(spark, tmp_path):
    """r4 rewrite_data_files analog: multi-file bucket dirs collapse to one
    file each; table contents, layout, and point lookup are unchanged;
    already-compact buckets keep their files untouched."""
    import os

    from engine import tableio

    path = str(tmp_path / "tbl")
    rows = [(f"u{i}", f"t{i}", 1) for i in range(64)]
    df = spark.createDataFrame(rows, "url string, extracted_text string, ver long")
    # high-parallelism merge -> several files per bucket
    tableio.merge_by_url(spark, path, df.repartition(8), n_buckets=4)
    before = sorted(tuple(r) for r in spark.read.parquet(path).drop("bucket").collect())
    multi = [
        d for d in os.listdir(path)
        if d.startswith("bucket=")
        and len([f for f in os.listdir(f"{path}/{d}") if f.endswith(".parquet")]) > 1
    ]
    assert multi, "setup failed to produce multi-file buckets"

    compacted = tableio.compact(spark, path)
    assert sorted(compacted) == sorted(int(d.split("=")[1]) for d in multi)
    for d in os.listdir(path):
        if d.startswith("bucket="):
            files = [f for f in os.listdir(f"{path}/{d}") if f.endswith(".parquet")]
            assert len(files) <= 1, d
    after = sorted(tuple(r) for r in spark.read.parquet(path).drop("bucket").collect())
    assert after == before
    # point lookup still bucket-prunes correctly
    hit = tableio.read_url(spark, path, "u7")
    assert hit is not None and hit.count() == 1
    # idempotent: second compact is a no-op
    assert tableio.compact(spark, path) == []


def test_range_read_skips_buckets_via_minmax_stats(spark, tmp_path):
    """VERDICT r4 #7 (Iceberg manifest min/max pruning analog): merges
    record per-bucket min/max for doc_id/warc_ts in _layout.json; a
    selective read_range lists strictly fewer files than the full table
    and returns exactly the full-scan filter's rows. Stats refresh
    incrementally on merge (only dirty buckets re-aggregated)."""
    import json
    from datetime import datetime, timedelta, timezone

    from pyspark.sql import functions as F

    from engine import tableio

    path = str(tmp_path / "tbl")
    urls = [f"u{i}" for i in range(64)]
    # assign doc_id/warc_ts CLUSTERED by the url's merge bucket, the layout
    # under which min/max stats can prune (time-correlated ingest batches)
    buckets = {
        r["url"]: r["b"]
        for r in spark.createDataFrame([(u,) for u in urls], "url string")
        .select("url", F.pmod(F.xxhash64("url"), F.lit(8)).cast("int").alias("b"))
        .collect()
    }
    t0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
    rows = []
    for i, u in enumerate(sorted(urls, key=lambda u: (buckets[u], u))):
        rows.append((u, 100 * buckets[u] + i % 100,
                     t0 + timedelta(hours=buckets[u] * 24 + i), f"t{i}"))
    df = spark.createDataFrame(
        rows, "url string, doc_id long, warc_ts timestamp, extracted_text string"
    )
    tableio.merge_by_url(spark, path, df, n_buckets=8)

    with open(f"{path}/_layout.json", encoding="utf-8") as f:
        layout = json.load(f)
    assert layout["stats"], "merge did not record min/max stats"
    assert all(set(s) == {"doc_id", "warc_ts"} for s in layout["stats"].values())

    # doc_id range covering exactly one bucket's span
    got = tableio.read_range(spark, path, "doc_id", 300, 350)
    full = spark.read.parquet(path).drop("bucket").filter(
        "doc_id between 300 and 350"
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, full.collect()))
    n_all = len(spark.read.parquet(path).inputFiles())
    assert 0 < len(got.inputFiles()) < n_all, "range scan did not skip files"

    # timestamp range: one bucket's 24h day
    lo, hi = t0 + timedelta(hours=48), t0 + timedelta(hours=71)
    got_ts = tableio.read_range(spark, path, "warc_ts", lo, hi)
    full_ts = spark.read.parquet(path).drop("bucket").filter(
        (F.col("warc_ts") >= F.lit(lo)) & (F.col("warc_ts") <= F.lit(hi))
    )
    assert sorted(map(tuple, got_ts.collect())) == sorted(
        map(tuple, full_ts.collect())
    )
    assert 0 < len(got_ts.inputFiles()) < n_all

    # empty intersection: no bucket overlaps -> empty result, no data read
    assert tableio.read_range(spark, path, "doc_id", 10_000, 20_000).count() == 0

    # merge moves a row's doc_id outside its bucket's recorded range: stats
    # must refresh (only the dirty bucket) or the row would be lost to skips
    victim = rows[0][0]
    upd = spark.createDataFrame(
        [(victim, 9_999, t0, "moved")],
        "url string, doc_id long, warc_ts timestamp, extracted_text string",
    )
    tableio.merge_by_url(spark, path, upd)
    hit = tableio.read_range(spark, path, "doc_id", 9_000, 10_000)
    assert [r["url"] for r in hit.collect()] == [victim]
    assert len(hit.inputFiles()) < n_all

    # statless table (flat write) falls back to a correct full filter
    flat = str(tmp_path / "flat")
    tableio.write_table(df, flat)
    flat_got = tableio.read_range(spark, flat, "doc_id", 300, 350)
    assert sorted(
        (r["url"], r["doc_id"]) for r in flat_got.collect()
    ) == sorted((u, d) for u, d, _, _ in rows if 300 <= d <= 350)


def test_sorted_layout_prunes_timestamp_ranges_on_natural_data(spark, tmp_path):
    """VERDICT r5 #5: on NATURAL (url-uncorrelated) data the url-hash
    layout scatters every ingest hour across every bucket, so warc_ts
    stats prune nothing — write_table_sorted's range layout (Iceberg
    sort-order analog) gives disjoint per-bucket ranges and a day's
    read_range lists a MINORITY of bucket dirs, equal rows to the full
    filter. Point lookup falls back correctly; merge_by_url refuses the
    range layout loudly."""
    from datetime import datetime, timedelta, timezone

    import pytest as _pytest
    from pyspark.sql import functions as F

    from engine import tableio

    t0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
    # 512 docs over 16 days, urls uncorrelated with time
    rows = [
        (f"u{i}", i, t0 + timedelta(minutes=45 * i), f"t{i}")
        for i in range(512)
    ]
    df = spark.createDataFrame(
        rows, "url string, doc_id long, warc_ts timestamp, extracted_text string"
    )
    lo, hi = t0 + timedelta(days=4), t0 + timedelta(days=5)
    pred = (F.col("warc_ts") >= F.lit(lo)) & (F.col("warc_ts") <= F.lit(hi))

    # motivation pin: the url-hash merge layout cannot prune this range
    hashed = str(tmp_path / "hashed")
    tableio.merge_by_url(spark, hashed, df, n_buckets=16)
    got_hashed = tableio.read_range(spark, hashed, "warc_ts", lo, hi)
    n_all_hashed = len(spark.read.parquet(hashed).inputFiles())
    assert len(got_hashed.inputFiles()) == n_all_hashed, (
        "url-hash layout unexpectedly pruned a timestamp range"
    )

    path = str(tmp_path / "sorted")
    tableio.write_table_sorted(df, path, sort_col="warc_ts", n_buckets=16)
    dirs = [d for d in __import__("os").listdir(path) if d.startswith("bucket=")]
    assert len(dirs) > 8, dirs

    got = tableio.read_range(spark, path, "warc_ts", lo, hi)
    full = spark.read.parquet(path).drop("bucket").filter(pred)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, full.collect()))
    n_listed = len(got.inputFiles())
    n_all = len(spark.read.parquet(path).inputFiles())
    # 1 of 16 days -> a strict minority of the bucket dirs (boundary
    # buckets may add one or two)
    assert 0 < n_listed <= n_all // 4, (n_listed, n_all)

    # point lookup on the range layout: correct via the full-scan fallback
    hit = tableio.read_url(spark, path, "u100")
    assert hit is not None and hit.count() == 1

    # upserting into a range layout is refused, not silently misplaced
    upd = spark.createDataFrame(
        [("u0", 0, t0, "changed")],
        "url string, doc_id long, warc_ts timestamp, extracted_text string",
    )
    with _pytest.raises(ValueError, match="range layout"):
        tableio.merge_by_url(spark, path, upd)


def test_compact_keeps_sorted_layout_order(spark, tmp_path):
    """r6: compacting a range-layout bucket must rewrite it SORTED — the
    within-file half of the skipping story (monotone parquet row-group
    stats); a plain coalesce would interleave the source files' order."""
    import os
    from datetime import datetime, timedelta, timezone

    from engine import tableio

    t0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
    rows = [
        (f"u{i}", i, t0 + timedelta(minutes=45 * i), f"t{i}") for i in range(128)
    ]
    df = spark.createDataFrame(
        rows, "url string, doc_id long, warc_ts timestamp, extracted_text string"
    )
    path = str(tmp_path / "sorted")
    tableio.write_table_sorted(df, path, sort_col="warc_ts", n_buckets=4)
    # split one bucket into two files (a second writer generation)
    b0 = f"{path}/bucket=0"
    part = [f for f in os.listdir(b0) if f.endswith(".parquet")][0]
    extra = spark.read.parquet(f"{b0}/{part}")
    head = extra.orderBy("warc_ts").limit(5)
    head.write.mode("append").parquet(b0)
    spark.catalog.refreshByPath(path)
    assert tableio.compact(spark, path) == [0]
    files = [f for f in os.listdir(b0) if f.endswith(".parquet")]
    assert len(files) == 1
    got = spark.read.parquet(b0).collect()
    ts = [r["warc_ts"] for r in got]
    assert ts == sorted(ts), "compacted bucket lost its sort order"


def test_stats_widened_before_swap_survive_merge_crash(spark, tmp_path):
    """Review r5: the bucket swap and the exact stats refresh are not
    atomic. The merge widens recorded ranges to old ∪ incoming BEFORE any
    rename, so at EVERY crash point (pre-swap with old data, post-swap
    without the tightening refresh) read_range still finds every row —
    stale-but-narrow stats silently dropping just-merged rows was the
    failure mode."""
    import json
    import os
    import shutil

    from pyspark.sql import functions as F

    from engine import tableio

    path = str(tmp_path / "tbl")
    urls = [f"u{i}" for i in range(32)]
    buckets = {
        r["url"]: r["b"]
        for r in spark.createDataFrame([(u,) for u in urls], "url string")
        .select("url", F.pmod(F.xxhash64("url"), F.lit(4)).cast("int").alias("b"))
        .collect()
    }
    rows = [(u, 100 * buckets[u] + i, f"t{i}") for i, u in enumerate(urls)]
    df = spark.createDataFrame(rows, "url string, doc_id long, extracted_text string")
    tableio.merge_by_url(spark, path, df, n_buckets=4)

    # emulate the merge up to (but not including) the swap: tmp holds the
    # dirty bucket's rebuilt content with an out-of-range doc_id
    victim = rows[0]
    vb = buckets[victim[0]]
    upd = spark.createDataFrame(
        [(victim[0], 77_777, "moved", vb)],
        "url string, doc_id long, extracted_text string, bucket int",
    )
    kept = (
        spark.read.parquet(f"{path}/bucket={vb}")
        .withColumn("bucket", F.lit(vb))
        .where(F.col("url") != victim[0])
    )
    tmp = str(tmp_path / "tbl.tmp-crash")
    kept.unionByName(upd).write.partitionBy("bucket").parquet(tmp)
    tableio._widen_stats_for_swap(spark, path, tmp, [vb])

    # crash point A: widened stats, swap not yet performed — old table must
    # still answer range reads exactly
    got_old = tableio.read_range(spark, path, "doc_id", victim[1], victim[1])
    assert [r["url"] for r in got_old.collect()] == [victim[0]]

    # crash point B: swap done, exact refresh never ran
    shutil.rmtree(f"{path}/bucket={vb}")
    os.rename(f"{tmp}/bucket={vb}", f"{path}/bucket={vb}")
    spark.catalog.refreshByPath(path)
    hit = tableio.read_range(spark, path, "doc_id", 77_000, 78_000)
    assert [r["url"] for r in hit.collect()] == [victim[0]]

    # the widened entry is a superset range (or dropped) — never narrow
    with open(f"{path}/_layout.json", encoding="utf-8") as f:
        st = json.load(f)["stats"].get(str(vb), {})
    if "doc_id" in st:
        assert st["doc_id"][0] <= victim[1] and st["doc_id"][1] >= 77_777


def test_compact_crash_states_read_consistently_and_self_heal(spark, tmp_path):
    """ADVICE r4: compaction is write-then-swap — simulate every crash
    state and assert (a) the table reads its exact pre-compact contents in
    each state (aside/tmp dirs are underscore-prefixed, invisible to
    partition discovery), and (b) the next compact() self-heals."""
    import os
    import shutil

    from engine import tableio

    path = str(tmp_path / "tbl")
    rows = [(f"u{i}", f"t{i}", 1) for i in range(64)]
    df = spark.createDataFrame(rows, "url string, extracted_text string, ver long")
    tableio.merge_by_url(spark, path, df.repartition(8), n_buckets=4)
    want = sorted(tuple(r) for r in spark.read.parquet(path).drop("bucket").collect())

    def table():
        return sorted(
            tuple(r) for r in spark.read.parquet(path).drop("bucket").collect()
        )

    # crash state 1: fresh write completed into _compact- tmp, swap not begun
    bdir = os.path.join(path, "bucket=0")
    spark.read.parquet(bdir).coalesce(1).write.parquet(
        os.path.join(path, "_compact-deadbeef-bucket-0")
    )
    assert table() == want  # tmp dir invisible to readers
    tableio.compact(spark, path)
    assert not os.path.exists(os.path.join(path, "_compact-deadbeef-bucket-0"))
    assert table() == want

    # crash state 2: crashed between the two renames (bucket dir aside,
    # fresh dir not yet moved in) — data lives only in the aside dir
    os.rename(bdir, os.path.join(path, "_gc-cafebabe-bucket-0"))
    assert tableio.compact(spark, path) == []  # heals: restores the aside dir
    assert os.path.isdir(bdir) and table() == want

    # crash state 3: swap completed, old aside dir not yet deleted
    shutil.copytree(bdir, os.path.join(path, "_gc-0badf00d-bucket-0"))
    assert table() == want  # aside dir invisible: no doubled rows
    tableio.compact(spark, path)
    assert not os.path.exists(os.path.join(path, "_gc-0badf00d-bucket-0"))
    assert table() == want


def test_merge_crash_states_read_consistently_and_self_heal(spark, tmp_path):
    """ADVICE r5: merge_by_url's bucket swap now uses compact()'s aside-dir
    two-rename pattern — simulate the crash states and assert the table
    always reads a consistent version and the next merge self-heals. The
    old rmtree(dst)+rename had a window where a bucket's data was gone."""
    import shutil

    path = str(tmp_path / "tbl")
    rows = [(f"u{i}", f"t{i}", 1) for i in range(64)]
    df = spark.createDataFrame(rows, "url string, extracted_text string, ver long")
    tableio.merge_by_url(spark, path, df, n_buckets=4)
    want = sorted(tuple(r) for r in spark.read.parquet(path).drop("bucket").collect())

    def table():
        return sorted(
            tuple(r) for r in spark.read.parquet(path).drop("bucket").collect()
        )

    # crash state 1: crashed between the two renames — bucket=0 moved aside,
    # fresh dir never moved in. Reader sees no bucket=0; next merge restores.
    bdir = os.path.join(path, "bucket=0")
    os.rename(bdir, os.path.join(path, "_gc-feedface-bucket-0"))
    spark.catalog.refreshByPath(path)
    upd = spark.createDataFrame(
        [("u1", "new", 2)], "url string, extracted_text string, ver long"
    )
    tableio.merge_by_url(spark, path, upd)
    assert os.path.isdir(bdir)  # healed before merging
    got = table()
    assert ("u1", "new", 2) in got and len(got) == len(want)

    # crash state 2: swap completed, aside dir not yet deleted — the aside
    # is underscore-prefixed so readers never double-count; merge GCs it.
    shutil.copytree(bdir, os.path.join(path, "_gc-0defaced-bucket-0"))
    before = table()
    tableio.merge_by_url(
        spark, path,
        spark.createDataFrame(
            [("u2", "newer", 3)], "url string, extracted_text string, ver long"
        ),
    )
    assert not os.path.exists(os.path.join(path, "_gc-0defaced-bucket-0"))
    got = table()
    assert ("u2", "newer", 3) in got and len(got) == len(before)

    # crash state 3 (ADVICE r6): crashed BEFORE the swap loop — the staged
    # '{target}.tmp-{tag}' SIBLING is left behind; it lives outside
    # target_path so the in-dir heal never saw it and repeated crashed
    # merges leaked full dirty-bucket copies. The next merge removes it.
    stale = f"{path}.tmp-deadbeef"
    shutil.copytree(path, stale)
    before = table()
    tableio.merge_by_url(
        spark, path,
        spark.createDataFrame(
            [("u3", "newest", 4)], "url string, extracted_text string, ver long"
        ),
    )
    assert not os.path.exists(stale)
    got = table()
    assert ("u3", "newest", 4) in got and len(got) == len(before)
