"""Evaluation report (evaluation.py analog) totals must agree with goldens,
and the ANN LSH candidate set must carry measurable recall vs brute force."""

from __future__ import annotations

from engine import pipeline
from engine.report import evaluation_report


def test_evaluation_report_matches_goldens(spark, pages_unit_path, goldens_unit):
    pages = spark.read.parquet(pages_unit_path)
    extracted = pipeline.run_extract(pages, num_parts=4, run_id="rep")
    rep = evaluation_report(extracted, wall_ms=1000)

    assert rep["coverage"]["docs_total"] == 64
    assert rep["coverage"]["docs_ok"] == sum(
        1 for g in goldens_unit if g["status"] == "ok"
    )
    assert rep["coverage"]["blocks_total"] == sum(g["n_blocks"] for g in goldens_unit)
    assert rep["coverage"]["blocks_kept"] == sum(g["n_kept"] for g in goldens_unit)
    assert rep["script_distribution"]["rtl_blocks"] == sum(
        1 for g in goldens_unit for s in g["spans"] if s["lang"] == "rtl"
    )
    assert rep["summary"]["chars_extracted"] == sum(
        len(g["extracted_text"]) for g in goldens_unit
    )
    assert rep["runtime_metrics"]["avg_time_per_doc_ms"] == round(1000 / 64, 2)


def test_ann_lsh_recall_and_candidate_ratio(spark):
    """On the seeded (near-random) embeddings, the 8x6 banded LSH must keep
    candidates far below all-pairs while recalling a meaningful share of the
    strong pairs (sim >= 0.4). Values are deterministic (seeded data, md5
    hyperplanes)."""
    import __spark_entry__ as em

    sf = "/root/testdata/sf0.001"
    cand = em.queries()["ann_lsh_candidates"](spark, sf).collect()
    cand_pairs = {(r["vec_a"], r["vec_b"]) for r in cand}
    strong = {
        (r["vec_a"], r["vec_b"])
        for r in em.queries()["embedding_near_dup"](spark, sf).collect()
        if r["sim_r"] >= 0.4
    }
    n_all_pairs = 500 * 499 / 2
    assert len(cand_pairs) < 0.2 * n_all_pairs  # sub-quadratic candidate set
    recall = len(strong & cand_pairs) / max(len(strong), 1)
    assert recall >= 0.3  # weak-similarity data; see planted test below


def test_ann_ivf_recall_vs_exact_topk(spark):
    """IVF with nprobe=4 of ~16 lists must recover a meaningful share of the
    exact brute-force top-3 neighbors (deterministic: seeded data, fixed
    codebook rule). Perfect recall is not expected — probing 1/4 of the
    lists is the point of IVF."""
    import __spark_entry__ as em

    sf = "/root/testdata/sf0.001"
    ivf = {(r["query_id"], r["neighbor_id"])
           for r in em.queries()["ann_ivf_topk"](spark, sf).collect()}
    exact = {(r["query_id"], r["neighbor_id"])
             for r in em.queries()["embedding_topk"](spark, sf).collect()}
    assert len(ivf) == 30  # top-3 for each of 10 queries
    recall = len(ivf & exact) / len(exact)
    assert recall >= 0.3, recall


def test_ann_lsh_scheme_recall_on_planted_near_dups():
    """The banding scheme itself must recall >=0.9 of PLANTED near-duplicates
    (cos ~ 0.98) — the regime LSH dedup actually targets. Computed in numpy
    with the exact md5 hyperplanes the SQL uses."""
    import numpy as np

    import __spark_entry__ as em

    rng = np.random.default_rng(7)
    base = rng.normal(size=(200, em._ANN_DIM))
    dup = base + 0.08 * rng.normal(size=base.shape)  # cos ~ 0.98
    planes = np.array(em._ANN_PLANES)  # (bands*rows, dim)
    qa = np.floor(base * 1000)  # same quantization the SQL applies
    qb = np.floor(dup * 1000)
    bits_a = (qa @ planes.T) >= 0
    bits_b = (qb @ planes.T) >= 0
    r, b = em._ANN_ROWS, em._ANN_BANDS
    hit = 0
    for i in range(len(base)):
        for band in range(b):
            s = slice(band * r, (band + 1) * r)
            if (bits_a[i, s] == bits_b[i, s]).all():
                hit += 1
                break
    assert hit / len(base) >= 0.9


def test_lm_bigram_nll_separates_gibberish_from_reference_like(spark, tmp_path):
    """r5 CCNet-style LM quality filter: a document echoing the reference
    slice's phrasing scores a LOWER average bigram NLL than a gibberish
    document of unseen words (the signal the perplexity filter keys on)."""
    import __spark_entry__ as em

    ref_sentence = "the quick brown fox jumps over the lazy dog by the river"
    rows = []
    for i in range(0, 35, 7):  # doc_id % 7 == 0: the reference slice
        rows.append((i, ref_sentence))
    rows.append((1, ref_sentence))  # echoes the reference phrasing
    rows.append((2, "zxqv wkjh plmt qrsd vbnx uytr eeww oopa zzac mmnb"))
    sf = str(tmp_path)
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.parquet(f"{sf}/documents.parquet")

    got = {
        r["doc_id"]: r["nll_r"]
        for r in em.queries()["lm_bigram_nll"](spark, sf).collect()
    }
    assert got[1] < got[2], got
    # the echo doc's bigrams are all seen: its NLL matches the reference
    # docs' own score exactly (same bigrams, same counts)
    assert got[1] == got[0]


def test_lm_trained_model_equals_registry_query(spark, tmp_path):
    """The persisted train-once/score-many path (engine/lm) reproduces the
    oracled lm_bigram_nll query row-for-row on the same corpus, and the
    scoring scan reads documents exactly once with broadcast count tables
    (the 100 TB shape; the query form re-scans for its in-statement model
    so DuckDB can mirror it)."""
    import __spark_entry__ as em

    from engine import lm

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")
    model = str(tmp_path / "lm_model")
    lm.train_bigram_lm(docs, model)
    scored = lm.score_docs(spark, docs, model)
    got = sorted(tuple(r) for r in scored.collect())
    want = sorted(
        tuple(r) for r in em.queries()["lm_bigram_nll"](spark, sf).collect()
    )
    assert got == want and len(got) == 500

    # the INITIAL plan holds the whole tree exactly once (AQE's executed
    # string duplicates subtrees into query-stage sections): one corpus
    # scan, both count-table joins broadcast
    fresh = lm.score_docs(spark, docs, model)
    jvm = spark._jvm
    plan = jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        fresh._jdf.queryExecution(), "simple"
    )
    assert plan.count("documents.parquet") == 1, plan
    assert plan.count("BroadcastHashJoin") == 2, plan


def test_dsir_production_path_matches_oracled_query(spark, tmp_path):
    """r6: the materialize-first DSIR path (engine/dsir) reproduces the
    oracled dsir_resample query row-for-row on the same corpus — same
    quantized-L2 tie-breaks, rounding, rate arithmetic, and md5 draw —
    while its plans are the 100 TB shape: the cluster assignment is a
    zero-Exchange in-row argmin, and the resample step touches only the
    materialized score table (one bounded histogram shuffle; windows over
    the tiny aggregate; rate table broadcast)."""
    import __spark_entry__ as em

    from engine import dsir

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")

    assign = dsir.assign_clusters(emb)
    jvm = spark._jvm
    plan = jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        assign._jdf.queryExecution(), "simple"
    )
    assert "Exchange" not in plan, plan
    want_assign = sorted(
        (r["vec_id"], r["cluster_id"])
        for r in em.queries()["embedding_cluster_assign"](spark, sf).collect()
    )
    assert sorted(tuple(r) for r in assign.collect()) == want_assign

    model = str(tmp_path / "lm_model")
    scored_path = str(tmp_path / "dsir_scored")
    dsir.materialize_scored(spark, docs, emb, model, scored_path)
    out = dsir.resample(spark, scored_path)
    plan = jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "simple"
    )
    # resample reads ONLY the materialized table (twice: rows + histogram
    # — both one-scan subtrees over the small scored table), never the
    # corpus or the embeddings
    assert "documents.parquet" not in plan and "embeddings.parquet" not in plan
    assert "BroadcastHashJoin" in plan, plan

    got = sorted(tuple(r) for r in out.collect())
    want = sorted(
        tuple(r) for r in em.queries()["dsir_resample"](spark, sf).collect()
    )
    assert got == want and len(got) == 500


def test_lm_bigrams_expr_is_self_guarding_on_empty_docs(spark):
    """ADVICE r5: BIGRAMS_EXPR must be safe on zero-token docs WITHOUT
    relying on Catalyst pushing the size(ws) >= 2 filter below the
    Generate — slice with greatest(size-1, 0) never sees length -1."""
    from engine.lm import BIGRAMS_EXPR

    rows = spark.sql(
        "SELECT explode_outer(" + BIGRAMS_EXPR.replace("ws", "CAST(array() AS ARRAY<STRING>)") + ") AS b"
    ).collect()
    assert len(rows) == 1 and rows[0]["b"] is None


def test_substring_dedup_catches_offset_repeats_paragraph_dedup_misses(
    spark, tmp_path
):
    """r6 VERDICT #1: a repeated >=16-token passage offset by half a chunk
    (and by an arbitrary 3 tokens) escapes paragraph_dedup — its aligned
    16-token chunks hash differently in each copy (the miss, pinned here) —
    while substring_dedup's sliding every-position 16-grams catch it at ANY
    alignment."""
    import __spark_entry__ as em

    passage = " ".join(f"p{i}" for i in range(20))  # 20-token repeat
    filler_a = " ".join(f"a{i}" for i in range(4))
    filler_b = " ".join(f"b{i}" for i in range(8))  # half-chunk offset
    filler_c = " ".join(f"c{i}" for i in range(3))  # arbitrary offset
    rows = [
        (0, passage + " " + filler_a),                 # first occurrence
        (1, filler_b + " " + passage + " " + filler_a),
        (2, filler_c + " " + passage),
        (3, " ".join(f"u{i}" for i in range(24))),     # unique control
    ]
    sf = str(tmp_path)
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.parquet(f"{sf}/documents.parquet")

    para = {
        r["doc_id"]: r["keep_ratio"]
        for r in em.queries()["paragraph_dedup"](spark, sf).collect()
    }
    # THE MISS: every copy's aligned chunks are distinct corpus-wide, so
    # paragraph_dedup reports the offset copies as fully novel
    assert para[1] == 1.0 and para[2] == 1.0, para

    sub = {
        r["doc_id"]: (r["n_grams"], r["n_novel"])
        for r in em.queries()["substring_dedup"](spark, sf).collect()
    }
    # THE CATCH: docs 1 and 2 repeat doc 0's passage -> all 5 interior
    # grams of the 20-token passage are owned by doc 0, at both offsets
    n1, k1 = sub[1]
    n2, k2 = sub[2]
    assert k1 <= n1 - 5 and k2 <= n2 - 5, sub
    assert sub[0][0] == sub[0][1]  # first occurrence owns its grams
    assert sub[3][0] == sub[3][1]  # unique control fully novel


def test_winnowed_dedup_guarantee_and_density(spark, tmp_path):
    """r6: substring_dedup_winnow selects the min-hash gram of every W=4
    consecutive gram hashes (robust winnowing). Pins the two properties
    that make it the production knob: (a) the winnowing GUARANTEE — a
    repeated passage of >= K+W-1 = 19 tokens is caught at ANY alignment,
    because selection is content-defined (both copies select the same
    gram); (b) DENSITY — anchors are a strict minority of the full gram
    stream (expected 2/(W+1) = 40%), which is the shuffle-volume saving
    at corpus scale."""
    import __spark_entry__ as em

    passage = " ".join(f"p{i}" for i in range(19))  # exactly K+W-1 tokens
    rows = [
        (0, passage + " " + " ".join(f"a{i}" for i in range(6))),
        (1, " ".join(f"b{i}" for i in range(8)) + " " + passage),   # offset 8
        (2, " ".join(f"c{i}" for i in range(3)) + " " + passage),   # offset 3
        (3, " ".join(f"u{i}" for i in range(40))),                  # control
    ]
    sf = str(tmp_path)
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.parquet(f"{sf}/documents.parquet")

    win = {
        r["doc_id"]: (r["n_anchors"], r["n_novel"])
        for r in em.queries()["substring_dedup_winnow"](spark, sf).collect()
    }
    # guarantee: each repeat copy loses at least one anchor to doc 0
    assert win[1][1] < win[1][0], win
    assert win[2][1] < win[2][0], win
    assert win[0][0] == win[0][1] and win[3][0] == win[3][1], win

    # density vs the full gram stream on the control doc (40 tokens ->
    # 25 grams; expected ~2/(W+1) selected, pinned below 60%)
    full = {
        r["doc_id"]: r["n_grams"]
        for r in em.queries()["substring_dedup"](spark, sf).collect()
    }
    assert 0 < win[3][0] < 0.6 * full[3], (win[3][0], full[3])
