"""engine/substrdedup — materialize-first substring dedup (VERDICT r6 #4).

Pins: row-equality with the oracled ``substring_dedup`` query; the
combined stream reads the corpus ``text`` column in exactly ONE FileScan
(the oracled CTE form scans it twice via Spark's CTE inlining); the
derived plan reads only the checkpoint; no Window; no per-row Python.
"""

from __future__ import annotations

import re

import pytest

from engine import substrdedup
from engine.session import release_local_checkpoint

SF = "/root/testdata/sf0.001"


def test_novelty_row_equal_to_oracled_query(spark):
    import __spark_entry__ as em

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out, ids = substrdedup.novelty(docs)
    got = sorted(map(tuple, out.collect()))
    release_local_checkpoint(spark, ids)
    want = sorted(
        map(tuple, em.queries()["substring_dedup"](spark, SF).collect())
    )
    assert got == want and len(got) > 0


def test_single_text_scan_and_checkpoint_derived_plan(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    # THE point of the module: the stream plan tokenizes+hashes the corpus
    # in exactly one scan of the text column
    splan = (
        substrdedup.combined_stream(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert len(re.findall(r"ReadSchema: [^\n]*text", splan)) == 1, splan
    assert splan.count("Scan parquet") == 1, splan
    out, ids = substrdedup.novelty(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # everything downstream reads the materialized stream — the corpus is
    # never re-scanned (vs the oracled form's 3 FileScans)
    assert "Scan parquet" not in plan, plan
    assert plan.count("Scan ExistingRDD") == 2, plan
    assert "Window" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    # digest shuffle: gram text stays in-row — no 'toks' column in any
    # Exchange (hash/partial-agg move digests + (doc_id, pos) only)
    for frag in re.findall(r"Exchange [^\n]*", plan):
        assert "toks" not in frag, frag
    release_local_checkpoint(spark, ids)


def test_novelty_semantics_unit(spark):
    """Hand-built corpus: doc 1 owns the passage, doc 2 repeats it at a
    DIFFERENT offset (the alignment case paragraph dedup misses), doc 3 is
    short (no grams -> novelty 1.0)."""
    passage = " ".join(f"w{i}" for i in range(16))
    rows = [
        (1, passage + " tail1 tail2"),
        (2, "lead " + passage),
        (3, "too short"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out_df, ids = substrdedup.novelty(docs)
    out = {r["doc_id"]: r for r in out_df.collect()}
    release_local_checkpoint(spark, ids)
    assert out[1]["n_grams"] == 3 and out[1]["n_novel"] == 3
    # doc 2's copy of the 16-token passage is caught despite the offset
    assert out[2]["n_grams"] == 2 and out[2]["n_novel"] == 1
    assert out[3]["n_grams"] == 0 and out[3]["n_novel"] == 0
    assert out[3]["novelty"] == 1.0


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-x", "-q"]))
