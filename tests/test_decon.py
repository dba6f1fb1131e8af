"""engine/decon — production benchmark-decontamination gate (r7).

Pins: row-equality with the oracled ``decontaminate`` query when fed its
benchmark construction; the runtime bloom filter prunes the corpus gram
stream when the benchmark side is forced off the broadcast path; digests
only in every Exchange.
"""

from __future__ import annotations

import re

import pytest

from engine import decon

SF = "/root/testdata/sf0.001"


def _bench_table(spark, tmp_path):
    """The oracled query's benchmark slice (doc_id % 97 = 0 grams),
    WRITTEN to parquet in the real shape: a digest table carrying
    several gram sizes tagged by an ``n`` column."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = str(tmp_path / "bench_grams")
    bench_docs = docs.where("doc_id % 97 = 0")
    g8 = decon.doc_grams(bench_docs, 8).selectExpr("gram", "8 AS n")
    g13 = decon.doc_grams(bench_docs, 13).selectExpr("gram", "13 AS n")
    g8.unionByName(g13).distinct().write.parquet(p)
    return spark.read.parquet(p)


def test_decontaminate_row_equal_to_oracled_query(spark, tmp_path):
    import __spark_entry__ as em

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = sorted(
        map(tuple, decon.decontaminate(docs, _bench_table(spark, tmp_path)).collect())
    )
    want = sorted(
        map(tuple, em.queries()["decontaminate"](spark, SF).collect())
    )
    assert got == want and len(got) > 0
    assert any(r[1] == 1 for r in got)  # the benchmark docs self-hit


def test_decontaminate_bloom_prunes_corpus_grams_on_shuffle_path(
    spark, tmp_path
):
    """When the benchmark side is too big to broadcast (forced here), the
    runtime bloom filter must inject might_contain on the CORPUS gram
    stream ahead of the Exchange — and results must equal the broadcast
    path's."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    bench = _bench_table(spark, tmp_path)
    base = sorted(map(tuple, decon.decontaminate(docs, bench).collect()))
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        df = decon.decontaminate(
            docs, bench, staged_grams_path=str(tmp_path / "staged_grams")
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan
        # digests only: no gram text (no 'toks') in any Exchange
        for frag in re.findall(r"Exchange [^\n]*", plan):
            assert "toks" not in frag, frag
        assert sorted(map(tuple, df.collect())) == base
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-x", "-q"]))
