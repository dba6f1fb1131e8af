"""r8 optimization pin: the single-pass keeper-count forms of
substring_dedup / paragraph_dedup (gram subtree referenced ONCE; per-doc
totals in-row; n_novel/n_kept = count of owned keeper rows) must be
row-identical to the r7 tag-back-join forms they replaced. The r7 Spark SQL
is inlined here as the reference twin; the DuckDB oracle equality is
separately enforced by the gate/entry-contract tests."""

from __future__ import annotations

import pytest

import __spark_entry__ as em

_R7_SUBSTR = """
WITH t AS (SELECT doc_id, split(text, ' ') AS toks FROM documents),
g AS (
  SELECT doc_id, i AS pos,
         md5(array_join(slice(toks, i + 1, 16), ' ')) AS h
  FROM t LATERAL VIEW explode(sequence(0, size(toks) - 16)) s AS i
  WHERE size(toks) >= 16
),
k AS (SELECT h, min(named_struct('d', doc_id, 'p', pos)) AS keeper
      FROM g GROUP BY h),
tal AS (SELECT g.doc_id,
               count(*) AS n_grams,
               sum(CASE WHEN k.keeper.d = g.doc_id AND k.keeper.p = g.pos
                   THEN 1 ELSE 0 END) AS n_novel
        FROM g JOIN k ON g.h = k.h GROUP BY g.doc_id)
SELECT d.doc_id,
       CAST(coalesce(tal.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(coalesce(tal.n_novel, 0) AS BIGINT) AS n_novel,
       CAST(round(coalesce(tal.n_novel * 1.0 / tal.n_grams, 1.0), 4)
            AS DOUBLE) AS novelty
FROM documents d LEFT JOIN tal ON d.doc_id = tal.doc_id
"""

_R7_PARA = """
WITH t AS (SELECT doc_id, split(text, ' ') AS toks FROM documents),
c AS (
  SELECT doc_id, i AS chunk_idx,
         md5(array_join(slice(toks, i * 16 + 1, 16), ' ')) AS h
  FROM t LATERAL VIEW explode(
        sequence(0, CAST(ceil(size(toks) / 16.0) AS INT) - 1)) s AS i
  WHERE size(toks) >= 1
),
k AS (SELECT h, min(named_struct('d', doc_id, 'i', chunk_idx)) AS keeper
      FROM c GROUP BY h)
SELECT c.doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(CASE WHEN k.keeper.d = c.doc_id AND k.keeper.i = c.chunk_idx
                THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(round(sum(CASE WHEN k.keeper.d = c.doc_id AND k.keeper.i = c.chunk_idx
                      THEN 1 ELSE 0 END) * 1.0 / count(*), 4)
            AS DOUBLE) AS keep_ratio
FROM c JOIN k ON c.h = k.h GROUP BY c.doc_id
"""


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("sf", ["0.001", "0.01"])
@pytest.mark.parametrize(
    "name, r7_sql",
    [("substring_dedup", _R7_SUBSTR), ("paragraph_dedup", _R7_PARA)],
)
def test_single_pass_dedup_equals_r7_form(spark, sf, name, r7_sql):
    sf_dir = f"/root/testdata/sf{sf}"
    new = _rows(em.queries()[name](spark, sf_dir))
    em._load(spark, sf_dir, "documents")
    ref = _rows(spark.sql(r7_sql))
    assert new == ref
    assert len(new) > 0


@pytest.mark.parametrize("sf", ["0.001", "0.01", "0.1"])
def test_embedding_topk_fast_equals_sql_form(spark, sf):
    """The NumPy sequential-fold cosine pass must be BIT-identical to the
    interpreted SQL fold (np.add.accumulate == aggregate's left fold over
    the same element products), so the ranked rounded output matches
    row-for-row at every checked SF."""
    sf_dir = f"/root/testdata/sf{sf}"
    new = _rows(em.queries()["embedding_topk"](spark, sf_dir))
    em._load(spark, sf_dir, "embeddings")
    ref = _rows(spark.sql(em._TOPK_SPARK))
    assert new == ref
    assert len(new) > 0


@pytest.mark.parametrize("sf", ["0.001", "0.01"])
def test_minhash_fast_equals_sql_form(spark, sf):
    """The memoized Arrow signature pass == the retained
    _MINHASH_FAST_SPARK expression form (same shingles, same md5-prefix
    hash, same universal-hash minima — all integer-exact)."""
    sf_dir = f"/root/testdata/sf{sf}"
    new = _rows(em.queries()["minhash_signatures"](spark, sf_dir))
    em._load(spark, sf_dir, "documents")
    ref = _rows(spark.sql(em._MINHASH_FAST_SPARK))
    assert new == ref
    assert len(new) > 0


@pytest.mark.parametrize("sf", ["0.001", "0.01"])
def test_simhash_fast_equals_sql_form(spark, sf):
    """The Arrow-batched memoized fingerprint pass == the retained
    _SIMHASH_SPARK expression form (same tokenizer, same md5 nibbles,
    same integer majority rule)."""
    sf_dir = f"/root/testdata/sf{sf}"
    new = _rows(em.queries()["simhash_fingerprint"](spark, sf_dir))
    em._load(spark, sf_dir, "documents")
    ref = _rows(spark.sql(em._SIMHASH_SPARK))
    assert new == ref
    assert len(new) > 0
