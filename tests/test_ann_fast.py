"""r8 optimization pin: the NumPy-batched IVF execution (`_mk_ivf_fast`)
must be row-identical to the pure-SQL forms it replaced (`_ANN_IVF_SPARK` /
`_ANN_IVF_TRAINED_SPARK` / `_ANN_IVF_TRAINED_HR_SPARK`), which are still the
oracled construction. The fast path moves ONLY the integer argmin/argmax
(assignment + probe ranking) into a mapInPandas matmul; the exact-cosine
re-rank keeps the original SQL text — so any divergence here is an integer
tie-rule or quantization bug, never float noise."""

from __future__ import annotations

import pytest

import __spark_entry__ as em


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("sf", ["0.001", "0.01"])
@pytest.mark.parametrize(
    "name, sql",
    [
        ("ann_ivf_topk", em._ANN_IVF_SPARK),
        ("ann_ivf_topk_trained", em._ANN_IVF_TRAINED_SPARK),
        ("ann_ivf_topk_trained_hr", em._ANN_IVF_TRAINED_HR_SPARK),
    ],
)
def test_fast_ivf_equals_sql_form(spark, sf, name, sql):
    sf_dir = f"/root/testdata/sf{sf}"
    fast = _rows(em.queries()[name](spark, sf_dir))
    em._load(spark, sf_dir, "embeddings")
    ref = _rows(spark.sql(sql))
    assert fast == ref
    assert len(fast) > 0


def test_fast_ivf_plan_has_no_cross_join_or_window(spark):
    """The whole point: no N x K CROSS JOIN, no row_number window over it —
    one MapInPandas over the embeddings scan feeds the cosine re-rank."""
    df = em.queries()["ann_ivf_topk"](spark, "/root/testdata/sf0.001")
    jvm = df.sparkSession._jvm
    plan = jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert "MapInPandas" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
