"""Logistic-regression quality classifier (engine/logreg, r5): trained as
DataFrame rounds (one partial-agg gradient job per round, driver-small
state), pinned against a pure-Python twin; loss is monotone, the model
beats the majority class, and scoring is in-row."""

from __future__ import annotations

import pytest

from engine import logreg

pytestmark = pytest.mark.usefixtures("spark")

SF = "/root/testdata/sf0.001"
LABEL = "n_chars >= 300"
LR, ITERS = 2.0, 25


@pytest.fixture(scope="module")
def feats(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text", "n_chars"
    )
    return logreg.featurize(docs, LABEL).localCheckpoint()


def test_train_logreg_leaves_no_persisted_frames(spark, feats):
    """r6 leak fix: train_logreg's internal local checkpoint (a persisted
    RDD) is released before returning — only (w, losses) leave the
    function. (The module fixture's own checkpoint is counted in
    `before`.)"""
    from tests.test_invariance import _persisted_rdd_ids

    before = _persisted_rdd_ids(spark)
    logreg.train_logreg(feats, lr=LR, iters=3)
    leaked = _persisted_rdd_ids(spark) - before
    assert not leaked, f"persisted RDDs leaked: {sorted(leaked)}"


def test_training_matches_python_twin_and_descends(spark, feats):
    w, losses = logreg.train_logreg(feats, lr=LR, iters=ITERS)
    rows = [(list(r["x"]), float(r["y"])) for r in feats.collect()]
    pw, plosses = logreg.python_logreg(rows, lr=LR, iters=ITERS)
    assert all(abs(a - b) < 1e-7 for a, b in zip(w, pw)), (w, pw)
    assert all(abs(a - b) < 1e-7 for a, b in zip(losses, plosses))
    # full-batch GD with a sane lr: loss never increases, and moves
    assert all(b <= a + 1e-9 for a, b in zip(losses, losses[1:])), losses
    assert losses[-1] < losses[0] * 0.99


def test_model_beats_majority_class(spark, feats):
    w, _ = logreg.train_logreg(feats, lr=LR, iters=ITERS)
    s = logreg.score(feats, w)
    acc = s.selectExpr(
        "avg(CASE WHEN CAST(pred AS DOUBLE) = y THEN 1.0 ELSE 0.0 END) AS a"
    ).collect()[0]["a"]
    majority = s.selectExpr("greatest(avg(y), 1.0 - avg(y)) AS b").collect()[0][
        "b"
    ]
    assert acc >= 0.75 and acc > majority + 0.05, (acc, majority)


def test_training_is_deterministic_and_scoring_is_inrow(spark, feats):
    a, _ = logreg.train_logreg(feats, lr=LR, iters=5)
    b, _ = logreg.train_logreg(feats, lr=LR, iters=5)
    assert a == b
    plan = logreg.score(feats, a)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan  # broadcast-literal weights, no move


def test_frozen_model_reproducible_and_query_consistent(spark, feats):
    """The committed engine/logreg_model.py weights reproduce under the
    committed hyperparameters (allclose — float-summation caveat), and the
    oracled quality_classifier_score query's predictions equal
    engine.logreg.score with the same frozen weights."""
    import math

    import __spark_entry__ as em

    from engine import logreg_model

    w, _ = logreg.train_logreg(
        feats, lr=logreg_model.TRAINED_LR, iters=logreg_model.TRAINED_ITERS
    )
    assert all(
        math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12)
        for a, b in zip(w, logreg_model.TRAINED_WEIGHTS)
    ), (w, logreg_model.TRAINED_WEIGHTS)

    q = {
        r["doc_id"]: (r["p_quality"], r["pred"])
        for r in em.queries()["quality_classifier_score"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    # exact PER-DOCUMENT pin (review r5 — a histogram-only compare would
    # miss offsetting feature-map drift): rebuild the margin from
    # engine.logreg's own feature/margin expressions with doc_id carried
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    m = logreg._margin(list(logreg_model.TRAINED_WEIGHTS))
    expected = {
        r["doc_id"]: int(r["pred"])
        for r in docs.selectExpr(
            "doc_id", f"{logreg.FEATURES_EXPR} AS x"
        ).selectExpr(
            "doc_id",
            f"CAST(CASE WHEN {m} >= 0 THEN 1 ELSE 0 END AS BIGINT) AS pred",
        ).collect()
    }
    assert {d: p for d, (_, p) in q.items()} == expected
    assert all(0.0 <= p <= 1.0 for p, _ in q.values())
