"""Logistic-regression quality classifier trained as DataFrame rounds
(r5) — the third trained-model operator beside the k-means codebook
(engine/ann) and BPE merges (engine/bpe), same Spark shape:

- features are per-row JVM expressions (zero shuffle to featurize);
- each gradient-descent round is ONE partial-aggregated job collecting a
  (d+1)-vector of sums to the driver (constant-size state, like the k×dim
  k-means centroids) — rounds are the scarce resource;
- the trained weights apply corpus-wide as an in-row score expression
  (broadcast literals — the M9 train-once/score-many pattern).

Determinism: fixed zero init, fixed round count, full-batch gradients.
Repeated runs in one session are identical; cross-partitioning runs agree
up to float-summation order in the gradient sums (the k-means caveat),
which the pytest twin handles with allclose.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

# Feature map: bias, capped length, stopword share, capped mean token len.
# All in-row; the stopword set is the tiny English core (the quality_score
# query's signal family). The template takes the text / char-count SOURCE
# EXPRESSIONS so the same feature map scores both the documents table
# (text, n_chars) and the extraction output (extracted_text, length(..)).
FEATURES_TEMPLATE = """
array(
  CAST(1.0 AS DOUBLE),
  least(CAST(({n_chars}) AS DOUBLE), 2000.0) / 2000.0,
  CAST(size(filter(split(({text}), ' '),
                   w -> w IN ('the', 'and', 'of', 'a', 'to'))) AS DOUBLE)
    / greatest(size(filter(split(({text}), ' '), w -> w != '')), 1),
  least(CAST(length(({text})) AS DOUBLE)
          / greatest(size(filter(split(({text}), ' '), w -> w != '')), 1),
        15.0) / 15.0
)
"""
FEATURES_EXPR = FEATURES_TEMPLATE.format(text="text", n_chars="n_chars")
DIM = 4


def featurize(docs: DataFrame, label_expr: str) -> DataFrame:
    """(x array<double>[DIM], y double) — per-row expressions only."""
    return docs.selectExpr(
        f"{FEATURES_EXPR} AS x", f"CAST({label_expr} AS DOUBLE) AS y"
    )


def _w_lit(w: list[float]) -> str:
    return "array(" + ", ".join(f"CAST({v!r} AS DOUBLE)" for v in w) + ")"


def _margin(w: list[float]) -> str:
    return (
        f"aggregate(zip_with(x, {_w_lit(w)}, (a, b) -> a * b), "
        "CAST(0 AS DOUBLE), (s, v) -> s + v)"
    )


def train_logreg(
    feats: DataFrame, lr: float = 1.0, iters: int = 30
) -> tuple[list[float], list[float]]:
    """Full-batch gradient descent on logistic loss. Returns (weights,
    per-round mean losses — monotone non-increasing for a sane lr,
    pytest-pinned). One aggregate job per round; the corpus never moves."""
    from engine.session import local_checkpoint_tracked, release_local_checkpoint

    spark = feats.sparkSession
    feats, held = local_checkpoint_tracked(feats)
    try:
        n = feats.count()
        w = [0.0] * DIM
        losses: list[float] = []
        for _ in range(int(iters)):
            m = _margin(w)
            p = f"(1.0 / (1.0 + exp(-({m}))))"
            aggs = [
                F.expr(f"sum(({p} - y) * x[{j}])").alias(f"g{j}")
                for j in range(DIM)
            ] + [
                # log(1+exp(-|m|)) + max(0, -ym̃) is stable for big margins
                F.expr(
                    f"sum(ln(1.0 + exp(-abs({m})))"
                    f" + CASE WHEN (2.0 * y - 1.0) * ({m}) < 0"
                    f" THEN abs({m}) ELSE 0.0 END)"
                ).alias("loss")
            ]
            row = feats.agg(*aggs).collect()[0]
            losses.append(float(row["loss"]) / n)
            w = [w[j] - lr * float(row[f"g{j}"]) / n for j in range(DIM)]
    finally:
        # local checkpoints are RDD-level persists that Dataset.unpersist()
        # cannot free; only (w, losses) leave this function, so release the
        # feature table's blocks deterministically instead of waiting for
        # the JVM to GC the Dataset.
        release_local_checkpoint(spark, held)
    return w, losses


def score(feats: DataFrame, w: list[float]) -> DataFrame:
    """Apply trained weights in-row: (y, p double, pred int)."""
    m = _margin(w)
    return feats.selectExpr(
        "y",
        f"1.0 / (1.0 + exp(-({m}))) AS p",
        f"CAST(CASE WHEN {m} >= 0 THEN 1 ELSE 0 END AS INT) AS pred",
    )


def quality_p_expr(
    w: list[float], text: str = "text", n_chars: str = "n_chars"
) -> str:
    """The trained quality probability as ONE in-row SQL expression over
    arbitrary text / char-count source expressions — the score-many form
    the pipeline's --quality-min gate applies to extraction output
    (broadcast-literal weights, zero shuffle, no intermediate columns)."""
    feats = FEATURES_TEMPLATE.format(text=text, n_chars=n_chars)
    m = (
        f"aggregate(zip_with({feats}, {_w_lit(w)}, (a, b) -> a * b), "
        "CAST(0 AS DOUBLE), (s, v) -> s + v)"
    )
    return f"1.0 / (1.0 + exp(-({m})))"


def python_logreg(
    rows: list[tuple[list[float], float]], lr: float = 1.0, iters: int = 30
) -> tuple[list[float], list[float]]:
    """Pure-Python twin (pytest oracle): same init, same full-batch
    updates, same stable loss."""
    n = len(rows)
    w = [0.0] * DIM
    losses: list[float] = []
    for _ in range(int(iters)):
        g = [0.0] * DIM
        loss = 0.0
        for x, y in rows:
            m = sum(a * b for a, b in zip(x, w))
            # stable sigmoid (review r5): exp(-m) overflows past |m|~709
            # where the Spark expression saturates to 0/1 — branch on sign
            if m >= 0:
                p = 1.0 / (1.0 + math.exp(-m))
            else:
                e = math.exp(m)
                p = e / (1.0 + e)
            for j in range(DIM):
                g[j] += (p - y) * x[j]
            loss += math.log(1.0 + math.exp(-abs(m))) + (
                abs(m) if (2.0 * y - 1.0) * m < 0 else 0.0
            )
        losses.append(loss / n)
        w = [w[j] - lr * g[j] / n for j in range(DIM)]
    return w, losses
