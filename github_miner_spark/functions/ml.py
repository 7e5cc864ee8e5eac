"""Distributed linear-model training as DataFrame aggregation.

The missing tier between heuristic quality filters (functions/text.py)
and an external model service: pre-training pipelines routinely train
small quality classifiers (fastText-style) over corpus features. The
data-parallel core of that training — full-batch gradient descent — is
ONE keyed aggregate per iteration: the gradient of logistic loss is a
sum over rows, so each step is

    grad_j = sum((sigmoid(w . x) - y) * x_j) / n      (one groupBy-less
    w_j   -= lr * grad_j                               agg, map-side
                                                       combined)

The weight vector is k+1 scalars held on the driver (exactly how
Spark MLlib's LBFGS/GD drives its treeAggregate); the corpus never
moves. Weights round to the repo-wide 6dp convention after every
update, so a DuckDB oracle can unroll the same fixed-iteration
schedule and reproduce the weights EXACTLY — training itself becomes
hash-checkable, like the unrolled PageRank / Lloyd k-means.

Scale notes: per iteration the cluster does one scan + one partial-agg
shuffle of k+1 doubles; 100 TB of feature rows trains at scan speed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def logistic_regression_gd(
    features: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iterations: int = 3,
    lr: float = 1.0,
) -> list[float]:
    """Train logistic regression by full-batch GD; returns
    [w_bias, w_<feature_cols...>], each rounded to 6dp per update.
    Deterministic: zero init, fixed iteration count, fixed lr."""
    w = [0.0] * (len(feature_cols) + 1)
    xs = [F.lit(1.0)] + [F.col(c).cast("double") for c in feature_cols]
    y = F.col(label_col).cast("double")
    n = features.count()
    if n == 0:
        # F.sum over zero rows yields NULL grads and the update would
        # divide by zero — fail loudly on the degenerate input instead
        raise ValueError("logistic_regression_gd: empty feature frame")
    for _ in range(iterations):
        margin = sum(
            (F.lit(wj) * xj for wj, xj in zip(w, xs)), start=F.lit(0.0)
        )
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
        grads = features.agg(
            *[F.sum((p - y) * xj).alias(f"g{j}") for j, xj in enumerate(xs)]
        ).collect()[0]
        w = [round(wj - lr * grads[f"g{j}"] / n, 6) for j, wj in enumerate(w)]
    return w


def score_logistic(features: DataFrame, feature_cols: list[str], w: list[float]):
    """Probability column for trained weights (pure expressions)."""
    xs = [F.lit(1.0)] + [F.col(c).cast("double") for c in feature_cols]
    margin = sum((F.lit(wj) * xj for wj, xj in zip(w, xs)), start=F.lit(0.0))
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
