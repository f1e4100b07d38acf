"""Distributed logistic-regression training via aggregate-only jobs.

The missing tier of the quality stack: the reference filters documents
with hand-set heuristics only (no learned scorer exists in
/root/reference — this is the "train a fastText/LR quality classifier
on your own corpus" step every production training-data pipeline adds
on top, e.g. the GPT-3/CCNet quality classifiers). The engine analog:
fit the classifier ON the cluster with the same aggregate machinery
every other operator uses.

Training algorithm — Newton/IRLS with L2 regularization, the
classical distributed LR (and what Spark MLlib's LBFGS approximates):
- ONE Spark job per iteration: a single global aggregate computing
  the full gradient ``X'(p - y)/n`` AND the d(d+1)/2 unique Hessian
  entries ``X'RX/n`` (R = p(1-p)) as map-side-combinable sums — for
  d features that is d + d(d+1)/2 + 1 sum columns, still one agg row;
- the DRIVER holds the weight vector (d doubles — model-sized by
  definition) and solves the regularized d x d Newton system with
  numpy; weights enter the next iteration's expressions as literals,
  so executors run pure whole-stage-codegen arithmetic, no Python;
- L2 ridge (default 1e-6) keeps the system nonsingular even on
  perfectly separable labels (where the unregularized MLE diverges),
  making the converged weights a unique, engine-independent fixed
  point.

Scale: the feature relation is cached once; each of the K iterations
is one map-side-combinable pass over it. Newton converges
quadratically — K=15 reaches the regularized MLE to full float
precision on the fixture — and K is FIXED, so unlike a vocab-sized
merge loop the driver iteration count is independent of data size.

Rows-only by design: w_{t+1} needs an aggregate over all rows at w_t,
which SQL recursion cannot express (no aggregates in a recursive
term); the test suite pins the weights against an independent NumPy
IRLS re-derivation instead.
"""

from __future__ import annotations

import functools
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _z(w: Sequence[float], feature_cols: Sequence[str]):
    z = None
    for wj, c in zip(w, feature_cols):
        term = F.col(c) * F.lit(float(wj))
        z = term if z is None else z + term
    return z


def lr_train(
    features: DataFrame,
    feature_cols: Sequence[str],
    label_col: str = "y",
    lam: float = 1e-6,
    n_iter: int = 15,
) -> list[float]:
    """Fit L2-regularized logistic regression by Newton/IRLS; returns
    the weight list aligned with ``feature_cols`` (include a constant
    column for the bias). ``features`` should be cached by the caller
    — every iteration scans it once. The per-iteration ``.collect()``
    fetches ONE aggregate row of d + d(d+1)/2 + 1 doubles (gradient +
    Hessian sums + count): pure model state, never data."""
    import numpy as np

    d = len(feature_cols)
    w = [0.0] * d
    for _ in range(n_iter):
        p = F.lit(1.0) / (
            F.lit(1.0) + F.exp(-_z(w, feature_cols))
        )
        err = p - F.col(label_col)
        r = p * (F.lit(1.0) - p)
        aggs = [
            F.sum(err * F.col(c)).alias(f"g{j}")
            for j, c in enumerate(feature_cols)
        ]
        for j in range(d):
            for k in range(j, d):
                aggs.append(
                    F.sum(
                        r
                        * F.col(feature_cols[j])
                        * F.col(feature_cols[k])
                    ).alias(f"h{j}_{k}")
                )
        # n must count exactly the rows the gradient/Hessian sums see:
        # F.sum skips rows where any participating column is NULL, so
        # a null feature/label would silently shrink g and H by 1/n
        # instead of erroring (ADVICE r8). Count complete rows and
        # fail loudly on any incomplete one.
        complete = F.when(
            functools.reduce(
                lambda a, c: a & F.col(c).isNotNull(),
                feature_cols,
                F.col(label_col).isNotNull(),
            ),
            F.lit(1),
        )
        aggs.append(F.count(complete).alias("n"))
        aggs.append(F.count(F.lit(1)).alias("n_all"))
        row = features.agg(*aggs).collect()[0]
        if int(row["n"]) != int(row["n_all"]):
            raise ValueError(
                "lr_train: "
                f"{int(row['n_all']) - int(row['n'])} row(s) have a "
                "NULL label/feature; drop or impute them before "
                "training (a silent skip would bias the fit)"
            )
        n = float(row["n"])
        g = np.array(
            [float(row[f"g{j}"]) for j in range(d)]
        ) / n + lam * np.asarray(w)
        H = np.zeros((d, d))
        for j in range(d):
            for k in range(j, d):
                H[j, k] = H[k, j] = float(row[f"h{j}_{k}"]) / n
        H += lam * np.eye(d)
        w = list(np.asarray(w) - np.linalg.solve(H, g))
    return [float(x) for x in w]


def lr_predict(w: Sequence[float], feature_cols: Sequence[str]):
    """Column: sigmoid(w . x) for the trained weights (pure Catalyst;
    scoring at serving time is one codegen expression per row)."""
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-_z(w, feature_cols)))
