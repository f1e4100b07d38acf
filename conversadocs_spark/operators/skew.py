"""Skew-mitigation operators: deterministic salted join and two-phase
distinct aggregation.

At 100 TB a handful of hot keys (one viral document, one power user)
can put most of a join's or aggregation's rows into a single reducer.
AQE's skew-join split (spark.sql.adaptive.skewJoin) rewrites sort-merge
partitions at runtime, but it does not cover broadcast-ineligible
shuffled hash joins on a *planned* hot key, and nothing automatic fixes
a skewed shuffle for non-algebraic aggregates. These operators are the
explicit forms:

- ``salted_join``: spread each hot key of the large side over
  ``n_salt`` sub-keys using a *row-dependent* deterministic salt, and
  replicate the small side ``n_salt``-fold, so the per-reducer load of
  a hot key drops by ``n_salt`` at the cost of an ``n_salt``-times
  larger (still small) build side. Output is exactly the unsalted join
  (pinned by tests/test_skew.py).

- ``two_phase_distinct``: COUNT(DISTINCT x) GROUP BY k shuffled
  directly by ``k`` concentrates hot groups; shuffling first by
  ``(k, x)`` (high combined cardinality, skew diluted by x), deduping,
  then counting by ``k`` moves the wide shuffle onto a well-spread key
  and the second shuffle carries only pre-deduped rows. (Catalyst
  plans built-in distinct aggregates through a similar two-step; the
  explicit form documents the shape and composes with salting when
  even ``(k, x)`` is hot.)

The salt is ``xxhash64(row-id column) % n_salt`` — deterministic, so
query results are reproducible and oracle-checkable; never use rand()
for a salt (retries/stage recomputation would see different salts and
silently drop or duplicate join rows).

Reference analog: none — the reference is single-process (SURVEY.md
§4.1 "parallelism"); skew only exists once the workload is
distributed, which is exactly the north-star gap this engine fills.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str | list[str],
    salt_src: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the large side with
    ``xxhash64(salt_src) % n_salt`` (``salt_src`` = any column that
    varies within a join key, e.g. the large side's primary key) and
    explode the small side across all ``n_salt`` salt values, then join
    on (keys + salt).

    For ``how`` in {'inner', 'left', 'left_semi', 'left_anti'} the
    result is row-for-row identical to ``large.join(small, on, how)``;
    the only change is the shuffle key, which now spreads any hot join
    key over ``n_salt`` reducers. Cost: the small side is duplicated
    ``n_salt`` times into the exchange — keep ``n_salt`` at the level
    of the observed skew factor, not higher.

    Right/full outer are rejected: the small side is exploded
    ``n_salt``-fold, so a small-side row whose key never meets a
    large-side row (or whose salt value never occurs for that key)
    would null-extend once per salt replica instead of once. To salt a
    right-outer join, swap the sides and use ``how='left'``.
    """
    if how not in {"inner", "left", "left_semi", "left_anti"}:
        raise ValueError(
            "salted_join preserves semantics only for how in "
            "{'inner','left','left_semi','left_anti'}; got "
            f"{how!r}. For right/full outer, salt the preserved side "
            "(swap large/small) instead."
        )
    keys = [on] if isinstance(on, str) else list(on)
    salt = F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salt)).cast("int")
    lhs = large.withColumn(_SALT, salt)
    rhs = small.withColumn(
        _SALT,
        F.explode(F.array(*[F.lit(i) for i in range(n_salt)])),
    )
    # Force a sort-merge join: salting targets exactly the case where
    # the build side is too big to broadcast — left to itself Catalyst
    # may still try to broadcast the n_salt-fold replica (it OOM'd a
    # default-memory driver at 10x test scale), which would also defeat
    # the point (a broadcast join has no skewed shuffle to fix). Merge
    # rather than shuffle_hash: the hash build is unspillable and died
    # on the same 10x data in a small-memory session; sort-merge spills.
    return (
        lhs.join(rhs.hint("merge"), on=keys + [_SALT], how=how)
        .drop(_SALT)
    )


def two_phase_distinct(
    df: DataFrame, group_keys: list[str], distinct_col: str
) -> DataFrame:
    """Skew-safe COUNT(DISTINCT distinct_col) GROUP BY group_keys:
    dedupe on (group_keys, distinct_col) first — a shuffle keyed by the
    well-spread combined key — then count per group over the (much
    smaller) deduped set. Returns (group_keys..., n_distinct).

    Counts ``count(distinct_col)``, not ``count(*)``: dropDuplicates
    keeps one (group, NULL) survivor per group, and SQL
    COUNT(DISTINCT x) ignores NULLs — counting the column (which skips
    NULLs) keeps the two in agreement on nullable columns."""
    return (
        df.select(*group_keys, distinct_col)
        .dropDuplicates(group_keys + [distinct_col])
        .groupBy(*group_keys)
        .agg(F.count(F.col(distinct_col)).alias("n_distinct"))
    )
