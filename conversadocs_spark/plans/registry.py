"""Query registry: one place where every engine operator declares its
Spark implementation and (when SQL-expressible) its DuckDB oracle.

The driver contract (``__spark_entry__.py``) wants
``queries() -> {name: (spark, sf_dir) -> DataFrame}`` and
``oracle_sql() -> {name: ANSI SQL}``. The registry keeps those two maps
in lock-step so an operator can't be claimed without declaring how it is
checked.

Column-name rule: the driver sorts columns by name before value-hashing,
so every computed column must carry the SAME alias in the Spark plan and
the oracle SQL. Float rule: round(x, 6) on both sides (FIXTURES.md).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}
TAGS: dict[str, tuple[str, ...]] = {}


def register(
    name: str,
    oracle: Optional[str] = None,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query under ``name``.

    ``oracle`` is the equivalent DuckDB SQL (omit only for genuinely
    non-SQL-expressible ops — the driver then records a weaker
    rows-only check).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        TAGS[name] = tags
        return fn

    return deco
