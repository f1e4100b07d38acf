"""Declared query surface.

Importing this package registers every query module with the registry;
``__spark_entry__.py`` exposes the result to the driver.
"""

from conversadocs_spark.plans.registry import ORACLES, QUERIES, register  # noqa: F401

# Import for side effect: each module registers its queries.
from conversadocs_spark.plans import (  # noqa: E402,F401
    aggregates,
    analytics,
    eventtime,
    graph,
    ingestion,
    joins,
    lake,
    lm,
    multimodal,
    pipeline,
    rag,
    relational,
    retrieval,
    setops,
    skew,
    streamqueries,
    text,
    udfs,
    vector,
    windows,
)
