"""Pure column-expression builders (no UDFs unless unavoidable).

Everything here returns pyspark Column expressions that stay inside
whole-stage codegen — the JVM-side fast path.
"""

from conversadocs_spark.functions.vector import (  # noqa: F401
    cosine_similarity,
    dot_product,
    l2_norm,
    l2_normalize,
)
