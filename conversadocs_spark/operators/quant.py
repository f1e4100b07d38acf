"""Scalar int8 quantization (SQ8) for embedding storage.

The reference stores float32 vectors RAM-resident
(/root/reference/conversadocs/bones.py:74 — DocArrayInMemorySearch);
at 100 TB the vector column's footprint is the serving bottleneck, and
the standard first lever (before PQ's 32x, operators/pq.py) is SQ8:
per-vector min/max affine quantization to one byte per dimension — 4x
smaller than float32, ~1-2% cosine error on unit-scale embeddings.

Design for determinism (so the quantized kNN is ORACLE-BACKED, unlike
the trained/approximate ANN families):
- per-VECTOR min/max bounds (no trained statistics, no data-dependent
  codebook) — quantization is a pure row-local expression;
- code = floor((x - qmin)/qscale + 0.5) - 128, stored as TINYINT
  (floor(z + 0.5) instead of round(z) because SQL round() semantics
  differ across engines at midpoints; floor is unambiguous);
- dequant xh = qmin + (code + 128) * qscale — double arithmetic,
  bit-identical in any IEEE engine evaluating the same expression.

Everything is pure Catalyst (transform/aggregate/zip_with inside
whole-stage codegen): no Python, no shuffle, storage-sized output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "q",
) -> DataFrame:
    """Add SQ8 columns: ``out_col`` array<tinyint>, ``qmin`` double,
    ``qscale`` double. A constant vector (max == min) gets qscale 0
    and all-(-128) codes; dequantization returns the constant
    exactly."""
    v = F.col(vec_col)
    qmin = F.array_min(v).cast("double")
    qscale = (
        (F.array_max(v).cast("double") - qmin) / F.lit(255.0)
    )
    code = F.transform(
        v,
        lambda x: F.when(
            F.col("qscale") > 0,
            F.floor((x.cast("double") - F.col("qmin"))
                    / F.col("qscale") + F.lit(0.5)) - 128,
        ).otherwise(F.lit(-128)).cast("tinyint"),
    )
    return (
        df.withColumn("qmin", qmin)
        .withColumn("qscale", qscale)
        .withColumn(out_col, code)
    )


def dequantized(
    q_col: str = "q",
    qmin_col: str = "qmin",
    qscale_col: str = "qscale",
) -> Column:
    """array<double> reconstruction: qmin + (code + 128) * qscale."""
    return F.transform(
        F.col(q_col),
        lambda c: F.col(qmin_col)
        + (c.cast("double") + F.lit(128.0)) * F.col(qscale_col),
    )
