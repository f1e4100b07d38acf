"""Z-order (Morton) curve values as pure Catalyst expressions, and a
z-clustered parquet writer.

Why: a table range-partitioned/sorted on ONE column prunes scans only
for predicates on that column. Interleaving the bits of two columns
into one sort key makes every written file cover a small RECTANGLE in
(x, y) space, so parquet min/max stats (file- and row-group-level)
prune scans for predicates on EITHER column — the Delta/Databricks
OPTIMIZE ZORDER layout, here as a plain repartitionByRange + write.

Everything is shiftright/bitwise-AND/shiftleft/OR on longs — JVM
whole-stage-codegen, no UDF — and the write is one range shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints:
    result bit 2i is x's bit i, bit 2i+1 is y's bit i. Values are
    clamped into [0, 2^bits) so out-of-range inputs degrade to the
    curve edge instead of corrupting the ordering."""
    cap = (1 << bits) - 1
    xl = F.least(F.greatest(x.cast("long"), F.lit(0)), F.lit(cap))
    yl = F.least(F.greatest(y.cast("long"), F.lit(0)), F.lit(cap))
    z = F.lit(0).cast("long")
    for i in range(bits):
        xbit = F.shiftright(xl, i).bitwiseAND(F.lit(1))
        ybit = F.shiftright(yl, i).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(F.shiftleft(xbit, 2 * i)).bitwiseOR(
            F.shiftleft(ybit, 2 * i + 1)
        )
    return z


def _scale_to_bits(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Linearly map ``col`` from [lo, hi] onto [0, 2^bits): without
    this normalization a column whose range is much smaller than the
    other's never sets the high interleave bits and the curve
    degenerates into single-column ordering (exactly the failure the
    layout exists to avoid)."""
    cap = (1 << bits) - 1
    span = (hi - lo + 1).cast("double")
    scaled = F.floor(
        (col.cast("double") - lo.cast("double")) / span * (1 << bits)
    ).cast("long")
    return F.least(F.greatest(scaled, F.lit(0)), F.lit(cap))


def write_zordered(
    df: DataFrame,
    x_col: str,
    y_col: str,
    path: str,
    n_files: int = 16,
    bits: int = 16,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered along the
    z-curve of (x_col, y_col): both columns are first scaled onto the
    full [0, 2^bits) range (bounds come from a 1-row broadcast
    aggregate, never a driver collect), then one range shuffle on the
    interleaved value + sort within partitions; the helper column is
    dropped at the write boundary. File min/max stats then bound BOTH
    columns tightly per file."""
    bounds = df.agg(
        F.min(x_col).alias("_xlo"),
        F.max(x_col).alias("_xhi"),
        F.min(y_col).alias("_ylo"),
        F.max(y_col).alias("_yhi"),
    )
    xs = _scale_to_bits(
        F.col(x_col), F.col("_xlo"), F.col("_xhi"), bits
    )
    ys = _scale_to_bits(
        F.col(y_col), F.col("_ylo"), F.col("_yhi"), bits
    )
    (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("_z", z_value(xs, ys, bits))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z", "_xlo", "_xhi", "_ylo", "_yhi")
        .write.mode("overwrite")
        .parquet(path)
    )
