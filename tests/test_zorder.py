"""Z-order layout tests: Morton-value correctness against a Python
bit-interleave, and the measurable claim — z-clustered files carry
tighter per-file min/max boxes than a single-column sort, so a 2-D
predicate touches fewer files (the actual pruning mechanism parquet
readers use)."""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from conversadocs_spark import io
from conversadocs_spark.functions.zorder import write_zordered, z_value


def _py_morton(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_z_value_matches_python_interleave(spark):
    pts = [(0, 0), (1, 0), (0, 1), (3, 5), (255, 1), (65535, 65535),
           (12345, 54321)]
    df = spark.createDataFrame(pts, ["x", "y"]).select(
        "x", "y", z_value(F.col("x"), F.col("y")).alias("z")
    )
    for r in df.collect():
        assert r.z == _py_morton(r.x, r.y)
    # clamping: negatives and overflow hit the curve edge, no corruption
    edge = spark.createDataFrame([(-5, 70000)], ["x", "y"]).select(
        z_value(F.col("x"), F.col("y")).alias("z")
    ).first()
    assert edge.z == _py_morton(0, 65535)


def _file_boxes(path: str, x_col: str, y_col: str):
    """Per-file (min, max) of both columns from parquet footer stats —
    exactly what a reader's file-skipping consults."""
    ds = pq.ParquetDataset(path)
    boxes = []
    for frag in ds.fragments:
        md = frag.metadata
        names = frag.physical_schema.names
        xi, yi = names.index(x_col), names.index(y_col)
        xmin = ymin = None
        xmax = ymax = None
        for rg in range(md.num_row_groups):
            xs = md.row_group(rg).column(xi).statistics
            ys = md.row_group(rg).column(yi).statistics
            xmin = xs.min if xmin is None else min(xmin, xs.min)
            xmax = xs.max if xmax is None else max(xmax, xs.max)
            ymin = ys.min if ymin is None else min(ymin, ys.min)
            ymax = ys.max if ymax is None else max(ymax, ys.max)
        boxes.append((xmin, xmax, ymin, ymax))
    return boxes


def test_zorder_layout_prunes_2d_predicates(spark, tmp_path):
    ev = io.table(spark, "/root/testdata/sf0.01", "events").select(
        "user_id",
        ((F.dayofmonth("ts") - 1) * 24 + F.hour("ts"))
        .cast("int")
        .alias("hour_idx"),
        "value",
    )
    z_path = str(tmp_path / "zordered")
    lin_path = str(tmp_path / "linear")
    # bits=10 covers both ranges (150 users, 720 hours) without the
    # curve degenerating into hour-major ordering
    write_zordered(ev, "user_id", "hour_idx", z_path, n_files=16, bits=10)
    # baseline: same file count, single-column (time) clustering
    (
        ev.repartitionByRange(16, "hour_idx")
        .sortWithinPartitions("hour_idx")
        .write.mode("overwrite")
        .parquet(lin_path)
    )
    zb = _file_boxes(z_path, "user_id", "hour_idx")
    lb = _file_boxes(lin_path, "user_id", "hour_idx")
    assert len(zb) == 16 and len(lb) == 16

    def touched(boxes, x_lo, x_hi, y_lo, y_hi):
        return sum(
            1
            for (xmin, xmax, ymin, ymax) in boxes
            if not (xmax < x_lo or xmin > x_hi or ymax < y_lo or ymin > y_hi)
        )

    # a mixed workload: user-only, hour-only, and 2-D probes — the
    # case z-ordering exists for. A single-column layout aces its own
    # column and fails the other completely.
    probes = [
        (10, 20, 0, 719),     # user-selective: linear touches ALL files
        (0, 149, 100, 150),   # hour-selective: linear's home turf
        (100, 110, 300, 360),  # 2-D box
        (40, 45, 0, 48),       # 2-D box
    ]
    z_total = sum(touched(zb, *p) for p in probes)
    l_total = sum(touched(lb, *p) for p in probes)
    assert z_total < l_total
    # where the linear layout cannot prune at all (user-only
    # predicate), z-order must skip most files
    assert touched(lb, 10, 20, 0, 719) == 16
    assert touched(zb, 10, 20, 0, 719) <= 8
    # and the z layout's per-file user_id spread must be far below the
    # global range (files are rectangles, not stripes)
    global_users = 150
    avg_user_span = sum(b[1] - b[0] for b in zb) / len(zb)
    assert avg_user_span < 0.6 * global_users
    # row identity preserved by the rewrite
    assert (
        spark.read.parquet(z_path).count()
        == spark.read.parquet(lin_path).count()
        == ev.count()
    )
