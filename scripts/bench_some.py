#!/usr/bin/env python
"""bench.py's exact timing methodology (warmup at sf0.001, then
min-of-3 noop-sink runs with process-tree CPU deltas) applied to a
NAMED subset of queries — the per-change A/B instrument for
optimization rounds (guide §1.4/§1.5). Not the driver contract;
bench.py remains the one source of headline numbers.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/bench_some.py name [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import bench  # noqa: E402  (reuse the CPU instrumentation)


def main() -> None:
    names = sys.argv[1:]
    reps = int(os.environ.get("BENCH_SOME_REPS", "3"))
    raw_sf_dir = os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    # same multi-row-group layout rewrite as bench.py (so A/Bs measure
    # the regime the driver's bench measures); SPARK_GRAFT_BENCH_RAW=1
    # for the raw single-row-group regime.
    sf_dir = bench.bench_layout(raw_sf_dir)
    from conversadocs_spark.plans import QUERIES
    from conversadocs_spark.session import get_spark

    spark = get_spark(app_name="bench-some")
    spark.sparkContext.setLogLevel("ERROR")
    if sf_dir is not raw_sf_dir and os.environ.get(
        "SPARK_GRAFT_OPEN_COST_BYTES"
    ):
        spark.conf.set(
            "spark.sql.files.openCostInBytes",
            os.environ["SPARK_GRAFT_OPEN_COST_BYTES"],
        )
    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        if os.path.isdir(warm_dir):
            QUERIES[name](spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()
    out = {}
    for name in names:
        fn = QUERIES[name]
        best, best_cpu = None, None
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"bench-some: {name}")
            tree0, box0 = bench._tree_cpu_seconds(), bench._box_cpu_seconds()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if best is None or dt < best:
                best = dt
                tree1, box1 = (
                    bench._tree_cpu_seconds(),
                    bench._box_cpu_seconds(),
                )
                best_cpu = {
                    "tree_cpu": round(tree1 - tree0, 2),
                    "box_cpu": round(box1 - box0, 2),
                }
        out[name] = {"sec": round(best, 3), **best_cpu}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
