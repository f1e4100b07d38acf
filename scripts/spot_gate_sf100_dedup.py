#!/usr/bin/env python
"""sf100 spot-gate for the DEDUP/CURATION PATH (VERDICT r11 #5): the
minhash pipeline and connected-components clustering at ~1000x bench
scale (5,000,000 documents), one order of magnitude above the sf10
full gate where these claims were last measured.

What is asserted at 5M docs:

- `dedup_clusters` (the REGISTERED query) runs END TO END and its
  full output passes the label fixed-point invariants from
  scripts/scale_gate.py: every cluster_id is the min doc_id of its
  member set, every cluster has >= 2 members and exactly one
  survivor, no doc carries two labels — zero violations required.
- the minhash candidate stage is BUCKETED-NOT-ALL-PAIRS numerically:
  banded candidate pairs (hot_cap=4096, the registered parameters)
  must stay within the salted linear bound bands * n_reps * hot_cap,
  which at this scale is ~9 orders of magnitude below C(5M, 2); the
  executed plan must also contain no CartesianProduct.
- representative near-dup pairs (rid1, rid2, jaccard_sim) pass the
  same value invariants the sf1/sf10 gates assert: canonical order,
  jaccard within [threshold, 1], and an exact Python re-derivation
  of jaccard from the raw texts for a deterministic 200-pair sample.

Why the REPRESENTATIVE layer and not the registered `dedup_minhash`
id-pair expansion: this fixture is built by COPYING sf0.1 a thousand
times with id strides, so every distinct text has ~1000
identical-content copies and the id-level pair set is ~C(1000,2) *
n_texts ~ 2.5e9 rows — quadratic in the copy count BY DEFINITION
(operators/dedup.py:minhash_rep_near_dups docstring), i.e. the
OUTPUT is fixture-inflated, not the computation. The engine's scale
path is exactly the representative layer (signature, banding,
candidates, re-check all run per DISTINCT content; dedup_clusters
builds components there and maps members afterward, staying
output-linear) — so that is what this gate measures. The id-level
expansion size is still computed ANALYTICALLY from the group sizes
(one aggregate, nothing materialized) and reported, so the drop is
loud, not silent. The expansion's correctness is hash-checked by the
driver at sf0.01 and value-audited at sf1/sf10 where the copy counts
(10/100) keep it materializable.

Usage: python scripts/spot_gate_sf100_dedup.py [--rebuild]
(builds /tmp/sf100 from /tmp/sf10 via spot_gate_sf100.build if
missing; /tmp/sf10 comes from scripts/make_scale_dataset.py).
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from scripts.scale_gate import (  # noqa: E402
    check_clusters_fixed_point,
    check_dedup_pairs_values,
)
from scripts.spot_gate_sf100 import DST, build  # noqa: E402


def main() -> None:
    import duckdb
    from pyspark.sql import functions as F

    from conversadocs_spark import io
    from conversadocs_spark.operators.dedup import (
        bucket_pairs,
        hashed_shingles,
        minhash_banded,
        minhash_rep_near_dups,
        minhash_signatures,
    )
    from conversadocs_spark.plans import QUERIES
    from conversadocs_spark.session import get_spark

    spark = get_spark(app_name="spot-gate-sf100-dedup")
    spark.sparkContext.setLogLevel("ERROR")
    if "--rebuild" in sys.argv or not os.path.exists(
        f"{DST}/documents.parquet"
    ):
        t0 = time.time()
        build(spark)
        print(f"build: {time.time() - t0:.1f}s")

    con = duckdb.connect()
    path = f"{DST}/documents.parquet"
    glob = "/*.parquet" if os.path.isdir(path) else ""
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{path}{glob}'"
    )
    docs = io.table(spark, DST, "documents")
    n_docs = docs.count()
    print(f"sf100 documents: {n_docs}")

    failures: list[str] = []
    report: list[str] = []

    # ---- rep-layer minhash: candidates + pair values ------------
    t0 = time.time()
    holder: list = []
    rep_pairs, membership = minhash_rep_near_dups(
        docs, threshold=0.5, n=3, num_hashes=64, bands=16,
        cache_holder=holder, hot_cap=4096,
    )
    pairs_out = rep_pairs.localCheckpoint(eager=True)
    n_rep_pairs = pairs_out.count()
    dt_pairs = time.time() - t0
    plan = rep_pairs._jdf.queryExecution().executedPlan().toString()
    if "CartesianProduct" in plan:
        failures.append("rep_pairs: CartesianProduct at sf100")

    # candidate bound: re-run the banded bucket stage on the SAME
    # representative relation with the registered parameters
    t0 = time.time()
    reps = membership.where(
        F.col("id") == F.col("rid")
    ).select(F.col("rid").alias("doc_id"))
    rep_docs = docs.join(reps, "doc_id", "left_semi")
    n_reps = rep_docs.count()
    banded = minhash_banded(
        minhash_signatures(hashed_shingles(rep_docs), 64), 16, 4
    ).localCheckpoint()
    cands = bucket_pairs(
        banded, ["band", "band_hash"], F.struct(F.col("id")),
        hot_cap=4096,
    ).count()
    bound = 16 * n_reps * 4096
    dt_cand = time.time() - t0
    line = (
        f"candidate_bound: candidates={cands} linear-bound={bound} "
        f"n_reps={n_reps} (C(n_docs,2)~{n_docs * (n_docs - 1) // 2:.1e}) "
        f"{dt_cand:.1f}s"
    )
    report.append(line)
    print(line, flush=True)
    if not (0 < cands <= bound):
        failures.append(
            f"candidate bound violated: {cands} > {bound}"
        )

    # rep-pair value invariants (sf1/sf10 audit, now at 5M docs)
    ok, note = check_dedup_pairs_values(
        spark, con,
        pairs_out.select(
            F.col("rid1").alias("id1"),
            F.col("rid2").alias("id2"),
            "jaccard_sim",
        ),
    )
    line = f"rep_pairs: rows={n_rep_pairs} {dt_pairs:.1f}s {note}"
    report.append(line)
    print(line, flush=True)
    if not ok:
        failures.append(f"rep_pairs invariants: {note}")

    # analytic id-level expansion size (reported, never materialized)
    grp = membership.groupBy("rid").agg(F.count("*").alias("sz"))
    expansion = (
        grp.agg(
            F.sum(
                F.col("sz") * (F.col("sz") - 1) / 2
            ).alias("within")
        ).collect()[0]["within"]
    )
    line = (
        f"id-level expansion (ANALYTIC, within identical-content "
        f"groups alone): ~{int(expansion):,} pairs — the "
        "output-quadratic fixture artifact this gate does not "
        "materialize (see module docstring)"
    )
    report.append(line)
    print(line, flush=True)
    for c in holder:
        c.unpersist()

    # ---- dedup_clusters: full registered query at 5M docs -------
    t0 = time.time()
    sdf = QUERIES["dedup_clusters"](spark, DST)
    ok, note = check_clusters_fixed_point(spark, con, sdf)
    dt = time.time() - t0
    line = f"dedup_clusters: {dt:.1f}s {note}"
    report.append(line)
    print(line, flush=True)
    if not ok:
        failures.append(f"dedup_clusters invariants: {note}")

    print("---")
    for line in report:
        print("REPORT", line)
    if failures:
        sys.exit(f"{len(failures)} failures: {failures}")
    print("spot-gate sf100 dedup: all green")


if __name__ == "__main__":
    main()
