#!/usr/bin/env python
"""sf100 spot-gate for the SERVING MATRIX (VERDICT r10 #8): the five
quantized/filtered batch-retrieval queries plus the composed
manifest-planned serving query, at ~1000x bench scale (5M docs/vecs).

These are the queries whose plan pins claim "the corpus never
shuffles at ANY scale" — this gate turns the claim into a measurement
one order of magnitude above the sf10 full gate:

- builds /tmp/sf100 documents+embeddings from /tmp/sf10 (copies=10,
  stride 1e10 — clears sf10's id range AND the +1e6 near-dup
  injection offset; the other tables are symlinked from sf10, the
  serving queries never read them),
- runs each query, records wall time and row count,
- asserts the executed-plan pins AT SCALE: no SortMergeJoin /
  ShuffledHashJoin anywhere on the unfiltered tiers, every hash
  exchange keyed on query_id only; the filtered queries may
  legitimately degrade their allowed-id semi-join to a shuffled form
  once the tenant set outgrows the broadcast threshold (the
  documented knn_filtered fallback) — for those the gate asserts
  every exchange is either the semi-join's vec_id one or
  query_id-keyed, and records which semi shape ran; the composed
  knn_auto_filtered_batch plans IVF above the crossover, so its
  probe-side list_id structures are also admitted (partition-pruned
  by construction, never a corpus-wide reshuffle),
- value checks: per-query fill (exact expected row counts),
  filter-respect on the filtered queries (anti-join count == 0), and
  recall floors vs the exact cosine top-k computed at the SAME scale
  (int8/matryoshka are near-exact tiers: floor 0.9; binary is a
  1-bit code: floor 0.6; the IVF-planned composed query: floor 0.6 —
  fixture-measured bands, see tests/test_vector.py /
  tests/test_planner.py for the per-tier contracts).

Usage: python scripts/spot_gate_sf100.py [--rebuild]
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SRC = "/tmp/sf10"
DST = "/tmp/sf100"
STRIDE = 10_000_000_000  # clears sf10 ids (max ~9.9e9) per copy
COPIES = 10

#: name -> (expected rows, per-query k for recall, filtered?)
SPECS: dict[str, tuple[int, int | None, bool]] = {
    "knn_int8_batch": (25, 5, False),
    "knn_binary_batch": (15, 3, False),
    "knn_matryoshka_batch": (15, 3, False),
    "multivec_maxsim_batch": (9, None, False),
    # MMR diversifies AWAY from pure top-k by design, so no recall
    # floor — the fill + plan pins carry it (its values are
    # oracle-hash-checked at sf0.01/sf1/sf10)
    "mmr_rerank_exact": (25, None, False),
    "knn_filtered_int8_batch": (25, 5, True),
    "knn_auto_filtered_batch": (15, 3, True),
}
#: Floors are QUALITY bands vs the float-exact top-k at the same
#: scale, not correctness gates — each tier's own semantics
#: (dequantized scoring, Hamming shortlist, IVF probe) are
#: value-hash-checked against DuckDB at sf0.01/sf1/sf10. The raw SQ8
#: tier gets 0.75: at 5M vectors the near-dup-heavy fixture packs
#: near-ties inside one 8-bit quantization step, so int8's top-5 can
#: legitimately drift from the float top-5 (r14 measured: unfiltered
#: 1.00, filtered 0.80 — the filtered corpus halves the pool and
#: promotes ties into the cut). The FILTERED tier re-ranks a
#: TIE-AWARE int8 shortlist (dense_rank()<=20: the top-20 DISTINCT
#: quantized sims with plateaus whole — sf100 measured the true
#: top-5 at dense_rank 2 BEHIND a 1000-deep plateau of int8 rounding
#: noise, so every row-count cut (row_number AND rank(), which
#: counts rows above) puts them at 1001+; row_number()<=4096 bounds
#: the worst case) in fp32 since r15 (VERDICT r14 #1 — the filtered
#: recall sat exactly at its old 0.80 floor), so its floor is 0.95:
#: only a true top-5 member whose value band misses the top-20
#: distinct sims, or cut by the 4096 bound, escapes. Binary is a
#: 1-bit code: 0.6.
RECALL_FLOORS = {
    "knn_int8_batch": 0.75,
    "knn_matryoshka_batch": 0.9,
    "knn_binary_batch": 0.6,
    "knn_filtered_int8_batch": 0.95,
    "knn_auto_filtered_batch": 0.6,
}


def build(spark) -> None:
    from pyspark.sql import functions as F

    from conversadocs_spark.io import table

    for t, col in (("documents", "doc_id"), ("embeddings", "vec_id")):
        df = table(spark, SRC, t)
        out = None
        for i in range(COPIES):
            p = df.withColumn(col, F.col(col) + F.lit(i * STRIDE))
            out = p if out is None else out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
        print(t, spark.read.parquet(f"{DST}/{t}.parquet").count())
    for t in (
        "region nation customer supplier part orders lineitem events"
    ).split():
        link = f"{DST}/{t}.parquet"
        if not os.path.exists(link):
            os.symlink(f"{SRC}/{t}.parquet", link)


def final_plan(df) -> str:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def assert_plan(name: str, final: str, filtered: bool) -> str:
    """Assert the at-scale exchange contract; return a report tag."""
    shape = "broadcast-semi" if filtered else "no-shuffle"
    for line in final.splitlines():
        if "Exchange hashpartitioning" not in line:
            continue
        if "hashpartitioning(query_id" in line:
            continue
        if filtered and "hashpartitioning(vec_id" in line:
            shape = "shuffled-semi"
            continue
        if filtered and "list_id" in line:
            shape += "+ivf"
            continue
        raise AssertionError(
            f"{name}: corpus-wide exchange at sf100: {line.strip()}"
        )
    if not filtered:
        assert "SortMergeJoin" not in final, f"{name}: SMJ at sf100"
        assert "ShuffledHashJoin" not in final, (
            f"{name}: SHJ at sf100"
        )
    return shape


def main() -> None:
    from pyspark.sql import functions as F

    from conversadocs_spark import io
    from conversadocs_spark.operators.knn import knn_per_query
    from conversadocs_spark.plans import QUERIES
    from conversadocs_spark.session import get_spark

    spark = get_spark(app_name="spot-gate-sf100")
    spark.sparkContext.setLogLevel("ERROR")
    if "--rebuild" in sys.argv or not os.path.exists(
        f"{DST}/embeddings.parquet"
    ):
        t0 = time.time()
        build(spark)
        print(f"build: {time.time() - t0:.1f}s")

    emb = io.table(spark, DST, "embeddings")
    docs = io.table(spark, DST, "documents")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    corpus = emb.where(F.col("vec_id") >= 5)
    allowed_df = docs.where(
        (F.col("lang") == "en") & (F.col("source") != "src0")
    ).select(F.col("doc_id").alias("vec_id"))

    # exact cosine top-5 per query at sf100, unfiltered and filtered
    # (one corpus scan each), for the recall floors
    t0 = time.time()
    exact: dict[int, list[int]] = {}
    for r in (
        knn_per_query(corpus, queries, k=5)
        .orderBy("query_id", "rank")
        .collect()
    ):
        exact.setdefault(r.query_id, []).append(r.vec_id)
    exact_f: dict[int, list[int]] = {}
    kept = corpus.join(allowed_df, "vec_id", "left_semi")
    for r in (
        knn_per_query(kept, queries, k=5)
        .orderBy("query_id", "rank")
        .collect()
    ):
        exact_f.setdefault(r.query_id, []).append(r.vec_id)
    print(f"exact baselines (both scans): {time.time() - t0:.1f}s")

    failures = []
    report = []
    for name, (exp_rows, k, filtered) in SPECS.items():
        t0 = time.time()
        df = QUERIES[name](spark, DST)
        rows = df.collect()
        dt = time.time() - t0
        fin = final_plan(df)
        try:
            shape = assert_plan(name, fin, filtered)
            assert len(rows) == exp_rows, (
                f"{name}: {len(rows)} rows, expected {exp_rows} "
                "(under-fill at scale)"
            )
            note = shape
            if filtered:
                n_bad = (
                    df.select("vec_id")
                    .join(allowed_df, "vec_id", "left_anti")
                    .count()
                )
                assert n_bad == 0, (
                    f"{name}: {n_bad} out-of-filter rows at sf100"
                )
            if k is not None:
                base = exact_f if filtered else exact
                got: dict[int, set[int]] = {}
                for r in rows:
                    got.setdefault(r.query_id, set()).add(r.vec_id)
                hit = sum(
                    len(got[q] & set(base[q][:k])) for q in got
                )
                tot = sum(len(set(base[q][:k])) for q in got)
                recall = hit / tot
                note += f" recall={recall:.2f}"
                floor = RECALL_FLOORS[name]
                assert recall >= floor, (
                    f"{name}: recall {recall:.2f} < floor {floor}"
                )
            line = f"{name}: OK rows={len(rows)} {dt:.1f}s {note}"
            report.append(line)
            print(line)
        except AssertionError as ex:
            failures.append(str(ex))
            print(f"{name}: FAIL {ex}")
    print("---")
    for line in report:
        print("REPORT", line)
    if failures:
        sys.exit(f"{len(failures)} failures")
    print("spot-gate sf100: all green")


if __name__ == "__main__":
    main()
