#!/usr/bin/env python
"""sf100 spot-gate for the GRAPH family (VERDICT r13 #4): pagerank at
~1000x bench-fixture scale — the last major family without 5M-scale
evidence (serving, dedup, quality screens, and selection/packing all
carry sf100 gates; connected components is gated at 5M rows but
pagerank itself was not).

Graph: DIRECTED co-purchase over EVERY copy of the sf100 lineitem
(rows with l_orderkey % 10_000_000 < 10_000 — the same per-copy
slice in each copy): edges lower-partkey -> higher-partkey per shared
order, deduped. Measured shape: ~1.72M nodes / ~8.07M directed edges
(vs the bench fixture's 6.5k nodes / 165k edges), with a REAL
dangling set (nodes that never appear as src), so the
dangling="uniform" path — the per-round 1-row broadcast — is
exercised at scale, not just the symmetric-graph "none" path the
bench fixture uses.

Plan pins, on the segment that actually executed
(operators/pagerank.py LAST_ROUND_PLAN, captured after the first
checkpoint runs — the components.LAST_RUN_ROUNDS observability
precedent). The edge list is eagerly localCheckpointed before the
call so the operator's ENTIRE lineage is file-free — any FileScan in
a round plan would be a genuine in-loop rescan:
  - no FileScan anywhere in the round plan;
  - links and the dangling set read from cache (InMemoryTableScan),
    rank state from the checkpoint RDD (Scan ExistingRDD);
  - corpus-wide exchanges bounded: at most the two inherent ones
    (ranks into the contribution join, the dst-keyed sum) plus one
    single-partition 1-row dangling aggregate, counted on the final
    plan with cached-lineage subtrees stripped;
  - the dangling mass enters the update through a broadcast.

Value audit (bit-exact, the copy-identity argument): the key strides
make the sf100 graph N structurally IDENTICAL disconnected
components (copy k's partkeys are copy-0's + k*1M; orderkeys
+ k*10M), and the fixed-point update is topology-local except for
two global scalars — n_nodes (a constant) and the per-round dangling
share (a sum of per-node floors, therefore exactly N x copy-0's sum
while all copies carry identical ranks, which holds by induction
from the uniform init). So a pure-Python integer replay of COPY 0
ONLY, run with the GLOBAL n and dshare_global = N * dshare_copy0,
must equal the Spark ranks of copy-0 nodes bit for bit. The gate
first PROVES the preconditions on the data (N derived from the
counts; copy-1's edge set re-extracted and compared to copy-0's
plus the strides, edge for edge) and then compares every copy-0
node's rank.

Usage: python scripts/spot_gate_sf100_graph.py
(expects /tmp/sf100 from spot_gate_sf100.py --rebuild)
"""

from __future__ import annotations

import os
import re
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

DST = os.environ.get("SPARK_GRAFT_SF100_DIR", "/tmp/sf100")
# round-plan capture is opt-in since r16 (0.3-0.5 s/call of pure
# observability wall on the serving path); this gate is an auditor,
# so it opts in before any pagerank call
os.environ["SPARK_GRAFT_CAPTURE_ROUND_PLAN"] = "1"

ITERS = 12
SCALE = 10**12
STRIDE_PART = 1_000_000
STRIDE_ORDER = 10_000_000
SLICE = 10_000  # per-copy l_orderkey slice (orderkey % 10M < SLICE)


def strip_cached_lineage(plan: str) -> str:
    """Keep the executed (final) segment only, then drop every
    InMemoryRelation subtree (the cached-build lineage the printer
    renders below each InMemoryTableScan): what remains is the work
    the round itself does."""
    final = plan.split("== Initial Plan ==")[0]
    out: list[str] = []
    skip_indent: int | None = None
    for line in final.splitlines():
        indent = len(line) - len(line.lstrip(" :"))
        if skip_indent is not None:
            if indent > skip_indent:
                continue
            skip_indent = None
        if "InMemoryRelation" in line:
            skip_indent = indent
            continue
        out.append(line)
    return "\n".join(out)


def python_replay(edges_c0, n_global, mult, iters):
    """Pure-Python integer fixed-point replay of copy-0 with the
    global scalars (see module docstring). Returns {id: rank_fp}."""
    deg: dict[int, int] = {}
    for s, _d in edges_c0:
        deg[s] = deg.get(s, 0) + 1
    nodes = set()
    for s, d in edges_c0:
        nodes.add(s)
        nodes.add(d)
    dang = sorted(nodes - set(deg))
    base = SCALE // n_global
    r = {v: base for v in nodes}
    for _t in range(iters):
        inflow = {v: 0 for v in nodes}
        for s, d in edges_c0:
            inflow[d] += r[s] // deg[s]
        dsh = mult * sum(r[d] // n_global for d in dang)
        r = {
            v: (15 * base + 85 * (inflow[v] + dsh)) // 100
            for v in nodes
        }
    return r, len(dang)


def main() -> None:
    import duckdb
    from pyspark.sql import functions as F

    from conversadocs_spark import io
    from conversadocs_spark.operators import pagerank as pr
    from conversadocs_spark.session import get_spark

    spark = get_spark(app_name="spot-gate-sf100-graph")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(f"{DST}/lineitem.parquet"):
        sys.exit("run scripts/spot_gate_sf100.py --rebuild first")

    failures: list[str] = []
    report: list[str] = []

    # ---- edge list over all copies ----------------------------------
    li = (
        io.table(spark, DST, "lineitem")
        .where(F.col("l_orderkey") % STRIDE_ORDER < SLICE)
        .select("l_orderkey", "l_partkey")
    )
    edges = (
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .distinct()
        # eager checkpoint: the operator's lineage becomes file-free,
        # so ANY FileScan in a round plan is a genuine in-loop rescan
        # (the strongest form of that pin)
        .localCheckpoint(eager=True)
    )
    n_edges_global = edges.count()

    t0 = time.time()
    ranks = pr.pagerank_fixedpoint(
        edges,
        iters=ITERS,
        scale=SCALE,
        dangling="uniform",
        # the audit is the bit-exact replay below, not residual size;
        # anything pathological still trips this generous guard
        tol_fp=10**10,
    )
    ranks = ranks.persist()
    n_ranked = ranks.count()
    wall = time.time() - t0
    round_plan = pr.LAST_ROUND_PLAN or ""
    report.append(
        f"pagerank uniform: {n_ranked} nodes / {n_edges_global} "
        f"directed edges ranked in {wall:.1f}s ({ITERS} rounds)"
    )

    # ---- plan pins on the segment that actually ran ------------------
    stripped = strip_cached_lineage(round_plan)
    try:
        assert "FileScan" not in round_plan, (
            "round plan rescans raw files"
        )
        assert "InMemoryTableScan" in round_plan, (
            "links/dangling not read from cache"
        )
        assert "Scan ExistingRDD" in round_plan, (
            "rank state not a checkpoint RDD"
        )
        n_hash = len(re.findall(r"Exchange hashpartitioning", stripped))
        n_single = len(re.findall(r"Exchange SinglePartition", stripped))
        assert n_hash <= 2, (
            f"{n_hash} corpus-keyed exchanges in a round:\n{stripped}"
        )
        assert n_single <= 1, f"{n_single} single-partition exchanges"
        assert "BroadcastExchange" in stripped or (
            "BroadcastNestedLoopJoin" in stripped
        ), "dangling mass not broadcast into the update"
        report.append(
            f"round plan: {n_hash} corpus-keyed exchange(s) + "
            f"{n_single} 1-row dangling aggregate (broadcast), "
            "links+dangling from cache, state from checkpoint RDD, "
            "zero FileScans anywhere in the executed round"
        )
    except AssertionError as exc:
        failures.append(f"plan pins: {exc}")

    # ---- copy-identity preconditions ---------------------------------
    con = duckdb.connect()
    con.execute(
        f"""
        CREATE VIEW li AS
        SELECT l_orderkey, l_partkey
        FROM read_parquet('{DST}/lineitem.parquet/*.parquet')
        WHERE l_orderkey % {STRIDE_ORDER} < {SLICE}
        """
    )

    def copy_edges(k: int):
        lo, hi = k * STRIDE_ORDER, k * STRIDE_ORDER + SLICE
        return con.execute(
            f"""
            WITH e AS (
                SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
                FROM li a JOIN li b USING (l_orderkey)
                WHERE a.l_partkey < b.l_partkey
                  AND l_orderkey >= {lo} AND l_orderkey < {hi}
            )
            SELECT src, dst FROM e ORDER BY src, dst
            """
        ).fetchall()

    c0 = copy_edges(0)
    nodes_c0 = {v for edge in c0 for v in edge}
    mult, rem = divmod(n_edges_global, len(c0))
    try:
        assert rem == 0 and n_ranked == mult * len(nodes_c0), (
            f"count identity broken: edges {n_edges_global} vs "
            f"copy-0 {len(c0)}, nodes {n_ranked} vs "
            f"copy-0 {len(nodes_c0)}"
        )
        # copy-1 must equal copy-0 shifted by exactly one part stride
        c1 = copy_edges(1)
        shifted = [
            (s + STRIDE_PART, d + STRIDE_PART) for s, d in c0
        ]
        assert [tuple(x) for x in c1] == shifted, (
            "copy-1 edge set is not copy-0 + stride"
        )
        report.append(
            f"copy identity: {mult} structurally identical components "
            f"x ({len(nodes_c0)} nodes / {len(c0)} edges); copy-1 "
            "re-extracted and equal to copy-0 + stride, edge for edge"
        )
    except AssertionError as exc:
        failures.append(f"copy identity: {exc}")
        mult = None

    # ---- bit-exact value audit ---------------------------------------
    if mult:
        want, n_dang_c0 = python_replay(c0, n_ranked, mult, ITERS)
        got = {
            row["id"]: row["rank_fp"]
            for row in ranks.where(
                F.col("id") < STRIDE_PART
            ).collect()
        }
        try:
            assert set(got) == set(want), (
                f"copy-0 node set mismatch: {len(got)} vs {len(want)}"
            )
            bad = [v for v in want if got[v] != want[v]]
            assert not bad, (
                f"{len(bad)} of {len(want)} copy-0 ranks differ from "
                f"the integer replay, e.g. id={bad[0]} "
                f"spark={got[bad[0]]} replay={want[bad[0]]}"
            )
            report.append(
                f"value audit: all {len(want)} copy-0 ranks equal the "
                f"pure-Python fixed-point replay bit for bit "
                f"({n_dang_c0} dangling nodes per copy exercised the "
                "uniform redistribution at every round)"
            )
        except AssertionError as exc:
            failures.append(f"value audit: {exc}")

    ranks.unpersist()
    print()
    for line in report:
        print("  " + line)
    if failures:
        print("\nFAILURES:")
        for f_ in failures:
            print("  " + f_)
        sys.exit(1)
    print("\nsf100 graph gate: ALL GREEN")


if __name__ == "__main__":
    main()
