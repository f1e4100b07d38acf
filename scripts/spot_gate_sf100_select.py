#!/usr/bin/env python
"""sf100 spot-gate for the SELECTION / PACKING path (proactive r13):
`token_budget_select` and `seq_pack_ffd` at ~1000x bench scale
(5M docs) — the last major curation family with only sf10 evidence
(serving, dedup, and the quality screens have sf100 gates already).

token_budget_select's 100 TB claim is the two-level decomposition:
the corpus NEVER meets a corpus-wide single-reducer sort — token
sums aggregate per distinct quality value (bounded bucket table),
the running sum runs over buckets only, and the threshold broadcasts
back (fitting buckets keep all docs; the one straddling bucket
resolves with a quality-keyed partition-local window). Asserted here
at 5M docs:
  - plan: >=1 BroadcastExchange; hash exchanges keyed only on the
    decomposition's keys (quality); every SinglePartition exchange
    is fed by the quality-bucket hash exchange or a 1-row
    budget/broadcast relation (<= 4 such nodes), never by the
    corpus scan side;
  - values, re-derived independently at scale: kept token total <=
    the re-computed 25% budget; quality-monotone boundary (NO
    dropped doc outranks a kept doc: max dropped (quality, -doc_id)
    < min kept (quality, -doc_id) in the selection order);
    maximality (adding the best dropped doc would break the budget).

seq_pack_ffd's claim is shard-bounded determinism: every
applyInPandas group is <= 400 docs at ANY corpus size. Asserted:
  - every doc packed exactly once (5M in, 5M out, distinct);
  - per-pack token sums <= 256 except single-doc oversized packs;
  - packs never span shards (pack_id embeds doc_id div 400);
  - one sampled shard's assignment equals the pure-Python FFD
    reference replay, row for row.

Usage: python scripts/spot_gate_sf100_select.py
(expects /tmp/sf100 from spot_gate_sf100.py --rebuild)
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

DST = os.environ.get("SPARK_GRAFT_SF100_DIR", "/tmp/sf100")


def final_plan(df) -> str:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def main() -> None:
    from pyspark.sql import functions as F

    from conversadocs_spark import io
    from conversadocs_spark.plans import QUERIES
    from conversadocs_spark.session import get_spark

    spark = get_spark(app_name="spot-gate-sf100-select")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(f"{DST}/documents.parquet"):
        sys.exit("run scripts/spot_gate_sf100.py --rebuild first")
    docs = io.table(spark, DST, "documents")
    n_docs = docs.count()
    print(f"sf100 documents: {n_docs}")
    failures: list[str] = []
    report: list[str] = []

    # ---- token_budget_select -------------------------------------
    t0 = time.time()
    sel = QUERIES["token_budget_select"](spark, DST)
    sel.persist()
    n_kept = sel.count()
    dt = time.time() - t0
    fin = final_plan(sel)
    try:
        assert "BroadcastExchange" in fin, "no broadcast in plan"
        # every SinglePartition exchange must sit on the VALUE-DOMAIN
        # side: its feeding exchange (the next Exchange line below it
        # in the printed tree) is the quality-bucket hash exchange,
        # so the single partition only ever sees <= #distinct-quality
        # rows — never the corpus. 4 such nodes = the bucket table
        # re-derived per branch (running sum + threshold, x2).
        lines = fin.splitlines()
        n_single = 0
        for i, line in enumerate(lines):
            if "Exchange SinglePartition" not in line:
                continue
            n_single += 1
            feeder = next(
                (
                    ln
                    for ln in lines[i + 1:]
                    if "Exchange" in ln or "Scan" in ln
                ),
                "",
            )
            ok_feeder = (
                "quality" in feeder            # bucket hash exchange
                or "budget" in feeder          # reused 1-row budget
                or "BroadcastExchange" in feeder  # 1-row broadcast
            )
            assert ok_feeder, (
                f"SinglePartition fed by non-bucket relation: "
                f"{feeder.strip()[:120]}"
            )
        assert n_single <= 4, f"{n_single} SinglePartition exchanges"
        for line in lines:
            if "Exchange hashpartitioning" not in line:
                continue
            assert "quality" in line, (
                f"corpus-keyed exchange outside the decomposition: "
                f"{line.strip()}"
            )
        # independent value re-derivation at scale
        words = F.split(F.col("text"), " ")
        n_words = F.size(words).cast("double")
        n_uniq = F.size(F.array_distinct(words)).cast("double")
        n_chars = F.length("text").cast("double")
        n_punct = F.size(
            F.regexp_extract_all("text", F.lit(r"[^A-Za-z0-9\s]"), 0)
        ).cast("double")
        q = F.round(
            F.least(n_words / 50, F.lit(1.0)) * 0.4
            + (n_uniq / n_words) * 0.4
            + (1 - F.least(n_punct / n_chars, F.lit(1.0))) * 0.2,
            6,
        )
        scored = docs.select(
            "doc_id",
            q.alias("quality_score"),
            F.size(words).cast("long").alias("n_tokens"),
        ).persist()
        budget_row = scored.agg(
            (F.sum("n_tokens") * 0.25).alias("budget")
        ).first()
        budget = budget_row["budget"]
        kept_sum = sel.agg(F.sum("n_tokens").alias("s")).first()["s"]
        assert kept_sum <= budget, (
            f"kept {kept_sum} tokens > budget {budget:.0f}"
        )
        # selection-order boundary: order is (quality desc, doc_id
        # asc); no dropped doc may precede a kept doc in that order
        dropped = scored.join(sel.select("doc_id"), "doc_id", "left_anti")
        best_dropped = (
            dropped.orderBy(F.desc("quality_score"), F.asc("doc_id"))
            .limit(1)
            .collect()
        )
        worst_kept = (
            sel.orderBy(F.asc("quality_score"), F.desc("doc_id"))
            .limit(1)
            .collect()
        )
        if best_dropped and worst_kept:
            bd, wk = best_dropped[0], worst_kept[0]
            assert (bd.quality_score, -bd.doc_id) < (
                wk.quality_score,
                -wk.doc_id,
            ), (
                f"boundary violated: dropped ({bd.quality_score},"
                f"{bd.doc_id}) outranks kept ({wk.quality_score},"
                f"{wk.doc_id})"
            )
            # maximality: the next doc in order would break the budget
            assert kept_sum + bd.n_tokens > budget, (
                f"not maximal: next doc ({bd.n_tokens} tokens) still "
                f"fits ({kept_sum} + it <= {budget:.0f})"
            )
        util = kept_sum / budget
        line = (
            f"token_budget_select: OK kept={n_kept}/{n_docs} "
            f"{dt:.1f}s util={util:.4f} single_part_ex={n_single}"
        )
        report.append(line)
        print(line)
        scored.unpersist()
    except AssertionError as ex:
        failures.append(str(ex))
        print(f"token_budget_select: FAIL {ex}")
    sel.unpersist()

    # ---- seq_pack_ffd --------------------------------------------
    t0 = time.time()
    packed = QUERIES["seq_pack_ffd"](spark, DST)
    packed.persist()
    n_rows = packed.count()
    dt = time.time() - t0
    try:
        assert n_rows == n_docs, f"{n_rows} packed rows != {n_docs}"
        n_distinct = packed.select("doc_id").distinct().count()
        assert n_distinct == n_docs, "doc packed more than once"
        # pack_id is SHARD-LOCAL (operators/packing.py) — the pack
        # key is (shard_id, pack_id)
        per_pack = packed.groupBy("shard_id", "pack_id").agg(
            F.sum("n_tokens").alias("tok"),
            F.count("*").alias("members"),
        )
        n_over = per_pack.where(
            (F.col("tok") > 256) & (F.col("members") > 1)
        ).count()
        assert n_over == 0, (
            f"{n_over} multi-doc packs exceed the 256 budget"
        )
        n_span = (
            packed.where(
                (F.col("doc_id") / 400).cast("long")
                != F.col("shard_id")
            ).count()
        )
        assert n_span == 0, (
            f"{n_span} rows with shard_id != doc_id div 400"
        )
        # exact FFD replay of one mid-corpus shard
        # doc ids are STRIDED at sf100 (make_scale_dataset offsets),
        # so pick the median EXISTING shard, not doc-count/400/2
        shards = [
            r.shard_id
            for r in packed.select("shard_id")
            .distinct()
            .orderBy("shard_id")
            .collect()
        ]
        shard_id = shards[len(shards) // 2]
        rows = packed.where(
            F.col("shard_id") == shard_id
        ).select("doc_id", "n_tokens", "pack_id").collect()
        docs_in = sorted(
            ((r.doc_id, r.n_tokens) for r in rows),
            key=lambda x: (-x[1], x[0]),
        )
        packs: list[int] = []
        assign: dict[int, int] = {}
        for doc_id, n in docs_in:
            for i, used in enumerate(packs):
                if used + n <= 256:
                    packs[i] = used + n
                    assign[doc_id] = i
                    break
            else:
                packs.append(n)
                assign[doc_id] = len(packs) - 1
        got = {r.doc_id: r.pack_id for r in rows}
        base = min(got.values())
        mismatches = [
            d for d in assign if got[d] - base != assign[d]
        ]
        assert not mismatches, (
            f"FFD replay mismatch on shard {shard_id}: "
            f"{mismatches[:5]}"
        )
        n_packs = per_pack.count()
        assert rows, f"sample shard {shard_id} empty"
        line = (
            f"seq_pack_ffd: OK rows={n_rows} packs={n_packs} "
            f"{dt:.1f}s shard-replay-exact"
        )
        report.append(line)
        print(line)
    except AssertionError as ex:
        failures.append(str(ex))
        print(f"seq_pack_ffd: FAIL {ex}")
    packed.unpersist()

    print("---")
    for line in report:
        print("REPORT", line)
    if failures:
        sys.exit(f"{len(failures)} failures")
    print("spot-gate sf100 selection/packing: all green")


if __name__ == "__main__":
    main()
