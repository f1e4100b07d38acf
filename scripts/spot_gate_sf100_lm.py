#!/usr/bin/env python
"""sf100 spot-gate for the LM / EVAL family (VERDICT r14 #7):
lm_bigram_score at ~1000x bench scale (5M docs) — the eval pillar's
own direct row (it previously rode the quality gate's filter-stack
evidence, which embeds the LM branch but never measured it alone).

The 100 TB claim measured here: the add-one bigram LM is TRAINED and
APPLIED in one pass family whose only exchanges are the model's own
aggregation keys —

  - gram explode -> two stacked hash aggregates (map-side combine
    collapses repeated grams before the shuffle), model size bounded
    by observed bigrams, not corpus size;
  - the vocab scalar reaches the model as a 1-row broadcast
    (BroadcastExchange pinned);
  - scoring is one join on the gram key (SMJ/shuffle ALLOWED —
    at 5M docs the observed-bigram model legitimately outgrows the
    broadcast threshold; hot stopword grams are the documented AQE
    skew-join case) plus the final doc_id aggregation;
  - NOTHING exchanges on any key outside {doc_id, gram, w1, tok} —
    no corpus-wide reshuffle hides in the composed plan.

Value invariants at scale (independent replay, not the same plan):
  - model replay: for 25 sampled grams, lpf is re-derived from
    scratch counts (fresh explode -> filter -> count, no persist
    reuse) through the same fixed-point formula
    round(log((c+1)/(c1+V)) * 1e6);
  - doc replay: for 100 sampled docs, avg_logprob is re-derived by
    joining their fresh gram explode to the replayed lpf relation
    and recomputing round(sum/n/1e6, 6) — bit-equal required (the
    BIGINT fixed-point makes the sum order-insensitive, so replay
    equality is exact, not approximate);
  - fill: n_bigrams == token_count - 1 for every sampled doc, and
    only docs with >= 2 tokens appear.

Usage: python scripts/spot_gate_sf100_lm.py
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

ALLOWED_KEYS = ("doc_id", "gram", "w1", "tok")


def final_plan(df) -> str:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def assert_plan(fin: str) -> str:
    assert "BroadcastExchange" in fin, (
        "lm_bigram_score: the vocab scalar degraded to a shuffle"
    )
    n_ex = 0
    for line in fin.splitlines():
        if "Exchange hashpartitioning" not in line:
            continue
        n_ex += 1
        if not any(k in line for k in ALLOWED_KEYS):
            raise AssertionError(
                "lm_bigram_score: exchange outside the model's key "
                f"set at sf100: {line.strip()}"
            )
    return f"broadcast+{n_ex}ex"


def main() -> None:
    from pyspark.sql import functions as F

    from conversadocs_spark import io
    from conversadocs_spark.plans import QUERIES
    from conversadocs_spark.plans.lm import doc_bigrams
    from conversadocs_spark.session import get_spark

    spark = get_spark(app_name="spot-gate-sf100-lm")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(f"{DST}/documents.parquet"):
        sys.exit("run scripts/spot_gate_sf100.py --rebuild first")
    d = io.table(spark, DST, "documents")
    n_docs = d.count()
    print(f"sf100 documents: {n_docs}")

    t0 = time.time()
    df = QUERIES["lm_bigram_score"](spark, DST)
    n = df.count()
    dt = time.time() - t0
    print(f"lm_bigram_score: rows={n} {dt:.1f}s")
    shape = assert_plan(final_plan(df))

    # ---- fill: docs with >= 2 tokens, n_bigrams == tokens - 1 ----
    exp_docs = d.where(F.size(F.split("text", " ")) >= 2).count()
    assert n == exp_docs, (
        f"fill: {n} scored docs vs {exp_docs} docs with >=2 tokens"
    )
    sample = df.limit(100).collect()
    ids = [r.doc_id for r in sample]
    tok_n = {
        r.doc_id: r.nt
        for r in d.where(F.col("doc_id").isin(ids))
        .select("doc_id", F.size(F.split("text", " ")).alias("nt"))
        .collect()
    }
    for r in sample:
        assert r.n_bigrams == tok_n[r.doc_id] - 1, (
            f"doc {r.doc_id}: n_bigrams {r.n_bigrams} != "
            f"{tok_n[r.doc_id]} tokens - 1"
        )

    # ---- independent replay: fresh explode, no persist reuse ----
    t0 = time.time()
    toks = d.select("doc_id", F.split("text", " ").alias("t"))
    grams = doc_bigrams(toks)  # NOT persisted — a fresh derivation
    doc_grams = grams.where(F.col("doc_id").isin(ids))
    need = doc_grams.select("gram").distinct()
    model = (
        grams.join(F.broadcast(need), "gram", "left_semi")
        .groupBy(F.split("gram", " ").getItem(0).alias("w1"), "gram")
        .agg(F.count("*").alias("c"))
    )
    # c1/V must come from the FULL corpus (the model is global):
    # c1 for the sampled w1 contexts, V as the global distinct-token
    # count — both re-derived from scratch.
    w1s = model.select("w1").distinct()
    ctx = (
        grams.select(F.split("gram", " ").getItem(0).alias("w1"))
        .join(F.broadcast(w1s), "w1", "left_semi")
        .groupBy("w1")
        .agg(F.count("*").cast("bigint").alias("c1"))
    )
    vocab = toks.select(F.explode("t").alias("tok")).agg(
        F.count_distinct("tok").alias("v")
    )
    lp = (
        model.join(ctx, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "gram",
            F.round(
                F.log(
                    (F.col("c") + F.lit(1.0)) / (F.col("c1") + F.col("v"))
                )
                * F.lit(1000000.0),
                0,
            )
            .cast("bigint")
            .alias("lpf"),
        )
    )
    replay = {
        r.doc_id: (r.n_bigrams, r.avg_logprob)
        for r in doc_grams.join(lp, "gram")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.round(
                F.sum("lpf").cast("double")
                / (F.count("*") * F.lit(1000000.0)),
                6,
            ).alias("avg_logprob"),
        )
        .collect()
    }
    n_exact = 0
    for r in sample:
        rn, ra = replay[r.doc_id]
        assert (r.n_bigrams, r.avg_logprob) == (rn, ra), (
            f"doc {r.doc_id}: scored ({r.n_bigrams}, {r.avg_logprob}) "
            f"!= replay ({rn}, {ra})"
        )
        n_exact += 1
    # spot-check 25 individual gram lpf values through the formula
    lps = lp.limit(25).collect()
    import math

    cs = {
        r.gram: (r.c, r.c1)
        for r in model.join(ctx, "w1")
        .where(F.col("gram").isin([r.gram for r in lps]))
        .collect()
    }
    v = vocab.first()["v"]
    for r in lps:
        c, c1 = cs[r.gram]
        want = round(math.log((c + 1.0) / (c1 + v)) * 1e6)
        assert r.lpf == int(want), (
            f"gram {r.gram!r}: lpf {r.lpf} != formula {want}"
        )
    dt2 = time.time() - t0
    print(
        f"REPORT lm_bigram_score: OK rows={n} {dt:.1f}s {shape} "
        f"docs-replayed={n_exact}/100 bit-equal "
        f"grams-replayed={len(lps)} V={v} (replay {dt2:.1f}s)"
    )
    print("spot-gate sf100 lm/eval: all green")


if __name__ == "__main__":
    main()
