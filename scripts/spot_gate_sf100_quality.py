#!/usr/bin/env python
"""sf100 spot-gate for the TEXT-QUALITY / CURATION SCREENS (VERDICT
r12 #6): quality_filter_stack, contamination_bloom,
contamination_ngram, phrase_search at ~1000x bench scale (5M docs).

Serving and dedup are already measured at this scale
(spot_gate_sf100.py, spot_gate_sf100_dedup.py); this gate covers the
remaining curation family, whose 100 TB claim is the BROADCAST
ASYMMETRY: the small side of every screen (the eval suite's grams /
bloom bits, the 1-row percentile cutoff, the 1-row phrase) is
broadcast, and the 5M-doc training side is never shuffled BY THE
SCREEN — its only exchanges are the screen's own aggregation keys
(doc_id / gram), identical in kind to what the sf0.1 plan runs.

Asserted per query on the EXECUTED plan (AQE final):
  - at least one BroadcastExchange (the eval/cutoff/phrase side);
  - every hash exchange is keyed on an allowed aggregation/join key
    set for that query — nothing corpus-wide outside those keys;
  - quality_filter_stack may run doc_id SortMergeJoins (three
    corpus-linear signal branches joined on doc_id IS its plan);
    the scan-shaped screens must have none.

Value invariants at scale:
  - contamination_bloom: NO false negatives vs the exact shared-gram
    count, re-derived independently for a 200-doc sample; frac
    in [0, 1].
  - quality_filter_stack: keep == conjunction of its three recorded
    signal columns, re-checked on a 200-row sample vs the cutoff
    re-derived from the returned avg_logprob column itself.
  - phrase_search: every sampled hit doc's text actually contains
    the phrase, n_occurrences >= 1.

Usage: python scripts/spot_gate_sf100_quality.py
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

#: query -> (allowed hashpartitioning key substrings, SMJ allowed?)
PLAN_SPECS: dict[str, tuple[tuple[str, ...], bool]] = {
    # two doc_id joins of three corpus-linear branches + gram aggs:
    # doc_id exchanges (and SMJ on them) ARE the plan; gram/bigram
    # aggregation keys feed the repetition + LM branches
    "quality_filter_stack": (
        ("doc_id", "gram", "w1", "w2", "bigram", "term", "tok"),
        True,
    ),
    # probe-side re-aggregation keys only; the bloom is broadcast
    "contamination_bloom": (("doc_id", "gram", "r,", "pos"), False),
    # exact sibling: eval grams broadcast, train side aggregates on
    # (doc_id, gram) then doc_id
    "contamination_ngram": (("doc_id", "gram"), False),
    # trigram count shuffle then a 1-row broadcast phrase
    "phrase_search": (("gram",), False),
}


def final_plan(df) -> str:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def assert_plan(
    name: str, fin: str, allowed: tuple[str, ...], smj_ok: bool
) -> str:
    assert "BroadcastExchange" in fin, (
        f"{name}: no broadcast at sf100 — the small side degraded "
        "to a shuffle"
    )
    n_ex = 0
    for line in fin.splitlines():
        if "Exchange hashpartitioning" not in line:
            continue
        n_ex += 1
        if not any(key in line for key in allowed):
            raise AssertionError(
                f"{name}: exchange outside the screen's key set at "
                f"sf100: {line.strip()}"
            )
    if not smj_ok:
        assert "SortMergeJoin" not in fin, f"{name}: SMJ at sf100"
        assert "ShuffledHashJoin" not in fin, f"{name}: SHJ at sf100"
    return f"broadcast+{n_ex}ex"


def main() -> None:
    from pyspark.sql import functions as F

    from conversadocs_spark import io
    from conversadocs_spark.plans import QUERIES
    from conversadocs_spark.session import get_spark

    spark = get_spark(app_name="spot-gate-sf100-quality")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(f"{DST}/documents.parquet"):
        sys.exit("run scripts/spot_gate_sf100.py --rebuild first")
    n_docs = io.table(spark, DST, "documents").count()
    print(f"sf100 documents: {n_docs}")

    failures: list[str] = []
    report: list[str] = []

    def gate(name: str, check_values) -> None:
        allowed, smj_ok = PLAN_SPECS[name]
        t0 = time.time()
        df = QUERIES[name](spark, DST)
        n = df.count()
        dt = time.time() - t0
        try:
            shape = assert_plan(name, final_plan(df), allowed, smj_ok)
            note = check_values(df)
            line = (
                f"{name}: OK rows={n} {dt:.1f}s {shape} {note}"
            )
            report.append(line)
            print(line)
        except AssertionError as ex:
            failures.append(str(ex))
            print(f"{name}: FAIL {ex}")

    # ---- quality_filter_stack ------------------------------------
    def check_stack(df) -> str:
        sample = df.limit(200).collect()
        cut = (
            df.agg(
                F.round(
                    F.percentile("avg_logprob", F.lit(0.1)), 6
                ).alias("c")
            ).first()["c"]
        )
        for r in sample:
            want = (
                r.quality_score >= 0.7
                and r.dup_gram_frac <= 0.1
                and r.avg_logprob >= cut
            )
            assert r.keep == want, (
                f"quality_filter_stack: keep != conjunction for "
                f"doc {r.doc_id} at sf100"
            )
        kept = df.where("keep").count()
        assert 0 < kept, "quality_filter_stack: zero keeps at sf100"
        return f"kept={kept}"

    gate("quality_filter_stack", check_stack)

    # ---- contamination_bloom -------------------------------------
    def check_bloom(df) -> str:
        from conversadocs_spark.plans.pipeline import (
            _CONTAM_N,
            shingle_docs,
        )

        d = io.table(spark, DST, "documents")
        g = shingle_docs(d, "text", "doc_id", _CONTAM_N)
        ev_grams = (
            g.where(F.col("id") < 20)
            .select(F.explode_outer("shingles").alias("gram"))
            .distinct()
        )
        sample_ids = [
            r.doc_id for r in df.where("n_flagged > 0").limit(100).collect()
        ] + [r.doc_id for r in df.where("n_flagged = 0").limit(100).collect()]
        exact = {
            r.doc_id: r.n_shared
            for r in (
                g.where(F.col("id").isin(sample_ids))
                .select(
                    F.col("id").alias("doc_id"),
                    F.explode_outer("shingles").alias("gram"),
                )
                .join(ev_grams, "gram", "left_semi")
                .groupBy("doc_id")
                .agg(F.count("*").alias("n_shared"))
                .collect()
            )
        }
        got = {
            r.doc_id: (r.n_flagged, r.flagged_frac)
            for r in df.where(F.col("doc_id").isin(sample_ids)).collect()
        }
        for doc, (flagged, frac) in got.items():
            assert flagged >= exact.get(doc, 0), (
                f"contamination_bloom: FALSE NEGATIVE at sf100 — doc "
                f"{doc} flagged {flagged} < shared {exact.get(doc, 0)}"
            )
            assert 0.0 <= frac <= 1.0, (
                f"contamination_bloom: frac {frac} out of range"
            )
        return f"sampled={len(got)} no-false-negatives"

    gate("contamination_bloom", check_bloom)

    # ---- contamination_ngram -------------------------------------
    def check_ngram(df) -> str:
        n_hit = df.where("n_shared > 0").count()
        bad = df.where(
            "n_shared < 0 OR contamination < 0 OR contamination > 1"
        ).count()
        assert bad == 0, "contamination_ngram: out-of-range rows"
        return f"hits={n_hit}"

    gate("contamination_ngram", check_ngram)

    # ---- phrase_search -------------------------------------------
    def check_phrase(df) -> str:
        rows = df.limit(50).collect()
        assert rows, "phrase_search: zero hits at sf100"
        phrase = rows[0].phrase
        ids = [r.doc_id for r in rows]
        docs = {
            r.doc_id: r.text
            for r in io.table(spark, DST, "documents")
            .where(F.col("doc_id").isin(ids))
            .select("doc_id", "text")
            .collect()
        }
        for r in rows:
            assert r.n_occurrences >= 1
            assert phrase in docs[r.doc_id], (
                f"phrase_search: doc {r.doc_id} lacks the phrase"
            )
        n = df.count()
        return f"phrase={phrase!r} docs={n}"

    gate("phrase_search", check_phrase)

    print("---")
    for line in report:
        print("REPORT", line)
    if failures:
        sys.exit(f"{len(failures)} failures")
    print("spot-gate sf100 quality screens: all green")


if __name__ == "__main__":
    main()
