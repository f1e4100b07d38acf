#!/usr/bin/env python
"""Run the full DuckDB oracle gate against a scaled dataset produced
by scripts/make_scale_dataset.py — the same check the driver performs
at sf0.01, at 10x (or any) scale. This is how the two scale-only bugs
in BASELINE.md's "Scaling check" section were caught (money-sum
rounding past the 2^53 double envelope; salted-join replica broadcast
OOM): the sf0.01 gate cannot see either.

Usage:
    python scripts/scale_gate.py [SF_DIR]      # default /tmp/sf1

Queries whose ORACLE is intentionally quadratic and unbounded
(dedup_minhash: brute-force all-pairs Jaccard, hours in single-threaded
DuckDB at 50k docs while the Spark side takes ~27s) are run
Spark-side-only.
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

#: oracle is brute-force-quadratic over the full table: skip the
#: DuckDB side at scale, still execute + count the Spark side
QUADRATIC_ORACLES = {"dedup_minhash", "dedup_clusters"}

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    import duckdb

    import __spark_entry__ as entry
    from conversadocs_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    spark = get_spark(app_name="scale-gate")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        glob = "/*.parquet" if os.path.isdir(path) else ""
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{path}{glob}'"
        )

    qs, oracles = entry.queries(), entry.oracle_sql()

    def norm(cols, rows):
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        cell = lambda v: round(v, 6) if isinstance(v, float) else v  # noqa: E731
        return [cols[i] for i in order], sorted(
            [tuple(cell(r[i]) for i in order) for r in rows], key=str
        )

    bad = []
    checked = 0
    for name in sorted(oracles):
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            if name in QUADRATIC_ORACLES:
                n = sdf.count()
                print(
                    f"{name}: spark-only rows={n}"
                    f" ({time.time() - t0:.1f}s)",
                    flush=True,
                )
                continue
            sc, sr = norm(sdf.columns, [tuple(r) for r in sdf.collect()])
            cur = con.execute(oracles[name])
            oc, orr = norm(
                [d[0] for d in cur.description], cur.fetchall()
            )
            ok = sc == oc and sr == orr
            if not ok:
                bad.append(name)
            checked += 1
            print(
                f"{name}: {'OK' if ok else 'MISMATCH'}"
                f" ({time.time() - t0:.1f}s)",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001 — gate must report, not die
            bad.append(name)
            print(f"{name}: ERR {str(e)[:120]}", flush=True)
    audit_bad = run_scale_audits(spark, qs, sf_dir)
    print("oracle-checked:", checked)
    print("MISMATCHES:", bad if bad else "none")
    print("AUDIT FAILURES:", audit_bad if audit_bad else "none")
    sys.exit(1 if bad or audit_bad else 0)


def run_scale_audits(spark, qs, sf_dir) -> list[str]:
    """Scale-behavior audits beyond oracle parity (r5 verdict items 1
    and 6): simhash banded candidate count must grow ~linearly in
    corpus size under the 4x16-bit default, and the ANN queries must
    keep recall >= 0.8 at scale (their in-plan audit empties the
    output below the floor, so a row-count check observes recall)."""
    from pyspark.sql import functions as F

    from conversadocs_spark import io
    from conversadocs_spark.operators.dedup import (
        simhash_band_candidate_count,
    )

    failures = []

    from conversadocs_spark.operators.dedup import simhash_near_dups

    docs = io.table(spark, sf_dir, "documents").select("doc_id", "text")
    n_full = docs.count()
    # The operator bands DISTINCT signatures and expands sig pairs
    # back to id pairs, so its work bound is
    # O(corpus + sig candidates + true output). Duplicated-text scale
    # fixtures make the OUTPUT itself quadratic in the copy count
    # (every copy pairs with every other), so "candidates linear in n"
    # is not even achievable for a pair-output contract — the honest
    # scale assertion is candidates <= c * (n + output).
    cands = simhash_band_candidate_count(docs, bands=4)
    out_pairs = simhash_near_dups(docs).count()
    bound = 3 * (n_full + out_pairs)
    ok = cands <= bound
    if not ok:
        failures.append("simhash_candidate_bound")
    print(
        f"audit simhash_candidates: n={n_full} sig_candidates={cands} "
        f"true_pairs={out_pairs} bound=3*(n+out)={bound} "
        f"({'OK' if ok else 'CANDIDATE BLOWUP'})",
        flush=True,
    )
    c_raw = simhash_band_candidate_count(
        docs, bands=4, distinct_sigs=False
    )
    print(
        f"audit simhash_sig_collapse: banded-candidate pairs "
        f"{c_raw} raw vs {cands} after identical-signature collapse "
        f"({c_raw / max(cands, 1):.0f}x reduction)",
        flush=True,
    )

    for name in ("ann_topk", "ann_ivf"):
        rows = qs[name](spark, sf_dir).count()
        # 5 queries x k=3; the in-plan audit returns 0 rows when mean
        # recall@3 < 0.8, so rows==15 certifies recall at this scale.
        ok = rows == 15
        if not ok:
            failures.append(f"{name}_recall")
        print(
            f"audit {name}: rows={rows} expected=15 "
            f"(recall>=0.8 {'OK' if ok else 'FAIL'})",
            flush=True,
        )
    return failures


if __name__ == "__main__":
    main()
