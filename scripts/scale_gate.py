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
QUADRATIC_ORACLES = {
    "dedup_minhash", "dedup_clusters", "dedup_incremental",
    # not quadratic, but DuckDB's planner takes ~390 s on the
    # compound-predicate self-join at 6M baskets (Spark side: 9 s);
    # the sf0.01 driver check still runs the full hash compare
    "basket_lift",
}

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


# --------------------------------------------------------------------------
# Value-asserting invariant checks for the quadratic-oracle queries
# (VERDICT r9 #6): their scale runs must assert VALUES, not just
# completion. Two mechanisms, both engine-portable at any SF:
#   - full-output structural invariants as Spark aggregates (canonical
#     ordering, thresholds, label fixed points) — zero driver
#     materialization beyond one localCheckpoint of the bounded output;
#   - bounded-subset exact re-derivation: a deterministic md5-ordered
#     sample of output rows is recomputed INDEPENDENTLY (pure-Python
#     Jaccard from the raw texts; DuckDB count aggregates restricted
#     to the sampled part ids) and compared value-for-value. This
#     checks reported values without the quadratic full oracle;
#     completeness stays covered by the banding-miss model + recall
#     audits (hot_bucket_cap, simhash_candidates) and the full hash
#     compare the sf0.01 driver gate still runs.
# --------------------------------------------------------------------------


def _exact_jaccard_py(text_a: str, text_b: str, n: int = 3):
    """Independent re-derivation of operators/dedup.py's word-shingle
    Jaccard: regex \\s+ split, distinct n-gram strings (whole doc as
    one shingle when shorter than n), set intersection over union."""
    import re

    def sh(t):
        toks = re.split(r"\s+", t)
        if len(toks) >= n:
            return {
                " ".join(toks[i : i + n])
                for i in range(len(toks) - n + 1)
            }
        return {" ".join(toks)}

    a, b = sh(text_a), sh(text_b)
    u = a | b
    return (len(a & b) / len(u)) if u else None


def check_dedup_pairs_values(
    spark, con, sdf, min_id2: int | None = None, sample_k: int = 200
):
    """(id1, id2, jaccard_sim) pair outputs (dedup_minhash,
    dedup_incremental): full-output shape invariants (canonical
    id1<id2, jaccard within [threshold, 1], batch-side floor for the
    incremental form) + exact Python re-derivation of jaccard_sim for
    a deterministic sample of pairs from the raw texts."""
    from pyspark.sql import functions as F

    out = sdf.localCheckpoint(eager=True)
    n = out.count()
    shape_pred = (
        (F.col("id1") >= F.col("id2"))
        | F.col("jaccard_sim").isNull()
        | (F.col("jaccard_sim") < 0.5)
        | (F.col("jaccard_sim") > 1.0)
    )
    if min_id2 is not None:
        shape_pred = shape_pred | (F.col("id2") < F.lit(min_id2))
    shape_viol = out.where(shape_pred).count()
    sample = (
        out.orderBy(F.md5(F.concat_ws(",", "id1", "id2")))
        .limit(sample_k)
        .collect()
    )
    ids = sorted({r.id1 for r in sample} | {r.id2 for r in sample})
    texts = {}
    if ids:
        texts = dict(
            con.execute(
                "SELECT doc_id, text FROM documents WHERE doc_id IN ("
                + ",".join(str(int(i)) for i in ids)
                + ")"
            ).fetchall()
        )
    bad_vals = 0
    for r in sample:
        j = _exact_jaccard_py(texts.get(r.id1), texts.get(r.id2)) if (
            r.id1 in texts and r.id2 in texts
        ) else None
        # Spark rounds HALF_UP to 6 dp: |rounded - true| <= 5e-7
        if j is None or abs(j - r.jaccard_sim) > 6e-7:
            bad_vals += 1
    ok = n > 0 and shape_viol == 0 and bad_vals == 0
    note = (
        f"rows={n} shape_violations={shape_viol} "
        f"jaccard_rederived_mismatches={bad_vals}/{len(sample)}"
    )
    return ok, note


def check_clusters_fixed_point(spark, con, sdf, **_):
    """(doc_id, cluster_id, is_survivor): the label-sum fixed point —
    every cluster_id IS the min doc_id of its member set (min-label
    propagation converged), every cluster has >= 2 members and exactly
    one survivor (the min), and no doc carries two labels. All as
    engine aggregates over the full output."""
    from pyspark.sql import functions as F

    out = sdf.localCheckpoint(eager=True)
    n = out.count()
    agg = out.groupBy("cluster_id").agg(
        F.min("doc_id").alias("mn"),
        F.count("*").alias("sz"),
        F.sum(F.col("is_survivor").cast("long")).alias("surv"),
    )
    viol = agg.where(
        (F.col("mn") != F.col("cluster_id"))
        | (F.col("sz") < 2)
        | (F.col("surv") != 1)
    ).count()
    dup = (
        out.groupBy("doc_id")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") > 1)
        .count()
    )
    ok = n > 0 and viol == 0 and dup == 0
    note = (
        f"rows={n} fixed_point_violations={viol} double_labels={dup}"
    )
    return ok, note


def check_basket_lift_values(spark, con, sdf, sample_k: int = 200, **_):
    """(part_a, part_b, pair_n, lift): full-output invariants
    (canonical part_a<part_b, support floor pair_n>=3) + exact DuckDB
    re-derivation of pair_n AND lift for a deterministic sample —
    restricted to the sampled part ids, so the verify join is bounded
    however large lineitem grows."""
    from pyspark.sql import functions as F

    out = sdf.localCheckpoint(eager=True)
    n = out.count()
    viol = out.where(
        (F.col("part_a") >= F.col("part_b")) | (F.col("pair_n") < 3)
    ).count()
    sample = (
        out.orderBy(F.md5(F.concat_ws(",", "part_a", "part_b")))
        .limit(sample_k)
        .collect()
    )
    bad_vals = 0
    if sample:
        plist = ",".join(
            str(int(p))
            for p in sorted(
                {r.part_a for r in sample} | {r.part_b for r in sample}
            )
        )
        part_counts = dict(
            con.execute(
                "SELECT l_partkey, count(DISTINCT l_orderkey) "
                f"FROM lineitem WHERE l_partkey IN ({plist}) "
                "GROUP BY l_partkey"
            ).fetchall()
        )
        n_orders = con.execute(
            "SELECT count(DISTINCT l_orderkey) FROM lineitem"
        ).fetchone()[0]
        pair_counts = {
            (a, b): c
            for a, b, c in con.execute(
                "WITH bk AS (SELECT DISTINCT l_orderkey, l_partkey "
                f"FROM lineitem WHERE l_partkey IN ({plist})) "
                "SELECT a.l_partkey, b.l_partkey, count(*) FROM bk a "
                "JOIN bk b ON a.l_orderkey = b.l_orderkey "
                "AND a.l_partkey < b.l_partkey GROUP BY 1, 2"
            ).fetchall()
        }
        for r in sample:
            exp_n = pair_counts.get((r.part_a, r.part_b), 0)
            na = part_counts.get(r.part_a, 0)
            nb = part_counts.get(r.part_b, 0)
            exp_lift = (
                exp_n * n_orders / (na * nb) if na and nb else None
            )
            if (
                exp_n != r.pair_n
                or exp_lift is None
                or abs(exp_lift - r.lift) > 6e-7
            ):
                bad_vals += 1
    ok = n > 0 and viol == 0 and bad_vals == 0
    note = (
        f"rows={n} shape_violations={viol} "
        f"lift_rederived_mismatches={bad_vals}/{len(sample)}"
    )
    return ok, note


#: name -> value-check callable(spark, con, sdf, **kw) -> (ok, note)
QUADRATIC_CHECKS = {
    "dedup_minhash": check_dedup_pairs_values,
    "dedup_incremental": (
        lambda spark, con, sdf: check_dedup_pairs_values(
            spark, con, sdf, min_id2=400
        )
    ),
    "dedup_clusters": check_clusters_fixed_point,
    "basket_lift": check_basket_lift_values,
}


def value_signals(con, sdf, oracle_sql):
    """Engine-side column checksums for outputs too big to collect:
    per column, an aggregate both engines compute over the FULL
    result without any driver materialization — sum(col) for
    integrals, sum(round(col,3)) for floats (compared with tolerance:
    summation order differs between engines), sum(length(col)) for
    strings, sum(cast bigint) for booleans. Returns (spark_sig,
    oracle_sig, ok) over every signal-able column; non-scalar columns
    (arrays, structs) are skipped. Module-level so the lint/unit
    tests can exercise the agree and diverge paths directly."""
    import math

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    s_aggs, d_exprs, kinds = [], [], []
    for f in sdf.schema.fields:
        c = f.name
        if isinstance(
            f.dataType,
            (T.ByteType, T.ShortType, T.IntegerType, T.LongType),
        ):
            s_aggs.append(F.sum(F.col(c)).alias(c))
            d_exprs.append(f'sum("{c}") AS "{c}"')
            kinds.append("int")
        elif isinstance(f.dataType, (T.FloatType, T.DoubleType)):
            # Midpoint-unambiguous integerization (ADVICE r8): Spark
            # round (BigDecimal HALF_UP) and DuckDB round (C round)
            # can disagree on the same double near .5 midpoints, and
            # float-sum compares need an order tolerance. floor(x*1e3
            # + 0.5) is the identical IEEE expression in both engines
            # and the summed BIGINTs compare exactly; residual
            # last-ulp drift in the VALUES themselves (each flip is
            # ±1 unit = 1e-3) is absorbed by a row-count-scaled
            # integer tolerance below.
            s_aggs.append(
                F.sum(
                    F.floor(
                        F.col(c).cast("double") * 1000 + F.lit(0.5)
                    )
                ).alias(c)
            )
            d_exprs.append(
                f'sum(CAST(floor(CAST("{c}" AS DOUBLE) * 1000 + 0.5)'
                f' AS BIGINT)) AS "{c}"'
            )
            kinds.append("float")
        elif isinstance(f.dataType, T.StringType):
            s_aggs.append(
                F.sum(F.length(F.col(c)).cast("long")).alias(c)
            )
            d_exprs.append(f'sum(length("{c}")) AS "{c}"')
            kinds.append("int")
        elif isinstance(f.dataType, T.BooleanType):
            s_aggs.append(F.sum(F.col(c).cast("long")).alias(c))
            d_exprs.append(f'sum(CAST("{c}" AS BIGINT)) AS "{c}"')
            kinds.append("int")
    if not s_aggs:
        return None, None, True
    s_aggs.append(F.count(F.lit(1)).alias("__n"))
    d_exprs.append('count(*) AS "__n"')
    srow = sdf.agg(*s_aggs).collect()[0]
    orow = con.execute(
        "SELECT " + ", ".join(d_exprs) + f" FROM ({oracle_sql}) _big"
    ).fetchone()
    n = max(int(srow[-1] or 0), int(orow[-1] or 0))
    # each cross-engine last-ulp flip moves a float signal by exactly
    # 1 unit (1e-3 of the raw value); allow 1 flip per million rows,
    # min 2, and never let genuine per-row drift below that through
    float_tol = max(2, math.ceil(n / 1_000_000))
    ok = int(srow[-1] or 0) == int(orow[-1] or 0)
    for i, kind in enumerate(kinds):
        sv, ov = srow[i], orow[i]
        if sv is None and ov is None:
            continue
        if sv is None or ov is None:
            ok = False
        elif kind == "float":
            ok = ok and abs(int(sv) - int(ov)) <= float_tol
        else:
            ok = ok and int(sv) == int(ov)
    return tuple(srow), tuple(orow), ok


def main() -> None:
    import duckdb

    import __spark_entry__ as entry
    from conversadocs_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    # the gate collects FULL outputs for the hash compare; at sf10
    # some legitimate results serialize past the 1g default
    os.environ.setdefault("SPARK_GRAFT_MAX_RESULT_SIZE", "8g")
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

    #: above this oracle row count the full collect-and-hash compare
    #: is no longer feasible driver-side (137M-row join_range at sf10
    #: serializes past any sane maxResultSize and the python
    #: normalization sort would dominate the sweep); degrade to a
    #: count check PLUS an engine-side per-column value signal
    #: (below) — counts alone could match while values diverge.
    big_output_cap = 20_000_000

    bad = []
    checked = 0
    for name in sorted(oracles):
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            if name in QUADRATIC_ORACLES:
                ok, note = QUADRATIC_CHECKS[name](spark, con, sdf)
                if not ok:
                    bad.append(name)
                print(
                    f"{name}: "
                    f"{'OK' if ok else 'INVARIANT FAIL'} "
                    f"(spark-only + value invariants, {note};"
                    f" {time.time() - t0:.1f}s)",
                    flush=True,
                )
                continue
            n_oracle = con.execute(
                f"SELECT count(*) FROM ({oracles[name]})"
            ).fetchone()[0]
            if n_oracle > big_output_cap:
                n_spark = sdf.count()
                ok = n_spark == n_oracle
                sig_note = ""
                if ok:
                    ssig, osig, sig_ok = value_signals(
                        con, sdf, oracles[name]
                    )
                    if ssig is None:
                        sig_note = "; no signal-able columns"
                    else:
                        ok = sig_ok
                        sig_note = (
                            "; column checksums "
                            + ("agree" if sig_ok else
                               f"DIVERGE spark={ssig} oracle={osig}")
                        )
                if not ok:
                    bad.append(name)
                checked += 1
                print(
                    f"{name}: {'OK' if ok else 'MISMATCH'} "
                    f"(count+checksum, rows={n_spark} vs "
                    f"{n_oracle} — output past the "
                    f"{big_output_cap}-row hash-compare cap"
                    f"{sig_note}; "
                    f"{time.time() - t0:.1f}s)",
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
    # Candidate-blowup audit, model-based. A fixed c*(n + output)
    # bound is wrong on correlated corpora: template-generated fixture
    # text gives signatures clustered at hamming 4-14 corpus-wide, and
    # LSH *correctly* collides a third of hamming-8 pairs in some
    # 16-bit band — measured candidates sit within ~1.2x of the exact
    # collision-model expectation. So the audit asserts two separable
    # properties instead:
    #   (A) implementation: observed per-band candidate pairs <=
    #       2 x model expectation + 3n, where the expectation is
    #       sum over distinct-signature pairs of
    #       bands * C(64-w, h)/C(64, h) (probability a width-w band
    #       avoids all h differing bits, summed by linearity). Banding
    #       raw rows instead of distinct signatures blows this by
    #       orders of magnitude (measured 341x at sf1).
    #   (B) parameterization: expected RANDOM collisions between
    #       unrelated signatures (h ~ 32), bands * C(64-w,32)/C(64,32)
    #       * C(s,2), must stay <= max(n, 1000) — sublinear spurious
    #       work. The r5 8-bit-band config fails exactly this test
    #       analytically; the 4x16-bit default passes with orders of
    #       margin.
    import math

    from conversadocs_spark.operators.dedup import simhash64

    bands_, width_ = 4, 16
    sig_rel = docs.select(simhash64(F.col("text")).alias("sig")).distinct()
    s_count = sig_rel.count()
    cands = simhash_band_candidate_count(docs, bands=bands_)
    out_pairs = simhash_near_dups(docs).count()

    rand_expect = (
        bands_
        * math.comb(64 - width_, 32)
        / math.comb(64, 32)
        * s_count
        * (s_count - 1)
        / 2
    )
    ok_param = rand_expect <= max(n_full, 1000)
    if not ok_param:
        failures.append("simhash_param_random_collisions")
    print(
        f"audit simhash_param: s={s_count} distinct sigs, expected "
        f"random (h~32) collisions {rand_expect:.1f} <= "
        f"{max(n_full, 1000)} "
        f"({'OK' if ok_param else 'QUADRATIC PARAMETERIZATION'})",
        flush=True,
    )

    if s_count <= 20000:
        probs = [
            min(
                1.0,
                bands_
                * math.comb(64 - width_, h)
                / math.comb(64, h),
            )
            for h in range(65)
        ]
        hist = (
            sig_rel.select(F.col("sig").alias("s1"))
            .crossJoin(sig_rel.select(F.col("sig").alias("s2")))
            .where(F.col("s1") < F.col("s2"))
            .select(
                F.bit_count(
                    F.col("s1").bitwiseXOR(F.col("s2"))
                ).alias("h")
            )
            .groupBy("h")
            .count()
            .collect()
        )
        pred = sum(probs[r["h"]] * r["count"] for r in hist)
        bound = 2.0 * pred + 3 * n_full
        ok = cands <= bound
        if not ok:
            failures.append("simhash_candidate_bound")
        print(
            f"audit simhash_candidates: n={n_full} "
            f"sig_candidates={cands} true_pairs={out_pairs} "
            f"model_pred={pred:.0f} bound=2*pred+3n={bound:.0f} "
            f"({'OK' if ok else 'CANDIDATE BLOWUP'})",
            flush=True,
        )
    else:
        # full pair histogram is itself quadratic in distinct sigs;
        # above the cutoff fall back to the coarse output-relative
        # bound (diverse corpora decorrelate, so it holds there)
        bound = 3 * (n_full + out_pairs)
        ok = cands <= bound
        if not ok:
            failures.append("simhash_candidate_bound")
        print(
            f"audit simhash_candidates (coarse, s>{20000}): "
            f"n={n_full} sig_candidates={cands} "
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

    for name in ("ann_topk", "ann_ivf", "ann_pq", "ann_ivfpq"):
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
    for audit in (audit_aqe_skew_join, audit_bpe_batched_jobs):
        try:
            failures += audit(spark, sf_dir)
        except Exception as e:  # noqa: BLE001 — report, don't die
            failures.append(audit.__name__)
            print(f"audit {audit.__name__}: ERR {str(e)[:120]}",
                  flush=True)
    try:
        failures += audit_hot_bucket_cap(spark)
    except Exception as e:  # noqa: BLE001
        failures.append("audit_hot_bucket_cap")
        print(f"audit audit_hot_bucket_cap: ERR {str(e)[:120]}",
              flush=True)
    return failures


def audit_aqe_skew_join(spark, sf_dir) -> list[str]:
    """r7 (VERDICT r6 #5): Catalyst's OWN skew mitigation must be
    exercised, not just enabled — a planted-skew join (90% of lineitem
    rows forced onto one key) run under tightened skew thresholds must
    show split skewed partitions in the EXECUTED adaptive plan
    (`SortMergeJoin(skew=true)` / `AQEShuffleRead ... skewed`). This
    is the AQE complement to the deterministic salted join
    (operators/skew.py join_skew_salted): salting for known-hot keys,
    AQE for the skew you only discover at runtime.

    The planted side is explicitly repartition(32)-ed before the join:
    the skew split works at shuffle-MAP-block granularity, and a
    local-mode parquet scan of the small fixture yields so few map
    tasks that the rule declines to split (measured: 3-11 scan maps ->
    no split; 32 shuffle maps -> SortMergeJoin(skew=true)). On a real
    cluster the map count is in the thousands, so the split engages
    without help — the extra shuffle here is test scaffolding, not a
    pattern for operators. The incompressible sha2 payload matters for
    the same reason: AQE reads lz4'd shuffle-block sizes, and a
    constant pad compresses below the skew threshold."""
    from pyspark.sql import functions as F

    from conversadocs_spark import io

    tightened = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            "256k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "128k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in tightened}
    try:
        for k, v in tightened.items():
            spark.conf.set(k, v)
        li = io.table(spark, sf_dir, "lineitem").select(
            F.when(F.col("l_orderkey") % 10 != 0, F.lit(1))
            .otherwise(F.col("l_orderkey"))
            .alias("k"),
            "l_quantity",
            # synthesized INCOMPRESSIBLE payload (the fixture lineitem
            # carries no comment column, and a constant pad compresses
            # below the skew threshold in the lz4'd shuffle-block
            # stats AQE reads) so the hot partition's bytes actually
            # cross it
            F.sha2(
                F.concat_ws("|", "l_orderkey", "l_linenumber"), 256
            ).alias("pad"),
        ).repartition(32)
        o = io.table(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("k"), "o_totalprice"
        )
        j = li.join(o, "k")
        # Execute THIS DataFrame's own query execution to its final
        # adaptive plan (a .count() would plan a separate execution
        # whose skew decision we couldn't inspect). The JVM-side
        # RDD count never moves rows to Python.
        n = j._jdf.queryExecution().executedPlan().execute().count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        ok = "skew=true" in plan and "isFinalPlan=true" in plan
        print(
            f"audit aqe_skew_join: rows={n} "
            f"SortMergeJoin(skew=true) {'OK' if ok else 'FAIL'}",
            flush=True,
        )
        return [] if ok else ["aqe_skew_join"]
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def audit_bpe_batched_jobs(spark, sf_dir) -> list[str]:
    """r7 (VERDICT r6 #2): BPE training must batch non-interacting
    merges so a vocab-size merge budget is NOT a vocab-size sequence
    of Spark jobs. Records merges/jobs at this scale; fails if the
    batching stops engaging (jobs >= merges).

    r9 (VERDICT r8 #4): also runs mode='auto' — the driver-side heap
    trainer over the one-job (word, freq) aggregate — and fails
    unless it (a) engages the local path at this scale, (b) produces
    the BIT-IDENTICAL merge sequence, and (c) costs exactly 1 Spark
    job. Records both wall-clocks so the gate file shows the
    job-count/wall-clock collapse."""
    import time as _time

    from conversadocs_spark import io
    from conversadocs_spark.operators.bpe import bpe_train

    docs = io.table(spark, sf_dir, "documents")
    stats: dict = {}
    t0 = _time.time()
    merges = bpe_train(docs, n_merges=40, min_pair_count=2, stats=stats)
    t_batched = _time.time() - t0
    ok = (
        len(merges) > 0
        and stats["jobs"] < stats["merges"]
    )
    ratio = stats["merges"] / max(1, stats["jobs"])
    print(
        f"audit bpe_batched_jobs: merges={stats['merges']} "
        f"jobs={stats['jobs']} merges/job={ratio:.1f} "
        f"wall={t_batched:.1f}s "
        f"{'OK' if ok else 'FAIL'}",
        flush=True,
    )
    a_stats: dict = {}
    t0 = _time.time()
    auto = bpe_train(
        docs, n_merges=40, min_pair_count=2, mode="auto",
        stats=a_stats,
    )
    t_auto = _time.time() - t0
    auto_ok = (
        auto == merges
        and a_stats.get("mode") == "local"
        and a_stats.get("jobs") == 1
    )
    print(
        f"audit bpe_local_mode: mode={a_stats.get('mode')} "
        f"jobs={a_stats.get('jobs')} identical={auto == merges} "
        f"wall={t_auto:.1f}s (vs batched {t_batched:.1f}s) "
        f"{'OK' if auto_ok else 'FAIL'}",
        flush=True,
    )
    out = [] if ok else ["bpe_batched_jobs"]
    if not auto_ok:
        out.append("bpe_local_mode")
    return out


def audit_hot_bucket_cap(spark) -> list[str]:
    """r7 (VERDICT r6 #3): a planted 10k-copy boilerplate corpus —
    every doc shares a large shingle core, so thousands of DISTINCT
    docs collide into one band bucket that identical-content collapse
    cannot touch — must keep candidate generation within the salted
    linear bound (~bands * n * hot_cap) instead of going quadratic,
    while the 50 planted TRUE near-dup pairs stay >= the 0.8 recall
    gate."""
    from pyspark.sql import functions as F

    from conversadocs_spark.operators.dedup import (
        bucket_pairs,
        hashed_shingles,
        minhash_banded,
        minhash_rep_near_dups,
        minhash_signatures,
    )

    boiler = " ".join(f"boiler{k:03d}" for k in range(120))
    rows = []
    for i in range(10_000):
        tail = " ".join(f"uniq{i:05d}x{j}" for j in range(12))
        rows.append((i, f"{boiler} {tail}"))
    true_pairs = []
    for p in range(50):
        a, b = 100000 + 2 * p, 100001 + 2 * p
        tail = [f"pair{p:03d}x{j}" for j in range(12)]
        rows.append((a, boiler + " " + " ".join(tail)))
        t2 = list(tail)
        t2[-1] = f"pair{p:03d}variant"
        rows.append((b, boiler + " " + " ".join(t2)))
        true_pairs.append((a, b))
    docs = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(32)
    n_docs = len(rows)
    bands, cap = 16, 128

    banded = minhash_banded(
        minhash_signatures(hashed_shingles(docs), 64), bands, 4
    ).localCheckpoint()
    capped = bucket_pairs(
        banded, ["band", "band_hash"], F.struct(F.col("id")), hot_cap=cap
    ).count()
    bound = bands * n_docs * cap
    found = {
        (r["rid1"], r["rid2"])
        for r in minhash_rep_near_dups(
            docs, threshold=0.85, hot_cap=cap
        )[0].collect()
    }
    recall = sum(1 for p in true_pairs if p in found) / len(true_pairs)
    leaked = [p for p in found if not (p[0] >= 100000 and p[1] >= 100000)]
    ok = capped <= bound and recall >= 0.8 and not leaked
    print(
        f"audit hot_bucket_cap: n={n_docs} candidates={capped} "
        f"linear-bound={bound} recall={recall:.2f} "
        f"leaked_below_threshold={len(leaked)} "
        f"{'OK' if ok else 'FAIL'}",
        flush=True,
    )
    return [] if ok else ["hot_bucket_cap"]


if __name__ == "__main__":
    main()
