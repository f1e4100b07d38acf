"""Dedup operator tests: MinHash LSH vs brute-force exact Jaccard,
SimHash near-dup signal, exact-dedup idempotence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conversadocs_spark import io
from conversadocs_spark.operators.dedup import (
    dedup_exact,
    dedup_ngram_pairs,
    hamming64,
    minhash_near_dups,
    simhash64,
    simhash_near_dups,
)

THRESHOLD = 0.5


def test_minhash_matches_exact_jaccard(spark, sf_dir):
    """At threshold 0.5 (fixture near-dups sit at jaccard >= 0.9) the
    LSH pipeline must find exactly the brute-force pair set — recall 1
    after the exact re-check, precision 1 by construction."""
    docs = io.table(spark, sf_dir, "documents")
    exact = {
        (r.id1, r.id2)
        for r in dedup_ngram_pairs(docs, threshold=THRESHOLD).collect()
    }
    approx = {
        (r.id1, r.id2)
        for r in minhash_near_dups(docs, threshold=THRESHOLD).collect()
    }
    assert exact, "fixture should contain planted near-duplicates"
    assert approx == exact


def test_hashed_shingles_agree_with_string_shingles(spark):
    """r15: hashed_shingles hashes the n-token ARRAY SLICE directly
    instead of concat_ws'ing a string per shingle. Tokens are
    whitespace-split (never contain spaces), so the " "-join was
    injective and slice-hashing must preserve the dedup structure
    exactly: per-doc hs set size == distinct STRING shingle count
    (shingle_docs path), equal texts get equal hs sets, and the
    short-doc (< n tokens) fallback still yields one shingle."""
    from conversadocs_spark.operators.dedup import (
        hashed_shingles,
        shingle_docs,
    )

    rows = [
        (0, "a b c d e"),
        (1, "a b c d e"),          # exact dup of 0
        (2, "a b c a b c a b c"),  # repeated shingles collapse
        (3, "x y"),                # shorter than n=3 -> 1 shingle
        (4, "  a b c d e  "),      # padding whitespace -> empty tokens
        (5, "q"),                  # single token
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    hs = {
        r["id"]: sorted(r["hs"])
        for r in hashed_shingles(docs, "text", "doc_id", 3).collect()
    }
    str_sizes = {
        r["id"]: len(set(r["shingles"]))
        for r in shingle_docs(docs, "text", "doc_id", 3).collect()
    }
    assert {i: len(v) for i, v in hs.items()} == str_sizes
    assert hs[0] == hs[1]          # identical text -> identical hs set
    assert hs[0] != hs[4]          # empty tokens shift every slice
    assert len(hs[2]) == 3 and len(hs[3]) == 1 and len(hs[5]) == 1


def test_hashed_shingles_never_empty_and_unguarded(spark):
    """r16: hashed_shingles used to carry a defensive
    ``where(size(hs) > 0)``; Catalyst pushed it below the projection
    and re-evaluated the whole shingle-hash expression once more per
    input row in EVERY consumer (measured 2x on the minhash cache
    build and 7x on contamination_ngram's hashed-gram rewrite). The
    guard was a provable no-op — the CASE always yields >= 1 element,
    even for null/empty text (xxhash64 of a null array returns the
    seed, not null) — so it was removed. Pin both halves: every input
    row survives with a non-empty hs, and no Filter re-evaluating the
    hash expression appears in the optimized plan."""
    from conversadocs_spark.operators.dedup import hashed_shingles

    rows = [
        (0, None),             # null text
        (1, ""),               # empty text
        (2, "   "),            # whitespace only
        (3, "one two"),        # shorter than n
        (4, "a b c d e f"),    # normal
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    hs = hashed_shingles(docs, "text", "doc_id", 3)
    out = {r["id"]: r["hs"] for r in hs.collect()}
    assert set(out) == {0, 1, 2, 3, 4}      # no row dropped
    assert all(len(v) >= 1 for v in out.values())
    plan = hs._jdf.queryExecution().optimizedPlan().toString()
    assert "Filter" not in plan, (
        "a guard filter re-appeared above/below the shingle "
        "projection — it duplicates the hash expression per row:\n"
        + plan
    )


def test_minhash_deterministic_across_partitionings(spark, sf_dir):
    docs = io.table(spark, sf_dir, "documents")
    one = {
        tuple(r)
        for r in minhash_near_dups(
            docs.repartition(1), threshold=THRESHOLD
        ).collect()
    }
    many = {
        tuple(r)
        for r in minhash_near_dups(
            docs.repartition(16), threshold=THRESHOLD
        ).collect()
    }
    assert one == many


def test_dedup_exact_idempotent(spark, sf_dir):
    docs = io.table(spark, sf_dir, "documents").select("doc_id", "text")
    doubled = docs.unionByName(
        docs.select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
    )
    once = dedup_exact(doubled)
    assert once.count() == docs.count()  # every copy removed
    twice = dedup_exact(once.select("doc_id", "text"))
    assert twice.count() == once.count()  # stable under re-application
    # survivor is always the lowest id -> original rows win
    assert once.where(F.col("doc_id") >= 10_000_000).count() == 0


def test_minhash_collapse_on_duplicated_corpus(spark, sf_dir):
    """Triple every doc (two extra exact copies with offset ids) and
    the LSH pipeline must still equal brute force: intra-group pairs
    at jaccard 1.0, cross-group pairs carrying the representative
    similarity — the identical-content collapse path end to end."""
    docs = io.table(spark, sf_dir, "documents").select("doc_id", "text")
    tripled = docs
    for off in (1_000_000, 2_000_000):
        tripled = tripled.unionByName(
            docs.select(
                (F.col("doc_id") + off).alias("doc_id"), "text"
            )
        )
    exact = {
        (r.id1, r.id2, r.jaccard_sim)
        for r in dedup_ngram_pairs(tripled, threshold=THRESHOLD).collect()
    }
    approx = {
        (r.id1, r.id2, r.jaccard_sim)
        for r in minhash_near_dups(tripled, threshold=THRESHOLD).collect()
    }
    assert approx == exact
    # non-vacuous: every doc has 2 extra copies -> >= C(3,2) = 3
    # intra pairs per original doc
    assert len(approx) >= 3 * docs.count()


def test_fixture_pairs_avoid_lsh_recall_gap(spark, sf_dir):
    """dedup_minhash / dedup_clusters hash-match their brute-force
    oracles only while LSH candidate recall is ~1 over the oracle's
    inclusion range. With 16 bands x 4 rows, recall at J=0.5 is ~0.64
    and approaches 1 above J~0.85 — so the oracle parity quietly
    depends on the fixtures containing NO pairs in the [0.5, 0.85)
    recall gap (ADVICE r5 item 2). The driver regenerates fixtures
    every round: assert the invariant explicitly so a regenerated
    corpus with marginal-similarity pairs fails HERE with a clear
    message instead of as an opaque oracle mismatch."""
    docs = io.table(spark, sf_dir, "documents")
    gap = (
        dedup_ngram_pairs(docs, threshold=0.5)
        .where(F.col("jaccard_sim") < 0.85)
        .count()
    )
    assert gap == 0, (
        f"{gap} fixture pair(s) fall in the LSH recall gap "
        "[0.5, 0.85): raise dedup_minhash's band count or threshold, "
        "or the oracle comparison will miss pairs nondeterministically"
    )


def test_simhash_separates_near_dups(spark, sf_dir):
    """Near-dup pairs (exact jaccard >= 0.5) must have strictly smaller
    mean SimHash hamming distance than random pairs."""
    docs = io.table(spark, sf_dir, "documents")
    sigs = docs.select(
        "doc_id", simhash64(F.col("text")).alias("sig")
    ).cache()
    pairs = dedup_ngram_pairs(docs, threshold=THRESHOLD).select(
        "id1", "id2"
    )
    a = sigs.select(
        F.col("doc_id").alias("id1"), F.col("sig").alias("sig1")
    )
    b = sigs.select(
        F.col("doc_id").alias("id2"), F.col("sig").alias("sig2")
    )
    near = (
        pairs.join(a, "id1")
        .join(b, "id2")
        .agg(F.avg(hamming64(F.col("sig1"), F.col("sig2"))))
        .first()[0]
    )
    rand = (
        sigs.alias("x")
        .crossJoin(sigs.alias("y"))
        .where(F.col("x.doc_id") + 137 == F.col("y.doc_id"))
        .agg(
            F.avg(hamming64(F.col("x.sig"), F.col("y.sig")))
        )
        .first()[0]
    )
    sigs.unpersist()
    assert near is not None and rand is not None
    assert near < rand / 2, f"simhash near={near:.1f} rand={rand:.1f}"


@pytest.mark.parametrize(
    ("max_hamming", "bands"),
    [
        (3, 4),  # scaling default: 16-bit band values, radius 3
        (7, 8),  # legacy wide-radius config: 8-bit band values
    ],
)
def test_simhash_banded_equals_bruteforce(spark, sf_dir, max_hamming, bands):
    """The banded simhash join must equal the brute-force all-pairs
    hamming join at the same radius (banding is exact for
    max_hamming <= bands-1 by pigeonhole, not a recall tradeoff) —
    pinned for both the 4x16-bit scaling default and the legacy 8x8-bit
    wide-radius configuration."""
    docs = io.table(spark, sf_dir, "documents").select("doc_id", "text")
    sigs = docs.select(
        "doc_id", simhash64(F.col("text")).alias("sig")
    ).cache()
    a = sigs.alias("a")
    b = sigs.alias("b")
    brute = {
        (r.id1, r.id2, r.hamming)
        for r in (
            a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("id1"),
                F.col("b.doc_id").alias("id2"),
                hamming64(F.col("a.sig"), F.col("b.sig")).alias("hamming"),
            )
            .where(F.col("hamming") <= max_hamming)
            .collect()
        )
    }
    banded = {
        (r.id1, r.id2, r.hamming)
        for r in simhash_near_dups(
            docs, max_hamming=max_hamming, bands=bands
        ).collect()
    }
    sigs.unpersist()
    assert banded == brute


def test_simhash_default_bands_are_16_bit(spark, sf_dir):
    """The default banding must stay 4x16-bit (radius 3): 8-bit band
    values have 256 states, so candidate pairs grow O(n^2/256) —
    quadratic at corpus scale (r5 verdict 'What's wrong' #1). Pin the
    default parameters so a refactor can't silently reintroduce it."""
    import inspect

    sig = inspect.signature(simhash_near_dups)
    assert sig.parameters["bands"].default == 4
    assert sig.parameters["max_hamming"].default == 3


def test_incremental_equals_full_restricted(spark, tmp_path):
    """Incremental dedup of a batch against the corpus index must
    emit exactly the full-corpus pair set restricted to pairs
    touching the batch — same ids, same jaccard values."""
    from conversadocs_spark import io
    from conversadocs_spark.operators.dedup import minhash_near_dups
    from conversadocs_spark.operators.incremental import (
        minhash_incremental_pairs,
        minhash_index_build,
    )

    d = io.table(spark, "/root/testdata/sf0.01", "documents").select(
        "doc_id", "text"
    )
    corpus = d.where(F.col("doc_id") < 400)
    batch = d.where(F.col("doc_id") >= 400)
    idx = str(tmp_path / "idx")
    minhash_index_build(corpus, idx)
    got = {
        (r["id1"], r["id2"], r["jaccard_sim"])
        for r in minhash_incremental_pairs(spark, batch, idx).collect()
    }
    full = {
        (r["id1"], r["id2"], round(r["jaccard_sim"], 6))
        for r in minhash_near_dups(d).collect()
        if r["id2"] >= 400  # canonical id1<id2: touching-batch pairs
    }
    assert got == full and len(got) > 0


def test_incremental_absorb_sees_prior_batches(spark, tmp_path):
    """After absorbing batch1 into the index (append mode), batch2's
    pairs include its matches against batch1 docs — the day-over-day
    lifecycle."""
    from conversadocs_spark import io
    from conversadocs_spark.operators.incremental import (
        minhash_incremental_pairs,
        minhash_index_build,
    )

    d = io.table(spark, "/root/testdata/sf0.01", "documents").select(
        "doc_id", "text"
    )
    corpus = d.where(F.col("doc_id") < 300)
    b1 = d.where((F.col("doc_id") >= 300) & (F.col("doc_id") < 400))
    b2 = d.where(F.col("doc_id") >= 400)
    idx = str(tmp_path / "idx2")
    minhash_index_build(corpus, idx)
    minhash_index_build(b1, idx, mode="append")  # absorb day 1
    got = {
        (r["id1"], r["id2"])
        for r in minhash_incremental_pairs(spark, b2, idx).collect()
    }
    # every pair touches b2; counterpart may be corpus OR b1
    assert all(i2 >= 400 for _, i2 in got)
    against_b1 = {
        (i1, i2) for i1, i2 in got if 300 <= i1 < 400
    }
    assert against_b1, "no pairs against the absorbed batch — vacuous"


def test_incremental_index_format_stamp(spark, tmp_path):
    """The on-disk index is stamped with its hash family + banding
    parameters (ADVICE r15): querying or appending across families
    silently yields zero matches instead of erroring, so a missing or
    mismatched stamp must raise loudly."""
    import json
    import os

    import pytest as _pytest

    from conversadocs_spark import io
    from conversadocs_spark.operators.incremental import (
        _FORMAT_FILE,
        minhash_incremental_pairs,
        minhash_index_build,
    )

    d = io.table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    corpus = d.where(F.col("doc_id") < 100)
    batch = d.where(F.col("doc_id") >= 480)
    idx = str(tmp_path / "idx_stamp")
    minhash_index_build(corpus, idx)
    stamp_path = os.path.join(idx, _FORMAT_FILE)
    with open(stamp_path) as f:
        stamp = json.load(f)
    # happy path: stamped index accepts append and query
    minhash_index_build(batch, idx, mode="append")
    minhash_incremental_pairs(spark, batch, idx)
    # parameter mismatch: different banding must refuse
    with _pytest.raises(ValueError, match="Rebuild"):
        minhash_incremental_pairs(spark, batch, idx, bands=8)
    with _pytest.raises(ValueError, match="Rebuild"):
        minhash_index_build(batch, idx, mode="append", bands=8)
    # foreign family: pre-versioning / other-family stamp must refuse
    with open(stamp_path, "w") as f:
        json.dump({**stamp, "format": "xxhash64-concatws-v1"}, f)
    with _pytest.raises(ValueError, match="Rebuild"):
        minhash_incremental_pairs(spark, batch, idx)
    # missing stamp (pre-change index): refuse with the rebuild hint
    os.remove(stamp_path)
    with _pytest.raises(ValueError, match="rebuild|Rebuild"):
        minhash_incremental_pairs(spark, batch, idx)


def test_incremental_index_survives_compaction(spark, tmp_path):
    """Lifecycle glue: absorb a batch into the index (append-mode
    small files), compact both index tables, and get byte-identical
    incremental results afterward — compaction must be invisible to
    the operator."""
    from conversadocs_spark import io
    from conversadocs_spark.operators.incremental import (
        minhash_incremental_pairs,
        minhash_index_build,
    )
    from conversadocs_spark.sources.sink import compact_table

    d = io.table(spark, "/root/testdata/sf0.01", "documents").select(
        "doc_id", "text"
    )
    idx = str(tmp_path / "idx")
    minhash_index_build(d.where(F.col("doc_id") < 300), idx)
    minhash_index_build(
        d.where((F.col("doc_id") >= 300) & (F.col("doc_id") < 400)),
        idx,
        mode="append",
    )
    batch = d.where(F.col("doc_id") >= 400)
    before = sorted(
        map(tuple, minhash_incremental_pairs(spark, batch, idx).collect())
    )
    for sub in ("shingles", "bands"):
        n = compact_table(spark, f"{idx}/{sub}", target_file_bytes=10**9)
        assert n == 1  # tiny tables collapse to one file each
    after = sorted(
        map(tuple, minhash_incremental_pairs(spark, batch, idx).collect())
    )
    assert after == before and len(after) > 0


def test_fixture_has_no_pairs_in_lsh_recall_gap():
    """ADVICE r5: dedup_minhash/dedup_clusters oracles include every
    pair with J >= 0.5, but 16x4 banding only has ~64% candidate
    recall AT J = 0.5 — parity relies on fixture near-dup pairs
    sitting at J >= ~0.85 where banding recall is ~1. Fixtures
    regenerate every round, so ASSERT the invariant instead of
    assuming it: the brute-force Jaccard distribution (the oracle's
    own shingle definition) must contain NO pair in [0.5, 0.85)."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.01/documents.parquet'"
    )
    gap = con.execute(
        """
        WITH sh AS (
            SELECT doc_id,
                   list_distinct(
                     CASE WHEN len(string_split(text, ' ')) >= 3
                          THEN [array_to_string(
                                  string_split(text, ' ')[i:i+2], ' ')
                                for i in range(
                                  1, len(string_split(text, ' ')) - 1)]
                          ELSE [text]
                     END) AS shingles
            FROM documents
        )
        SELECT count(*) FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
              / len(list_distinct(list_concat(a.shingles, b.shingles)))
              BETWEEN 0.5 AND 0.8499999
        """
    ).fetchone()[0]
    assert gap == 0, (
        f"{gap} fixture pairs sit in the LSH recall gap [0.5, 0.85): "
        "either regenerate fixtures or raise bands so banding recall "
        "covers the oracle threshold"
    )


def _boilerplate_corpus(spark):
    """Deterministic planted-pathology corpus: every doc shares a long
    boilerplate prefix (so band minhashes mostly come from the shared
    shingle core and thousands of DISTINCT docs collide into one mega
    band bucket), plus a small unique tail (so pairwise jaccard stays
    BELOW the 0.85 dedup threshold — candidates that all fail the
    re-check, the worst case for candidate-count blowup). 30 planted
    TRUE near-dup pairs (tails differing by one word, jaccard ~0.9+)
    ride on top as the recall invariant."""
    boiler = " ".join(f"boiler{k:03d}" for k in range(120))
    rows = []
    for i in range(500):
        tail = " ".join(f"uniq{i:04d}x{j}" for j in range(12))
        rows.append((i, f"{boiler} {tail}"))
    true_pairs = []
    for p in range(30):
        a, b = 10000 + 2 * p, 10001 + 2 * p
        tail = [f"pair{p:03d}x{j}" for j in range(12)]
        rows.append((a, boiler + " " + " ".join(tail)))
        tail2 = list(tail)
        tail2[-1] = f"pair{p:03d}variant"
        rows.append((b, boiler + " " + " ".join(tail2)))
        true_pairs.append((a, b))
    return (
        spark.createDataFrame(rows, ["doc_id", "text"]),
        true_pairs,
    )


def test_hot_bucket_cap_bounds_candidates_and_keeps_recall(spark):
    """r7 (VERDICT r6 #3): a ubiquitous-boilerplate mega-bucket must
    not turn candidate generation quadratic — the salted hot-bucket
    split bounds candidates at ~n*hot_cap per bucket — while the
    banded structure keeps recall on TRUE near-dup pairs >= the 0.8
    audit gate (here: all 30 planted pairs expected)."""
    from conversadocs_spark.operators.dedup import (
        bucket_pairs,
        hashed_shingles,
        minhash_banded,
        minhash_rep_near_dups,
        minhash_signatures,
    )

    docs, true_pairs = _boilerplate_corpus(spark)
    n_docs = docs.count()
    bands, rows_per_band, cap = 16, 4, 48

    banded = minhash_banded(
        minhash_signatures(hashed_shingles(docs), 64),
        bands,
        rows_per_band,
    ).localCheckpoint()
    payload = F.struct(F.col("id"))
    uncapped = bucket_pairs(
        banded, ["band", "band_hash"], payload, hot_cap=None
    ).count()
    capped = bucket_pairs(
        banded, ["band", "band_hash"], payload, hot_cap=cap
    ).count()
    # the pathology is real (quadratic without the cap) and the cap
    # bites hard: candidates drop by >3x and respect the linear bound
    assert uncapped > n_docs * 100
    assert capped < uncapped / 3
    assert capped <= bands * n_docs * cap

    # recall invariant: the full capped pipeline still finds the
    # planted true pairs (audit gate is 0.8; this fixture finds all)
    found = {
        (r["rid1"], r["rid2"])
        for r in minhash_rep_near_dups(
            docs, threshold=0.85, hot_cap=cap
        )[0].collect()
    }
    hits = sum(1 for p in true_pairs if p in found)
    assert hits / len(true_pairs) >= 0.8
    # and no below-threshold boilerplate pair leaks through re-check
    assert all(a >= 10000 and b >= 10000 for a, b in found)


def test_ppjoin_equals_brute_force(spark, sf_oracle_dir):
    """Prefix filtering must be EXACT: the PPJoin result equals the
    all-pairs Jaccard join at the same threshold, pair for pair,
    value for value (recall 1 by theorem, precision 1 by verify)."""
    from conversadocs_spark import io
    from conversadocs_spark.operators.dedup import (
        dedup_ngram_pairs,
        ppjoin_prefix_pairs,
    )

    d = io.table(spark, sf_oracle_dir, "documents").where(
        F.col("doc_id") < 300
    )
    got = {
        (r.id1, r.id2, r.jaccard_sim)
        for r in ppjoin_prefix_pairs(d, threshold=0.5, n=3).collect()
    }
    want = {
        (r.id1, r.id2, r.jaccard_sim)
        for r in dedup_ngram_pairs(d, threshold=0.5, n=3).collect()
    }
    assert got == want
    assert got, "fixtures must contain >= 1 qualifying pair"


def test_ppjoin_prunes_candidates(spark, sf_oracle_dir):
    """The point of the prefix filter: candidate pairs (sharing a
    rare prefix token) must be far fewer than all pairs — pin a 10x
    reduction on the fixtures — and the candidate join must reach
    Catalyst as a token-key equi-join, never a nested loop."""
    from conversadocs_spark import io
    from conversadocs_spark.operators.dedup import shingle_docs

    d = io.table(spark, sf_oracle_dir, "documents").where(
        F.col("doc_id") < 300
    )
    threshold = 0.5
    sh = shingle_docs(d, "text", "doc_id", 3)
    tok = sh.select("id", F.explode("shingles").alias("s"))
    freq = tok.groupBy("s").agg(F.count("*").alias("df_s"))
    ordered = (
        tok.join(freq, "s")
        .groupBy("id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("df_s", "s"))),
                lambda x: x.getField("s"),
            ).alias("ordered")
        )
    )
    prefix_len = (
        F.size("ordered")
        - F.ceil(F.lit(threshold) * F.size("ordered"))
        + 1
    ).cast("int")
    ptok = ordered.select(
        "id", F.explode(F.slice("ordered", 1, prefix_len)).alias("s")
    )
    cands = (
        ptok.alias("a")
        .join(
            ptok.alias("b"),
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .distinct()
    )
    n_docs = d.count()
    n_cands = cands.count()
    assert n_cands * 10 < n_docs * (n_docs - 1) / 2, (
        n_cands,
        n_docs,
    )
    plan = cands._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan, plan


def test_ppjoin_edge_corpora_equal_brute_force(spark):
    """Prefix-filter exactness on crafted edge cases, merged into ONE
    corpus with block-disjoint vocabularies (cross-block Jaccard is 0,
    so blocks can't interact): identical documents (J=1), documents
    shorter than the shingle width (the 1-element fallback array),
    all-ties frequency order, a pair exactly AT the threshold, and a
    disjoint block (0 pairs). Must match brute force pair-for-pair."""
    from conversadocs_spark.operators.dedup import (
        dedup_ngram_pairs,
        ppjoin_prefix_pairs,
    )

    docs = [
        # identical (J=1)
        (0, "i1 i2 i3 i4 i5 i6"), (1, "i1 i2 i3 i4 i5 i6"),
        (2, "i1 i2 i3 i4 i5 i6"),
        # shorter than shingle width (1-element fallback)
        (10, "hi"), (11, "hi"), (12, "yo"), (13, "s1 s2"),
        # all-ties frequency order
        (20, "p q r s"), (21, "q r s t"), (22, "r s t u"),
        (23, "x y z w"),
        # exactly at threshold: 3-gram sets of size 3 sharing 2 -> 0.5
        (30, "a b c d e"), (31, "a b c d f"),
        # disjoint
        (40, "d1 d2 d3 d4"), (41, "e1 e2 e3 e4"),
    ]
    d = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r.id1, r.id2, r.jaccard_sim)
        for r in ppjoin_prefix_pairs(d, threshold=0.5, n=3).collect()
    }
    want = {
        (r.id1, r.id2, r.jaccard_sim)
        for r in dedup_ngram_pairs(d, threshold=0.5, n=3).collect()
    }
    assert got == want, (got, want)
    assert {(0, 1), (0, 2), (1, 2)} <= {(a, b) for a, b, _ in got}
    assert (30, 31, 0.5) in got


def test_simhash_md5_twin_layout_and_banding(spark, sf_dir):
    """simhash64_md5 (the DuckDB-replayable signature behind
    dedup_simhash_exact) must (a) produce the documented packed
    layout — hi word == md5 hex chars 1-8 vote signs, lo word ==
    chars 9-16 — verified against a pure-Python replay on a few
    docs, and (b) keep the banded join == brute force exactness
    under the swapped sig_expr."""
    import hashlib

    from conversadocs_spark.operators.dedup import (
        hamming64,
        simhash64_md5,
        simhash_near_dups,
    )

    docs = io.table(spark, sf_dir, "documents").select("doc_id", "text")
    rows = docs.orderBy("doc_id").limit(5).collect()
    sigs = {
        r.doc_id: r.sig
        for r in docs.select(
            "doc_id", simhash64_md5(F.col("text")).alias("sig")
        )
        .orderBy("doc_id")
        .limit(5)
        .collect()
    }
    for r in rows:
        toks = list(dict.fromkeys(r.text.split()))
        votes_hi = [0] * 32
        votes_lo = [0] * 32
        for t in toks:
            h = hashlib.md5(t.encode()).hexdigest()
            hhi, hlo = int(h[:8], 16), int(h[8:16], 16)
            for b in range(32):
                votes_hi[b] += 1 if (hhi >> b) & 1 else -1
                votes_lo[b] += 1 if (hlo >> b) & 1 else -1
        hi = sum(1 << b for b in range(32) if votes_hi[b] > 0)
        lo = sum(1 << b for b in range(32) if votes_lo[b] > 0)
        want = (hi << 32) | lo
        if want >= 1 << 63:
            want -= 1 << 64  # signed long wrap, as Spark packs it
        assert sigs[r.doc_id] == want, f"doc {r.doc_id}"
    # note: Spark's \s+ split and python .split() agree on these docs
    # (single-space fixture text); the cross-engine tokenizer parity
    # itself is what the DuckDB oracle checks at every gate scale.

    sub = docs.where(F.col("doc_id") < 100)
    sigs_df = sub.select(
        "doc_id", simhash64_md5(F.col("text")).alias("sig")
    ).cache()
    a, b = sigs_df.alias("a"), sigs_df.alias("b")
    brute = {
        (r.id1, r.id2, r.hamming)
        for r in (
            a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("id1"),
                F.col("b.doc_id").alias("id2"),
                hamming64(
                    F.col("a.sig"), F.col("b.sig")
                ).alias("hamming"),
            )
            .where(F.col("hamming") <= 3)
            .collect()
        )
    }
    banded = {
        (r.id1, r.id2, r.hamming)
        for r in simhash_near_dups(
            sub, max_hamming=3, bands=4, sig_expr=simhash64_md5
        ).collect()
    }
    assert banded == brute
    sigs_df.unpersist()


def test_minhash_md5_twin_finds_all_constructed_neardups(spark, sf_dir):
    """Semantic check on the oracle-replayable MinHash twin (beyond
    the cross-engine identity the driver gate proves): on the doubled
    fixture every (d, d+1e6) mutated pair sits at Jaccard k/(k+3)
    (appending one token adds <=3 shingles, removes none), so with 16
    bands of 4 rows the miss probability per pair is (1-J^4)^16 ~ 0 —
    ALL constructed pairs must survive banding AND the re-check, and
    every reported pair must genuinely clear the threshold (verified
    against an independent exact-Jaccard join over the same md5
    shingle hashes)."""
    from pyspark.sql import functions as F

    from conversadocs_spark import io
    from conversadocs_spark.operators.dedup import (
        jaccard,
        minhash_near_dups_md5,
        shingle_docs,
    )

    d = (
        io.table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 60)
        .select("doc_id", "text")
    )
    doubled = d.unionByName(
        d.select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zq")).alias("text"),
        )
    )
    got = {
        (r.id1, r.id2): r.jaccard_sim
        for r in minhash_near_dups_md5(doubled, threshold=0.5).collect()
    }
    n_docs = d.count()
    mutated = {
        (r.doc_id, r.doc_id + 1000000) for r in d.select("doc_id").collect()
    }
    assert mutated <= set(got), (
        f"banding missed {len(mutated - set(got))} of {n_docs} "
        "constructed near-dup pairs"
    )
    # no false positives vs an independent exact-Jaccard join over
    # the same hashed shingle sets
    sh = shingle_docs(doubled, "text", "doc_id", 3)
    hs = sh.select(
        "id",
        F.array_distinct(
            F.transform(
                "shingles",
                lambda s: F.conv(
                    F.substring(F.md5(s.cast("binary")), 1, 15), 16, 10
                ).cast("long"),
            )
        ).alias("hs"),
    )
    a, b = hs.alias("a"), hs.alias("b")
    brute = {
        (r.id1, r.id2): r.j
        for r in (
            a.join(b, F.col("a.id") < F.col("b.id"))
            .select(
                F.col("a.id").alias("id1"),
                F.col("b.id").alias("id2"),
                F.round(
                    jaccard(F.col("a.hs"), F.col("b.hs")), 6
                ).alias("j"),
            )
            .where(F.col("j") >= 0.5)
            .collect()
        )
    }
    assert set(got) <= set(brute)  # every reported pair is real
    assert all(got[k] == brute[k] for k in got)  # with the true sim
