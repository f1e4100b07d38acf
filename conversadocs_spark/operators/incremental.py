"""Incremental MinHash dedup: dedupe a new batch against an existing
corpus WITHOUT re-processing the corpus.

The 100 TB shape: a crawl pipeline receives daily increments; full-
corpus re-dedup per increment is O(|corpus|) per day and dominates
everything else. Instead the corpus's MinHash state — the hashed-
shingle table and the banded-signature table (exactly the relations
the batch path computes in operators/dedup.py) — is persisted once as
a parquet "dedup index", and each increment:

1. shingles/signs/bands only the NEW docs (O(|batch|)),
2. finds new-vs-old candidates with one equi-join of the new banded
   rows against the stored banded table on (band, band_hash) — a
   shuffle of the BATCH side; the corpus side is a plain pruned scan
   of slim (id, band, band_hash) rows, never re-parsed text,
3. finds new-vs-new candidates with the same in-bucket combination
   explode as the batch path (bucket_pairs),
4. exact-re-checks surviving candidates against the stored hashed
   shingles (id-keyed joins — output-sized),
5. appends the new docs' state to the index so the next increment
   sees them (append-mode parquet; compaction via
   sources/sink.py:compact_table when small files accrete).

Output pairs are identical to running the batch operator on
corpus ∪ batch and keeping the pairs that touch the batch — pinned by
tests/test_dedup.py::test_incremental_equals_full_restricted.

The reference re-embeds and REBUILDS its whole store on every upload
(/root/reference/conversadocs/bones.py:107-119); this module is the
incremental posture that replaces that at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from conversadocs_spark.operators.dedup import (
    bucket_pairs,
    hashed_shingles,
    jaccard,
    minhash_banded,
    minhash_signatures,
)

SHINGLES_SUBDIR = "shingles"
BANDS_SUBDIR = "bands"

#: hash-family / layout version of the on-disk index (ADVICE r15): the
#: persisted hs and band_hash values are xxhash64 over token-array
#: slices / bigint slices (the r15 family). An index written under a
#: DIFFERENT family (e.g. the pre-r15 concat_ws-string family) yields
#: zero cross-family band matches and empty hs intersections — pairs
#: silently vanish instead of erroring — so the family is stamped into
#: the index and verified on every append and query. Bump this string
#: whenever hashed_shingles / minhash_banded change hash families.
INDEX_FORMAT = "xxhash64-arrayslice-v2"
_FORMAT_FILE = "_index_format.json"


def _write_format_stamp(path: str, params: dict) -> None:
    import json
    import os

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, _FORMAT_FILE), "w") as f:
        json.dump({"format": INDEX_FORMAT, **params}, f)


def _check_format_stamp(path: str, params: dict) -> None:
    """Fail LOUDLY when the on-disk index was written under another
    hash family or banding parameterization (either silently produces
    an empty/partial pair set, never an error)."""
    import json
    import os

    expected = {"format": INDEX_FORMAT, **params}
    try:
        with open(os.path.join(path, _FORMAT_FILE)) as f:
            found = json.load(f)
    except OSError:
        raise ValueError(
            f"minhash index at {path!r} has no {_FORMAT_FILE} stamp: "
            "it predates the hash-family versioning (or is not an "
            "index). Rebuild it with minhash_index_build(mode="
            "'overwrite') — querying/appending across hash families "
            "silently drops near-dup pairs."
        ) from None
    if found != expected:
        raise ValueError(
            f"minhash index at {path!r} was written as {found}, but "
            f"this code expects {expected}. Rebuild the index with "
            "minhash_index_build(mode='overwrite') — mixing families "
            "or banding parameters silently drops near-dup pairs."
        )


def minhash_index_build(
    df: DataFrame,
    path: str,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "overwrite",
) -> None:
    """Materialize the corpus's MinHash state under ``path``:
    ``shingles/`` = (id, hs) and ``bands/`` = (id, band, band_hash).
    ``mode="append"`` is the increment-absorb step (5. above).

    The hashed-shingle pipeline runs ONCE: hs persists in memory for
    the two writes, then unpersists — the index on disk is the
    long-lived artifact, not the cache."""
    params = {"n": n, "num_hashes": num_hashes, "bands": bands}
    if mode == "append":
        # absorbing into a foreign-family index silently yields zero
        # cross-family matches on later increments — refuse instead.
        _check_format_stamp(path, params)
    hs = hashed_shingles(df, text_col, id_col, n).persist()
    try:
        hs.write.mode(mode).parquet(f"{path}/{SHINGLES_SUBDIR}")
        banded = minhash_banded(
            minhash_signatures(hs, num_hashes), bands, num_hashes // bands
        )
        banded.write.mode(mode).parquet(f"{path}/{BANDS_SUBDIR}")
    finally:
        hs.unpersist()
    if mode != "append":
        _write_format_stamp(path, params)


def minhash_incremental_pairs(
    spark: SparkSession,
    new_docs: DataFrame,
    index_path: str,
    threshold: float = 0.5,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs (id1, id2, jaccard_sim) touching ``new_docs``,
    against the index at ``index_path`` plus the batch itself.
    id1 < id2 canonical ordering, exact-Jaccard re-checked — the same
    output contract as the batch operator restricted to the batch.

    The batch's state is persisted in-memory for the several
    consumers (banding, two re-check branches); an absorb into the
    on-disk index is a separate, explicit ``minhash_index_build(...,
    mode="append")`` so a failed increment never half-commits."""
    _check_format_stamp(
        index_path, {"n": n, "num_hashes": num_hashes, "bands": bands}
    )
    new_hs = hashed_shingles(new_docs, text_col, id_col, n).persist()
    new_banded = minhash_banded(
        minhash_signatures(new_hs, num_hashes), bands, num_hashes // bands
    )
    old_hs = spark.read.parquet(f"{index_path}/{SHINGLES_SUBDIR}")
    old_banded = spark.read.parquet(f"{index_path}/{BANDS_SUBDIR}")

    # new-vs-old: equi-join on the band key with the BATCH side
    # broadcast — increments are small by definition (16 slim rows
    # per doc), so the corpus-side band table streams through the
    # join without any shuffle; at 100 TB that is the difference
    # between a per-increment corpus shuffle and a pruned scan.
    # (Pinned: tests/test_plans.py asserts no Exchange on the stored
    # band table's side.)
    nv_old = (
        F.broadcast(
            new_banded.select(
                "band", "band_hash", F.col("id").alias("nid")
            )
        )
        .join(
            old_banded.select(
                "band", "band_hash", F.col("id").alias("oid")
            ),
            ["band", "band_hash"],
        )
        # a doc present in BOTH the index and the batch would pair
        # with itself in every band
        .where(F.col("nid") != F.col("oid"))
        .select(
            F.least("nid", "oid").alias("id1"),
            F.greatest("nid", "oid").alias("id2"),
        )
    )
    # new-vs-new: in-bucket combination explode, one groupBy shuffle
    nv_new = bucket_pairs(
        new_banded, ["band", "band_hash"], F.struct(F.col("id"))
    ).select(
        F.col("p1.id").alias("id1"), F.col("p2.id").alias("id2")
    )
    cand = nv_old.unionByName(nv_new).dropDuplicates(["id1", "id2"])

    # exact re-check: shingle sets come from the index for old ids
    # and the in-memory batch state for new ids. Batch ids may also
    # exist in the index (re-delivery); prefer the fresh rows.
    all_hs = new_hs.unionByName(
        old_hs.join(
            new_hs.select("id"), "id", "left_anti"
        )
    )
    checked = (
        cand.join(
            all_hs.select(
                F.col("id").alias("id1"), F.col("hs").alias("sh1")
            ),
            "id1",
        )
        .join(
            all_hs.select(
                F.col("id").alias("id2"), F.col("hs").alias("sh2")
            ),
            "id2",
        )
        .select(
            "id1",
            "id2",
            F.round(jaccard(F.col("sh1"), F.col("sh2")), 6).alias(
                "jaccard_sim"
            ),
        )
        .where(F.col("jaccard_sim") >= threshold)
    )
    return checked
