"""Retrieval-surface tests: BM25 value-level recompute, RRF fusion
arithmetic, the fuzzy-join blocking lemma (blocking == brute force on a
vocabulary with edits at every position), and gap-fill invariants."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from conversadocs_spark import io
from conversadocs_spark.plans.joins import fuzzy_pairs_dist1
from conversadocs_spark.plans.registry import QUERIES
from conversadocs_spark.plans.retrieval import _B, _K1, _QUERY_TERMS


def _bm25_reference(docs: list[tuple[int, str]]) -> dict[int, float]:
    """Independent plain-Python BM25 (same rounding policy) to pin the
    Spark plan against something that is not DuckDB."""
    toks = {i: t.lower().split(" ") for i, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {
        q: sum(1 for v in toks.values() if q in v) for q in _QUERY_TERMS
    }
    scores: dict[int, float] = {}
    for i, words in toks.items():
        s = 0.0
        for q in _QUERY_TERMS:
            tf = words.count(q)
            if tf == 0 or df[q] == 0:
                continue
            idf = math.log(1.0 + (n - df[q] + 0.5) / (df[q] + 0.5))
            w = (
                idf
                * (tf * (_K1 + 1.0))
                / (tf + _K1 * (1.0 - _B + _B * (len(words) / avgdl)))
            )
            s += round(w, 6)
        if s:
            scores[i] = round(s, 6)
    return scores


def test_bm25_matches_python_reference(spark, sf_dir):
    docs = [
        (r.doc_id, r.text)
        for r in io.table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    ]
    expected = _bm25_reference(docs)
    top = sorted(
        expected.items(), key=lambda kv: (-kv[1], kv[0])
    )[:10]
    got = [
        (r.doc_id, r.bm25)
        for r in QUERIES["bm25_topk"](spark, sf_dir).collect()
    ]
    assert got == [(i, s) for i, s in top]


def test_hybrid_rrf_arithmetic_and_exclusions(spark, sf_dir):
    rows = QUERIES["hybrid_rrf"](spark, sf_dir).collect()
    assert len(rows) == 10
    assert all(r.doc_id != 0 for r in rows)
    for r in rows:
        expect = round(
            (1.0 / (60 + r.dense_rank) if r.dense_rank else 0.0)
            + (1.0 / (60 + r.lex_rank) if r.lex_rank else 0.0),
            6,
        )
        assert r.rrf_score == expect
        assert r.dense_rank is None or 1 <= r.dense_rank <= 20
        assert r.lex_rank is None or 1 <= r.lex_rank <= 20
    # fused list is rank-ordered
    scores = [r.rrf_score for r in rows]
    assert scores == sorted(scores, reverse=True)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_fuzzy_blocking_equals_bruteforce(spark):
    """Edits at EVERY position class: first char, second char, middle,
    last char, insertion at head/tail, deletion — plus distance-2
    decoys that must NOT pair. Blocking recall must be perfect."""
    vocab = [
        "cold bolt",   # base
        "gold bolt",   # sub at pos 1
        "cald bolt",   # sub at pos 2
        "cold colt",   # sub in middle
        "cold bolx",   # sub at last
        "xcold bolt",  # insert at head
        "cold bolts",  # insert at tail
        "old bolt",    # delete at head
        "colt bolt",   # middle sub variant
        "warm gear",   # unrelated
        "corn bolt",   # distance 2 from cold bolt
    ]
    names = spark.createDataFrame([(v,) for v in vocab], ["name"])
    got = {
        (r.name_a, r.name_b, r.edit_dist)
        for r in fuzzy_pairs_dist1(names).collect()
    }
    brute = {
        (a, b, _lev(a, b))
        for a in vocab
        for b in vocab
        if a < b and _lev(a, b) <= 1
    }
    assert got == brute
    assert len(brute) >= 7  # non-vacuous: edits at every position pair up


def test_resample_gapfill_invariants(spark, sf_dir):
    out = QUERIES["resample_gapfill"](spark, sf_dir)
    rows = out.collect()
    users = {r.user_id for r in rows}
    buckets = {r.bucket for r in rows}
    # dense grid: every (user, bucket) combination exactly once
    assert len(rows) == len(users) * len(buckets)
    per_user: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r.user_id, r.bucket)):
        per_user.setdefault(r.user_id, []).append(r)
    for series in per_user.values():
        last_obs = None
        for r in series:
            if r.is_observed:
                assert r.n_events > 0
                last_obs = r.value_filled
                assert r.value_filled is not None
            else:
                assert r.n_events == 0
                # forward fill: carries the last observed value,
                # NULL before the first observation
                assert r.value_filled == last_obs
    # non-vacuous: there are real gaps and real leading nulls
    assert any(not r.is_observed for r in rows)


def test_phrase_search_python_replay(spark, sf_oracle_dir):
    """Phrase retrieval replayed in pure Python: derive the same top
    trigram (count DESC, gram ASC), then per-doc occurrence counts
    and 1-based first positions; also pin that only ONE explode-based
    aggregation exists (the phrase discovery) — the match stage is
    array ops on the scan, no second shuffle."""
    from collections import Counter

    from conversadocs_spark import io
    from conversadocs_spark.plans.retrieval import phrase_search

    docs = {
        r.doc_id: r.text
        for r in io.table(spark, sf_oracle_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }
    cnt: Counter = Counter()
    grams_by_doc = {}
    for did, text in docs.items():
        toks = text.split(" ")
        grams = (
            [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
            if len(toks) >= 3
            else []
        )
        grams_by_doc[did] = grams
        cnt.update(grams)
    best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    expect = {}
    for did, grams in grams_by_doc.items():
        n = grams.count(best)
        if n:
            expect[did] = (best, n, grams.index(best) + 1)
    df = phrase_search(spark, sf_oracle_dir)
    got = {
        r.doc_id: (r.phrase, r.n_occurrences, r.first_pos)
        for r in df.collect()
    }
    assert got == expect and len(got) > 0
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Generate explode") == 1
