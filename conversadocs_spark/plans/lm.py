"""Corpus language-model quality scoring (CCNet-style LM filter).

Real pretraining pipelines (CCNet, Wenzek et al. 2020; RefinedWeb)
bucket documents by the perplexity of a small LM trained on a trusted
corpus and drop the worst bucket. The reference app has no analog (it
stops at retrieval), but the brief names quality scoring first-class;
`text_quality` (plans/text.py) covers the heuristic signals and this
module covers the statistical one: a bigram language model with
add-one smoothing, trained on the corpus itself in the same plan that
scores it, entirely in Catalyst expressions.

Determinism rule for the oracle hash: cross-row SUMs of doubles are
order-dependent (Spark and DuckDB reduce in different orders), so the
per-bigram log-probability is quantized to fixed-point BIGINT
(round(ln(p) * 1e6)) BEFORE summation — integer sums are exact and
associative on both engines, so the per-document average is
bit-stable no matter the partitioning. The only remaining float step
is the final division, rounded to 6 decimals per the repo convention
(FIXTURES.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from conversadocs_spark import io
from conversadocs_spark.plans.registry import register

_LM_BIGRAM_ORACLE = """
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
grams AS (
    SELECT doc_id,
           unnest(list_transform(range(1, len(t)),
                                 i -> t[i] || ' ' || t[i+1])) AS gram
    FROM toks
),
model AS (
    SELECT string_split(gram, ' ')[1] AS w1, gram, count(*) AS c
    FROM grams GROUP BY 1, 2
),
ctx AS (
    SELECT w1, CAST(sum(c) AS BIGINT) AS c1 FROM model GROUP BY w1
),
v AS (
    SELECT count(DISTINCT tok) AS v
    FROM (SELECT unnest(t) AS tok FROM toks)
),
lp AS (
    SELECT m.gram,
           CAST(round(ln((m.c + 1.0) / (x.c1 + v.v)) * 1000000, 0)
                AS BIGINT) AS lpf
    FROM model m JOIN ctx x USING (w1), v
)
SELECT g.doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       round(CAST(sum(lp.lpf) AS DOUBLE)
             / (count(*) * 1000000.0), 6) AS avg_logprob
FROM grams g JOIN lp ON g.gram = lp.gram
GROUP BY g.doc_id
"""


@register("lm_bigram_score", oracle=_LM_BIGRAM_ORACLE, tags=("pipeline",))
def lm_bigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean bigram log-probability under an add-one-
    smoothed bigram LM trained on the corpus: p(w2|w1) =
    (c(w1,w2)+1) / (c(w1,·)+V). Low scores flag keyword-stuffed /
    unnatural text — the CCNet perplexity-bucket signal without the
    external KenLM dependency. Documents with fewer than two tokens
    have no bigrams and drop out (both engines agree).

    Scale shape: the model is two stacked hash aggregates over one
    gram explode (map-side combine collapses repeats before the
    shuffle); model size is observed-bigram-bounded, vastly smaller
    than the corpus gram stream it scores. Scoring is one shuffle
    join on the gram key — hot grams (stopword pairs) are exactly the
    AQE skew-join case, and the model side can be broadcast outright
    when the trusted training corpus is fixed and small (the CCNet
    deployment shape: train once on Wikipedia, broadcast, score
    100 TB). Fixed-point BIGINT log-probs make the aggregation
    order-insensitive, so the result is identical under any
    partitioning — the property that makes the filter retry-safe on
    preemptible executors.
    """
    d = io.table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("t"))
    # The gram relation feeds BOTH the model build (two stacked aggs)
    # and the scoring join; without materialization Catalyst
    # re-derives the explode from the parquet scan for every branch
    # (measured 17 documents scans for the composed filter stack).
    # Persist it once — the same cache-the-shared-pass move as
    # dedup_minhash's hashed-shingle table (operators/dedup.py), with
    # the same documented no-natural-unpersist-point caveat (LRU
    # eviction bounds it; at real scale this is the relation you'd
    # checkpoint to parquet between pipeline stages anyway).
    grams = doc_bigrams(toks).persist()
    return lm_scores(toks, grams)


def doc_bigrams(toks: DataFrame) -> DataFrame:
    """(doc_id, gram) exploded 2-gram relation from (doc_id, t)."""
    from conversadocs_spark.functions.text import bigram_array

    return toks.select(
        "doc_id", F.explode(bigram_array(F.col("t"))).alias("gram")
    )


def lm_scores(toks: DataFrame, grams: DataFrame) -> DataFrame:
    """Model-train-and-score over a (persisted) gram relation —
    exposed separately so quality_filter_stack shares ONE gram explode
    between the LM and repetition branches."""
    model = grams.groupBy(
        F.split("gram", " ").getItem(0).alias("w1"), "gram"
    ).agg(F.count("*").alias("c"))
    ctx = model.groupBy("w1").agg(F.sum("c").cast("bigint").alias("c1"))
    vocab = (
        toks.select(F.explode("t").alias("tok"))
        .agg(F.count_distinct("tok").alias("v"))
    )
    lp = (
        model.join(ctx, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "gram",
            F.round(
                F.log((F.col("c") + F.lit(1.0)) / (F.col("c1") + F.col("v")))
                * F.lit(1000000.0),
                0,
            )
            .cast("bigint")
            .alias("lpf"),
        )
    )
    return (
        grams.join(lp, "gram")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.round(
                F.sum("lpf").cast("double")
                / (F.count("*") * F.lit(1000000.0)),
                6,
            ).alias("avg_logprob"),
        )
    )


# --------------------------------------------------------------------------
# composed quality-filter stack (FineWeb-style keep/drop decision)
# --------------------------------------------------------------------------

def _quality_stack_oracle() -> str:
    from conversadocs_spark.plans.text import (
        _GOPHER_ORACLE,
        _QUALITY_ORACLE,
    )

    return f"""
WITH q AS ({_QUALITY_ORACLE}),
g AS ({_GOPHER_ORACLE}),
l AS ({_LM_BIGRAM_ORACLE}),
cut AS (
    SELECT round(quantile_cont(avg_logprob, 0.1), 6) AS lm_cut FROM l
)
SELECT q.doc_id,
       q.quality_score,
       g.dup_gram_frac,
       l.avg_logprob,
       (q.quality_score >= 0.7
        AND g.dup_gram_frac <= 0.1
        AND l.avg_logprob >= cut.lm_cut) AS keep
FROM q
JOIN g ON g.doc_id = q.doc_id
JOIN l ON l.doc_id = q.doc_id, cut
"""


@register(
    "quality_filter_stack",
    oracle=_quality_stack_oracle(),
    tags=("pipeline",),
)
def quality_filter_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FineWeb-style composed filter stack: heuristic quality
    (`text_quality` >= 0.7), Gopher repetition (`gopher_repetition`
    dup_gram_frac <= 0.1), and the statistical LM signal
    (`lm_bigram_score` above the corpus 10th percentile — a
    corpus-RELATIVE cutoff, the CCNet bucketing move, computed with
    the same quantile_cont-identical interpolation as
    `agg_percentile`; like that query, the exact percentile buffers
    the group's values, so at true corpus scale the one-line swap is
    `percentile_approx` — kept exact here because the cutoff is what
    makes the whole stack hash-checkable). The keep decision is the
    conjunction; the
    three signal columns ride along so downstream can re-threshold
    without recompute.

    Built BY COMPOSITION: the Spark side joins the three registered
    operators on doc_id, and the oracle nests their oracle SQL as
    CTEs — so this query re-verifies that the pieces compose exactly,
    not just individually. Plan shape: three corpus-linear branches
    over one documents scan, two doc_id hash joins (co-partitioned —
    one exchange each at worst), and a broadcast 1-row percentile
    cutoff; docs with <2 tokens carry no signals and drop via the
    inner joins on both engines."""
    from conversadocs_spark.plans.text import (
        gopher_signals,
        text_quality,
    )

    # ONE gram explode feeds both the repetition and LM branches (the
    # two heaviest signals); quality rides its own single scan.
    d = io.table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("t"))
    grams = doc_bigrams(toks).persist()
    q = text_quality(spark, sf_dir).select("doc_id", "quality_score")
    g = gopher_signals(grams).select("doc_id", "dup_gram_frac")
    # The LM score feeds both the output and the percentile cutoff;
    # persist so the model-train-and-score pipeline runs once, not
    # twice (same caveat as the gram cache in lm_bigram_score).
    lm = (
        lm_scores(toks, grams)
        .select("doc_id", "avg_logprob")
        .persist()
    )
    cut = lm.agg(
        F.round(F.percentile("avg_logprob", F.lit(0.1)), 6).alias(
            "lm_cut"
        )
    )
    return (
        q.join(g, "doc_id")
        .join(lm, "doc_id")
        .crossJoin(F.broadcast(cut))
        .select(
            "doc_id",
            "quality_score",
            "dup_gram_frac",
            "avg_logprob",
            (
                (F.col("quality_score") >= 0.7)
                & (F.col("dup_gram_frac") <= 0.1)
                & (F.col("avg_logprob") >= F.col("lm_cut"))
            ).alias("keep"),
        )
    )
