

def test_lr_calibration_no_global_sort(spark, sf_oracle_dir):
    """Deciling is GLOBAL-order semantics, but the plan must not
    contain a global sort (no RangePartitioning) — the bucket
    decomposition serves it. Sanity: 10 deciles covering every doc,
    mean_score non-increasing with decile, and the top decile's
    positive rate at least the bottom's (the ranking ranks)."""
    from conversadocs_spark.plans import QUERIES

    df = QUERIES["lr_calibration_deciles"](spark, sf_oracle_dir)
    rows = sorted(df.collect(), key=lambda r: r.decile)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange rangepartitioning" not in plan, (
        "global sort crept in — the bucket decomposition is gone"
    )
    assert [r.decile for r in rows] == list(range(1, 11))
    assert sum(r.n_docs for r in rows) == 500
    means = [r.mean_score for r in rows]
    assert means == sorted(means, reverse=True)
    assert rows[0].pos_rate >= rows[-1].pos_rate


def test_lr_auc_closed_form_and_rederivation(spark, sf_oracle_dir):
    """AUC pinned two ways: (a) a hand-computed tie-bearing fixture
    via the same feature pipeline is NOT practical (scores derive
    from text), so instead the real corpus AUC is re-derived in pure
    python with midranks from the collected (score, label) pairs;
    (b) sanity bounds: 0 <= auc <= 1 and n_pos + n_neg == corpus."""
    from conversadocs_spark import io
    from conversadocs_spark.plans.lm import lr_auc
    from conversadocs_spark.plans.registry import QUERIES

    row = lr_auc(spark, sf_oracle_dir).collect()[0]
    n_docs = io.table(spark, sf_oracle_dir, "documents").count()
    assert row.n_pos + row.n_neg == n_docs
    assert 0.0 <= row.auc <= 1.0
    scored = {
        r.doc_id: r.lr_score
        for r in QUERIES["quality_lr_score_fixed"](
            spark, sf_oracle_dir
        ).collect()
    }
    docs = io.table(spark, sf_oracle_dir, "documents").select(
        "doc_id", "text"
    ).collect()
    pairs = []
    for d in docs:
        ws = d.text.split(" ")
        label = len(ws) >= 20 and len(set(ws)) / len(ws) >= 0.6
        pairs.append((scored[d.doc_id], label))
    pairs.sort(key=lambda p: p[0])
    # midranks over ties
    ranks, i = {}, 0
    while i < len(pairs):
        j = i
        while j < len(pairs) and pairs[j][0] == pairs[i][0]:
            j += 1
        mid = (i + 1 + j) / 2.0
        ranks[pairs[i][0]] = mid
        i = j
    n_pos = sum(1 for _, l in pairs if l)
    n_neg = len(pairs) - n_pos
    r_pos = sum(ranks[s] for s, l in pairs if l)
    auc = (r_pos - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)
    assert (row.n_pos, row.n_neg) == (n_pos, n_neg)
    assert abs(row.auc - round(auc, 6)) <= 1e-6


def test_rouge_bleu_known_values(spark):
    """eval_rouge_bleu's kernel on a hand-computed pair: candidate
    'the cat sat on the mat' vs reference 'the cat lay on the mat'.
    Unigram clipped overlap 5 of 6 (multiset min: the=2, cat=1,
    on=1, mat=1); bigram overlap 3 of 5 (the cat / on the / the
    mat); equal lengths -> BP=1, bleu2 = sqrt(5/6 * 3/5)."""
    import math

    from conversadocs_spark.plans.lm import eval_rouge_bleu

    df = spark.createDataFrame(
        [
            (0, "the cat sat on the mat"),
            (1, "the cat lay on the mat"),
        ],
        "doc_id long, text string",
    )

    import conversadocs_spark.io as cio

    orig = cio.table
    try:
        cio.table = lambda _s, _d, _t: df  # noqa: ARG005
        out = {r.pair_id: r for r in eval_rouge_bleu(spark, "x").collect()}
    finally:
        cio.table = orig
    r = out[0]
    assert r.ov1 == 5 and r.ov2 == 3
    assert r.rouge1_p == round(5 / 6, 6)
    assert r.rouge1_r == round(5 / 6, 6)
    assert r.rouge1_f == round(5 / 6, 6)
    assert r.rouge2_r == round(3 / 5, 6)
    assert r.bleu2 == round(math.sqrt((5 / 6) * (3 / 5)), 6)


def test_rouge_l_known_values(spark):
    """eval_rouge_l on the same hand pair: LCS('the cat sat on the
    mat', 'the cat lay on the mat') = 5 ('the cat ? on the mat' minus
    the mismatched verb), both lengths 6."""
    from conversadocs_spark.plans.lm import eval_rouge_l

    df = spark.createDataFrame(
        [
            (0, "the cat sat on the mat"),
            (1, "the cat lay on the mat"),
        ],
        "doc_id long, text string",
    )

    import conversadocs_spark.io as cio

    orig = cio.table
    try:
        cio.table = lambda _s, _d, _t: df  # noqa: ARG005
        out = {r.pair_id: r for r in eval_rouge_l(spark, "x").collect()}
    finally:
        cio.table = orig
    r = out[0]
    assert (r.lcs, r.n_c, r.n_r) == (5, 6, 6)
    assert r.rouge_l_p == round(5 / 6, 6)
    assert r.rouge_l_r == round(5 / 6, 6)
    assert r.rouge_l_f == round(5 / 6, 6)


def test_rouge_l_oracle_prefix_max_identity():
    """The oracle's recursive-CTE LCS uses the prefix-max identity
    (new[j] = max_{j'<=j} A_j', valid because adjacent LCS DP cells
    differ by <= 1) to remove the intra-row dependency a list
    comprehension cannot express. Property-test that identity against
    the classic two-row DP on randomized token lists, through DuckDB
    itself (the engine that will run the oracle)."""
    import random

    import duckdb

    def lcs(a, b):
        prev = [0] * (len(b) + 1)
        for x in a:
            cur = [0] * (len(b) + 1)
            for j, y in enumerate(b, 1):
                cur[j] = (
                    prev[j - 1] + 1 if x == y else max(prev[j], cur[j - 1])
                )
            prev = cur
        return prev[-1]

    rng = random.Random(7)
    vals = []
    for p in range(80):
        n, m = rng.randint(0, 12), rng.randint(0, 12)
        ct = [rng.choice("abc") for _ in range(n)] or [""]
        rt = [rng.choice("abc") for _ in range(m)] or [""]
        vals.append((p, ct, rt))
    con = duckdb.connect()
    con.execute("CREATE TABLE t (pair_id INT, ct VARCHAR[], rt VARCHAR[])")
    con.executemany("INSERT INTO t VALUES (?,?,?)", vals)
    got = [
        tuple(r)
        for r in con.execute(
            """
WITH RECURSIVE dp AS (
    SELECT pair_id, 0 AS i,
           [CAST(0 AS BIGINT) for j in range(0, len(rt) + 1)] AS row,
           ct, rt
    FROM t
  UNION ALL
    SELECT pair_id, i + 1,
           [CAST(0 AS BIGINT)] || [
               list_max([CASE WHEN ct[i + 1] = rt[jj]
                              THEN row[jj] + 1 ELSE row[jj + 1] END
                         for jj in range(1, j + 1)])
               for j in range(1, len(rt) + 1)],
           ct, rt
    FROM dp WHERE i < len(ct)
)
SELECT pair_id, row[len(rt) + 1] AS lcs
FROM dp WHERE i = len(ct) ORDER BY pair_id
"""
        ).fetchall()
    ]
    assert got == [(p, lcs(c, r)) for p, c, r in vals]
