

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
