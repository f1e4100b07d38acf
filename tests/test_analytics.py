"""Analytics-surface tests: funnel ordering semantics re-derived from
raw events in plain Python, and cohort-retention matrix invariants."""

from __future__ import annotations

from conversadocs_spark import io
from conversadocs_spark.plans.registry import QUERIES


def test_funnel_matches_python_rederivation(spark, sf_dir):
    events = io.table(spark, sf_dir, "events").collect()
    per_user: dict[int, list] = {}
    for e in events:
        per_user.setdefault(e.user_id, []).append(e)
    expected = {}
    for uid, evs in per_user.items():
        views = sorted(e.ts for e in evs if e.event_type == "view")
        if not views:
            continue
        t_view = views[0]
        clicks = sorted(
            e.ts
            for e in evs
            if e.event_type == "click" and e.ts > t_view
        )
        t_click = clicks[0] if clicks else None
        t_purchase = None
        if t_click is not None:
            purchases = sorted(
                e.ts
                for e in evs
                if e.event_type == "purchase" and e.ts > t_click
            )
            t_purchase = purchases[0] if purchases else None
        expected[uid] = (t_view, t_click, t_purchase, t_purchase is not None)
    got = {
        r.user_id: (r.t_view, r.t_click, r.t_purchase, r.converted)
        for r in QUERIES["funnel_conversion"](spark, sf_dir).collect()
    }
    assert got == expected
    # non-vacuous: conversions exist at this sf (drop cases are pinned
    # by the constructed-order test below)
    assert any(v[3] for v in got.values())


def test_funnel_strict_ordering_drop_cases(spark, tmp_path):
    """Constructed corpus covering each drop reason: events out of
    order, missing middle step, and users with no view at all."""
    import datetime as dt

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        # user 1: perfect order -> converted
        (1, t(1), "view"), (1, t(2), "click"), (1, t(3), "purchase"),
        # user 2: purchase+click BEFORE the first view -> view-only
        (2, t(1), "purchase"), (2, t(2), "click"), (2, t(3), "view"),
        # user 3: no click between view and purchase -> not converted
        (3, t(1), "view"), (3, t(2), "purchase"),
        # user 4: never viewed -> not in the funnel at all
        (4, t(1), "click"), (4, t(2), "purchase"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {
        r.user_id: (r.t_click, r.t_purchase, r.converted)
        for r in QUERIES["funnel_conversion"](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1] == (t(2), t(3), True)
    assert out[2] == (None, None, False)
    assert out[3] == (None, None, False)


def test_cohort_retention_invariants(spark, sf_dir):
    rows = QUERIES["cohort_retention"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.day_offset <= 14
        assert 1 <= r.n_active <= r.cohort_size
        assert r.retention == round(r.n_active / r.cohort_size, 6)
    # day-0 row exists for every cohort and has 100% retention
    # (every user is active on their own first day)
    cohorts = {r.cohort_day for r in rows}
    day0 = {r.cohort_day: r for r in rows if r.day_offset == 0}
    assert set(day0) == cohorts
    for r in day0.values():
        assert r.n_active == r.cohort_size and r.retention == 1.0
    # retention never exceeds day-0 cohort size (monotone upper bound)
    for r in rows:
        assert r.cohort_size == day0[r.cohort_day].cohort_size


def test_window_range_time_python_rederivation(spark, sf_dir):
    rows = QUERIES["window_range_time"](spark, sf_dir).collect()
    ev = [
        r
        for r in io.table(spark, sf_dir, "events").collect()
        if r.user_id < 10
    ]
    per_user: dict[int, list] = {}
    for e in ev:
        sec = (
            (e.ts.day - 1) * 86400
            + e.ts.hour * 3600
            + e.ts.minute * 60
            + e.ts.second
        )
        per_user.setdefault(e.user_id, []).append((sec, e))
    expected = {}
    for uid, items in per_user.items():
        for sec, e in items:
            in_frame = [x for s, x in items if sec - 3600 <= s <= sec]
            expected[e.event_id] = len(in_frame)
    got = {r.event_id: r.n_1h for r in rows}
    assert got == expected
    assert any(v > 1 for v in got.values())  # frames actually overlap


def test_event_transitions_is_stochastic_matrix(spark, sf_dir):
    rows = QUERIES["event_transitions"](spark, sf_dir).collect()
    assert rows
    by_prev: dict[str, list] = {}
    for r in rows:
        by_prev.setdefault(r.prev_type, []).append(r)
    for prev, rs in by_prev.items():
        total = sum(r.n for r in rs)
        for r in rs:
            assert r.p == round(r.n / total, 6)
        assert abs(sum(r.p for r in rs) - 1.0) < 1e-4
    # total transitions = sum over users of (events - 1)
    ev = io.table(spark, sf_dir, "events").collect()
    per_user_counts: dict[int, int] = {}
    for e in ev:
        per_user_counts[e.user_id] = per_user_counts.get(e.user_id, 0) + 1
    assert sum(r.n for r in rows) == sum(
        c - 1 for c in per_user_counts.values()
    )


def test_dq_audit_detects_exactly_injected_violations(spark, sf_dir):
    got = {
        r.rule: r.violations
        for r in QUERIES["dq_audit"](spark, sf_dir).collect()
    }
    docs = io.table(spark, sf_dir, "documents").collect()
    orders = io.table(spark, sf_dir, "orders").collect()
    assert got["empty_text"] == sum(1 for d in docs if d.doc_id % 97 == 0)
    assert got["fk_orphan_orders"] == sum(
        1 for o in orders if o.o_orderkey % 89 == 0
    )
    assert got["empty_text"] > 0 and got["fk_orphan_orders"] > 0
    # the fixture's real data is clean on the un-injected rules
    assert got["dup_customer_key"] == 0
    assert got["negative_quantity"] == 0


def test_sessionize_gap_semantics(spark, sf_dir):
    rows = QUERIES["sessionize"](spark, sf_dir).collect()
    per_user: dict[int, list] = {}
    for r in rows:
        per_user.setdefault(r.user_id, []).append(r)
    assert per_user
    saw_multi_session = False
    for series in per_user.values():
        series.sort(key=lambda r: (r.ts, r.event_id))
        assert series[0].session_seq == 1  # first event opens session 1
        for a, b in zip(series, series[1:]):
            gap = (b.ts - a.ts).total_seconds()
            if gap > 1800:
                assert b.session_seq == a.session_seq + 1
                saw_multi_session = True
            else:
                assert b.session_seq == a.session_seq
    assert saw_multi_session  # fixture actually contains gaps


def test_latest_per_key_matches_python(spark, sf_dir):
    orders = io.table(spark, sf_dir, "orders").collect()
    expected = {}
    for o in orders:
        k = o.o_custkey
        cand = (o.o_orderdate, o.o_orderkey, round(o.o_totalprice, 2))
        if k not in expected or cand[:2] > expected[k][:2]:
            expected[k] = cand
    got = {
        r.custkey: (r.latest_orderdate, r.latest_orderkey,
                    r.latest_totalprice)
        for r in QUERIES["latest_per_key"](spark, sf_dir).collect()
    }
    assert got == {
        k: (d, o, p) for k, (d, o, p) in expected.items()
    }


def test_unpivot_is_lossless_reshape(spark, sf_dir):
    parts = io.table(spark, sf_dir, "part").collect()
    rows = QUERIES["agg_unpivot"](spark, sf_dir).collect()
    assert len(rows) == 2 * len(parts)
    by_part: dict[int, dict] = {}
    for r in rows:
        by_part.setdefault(r.p_partkey, {})[r.attr] = r.val
    for p in parts:
        got = by_part[p.p_partkey]
        assert got["p_size"] == float(p.p_size)
        assert got["p_retailprice"] == round(p.p_retailprice, 6)


def test_anomaly_zscore_flags_known_spike(spark, sf_dir):
    rows = QUERIES["anomaly_zscore"](spark, sf_dir).collect()
    assert rows
    # moments re-derived in Python for a sample of rows
    hourly = {}
    for e in io.table(spark, sf_dir, "events").collect():
        key = (e.event_type,
               e.ts.replace(minute=0, second=0, microsecond=0))
        hourly[key] = hourly.get(key, 0) + 1
    by_type: dict[str, list] = {}
    for (t, h), n in hourly.items():
        by_type.setdefault(t, []).append((h, n))
    import math

    expected = {}
    for t, series in by_type.items():
        series.sort()
        for i, (h, n) in enumerate(series):
            base = [x for _, x in series[max(0, i - 24):i]]
            if len(base) < 12:
                continue
            mean = sum(base) / len(base)
            var = sum((x - mean) ** 2 for x in base) / (len(base) - 1)
            if var <= 0:
                continue
            expected[(t, h)] = (n - mean) / math.sqrt(var)
    got = {(r.event_type, r.win_start): r.zscore for r in rows}
    assert set(got) == set(expected)
    for k, z in got.items():
        assert abs(z - expected[k]) < 1e-4


def test_basket_lift_matches_python(spark, sf_dir):
    li = io.table(spark, sf_dir, "lineitem").collect()
    baskets = {}
    for r in li:
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    from collections import Counter

    pair_n = Counter()
    part_n = Counter()
    for items in baskets.values():
        for p in items:
            part_n[p] += 1
        s = sorted(items)
        for i in range(len(s)):
            for j in range(i + 1, len(s)):
                pair_n[(s[i], s[j])] += 1
    n_orders = len(baskets)
    expected = {
        k: (n, round(n * n_orders / (part_n[k[0]] * part_n[k[1]]), 6))
        for k, n in pair_n.items()
        if n >= 3
    }
    got = {
        (r.part_a, r.part_b): (r.pair_n, r.lift)
        for r in QUERIES["basket_lift"](spark, sf_dir).collect()
    }
    assert got == expected
    assert got  # non-vacuous


def test_outlier_mad_planted_fixture(spark, tmp_path):
    """Planted group: median 10, MAD 2 (|x-10| sorted is
    0,1,1,2,2,20,28) -> threshold |x-10| > 3*1.4826*2 = 8.8956; both
    tails flag; a zero-MAD group (constant values) is skipped
    entirely instead of dividing by zero."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from datetime import datetime

    vals = [8.0, 9.0, 10.0, 11.0, 12.0, 30.0, -20.0]
    rows = [
        (i, datetime(2024, 1, 1, 0, 0, i), i, "a", v, None)
        for i, v in enumerate(vals)
    ]
    rows += [
        (100 + i, datetime(2024, 1, 1, 1, 0, i), i, "const", 5.0, None)
        for i in range(5)
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows],
                           pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))

    from conversadocs_spark.plans import QUERIES

    got = QUERIES["outlier_mad"](spark, str(tmp_path)).collect()
    flagged = {r.event_id: r.robust_z for r in got}
    # median=10, MAD=median(|x-10|)=2 -> z = (x-10)/(1.4826*2)
    assert set(flagged) == {5, 6}, flagged
    assert abs(flagged[5] - round(20 / (1.4826 * 2), 6)) < 1e-6
    assert abs(flagged[6] - round(-30 / (1.4826 * 2), 6)) < 1e-6
    assert all(r.event_type == "a" for r in got)


def test_outlier_mad_stats_broadcast_not_corpus(spark, sf_oracle_dir):
    """Plan pin: the flagging pass joins the 5-row stats table onto
    the raw events scan as a BroadcastHashJoin — the events table is
    never hash-shuffled for the final join (only the two percentile
    aggregations shuffle, on the low-cardinality type key)."""
    from conversadocs_spark.plans import QUERIES

    df = QUERIES["outlier_mad"](spark, sf_oracle_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_pareto_frontier_equals_brute_force(spark, sf_oracle_dir):
    """The windowed O(n log n) skyline must equal a driver-side brute
    force over the full (price, size) set, and no skyline member may
    dominate another."""
    from conversadocs_spark import io
    from conversadocs_spark.plans import QUERIES

    pts = [
        (r.p_partkey, float(r.p_retailprice), r.p_size)
        for r in io.table(spark, sf_oracle_dir, "part")
        .select("p_partkey", "p_retailprice", "p_size")
        .collect()
    ]

    def dominated(r):
        return any(
            s[1] <= r[1] and s[2] >= r[2]
            and (s[1] < r[1] or s[2] > r[2])
            for s in pts
        )

    want = {p[0] for p in pts if not dominated(p)}
    rows = QUERIES["pareto_frontier"](spark, sf_oracle_dir).collect()
    got = {r.p_partkey for r in rows}
    assert got == want
    sky = [(float(r.p_retailprice), r.p_size) for r in rows]
    for a in sky:
        for b in sky:
            assert not (
                a[0] <= b[0] and a[1] >= b[1] and a != b
            ), (a, b)


def test_interval_concurrency_closed_form(spark):
    """Sweep-line invariants on a constructed stream: three
    overlapping 5-minute intervals peak at 3 exactly at the third
    start; an interval starting exactly when another ends does NOT
    overlap it (half-open semantics — the (ts, delta) tie order)."""
    import datetime as dt
    import os
    import tempfile

    from conversadocs_spark.plans.analytics import (
        interval_concurrency,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ev(i, minutes, typ):
        return (i, t0 + dt.timedelta(minutes=minutes), 1, typ,
                0.0, "{}")

    rows = [
        # type a: starts at 0, 1, 2 -> peak 3 at minute 2
        ev(0, 0, "a"), ev(1, 1, "a"), ev(2, 2, "a"),
        # type b: back-to-back (0 and exactly +5) -> peak 1 at 0
        ev(3, 0, "b"), ev(4, 5, "b"),
    ]
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            rows,
            ["event_id", "ts", "user_id", "event_type", "value",
             "props"],
        ).write.parquet(os.path.join(td, "events.parquet"))
        got = {
            r.event_type: (r.peak_concurrency, r.peak_at)
            for r in interval_concurrency(spark, td).collect()
        }
    assert got["a"] == (3, t0 + dt.timedelta(minutes=2))
    assert got["b"] == (1, t0)


def test_path_mining_closed_form(spark):
    """Journey extraction on a constructed log: user 1's four ordered
    events yield exactly two trigrams; a two-event user yields none;
    same-timestamp events order by event_id (the total-order pin)."""
    import datetime as dt
    import os
    import tempfile

    from conversadocs_spark.plans.analytics import path_mining_3step

    t0 = dt.datetime(2024, 1, 1)

    def ev(i, minutes, user, typ):
        return (i, t0 + dt.timedelta(minutes=minutes), user, typ,
                0.0, "{}")

    rows = [
        ev(0, 0, 1, "a"), ev(1, 1, 1, "b"), ev(2, 2, 1, "c"),
        ev(3, 3, 1, "d"),
        ev(4, 0, 2, "x"), ev(5, 1, 2, "y"),
        # user 3: two events at the SAME ts — event_id breaks the tie
        ev(6, 0, 3, "p"), ev(7, 0, 3, "q"), ev(8, 1, 3, "r"),
    ]
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            rows,
            ["event_id", "ts", "user_id", "event_type", "value",
             "props"],
        ).write.parquet(os.path.join(td, "events.parquet"))
        got = {
            r.path: r.n
            for r in path_mining_3step(spark, td).collect()
        }
    assert got == {"a>b>c": 1, "b>c>d": 1, "p>q>r": 1}


def test_grouped_linreg_recovers_exact_line(spark):
    """OLS closed form on a constructed exact line: value =
    0.02 * hour + 5.00 (cents-exact at every point) must come back
    as slope_per_day = 0.48 and intercept = 5.0 exactly; a constant
    series fits slope 0."""
    import datetime as dt
    import os
    import tempfile

    from conversadocs_spark.plans.analytics import grouped_linreg

    base = dt.datetime(2024, 1, 1)
    rows = []
    for h in range(48):
        rows.append(
            (h, base + dt.timedelta(hours=h, minutes=1), 1,
             "line", round(0.02 * h + 5.0, 2), "{}")
        )
        rows.append(
            (100 + h, base + dt.timedelta(hours=h), 1,
             "flat", 7.25, "{}")
        )
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            rows,
            ["event_id", "ts", "user_id", "event_type", "value",
             "props"],
        ).write.parquet(os.path.join(td, "events.parquet"))
        got = {
            r.event_type: (r.n, r.slope_per_day, r.intercept)
            for r in grouped_linreg(spark, td).collect()
        }
    assert got["line"] == (48, 0.48, 5.0)
    assert got["flat"] == (48, 0.0, 7.25)


def test_gaps_islands_closed_form(spark):
    """Streak detection on constructed days: user 1 has runs of
    lengths 3 (Jan 1-3) and 2 (Jan 10-11) -> longest 3 starting
    Jan 1; user 2 has two length-2 runs -> the EARLIER one wins the
    tie; duplicate events on one day collapse."""
    import datetime as dt
    import os
    import tempfile

    from conversadocs_spark.plans.analytics import (
        window_gaps_islands,
    )

    def ev(i, day, user):
        return (i, dt.datetime(2024, 1, day, 12, 0), user, "x",
                0.0, "{}")

    rows = [
        ev(0, 1, 1), ev(1, 1, 1), ev(2, 2, 1), ev(3, 3, 1),
        ev(4, 10, 1), ev(5, 11, 1),
        ev(6, 5, 2), ev(7, 6, 2), ev(8, 20, 2), ev(9, 21, 2),
    ]
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            rows,
            ["event_id", "ts", "user_id", "event_type", "value",
             "props"],
        ).write.parquet(os.path.join(td, "events.parquet"))
        got = {
            r.user_id: (r.longest_streak, r.streak_start)
            for r in window_gaps_islands(spark, td).collect()
        }
    assert got[1] == (3, dt.date(2024, 1, 1))
    assert got[2] == (2, dt.date(2024, 1, 5))


def test_decayed_engagement_micros_exact(spark):
    """The r9 regression pin: timestamps carry FRACTIONAL seconds, so
    a whole-second age (unix_timestamp semantics) would skew every
    decay weight; the fixed query must reproduce the exact
    integer-microsecond fixed-point re-derivation, and must NOT match
    the whole-second formulation."""
    import datetime as dt
    import math
    import os
    import tempfile

    from conversadocs_spark.plans.analytics import decayed_engagement

    base = dt.datetime(2024, 1, 1)
    rows = []
    # user 1: three events at fractional-second offsets; user 2: one
    # event exactly at the reference instant (weight == value).
    offsets_us = [0, 123_456, 86_400_500_000, 604_800_250_000]
    users = [2, 1, 1, 1]
    t_ref_us = max(offsets_us)
    for i, (off, uid) in enumerate(zip(offsets_us, users)):
        ts = base + dt.timedelta(microseconds=t_ref_us - off)
        rows.append((i, ts, uid, "view", 10.0 + i, "{}"))

    def score(pairs):
        tot = 0
        for off, val in pairs:
            tot += int(round(
                val * math.exp(-off / 604800.0e6) * 1e6
            ))
        return round(tot / 1e6, 6)

    exact = {
        1: score([(123_456, 11.0), (86_400_500_000, 12.0),
                  (604_800_250_000, 13.0)]),
        2: score([(0, 10.0)]),
    }
    whole_sec = {
        1: score([(0, 11.0), (86_400_000_000, 12.0),
                  (604_800_000_000, 13.0)]),
        2: score([(0, 10.0)]),
    }
    assert exact[1] != whole_sec[1]  # fixture actually discriminates

    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            rows,
            ["event_id", "ts", "user_id", "event_type", "value",
             "props"],
        ).write.parquet(os.path.join(td, "events.parquet"))
        got = {
            r.user_id: (r.n_events, r.decayed_score)
            for r in decayed_engagement(spark, td).collect()
        }
    assert got == {1: (3, exact[1]), 2: (1, exact[2])}


def test_rfm_scores_python_rederivation(spark, sf_dir):
    """Full python replay of the RFM pipeline at sf0.001 (per-user
    aggregates, the three total orders, integer quintile arithmetic),
    plus the scale pin: no RangePartitioning in the executed plan —
    global quintile semantics served by the bucket decomposition."""
    from conversadocs_spark.plans.analytics import rfm_scores

    events = io.table(spark, sf_dir, "events").collect()
    t_ref = max(e.ts for e in events)
    ref_us = int(t_ref.timestamp() * 1_000_000)
    per_user: dict[int, list] = {}
    for e in events:
        per_user.setdefault(e.user_id, []).append(e)
    pu = {}
    for uid, evs in per_user.items():
        last_us = max(
            int(e.ts.timestamp() * 1_000_000) for e in evs
        )
        cents = sum(int(round(e.value * 100)) for e in evs)
        pu[uid] = (
            (ref_us - last_us) // 86_400_000_000,
            len(evs),
            cents,
        )
    n = len(pu)

    def quint(order):
        pos = {u: i + 1 for i, u in enumerate(order)}
        return {u: 5 - ((pos[u] - 1) * 5) // n for u in pos}

    r_q = quint(sorted(pu, key=lambda u: (pu[u][0], u)))
    f_q = quint(sorted(pu, key=lambda u: (-pu[u][1], u)))
    m_q = quint(sorted(pu, key=lambda u: (-(pu[u][2] // 100), u)))
    df = rfm_scores(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan.lower()
    got = {r.user_id: r for r in df.collect()}
    assert set(got) == set(pu)
    for u, (rd, fr, mc) in pu.items():
        r = got[u]
        assert (
            r.recency_days, r.frequency, r.monetary_cents,
            r.r_score, r.f_score, r.m_score, r.rfm,
        ) == (
            rd, fr, mc, r_q[u], f_q[u], m_q[u],
            f"{r_q[u]}{f_q[u]}{m_q[u]}",
        ), f"user {u}"


def test_conversion_latency_consistent_with_funnel(spark, sf_dir):
    """The latency distribution must derive from exactly the
    view->purchase conversions: per-weekday counts re-derived in
    python from the raw events, and every quantile bounded by that
    weekday's min/max latency."""
    from conversadocs_spark.plans.analytics import (
        conversion_latency_quantiles,
    )

    events = io.table(spark, sf_dir, "events").collect()
    per_user: dict[int, list] = {}
    for e in events:
        per_user.setdefault(e.user_id, []).append(e)
    lats: dict[int, list] = {}
    for uid, evs in per_user.items():
        views = [e.ts for e in evs if e.event_type == "view"]
        if not views:
            continue
        t_view = min(views)
        purchases = [
            e.ts
            for e in evs
            if e.event_type == "purchase" and e.ts > t_view
        ]
        if not purchases:
            continue
        t_p = min(purchases)
        p_us = int(t_p.timestamp() * 1_000_000)
        v_us = int(t_view.timestamp() * 1_000_000)
        dow = (p_us // 86_400_000_000) % 7
        lats.setdefault(dow, []).append(p_us - v_us)
    got = {
        r.dow: r
        for r in conversion_latency_quantiles(spark, sf_dir).collect()
    }
    assert set(got) == set(lats)
    for dow, ls in lats.items():
        r = got[dow]
        assert r.n_conversions == len(ls)
        lo, hi = min(ls) / 1e6, max(ls) / 1e6
        for q in (r.p50_s, r.p90_s, r.p99_s):
            assert lo - 1e-6 <= q <= hi + 1e-6
        assert r.p50_s <= r.p90_s <= r.p99_s
