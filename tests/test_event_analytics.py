"""Planted-scenario tests for retention cohorts, rolling active users, and
daily anomaly z-scores (the registry parity sweep covers corpus-level
oracle equality; these pin the SEMANTICS on hand-built event streams)."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F


def _ev(spark, rows):
    """rows: (user_id, 'YYYY-MM-DD')"""
    return spark.createDataFrame(
        [
            (i, dt.datetime.fromisoformat(d + "T12:00:00"), u, "view", 1.0, "{}")
            for i, (u, d) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_retention_cohort_semantics(spark, tmp_path):
    """Drives the PRODUCTION query function end to end (write parquet,
    load via sf_dir) so regressions in the real plan are caught."""
    from procurement_system_bigdata_spark.queries.analytics import (
        q_retention_cohorts,
    )

    df = _ev(
        spark,
        [
            # cohort Jan 1: users 1,2 — user 1 returns day 1 and 3,
            # user 2 never returns
            (1, "2024-01-01"),
            (2, "2024-01-01"),
            (1, "2024-01-02"),
            (1, "2024-01-04"),
            # cohort Jan 2: user 3, returns day 1
            (3, "2024-01-02"),
            (3, "2024-01-03"),
            # duplicate activity same day must not double-count
            (3, "2024-01-03"),
        ],
    )
    d = str(tmp_path / "sf")
    df.write.parquet(f"{d}/events.parquet")
    rows = q_retention_cohorts(spark, d).collect()
    got = {(str(r.cohort_date), r.day_offset): r.n_active for r in rows}
    assert got[("2024-01-01", 0)] == 2
    assert got[("2024-01-01", 1)] == 1
    assert got[("2024-01-01", 3)] == 1
    assert got[("2024-01-02", 0)] == 1
    assert got[("2024-01-02", 1)] == 1
    assert ("2024-01-01", 2) not in got
    sizes = {str(r.cohort_date): r.cohort_size for r in rows}
    assert sizes == {"2024-01-01": 2, "2024-01-02": 1}


def test_rolling_wau_counts_trailing_window(spark, tmp_path):
    """WAU on day t = distinct users active in [t-6, t]; a user active
    twice in the window counts once."""
    df = _ev(
        spark,
        [
            (1, "2024-01-01"),
            (2, "2024-01-01"),
            (1, "2024-01-05"),  # same user re-appears inside the window
            (3, "2024-01-08"),  # day 8: window [02..08] — user 1 (day 5) + 3
        ],
    )
    d = str(tmp_path / "sf")
    df.write.parquet(f"{d}/events.parquet")
    from procurement_system_bigdata_spark.queries.patterns import (
        q_rolling_active_users,
    )

    got = {str(r.d): (r.dau, r.wau) for r in q_rolling_active_users(spark, d).collect()}
    assert got["2024-01-01"] == (2, 2)
    assert got["2024-01-05"] == (1, 2)  # users 1,2 within [12-30..01-05]
    assert got["2024-01-08"] == (1, 2)  # users 1(day5), 3 — user 2 aged out


def test_daily_anomaly_zscores_exact(spark, tmp_path):
    """z-scores match the closed-form sample statistics."""
    counts = {"2024-01-01": 3, "2024-01-02": 4, "2024-01-03": 8}
    rows = []
    u = 0
    for d, n in counts.items():
        for _ in range(n):
            rows.append((u, d))
            u += 1
    df = _ev(spark, rows)
    d = str(tmp_path / "sf")
    df.write.parquet(f"{d}/events.parquet")
    from procurement_system_bigdata_spark.queries.patterns import (
        q_daily_anomalies,
    )

    got = {str(r.d): r for r in q_daily_anomalies(spark, d).collect()}
    ns = list(counts.values())
    mean = sum(ns) / len(ns)
    std = math.sqrt(sum((x - mean) ** 2 for x in ns) / (len(ns) - 1))
    for day, n in counts.items():
        assert abs(got[day].z_score - (n - mean) / std) < 1e-12
        assert got[day].is_anomaly == (abs((n - mean) / std) > 2.0)


def test_daily_anomaly_degenerate_corpora(spark, tmp_path, duck):
    """Single active day (sample variance undefined) and uniform counts
    (std=0) must yield NULL z/flag rows on BOTH engines, not an ANSI
    divide-by-zero crash — and still hash-match the oracle."""
    import conftest
    from procurement_system_bigdata_spark.queries.patterns import (
        Q_DAILY_ANOMALIES_SQL,
        q_daily_anomalies,
    )

    for rows in (
        [(1, "2024-01-01"), (2, "2024-01-01")],  # one day: k=1
        [(1, "2024-01-01"), (2, "2024-01-02"), (3, "2024-01-03")],  # std=0
    ):
        df = _ev(spark, rows)
        d = str(tmp_path / f"sf{len(rows)}")
        df.write.mode("overwrite").parquet(f"{d}/events.parquet")
        got = q_daily_anomalies(spark, d).collect()
        assert all(r.z_score is None and r.is_anomaly is None for r in got)
        import duckdb

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet/*.parquet')"
        )
        conftest.assert_matches_oracle(
            q_daily_anomalies(spark, d), con, Q_DAILY_ANOMALIES_SQL
        )
        con.close()


def test_asof_join_tied_marker_timestamps(spark, tmp_path):
    """Two view markers at the IDENTICAL microsecond: both engines must
    deterministically attribute the purchase to the larger marker_id
    (DuckDB's raw ASOF JOIN picks an insert-order-dependent row on ties;
    the oracle pre-aggregates to MAX(marker_id) per timestamp)."""
    import duckdb

    from procurement_system_bigdata_spark.queries.patterns import (
        Q_ASOF_JOIN_SQL,
        q_asof_join,
    )

    t = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (3, t, 1, "view", 1.0, "{}"),
        (9, t, 1, "view", 1.0, "{}"),  # tied with marker 3
        (20, dt.datetime(2024, 1, 1, 11, 0, 0), 1, "purchase", 5.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path / "sf")
    df.write.parquet(f"{d}/events.parquet")
    got = q_asof_join(spark, d).collect()
    assert len(got) == 1 and got[0].asof_view_id == 9
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet/*.parquet')"
    )
    import conftest

    conftest.assert_matches_oracle(q_asof_join(spark, d), con, Q_ASOF_JOIN_SQL)
    con.close()


def test_event_transitions_matrix(spark, tmp_path):
    """u1: A->B->A, u2: B->B (same-ts tie broken by event_id) — counts and
    row-normalized ppm probabilities."""
    import datetime as dtm

    from procurement_system_bigdata_spark.queries.patterns import (
        q_event_transitions,
    )

    t0 = dtm.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # (event_id, ts, user_id, type): u2's two B events share a ts —
        # the (ts, event_id) tie-break must order 10 before 11
        (1, t0, 1, "A"),
        (2, t0 + dtm.timedelta(minutes=1), 1, "B"),
        (3, t0 + dtm.timedelta(minutes=2), 1, "A"),
        (10, t0, 2, "B"),
        (11, t0, 2, "B"),
        # NULL ts cannot be ordered — both engines drop it (the divergent
        # NULL-placement class: Spark windows sort NULLS FIRST, DuckDB
        # NULLS LAST, so keeping it would reorder one engine's stream)
        (12, None, 2, "A"),
    ]
    df = spark.createDataFrame(
        [(i, ts, u, t, 1.0, "{}") for i, ts, u, t in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path / "sf")
    df.write.parquet(f"{d}/events.parquet")
    got = {(r.from_type, r.to_type): r for r in
           q_event_transitions(spark, d).collect()}
    assert set(got) == {("A", "B"), ("B", "A"), ("B", "B")}
    assert got[("A", "B")].n_transitions == 1
    assert got[("A", "B")].prob_ppm == 1000000  # A's only transition
    assert got[("B", "A")].prob_ppm == 500000   # B -> {A, B} evenly
    assert got[("B", "B")].prob_ppm == 500000


def test_value_psi_detects_drift(spark, tmp_path):
    """A type concentrated far from the global mass must score a large
    PSI; a type mirroring the global mix scores near zero; PSI is always
    non-negative."""
    import datetime as dtm

    from procurement_system_bigdata_spark.queries.analytics import (
        q_value_psi,
    )

    t0 = dtm.datetime(2024, 1, 1, 12)
    rows = []
    # 'bulk' and 'mirror' share one distribution (values ~400, high bins);
    # 'drift' sits at ~10, far from the global mass.  Note the reference
    # population is the GLOBAL mix, so bulk/mirror carry a small true PSI
    # too (they lack drift's bin-0 mass) — assertions are relative.
    rows += [("bulk", 400.0 + (i % 5)) for i in range(2000)]
    rows += [("mirror", 400.0 + (i % 5)) for i in range(2000)]
    rows += [("drift", 10.0 + (i % 3)) for i in range(200)]
    df = spark.createDataFrame(
        [(i, t0, 1, t, v, "{}") for i, (t, v) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path / "sf")
    df.write.parquet(f"{d}/events.parquet")
    got = {r.event_type: r for r in q_value_psi(spark, d).collect()}
    assert set(got) == {"bulk", "mirror", "drift"}
    assert all(r.psi_micro >= 0 for r in got.values())
    # 0.25 (action threshold) = 250_000 micro: the drifted type is FAR out
    assert got["drift"].psi_micro > 250_000
    assert got["drift"].psi_micro > 10 * got["mirror"].psi_micro
    # identical distributions at identical volume -> bit-equal PSI (the
    # whole pipeline is integer counts + portable ln + fixed-point terms)
    assert got["mirror"].psi_micro == got["bulk"].psi_micro


def test_user_streaks_islands(spark, tmp_path):
    """Days {1,2,3,5,6,9} -> streaks [3,2,1]; duplicate same-day events
    collapse; NULL ts drops."""
    from procurement_system_bigdata_spark.queries.patterns import (
        q_user_streaks,
    )

    days = ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-05",
            "2024-01-06", "2024-01-09", "2024-01-09"]  # dup day
    df = _ev(spark, [(1, d) for d in days])
    null_row = spark.createDataFrame(
        [(99, None, 1, "view", 1.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path / "sf")
    df.union(null_row).write.parquet(f"{d}/events.parquet")
    got = {r.user_id: r for r in q_user_streaks(spark, d).collect()}
    r = got[1]
    assert r.n_active_days == 6
    assert r.n_streaks == 3
    assert r.longest_streak_days == 3
    assert str(r.first_active_day) == "2024-01-01"


def test_twap_daily_interval_weighting(spark, tmp_path):
    """09:00 v=1 (held 8 h), 17:00 v=100 (held 1 h), 18:00 v=50 (closes
    the day, no weight): TWAP = (1*8 + 100*1)/9 = 12 exactly — far from
    the naive AVG of 50.3.  A single-event day has no intervals and is
    absent."""
    import datetime as dtm

    from procurement_system_bigdata_spark.queries.patterns import (
        q_twap_daily,
    )

    d0 = dtm.datetime(2024, 1, 1, 9)
    rows = [
        (1, d0, 1, "view", 1.0, "{}"),
        (2, d0 + dtm.timedelta(hours=8), 1, "view", 100.0, "{}"),
        (3, d0 + dtm.timedelta(hours=9), 1, "view", 50.0, "{}"),
        # user 2: single event that day -> excluded
        (4, d0, 2, "view", 7.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path / "sf")
    df.write.parquet(f"{d}/events.parquet")
    got = {(r.user_id, str(r.day)): r for r in q_twap_daily(spark, d).collect()}
    assert set(got) == {(1, "2024-01-01")}
    r = got[(1, "2024-01-01")]
    assert r.n_intervals == 2
    assert r.span_us == 9 * 3600 * 1_000_000
    assert r.twap_micro == 12_000_000


def test_rfm_segments_quintiles(spark, tmp_path):
    """10 customers, one order each: recency best for low custkeys (later
    dates), monetary best for high custkeys — quintile edges land exactly
    on the floor formula, and tied frequency breaks by custkey."""
    import datetime as dtm

    from procurement_system_bigdata_spark.queries.analytics import (
        q_rfm_segments,
    )

    rows = [
        (i, i, "O",
         float(100 * i),
         dtm.datetime(2024, 1, 20 - i),  # cust 1: Jan 19 (freshest)
         "P")
        for i in range(1, 11)
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    d = str(tmp_path / "sf")
    df.write.parquet(f"{d}/orders.parquet")
    got = {r.c_custkey: r for r in q_rfm_segments(spark, d).collect()}
    assert len(got) == 10
    # recency: seq == custkey -> buckets of 2 -> scores 5,5,4,4,...,1,1
    assert [got[i].r_score for i in range(1, 11)] == [
        5, 5, 4, 4, 3, 3, 2, 2, 1, 1
    ]
    # monetary: descending in custkey -> mirrored
    assert [got[i].m_score for i in range(1, 11)] == [
        1, 1, 2, 2, 3, 3, 4, 4, 5, 5
    ]
    # frequency all tied at 1 order: custkey tiebreak -> same as recency
    assert [got[i].f_score for i in range(1, 11)] == [
        5, 5, 4, 4, 3, 3, 2, 2, 1, 1
    ]
    assert got[1].recency_days == 0  # corpus-max anchored
    assert got[10].recency_days == 9


def test_abc_analysis_pareto_classes(spark, tmp_path):
    """Revenues 70/15/10/5 (in revenue order): cumulative shares 70/85/95/
    100 -> classes A (<=70), B (<=90), C, C — boundary-exact BIGINT math
    (the 70-share part sits EXACTLY on the A edge and must be A)."""
    from procurement_system_bigdata_spark.queries.analytics import (
        q_abc_analysis,
    )

    rows = [
        # one lineitem per part; extendedprice = revenue (discount 0)
        (1, 1, 70.0, 0.0),
        (2, 2, 15.0, 0.0),
        (3, 3, 10.0, 0.0),
        (4, 4, 5.0, 0.0),
    ]
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_extendedprice double, "
        "l_discount double",
    )
    d = str(tmp_path / "sf")
    df.write.parquet(f"{d}/lineitem.parquet")
    got = {r.p_partkey: r for r in q_abc_analysis(spark, d).collect()}
    assert {k: v.abc_class for k, v in got.items()} == {
        1: "A", 2: "B", 3: "C", 4: "C"
    }
    assert got[1].cum_cents == 7000
    assert got[4].cum_cents == 10000


def test_backlog_curve_semantics(spark, tmp_path):
    """Orders placed Jan 1 (x2) and Jan 2; order 1 completes when its LAST
    lineitem ships (Jan 3, not Jan 2); order 3 never ships and holds the
    backlog at 1 forever."""
    import datetime as dtm

    from procurement_system_bigdata_spark.queries.analytics import (
        q_backlog_curve,
    )

    orders = spark.createDataFrame(
        [
            (1, 1, "O", 10.0, dtm.datetime(2024, 1, 1), "P"),
            (2, 2, "O", 10.0, dtm.datetime(2024, 1, 1), "P"),
            (3, 3, "O", 10.0, dtm.datetime(2024, 1, 2), "P"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    li = spark.createDataFrame(
        [
            (1, 1, dtm.datetime(2024, 1, 2)),
            (1, 2, dtm.datetime(2024, 1, 3)),  # last item -> completes Jan 3
            (2, 1, dtm.datetime(2024, 1, 2)),
        ],
        "l_orderkey long, l_linenumber long, l_shipdate timestamp",
    )
    d = str(tmp_path / "sf")
    orders.write.parquet(f"{d}/orders.parquet")
    li.write.parquet(f"{d}/lineitem.parquet")
    got = {str(r.day): r for r in q_backlog_curve(spark, d).collect()}
    assert got["2024-01-01"].backlog == 2           # 2 placed
    assert got["2024-01-02"].n_completed == 1       # order 2 only
    assert got["2024-01-02"].backlog == 2           # +1 placed, -1 done
    assert got["2024-01-03"].backlog == 1           # order 1 completes
    assert got["2024-01-03"].n_placed == 0


def test_supplier_leadtime_scorecard(spark, tmp_path):
    """Supplier 7 ships at 10/20/100 days: median 20, p75 interpolates to
    60 exactly ((20+100)/2 at f=0.5 of the upper gap... computed as
    20 + 0.5*(100-20) = 60), late share 1/3 -> 333333 ppm."""
    import datetime as dtm

    from procurement_system_bigdata_spark.queries.analytics import (
        q_supplier_leadtime,
    )

    d0 = dtm.datetime(2024, 1, 1)
    orders = spark.createDataFrame(
        [(i, 1, "O", 1.0, d0, "P") for i in (1, 2, 3)],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    li = spark.createDataFrame(
        [
            (1, 7, d0 + dtm.timedelta(days=10)),
            (2, 7, d0 + dtm.timedelta(days=20)),
            (3, 7, d0 + dtm.timedelta(days=100)),
        ],
        "l_orderkey long, l_suppkey long, l_shipdate timestamp",
    )
    d = str(tmp_path / "sf")
    orders.write.parquet(f"{d}/orders.parquet")
    li.write.parquet(f"{d}/lineitem.parquet")
    got = {r.supp_id: r for r in q_supplier_leadtime(spark, d).collect()}
    r = got[7]
    assert r.n_shipments == 3
    assert r.median_lead_days == 20.0
    assert r.p75_lead_days == 60.0  # index 0.75*2 = 1.5 -> 20 + 0.5*80
    assert r.max_lead_days == 100
    assert r.late_ppm == 333333
