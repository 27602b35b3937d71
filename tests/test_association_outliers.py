"""Planted-scenario tests for market-basket association mining, median/MAD
robust outliers, and HLL audience overlap (the registry parity sweep covers
corpus-level oracle equality; these pin the SEMANTICS on hand-built
inputs)."""

from __future__ import annotations

import datetime as dt


def _li(spark, rows):
    """rows: (orderkey, partkey)"""
    return spark.createDataFrame(
        [(int(o), int(p)) for o, p in rows],
        "l_orderkey long, l_partkey long",
    )


def _run_baskets(spark, tmp_path, rows):
    from procurement_system_bigdata_spark.queries.analytics import (
        q_basket_pairs,
    )

    d = str(tmp_path / "sf")
    _li(spark, rows).write.parquet(f"{d}/lineitem.parquet")
    return {(r.part_a, r.part_b): r for r in q_basket_pairs(spark, d).collect()}


def test_basket_pair_statistics(spark, tmp_path):
    """4 baskets; only (10,20) reaches MIN_PAIR_SUPPORT=2.  Duplicate
    lineitems of the same part in one order must count once."""
    got = _run_baskets(
        spark,
        tmp_path,
        [
            (1, 10), (1, 20), (1, 10),       # dup (1,10) collapses
            (2, 10), (2, 20),
            (3, 10), (3, 20), (3, 30),
            (4, 30), (4, 40),
        ],
    )
    assert set(got) == {(10, 20)}
    r = got[(10, 20)]
    assert (r.n_ab, r.n_a, r.n_b) == (3, 3, 3)
    assert r.support_ppm == 750000          # 3/4 baskets
    assert r.conf_a_to_b_ppm == 1000000     # every 10-basket has 20
    assert r.conf_b_to_a_ppm == 1000000
    # lift = (3 * 4) / (3 * 3) = 1.3333... -> 1333333 micro (half-away)
    assert r.lift_micro == 1333333


def test_basket_cap_excludes_pathological_orders(spark, tmp_path):
    """A basket over MAX_BASKET distinct parts is dropped ENTIRELY — its
    pairs never materialize and it does not count toward n_orders (the
    support denominator), so surviving pair stats are unchanged."""
    from procurement_system_bigdata_spark.queries.analytics import MAX_BASKET

    base = [
        (1, 10), (1, 20),
        (2, 10), (2, 20),
    ]
    mega = [(9, 1000 + i) for i in range(MAX_BASKET + 1)]
    got = _run_baskets(spark, tmp_path, base + mega)
    assert set(got) == {(10, 20)}
    r = got[(10, 20)]
    assert r.n_ab == 2
    assert r.support_ppm == 1000000  # n_orders == 2, mega basket excluded


def _ev(spark, rows):
    """rows: (event_type, value-or-None)"""
    ts = dt.datetime(2024, 1, 1, 12, 0, 0)
    return spark.createDataFrame(
        [(i, ts, 1, t, v, "{}") for i, (t, v) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_robust_outliers_mad_semantics(spark, tmp_path):
    from procurement_system_bigdata_spark.queries.patterns import (
        q_robust_outliers,
    )

    rows = (
        # type a: mad == 0 (majority at one value) -> every off-median row
        # flags (the documented MAD degeneracy)
        [("a", 1.0)] * 4 + [("a", 100.0)]
        # type b: med 3.5, mad 1.5; only 1000.0 exceeds 3.5 +- 4.5
        + [("b", v) for v in (1.0, 2.0, 3.0, 4.0, 5.0, 1000.0)]
        # NULL / NaN / ±Inf values are ignored (the finite guard: any of
        # these reaching the micro-unit BIGINT cast would throw under ANSI
        # mode and crash the DuckDB mirror's CAST)
        + [("b", None), ("b", float("nan")), ("b", float("inf")),
           ("b", float("-inf"))]
        # type c: even count -> interpolated median 1.5 exactly
        + [("c", 1.0), ("c", 2.0)]
    )
    d = str(tmp_path / "sf")
    _ev(spark, rows).write.parquet(f"{d}/events.parquet")
    got = {r.event_type: r for r in q_robust_outliers(spark, d).collect()}

    a = got["a"]
    assert (a.n_events, a.n_outliers) == (5, 1)
    assert a.median_micro == 1_000_000.0
    assert a.mad_micro == 0.0
    assert a.max_abs_dev_micro == 99_000_000.0

    b = got["b"]
    assert (b.n_events, b.n_outliers) == (6, 1)  # NULL/NaN/Inf rows dropped
    assert b.median_micro == 3_500_000.0
    assert b.mad_micro == 1_500_000.0

    c = got["c"]
    assert c.median_micro == 1_500_000.0
    assert c.n_outliers == 0  # devs 0.5e6 each; mad 0.5e6; 0.5 < 3*0.5


def test_audience_overlap_inclusion_exclusion(spark, tmp_path):
    """Hand-built overlaps: u1 does {A,B}, u2 {A}, u3 {B,C} — exact
    intersections derive by inclusion-exclusion, and at this cardinality
    the HLL estimates are exact so every bound check must pass."""
    from procurement_system_bigdata_spark.queries.analytics import (
        q_audience_overlap,
    )

    rows = [(1, "A"), (1, "B"), (2, "A"), (3, "B"), (3, "C"),
            (1, "A"),   # duplicate (u1, A) event must not double-count
            (None, "A"), (None, "C")]  # NULL users: in no audience at all
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1, 12), u, t, 1.0, "{}")
         for i, (u, t) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{d}/events.parquet")

    got = {(r.type_a, r.type_b): r for r in
           q_audience_overlap(spark, d).collect()}
    assert set(got) == {("A", "B"), ("A", "C"), ("B", "C")}
    ab = got[("A", "B")]
    assert (ab.exact_a, ab.exact_b, ab.exact_union,
            ab.exact_intersection) == (2, 2, 3, 1)
    ac = got[("A", "C")]
    assert (ac.exact_union, ac.exact_intersection) == (3, 0)
    bc = got[("B", "C")]
    assert (bc.exact_union, bc.exact_intersection) == (2, 1)
    assert all(r.err_bound_checked for r in got.values())


def test_item_item_recs_cosine_and_symmetry(spark, tmp_path):
    """Co-occurrence cosine: parts 10/20 co-occur in 2 of each's 3
    baskets -> cosine 2/3 exactly; the directed unpivot must emit BOTH
    directions; a part's recommendation list never contains itself."""
    from procurement_system_bigdata_spark.queries.analytics import (
        q_item_item_recs,
    )

    rows = [
        (1, 10), (1, 20),
        (2, 10), (2, 20),
        (3, 10), (3, 30),
        (4, 20), (4, 30),
    ]
    d = str(tmp_path / "sf")
    _li(spark, rows).write.parquet(f"{d}/lineitem.parquet")
    got = {(r.part, r.rec): r for r in q_item_item_recs(spark, d).collect()}
    # (10,20) co-occur twice; n_10 = n_20 = 3 -> cosine = 2/3
    assert got[(10, 20)].cosine_micro == 666667  # half-away of 2/3 * 1e6
    assert got[(20, 10)].cosine_micro == 666667  # symmetric direction
    assert got[(10, 20)].n_ab == 2
    # (10,30) and (20,30) co-occur once each: below MIN_PAIR_SUPPORT=2
    assert (10, 30) not in got and (30, 20) not in got
    assert all(p != r for p, r in got)
