"""Perturbed-data parity for the TPC-H shapes: the round-5 review found
three latent Spark-vs-DuckDB divergences masked by accidental testdata
invariants (midnight-only timestamps, integer-valued quantities, non-null
priorities).  These tests build corpora that VIOLATE those invariants and
assert the query still hash-matches its oracle."""

from __future__ import annotations

import datetime as dt

import duckdb

import conftest
from procurement_system_bigdata_spark.queries import olap


def _write(df, path):
    df.write.mode("overwrite").parquet(path)


def _duck_for(d):
    import os

    con = duckdb.connect()
    for t in ("lineitem", "orders", "part", "supplier", "nation"):
        if os.path.isdir(f"{d}/{t}.parquet"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{d}/{t}.parquet/*.parquet')"
            )
    return con


def test_sole_late_supplier_non_midnight_orders(spark, tmp_path):
    """Order timestamps at 12:00 with shipments near the 90-day boundary:
    before the date-anchor fix Spark truncated to midnight while the
    oracle preserved time-of-day, flipping the late flag."""
    d = str(tmp_path)
    noon = dt.datetime(1996, 1, 1, 12, 0, 0)
    _write(
        spark.createDataFrame(
            [(1, noon, "F"), (2, noon, "F")],
            "o_orderkey long, o_orderdate timestamp, o_orderstatus string",
        ),
        f"{d}/orders.parquet",
    )
    # order 1: supplier 10 ships at day+90 06:00 (late vs midnight anchor,
    # NOT late vs noon anchor — the exact divergence case), supplier 11 on
    # time; order 2: both on time
    b = dt.datetime(1996, 3, 31, 6, 0, 0)  # Jan 1 + 90 days, 06:00
    ok = dt.datetime(1996, 2, 1, 0, 0, 0)
    _write(
        spark.createDataFrame(
            [
                (1, 10, b),
                (1, 11, ok),
                (2, 10, ok),
                (2, 11, ok),
            ],
            "l_orderkey long, l_suppkey long, l_shipdate timestamp",
        ),
        f"{d}/lineitem.parquet",
    )
    _write(
        spark.createDataFrame(
            [(10, "Supp10"), (11, "Supp11")],
            "s_suppkey long, s_name string",
        ),
        f"{d}/supplier.parquet",
    )
    con = _duck_for(d)
    got = olap.q_sole_late_supplier(spark, d)
    conftest.assert_matches_oracle(got, con, olap.Q_SOLE_LATE_SUPPLIER_SQL)
    # and the date-anchored semantics flag supplier 10 on order 1
    assert {(r.s_suppkey, r.numwait) for r in got.collect()} == {(10, 1)}
    con.close()


def test_excess_share_fractional_quantities(spark, tmp_path):
    """Fractional l_quantity (2.7): bare casts truncate in Spark but round
    in DuckDB; both sides now ROUND explicitly."""
    d = str(tmp_path)
    _write(
        spark.createDataFrame(
            [(100, "cold brew kit"), (200, "warm thing")],
            "p_partkey long, p_name string",
        ),
        f"{d}/part.parquet",
    )
    rows = [(100, 1, 2.7), (100, 1, 2.7), (100, 2, 0.4)]
    _write(
        spark.createDataFrame(
            rows, "l_partkey long, l_suppkey long, l_quantity double"
        ),
        f"{d}/lineitem.parquet",
    )
    _write(
        spark.createDataFrame(
            [(1, "S1", 0), (2, "S2", 0)],
            "s_suppkey long, s_name string, s_nationkey long",
        ),
        f"{d}/supplier.parquet",
    )
    _write(
        spark.createDataFrame(
            [(0, "NATION0")], "n_nationkey long, n_name string"
        ),
        f"{d}/nation.parquet",
    )
    con = _duck_for(d)
    got = olap.q_excess_share_suppliers(spark, d)
    conftest.assert_matches_oracle(got, con, olap.Q_EXCESS_SHARE_SUPPLIERS_SQL)
    # rounded quantities: supplier 1 holds 6 of 6 units on part 100
    # (2.7 -> 3 twice, 0.4 -> 0), clearing the 10% share bar
    rows = {(r.s_suppkey): r for r in got.collect()}
    assert 1 in rows
    con.close()


def test_priority_mix_null_priority(spark, tmp_path):
    """A NULL o_orderpriority must count as LOW on both engines (the
    oracle's CASE ... ELSE 1); summing a NULL boolean would drop it."""
    d = str(tmp_path)
    _write(
        spark.createDataFrame(
            [(1, "1-URGENT"), (2, None), (3, "5-LOW")],
            "o_orderkey long, o_orderpriority string",
        ),
        f"{d}/orders.parquet",
    )
    ship = dt.datetime(1996, 6, 1)
    _write(
        spark.createDataFrame(
            [(1, "O", ship), (2, "O", ship), (3, "O", ship)],
            "l_orderkey long, l_linestatus string, l_shipdate timestamp",
        ),
        f"{d}/lineitem.parquet",
    )
    _write(
        spark.createDataFrame([(0, "x")], "p_partkey long, p_name string"),
        f"{d}/part.parquet",
    )
    _write(
        spark.createDataFrame([(0, "s")], "s_suppkey long, s_name string"),
        f"{d}/supplier.parquet",
    )
    con = _duck_for(d)
    got = olap.q_priority_line_mix(spark, d)
    conftest.assert_matches_oracle(got, con, olap.Q_PRIORITY_LINE_MIX_SQL)
    row = got.collect()[0]
    assert (row.high_line_count, row.low_line_count) == (1, 2)
    con.close()
