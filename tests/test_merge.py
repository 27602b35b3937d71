"""MERGE/SCD2 semantics tests."""

from __future__ import annotations

from datetime import date

import pyspark.sql.functions as F

from procurement_system_bigdata_spark.operators.merge import merge_upsert, scd2_apply


def test_merge_upsert(spark):
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["id", "name", "v"]
    )
    changes = spark.createDataFrame(
        [(2, "b2", 21), (4, "d", 40)], ["id", "name", "v"]
    )
    out = {r.id: (r.name, r.v) for r in merge_upsert(base, changes, ["id"]).collect()}
    assert out == {1: ("a", 10), 2: ("b2", 21), 3: ("c", 30), 4: ("d", 40)}


def test_scd2_apply(spark):
    dim = spark.createDataFrame(
        [
            # key, attr, effective_from, effective_to, is_current
            (1, "old-a", date(2026, 1, 1), date(2026, 2, 1), False),
            (1, "a", date(2026, 2, 1), None, True),
            (2, "b", date(2026, 1, 1), None, True),
        ],
        "id int, attr string, effective_from date, effective_to date, is_current boolean",
    )
    changes = spark.createDataFrame(
        [(1, "a2", date(2026, 3, 1)), (3, "c", date(2026, 3, 1))],
        "id int, attr string, effective_from date",
    )
    out = scd2_apply(dim, changes, ["id"]).collect()
    rows = {(r.id, r.attr): r for r in out}
    assert len(out) == 5
    # old history untouched
    assert rows[(1, "old-a")].effective_to == date(2026, 2, 1)
    # previous current for id=1 closed at the change date
    assert rows[(1, "a")].effective_to == date(2026, 3, 1)
    assert rows[(1, "a")].is_current is False
    # new version current and open-ended
    assert rows[(1, "a2")].is_current is True
    assert rows[(1, "a2")].effective_to is None
    # untouched current key stays current
    assert rows[(2, "b")].is_current is True
    # brand-new key inserts as current
    assert rows[(3, "c")].is_current is True


def test_scd2_idempotent_on_empty_changes(spark):
    dim = spark.createDataFrame(
        [(1, "a", date(2026, 1, 1), None, True)],
        "id int, attr string, effective_from date, effective_to date, is_current boolean",
    )
    empty = dim.filter(F.lit(False)).select("id", "attr", "effective_from")
    out = scd2_apply(dim, empty, ["id"]).collect()
    assert len(out) == 1 and out[0].is_current


def test_scd2_registry_query_end_to_end(spark, tmp_path):
    """The registry composition (q_scd2_customer_segments) drives
    scd2_apply over parquet inputs: P-order customers get their seed row
    closed at the FIRST P-order date and a 'PRIORITY' current version;
    everyone else passes through current."""
    import datetime as dt

    from procurement_system_bigdata_spark.queries.analytics import (
        q_scd2_customer_segments,
    )

    d = str(tmp_path / "sf")
    spark.createDataFrame(
        [(1, "BUILDING"), (2, "MACHINERY")],
        "c_custkey long, c_mktsegment string",
    ).write.parquet(f"{d}/customer.parquet")
    spark.createDataFrame(
        [
            (100, 1, "P", dt.datetime(2024, 3, 1)),
            (101, 1, "P", dt.datetime(2024, 1, 15)),  # earlier: wins MIN
            (102, 1, "O", dt.datetime(2023, 1, 1)),   # non-P: ignored
            (103, 2, "O", dt.datetime(2024, 2, 1)),   # cust 2 untouched
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_orderdate timestamp",
    ).write.parquet(f"{d}/orders.parquet")

    rows = {(r.cust_id, r.segment): r for r in
            q_scd2_customer_segments(spark, d).collect()}
    assert len(rows) == 3
    closed = rows[(1, "BUILDING")]
    assert closed.is_current is False
    assert closed.effective_to == dt.date(2024, 1, 15)
    new = rows[(1, "PRIORITY")]
    assert new.is_current is True and new.effective_to is None
    assert new.effective_from == dt.date(2024, 1, 15)
    untouched = rows[(2, "MACHINERY")]
    assert untouched.is_current is True and untouched.effective_to is None
