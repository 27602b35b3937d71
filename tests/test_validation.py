"""fk_integrity must DETECT violations, not just report zeros on the intact
testdata (which it does — the oracle-parity test covers that path)."""

from __future__ import annotations

from procurement_system_bigdata_spark.queries.analytics import fk_violations


def test_fk_violations_counts_orphans(spark):
    fact = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None)], "id long, dim_id long"
    )
    dim = spark.createDataFrame([(10,), (20,)], "k long")
    row = fk_violations("fact.dim_id->dim", fact, "dim_id", dim, "k").collect()[0]
    # the orphan (99) and the NULL key (no match possible) both count
    assert row["constraint_name"] == "fact.dim_id->dim"
    assert row["n_violations"] == 2


def test_fk_violations_zero_when_contained(spark):
    fact = spark.createDataFrame([(1, 10), (2, 20)], "id long, dim_id long")
    dim = spark.createDataFrame([(10,), (20,)], "k long")
    assert fk_violations("c", fact, "dim_id", dim, "k").collect()[0]["n_violations"] == 0
