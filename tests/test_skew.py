"""Salted aggregation/join must be exactly equivalent to the unsalted ops."""

from __future__ import annotations

import pyspark.sql.functions as F

from conftest import SF_DIR

from procurement_system_bigdata_spark.catalog import load_table
from procurement_system_bigdata_spark.operators.skew import (
    salted_join_hot_keys,
    salted_sum,
)


def test_salted_sum_equals_plain_sum(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    plain = {
        (r.l_returnflag, r.l_linestatus): (r.qty, r.n)
        for r in li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    salted = {
        (r.l_returnflag, r.l_linestatus): (r.qty, r.n)
        for r in salted_sum(
            li,
            ["l_returnflag", "l_linestatus"],
            {
                "qty": F.sum(F.col("l_quantity").cast("long")),
                "n": F.count(F.lit(1)),
            },
            salt_buckets=8,
        ).collect()
    }
    assert salted == plain


def test_salted_join_equals_plain_join(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    part = load_table(spark, SF_DIR, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_name"
    )
    plain = (
        li.join(part, "l_partkey")
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # treat the 3 most frequent partkeys as "hot"
    hot = [r.l_partkey for r in
           li.groupBy("l_partkey").count().orderBy(F.desc("count")).limit(3).collect()]
    salted = (
        salted_join_hot_keys(li, part, "l_partkey", hot, salt_buckets=4)
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert {(r.l_partkey, r.n) for r in salted.collect()} == {
        (r.l_partkey, r.n) for r in plain.collect()
    }
