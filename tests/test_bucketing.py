"""Bucketed-layout co-location: the written layout must eliminate the join
and aggregation shuffles entirely (plan-verified), with results identical to
the direct shuffle join."""

from __future__ import annotations

import pyspark.sql.functions as F
from conftest import SF_DIR

from procurement_system_bigdata_spark.catalog import load_table
from procurement_system_bigdata_spark.operators.bucketing import (
    colocated_join,
    write_bucketed,
)
from procurement_system_bigdata_spark.plans.explain import plan_stats


def test_bucketed_join_and_agg_have_no_shuffle(spark, tmp_path):
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_custkey", "o_orderstatus"
    )
    try:
        write_bucketed(li, "b_lineitem", ["l_orderkey"], 8, str(tmp_path / "li"))
        write_bucketed(orders, "b_orders", ["l_orderkey"], 8, str(tmp_path / "ord"))

        joined = colocated_join(
            spark, "b_lineitem", "b_orders", ["l_orderkey"], force_sort_merge=True
        )
        stats = plan_stats(joined)
        assert stats["sort_merge_joins"] == 1
        assert stats["shuffles"] == 0, "bucketed join must not exchange:\n" + stats[
            "plan"
        ][:3000]

        direct = li.join(orders, "l_orderkey")
        assert joined.count() == direct.count()

        agg = (
            spark.table("b_lineitem")
            .groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        agg_stats = plan_stats(agg)
        assert agg_stats["shuffles"] == 0, (
            "bucket-key aggregation must not exchange:\n" + agg_stats["plan"][:3000]
        )
        assert agg.count() == li.select("l_orderkey").distinct().count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")
