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


def test_aqe_skew_join_fires_on_hot_simhash_band(spark):
    """The simhash band join's documented skew story (operators/dedup.py:
    boilerplate docs share a fingerprint -> one hot (band, band_val) key)
    must actually engage AQE's skew-join split, not just claim it.

    Threshold finding, documented in DESIGN.md: AQE detects skew on
    COMPRESSED map-output block sizes, and a hot key made of near-identical
    rows (exactly the boilerplate case) compresses ~10x, so the 800-row hot
    partition that is ~30 KB of rows shows up as a few KB of shuffle bytes —
    skewedPartitionThresholdInBytes must be budgeted against compressed
    bytes.  With the thresholds below (512 B, factor 1.0, advisory 256 B,
    forceOptimize on because the split adds a shuffle before the
    dropDuplicates exchange) the final adaptive plan marks the join
    SortMergeJoin(skew=true) with both sides AQEShuffleRead skewed."""
    from procurement_system_bigdata_spark.operators import dedup

    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "512",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        boiler = [
            (i, "the quick brown fox jumps over the lazy dog repeatedly")
            for i in range(800)
        ]
        uniq = [
            (10_000 + i, f"unique document number {i} with words w{i} w{i+1}")
            for i in range(200)
        ]
        docs = spark.createDataFrame(
            boiler + uniq, "doc_id long, text string"
        ).repartition(16)
        pairs = dedup.simhash_neardup_pairs(docs)
        rows = pairs.collect()
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin(skew=true)" in plan, "skew-join split must fire"
        assert plan.count("AQEShuffleRead skewed") >= 2, (
            "both sides of the hot band self-join must be split"
        )
        # and the answer is still exactly right: every boilerplate pair is
        # hamming-0, so all C(800, 2) pairs among them must be present
        boiler_pairs = sum(
            1 for r in rows if r.doc_a < 10_000 and r.doc_b < 10_000
        )
        assert boiler_pairs == 800 * 799 // 2
        assert all(r.hamming == 0 for r in rows if r.doc_b < 10_000)
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
