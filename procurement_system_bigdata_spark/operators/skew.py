"""Skew mitigation: salted two-phase aggregation and salted broadcast-side
replication for joins.

AQE's skew-join splitting (enabled in session.py) handles most runtime skew;
these explicit operators are for the cases AQE can't fix — a single hot
GROUP BY key whose partial aggregate still overwhelms one task, or a
deliberately pre-partitioned layout.  SURVEY §7: "salting only if skew
appears" — provided as a library so appearing skew has an answer.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    group_cols: Sequence[str],
    sum_exprs: dict[str, Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase SUM/COUNT aggregation under a salted key.

    Phase 1 groups by (keys, salt) — the hot key's rows spread over
    ``salt_buckets`` tasks; phase 2 re-aggregates the (tiny) partials by the
    real keys.  Only algebraic aggregates (sum/count/min/max) decompose this
    way; the provided exprs must be sums/counts.

    The salt is a deterministic hash of a high-cardinality ordinal
    (monotonically_increasing_id), not rand(): retries/recomputes must land
    rows in the same bucket or partials double-count under task retry.
    """
    salted = df.withColumn(
        "_salt", (F.monotonically_increasing_id() % salt_buckets).cast("int")
    )
    partial = salted.groupBy(*group_cols, "_salt").agg(
        *[expr.alias(f"_p_{name}") for name, expr in sum_exprs.items()]
    )
    return partial.groupBy(*group_cols).agg(
        *[F.sum(f"_p_{name}").alias(name) for name in sum_exprs]
    )


def salted_join_hot_keys(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    hot_keys: Sequence,
    salt_buckets: int = 16,
) -> DataFrame:
    """Equi-join where a few known-hot fact keys are salted and the matching
    dim rows replicated across the salt space; cold keys join normally.

    Use when the dim side is too large to broadcast outright but hot-key
    rows overwhelm single join tasks.  Requires the hot key list (from
    profiling or a freq count); AQE handles unknown skew at runtime.
    """
    hot = set(hot_keys)
    hot_lit = F.array(*[F.lit(k) for k in hot])

    f_salted = facts.withColumn(
        "_salt",
        F.when(
            F.array_contains(hot_lit, F.col(key)),
            (F.monotonically_increasing_id() % salt_buckets).cast("int"),
        ).otherwise(F.lit(0)),
    )
    salt_space = facts.sparkSession.range(salt_buckets).select(
        F.col("id").cast("int").alias("_salt")
    )
    d_hot = (
        dim.filter(F.array_contains(hot_lit, F.col(key))).crossJoin(salt_space)
    )
    d_cold = dim.filter(~F.array_contains(hot_lit, F.col(key))).withColumn(
        "_salt", F.lit(0)
    )
    return f_salted.join(d_hot.unionByName(d_cold), [key, "_salt"]).drop("_salt")
