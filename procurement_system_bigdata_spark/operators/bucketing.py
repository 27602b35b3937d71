"""Bucketed storage layout: pay the shuffle once at write time, then join
and aggregate on the bucket key with zero exchanges forever after.

At 100 TB the dominant cost of a fact-fact join (lineitem ⋈ orders on
orderkey, events self-joins, dedup-pair joins) is shuffling both sides.
Writing both tables bucketed by the join key with the same bucket count
co-locates matching keys in same-numbered bucket files, so Catalyst plans
SortMergeJoin over the bucketed scans with NO Exchange; aggregations whose
grouping keys cover the bucket key skip their shuffle the same way.

The reference itself has no fact-fact joins (SURVEY §2.3 — every join has a
broadcast-sized dimension side), so this is pure scale-path infrastructure:
the layout a recurring daily pipeline (reference dags/pipeline.py:813-885)
should write its facts in, given every downstream query re-joins them.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    num_buckets: int,
    path: str,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Write ``df`` as a bucketed (+ per-bucket sorted) external parquet table.

    Bucketing metadata lives in the session catalog, so readers must go
    through ``spark.table(name)`` — a raw ``spark.read.parquet(path)`` sees
    the same rows but loses the co-location guarantee.  Sorting by the
    bucket key lets the join skip per-bucket sorts when bucket files are
    read one-per-task.
    """
    (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(num_buckets, *keys)
        .sortBy(*(sort_cols or keys))
        .saveAsTable(table)
    )


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
    force_sort_merge: bool = False,
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket key — plans a
    SortMergeJoin with no Exchange on either side.

    ``force_sort_merge`` applies the MERGE join hint: at test scale one side
    is under the broadcast threshold and Catalyst would (correctly) broadcast
    it, hiding the co-location this operator exists to prove; at 100 TB
    neither side broadcasts and the hint is unnecessary.
    """
    left = spark.table(left_table)
    right = spark.table(right_table)
    if force_sort_merge:
        left, right = left.hint("merge"), right.hint("merge")
    return left.join(right, list(on), how)
