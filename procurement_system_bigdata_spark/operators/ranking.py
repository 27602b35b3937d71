"""Scalable global sequence numbering (the W2 operator without the
single-partition window).

``ROW_NUMBER() OVER (ORDER BY ...)`` — the reference's PO-id minting pattern
(reference dags/pipeline.py:682-684) — forces every row through ONE
partition.  Fine for 348 purchase orders; a wall at billions of rows.  This
operator produces the identical numbering with a two-phase plan:

1. range-repartition by the sort key (parallel sort),
2. per-partition local row numbers (window partitioned BY partition id —
   parallel),
3. per-partition counts -> cumulative offsets (a driver-side prefix sum over
   ~#partitions integers — the only serial step, O(partitions) not O(rows)),
4. global_seq = local_rn + offset(partition).

The same technique backs zipWithIndex in the RDD world; here it stays in the
DataFrame API so Catalyst keeps optimizing around it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


SINGLE_PARTITION_MAX_ROWS = 1_000_000


def with_global_sequence(
    df: DataFrame,
    order_by: list[Column],
    seq_col: str = "seq",
    num_partitions: int | None = None,
    single_partition_max_rows: int = SINGLE_PARTITION_MAX_ROWS,
) -> DataFrame:
    """Add a 1-based global sequence column ordered by ``order_by`` without a
    single-partition sort of large data.  ``order_by`` must be a
    deterministic total order (include a unique tiebreaker) or the numbering
    is undefined — same contract as ROW_NUMBER itself (SURVEY §2.5).

    ADAPTIVE: the input is materialized (lazy localCheckpoint) either way,
    so its exact row count is one cheap job over cached blocks; below
    ``single_partition_max_rows`` the plain single-partition window is used
    (a one-task sort of bounded data beats the two-phase machinery's extra
    stages — the same size-based call AQE makes for joins), above it the
    two-phase range-sort numbering runs.  Both produce the identical
    sequence.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # repartitionByRange launches a SAMPLING JOB that executes the input
    # lineage once before the main job runs it again — on an expensive
    # upstream (joins + aggregates) the numbering would pay ~2x the subtree.
    # A lazy localCheckpoint makes the first pass (count below, or the range
    # sampler) the one that computes and caches the input; every later pass
    # reads the blocks.  Measured at sf0.1: supplier_orders 3.4-5.0s -> ~2.4s.
    df = df.localCheckpoint(eager=False)
    if df.count() <= single_partition_max_rows:
        w = Window.orderBy(*order_by)
        return df.withColumn(seq_col, F.row_number().over(w).cast("long"))
    parted = df.repartitionByRange(n, *order_by)
    w = Window.partitionBy("_pid").orderBy(*order_by)
    local = (
        parted.withColumn("_pid", F.spark_partition_id())
        .withColumn("_local_rn", F.row_number().over(w))
    )
    # Barrier: repartitionByRange SAMPLES its range boundaries, so two plan
    # branches over `parted` could see different partitionings.  A LAZY
    # localCheckpoint pins one materialization for both the counts branch
    # and the join (partitions are computed once on first use and all
    # readers hit the same blocks — the same mechanism persist relies on,
    # without eager's extra up-front job).  localCheckpoint (not .persist()):
    # CacheManager entries are never released without an explicit unpersist —
    # a leak across driver invocations — while checkpoint blocks are dropped
    # by the ContextCleaner as soon as the DataFrame goes out of scope.
    local = local.localCheckpoint(eager=False)
    counts = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    # prefix-sum over ~#partitions rows: the single-partition window here is
    # over partition COUNTS, not data rows — O(partitions), always tiny
    off_w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "_offset", F.coalesce(F.sum("_cnt").over(off_w), F.lit(0))
    ).select("_pid", "_offset")
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(seq_col, (F.col("_local_rn") + F.col("_offset")).cast("long"))
        .drop("_pid", "_local_rn", "_offset")
    )


def with_running_total(
    df: DataFrame,
    order_by: list[Column],
    value_col: str,
    total_col: str = "running_total",
    num_partitions: int | None = None,
    single_partition_max_rows: int = SINGLE_PARTITION_MAX_ROWS,
) -> DataFrame:
    """Add an inclusive running total of ``value_col`` in ``order_by``
    order — the prefix-sum sibling of :func:`with_global_sequence`, same
    adaptive strategy: a one-task ordered window below the size gate, and
    above it the two-phase composition (range partition → per-partition
    local cumsum → O(#partitions) offset prefix → broadcast offsets back).
    Both produce the identical totals.

    ``value_col`` must be an exact integer column (cents / micro-units —
    the repo's fixed-point discipline): a DOUBLE running total would be
    partitioning-dependent in the two-phase path.  ``order_by`` must be a
    deterministic total order (unique tiebreaker), as for ROW_NUMBER.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    df = df.localCheckpoint(eager=False)
    if df.count() <= single_partition_max_rows:
        w = Window.orderBy(*order_by).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        return df.withColumn(
            total_col, F.sum(value_col).over(w).cast("long")
        )
    parted = df.repartitionByRange(n, *order_by)
    w = Window.partitionBy("_pid").orderBy(*order_by).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    local = (
        parted.withColumn("_pid", F.spark_partition_id())
        .withColumn("_local_cum", F.sum(value_col).over(w))
    ).localCheckpoint(eager=False)  # pin ONE range partitioning (see above)
    totals = local.groupBy("_pid").agg(
        F.sum(value_col).alias("_psum")
    )
    off_w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "_offset", F.coalesce(F.sum("_psum").over(off_w), F.lit(0))
    ).select("_pid", "_offset")
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(
            total_col, (F.col("_local_cum") + F.col("_offset")).cast("long")
        )
        .drop("_pid", "_local_cum", "_offset")
    )
