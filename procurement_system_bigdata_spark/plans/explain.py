"""Physical-plan inspection helpers.

Used by tests and tuning sessions to assert that the plans Catalyst picks
are the ones that survive 100 TB: dimension joins broadcast (no sort-merge
shuffle of the fact side), predicates reach the parquet scan (PushedFilters),
scans read only the referenced columns (ReadSchema pruning), and global
top-k compiles to TakeOrderedAndProject rather than a full sort.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return qe.explainString(mode)


def plan_stats(df: DataFrame) -> dict:
    plan = formatted_plan(df)
    # formatted mode lists every operator once as "(<id>) <NodeName>" in the
    # detail section — count nodes there (the tree rendering would double-count)
    nodes = re.findall(r"^\((\d+)\) ([A-Za-z]+)", plan, re.M)
    node_names = [n for _, n in nodes]
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    read_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    return {
        "broadcast_hash_joins": node_names.count("BroadcastHashJoin"),
        "sort_merge_joins": node_names.count("SortMergeJoin"),
        # formatted mode renders exchanges as "(n) Exchange" with the
        # partitioning spec on a following "Arguments:" line
        "shuffles": node_names.count("Exchange"),
        "single_partition_exchanges": len(
            re.findall(r"Arguments: SinglePartition", plan)
        ),
        "take_ordered": node_names.count("TakeOrderedAndProject"),
        "pushed_filters": [p for p in pushed if p.strip()],
        "read_schemas": read_schemas,
        "python_udfs": node_names.count("BatchEvalPython")
        + node_names.count("ArrowEvalPython"),
        "plan": plan,
    }


def assert_scale_safe(
    df: DataFrame,
    *,
    max_sort_merge_joins: int = 0,
    require_pushed_filter: str | None = None,
    forbid_python_udfs: bool = True,
) -> dict:
    """Raise if the physical plan violates the scale contract."""
    stats = plan_stats(df)
    if stats["sort_merge_joins"] > max_sort_merge_joins:
        raise AssertionError(
            f"{stats['sort_merge_joins']} sort-merge joins (max "
            f"{max_sort_merge_joins}) — a dimension join lost its broadcast:\n"
            + stats["plan"][:4000]
        )
    if require_pushed_filter and not any(
        require_pushed_filter in p for p in stats["pushed_filters"]
    ):
        raise AssertionError(
            f"expected pushed filter on {require_pushed_filter!r}; got "
            f"{stats['pushed_filters']}"
        )
    if forbid_python_udfs and stats["python_udfs"]:
        raise AssertionError("Python UDF in a hot path — breaks codegen")
    return stats
