"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in :mod:`procurement_system_bigdata_spark`; this module
only adapts the registry to the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from procurement_system_bigdata_spark.catalog import SMOKE_SF_DIR  # noqa: E402
from procurement_system_bigdata_spark.queries.registry import REGISTRY  # noqa: E402
from procurement_system_bigdata_spark.session import apply_runtime_confs  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (Q1 aggregate_orders) on /root/testdata/sf0.001."""
    apply_runtime_confs(spark)
    return REGISTRY["aggregate_orders"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_runtime_confs(spark)
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(spec.fn) for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted -> rows-only check)."""
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }


def production_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """The registry with documented production scale dials overlaid
    (registry.PRODUCTION_DIALS): approx percentile cutpoints, unordered
    sinks, fast hashing, anchor-sampled audits.  NOT part of the driver
    contract — the oracle gate runs ``queries()`` (the bit-exact dials);
    this view is how a production caller reaches the scale-safe paths
    without reading operator source."""
    from procurement_system_bigdata_spark.queries.registry import (
        production_queries as _pq,
    )

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_runtime_confs(spark)
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(fn) for name, fn in _pq().items()}
