"""SparkSession construction and scale-oriented runtime configuration.

The reference delegates execution to a single Trino 435 coordinator capped at
2 GB query memory (reference: trino/etc/config.properties:1-6).  Here Catalyst
+ Tungsten replace Trino; the configs below are chosen so the same logical
plans survive a 1000-executor / 100 TB deployment:

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting and
  dynamic join-strategy switching replace hand-tuned partition counts.
- Broadcast threshold raised: every reference dimension (products=40,
  warehouses=10, suppliers=35, supplier_products=70 rows — reference
  init-scripts/postgres/init.sql) is broadcast-sized; at 100 TB the fact
  side never needs to shuffle for these joins.
- UTC session timezone: the reference stores ISO dates as naive strings
  (reference dags/pipeline.py:171); pinning the tz keeps date semantics
  identical across driver, executors and the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable SQL confs applied both at build time and to externally
# provided sessions (the correctness driver owns its own SparkSession).
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Dimensions up to 64 MiB are broadcast; facts never shuffle for dim joins.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Read tz-less parquet timestamps as TIMESTAMP (LTZ, session tz pinned to
    # UTC above), not TIMESTAMP_NTZ: watermarks/windows require LTZ event
    # time, and the DuckDB oracle compares naive-as-UTC either way.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # Whole-stage codegen silently disables above 100 operator fields; the
    # production MinHash signature aggregate carries K=128 min() columns
    # and was measured running INTERPRETED under the default (1 codegen
    # span vs 2 with the raised cap, AQE off; tests/test_plan_quality.py
    # pins it).  200 covers K=128 plus keys with headroom while staying
    # far below Janino method-size trouble (codegen falls back safely
    # regardless).
    "spark.sql.codegen.maxFields": "200",
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an existing session (idempotent).

    Used when the session is owned by someone else (the correctness driver);
    only touches confs that Spark allows changing after startup.
    """
    for key, value in RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            pass  # non-runtime-settable under this deployment; keep going
    return spark


def get_spark(
    app_name: str = "procurement-system-bigdata-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    local[N] for tests/bench; on a real cluster the master/resource configs
    come from spark-submit and everything here still applies.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
    )
    for key, value in RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    return apply_runtime_confs(spark)
