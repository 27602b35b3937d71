"""Reference-shaped sources: CSV facts, JSON array files, snapshot upserts.

Replaces the reference's ingestion stack (WebHDFS uploads S1, Python
JSON→CSV conversion S2/S3, per-row Cassandra inserts S4 — reference
dags/pipeline.py:175-183, :222-229, :269-289) with direct Spark reads; the
copy steps collapse into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas


def jdbc_scan_options(
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
) -> dict[str, str]:
    """The complete option map for an S8 JDBC scan — a pure function so the
    plumbing is contract-testable without a live database (the load path
    itself needs a JDBC driver jar + server)."""
    opts = {"url": url, "dbtable": table}
    if partition_column is not None:
        opts.update(
            partitionColumn=partition_column,
            numPartitions=str(num_partitions),
            lowerBound=str(lower_bound if lower_bound is not None else 0),
            upperBound=str(upper_bound if upper_bound is not None else 1),
        )
    opts.update({k: str(v) for k, v in options.items()})
    return opts


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
) -> DataFrame:
    """S8: JDBC master-data scan (the reference's Trino postgresql catalog,
    reference trino/etc/catalog/postgresql.properties:1-4, queried at
    pipeline.py:422-423 etc.).

    For the correctness harness all master data comes from parquet stand-ins
    (SURVEY §1.4); this is the production reader.  Filter/column pushdown to
    the database is automatic; ``partition_column`` bounds enable parallel
    range reads for large tables — dims this small are read in one partition
    and broadcast anyway.  LIVE-TESTED against embedded Derby (Spark ships
    the jar for its metastore): write -> read-back, 4-partition parallel
    range read, and predicate pushdown into the DB scan all asserted in
    tests/test_sources_sinks.py; other databases only need their driver jar
    on the classpath (spark.jars / --packages).
    """
    reader = spark.read.format("jdbc")
    for k, v in jdbc_scan_options(
        url, table, partition_column, num_partitions, lower_bound, upper_bound,
        **options,
    ).items():
        reader = reader.option(k, v)
    return reader.load()


def read_orders_csv(
    spark: SparkSession, path: str, permissive: bool = False
) -> DataFrame:
    """S7: header CSV read with the all-VARCHAR schema, then explicit CASTs
    (P2) — mirrors the Hive external table + query-time CAST semantics
    (reference pipeline.py:331-345, :410-418).

    Under Spark's ANSI mode a malformed numeric FAILS the query at cast
    time — the same surface as Trino, whose CAST failures the reference
    recorded in production (data/logs/exceptions/.../TYPE_MISMATCH).
    ``permissive=True`` switches to try_cast (malformed -> NULL) for
    salvage-what-you-can loads.
    """
    raw = spark.read.option("header", True).schema(schemas.ORDERS_RAW).csv(path)
    cast = (lambda c, t: F.col(c).try_cast(t)) if permissive else (
        lambda c, t: F.col(c).cast(t)
    )
    return raw.select(
        F.col("order_id"),
        cast("supplier_id", "long").alias("supplier_id"),
        cast("sku_id", "long").alias("sku_id"),
        cast("quantity", "long").alias("quantity"),
        cast("warehouse_id", "long").alias("warehouse_id"),
        F.col("order_date"),
    )


def read_json_array(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """S3: a whole-file JSON array of flat objects (stock.json /
    snapshot.json, reference generateData.py:183-191, :267-275)."""
    reader = spark.read.option("multiLine", True)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_stock_json(spark: SparkSession, path: str) -> DataFrame:
    """S2: stock.json → the 3-column stock relation (the reference converts
    to CSV purely as an HDFS staging step; the relation is what matters)."""
    return read_json_array(spark, path, schemas.STOCK).select(
        "warehouse_id", "sku_id", "current_stock"
    )


def read_snapshots_json(spark: SparkSession, path: str) -> DataFrame:
    """S3+S4: snapshot.json with Cassandra last-write-wins upsert semantics
    replayed as dedup on the PK ((sku_code), snapshot_date, warehouse_code)
    keeping the last occurrence (reference init.cql:15, pipeline.py:275-289:
    rows are inserted in file order, so the file's last duplicate wins).
    """
    raw = read_json_array(spark, path).select(
        "sku_code",
        F.col("snapshot_date").cast("date").alias("snapshot_date"),
        "warehouse_code",
        F.col("available_qty").cast("int").alias("available_qty"),
        F.col("reserved_qty").cast("int").alias("reserved_qty"),
    )
    # File order is the write order; monotonically_increasing_id preserves it
    # per-partition and the window picks the last write per PK.
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("sku_code", "snapshot_date", "warehouse_code")
        .orderBy(F.desc("_write_seq"))
    )
    return (
        raw.withColumn("_write_seq", F.monotonically_increasing_id())
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_write_seq", "_rn")
    )


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — the second columnar format big Hadoop estates standardize
    on; Spark's native reader gives the same pushdown/pruning guarantees as
    parquet (PushedFilters + ReadSchema, asserted in
    tests/test_sources_sinks.py).  No extra packages: ORC support is
    built into the Spark distribution."""
    return spark.read.orc(path)


def read_media_dir(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """Raw media ingest via Spark's ``binaryFile`` source: one row per file
    with (path, modificationTime, length, content) — the standard entry
    point for image/audio/video corpora, feeding operators/multimodal
    (content is the opaque binary column the codecs decode executor-side).

    Scale notes: the source parallelizes by file and honors
    ``pathGlobFilter``; partition sizing follows
    spark.sql.files.maxPartitionBytes, so millions of small media files
    want a compaction pass (or a manifest + binary payload table) rather
    than per-file rows — same operational fix as compact_parquet."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def compact_media_dir(spark: SparkSession, path: str, out: str, glob: str | None = None) -> int:
    """The many-small-media-files fix read_media_dir's docstring warns
    about: ingest a directory of raw media files ONCE into a parquet
    payload table (path, length, content) that scans at block granularity
    afterwards.  Returns the row count."""
    df = read_media_dir(spark, path, glob).select("path", "length", "content")
    df.write.mode("overwrite").parquet(out)
    return spark.read.parquet(out).count()
