"""Last-write-wins upsert store: a real Spark Python DataSource (DSv2).

The reference's S4 sink upserts snapshot rows into Cassandra, whose INSERT
is a last-write-wins write by primary key and write timestamp
(reference init-scripts/cassandra/init.cql:7-17, dags/pipeline.py:275-289).
The sandbox has no Cassandra cluster, so this module provides the CONTRACT
as a genuine Spark connector rather than a mock: ``LwwStoreDataSource``
registers with ``spark.dataSource.register`` and the write goes through
Spark's full DataSource resolution, task execution, and the two-phase
commit protocol (executor tasks stage part files and return
WriterCommitMessages; the driver's commit() publishes them, abort()
discards them) — the same seam the live spark-cassandra-connector plugs
into, so the upsert semantics are testable end-to-end with replayed keys.

Semantics mirrored from Cassandra:

* every write batch carries a ``writetime`` (CQL ``USING TIMESTAMP``);
  rows land in an append-only log, never read-modify-write;
* reads resolve one surviving row per primary key: highest writetime wins,
  ties broken by the lexically larger row digest (Cassandra breaks
  timestamp ties by comparing cell values) — so replaying a batch with the
  same writetime is idempotent: the resolved table state is unchanged;
* the log is compacted at READ time by a distributed window (one shuffle
  on the PK), which is exactly the shape a Cassandra compaction or a
  MERGE-on-read table format uses — scale-safe at any log length.

Storage is JSON-lines part files under ``<path>/<keyspace>/<table>/log``
plus a ``_meta.json`` recording schema and PK.  On a cluster the path must
be shared storage (HDFS/S3); tasks stage to ``_staging`` and only the
driver's commit makes files visible to readers.  Column types are
restricted to JSON-faithful atoms (string / integral / floating / boolean)
— the honest seam: a production store needs a binary codec, not json.
"""
from __future__ import annotations

import hashlib
import json
import os
import uuid
from dataclasses import dataclass
from typing import Iterator, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    BooleanType,
    ByteType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    Row,
    ShortType,
    StringType,
    StructField,
    StructType,
)

FORMAT_NAME = "lwwstore"
WRITETIME_COL = "__writetime"
DIGEST_COL = "__digest"

_JSON_SAFE = (
    StringType,
    LongType,
    IntegerType,
    ShortType,
    ByteType,
    DoubleType,
    FloatType,
    BooleanType,
)


def _table_dir(options) -> str:
    for k in ("path", "keyspace", "table"):
        if not options.get(k):
            raise ValueError(f"lwwstore requires option '{k}'")
    return os.path.join(options["path"], options["keyspace"], options["table"])


def _row_digest(payload: str) -> str:
    return hashlib.sha256(payload.encode()).hexdigest()


@dataclass
class _FilePartition(InputPartition):
    file_path: str


@dataclass
class _StagedFiles(WriterCommitMessage):
    paths: list


class _LwwWriter(DataSourceWriter):
    """Executor side stages a JSONL part file per task; only the driver's
    commit() publishes staged files into log/ (two-phase commit: a failed
    or speculative task's output is never visible)."""

    def __init__(self, options, schema: StructType):
        self.table_dir = _table_dir(options)
        if not options.get("writetime"):
            raise ValueError(
                "lwwstore write requires option 'writetime' (CQL USING "
                "TIMESTAMP equivalent) so replays are deterministic"
            )
        self.writetime = int(options["writetime"])
        self.pk = [c.strip() for c in options.get("pk", "").split(",") if c.strip()]
        self.schema = schema
        bad = [
            f.name
            for f in schema.fields
            if not isinstance(f.dataType, _JSON_SAFE)
        ]
        if bad:
            raise ValueError(
                f"lwwstore columns must be JSON-safe atoms; got {bad}"
            )
        meta_path = os.path.join(self.table_dir, "_meta.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            if not self.pk:
                self.pk = meta["pk"]
            if meta["pk"] != self.pk:
                raise ValueError(
                    f"pk mismatch: table has {meta['pk']}, write gave {self.pk}"
                )
            if meta["schema"] != schema.jsonValue():
                raise ValueError("schema mismatch with existing lwwstore table")
        if not self.pk:
            raise ValueError("lwwstore first write requires option 'pk'")
        missing = [c for c in self.pk if c not in schema.fieldNames()]
        if missing:
            raise ValueError(f"pk columns {missing} absent from dataframe")

    def write(self, iterator: Iterator[Row]) -> WriterCommitMessage:
        staging = os.path.join(self.table_dir, "_staging")
        os.makedirs(staging, exist_ok=True)
        path = os.path.join(staging, f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(path, "w") as f:
            for row in iterator:
                d = row.asDict()
                payload = json.dumps(
                    {k: d.get(k) for k in self.schema.fieldNames()},
                    sort_keys=True,
                )
                rec = json.loads(payload)
                rec[WRITETIME_COL] = self.writetime
                rec[DIGEST_COL] = _row_digest(payload)
                f.write(json.dumps(rec, sort_keys=True) + "\n")
                n += 1
        if n == 0:
            os.remove(path)
            return _StagedFiles(paths=[])
        return _StagedFiles(paths=[path])

    def commit(self, messages) -> None:
        log_dir = os.path.join(self.table_dir, "log")
        os.makedirs(log_dir, exist_ok=True)
        meta_path = os.path.join(self.table_dir, "_meta.json")
        if not os.path.exists(meta_path):
            with open(meta_path, "w") as f:
                json.dump(
                    {"pk": self.pk, "schema": self.schema.jsonValue()}, f
                )
        for m in messages:
            for p in m.paths:
                os.rename(p, os.path.join(log_dir, os.path.basename(p)))

    def abort(self, messages) -> None:
        for m in messages:
            for p in m.paths:
                if os.path.exists(p):
                    os.remove(p)


class _LwwReader(DataSourceReader):
    """Raw log reader: one input partition per committed part file, rows
    carry the bookkeeping columns; LWW resolution happens in DataFrame
    land (resolve_lww) so it stays a distributed window, not driver code."""

    def __init__(self, options, schema: StructType):
        self.table_dir = _table_dir(options)
        self.schema = schema

    def partitions(self):
        log_dir = os.path.join(self.table_dir, "log")
        if not os.path.isdir(log_dir):
            return [  # empty table: no partitions
            ]
        return [
            _FilePartition(os.path.join(log_dir, f))
            for f in sorted(os.listdir(log_dir))
            if f.startswith("part-")
        ]

    def read(self, partition: _FilePartition) -> Iterator[Tuple]:
        names = self.schema.fieldNames()
        with open(partition.file_path) as f:
            for line in f:
                rec = json.loads(line)
                yield tuple(rec.get(k) for k in names)


class LwwStoreDataSource(DataSource):
    """format("lwwstore"): see module docstring."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self):
        meta_path = os.path.join(_table_dir(self.options), "_meta.json")
        if not os.path.exists(meta_path):
            raise ValueError(
                f"lwwstore table at {_table_dir(self.options)} does not exist"
            )
        with open(meta_path) as f:
            data = StructType.fromJson(json.load(f)["schema"])
        return StructType(
            data.fields
            + [
                StructField(WRITETIME_COL, LongType()),
                StructField(DIGEST_COL, StringType()),
            ]
        )

    def reader(self, schema: StructType) -> DataSourceReader:
        return _LwwReader(self.options, schema)

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        if overwrite:
            raise ValueError(
                "lwwstore is append-only (Cassandra INSERT semantics); "
                "use mode('append')"
            )
        return _LwwWriter(self.options, schema)


def register(spark) -> None:
    spark.dataSource.register(LwwStoreDataSource)


def table_meta(root: str, keyspace: str, table: str) -> dict:
    with open(os.path.join(root, keyspace, table, "_meta.json")) as f:
        return json.load(f)


def read_lww_table(spark, root: str, keyspace: str, table: str):
    """The Cassandra-read equivalent: raw log scan + one window shuffle on
    the PK picking (max writetime, digest tie-break) — the merge-on-read
    shape, scale-safe for any log length."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    meta = table_meta(root, keyspace, table)
    raw = (
        spark.read.format(FORMAT_NAME)
        .option("path", root)
        .option("keyspace", keyspace)
        .option("table", table)
        .load()
    )
    w = Window.partitionBy(*meta["pk"]).orderBy(
        F.col(WRITETIME_COL).desc(), F.col(DIGEST_COL).desc()
    )
    return (
        raw.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", WRITETIME_COL, DIGEST_COL)
    )
