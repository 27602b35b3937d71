"""Versioned datasets: immutable numbered snapshots + an atomic latest
pointer — the minimal file-layout core of what a transactional table format
(Delta/Iceberg) provides, sized for the reproducibility need a training
pipeline actually has: *pin the exact dataset a run trained on*.

Layout:

    <root>/v=<N>/         immutable parquet snapshot (never rewritten)
    <root>/_latest        JSON {"version": N}, swapped atomically

Write protocol: the snapshot directory is fully written FIRST, then the
pointer is swapped via write-temp + os.replace (atomic on POSIX), so a
reader either sees the old latest or the new one — never a partial
snapshot.  A crash after the snapshot write but before the pointer swap
leaves an orphan v-dir that the next write simply supersedes (version
numbers come from scanning the dirs, not the pointer).

Readers pin with ``read_version(root, version=N)`` (training-run configs
record N); ``vacuum`` retains the newest K versions and never removes the
pointer target.  On a cluster, root must be shared storage and the
pointer swap inherits the storage's rename semantics (object stores want
a conditional-put here — the documented seam to a real table format).
"""
from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

_POINTER = "_latest"


def _versions(root: str) -> list[int]:
    if not os.path.isdir(root):
        return []
    return sorted(
        int(e.name.split("=", 1)[1])
        for e in os.scandir(root)
        if e.is_dir() and e.name.startswith("v=")
    )


def latest_version(root: str) -> int | None:
    p = os.path.join(root, _POINTER)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)["version"]


def write_version(df: DataFrame, root: str) -> int:
    """Write the next snapshot and atomically advance the latest pointer.
    Returns the new version number."""
    os.makedirs(root, exist_ok=True)
    vs = _versions(root)
    v = (vs[-1] + 1) if vs else 1
    dest = os.path.join(root, f"v={v}")
    df.write.mode("overwrite").parquet(dest)
    tmp = os.path.join(root, f".{_POINTER}.tmp")
    with open(tmp, "w") as f:
        json.dump({"version": v}, f)
    os.replace(tmp, os.path.join(root, _POINTER))
    return v


def read_version(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Latest snapshot, or the pinned ``version`` — the reproducibility
    contract: the same version always reads the same bytes."""
    if version is None:
        version = latest_version(root)
        if version is None:
            raise ValueError(f"no committed version at {root}")
    dest = os.path.join(root, f"v={version}")
    if not os.path.isdir(dest):
        raise ValueError(
            f"version {version} not found at {root}; have {_versions(root)}"
        )
    return spark.read.parquet(dest)


def list_versions(root: str) -> list[int]:
    return _versions(root)


def vacuum(root: str, keep_last: int = 3) -> list[int]:
    """Remove all but the newest ``keep_last`` versions; the pointer target
    is always retained.  Returns the removed version numbers."""
    vs = _versions(root)
    pinned = latest_version(root)
    keep = set(vs[-keep_last:]) if keep_last > 0 else set()
    if pinned is not None:
        keep.add(pinned)
    removed = []
    for v in vs:
        if v not in keep:
            shutil.rmtree(os.path.join(root, f"v={v}"))
            removed.append(v)
    return removed
