"""Scaling probe for the edit-distance self-join (fifth member of the
DESIGN.md "Measured scaling" family).

Replication scheme: copy c PREPENDS three copy-specific characters inside
the 64-char key window, so every copy of a doc is Levenshtein distance 3
(> k=2) from every other copy — copies are disjoint fuzzy corpora, the
true pair volume grows LINEARLY with copies (each copy reproduces the base
corpus's internal near-dup pairs, shifted equally on both sides), and the
wall times measure engine cost, not output growth.

Forced evaluation discipline: timings aggregate computed columns
(sum of dist + count), never a bare count over a pruned join.

Run (solo, no other Spark JVM): python tools/probe_editdist_scaling.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from procurement_system_bigdata_spark.operators import editdist
from procurement_system_bigdata_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ID_STRIDE = 35_000_000


def replicated(docs, n_copies: int):
    # one distinct prepended letter per copy keeps every cross-copy pair at
    # distance exactly 3 (> k); past 26 copies the alphabet would wrap and
    # silently break the linear-pair-growth invariant the probe relies on
    assert n_copies <= 26, "copy prefixes must stay distinct (26 letters)"
    parts = []
    for c in range(n_copies):
        prefix = chr(ord("a") + c) * 3
        parts.append(
            docs.select(
                (F.col("doc_id") + c * ID_STRIDE).alias("doc_id"),
                F.concat(F.lit(prefix), F.col("text")).alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def main() -> None:
    spark = get_spark(app_name="editdist-scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")
    base = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .localCheckpoint()
    )
    print(f"base corpus: {base.count()} docs from {SF_DIR}")

    for copies in (1, 4, 16):
        docs = replicated(base, copies).localCheckpoint()
        n_docs = docs.count()

        t0 = time.perf_counter()
        agg = (
            editdist.edit_distance_pairs(docs, k=2, prefix_len=64)
            .agg(
                F.count(F.lit(1)).alias("n_pairs"),
                F.sum("dist").alias("dist_sum"),  # forces the verify column
            )
            .collect()[0]
        )
        wall = round(time.perf_counter() - t0, 2)
        print(
            f"copies={copies:2d} docs={n_docs:6d} | edit_distance_pairs "
            f"{wall:6.2f}s pairs={agg['n_pairs']:6d} dist_sum={agg['dist_sum']}"
        )

    spark.stop()


if __name__ == "__main__":
    main()
