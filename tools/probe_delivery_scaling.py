"""Scaling probe for the round-5 delivery/tokenizer/span operators (fourth
member of the DESIGN.md "Measured scaling" family):

  - training_shards        (hash-shuffle sharding; per-shard window sort)
  - remove_shared_spans    (substring-dedup excision; inverted gram index)
  - learn_bpe              (8 merge rounds over the distinct-word table)

Same replication scheme as the ingest probe: copy c rewrites every token
w -> w + "c<c>" so copies are DISJOINT corpora — within-copy span sharing
replicates, nothing matches across copies, true outputs grow linearly and
the wall times measure engine cost.  learn_bpe's vocabulary grows with the
copies (each copy contributes its own token forms), which is exactly the
scale axis that matters for BPE (rounds are O(vocab), not O(corpus)).

Forced evaluation discipline (the count()-join-elimination lesson from the
ingest probe): every timing aggregates a COMPUTED column, never a bare
count over a unique-key left join.

Run (solo, no other Spark JVM): python tools/probe_delivery_scaling.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import bench
from procurement_system_bigdata_spark.operators import bpe, dedup, sharding
from procurement_system_bigdata_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ID_STRIDE = 35_000_000


def replicated(docs, n_copies: int):
    parts = []
    for c in range(n_copies):
        parts.append(
            docs.select(
                (F.col("doc_id") + c * ID_STRIDE).alias("doc_id"),
                F.regexp_replace(F.col("text"), r"(\S+)", f"$1c{c}").alias("text"),
                "lang",
                "source",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def main() -> None:
    spark = get_spark(app_name="delivery-scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")
    base = bench._realvocab_docs(spark, SF_DIR).localCheckpoint()
    print(f"base corpus: {base.count()} docs from {SF_DIR}")

    for copies in (1, 4, 16):
        docs = replicated(base, copies).localCheckpoint()
        n_docs = docs.count()

        t0 = time.perf_counter()
        sh = sharding.training_shards(docs, n_shards=32).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("pos").alias("pos_sum"),  # forces the window
        ).collect()[0]
        w_sh = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        sp = dedup.remove_shared_spans(docs).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_removed").alias("removed"),
            F.sum(F.length("clean_text")).alias("chars"),  # forces rebuild
        ).collect()[0]
        w_sp = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        merges = bpe.learn_bpe(docs, n_merges=8).collect()
        w_bpe = round(time.perf_counter() - t0, 2)

        print(
            f"copies={copies:2d} docs={n_docs:6d} | "
            f"training_shards {w_sh:6.2f}s rows={sh['n']:6d} | "
            f"span_removal {w_sp:7.2f}s removed={sp['removed']:8d} | "
            f"learn_bpe(8) {w_bpe:6.2f}s merges={len(merges)}"
        )

    spark.stop()


if __name__ == "__main__":
    main()
