"""Scaling probe for the round-6 operators (sixth member of the DESIGN.md
"Measured scaling" family): replicate the sf0.1 realistic-vocabulary corpus
1x/4x/16x and measure wall time + output volume for

  - ngram_novelty            (gram-keyed min aggregate + join-back)
  - remove_self_repetition   (within-doc gram min + position excision)
  - cluster_safe_split_audit (components + certificate + leakage recheck
                              over production-dial MinHash pairs, fast_hash)
  - budget_cap_sample        (source-keyed ordered cumsum window)
  - minhash_estimate_vs_exact(production dial k=128/32, fast_hash —
                              sketch-accuracy report over confirmed pairs)

Per-copy distinctness is the ingest probe's: copy c rewrites each token
w -> w + "c<c>" so vocabularies are disjoint across copies — within-copy
structure replicates exactly, nothing matches across copies, true outputs
grow linearly, and the timings measure ENGINE cost, not output volume.

Run (solo, no other Spark JVM): python tools/probe_round6_scaling.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import bench
from procurement_system_bigdata_spark.functions import portable as P
from procurement_system_bigdata_spark.operators import clustering, dedup, sampling
from procurement_system_bigdata_spark.operators import text as text_ops
from procurement_system_bigdata_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ID_STRIDE = 35_000_000


def replicated(docs, n_copies: int):
    parts = [
        docs.select(
            (F.col("doc_id") + c * ID_STRIDE).alias("doc_id"),
            F.regexp_replace(F.col("text"), r"(\S+)", f"$1c{c}").alias("text"),
            "lang",
            "source",
        )
        for c in range(n_copies)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def timed_agg(make, value_col):
    """Time CONSTRUCTION + a value aggregate.  Two traps this avoids
    (memory of rounds past): a bare count() lets Catalyst eliminate
    left joins and everything behind them, and iterative operators
    (connected_components) do their looping work at construction time,
    outside a timer that only wraps the action."""
    t0 = time.perf_counter()
    df = make()
    row = df.agg(
        F.count(F.lit(1)).alias("n"), F.sum(value_col).alias("s")
    ).first()
    return round(time.perf_counter() - t0, 2), row.n


def main() -> None:
    spark = get_spark(app_name="round6-scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")
    base = bench._realvocab_docs(spark, SF_DIR).localCheckpoint()
    print(f"base corpus: {base.count()} docs from {SF_DIR}")

    for copies in (1, 4, 16):
        docs = replicated(base, copies).localCheckpoint()
        n_docs = docs.count()

        w_nov, n_nov = timed_agg(
            lambda: text_ops.ngram_novelty(docs), "n_novel"
        )
        w_rep, n_rep = timed_agg(
            lambda: dedup.remove_self_repetition(docs), "n_removed"
        )
        w_css, n_css = timed_agg(
            lambda: clustering.cluster_safe_split_audit(
                docs, dedup.minhash_lsh_pairs(docs, fast_hash=True)
            ),
            "degree",
        )
        w_bud, n_bud = timed_agg(
            lambda: sampling.budget_cap_sample(docs), "cum_tokens"
        )
        w_acc, n_acc = timed_agg(
            lambda: dedup.minhash_estimate_vs_exact(
                docs, k=P.MINHASH_K, n_bands=P.MINHASH_BANDS, fast_hash=True
            ),
            "k_eq",
        )
        print(
            f"copies={copies:>2} docs={n_docs:>6} | "
            f"novelty {w_nov:>7.2f}s/{n_nov} | "
            f"self_rep {w_rep:>7.2f}s/{n_rep} | "
            f"safe_split {w_css:>7.2f}s/{n_css} | "
            f"budget {w_bud:>6.2f}s/{n_bud} | "
            f"mh_accuracy {w_acc:>7.2f}s/{n_acc}",
            flush=True,
        )


if __name__ == "__main__":
    main()
