"""Scaling probe for the round-5 ingest/LM operators (third member of the
DESIGN.md "Measured scaling" family, after the banding and embedding
probes): replicate the sf0.1 realistic-vocabulary corpus 1x/4x/16x and
measure wall time + output volume for

  - incremental_neardup_pairs  (new batch vs corpus MinHash index,
    production dial k=128/32, fast_hash)
  - bloom_decontaminate        (m sized at ~16 bits/bench-gram, k=4,
    fast_hash production dial)
  - bigram_backoff_scores      (stupid-backoff LM, src0-trained; timed via
    a value aggregate — a bare count() lets Catalyst eliminate the final
    unique-key left join and skip the LM entirely)

The first run of this probe caught two real bugs and one accounting
error (see DESIGN.md "Interpreted HOF lambdas"): the quadratic
shingle-lambda capture (91×), the near-monotone polynomial hash of
consecutive ids (via the training_shards test it prompted), and an
apples-to-oranges FP comparison — the probe originally compared the
per-GRAM Bloom formula to the measured per-DOC flag rate; the doc-level
prediction 1-(1-p_gram)^(mean grams/doc) matches measurement.

Per-copy distinctness: copy c rewrites every token w -> w + "c<c>"
(regexp, JVM-side), so each copy's vocabulary is DISJOINT from every
other's — within-copy dup/gram/bigram structure replicates exactly while
NOTHING matches across copies.  True outputs therefore grow linearly in
copies and the timings measure engine cost, not output volume (same
rationale as the Hadamard sign-flips of the embedding probe).

The Bloom probe also reports the measured false-positive rate at 1x
(bloom-flagged minus exact-flagged docs over clean docs) next to the
(1 - e^{-kB/m})^k prediction.

Run (solo, no other Spark JVM): python tools/probe_ingest_scaling.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import bench
from procurement_system_bigdata_spark.functions import portable as P
from procurement_system_bigdata_spark.operators import decontam, dedup
from procurement_system_bigdata_spark.operators import text as text_ops
from procurement_system_bigdata_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ID_STRIDE = 35_000_000  # multiple of 5 AND 7: copies keep their carve-out class


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


def timed_count(df):
    t0 = time.perf_counter()
    n = df.count()
    return round(time.perf_counter() - t0, 2), n


def carve(docs, mod: int):
    return (
        docs.filter(F.col("doc_id") % mod != 0),
        docs.filter(F.col("doc_id") % mod == 0),
    )


def next_pow2(n: int) -> int:
    m = 1
    while m < n:
        m <<= 1
    return m


def main() -> None:
    spark = get_spark(app_name="ingest-scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")
    base = bench._realvocab_docs(spark, SF_DIR).localCheckpoint()
    print(f"base corpus: {base.count()} docs from {SF_DIR}")

    for copies in (1, 4, 16):
        docs = replicated(base, copies).localCheckpoint()
        n_docs = docs.count()

        # new = the % mod == 0 slice, corpus = the rest — matching
        # queries/llmdata._incremental_split.  (A first version passed the
        # SAME slice as both sides, so the probe measured a corpus-vs-itself
        # self-join — every doc paired with itself at jaccard 1.0 — not
        # incremental ingest; caught in review.)
        corpus5, new = carve(docs, dedup.INCREMENTAL_NEW_MOD)
        w_inc, n_inc = timed_count(
            dedup.incremental_neardup_pairs(new, corpus5, fast_hash=True)
        )

        corpus7, bench7 = carve(docs, decontam.DECONTAM_BENCH_MOD)
        n_bench_grams = (
            bench7.select(
                F.explode(
                    F.array_distinct(
                        P.spark_word_shingles(
                            F.split(F.col("text"), " "), decontam.DECONTAM_NGRAM
                        )
                    )
                ).alias("g")
            )
            .distinct()
            .count()
        )
        m_bits = next_pow2(16 * n_bench_grams)
        bl = decontam.bloom_decontaminate(
            corpus7, bench7, n=decontam.DECONTAM_NGRAM, m_bits=m_bits,
            fast_hash=True,
        )
        t0 = time.perf_counter()
        agg = bl.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("flagged").cast("long")).alias("flagged"),
            F.avg("n_grams").alias("mean_grams"),
        ).collect()[0]
        w_bloom = round(time.perf_counter() - t0, 2)
        fp_note = ""
        if copies == 1:
            exact_flagged = (
                decontam.decontaminate(
                    corpus7, bench7, n=decontam.DECONTAM_NGRAM
                )
                .select("doc_id")
                .distinct()
                .count()
            )
            import math

            # measured rate is per DOC (any-gram-hits); predict at the same
            # level: p_doc = 1 - (1 - p_gram)^(mean distinct grams per doc)
            load = 4 * n_bench_grams / m_bits
            p_gram = (1 - math.exp(-load)) ** 4
            p_doc = 1 - (1 - p_gram) ** agg["mean_grams"]
            clean = agg["n"] - exact_flagged
            fp = (agg["flagged"] - exact_flagged) / clean if clean else 0.0
            fp_note = (
                f"  [exact_flagged={exact_flagged} fp_doc_measured={fp:.4f} "
                f"fp_doc_predicted={p_doc:.4f} (p_gram={p_gram:.6f}, "
                f"mean_grams={agg['mean_grams']:.1f}) m_bits={m_bits}]"
            )

        # force full evaluation: a bare count() lets Catalyst ELIMINATE the
        # final left join (aggregate right side has unique keys), skipping
        # the LM entirely — sum a computed column instead
        lm = text_ops.bigram_backoff_scores(docs)
        t0 = time.perf_counter()
        lm_agg = lm.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("mean_logscore").alias("s"),
        ).collect()[0]
        w_lm, n_lm = round(time.perf_counter() - t0, 2), lm_agg["n"]

        print(
            f"copies={copies:2d} docs={n_docs:6d} | "
            f"incremental_neardup {w_inc:7.2f}s pairs={n_inc:7d} | "
            f"bloom_decontam {w_bloom:6.2f}s flagged={agg['flagged']:6d}"
            f"{fp_note} | bigram_lm {w_lm:6.2f}s rows={n_lm:6d}"
        )

    spark.stop()


if __name__ == "__main__":
    main()
