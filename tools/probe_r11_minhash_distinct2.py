"""Round-11 probe #2: the K=128 duplicate-heavy case + the wide-distinct
Exchange removal.

Probe #1 showed none/distinct/arraydistinct within noise on the realvocab
corpus (no within-doc duplicate tokens) and on the oracle-dial toy corpus
(duplicates, but K=6 so the per-duplicate affine cost is tiny).  The case
that can actually pay for duplicates is K=128 signatures over the
duplicate-heavy raw corpus — the production-profile dedup_minhash_lsh row
(53.8 s at sf0.1).

Also measures ngram_jaccard_pairs with the row-level `.distinct()`
replaced by per-row F.array_distinct on the token array (identical
because the dedup key (doc_id, md5(t)) makes global distinct == per-doc
distinct and md5 is collision-free) — one Exchange removed.

Usage: python tools/probe_r11_minhash_distinct2.py [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from procurement_system_bigdata_spark.catalog import load_table  # noqa: E402
from procurement_system_bigdata_spark.functions import portable as P  # noqa: E402
from procurement_system_bigdata_spark.operators import dedup  # noqa: E402
from procurement_system_bigdata_spark.session import get_spark  # noqa: E402

ORIG_BOTH = dedup._doc_token_hashes_both
ORIG_TOK = dedup._doc_token_hashes


def both_none(docs, shingle_n, fast_hash=False):
    return ORIG_BOTH(docs, shingle_n, fast_hash)


def both_arraydistinct(docs, shingle_n, fast_hash=False):
    words = P.spark_words(P.spark_norm_text(F.col("text")))
    tokens = words if shingle_n == 1 else P.spark_word_shingles(words, shingle_n)
    tokens = F.array_distinct(tokens)
    if fast_hash:
        h = F.pmod(F.xxhash64(F.col("t")), F.lit(P.HASH_P))
    else:
        h = P.spark_str_hash(F.col("t"))
    return (
        docs.select(F.col("doc_id").cast("long").alias("doc_id"), tokens.alias("tok"))
        .select("doc_id", F.explode("tok").alias("t"))
        .select("doc_id", h.alias("h"), F.md5(F.col("t")).alias("hw"))
    )


def tok_arraydistinct(docs, shingle_n, fast_hash=False, wide=False, distinct=True):
    words = P.spark_words(P.spark_norm_text(F.col("text")))
    tokens = words if shingle_n == 1 else P.spark_word_shingles(words, shingle_n)
    if distinct and wide:
        tokens = F.array_distinct(tokens)
    if wide:
        h = F.md5(F.col("t"))
    elif fast_hash:
        h = F.pmod(F.xxhash64(F.col("t")), F.lit(P.HASH_P))
    else:
        h = P.spark_str_hash(F.col("t"))
    out = (
        docs.select(F.col("doc_id").cast("long").alias("doc_id"), tokens.alias("tok"))
        .select("doc_id", F.explode("tok").alias("t"))
        .select("doc_id", h.alias("h"))
    )
    return out.distinct() if (distinct and not wide) else out


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="probe-r11-minhash-distinct2")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")

    def prod_toy(variant_fn):
        dedup._doc_token_hashes_both = variant_fn
        try:
            return dedup.minhash_lsh_pairs(docs, fast_hash=True)
        finally:
            dedup._doc_token_hashes_both = ORIG_BOTH

    def ngram(variant_fn):
        dedup._doc_token_hashes = variant_fn
        try:
            return dedup.ngram_jaccard_pairs(docs)
        finally:
            dedup._doc_token_hashes = ORIG_TOK

    workloads = {
        "prod_dial_toy": (prod_toy, {"none": both_none, "arraydistinct": both_arraydistinct}),
        "ngram_jaccard": (ngram, {"distinct": ORIG_TOK, "arraydistinct": tok_arraydistinct}),
    }

    for wname, (maker, variants) in workloads.items():
        stats = {}
        for vname, vfn in variants.items():
            row = (
                maker(vfn)
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.round(F.sum("jaccard"), 6).alias("sj"),
                )
                .collect()[0]
            )
            stats[vname] = (row["n"], row["sj"])
        vals = set(stats.values())
        print(f"equivalence[{wname}]: {stats} -> {'OK' if len(vals) == 1 else 'MISMATCH'}", flush=True)
        if len(vals) != 1:
            raise SystemExit(f"variant outputs differ on {wname}: {stats}")

    times = {w: {v: [] for v in vs} for w, (_, vs) in workloads.items()}
    for _ in range(rounds):
        for wname, (maker, variants) in workloads.items():
            for vname, vfn in variants.items():
                spark._jvm.System.gc()
                t0 = time.perf_counter()
                maker(vfn).write.format("noop").mode("overwrite").save()
                times[wname][vname].append(round(time.perf_counter() - t0, 4))

    import json
    import statistics

    out = {
        w: {
            v: {"median": round(statistics.median(r), 4), "runs": r}
            for v, r in per.items()
        }
        for w, per in times.items()
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
