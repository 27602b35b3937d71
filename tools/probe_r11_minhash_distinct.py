"""Round-11 probe: resolve the minhash token-dedup regression (VERDICT #1).

Round 10 removed the `.distinct()` from `_doc_token_hashes_both` (the
(doc_id, h, hw) token table feeding minhash signatures + confirm sets).
The round-10 A/B showed minhash_prod_realvocab REGRESSING 17% (5.19 ->
6.09 s) with the removal, contradicting OPTIMIZATION_r10.md's claim.

Three variants, measured alternating in ONE session, best-of-N each:

- none          (round-10 head): raw exploded token rows, no dedup
- distinct      (round-9):      .distinct() on (doc_id, h, hw) — an extra
                                 Exchange + hash-dedup pass
- arraydistinct (candidate):    F.array_distinct on the token ARRAY before
                                 the explode — per-row dedup, NO Exchange.
                                 Semantically identical to `distinct`:
                                 the dedup key (doc_id, h, hw) has doc_id
                                 in it, so global distinct == per-doc
                                 distinct, and hw = md5(t) is collision-
                                 free, so distinct rows == distinct tokens.

Workloads: minhash_prod_realvocab (prod dial, realvocab corpus — the
regressed bench query) and dedup_minhash_lsh (oracle dial, toy corpus).

Usage: python tools/probe_r11_minhash_distinct.py [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from procurement_system_bigdata_spark.functions import portable as P  # noqa: E402
from procurement_system_bigdata_spark.operators import dedup  # noqa: E402
from procurement_system_bigdata_spark.session import get_spark  # noqa: E402

ORIG_BOTH = dedup._doc_token_hashes_both


def both_none(docs, shingle_n, fast_hash=False):
    return ORIG_BOTH(docs, shingle_n, fast_hash)


def both_distinct(docs, shingle_n, fast_hash=False):
    return ORIG_BOTH(docs, shingle_n, fast_hash).distinct()


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


VARIANTS = {
    "none": both_none,
    "distinct": both_distinct,
    "arraydistinct": both_arraydistinct,
}


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="probe-r11-minhash-distinct")
    spark.sparkContext.setLogLevel("ERROR")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    from procurement_system_bigdata_spark.catalog import load_table

    def prod_realvocab(variant_fn):
        dedup._doc_token_hashes_both = variant_fn
        try:
            return dedup.minhash_lsh_pairs(
                bench._realvocab_docs(spark, sf_dir), fast_hash=True
            )
        finally:
            dedup._doc_token_hashes_both = ORIG_BOTH

    def oracle_toy(variant_fn):
        dedup._doc_token_hashes_both = variant_fn
        try:
            return dedup.minhash_lsh_pairs(
                load_table(spark, sf_dir, "documents"),
                k=P.MINHASH_K_ORACLE,
                n_bands=P.MINHASH_BANDS_ORACLE,
            )
        finally:
            dedup._doc_token_hashes_both = ORIG_BOTH

    workloads = {"prod_realvocab": prod_realvocab, "oracle_toy": oracle_toy}

    # warm-up + equivalence check (counts + jaccard sum must agree)
    for wname, maker in workloads.items():
        stats = {}
        for vname, vfn in VARIANTS.items():
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
        print(f"equivalence[{wname}]: {stats} -> {'OK' if len(vals) == 1 else 'MISMATCH'}")
        if len(vals) != 1:
            raise SystemExit(f"variant outputs differ on {wname}: {stats}")

    times: dict[str, dict[str, list[float]]] = {
        w: {v: [] for v in VARIANTS} for w in workloads
    }
    for _ in range(rounds):
        for wname, maker in workloads.items():
            for vname, vfn in VARIANTS.items():
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
