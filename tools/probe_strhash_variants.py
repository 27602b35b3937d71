"""Micro-benchmark: candidate reformulations of the portable polynomial
char hash (functions/portable.spark_str_hash) against the per-char
interpreted aggregate it uses today.

The hash VALUES are pinned by every oracle mirror (DuckDB computes the
same fold), so only bit-identical reformulations are admissible; this
probe checks identity on the full sf0.1 word population AND times each
variant on the exploded word stream (noop sink, solo).

Usage: python tools/probe_strhash_variants.py  (run SOLO — timing)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from procurement_system_bigdata_spark.catalog import load_table  # noqa: E402
from procurement_system_bigdata_spark.functions import portable as P  # noqa: E402
from procurement_system_bigdata_spark.session import get_spark  # noqa: E402

B = 8  # chars per block

# 31^j for j in 0..B (exact, small), and 31^j mod P for the combine step
POW31 = [31**j for j in range(B + 1)]
POW31_MOD = [pow(31, j, P.HASH_P) for j in range(B + 1)]


def str_hash_block(col):
    """Block-folded polynomial hash, bit-identical to spark_str_hash:
    per 8-char block ONE interpreted lambda step whose body is plain
    codegen-able arithmetic over ascii(substring(...)) calls, instead of
    8 lambda steps.  Math: with L = chars in this block (8 except the
    tail), T = sum_{j<8} c_j * 31^(7-j) (absent chars read as ascii('')=0,
    so T = (true block value) * 31^(8-L)), the fold becomes
    acc' = (acc * (31^L mod P) + T div 31^(8-L)) mod P."""
    n = F.length(col)
    nblocks = F.ceil(n / F.lit(B)).cast("int")
    pow_mod = F.array(*[F.lit(v) for v in POW31_MOD])
    pow_div = F.array(*[F.lit(v) for v in POW31])

    def step(acc, i):
        off = i * F.lit(B)
        # chars off+1 .. off+B (1-indexed substring)
        t = None
        for j in range(B):
            term = F.ascii(F.substring(col, F.lit(1) + off + F.lit(j), 1)).cast(
                "long"
            ) * F.lit(POW31[B - 1 - j])
            t = term if t is None else t + term
        l_here = F.least(F.lit(B), n - off)  # 1..B
        scaled = F.element_at(pow_mod, (l_here + 1).cast("int"))
        tail_div = F.element_at(pow_div, (F.lit(B) - l_here + 1).cast("int"))
        return (acc * scaled + (t / tail_div).cast("long")) % F.lit(P.HASH_P)

    # split("", "") is [""] so the baseline folds ONE step with
    # ascii("") = 0: (seed * 31 + 0) % P — replicate that exactly
    return F.when(
        n == 0, F.lit((P.HASH_SEED * 31) % P.HASH_P).cast("long")
    ).otherwise(
        F.aggregate(
            F.sequence(F.lit(0), nblocks - 1),
            F.lit(P.HASH_SEED).cast("long"),
            step,
        )
    )


def main() -> None:
    spark = get_spark(app_name="probe-strhash")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(P.spark_words(P.spark_norm_text(F.col("text")))).alias("w")
        )
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint()
    )
    n = words.count()
    print(f"words: {n}")

    # identity check on every word (empty string included via lit probes)
    probe = words.select(
        P.spark_str_hash(F.col("w")).alias("a"),
        str_hash_block(F.col("w")).alias("b"),
    )
    bad = probe.filter(F.col("a") != F.col("b")).count()
    print(f"mismatches: {bad}")
    for s in ["", "a", "abcdefgh", "abcdefghi", "0" * 31, "z" * 64]:
        row = spark.range(1).select(
            P.spark_str_hash(F.lit(s)).alias("a"),
            str_hash_block(F.lit(s)).alias("b"),
        ).first()
        assert row.a == row.b, (s, row)
    print("edge cases ok")

    def timed(mk):
        best = float("inf")
        for _ in range(3):
            spark._jvm.System.gc()
            t0 = time.perf_counter()
            words.select(mk(F.col("w")).alias("h")).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        return round(best, 4)

    print("baseline per-char fold:", timed(P.spark_str_hash))
    print("block-8 fold:        ", timed(str_hash_block))
    print("xxhash64 (reference):", timed(lambda c: F.xxhash64(c)))


if __name__ == "__main__":
    main()
