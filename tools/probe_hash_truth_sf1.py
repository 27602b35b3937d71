"""Second-dial TRUTH checks for the surviving narrow-hash families
(round-8 judge ask #4).

Cross-engine hash-matching proves both engines AGREE, not that the answer
is TRUE: the round-7 exact_substring fix came from two Spark dials
disagreeing, not from the oracle (Spark and DuckDB computed the same
wrong 31-bit keys).  The same blind spot exists wherever a narrow hash
legitimately survives — as a *mechanism* (split buckets, CMS/Bloom
positions, LSH bands) rather than an equality key.  This probe applies
the dial-disagreement technique once per family: recompute the family's
DISTRIBUTIONAL INVARIANT under an independent hash (xxhash64 or a
disjoint affine family) and compare both dials' measurements against the
documented bound.  A biased or correlated hash would shift the invariant
on one dial but not the other; both dials inside the bound is evidence
the portable fold behaves like the uniform hash the bounds assume.

Families covered (bounds in parentheses):
  1. train/val/test split fractions  (binomial 4-sigma around 80/10/10)
  2. CMS bucket balance on distinct gram hashes (multinomial max-load)
  3. CMS point-estimate overestimate (<= 2N/width per row w.p. 1/2,
     all-depth miss prob 2^-depth -> compare vs 2N/width)
  4. Bloom gram-level FP rate ((1 - e^{-kn/m})^k with the real n)

Run (solo, ~3-4 min):
  PYSPARK_SUBMIT_ARGS="--driver-memory 48g --master local[32] pyspark-shell" \
  python tools/probe_hash_truth_sf1.py
Uses testdata_sf1 (toy vocab; split + bloom) and testdata_sf1_realvocab
(CMS families need a realistic vocabulary; regenerate both with
tools/gen_sf1.py [--vocab=real]).
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from procurement_system_bigdata_spark.functions import portable as P
from procurement_system_bigdata_spark.operators import decontam, sampling, sketches

SF1 = "/root/repo/testdata_sf1"
SF1_REAL = "/root/repo/testdata_sf1_realvocab"

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "48g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

rows = []


def report(family, dial, measured, bound, ok, note=""):
    rows.append((family, dial, measured, bound, ok, note))
    print(f"{family:28s} {dial:22s} measured={measured:<12} bound={bound:<12} "
          f"{'PASS' if ok else 'FAIL'} {note}")


# --- 1. split fractions ------------------------------------------------------

docs = spark.read.parquet(f"{SF1}/documents.parquet")
n_docs = docs.count()
targets = {"train": 0.80, "val": 0.10, "test": 0.10}

for dial, bucket in (
    ("portable-31fold", P.spark_str_hash(F.col("doc_id").cast("string")) % 100),
    ("xxhash64-indep", F.pmod(F.xxhash64(F.col("doc_id").cast("string")), F.lit(100))),
):
    split = docs.select(
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").alias("s")
    )
    counts = {r["s"]: r["n"] for r in split.groupBy("s").agg(F.count("*").alias("n")).collect()}
    worst = 0.0
    for s, p in targets.items():
        frac = counts.get(s, 0) / n_docs
        sigma = math.sqrt(p * (1 - p) / n_docs)
        worst = max(worst, abs(frac - p) / sigma)
    report(
        "split-fractions", dial, f"{worst:.2f}sigma", "4.00sigma", worst <= 4.0,
        f"n={n_docs}",
    )

# --- 2. CMS bucket balance on DISTINCT gram hashes ---------------------------

rdocs = spark.read.parquet(f"{SF1_REAL}/documents.parquet")
words = P.spark_words(P.spark_norm_text(F.col("text")))
distinct_h = (
    rdocs.select(F.explode(words).alias("w"))
    .filter(F.col("w") != "")
    .select(P.spark_str_hash(F.col("w")).alias("h"))
    .distinct()
    .localCheckpoint()
)
n_distinct = distinct_h.count()
width = sketches.CMS_WIDTH
mean_load = n_distinct / width
# multinomial max-load: mean + 5*sqrt(mean) is a comfortable uniform bound
# at these cell counts (Poisson tail at 5 sigma ~ 3e-7 * 512 cells)
load_bound = mean_load + 5.0 * math.sqrt(mean_load)

for dial, offset in (
    ("default-family", sketches.CMS_SEED_OFFSET),
    ("indep-family-2^21", 1 << 21),
):
    a, b = P.minhash_params(1, offset=offset)
    buckets = distinct_h.select(
        ((F.lit(a[0]) * F.col("h") + F.lit(b[0])) % P.HASH_P % width).alias("bkt")
    )
    max_load = (
        buckets.groupBy("bkt").agg(F.count("*").alias("n"))
        .agg(F.max("n")).collect()[0][0]
    )
    report(
        "cms-bucket-balance", dial, f"max={max_load}", f"{load_bound:.0f}",
        max_load <= load_bound, f"mean={mean_load:.0f} width={width}",
    )

# --- 3. CMS point-estimate overestimate --------------------------------------

tok_occ = (
    rdocs.select(F.explode(words).alias("w"))
    .filter(F.col("w") != "")
    .localCheckpoint()
)
N_total = tok_occ.count()
exact_counts = (
    tok_occ.groupBy("w").agg(F.count("*").alias("exact"))
    .orderBy(F.desc("exact"))
    .limit(50)
    .localCheckpoint()
)
err_bound = 2.0 * N_total / width

for dial, offset in (
    ("default-family", sketches.CMS_SEED_OFFSET),
    ("indep-family-2^21", 1 << 21),
):
    a, b = P.minhash_params(sketches.CMS_DEPTH, offset=offset)
    h = P.spark_str_hash(F.col("w"))
    cells = tok_occ.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("hash_idx"),
                    ((F.lit(a[i]) * h + F.lit(b[i])) % P.HASH_P % width).alias("bucket"),
                )
                for i in range(sketches.CMS_DEPTH)
            ])
        ).alias("c")
    ).select("c.hash_idx", "c.bucket")
    grid = cells.groupBy("hash_idx", "bucket").agg(F.count("*").alias("cnt"))
    qh = P.spark_str_hash(F.col("w"))
    q = exact_counts.select(
        "w", "exact",
        *[
            ((F.lit(a[i]) * qh + F.lit(b[i])) % P.HASH_P % width).alias(f"b{i}")
            for i in range(sketches.CMS_DEPTH)
        ],
    )
    est = q
    for i in range(sketches.CMS_DEPTH):
        g = grid.filter(F.col("hash_idx") == i).select(
            F.col("bucket").alias(f"b{i}"), F.col("cnt").alias(f"c{i}")
        )
        est = est.join(g, f"b{i}", "left")
    est = est.select(
        "w", "exact",
        F.least(*[F.coalesce(F.col(f"c{i}"), F.lit(0)) for i in range(sketches.CMS_DEPTH)]).alias("est"),
    )
    max_over = est.agg(F.max(F.col("est") - F.col("exact"))).collect()[0][0]
    under = est.filter(F.col("est") < F.col("exact")).count()
    report(
        "cms-overestimate", dial, f"max={max_over}", f"{err_bound:.0f}",
        max_over <= err_bound and under == 0,
        f"N={N_total} never-under={under == 0}",
    )

# --- 4. Bloom: FN at saturation + calibrated FP vs formula -------------------
# Two regimes, because one corpus can't measure both:
#   a) toy-vocab sf1 carve (the registry query's own shape): ~30k inserted
#      grams nearly saturate m=2^15 bits AND almost every corpus gram IS a
#      true benchmark gram — so the meaningful invariant there is the
#      superset guarantee (zero false negatives over ~30k true hits), not
#      the FP rate (≈1 negative exists to measure it on).
#   b) realvocab corpus with a SMALL benchmark slice sized for kn/m ≈ 0.5,
#      where the formula predicts a mid-range FP ≈ 2-3% and the disjoint
#      group structure supplies ~2.7M TRUE negatives — a real test of the
#      Kirsch-Mitzenmacher double-hash independence assumption under both
#      dials (measured must track (1-e^{-kn/m})^k, not just sit under a
#      saturated bound).

mod = decontam.DECONTAM_BENCH_MOD
n_gram = decontam.DECONTAM_NGRAM
m_bits, k_hashes = decontam.BLOOM_M_BITS, decontam.BLOOM_K


def gram_set(df):
    w = P.spark_words(P.spark_norm_text(F.col("text")))
    return (
        df.select(F.explode(F.array_distinct(P.spark_word_shingles(w, n_gram))).alias("g"))
        .distinct()
    )


def bloom_measure(corpus_g, bench_g, dial):
    if dial == "portable":
        h_e = P.spark_str_hash(F.col("g"))
        hs_e = P.spark_str_hash2(F.col("g"))
    else:
        h_e = F.pmod(F.xxhash64(F.col("g")), F.lit(P.HASH_P))
        hs_e = F.pmod(
            F.xxhash64(F.lit(decontam._BLOOM_STRIDE_SALT), F.col("g")), F.lit(P.HASH_P)
        )
    bits = (
        bench_g.select(h_e.alias("h"), hs_e.alias("hs"))
        .select(F.explode(decontam._bloom_positions(F.col("h"), F.col("hs"), m_bits, k_hashes)).alias("bit"))
        .distinct()
    )
    probe = (
        corpus_g.select("g", h_e.alias("h"), hs_e.alias("hs"))
        .select("g", F.explode(decontam._bloom_positions(F.col("h"), F.col("hs"), m_bits, k_hashes)).alias("bit"))
    )
    flagged = (
        probe.join(F.broadcast(bits), "bit")
        .groupBy("g").agg(F.count("*").alias("n_set"))
        .filter(F.col("n_set") == k_hashes)
        .select("g")
        .localCheckpoint()
    )
    n_flagged = flagged.count()
    n_true = flagged.join(bench_g, "g").count()
    n_probed = corpus_g.count()
    n_true_total = corpus_g.join(bench_g, "g").count()
    return n_flagged, n_true, n_probed, n_true_total


# 4a: toy carve — superset guarantee at saturation
tdocs = spark.read.parquet(f"{SF1}/documents.parquet")
toy_corpus_g = gram_set(tdocs.filter(F.col("doc_id") % mod != 0)).localCheckpoint()
toy_bench_g = gram_set(tdocs.filter(F.col("doc_id") % mod == 0)).localCheckpoint()
n_ins_toy = toy_bench_g.count()
for dial in ("portable", "xxhash64"):
    n_flagged, n_true, n_probed, n_true_total = bloom_measure(
        toy_corpus_g, toy_bench_g, dial
    )
    fn = n_true_total - n_true
    report(
        "bloom-fn-at-saturation", dial, f"FN={fn}", "0",
        fn == 0,
        f"n_ins={n_ins_toy} true_hits={n_true_total} (toy vocab, filter "
        f"saturated — FP unmeasurable here: {n_probed - n_true_total} negatives)",
    )

# 4b: realvocab, calibrated load — measured FP must TRACK the formula
target_load = 0.5  # kn/m
n_target = int(target_load * m_bits / k_hashes)  # ~4096 grams
# deterministic benchmark slice: smallest doc_ids with %7==0 until the
# gram budget is met (realvocab grams ~53/doc -> ~78 docs)
slice_docs = int(n_target / 50)
real_bench = rdocs.filter(
    (F.col("doc_id") % mod == 0) & (F.col("doc_id") < slice_docs * mod)
)
real_corpus = rdocs.filter(F.col("doc_id") % mod != 0)
rb_g = gram_set(real_bench).localCheckpoint()
rc_g = gram_set(real_corpus).localCheckpoint()
n_ins = rb_g.count()
fp_formula = (1.0 - math.exp(-k_hashes * n_ins / m_bits)) ** k_hashes
for dial in ("portable", "xxhash64"):
    n_flagged, n_true, n_probed, n_true_total = bloom_measure(rc_g, rb_g, dial)
    fn = n_true_total - n_true
    neg = n_probed - n_true_total
    fp_rate = (n_flagged - n_true) / neg if neg else 0.0
    # tracking band: binomial noise on ~2.7M negatives is tiny; the band is
    # dominated by the formula's own approximation (+-30%)
    ok = fn == 0 and 0.7 * fp_formula <= fp_rate <= 1.3 * fp_formula
    report(
        "bloom-fp-vs-formula", dial, f"{fp_rate:.4f}", f"{fp_formula:.4f}",
        ok,
        f"n_ins={n_ins} negatives={neg} FN={fn}",
    )

print()
n_fail = sum(1 for r in rows if not r[4])
print(f"families checked: 5, dial-checks: {len(rows)}, failures: {n_fail}")
sys.exit(1 if n_fail else 0)
