"""media_decode scaling probe: 1x/10x/100x (sf0.01 / sf0.1 / sf1).

The decode audit is embarrassingly parallel (mapInPandas, zero shuffles
before the orderBy the registry adds for the oracle; this probe times the
UNORDERED operator the way production would run it), so wall should
scale ~linearly in rows once fixed JVM/Arrow costs amortize.  The
dominant per-row cost is the pure-Python baseline-JPEG Huffman decode
(1/3 of rows); PNG inflate and PPM parse are cheap.

Run solo:  python tools/probe_media_scaling.py
"""

from __future__ import annotations

import time
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

from procurement_system_bigdata_spark.catalog import load_table
from procurement_system_bigdata_spark.operators import multimodal

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "48g")
    # media synthesis+decode is CPU-dense per row on small-byte input:
    # split fine so all cores engage (DESIGN.md "Bytes-based splits")
    .config("spark.sql.files.maxPartitionBytes", "2m")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

for label, sf_dir in (
    ("sf0.01 (500 docs)", "/root/testdata/sf0.01"),
    ("sf0.1 (5k docs)", "/root/testdata/sf0.1"),
    ("sf1 (50k docs)", "/root/repo/testdata_sf1"),
):
    docs = load_table(spark, sf_dir, "documents")
    # ids-only repartition: the raw parquet is one tiny file -> one task;
    # a real 100 TB media corpus arrives in thousands of splits
    ids = docs.selectExpr("CAST(doc_id AS LONG) AS doc_id").repartition(32)
    media = multimodal.attach_synthetic_images(ids)
    t0 = time.perf_counter()
    out = multimodal.decode_images_audit(media)
    out.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    n = docs.count()
    print(f"{label:20s} wall={wall:7.2f}s  rows={n}  rows/s={n / wall:8.0f}")


# --- image-dedup family scaling (round-8 second wave) -------------------------
# Pairs are class-multiplicity-quadratic BY ANSWER (same-class cliques), so
# the engine-cost question is the banding join + verify, not output volume:
# time the full pipeline at 1x/10x/100x and report pairs/s alongside wall.

from procurement_system_bigdata_spark.operators import multimodal as mm

for label, sf_dir in (
    ("sf0.01 (500 docs)", "/root/testdata/sf0.01"),
    ("sf0.1 (5k docs)", "/root/testdata/sf0.1"),
    ("sf1 (50k docs)", "/root/repo/testdata_sf1"),
):
    docs = load_table(spark, sf_dir, "documents")
    media = mm.attach_pattern_images(docs.selectExpr("doc_id"))
    t0 = time.perf_counter()
    pairs = mm.image_neardup_pairs(media)
    pairs.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    n_pairs = pairs.count()
    print(
        f"image_neardup {label:18s} wall={wall:7.2f}s  pairs={n_pairs}  "
        f"pairs/s={n_pairs / wall:9.0f}"
    )


# --- audio-dedup family scaling (round-8 second wave) -------------------------

for label, sf_dir in (
    ("sf0.01 (500 docs)", "/root/testdata/sf0.01"),
    ("sf0.1 (5k docs)", "/root/testdata/sf0.1"),
    ("sf1 (50k docs)", "/root/repo/testdata_sf1"),
):
    docs = load_table(spark, sf_dir, "documents")
    media = mm.attach_fp_tones(docs.selectExpr("doc_id"))
    t0 = time.perf_counter()
    pairs = mm.audio_neardup_pairs(media)
    pairs.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    n_pairs = pairs.count()
    print(
        f"audio_neardup {label:18s} wall={wall:7.2f}s  pairs={n_pairs}  "
        f"pairs/s={n_pairs / wall:9.0f}"
    )
