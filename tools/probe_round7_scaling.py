"""Scaling probe for the round-7 operators (seventh member of the DESIGN.md
"Measured scaling" family): replicate the sf0.1 realistic-vocabulary corpus
1x/4x/16x and measure wall time + output volume for

  - exact_substring_pairs      (md5-keyed inverted gram index — the
                               round-7 collision fix; pairs must stay
                               volume-bound, cost linear-ish)
  - lm_perplexity_buckets      approx dial (percentile cutpoints +
                               map-side bucketing, no per-source sort)
  - lm_perplexity_buckets      exact ntile dial (for the parallelism-
                               ceiling comparison at the same sizes)
  - media_resize               (synthetic payloads + real PPM decode/
                               resize/re-encode over Arrow mapInPandas)
  - audio_features_audit       (real WAV decode + closed-form bounds)

Per-copy distinctness is the ingest probe's: copy c rewrites each token
w -> w + "c<c>" so vocabularies are disjoint across copies — true outputs
grow linearly and the timings measure ENGINE cost, not output volume.
The multimodal stages synthesize per-doc payloads, so their work is
exactly proportional to docs by construction; they are here to measure
the Arrow mapInPandas throughput curve, not join behavior.

Run (solo, no other Spark JVM): python tools/probe_round7_scaling.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import bench
from procurement_system_bigdata_spark.operators import dedup, multimodal
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
    """Construction + value aggregate timing (see probe_round6_scaling's
    docstring for the two Catalyst traps this shape avoids)."""
    t0 = time.perf_counter()
    df = make()
    row = df.agg(F.count(F.lit(1)).alias("n"), F.sum(value_col).alias("s")).first()
    return round(time.perf_counter() - t0, 2), row.n


def main() -> None:
    spark = get_spark(app_name="round7-scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")
    base = bench._realvocab_docs(spark, SF_DIR).localCheckpoint()
    print(f"base corpus: {base.count()} docs from {SF_DIR}")

    for copies in (1, 4, 16):
        docs = replicated(base, copies).localCheckpoint()
        n_docs = docs.count()

        w_sub, n_sub = timed_agg(
            lambda: dedup.exact_substring_pairs(docs), "n_shared_grams"
        )
        w_apx, n_apx = timed_agg(
            lambda: text_ops.lm_perplexity_buckets(docs, approx=True), "n_docs"
        )
        w_ntl, n_ntl = timed_agg(
            lambda: text_ops.lm_perplexity_buckets(docs), "n_docs"
        )
        w_img, n_img = timed_agg(
            lambda: multimodal.resize_images(
                multimodal.attach_synthetic_media(docs)
            ).drop("content"),
            "n_bytes",
        )
        w_aud, n_aud = timed_agg(
            lambda: multimodal.audio_features_audit(
                multimodal.attach_synthetic_media(docs)
            ),
            "n_samples",
        )
        print(
            f"copies={copies:>2} docs={n_docs:>6} | "
            f"substr_md5 {w_sub:>7.2f}s/{n_sub} | "
            f"ppl_approx {w_apx:>6.2f}s/{n_apx} | "
            f"ppl_ntile {w_ntl:>6.2f}s/{n_ntl} | "
            f"img_resize {w_img:>6.2f}s/{n_img} | "
            f"audio {w_aud:>6.2f}s/{n_aud}",
            flush=True,
        )


if __name__ == "__main__":
    main()
