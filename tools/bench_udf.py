"""Measure the UDF-strategy ladder on a real operator (cosine similarity):

    built-in higher-order functions (zip_with/aggregate, JVM-side)
    vs Arrow-batched pandas_udf (numpy vectorized)
    vs row-at-a-time Python UDF (the anti-pattern)

Run: python tools/bench_udf.py  (prints one JSON line)

Measured result (sf0.1, 100k rows x 64 dims, local[32]): pandas_udf ~3x
FASTER than the zip_with/aggregate built-ins — Catalyst higher-order
functions are interpreted per element (not whole-stage-codegen'd), while
numpy fuses the Arrow batch; the per-row Python UDF trails both.  Design
consequence: relational/text operators stay on true built-ins (those ARE
codegen'd, and bit-exact against the oracle); heavy VECTOR math gets the
pandas_udf fast path (operators/similarity.cosine_pandas_udf) in scale
deployments, with the builtin expression kept for oracle-checked queries.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from procurement_system_bigdata_spark.catalog import load_table
from procurement_system_bigdata_spark.operators.similarity import cosine
from procurement_system_bigdata_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench-udf")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.limit(1).select(F.col("embedding").alias("qv")).first().qv
    qlit = F.array(*[F.lit(float(x)) for x in q])
    # self-cross to get a meaningful row count out of the small table
    base = emb.crossJoin(emb.select(F.col("vec_id").alias("v2")).limit(50)).select(
        "embedding"
    )
    n = base.count()

    @F.pandas_udf(DoubleType())
    def cos_pandas(col: pd.Series) -> pd.Series:
        qv = np.array(q, dtype=np.float64)
        qn = np.linalg.norm(qv)
        mat = np.stack(col.map(lambda a: np.asarray(a, dtype=np.float64)))
        return pd.Series(
            (mat @ qv) / (np.linalg.norm(mat, axis=1) * qn)
        )

    @F.udf(DoubleType())
    def cos_python(a) -> float:
        import math

        dot = sum(float(x) * float(y) for x, y in zip(a, q))
        na = math.sqrt(sum(float(x) * float(x) for x in a))
        nq = math.sqrt(sum(float(y) * float(y) for y in q))
        return dot / (na * nq)

    variants = {
        "builtin_hof": lambda df: df.select(cosine(F.col("embedding"), qlit).alias("c")),
        "pandas_udf": lambda df: df.select(cos_pandas("embedding").alias("c")),
        "python_udf": lambda df: df.select(cos_python("embedding").alias("c")),
    }

    times: dict[str, float] = {}
    for name, fn in variants.items():
        best = float("inf")
        for _ in range(2):
            spark._jvm.System.gc()
            t0 = time.perf_counter()
            fn(base).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 4)

    print(
        json.dumps(
            {
                "metric": "cosine_udf_strategies",
                "rows": n,
                "unit": "sec",
                "times": times,
                "speedup_builtin_vs_python": round(
                    times["python_udf"] / times["builtin_hof"], 1
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
