"""Round-11 probe: fused single-intersect exact-Jaccard confirm (VERDICT #3).

Compares three confirm shapes on dedup_minhash_lsh (oracle dial) and
incremental_neardup — the two registry paths dominated by the confirm
stage on the toy corpus:

- legacy      (round-10 head): select(jaccard).filter(jaccard >= t) — the
              optimizer pushes the predicate into the join condition, so
              the 2-intersect jaccard expression evaluates in BOTH the
              predicate and the survivor projection;
- fused       (candidate, the repo's new _confirm_jaccard): project
              n_common ONCE behind an F.shuffle nondeterminism barrier,
              filter on the projected int;
- randguard   (alternative barrier): F.when(F.rand() > -1, intersect) —
              cheaper barrier (one RNG per row vs a Fisher-Yates pass),
              same single evaluation.

Also prints the array_intersect count in each formatted plan (legacy
should show 2+ copies, fused/randguard exactly 1).

Usage: python tools/probe_r11_confirm_fusion.py [rounds]
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

FUSED = dedup._confirm_jaccard


def legacy(cand, sets_a, sets_b, id_a, id_b, threshold):
    n_common = F.size(F.array_intersect(F.col("hs_a"), F.col("hs_b")))
    jac = n_common.cast("double") / (
        F.size(F.col("hs_a")) + F.size(F.col("hs_b")) - n_common
    )
    return (
        cand.join(sets_a, id_a)
        .join(sets_b, id_b)
        .select(id_a, id_b, jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def randguard(cand, sets_a, sets_b, id_a, id_b, threshold):
    n_common = F.when(
        F.rand() > -1.0,
        F.size(F.array_intersect(F.col("hs_a"), F.col("hs_b"))),
    )
    scored = (
        cand.join(sets_a, id_a)
        .join(sets_b, id_b)
        .select(
            id_a,
            id_b,
            n_common.alias("_nc"),
            F.size(F.col("hs_a")).alias("_na"),
            F.size(F.col("hs_b")).alias("_nb"),
        )
    )
    jac = F.col("_nc").cast("double") / (
        F.col("_na") + F.col("_nb") - F.col("_nc")
    )
    return scored.filter(jac >= threshold).select(id_a, id_b, jac.alias("jaccard"))


VARIANTS = {"legacy": legacy, "fused": FUSED, "randguard": randguard}


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="probe-r11-confirm-fusion")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")

    from procurement_system_bigdata_spark.queries import llmdata

    def minhash(vfn):
        dedup._confirm_jaccard = vfn
        try:
            return dedup.minhash_lsh_pairs(
                docs, k=P.MINHASH_K_ORACLE, n_bands=P.MINHASH_BANDS_ORACLE
            )
        finally:
            dedup._confirm_jaccard = FUSED

    def incremental(vfn):
        dedup._confirm_jaccard = vfn
        try:
            return llmdata.q_incremental_neardup(spark, sf_dir)
        finally:
            dedup._confirm_jaccard = FUSED

    workloads = {"dedup_minhash_lsh": minhash, "incremental_neardup": incremental}

    for wname, maker in workloads.items():
        stats = {}
        for vname, vfn in VARIANTS.items():
            df = maker(vfn)
            plan = df._jdf.queryExecution().executedPlan().toString()
            n_int = plan.count("array_intersect")
            row = df.agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("jaccard"), 6).alias("sj"),
            ).collect()[0]
            stats[vname] = (row["n"], row["sj"])
            print(f"plan[{wname}][{vname}]: array_intersect x{n_int}", flush=True)
        vals = set(stats.values())
        print(
            f"equivalence[{wname}]: {stats} -> "
            f"{'OK' if len(vals) == 1 else 'MISMATCH'}",
            flush=True,
        )
        if len(vals) != 1:
            raise SystemExit(f"variant outputs differ on {wname}: {stats}")

    times = {w: {v: [] for v in VARIANTS} for w in workloads}
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
