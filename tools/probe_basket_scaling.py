"""Scaling probe for market-basket pair mining (sixth member of the
DESIGN.md "Measured scaling" family).

Replication scheme: copy c offsets ORDER keys (disjoint baskets) but keeps
PART keys — so n_orders, every item frequency, and every pair count all
scale by exactly c while the support/confidence/lift RATIOS are invariant.
That makes the probe double-duty:

  * wall must grow ~linearly (per-order pair expansion is C(basket,2) <=
    C(50,2) regardless of corpus size; the frequency table stays
    vocabulary-sized and broadcast);
  * association statistics must be invariant across scales: every pair
    present in both top-100s must carry the IDENTICAL lift_micro (ratios of
    c-scaled counts).  The top-100 SETS legitimately diverge, because the
    MIN_PAIR_SUPPORT floor is ABSOLUTE: a pair seen once at base scale
    (excluded, n_ab=1 < 2) reaches n_ab=c at c copies and enters the
    candidate pool, competing on lift.  The probe decomposes the
    non-overlap and asserts every newly-entered pair is exactly such a
    below-floor-at-base pair — any OTHER source of divergence would be a
    real nondeterminism bug.

Run (solo, no other Spark JVM): python tools/probe_basket_scaling.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from procurement_system_bigdata_spark.queries import analytics
from procurement_system_bigdata_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OK_STRIDE = 1_000_000_000
WORK = "/tmp/basket_probe"


def main() -> None:
    spark = get_spark(app_name="probe-basket")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    n_base = base.count()
    results = {}
    for copies in (1, 4, 16):
        d = f"{WORK}/x{copies}"
        shutil.rmtree(d, ignore_errors=True)
        parts = [
            base.select(
                (F.col("l_orderkey") + c * OK_STRIDE).alias("l_orderkey"),
                "l_partkey",
            )
            for c in range(copies)
        ]
        rep = parts[0]
        for p in parts[1:]:
            rep = rep.unionAll(p)
        rep.write.parquet(f"{d}/lineitem.parquet")

        best, top = float("inf"), None
        for _ in range(2):
            spark._jvm.System.gc()
            t0 = time.perf_counter()
            top = analytics.q_basket_pairs(spark, d).collect()
            best = min(best, time.perf_counter() - t0)
        results[copies] = {
            "rows": n_base * copies,
            "wall_s": round(best, 2),
            "top": {(r.part_a, r.part_b): (r.n_ab, r.lift_micro) for r in top},
        }
        print(
            f"x{copies}: rows={n_base * copies:,} wall={best:.2f}s "
            f"pairs_in_top={len(top)}",
            flush=True,
        )

    t1, t16 = results[1]["top"], results[16]["top"]
    common = set(t1) & set(t16)
    linear = all(t16[k][0] == 16 * t1[k][0] for k in common)
    lift_equal = all(t16[k][1] == t1[k][1] for k in common)
    print(f"top-100 overlap x1 vs x16: {len(common)}/100")
    print(f"pair counts scale exactly 16x on the overlap: {linear}")
    print(f"lift_micro identical on the overlap: {lift_equal}")
    # every x16-only top entry must be a pair the ABSOLUTE support floor
    # excluded at base scale: its x16 count is then exactly 16 (n_ab was 1)
    newcomers = set(t16) - set(t1)
    floor_admitted = all(t16[k][0] == 16 for k in newcomers)
    print(
        f"x16-only entries: {len(newcomers)}, all below-floor-at-base "
        f"(n_ab==16): {floor_admitted}"
    )
    # hard-fail (exit != 0) on any statistical divergence the replication
    # scheme cannot explain — a printed 'False' with a green exit code
    # would let a nondeterminism regression through a scripted run
    assert linear, "pair counts on the overlap did not scale exactly 16x"
    assert lift_equal, "lift_micro diverged across scales on the overlap"
    assert floor_admitted, (
        "an x16-only top entry is not a support-floor admission — "
        "unexplained ranking divergence"
    )
    w1, w4, w16 = (results[c]["wall_s"] for c in (1, 4, 16))
    print(f"wall ratios: x4/x1={w4 / w1:.2f} x16/x4={w16 / w4:.2f} "
          f"(linear would be <=4.0 each)")


if __name__ == "__main__":
    main()
