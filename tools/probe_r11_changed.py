"""Round-11 changed-query timer: noop-timed best-of-N for a named list of
registry queries (plus the bench-only realvocab extras), one JSON line out.

Run alternately in the head repo and a pre-optimization worktree to get a
same-session-style A/B over the queries this round touched (the bench
--ab protocol covers only the headline set).

Usage: python tools/probe_r11_changed.py <best_of> <query> [query ...]
Env:   SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from procurement_system_bigdata_spark.queries.registry import REGISTRY  # noqa: E402
from procurement_system_bigdata_spark.session import get_spark  # noqa: E402


def main() -> None:
    best_of = int(sys.argv[1])
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="probe-r11-changed")
    spark.sparkContext.setLogLevel("ERROR")

    import bench

    fns = {n: s.fn for n, s in REGISTRY.items()}
    fns.update(bench.EXTRA_BENCH)

    # warm-up: JVM + file listing
    fns[names[0]](spark, sf_dir).write.format("noop").mode("overwrite").save()

    times = {}
    for name in names:
        best = float("inf")
        for _ in range(best_of):
            spark._jvm.System.gc()
            t0 = time.perf_counter()
            fns[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 4)
    print(json.dumps({"repo": HERE, "sf_dir": sf_dir, "times": times}))


if __name__ == "__main__":
    main()
