"""Round-10 optimization-round profiler: time EVERY registry query at the
bench scale factor via the noop sink and record its physical-plan shape.

Usage: python tools/probe_r10_profile.py [--runs N] [--out FILE] [query ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
       SPARK_GRAFT_CPUS   (default 32)

Output: one JSON file mapping query -> {sec, plan-shape counters} plus a
_meta block (sf, cpus, code fingerprint).  This is the measure-first pass
of the optimization round (guide §1): the bench headliners get best-of-3
from bench.py; this sweep gives one timed noop execution per registry
query so the expensive tail OUTSIDE the headline set is visible, and the
plan counters (shuffles, SMJ, Python eval nodes, single-partition
exchanges) flag scale hazards for the per-operator checklist in
OPTIMIZATION_r10.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from procurement_system_bigdata_spark.plans.explain import plan_stats  # noqa: E402
from procurement_system_bigdata_spark.queries.registry import REGISTRY  # noqa: E402
from procurement_system_bigdata_spark.session import get_spark  # noqa: E402


def main() -> None:
    argv = sys.argv[1:]
    runs = 1
    out_path = "bench_r10_profile.json"
    if "--runs" in argv:
        i = argv.index("--runs")
        runs = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    only = set(argv) if argv else None

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="probe-r10-profile")
    spark.sparkContext.setLogLevel("ERROR")

    rows: dict[str, dict] = {}
    names = [n for n in REGISTRY if only is None or n in only]
    for name in names:
        spec = REGISTRY[name]
        try:
            df = spec.fn(spark, sf_dir)
            stats = plan_stats(df)
            stats.pop("plan", None)
            stats.pop("pushed_filters", None)
            stats.pop("read_schemas", None)
            best = float("inf")
            for _ in range(runs):
                spark._jvm.System.gc()
                spark.sparkContext.setJobDescription(f"r10-profile: {name}")
                t0 = time.perf_counter()
                # rebuild per run so every run plans cold (bench.py discipline)
                spec.fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            rows[name] = {"sec": round(best, 4), **stats}
            print(f"{name}: {rows[name]['sec']}s", file=sys.stderr, flush=True)
        except Exception as exc:  # keep sweeping; record the failure
            rows[name] = {"error": f"{type(exc).__name__}: {exc}"[:400]}
            print(f"{name}: ERROR {exc}", file=sys.stderr, flush=True)
        finally:
            spark.sparkContext.setJobDescription(None)

    out = {
        "_meta": {
            "sf_dir": sf_dir,
            "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
            "runs": runs,
            "total_sec": round(
                sum(r.get("sec", 0.0) for r in rows.values()), 2
            ),
        },
        **rows,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["_meta"]))


if __name__ == "__main__":
    main()
