"""Codegen-coverage audit: for every registry query (AQE off, so plan
strings carry the `*(n)` span markers), report how many whole-stage
codegen spans the physical plan has next to its operator count.

Spark silently drops an operator out of whole-stage codegen when it has
more than spark.sql.codegen.maxFields output fields (found the K=128
MinHash aggregate running interpreted), when an expression is
CodegenFallback (every higher-order function), or when Janino compilation
fails.  Interpreted evaluation on a hot path is a 2-5x per-row tax at
100 TB; this audit makes the coverage visible so regressions are caught by
inspection rather than profiling.

Run: python tools/audit_codegen.py   (builds every query's plan; operators
with eager localCheckpoints execute their materialization jobs during
construction)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from procurement_system_bigdata_spark.queries.registry import REGISTRY
from procurement_system_bigdata_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark(app_name="codegen-audit", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    flagged = []
    for name, spec in REGISTRY.items():
        try:
            plan = (
                spec.fn(spark, SF_DIR)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as ex:  # noqa: BLE001 — audit keeps going
            print(f"{name:34s} ERROR {type(ex).__name__}")
            continue
        spans = len(set(re.findall(r"\*\((\d+)\)", plan)))
        # count plan operators (lines starting with +- or the root)
        ops = len(re.findall(r"^\s*\+?-? ?\*?\(?\d*\)? ?[A-Z][A-Za-z]+", plan, re.M))
        hof = len(re.findall(r"transform\(|aggregate\(|filter\(lambda", plan))
        note = ""
        if spans == 0 and ops > 2:
            note = "  <-- NO codegen"
            flagged.append(name)
        print(f"{name:34s} spans={spans:3d} ops~{ops:3d} hof_exprs={hof:3d}{note}")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()
    print(f"\n{len(flagged)} queries with zero codegen spans: {flagged}")


if __name__ == "__main__":
    main()
