"""Corpus-scan audit: for every registry query, how many times does the
physical plan scan each base parquet table, and does the documents scan
prune the text column?

At 100 TB the dominant cost of every text operator is reading the text
column; a query whose plan scans documents' TEXT three times pays 3x the
pipeline's floor cost no matter how good its shuffles are.  Exchange reuse
does NOT deduplicate these scans when branch projections differ (measured
on the mixture operators, fixed by checkpointing the tiny per-source
aggregate) — so every multi-reference of a corpus-derived frame needs an
explicit decision: re-scan (fine for column-pruned id-only branches) or
materialize (for small aggregates).

Run: python tools/audit_scans.py   (builds every query's plan; note that
operators with eager localCheckpoints — and the two queries with driver
loops — DO execute their materialization jobs during construction)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from procurement_system_bigdata_spark.plans.explain import formatted_plan
from procurement_system_bigdata_spark.queries.registry import REGISTRY
from procurement_system_bigdata_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "documents lineitem orders events embeddings customer supplier part "
    "nation region"
).split()


def main() -> None:
    spark = get_spark(app_name="scan-audit", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name, spec in REGISTRY.items():
        try:
            plan = formatted_plan(spec.fn(spark, SF_DIR))
        except Exception as ex:  # noqa: BLE001 — audit keeps going
            rows.append((name, f"ERROR {type(ex).__name__}", "", ""))
            continue
        counts = {t: plan.count(f"{t}.parquet") for t in TABLES}
        # text-bearing scans: ReadSchema structs containing the text column
        # (valid while documents is the only text-bearing table)
        doc_text = sum(
            1
            for m in re.findall(r"ReadSchema: struct<([^>]*)>", plan)
            if "text" in m
        )
        hot = {t: c for t, c in counts.items() if c > 0}
        rows.append((name, hot, doc_text, ""))
    spark.stop()

    print(f"{'query':34s} {'scans per table':44s} text-bearing scans")
    flagged = 0
    for name, hot, doc_text, _ in rows:
        mark = ""
        if isinstance(hot, dict) and (doc_text and doc_text > 1):
            mark = "  <-- multi text scan"
            flagged += 1
        if isinstance(hot, str):
            mark = "  <-- " + hot
        print(f"{name:34s} {str(hot):44s} {doc_text}{mark}")
    print(f"\n{flagged} queries scan the text column more than once")


if __name__ == "__main__":
    main()
