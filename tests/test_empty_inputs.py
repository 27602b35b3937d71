"""Every registry query must degrade gracefully on EMPTY inputs.

At 100 TB, empty inputs are routine — a new partition day, a filtered
branch, a source with no rows yet.  A query that CRASHES on empty input
(instead of returning an empty frame with its stable schema) takes down
the whole DAG run.  This sweep runs all registry queries against a
zero-row mirror of the testdata (physical schemas preserved, including
events' INT64-nanos timestamp) and asserts none raises.

Found-by-this-test: ivf_topk used to crash with CANNOT_INFER_EMPTY_SCHEMA
building a centroid frame from an empty k-means seed set.
"""
from __future__ import annotations

import os

import pytest

from procurement_system_bigdata_spark.catalog import TABLES


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("empty_sf"))
    # events' ts must stay a bigint (the nanos-as-long physical shape) so
    # load_table's div-1000 conversion path runs exactly as in production
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for t in TABLES:
        (
            spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
            .limit(0)
            .write.mode("overwrite")
            .parquet(os.path.join(d, f"{t}.parquet"))
        )
    return d


def test_all_registry_queries_survive_empty_tables(spark, empty_sf_dir):
    import __spark_entry__ as e

    failures = []
    for name, fn in e.queries().items():
        try:
            rows = fn(spark, empty_sf_dir).collect()
            assert rows == [] or rows is not None
        except Exception as ex:  # noqa: BLE001 — collecting all failures
            failures.append(f"{name}: {type(ex).__name__}: {str(ex)[:120]}")
    assert not failures, "queries crashed on empty input:\n" + "\n".join(failures)
