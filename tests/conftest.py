"""Shared fixtures: one local SparkSession + a DuckDB oracle comparator.

The comparator mimics the driver's correctness gate (row-count + schema +
order-insensitive value comparison) but stricter: values are compared
exactly (floats bit-for-bit), so anything passing here should hash-match.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from procurement_system_bigdata_spark.catalog import TABLES  # noqa: E402
from procurement_system_bigdata_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="pytest", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize cell values, sort rows."""
    df = df[sorted(df.columns)].copy()

    def canon(v):
        import numpy as np

        if isinstance(v, np.ndarray):  # duckdb returns LIST columns as arrays
            v = v.tolist()
        if isinstance(v, np.generic):
            v = v.item()
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "<null>"
        if pd.isna(v) if not isinstance(v, (list, tuple, dict)) else False:
            return "<null>"
        if isinstance(v, float):
            return repr(v)  # full precision — floats must match exactly
        if isinstance(v, (list, tuple)):
            return "[" + ",".join(canon(x) for x in v) + "]"
        if hasattr(v, "isoformat"):
            s = v.isoformat()
            # normalize date vs midnight-timestamp representations
            return s[:10] if s.endswith("T00:00:00") or s.endswith(" 00:00:00") else s
        return str(v)

    for c in df.columns:
        df[c] = df[c].map(canon)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def assert_matches_oracle(spark_df, duck_con, sql: str) -> None:
    actual = _normalize(spark_df.toPandas())
    expected = _normalize(duck_con.execute(sql).fetchdf())
    assert list(actual.columns) == list(expected.columns), (
        f"column mismatch:\nspark  ={list(actual.columns)}\noracle={list(expected.columns)}"
    )
    assert len(actual) == len(expected), (
        f"row count mismatch: spark={len(actual)} oracle={len(expected)}"
    )
    if not actual.equals(expected):
        diff_mask = (actual != expected).any(axis=1)
        raise AssertionError(
            "value mismatch; first differing rows:\n"
            f"spark:\n{actual[diff_mask].head(5)}\n"
            f"oracle:\n{expected[diff_mask].head(5)}"
        )
