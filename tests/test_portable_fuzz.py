"""Differential fuzz of functions/portable.py — the primitives every
DuckDB oracle rests on.  Random ASCII inputs are evaluated through BOTH
engines (Spark Column expressions vs the emitted DuckDB SQL) and must
agree exactly: a divergence here would silently corrupt every downstream
oracle comparison."""
from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import pyspark.sql.functions as F

from procurement_system_bigdata_spark.functions import portable as P

# printable ASCII incl. punctuation/whitespace-ish chars the normalizer eats
_ascii_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=40
)


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


def _spark_eval(spark, texts, col_fn):
    df = spark.createDataFrame([(t,) for t in texts], "s string")
    return [r.out for r in df.select(col_fn(F.col("s")).alias("out")).collect()]


def _duck_eval(duck, texts, sql_fn):
    out = []
    for t in texts:
        duck.execute("CREATE OR REPLACE TEMP TABLE one AS SELECT ? AS s", [t])
        out.append(duck.execute(f"SELECT {sql_fn('s')} FROM one").fetchone()[0])
    return out


def test_norm_and_hash_and_words_agree(spark, duck):
    @settings(max_examples=30, deadline=None)
    @given(st.lists(_ascii_text, min_size=1, max_size=8))
    def check(texts):
        s_norm = _spark_eval(spark, texts, P.spark_norm_text)
        d_norm = _duck_eval(duck, texts, P.duck_norm_text)
        assert s_norm == d_norm

        s_hash = _spark_eval(spark, texts, P.spark_str_hash)
        d_hash = _duck_eval(duck, texts, P.duck_str_hash)
        assert s_hash == d_hash

        s_words = _spark_eval(
            spark, texts, lambda c: P.spark_words(P.spark_norm_text(c))
        )
        d_words = _duck_eval(
            duck, texts, lambda e: P.duck_words(P.duck_norm_text(e))
        )
        assert s_words == d_words

    check()


def test_shingles_agree(spark, duck):
    @settings(max_examples=20, deadline=None)
    @given(st.lists(_ascii_text, min_size=1, max_size=5), st.integers(2, 4))
    def check(texts, n):
        s = _spark_eval(
            spark,
            texts,
            lambda c: P.spark_word_shingles(P.spark_words(P.spark_norm_text(c)), n),
        )
        def duck_expr(e):
            return (
                f"(WITH w AS (SELECT {P.duck_words(P.duck_norm_text(e))} AS ws) "
                f"SELECT {P.duck_word_shingles('ws', n)} FROM w)"
            )
        d = _duck_eval(duck, texts, duck_expr)
        assert s == d

    check()
