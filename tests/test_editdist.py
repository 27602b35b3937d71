"""Edit-distance self-join: planted cases, brute-force equality, oracle
parity, and plan shape (equi-join only, no cartesian product on the main
path)."""

from __future__ import annotations

import pyspark.sql.functions as F

from procurement_system_bigdata_spark.operators import editdist

from conftest import SF_DIR, assert_matches_oracle


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs(df):
    return {(r.doc_a, r.doc_b, r.dist) for r in df.collect()}


def test_planted_typos(spark):
    docs = _df(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy d0g"),  # 1 sub
            (3, "the quick brown fox jump over the lazy dog"),  # 1 del
            (4, "a completely different document body here"),
            (5, "the quick brown fox jumps over the lazy dog"),  # exact dup
        ],
    )
    got = _pairs(editdist.edit_distance_pairs(docs, k=2))
    assert (1, 2, 1) in got
    assert (1, 3, 1) in got
    assert (1, 5, 0) in got
    assert (2, 3, 2) in got  # sub + del
    assert not any(4 in (a, b) for a, b, _ in got)


def test_matches_brute_force_on_corpus(spark):
    """Completeness: the segment-signature candidates + verify equals the
    brute-force definition on real corpus prefixes."""
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .limit(120)
    )
    k, plen = 2, 32
    got = _pairs(editdist.edit_distance_pairs(docs, k=k, prefix_len=plen))
    keyed = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.substring("text", 1, plen).alias("key"),
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    brute = (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.levenshtein(F.col("a.key"), F.col("b.key"), k).alias("dist"),
        )
        .filter((F.col("dist") >= 0) & (F.col("dist") <= k))
    )
    assert got == _pairs(brute)


def test_short_keys_and_mixed_lengths(spark):
    """Short (< k+1 chars) keys pair among themselves and against long
    keys; the union of branches stays brute-force-equal."""
    docs = _df(
        spark,
        [
            (1, "ab"),
            (2, "a"),  # dist 1 from "ab"
            (3, "abcd"),  # dist 2 from "ab"
            (4, "abce"),  # dist 1 from "abcd"
            (5, "zzzzzz"),
        ],
    )
    got = _pairs(editdist.edit_distance_pairs(docs, k=2))
    # brute force over the same tiny frame is the ground truth
    keyed = docs.select(F.col("doc_id").cast("long").alias("doc_id"), F.col("text").alias("key"))
    a, b = keyed.alias("a"), keyed.alias("b")
    brute = (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.levenshtein(F.col("a.key"), F.col("b.key"), 2).alias("dist"),
        )
        .filter((F.col("dist") >= 0) & (F.col("dist") <= 2))
    )
    assert got == _pairs(brute)
    assert (1, 2, 1) in got and (3, 4, 1) in got


def test_oracle_parity(spark, duck):
    from procurement_system_bigdata_spark.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents")
    got = editdist.edit_distance_pairs(docs, k=2, prefix_len=64)
    assert_matches_oracle(
        got, duck, editdist.edit_distance_pairs_sql("documents", k=2, prefix_len=64)
    )


def test_no_cartesian_on_main_path(spark):
    docs = _df(spark, [(1, "abcdefghij"), (2, "abcdefghiz")])
    plan = editdist.edit_distance_pairs(docs, k=2)._jdf.queryExecution().toString()
    # the only nested-loop join allowed is the (empty-on-this-data)
    # short-key branch, which joins on an abs-length-window predicate;
    # the main candidate join must be an equi hash/merge join
    main = plan.split("Union")[0] if "Union" in plan else plan
    assert "CartesianProduct" not in main and "BroadcastNestedLoopJoin" not in main


def test_containment_asymmetry(spark):
    """A short doc quoted whole inside a long doc: containment ~1.0 in
    the short->long direction, well below in the reverse — the signal
    Jaccard misses."""
    from procurement_system_bigdata_spark.operators import dedup

    quote = "alpha beta gamma delta epsilon zeta eta theta"
    long_doc = (
        "preamble words around the quoted body " + quote + " and then a "
        "much longer continuation with many additional novel words one "
        "two three four five six seven eight nine ten eleven twelve"
    )
    docs = spark.createDataFrame(
        [(1, quote), (2, long_doc), (3, "unrelated content entirely different")],
        "doc_id long, text string",
    )
    got = {
        (r.doc_a, r.doc_b): r.containment
        for r in dedup.ngram_containment_pairs(docs, shingle_n=3, threshold=0.0)
        .collect()
    }
    assert got[(1, 2)] > 0.9  # quote is contained in the long doc
    assert got[(2, 1)] < 0.5  # long doc is NOT contained in the quote
    assert (1, 3) not in got and (3, 1) not in got

    filtered = dedup.ngram_containment_pairs(docs, shingle_n=3, threshold=0.6)
    assert {(r.doc_a, r.doc_b) for r in filtered.collect()} == {(1, 2)}


def test_exhaustive_small_alphabet(spark):
    """All 31 strings over {a,b} with length <= 4 (straddling the
    short/long partition boundary at k+1=3) plus longer samples — the
    operator must equal brute force on every pair class: equal strings,
    pure inserts, shifts, shorts vs longs."""
    strings = [""]
    for _ in range(4):
        strings += [s + c for s in strings for c in "ab" if len(s) == _]
    strings = sorted(set(s for s in strings if s))  # drop the empty doc
    strings += ["aaaaaab", "aababab", "bbbbbbb", "abababab"]
    docs = _df(spark, list(enumerate(strings)))
    got = _pairs(editdist.edit_distance_pairs(docs, k=2))
    keyed = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), F.col("text").alias("key")
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    brute = (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.levenshtein(F.col("a.key"), F.col("b.key"), 2).alias("dist"),
        )
        .filter((F.col("dist") >= 0) & (F.col("dist") <= 2))
    )
    want = _pairs(brute)
    assert got == want and len(want) > 100
