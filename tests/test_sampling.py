"""Semantic guarantees of the deterministic train/val/test split — the
properties that make hash-splitting the right operator at 100 TB (stability
under repartitioning, no RNG state, stratification-friendliness).  Oracle
value parity is covered by test_oracle_parity via the registry."""

from __future__ import annotations

from conftest import SF_DIR

from procurement_system_bigdata_spark.catalog import load_table
from procurement_system_bigdata_spark.operators import sampling


def test_split_stable_under_repartitioning(spark):
    docs = load_table(spark, SF_DIR, "documents")
    a = {r.doc_id: r.split for r in sampling.train_val_test_split(docs).collect()}
    b = {
        r.doc_id: r.split
        for r in sampling.train_val_test_split(docs.repartition(7)).collect()
    }
    assert a == b, "assignment must not depend on partitioning"


def test_split_covers_all_docs_disjointly(spark):
    docs = load_table(spark, SF_DIR, "documents")
    out = sampling.train_val_test_split(docs)
    assert out.count() == docs.count()
    assert out.select("doc_id").distinct().count() == docs.count()
    splits = {r.split for r in out.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"}


def test_split_proportions_roughly_track_thresholds(spark):
    docs = load_table(spark, SF_DIR, "documents")
    counts = {
        r.split: r.n
        for r in sampling.train_val_test_split(docs)
        .groupBy("split")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    total = sum(counts.values())
    # 80/10/10 target; wide tolerance for small SF sample noise
    assert counts.get("train", 0) / total > 0.6
    assert counts.get("train", 0) / total < 0.95


def test_split_summary_partitions_by_stratum(spark):
    docs = load_table(spark, SF_DIR, "documents")
    rows = sampling.split_summary(docs).collect()
    n_sources = docs.select("source").distinct().count()
    assert sum(r.n_docs for r in rows) == docs.count()
    assert len({r.source for r in rows}) == n_sources


def test_stratified_sample_properties(spark):
    from pyspark.sql import functions as F

    from procurement_system_bigdata_spark.operators import sampling as S

    base = load_table(spark, SF_DIR, "documents").select("doc_id", "lang", "source")
    sampled = S.stratified_sample(base).collect()
    rates = S.LANG_RATES
    by_lang_total = {r["lang"]: r["n"] for r in base.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    by_lang_kept: dict = {}
    for r in sampled:
        assert r["sample_bucket"] < rates.get(r["lang"], S.DEFAULT_RATE_PCT)
        by_lang_kept[r["lang"]] = by_lang_kept.get(r["lang"], 0) + 1
    # rate-100 strata keep everything; rate-25 keeps a strict subset
    assert by_lang_kept.get("zh", 0) == by_lang_total.get("zh", 0)
    assert 0 < by_lang_kept["en"] < by_lang_total["en"]
    # monotone: raising every rate to 100 yields a superset of the sample
    full = S.stratified_sample(base, rates={k: 100 for k in rates}, default_pct=100)
    assert full.count() == base.count()
    # repartition-stable (shuffle-free determinism)
    again = {r["doc_id"] for r in S.stratified_sample(base.repartition(7)).collect()}
    assert again == {r["doc_id"] for r in sampled}


def test_group_sample_k_monotone_and_exact(spark):
    """k-per-group sampling: exactly min(k, |group|) rows per group, ranks
    are 1..k, raising k only ADDS rows (supersets across curation reruns),
    and the selection matches a numpy recomputation of the salted-hash
    order."""
    import pyspark.sql.functions as F

    from conftest import SF_DIR
    from procurement_system_bigdata_spark.catalog import load_table
    from procurement_system_bigdata_spark.operators import sampling

    docs = load_table(spark, SF_DIR, "documents")
    group_n = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}

    k3 = sampling.group_sample_k(docs, ("lang",), k=3).collect()
    k5 = sampling.group_sample_k(docs, ("lang",), k=5).collect()
    per_group3: dict[str, list] = {}
    for r in k3:
        per_group3.setdefault(r.lang, []).append(r)
    for lang, rows in per_group3.items():
        assert len(rows) == min(3, group_n[lang])
        assert sorted(r.sample_rank for r in rows) == list(range(1, len(rows) + 1))
    assert {(r.lang, r.doc_id) for r in k3} <= {(r.lang, r.doc_id) for r in k5}

    # reproducible: same call, same rows
    again = sampling.group_sample_k(docs, ("lang",), k=3).collect()
    assert {(r.lang, r.doc_id) for r in again} == {(r.lang, r.doc_id) for r in k3}


def test_source_mixture_weights_math(spark):
    """Mixing math: shares sum to 1, weight = target/share, targeted
    sources upweight correctly and untargeted sources get weight 0."""
    import math

    from procurement_system_bigdata_spark.operators import sampling

    rows = [(i, "alpha beta gamma delta", "web") for i in range(8)]
    rows += [(100 + i, "epsilon zeta", "code") for i in range(4)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        r.source: r
        for r in sampling.source_mixture_weights(
            docs, targets={"web": 0.5, "code": 0.5}
        ).collect()
    }
    assert out["web"].n_tokens == 32 and out["code"].n_tokens == 8
    assert math.isclose(sum(r.token_share for r in out.values()), 1.0)
    assert math.isclose(out["web"].sampling_weight, 0.5 / 0.8)
    assert math.isclose(out["code"].sampling_weight, 0.5 / 0.2)

    untargeted = {
        r.source: r
        for r in sampling.source_mixture_weights(
            docs, targets={"web": 1.0}
        ).collect()
    }
    assert untargeted["code"].target_share == 0.0
    assert untargeted["code"].sampling_weight == 0.0


def test_source_mixture_zero_token_source_gets_explicit_zero_weight(spark):
    """A source whose documents are ALL empty has token_share 0; the weight
    must be an explicit 0.0 (flagged for exclusion) — never NULL (the
    silent neither-upsampled-nor-excluded state the round-3 advisor
    flagged).  Mirrored in the DuckDB oracle SQL."""
    import duckdb

    from procurement_system_bigdata_spark.operators import sampling

    rows = [(1, "alpha beta", "web"), (2, "", "empty"), (3, "   ", "empty")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        r.source: r
        for r in sampling.source_mixture_weights(
            docs, targets={"web": 0.5, "empty": 0.5}
        ).collect()
    }
    assert out["empty"].n_tokens == 0
    assert out["empty"].sampling_weight == 0.0  # not None
    assert out["web"].sampling_weight is not None

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        "(1, 'alpha beta', 'web'), (2, '', 'empty'), (3, '   ', 'empty')) "
        "t(doc_id, text, source)"
    )
    sql = sampling.source_mixture_weights_sql(
        targets={"web": 0.5, "empty": 0.5}
    )
    oracle = {r[0]: r for r in con.execute(sql).fetchall()}
    cols = [d[0] for d in con.execute(sql).description]
    wi = cols.index("sampling_weight")
    assert oracle["empty"][wi] == 0.0


def test_exact_substring_pairs_detects_quoting(spark):
    """A long doc quoting a short doc verbatim must pair with it even when
    overall Jaccard is low (the case near-dup banding misses), and
    unrelated docs must not pair."""
    from procurement_system_bigdata_spark.operators import dedup

    quoted = " ".join(f"q{i}" for i in range(10))
    long_doc = (
        " ".join(f"filler{i}" for i in range(120)) + " " + quoted + " "
        + " ".join(f"tail{i}" for i in range(120))
    )
    docs = spark.createDataFrame(
        [
            (1, quoted),
            (2, long_doc),
            (3, " ".join(f"other{i}" for i in range(50))),
        ],
        "doc_id long, text string",
    )
    pairs = {(r.doc_a, r.doc_b): r.n_shared_grams
             for r in dedup.exact_substring_pairs(docs, min_gram_words=8).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 3  # 10 words -> 3 distinct 8-grams
    assert all(p == (1, 2) for p in pairs)

    # low overall Jaccard confirms this is the banding-blind-spot case
    jac = dedup.ngram_jaccard_pairs(docs, shingle_n=1, threshold=0.01).collect()
    j12 = [r.jaccard for r in jac if (r.doc_a, r.doc_b) == (1, 2)]
    assert j12 and j12[0] < 0.1


def test_dsir_ranks_targetlike_docs_above_dissimilar(spark):
    """DSIR (Xie et al. 2023) semantic floor: a raw doc written in the
    target slice's vocabulary must out-weigh a raw doc of alien vocabulary,
    and weights must be partitioning-invariant (exact BIGINT sums)."""
    target_text = "supply chain procurement invoice ledger " * 5
    rows = [
        (1, target_text, "src0"),
        (2, target_text, "src0"),
        (3, "procurement invoice ledger supply chain audit", "raw"),
        (4, "zebra quantum nebula walrus fjord kumquat", "raw"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.doc_id: r for r in sampling.dsir_importance(docs, select_n=1).collect()}
    assert set(out) == {3, 4}, "only raw docs are scored"
    assert out[3].logw_micro > out[4].logw_micro
    assert out[3].selected and not out[4].selected

    again = {
        r.doc_id: r.logw_micro
        for r in sampling.dsir_importance(docs.repartition(7), select_n=1).collect()
    }
    assert again == {k: v.logw_micro for k, v in out.items()}


def test_weighted_sample_matches_python_twin(spark):
    """The Spark Efraimidis–Spirakis sample must agree bit-for-bit with a
    pure-Python twin built from the same portable hash + portable ln —
    key values, ranks, and the selected k-subset."""
    from pyspark.sql import functions as F

    from procurement_system_bigdata_spark.functions import portable as P

    rows = [(i, f"doc {i}", "en", "src0", (i * 37) % 500 + 1)
            for i in range(60)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    got = sampling.weighted_sample_k(docs, k=7).collect()
    assert len(got) == 7

    def py_hash(s: str) -> int:
        acc = P.HASH_SEED
        for ch in s:
            acc = (acc * 31 + ord(ch)) % P.HASH_P
        return acc

    def py_key(doc_id: int, w: int) -> float:
        h1 = py_hash(f"{sampling.WEIGHTED_SALT}{doc_id}") + 1
        return (P.py_portable_ln(h1) - sampling.LN_HASH_P) / float(w)

    expect = sorted(
        ((py_key(i, w), -i) for i, _, _, _, w in rows), reverse=True
    )[:7]
    expect_ids = [-neg for _, neg in expect]
    got_sorted = sorted(got, key=lambda r: r.sample_rank)
    assert [r.doc_id for r in got_sorted] == expect_ids
    for r, (k_expected, neg) in zip(got_sorted, expect):
        assert r.sample_key == k_expected, "key not bit-identical to twin"


def test_weighted_sample_weight_monotonicity(spark):
    """All else equal (same ids -> same u), scaling ONE row's weight up
    moves its key toward 0 and can only improve its rank; zero/NULL
    weights are excluded outright."""
    base = [(i, "t", "en", "src0", 10) for i in range(40)]
    docs = spark.createDataFrame(
        base, "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    first = sampling.weighted_sample_k(docs, k=5).collect()
    unsampled = set(range(40)) - {r.doc_id for r in first}
    target = min(unsampled)
    boosted = [(i, t, l, s, 10_000_000 if i == target else w)
               for i, t, l, s, w in base]
    docs2 = spark.createDataFrame(
        boosted, "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    second = sampling.weighted_sample_k(docs2, k=5).collect()
    assert target in {r.doc_id for r in second}, (
        "a 1e6x weight boost must pull the row into the k=5 sample"
    )

    with_bad = docs.union(
        spark.createDataFrame(
            [(100, "t", "en", "src0", 0), (101, "t", "en", "src0", None)],
            "doc_id long, text string, lang string, source string, "
            "n_chars long",
        )
    )
    out = sampling.weighted_sample_k(with_bad, k=100).collect()
    assert {r.doc_id for r in out} == set(range(40)), (
        "zero/NULL weights must be excluded"
    )
