"""Round-6 second wave: ngram novelty, minhash sketch accuracy, and the
cluster-safe (leakage-repairing) split."""

from __future__ import annotations

from pyspark.sql import functions as F

from procurement_system_bigdata_spark.functions import portable as P
from procurement_system_bigdata_spark.operators import clustering, dedup, text
from procurement_system_bigdata_spark.queries import llmdata
from tests.conftest import SF_DIR, assert_matches_oracle


def test_ngram_novelty_matches_oracle(spark, duck):
    assert_matches_oracle(
        llmdata.q_ngram_novelty(spark, SF_DIR), duck, llmdata.Q_NGRAM_NOVELTY_SQL
    )


def test_ngram_novelty_closed_form(spark):
    # doc 0 introduces all grams; doc 1 repeats doc 0 exactly (novelty 0);
    # doc 2 shares a prefix (one old gram, one new); doc 3 too short
    docs = spark.createDataFrame(
        [
            (0, "a b c d"),
            (1, "a b c d"),
            (2, "b c d e"),
            (3, "x y"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in text.ngram_novelty(docs).collect()}
    assert got[0].n_grams == 2 and got[0].n_novel == 2 and got[0].novelty == 1.0
    assert got[1].n_grams == 2 and got[1].n_novel == 0 and got[1].novelty == 0.0
    # doc 2 grams: "b c d" (seen in doc 0) and "c d e" (new)
    assert got[2].n_grams == 2 and got[2].n_novel == 1 and got[2].novelty == 0.5
    assert got[3].n_grams == 0 and got[3].novelty == 0.0


def test_minhash_accuracy_matches_oracle(spark, duck):
    assert_matches_oracle(
        llmdata.q_minhash_accuracy(spark, SF_DIR),
        duck,
        llmdata.Q_MINHASH_ACCURACY_SQL,
    )


def test_minhash_accuracy_identical_docs_estimate_exact(spark):
    # two identical docs: every signature component matches and exact
    # jaccard is 1.0 -> abs_err must be 0
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma delta"), (1, "alpha beta gamma delta")],
        "doc_id long, text string",
    )
    rows = dedup.minhash_estimate_vs_exact(docs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.k_eq == P.MINHASH_K_ORACLE
    assert r.est_jaccard == 1.0 and r.exact_jaccard == 1.0 and r.abs_err == 0.0


def test_cluster_safe_split_matches_oracle(spark, duck):
    assert_matches_oracle(
        llmdata.q_cluster_safe_split(spark, SF_DIR),
        duck,
        llmdata.Q_CLUSTER_SAFE_SPLIT_SQL,
    )


def test_cluster_safe_split_heals_leakage(spark):
    # find doc ids whose plain hash splits differ, pair them as near-dups:
    # the plain split LEAKS, the cluster-safe split must not
    from procurement_system_bigdata_spark.operators import sampling

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(40)], "doc_id long, text string"
    )
    plain = {
        r.doc_id: r.split
        for r in sampling.train_val_test_split(
            docs.withColumn("source", F.lit("s"))
        ).collect()
    }
    cross = [
        (a, b)
        for a in plain
        for b in plain
        if a < b and plain[a] != plain[b]
    ][:3]
    assert cross, "fixture needs at least one cross-split pair"
    pairs = spark.createDataFrame(cross, "doc_a long, doc_b long")
    safe = clustering.cluster_safe_split(docs, pairs)
    s = {r.doc_id: (r.component, r.split) for r in safe.collect()}
    for a, b in cross:
        assert s[a] == s[b]  # same component -> same split
    # singletons keep their plain assignment
    in_pairs = {x for ab in cross for x in ab}
    for d, sp in plain.items():
        if d not in in_pairs:
            assert s[d][1] == sp
    # and the audit's no_leakage/no-vacuity: audit all-TRUE on this graph
    audit = clustering.cluster_safe_split_audit(docs, pairs)
    bad = audit.filter(
        ~F.col("no_leakage_ok")
        | ~F.col("edges_within_ok")
        | ~F.col("witness_ok")
        | ~F.col("root_ok")
        | ~F.col("label_le_ok")
    )
    assert bad.count() == 0


def test_cluster_safe_split_audit_flags_plain_split_leak(spark):
    # feed the leakage checker a DELIBERATELY per-doc split over a
    # cross-split pair: no_leakage_ok must flip for the straddling docs
    from procurement_system_bigdata_spark.operators import sampling

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(40)], "doc_id long, text string"
    )
    plain = {
        r.doc_id: r.split
        for r in sampling.train_val_test_split(
            docs.withColumn("source", F.lit("s"))
        ).collect()
    }
    cross = next(
        (a, b) for a in plain for b in plain if a < b and plain[a] != plain[b]
    )
    edges = spark.createDataFrame([cross], "src long, dst long")
    sym = edges.unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    splits = spark.createDataFrame(
        [(d, sp) for d, sp in plain.items()], "doc_id long, split string"
    )
    s_src = splits.select(F.col("doc_id").alias("src"), F.col("split").alias("ss"))
    s_dst = splits.select(F.col("doc_id").alias("dst"), F.col("split").alias("sd"))
    leaks = (
        sym.join(s_src, "src").join(s_dst, "dst").filter(F.col("ss") != F.col("sd"))
    )
    assert leaks.count() == 2  # both directions of the straddling pair


def test_self_repetition_matches_oracle(spark, duck):
    assert_matches_oracle(
        llmdata.q_self_repetition_removal(spark, SF_DIR),
        duck,
        llmdata.Q_SELF_REPETITION_SQL,
    )


def test_self_repetition_closed_form(spark):
    # "a b c a b c d": 3-grams at 0..4 = [abc, bca, cab, abc, bcd];
    # "abc" repeats at i=3 -> positions 3,4,5 removed, keep "a b c d"
    docs = spark.createDataFrame(
        [(0, "a b c a b c d"), (1, "x y z w")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in dedup.remove_self_repetition(docs).collect()}
    assert got[0].n_words == 7 and got[0].n_removed == 3
    assert got[0].clean_text == "a b c d"
    assert got[1].n_removed == 0 and got[1].clean_text == "x y z w"


def test_self_repetition_keeps_first_occurrence_only(spark):
    # pure loop doc: "p q r p q r p q r" -> first window kept, the two
    # later repeats excised entirely
    docs = spark.createDataFrame(
        [(0, "p q r p q r p q r")], "doc_id long, text string"
    )
    r = dedup.remove_self_repetition(docs).first()
    assert r.n_words == 9 and r.clean_text == "p q r" and r.n_removed == 6


def test_bpe_merges_summary_matches_oracle(spark, duck):
    assert_matches_oracle(
        llmdata.q_bpe_merges(spark, SF_DIR), duck, llmdata.Q_BPE_MERGES_SQL
    )


def test_bpe_merges_monotone_invariant_holds_on_raw_table(spark):
    from procurement_system_bigdata_spark.operators import bpe

    rows = (
        bpe.learn_bpe(llmdata._docs(spark, SF_DIR)).orderBy("rank").collect()
    )
    counts = [r.pair_count for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(r.merged == r.left_sym + r.right_sym for r in rows)


# --- streaming near-dup admission -------------------------------------------


def test_streaming_neardup_ingest_admits_and_indexes(spark, tmp_path):
    from procurement_system_bigdata_spark.streaming import events as se

    out = str(tmp_path / "out")
    idx = str(tmp_path / "idx")
    fn = se.neardup_ingest_batch_fn(out, idx, threshold=0.9)

    def batch(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    # batch 0: two distinct docs + an intra-batch near-dup of doc 10
    b0 = batch(
        [
            (10, "alpha beta gamma delta epsilon"),
            (11, "alpha beta gamma delta epsilon"),  # dup of 10 (lower id)
            (12, "one two three four five"),
        ]
    )
    fn(b0, 0)
    got0 = {r.doc_id for r in spark.read.parquet(f"{out}/batch=0").collect()}
    assert got0 == {10, 12}

    # batch 1: a corpus near-dup (of 10) and a fresh doc
    b1 = batch(
        [
            (20, "alpha beta gamma delta epsilon"),  # dup of corpus 10
            (21, "six seven eight nine ten"),
        ]
    )
    fn(b1, 1)
    got1 = {r.doc_id for r in spark.read.parquet(f"{out}/batch=1").collect()}
    assert got1 == {21}

    # replay of a committed batch is a no-op (marker skip)
    fn(b1, 1)
    assert {
        r.doc_id for r in spark.read.parquet(f"{out}/batch=1").collect()
    } == {21}

    # the index holds exactly the admitted docs' signatures
    idx_ids = {r.doc_id for r in spark.read.parquet(idx).collect()}
    assert idx_ids == {10, 12, 21}

    # batch 2 still sees batch-0 content through the index
    b2 = batch([(30, "one two three four five")])  # dup of corpus 12
    fn(b2, 2)
    assert spark.read.parquet(f"{out}/batch=2").count() == 0


def test_streaming_neardup_ingest_equals_batch_operator(spark, tmp_path):
    # corpus-vs-new semantics agree with the batch incremental operator:
    # docs the batch operator pairs up are exactly the ones the stream drops
    from procurement_system_bigdata_spark.functions import portable as P
    from procurement_system_bigdata_spark.operators import dedup as dd
    from procurement_system_bigdata_spark.streaming import events as se

    corpus = spark.createDataFrame(
        [(i, f"w{i} x{i} y{i} z{i}") for i in range(1, 6)]
        + [(6, "common words shared by docs")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(100, "common words shared by docs"), (101, "totally new content here")],
        "doc_id long, text string",
    )
    pairs = dd.incremental_neardup_pairs(
        new, corpus, k=P.MINHASH_K_ORACLE, n_bands=P.MINHASH_BANDS_ORACLE
    )
    dropped_by_batch_op = {r.new_id for r in pairs.collect()}
    assert dropped_by_batch_op == {100}

    out = str(tmp_path / "out2")
    idx = str(tmp_path / "idx2")
    fn = se.neardup_ingest_batch_fn(out, idx, threshold=0.9)
    fn(corpus, 0)
    fn(new, 1)
    admitted = {r.doc_id for r in spark.read.parquet(f"{out}/batch=1").collect()}
    assert admitted == {101}


# --- budget_cap_sample -------------------------------------------------------


def test_budget_cap_sample_matches_oracle(spark, duck):
    assert_matches_oracle(
        llmdata.q_budget_cap_sample(spark, SF_DIR),
        duck,
        llmdata.Q_BUDGET_CAP_SAMPLE_SQL,
    )


def test_budget_cap_sample_properties(spark):
    from procurement_system_bigdata_spark.operators import sampling

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (10 + i)), "s" + str(i % 2)) for i in range(20)],
        "doc_id long, text string, source string",
    )
    out = sampling.budget_cap_sample(
        docs, budget_ppm=300_000, source_col="source"
    ).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    for src, rows in by_src.items():
        total = sum(r.n_tokens for r in rows)
        kept = [r for r in rows if r.kept]
        assert kept, f"source {src} delivered nothing"
        kept_tokens = sum(r.n_tokens for r in kept)
        # within budget, modulo the always-keep-first-doc floor
        assert kept_tokens * 1_000_000 <= total * 300_000 + max(
            r.n_tokens for r in rows
        ) * 1_000_000

    # monotone: raising the budget only ADDS kept docs
    lo = {
        r.doc_id
        for r in sampling.budget_cap_sample(docs, budget_ppm=200_000).collect()
        if r.kept
    }
    hi = {
        r.doc_id
        for r in sampling.budget_cap_sample(docs, budget_ppm=600_000).collect()
        if r.kept
    }
    assert lo <= hi
