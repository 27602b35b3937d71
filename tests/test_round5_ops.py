"""Semantic tests for the round-5 delivery/tokenizer/mixture operators:
BPE (vs a pure-Python reference), hash sharding (determinism, completeness,
partition-invariance), temperature mixture (flattening + renormalization),
vocab coverage bounds, and priority-aware canonical selection."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from procurement_system_bigdata_spark.functions import portable as P
from procurement_system_bigdata_spark.operators import bpe, sampling, sharding
from procurement_system_bigdata_spark.operators import clustering
from procurement_system_bigdata_spark.operators import text as text_ops


# --- BPE ------------------------------------------------------------------


def _word_freqs_py(texts):
    freqs: dict[str, int] = {}
    for t in texts:
        norm = " ".join(
            "".join(c if c.isalnum() else " " for c in t.lower()).split()
        )
        for w in norm.split():
            freqs[w] = freqs.get(w, 0) + 1
    return freqs


def test_learn_bpe_matches_python_reference(spark):
    """The distributed merge sequence must equal the published single-node
    algorithm verbatim — same pairs, same order, same counts."""
    texts = [
        "the cat sat on the mat",
        "the bat and the cat chat",
        "that hat is the cat hat",
        "mat bat hat chat that",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r.rank, r.left_sym, r.right_sym, r.merged, r.pair_count)
        for r in bpe.learn_bpe(docs, n_merges=6).orderBy("rank").collect()
    ]
    want = bpe.learn_bpe_reference(_word_freqs_py(texts), 6)
    assert got == want
    # merges must be learned in non-increasing count order is NOT required
    # (later merges can create new frequent pairs), but ranks must be 1..n
    assert [g[0] for g in got] == list(range(1, len(got) + 1))


def test_learn_bpe_merge_fold_handles_overlaps(spark):
    """Left-to-right non-overlapping semantics: 'aaaa' under (a,a) becomes
    [aa, aa]; 'aaa' becomes [aa, a]."""
    docs = spark.createDataFrame(
        [(1, "aaa aaaa aaa aaaa")], "doc_id long, text string"
    )
    got = [
        (r.rank, r.left_sym, r.right_sym, r.pair_count)
        for r in bpe.learn_bpe(docs, n_merges=2).orderBy("rank").collect()
    ]
    want = [
        (r, l, rr, c)
        for r, l, rr, _m, c in bpe.learn_bpe_reference(
            {"aaa": 2, "aaaa": 2}, 2
        )
    ]
    assert got == want
    # round 1 merges (a,a): aaa has 2 adjacent pairs, aaaa has 3 -> 10 total
    assert got[0] == (1, "a", "a", 10)


def test_bpe_top_pairs_is_first_learn_round(spark, duck):
    """bpe_top_pairs rank 1 must equal learn_bpe's first merge — it is the
    oracle-checked face of the iterative loop."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(["banana bandana", "ban the banana"])],
        "doc_id long, text string",
    )
    top = bpe.bpe_top_pairs(docs, top_k=3).orderBy("rank").collect()
    first_merge = bpe.learn_bpe(docs, n_merges=1).collect()[0]
    assert (top[0].left_sym, top[0].right_sym, top[0].pair_count) == (
        first_merge.left_sym,
        first_merge.right_sym,
        first_merge.pair_count,
    )


# --- sharding -------------------------------------------------------------


def test_training_shards_complete_and_contiguous(spark):
    docs = spark.createDataFrame(
        [(i, f"word{i} filler text") for i in range(200)],
        "doc_id long, text string",
    )
    out = sharding.training_shards(docs, n_shards=8).collect()
    assert len(out) == 200
    assert {r.doc_id for r in out} == set(range(200))
    by_shard: dict[int, list[int]] = {}
    for r in out:
        assert 0 <= r.shard_id < 8
        by_shard.setdefault(r.shard_id, []).append(r.pos)
    for positions in by_shard.values():
        assert sorted(positions) == list(range(len(positions)))


def test_training_shards_partition_invariant(spark):
    """The assignment and intra-shard order must not depend on the input
    partitioning — the property df.orderBy(rand()) does NOT have."""
    docs = spark.createDataFrame(
        [(i, f"tok{i}") for i in range(100)], "doc_id long, text string"
    )
    a = {
        (r.doc_id, r.shard_id, r.pos)
        for r in sharding.training_shards(docs, n_shards=4).collect()
    }
    b = {
        (r.doc_id, r.shard_id, r.pos)
        for r in sharding.training_shards(
            docs.repartition(13), n_shards=4
        ).collect()
    }
    assert a == b


def test_training_shards_order_scrambles_ids(spark):
    """The intra-shard order must be a real shuffle: positions must not be
    monotone in doc_id (the failure mode of 'order by doc_id' delivery)."""
    docs = spark.createDataFrame(
        [(i, f"tok{i}") for i in range(256)], "doc_id long, text string"
    )
    rows = sharding.training_shards(docs, n_shards=2).collect()
    by_shard: dict[int, list[tuple[int, int]]] = {}
    for r in rows:
        by_shard.setdefault(r.shard_id, []).append((r.pos, r.doc_id))
    inversions = 0
    for lst in by_shard.values():
        ids = [d for _, d in sorted(lst)]
        inversions += sum(a > b for a, b in zip(ids, ids[1:]))
    assert inversions > 10  # a sorted-by-id order would have 0


def test_shard_balance_totals(spark):
    docs = spark.createDataFrame(
        [(i, "three word doc") for i in range(90)],
        "doc_id long, text string",
    )
    shards = sharding.training_shards(docs, n_shards=8)
    bal = sharding.shard_balance(shards).collect()
    assert sum(r.n_docs for r in bal) == 90
    assert sum(r.sum_tokens for r in bal) == 270


# --- temperature mixture --------------------------------------------------


def test_temperature_mixture_flattens(spark):
    docs = spark.createDataFrame(
        [(i, "w " * (1 if i % 10 else 100), f"src{i % 2}") for i in range(20)],
        "doc_id long, text string, source string",
    )
    rows = {
        r.source: r
        for r in sampling.temperature_mixture_weights(docs).collect()
    }
    shares = [r.temp_share for r in rows.values()]
    assert abs(sum(shares) - 1.0) < 1e-9
    # temperature flattening: head source moves DOWN toward 0.5, tail UP
    head = max(rows.values(), key=lambda r: r.token_share)
    tail = min(rows.values(), key=lambda r: r.token_share)
    assert head.token_share > head.temp_share > 0.5 > tail.token_share
    assert tail.temp_share > tail.token_share
    assert head.boost < 1.0 < tail.boost
    # sqrt law (up to micro-unit fixed point): temp_share ratio ~ sqrt ratio
    want = math.sqrt(head.token_share) / (
        math.sqrt(head.token_share) + math.sqrt(tail.token_share)
    )
    assert abs(head.temp_share - want) < 1e-5


def test_temperature_mixture_empty_source_flagged(spark):
    docs = spark.createDataFrame(
        [(1, "real content here", "src0"), (2, "", "src1"), (3, None, "src1")],
        "doc_id long, text string, source string",
    )
    rows = {
        r.source: r
        for r in sampling.temperature_mixture_weights(docs).collect()
    }
    assert rows["src1"].n_tokens == 0
    assert rows["src1"].boost == 0.0
    assert rows["src0"].temp_share == 1.0


# --- vocab coverage -------------------------------------------------------


def test_vocab_coverage_bounds_and_closed_form(spark):
    # vocab_top=2 over a corpus where 'aa' and 'bb' dominate
    docs = spark.createDataFrame(
        [
            (1, "aa aa bb bb aa"),        # all in top-2 vocab -> oov 0
            (2, "aa zz qq"),              # 2 of 3 oov
            (3, ""),                      # empty -> 0 tokens, rate 0
        ],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r for r in text_ops.vocab_coverage(docs, vocab_top=2).collect()
    }
    assert rows[1].n_oov == 0 and rows[1].oov_rate == 0.0
    assert rows[2].n_tokens == 3 and rows[2].n_oov == 2
    assert abs(rows[2].oov_rate - 2 / 3) < 1e-12
    assert rows[3].n_tokens == 0 and rows[3].oov_rate == 0.0


def test_vocab_coverage_tiebreak_is_lexicographic(spark):
    # 'aa' and 'zz' tie on frequency; with vocab_top=1 the cut must keep
    # 'aa' (freq DESC, token ASC)
    docs = spark.createDataFrame(
        [(1, "zz aa"), (2, "aa zz")], "doc_id long, text string"
    )
    rows = {
        r.doc_id: r for r in text_ops.vocab_coverage(docs, vocab_top=1).collect()
    }
    assert rows[1].n_oov == 1 and rows[2].n_oov == 1


# --- cross-source canonicals ----------------------------------------------


def test_cross_source_canonicals_respects_priority(spark):
    """A near-dup cluster spanning web (low priority, small id) and curated
    (high priority, big id) must keep the CURATED copy — the case where
    min-doc_id dedup picks wrong."""
    docs = spark.createDataFrame(
        [
            (1, "identical content block one", "web"),
            (2, "identical content block one", "web"),
            (9, "identical content block one", "curated"),
            (5, "unrelated lonely document", "web"),
        ],
        "doc_id long, text string, source string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 9)], "doc_a long, doc_b long"
    )
    out = {
        r.doc_id: r
        for r in clustering.cross_source_canonicals(
            docs, pairs, priority={"curated": 0, "web": 5}
        ).collect()
    }
    assert out[9].keep and out[9].canonical_id == 9
    assert not out[1].keep and out[1].canonical_id == 9
    assert not out[2].keep and out[2].canonical_id == 9
    assert out[5].keep and out[5].canonical_id == 5
    # exactly one keeper per component
    comps: dict[int, int] = {}
    for r in out.values():
        comps[r.component] = comps.get(r.component, 0) + (1 if r.keep else 0)
    assert all(v == 1 for v in comps.values())


def test_cross_source_canonicals_unknown_source_ranks_last(spark):
    docs = spark.createDataFrame(
        [(1, "same text", "mystery"), (2, "same text", "web")],
        "doc_id long, text string, source string",
    )
    pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    out = {
        r.doc_id: r
        for r in clustering.cross_source_canonicals(
            docs, pairs, priority={"web": 5}
        ).collect()
    }
    # 'mystery' is absent from the priority map -> ranks last despite id 1
    assert out[2].keep and not out[1].keep


# --- hard negatives -------------------------------------------------------


def test_hard_negatives_cross_label_and_ranked(spark):
    from procurement_system_bigdata_spark.operators import similarity

    # anchor 0 (label 0): nearest same-label vec must NOT appear; nearest
    # cross-label by construction is vec 10 (label 1, almost parallel)
    rows = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [0.99, 0.1, 0.0], 0),    # same label, closest overall
        (10, [0.95, 0.3, 0.0], 1),   # cross label, closest negative
        (11, [0.0, 1.0, 0.0], 1),
        (12, [0.0, 0.9, 0.4], 2),
        (13, [-1.0, 0.0, 0.0], 1),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = [
        r
        for r in similarity.hard_negatives(emb, k=3, n_queries=1).collect()
    ]
    assert [r.rank for r in sorted(out, key=lambda r: r.rank)] == [1, 2, 3]
    ids = {r.neighbor_id for r in out}
    assert 1 not in ids and 0 not in ids  # same-label and self excluded
    top = min(out, key=lambda r: r.rank)
    assert top.neighbor_id == 10


# --- zipf spectrum --------------------------------------------------------


def test_zipf_spectrum_closed_form(spark):
    from procurement_system_bigdata_spark.operators import text as t

    docs = spark.createDataFrame(
        [(1, "aa aa aa bb bb cc"), (2, "bb dd")],
        "doc_id long, text string",
    )
    # counts: aa=3, bb=3, cc=1, dd=1
    rows = {r.freq: r for r in t.zipf_spectrum(docs).collect()}
    assert rows[3].n_types == 2 and rows[3].min_token == "aa"
    assert rows[1].n_types == 2 and rows[1].min_token == "cc"
    assert set(rows) == {1, 3}


# --- source contamination report ------------------------------------------


def test_source_contamination_rates(spark):
    from procurement_system_bigdata_spark.operators import decontam

    bench = spark.createDataFrame(
        [(100, "leak one two three four five")],
        "bench_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "leak one two three four five tail", "web"),   # contaminated
            (2, "totally clean document body here", "web"),
            (3, "curated spotless content piece", "books"),
        ],
        "doc_id long, text string, source string",
    )
    rows = {
        r.source: r
        for r in decontam.source_contamination_report(
            corpus, bench, n=3
        ).collect()
    }
    assert rows["web"].n_docs == 2 and rows["web"].n_contaminated == 1
    assert rows["web"].contamination_rate == 0.5
    assert rows["books"].n_contaminated == 0
    assert rows["books"].contamination_rate == 0.0


# --- physical shard writer ------------------------------------------------


def test_write_training_shards_roundtrip(spark, tmp_path):
    """Shard files must contain exactly the assigned docs, in pos order
    within each shard directory."""
    docs = spark.createDataFrame(
        [(i, f"doc{i} body text") for i in range(120)],
        "doc_id long, text string",
    )
    path = str(tmp_path / "shards")
    sharding.write_training_shards(docs, path, n_shards=4)
    want = {
        (r.doc_id, r.shard_id, r.pos)
        for r in sharding.training_shards(docs, n_shards=4).collect()
    }
    back = spark.read.parquet(path)
    got = {
        (r.doc_id, int(r.shard_id), r.pos) for r in back.collect()
    }
    assert got == want
    # stored row order within each shard's files == pos order
    import glob

    for s in range(4):
        files = sorted(glob.glob(f"{path}/shard_id={s}/*.parquet"))
        assert files, f"no files for shard {s}"
        rows = []
        for f in files:
            rows.extend(
                spark.read.parquet(f).select("pos").toPandas()["pos"].tolist()
            )
        assert rows == sorted(rows)


# --- perplexity buckets ---------------------------------------------------


def test_lm_perplexity_buckets_properties(spark):
    """Terciles are per source, head >= middle >= tail in min_logscore,
    and bucket doc counts are balanced within 1."""
    from procurement_system_bigdata_spark.operators import text as t

    rows = []
    # training slice for the LM
    for i in range(6):
        rows.append((1000 + i, "the quick brown fox jumps high", "src0"))
    # scored: two sources, 9 docs each, varying fluency
    for i in range(9):
        frag = "the quick brown fox" if i < 3 else "zzz qqq xxx www"
        rows.append((i, f"{frag} jumps high round {i}", "srcA"))
        rows.append((100 + i, f"{frag} extra words here {i}", "srcB"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = t.lm_perplexity_buckets(docs).collect()
    by_src: dict[str, dict[int, object]] = {}
    for r in out:
        by_src.setdefault(r.source, {})[r.bucket] = r
    assert set(by_src) == {"srcA", "srcB"}
    for src, buckets in by_src.items():
        assert set(buckets) == {1, 2, 3}
        counts = [buckets[b].n_docs for b in (1, 2, 3)]
        assert max(counts) - min(counts) <= 1 and sum(counts) == 9
        # head's worst score >= middle's worst >= tail's worst
        assert (
            buckets[1].min_logscore
            >= buckets[2].min_logscore
            >= buckets[3].min_logscore
        )


# --- BPE segmentation -----------------------------------------------------


def _segment_py(word, merges):
    syms = list(word)
    for l, r in merges:
        i = 0
        while i < len(syms) - 1:
            if syms[i] == l and syms[i + 1] == r:
                syms[i : i + 2] = [l + r]
            i += 1
    return syms


def test_bpe_segment_matches_python_reference(spark):
    texts = ["banana bandana cabana", "ban banana the bandana"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = [
        (r.left_sym, r.right_sym)
        for r in bpe.learn_bpe(docs, n_merges=4).orderBy("rank").collect()
    ]
    out = {r.doc_id: r for r in bpe.bpe_segment(docs, merges).collect()}
    for i, t in enumerate(texts):
        words = t.split()
        want_tokens = sum(len(_segment_py(w, merges)) for w in words)
        assert out[i].n_words == len(words)
        assert out[i].n_tokens == want_tokens
        assert abs(out[i].fertility - want_tokens / len(words)) < 1e-12


def test_bpe_segment_no_merges_is_char_count(spark):
    docs = spark.createDataFrame(
        [(1, "ab cde")], "doc_id long, text string"
    )
    r = bpe.bpe_segment(docs, []).collect()[0]
    assert r.n_words == 2 and r.n_tokens == 5 and r.fertility == 2.5


# --- cross-source overlap -------------------------------------------------


def test_cross_source_overlap_unordered_pairs(spark):
    docs = spark.createDataFrame(
        [
            (1, "x", "web"),
            (2, "x", "books"),
            (3, "x", "web"),
            (4, "x", "curated"),
        ],
        "doc_id long, text string, source string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (1, 4)], "doc_a long, doc_b long"
    )
    rows = {
        (r.source_a, r.source_b): r.n_pairs
        for r in clustering.cross_source_overlap(docs, pairs).collect()
    }
    # (1,2)=web/books, (2,3)=books/web -> both land on (books, web)
    assert rows[("books", "web")] == 2
    assert rows[("web", "web")] == 1
    assert rows[("curated", "web")] == 1


# --- shared-span removal --------------------------------------------------


def test_remove_shared_spans_excises_only_shared(spark):
    from procurement_system_bigdata_spark.operators import dedup as dd

    shared = "one two three four five"  # the 5-gram both docs carry
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {shared} gamma delta"),
            (2, f"{shared} epsilon zeta eta theta iota"),
            (3, "totally unique words nobody else repeats anywhere"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in dd.remove_shared_spans(docs, n=5).collect()}
    assert rows[1].clean_text == "alpha beta gamma delta"
    assert rows[1].n_removed == 5
    assert rows[2].clean_text == "epsilon zeta eta theta iota"
    assert rows[3].n_removed == 0
    assert rows[3].clean_text == "totally unique words nobody else repeats anywhere"


def test_remove_shared_spans_full_duplicate_empties(spark):
    from procurement_system_bigdata_spark.operators import dedup as dd

    t = "exact copy of this whole document body"
    docs = spark.createDataFrame(
        [(1, t), (2, t)], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in dd.remove_shared_spans(docs, n=5).collect()}
    for r in rows.values():
        assert r.n_removed == r.n_words and r.clean_text == ""


def test_remove_shared_spans_overlapping_windows_cover_union(spark):
    from procurement_system_bigdata_spark.operators import dedup as dd

    # doc 1 shares TWO overlapping 3-grams with docs 2/3: covered positions
    # are the union, not double-removed
    docs = spark.createDataFrame(
        [
            (1, "pad1 a b c d pad2"),
            (2, "a b c xx yy zz qq"),
            (3, "b c d ww vv uu tt"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in dd.remove_shared_spans(docs, n=3).collect()}
    assert rows[1].clean_text == "pad1 pad2"
    assert rows[1].n_removed == 4


# --- dataset diff ---------------------------------------------------------


def test_dataset_diff_classes(spark):
    from procurement_system_bigdata_spark.operators import merge as mg

    old = spark.createDataFrame(
        [(1, "same text"), (2, "will change"), (3, "will be removed")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "same text"), (2, "changed now"), (4, "brand new doc")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in mg.dataset_diff(old, new).collect()}
    assert rows[1].change == "unchanged"
    assert rows[2].change == "modified" and rows[2].old_fp != rows[2].new_fp
    assert rows[3].change == "removed" and rows[3].new_fp is None
    assert rows[4].change == "added" and rows[4].old_fp is None
    summary = {
        r.change: r.n_docs
        for r in mg.dataset_diff_summary(mg.dataset_diff(old, new)).collect()
    }
    assert summary == {"unchanged": 1, "modified": 1, "removed": 1, "added": 1}


def test_dataset_diff_normalization_insensitive(spark):
    """Case/punctuation-only edits are NOT 'modified' — the diff keys on the
    normalized fingerprint, matching the dedup family's notion of
    content identity."""
    from procurement_system_bigdata_spark.operators import merge as mg

    old = spark.createDataFrame([(1, "Hello, World!")], "doc_id long, text string")
    new = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    assert mg.dataset_diff(old, new).collect()[0].change == "unchanged"


# --- split leakage --------------------------------------------------------


def test_split_leakage_counts_cross_boundary_pairs(spark):
    splits = spark.createDataFrame(
        [(1, "train"), (2, "test"), (3, "train"), (4, "val"), (5, "train")],
        "doc_id long, split string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 4), (3, 5)], "doc_a long, doc_b long"
    )
    rows = {
        (r.split_a, r.split_b): r.n_pairs
        for r in sampling.split_leakage_report(splits, pairs).collect()
    }
    assert rows[("test", "train")] == 1   # the leak: pair (1,2)
    assert rows[("train", "train")] == 2  # (1,3) and (3,5)
    assert rows[("test", "val")] == 1     # (2,4)
    assert ("train", "val") not in rows


def test_dataset_diff_null_text_is_content_not_absence(spark):
    """NULL text fingerprints as empty text: fp-nullness means row-ABSENCE
    in the change logic, so an un-coalesced NULL would misclassify a
    present row as added/removed (review finding)."""
    from procurement_system_bigdata_spark.operators import merge as mg

    old = spark.createDataFrame(
        [(1, None), (2, "kept"), (3, None)], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "now has text"), (2, "kept"), (3, None)],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in mg.dataset_diff(old, new).collect()}
    assert rows[1].change == "modified"   # NULL -> text is a content edit
    assert rows[2].change == "unchanged"
    assert rows[3].change == "unchanged"  # NULL -> NULL is not a change
