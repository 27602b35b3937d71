"""Semantic invariants for the extension operators (beyond oracle parity)."""

from __future__ import annotations

from conftest import SF_DIR

from procurement_system_bigdata_spark.operators import dedup, similarity
from procurement_system_bigdata_spark.catalog import load_table


def test_lsh_candidates_subset_of_exact(spark):
    """LSH ANN (approximate) must never invent a pair the exact scorer
    doesn't confirm, and should recover a reasonable share of them."""
    emb = load_table(spark, SF_DIR, "embeddings")
    exact = {
        (r.vec_a, r.vec_b)
        for r in similarity.cosine_neardup_pairs(emb).collect()
    }
    approx = {
        (r.vec_a, r.vec_b)
        for r in similarity.lsh_ann_candidates(emb).collect()
    }
    assert approx <= exact
    if exact:
        recall = len(approx) / len(exact)
        assert recall >= 0.3, f"LSH recall collapsed: {recall:.2f}"


def test_fingerprint_dedup_clusters_are_consistent(spark):
    """Every duplicate points at a canonical with the same fingerprint and a
    smaller-or-equal doc_id; canonicals are not duplicates themselves."""
    out = dedup.fingerprint_dedup(load_table(spark, SF_DIR, "documents")).collect()
    by_id = {r.doc_id: r for r in out}
    for r in out:
        canon = by_id[r.canonical_doc_id]
        assert canon.fingerprint == r.fingerprint
        assert canon.doc_id <= r.doc_id
        assert not canon.is_duplicate


def test_minhash_pairs_meet_threshold(spark):
    out = dedup.minhash_lsh_pairs(load_table(spark, SF_DIR, "documents")).collect()
    assert all(r.jaccard >= 0.9 for r in out)


def test_topk_is_sorted_and_bounded(spark):
    out = similarity.cosine_topk(load_table(spark, SF_DIR, "embeddings")).collect()
    per_q: dict[int, list] = {}
    for r in out:
        per_q.setdefault(r.query_id, []).append(r)
    for q, rows in per_q.items():
        rows.sort(key=lambda r: r.rank)
        assert len(rows) == 5
        sims = [r.cos_sim for r in rows]
        assert sims == sorted(sims, reverse=True)
        assert all(r.neighbor_id != q for r in rows)
