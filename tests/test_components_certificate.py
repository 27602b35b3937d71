"""Round-6 closure-free cluster certificates (judge ask #4).

Covers: (a) the four rewritten registry queries hash-match their new
linear oracles; (b) the old recursive-CTE closure mirror still pins the
raw dedup_clusters operator exactly at small SF (the claim the certified
docstrings make); (c) every certificate boolean flips on a specifically
corrupted labeling — under-merge, over-merge, non-min label, bad root —
so the proof is not vacuous.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from procurement_system_bigdata_spark.functions import portable as P
from procurement_system_bigdata_spark.operators import clustering, dedup
from procurement_system_bigdata_spark.queries import llmdata
from tests.conftest import SF_DIR, assert_matches_oracle


def test_certified_queries_match_their_linear_oracles(spark, duck):
    for q, sql in [
        (llmdata.q_dedup_clusters, llmdata.Q_DEDUP_CLUSTERS_SQL),
        (
            llmdata.q_cross_source_canonicals,
            llmdata.Q_CROSS_SOURCE_CANONICALS_SQL,
        ),
        (llmdata.q_corpus_curation, llmdata.Q_CORPUS_CURATION_SQL),
        (llmdata.q_delivery_pipeline, llmdata.Q_DELIVERY_PIPELINE_SQL),
    ]:
        assert_matches_oracle(q(spark, SF_DIR), duck, sql)


def test_raw_clusters_still_match_recursive_closure(spark, duck):
    # the exact component labels stay externally pinned at small SF even
    # though the registered query now ships the certificate instead
    docs = llmdata._docs(spark, SF_DIR)
    out = clustering.dedup_clusters(
        docs,
        dedup.minhash_lsh_pairs(
            docs, k=P.MINHASH_K_ORACLE, n_bands=P.MINHASH_BANDS_ORACLE
        ),
    )
    assert_matches_oracle(
        out, duck, clustering.dedup_clusters_sql(dedup.minhash_lsh_pairs_sql())
    )


# --- certificate soundness on a hand-built graph ---------------------------
#
# graph: two components {1,2,3} (path 1-2-3) and {5,6} (edge 5-6), isolate 9


def _fixture(spark):
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 5, 6, 9)], "node long")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "src long, dst long"
    )
    return nodes, edges


def _cert(spark, labels_rows):
    nodes, edges = _fixture(spark)
    labels = spark.createDataFrame(
        labels_rows, "node long, component long, hop int"
    )
    rows = clustering.components_certificate(nodes, edges, labels).collect()
    return {r.node: r for r in rows}


TRUE_LABELS = [
    (1, 1, 0),
    (2, 1, 1),
    (3, 1, 2),
    (5, 5, 0),
    (6, 5, 1),
    (9, 9, 0),
]


def test_certificate_accepts_true_labeling(spark):
    got = _cert(spark, TRUE_LABELS)
    for r in got.values():
        assert (
            r.label_le_ok and r.root_ok and r.witness_ok and r.edges_within_ok
        ), r
    assert got[2].degree == 2 and got[9].degree == 0


def test_certificate_rejects_under_merge(spark):
    # split {1,2,3} into {1,2} and {3}: edge 2-3 crosses clusters
    bad = [(1, 1, 0), (2, 1, 1), (3, 3, 0), (5, 5, 0), (6, 5, 1), (9, 9, 0)]
    got = _cert(spark, bad)
    assert not got[2].edges_within_ok or not got[3].edges_within_ok


def test_certificate_rejects_over_merge(spark):
    # glue the disconnected {5,6} onto component 1: no crossing edge exists
    # (under-merge check passes), but 5 and 6 can never present a witness
    # path to root 1 — witness_ok must flip
    bad = [(1, 1, 0), (2, 1, 1), (3, 1, 2), (5, 1, 1), (6, 1, 2), (9, 9, 0)]
    got = _cert(spark, bad)
    assert all(r.edges_within_ok for r in got.values())
    assert not got[5].witness_ok  # no neighbor with label 1 and hop < 1


def test_certificate_rejects_non_min_label(spark):
    # label component {1,2,3} by 2 instead of its minimum 1
    bad = [(1, 2, 1), (2, 2, 0), (3, 2, 1), (5, 5, 0), (6, 5, 1), (9, 9, 0)]
    got = _cert(spark, bad)
    assert not got[1].label_le_ok  # component 2 > node 1


def test_certificate_rejects_missing_root(spark):
    # hop=0 on a non-root node (and root claims hop 1): root_ok must flip
    bad = [(1, 1, 1), (2, 1, 0), (3, 1, 2), (5, 5, 0), (6, 5, 1), (9, 9, 0)]
    got = _cert(spark, bad)
    assert not got[1].root_ok or not got[2].root_ok


def test_hops_from_connected_components_satisfy_certificate(spark):
    nodes, edges = _fixture(spark)
    labels = clustering.connected_components(nodes, edges, with_hops=True)
    rows = {r.node: r for r in labels.collect()}
    assert rows[1].component == 1 and rows[1].hop == 0
    assert rows[3].component == 1 and rows[3].hop >= 1
    cert = clustering.components_certificate(nodes, edges, labels).collect()
    assert all(
        r.label_le_ok and r.root_ok and r.witness_ok and r.edges_within_ok
        for r in cert
    )


def test_delivery_audit_booleans_all_true_on_real_run(spark):
    out = llmdata.q_delivery_pipeline(spark, SF_DIR)
    bad = out.filter(
        ~F.col("member_ok") | ~F.col("shard_ok") | ~F.col("pos_ok")
    )
    assert bad.count() == 0
