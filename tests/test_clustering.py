"""Connected-components property tests on constructed graphs — the registry
oracle check (recursive-CTE closure) covers the minhash graph; these cover
shapes that graph doesn't: long chains (diameter > minhash clusters) and
isolated nodes."""

from __future__ import annotations

from pyspark.sql import functions as F

from procurement_system_bigdata_spark.operators import clustering


def _components(spark, n_nodes, edge_list):
    nodes = spark.range(n_nodes).select(F.col("id").alias("node"))
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    out = clustering.connected_components(nodes, edges)
    return {r.node: r.component for r in out.collect()}


def test_chain_converges_to_min_label(spark):
    # 0-1-2-...-9 chain: diameter 9 forces multiple propagation rounds
    got = _components(spark, 12, [(i, i + 1) for i in range(9)])
    assert all(got[i] == 0 for i in range(10))
    assert got[10] == 10 and got[11] == 11  # isolated singletons


def test_multiple_components_and_edge_direction(spark):
    # triangle {0,1,2}, pair given in "reverse" direction {4,3}, singleton 5
    got = _components(spark, 6, [(0, 1), (1, 2), (2, 0), (4, 3)])
    assert got[0] == got[1] == got[2] == 0
    assert got[3] == got[4] == 3
    assert got[5] == 5


def test_dedup_clusters_partitions_docs(spark):
    from conftest import SF_DIR
    from procurement_system_bigdata_spark.catalog import load_table
    from procurement_system_bigdata_spark.operators import dedup

    docs = load_table(spark, SF_DIR, "documents")
    out = clustering.dedup_clusters(docs, dedup.minhash_lsh_pairs(docs)).collect()
    assert len(out) == docs.count()
    comp = {r.doc_id: r.component for r in out}
    # canonical id is a member of its own cluster and the cluster minimum
    assert all(comp[c] == c for c in set(comp.values()))
    assert all(c <= d for d, c in comp.items())
    # cluster_size is consistent with the partition it describes
    from collections import Counter

    sizes = Counter(comp.values())
    assert all(r.cluster_size == sizes[r.component] for r in out)


def test_nonconvergence_raises_strict_warns_lenient(spark):
    import warnings

    import pytest

    nodes = spark.range(6).select(F.col("id").alias("node"))
    edges = spark.createDataFrame([(i, i + 1) for i in range(5)], "src long, dst long")
    # diameter 5 chain cannot converge in 1 round
    with pytest.raises(RuntimeError, match="did not converge"):
        clustering.connected_components(nodes, edges, max_rounds=1)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = clustering.connected_components(nodes, edges, max_rounds=1, strict=False)
        out.collect()
        assert any("did not converge" in str(x.message) for x in w)


def test_pagerank_known_graph_and_mass(spark):
    """Closed-form check on a 3-node cycle (symmetric -> uniform ranks) and
    a hub graph (sink accumulates rank); total mass ~ |nodes| with dangling
    correction."""
    import pyspark.sql.functions as F

    nodes = spark.createDataFrame([(i,) for i in range(3)], "node long")
    cycle = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], "src long, dst long"
    )
    out = {r.node: r.rank for r in clustering.pagerank(nodes, cycle).collect()}
    assert all(abs(v - 1.0) < 1e-9 for v in out.values()), out

    # star: 0 and 1 both point at 2; 2 is dangling
    star = spark.createDataFrame([(0, 2), (1, 2)], "src long, dst long")
    out = {r.node: r.rank for r in clustering.pagerank(nodes, star, iters=30).collect()}
    assert out[2] > out[0] and abs(out[0] - out[1]) < 1e-9
    assert abs(sum(out.values()) - 3.0) < 1e-6, "rank mass must be conserved"
