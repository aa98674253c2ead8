"""Betweenness/closeness/eigenvector centrality vs hand-computed values.

Reference semantics (src/api/graph/metrics.py:495-574): undirected
adjacency, reachability-pair "betweenness", |reachable|/Σdist closeness,
degree-propagation eigenvector.  Graph: a-b, b-c, d-e →
components {a,b,c} and {d,e}; every value below is worked by hand in
comments.
"""

from pyspark.sql import functions as F

from neuronews_spark.operators.graph import bfs_distances, centrality_stats

EDGES = [("a", "b"), ("b", "c"), ("d", "e")]


def _edges(spark):
    return spark.createDataFrame(EDGES, "src string, dst string")


def test_bfs_distances_all_pairs(spark):
    dist = {
        (r["s"], r["n"]): r["d"] for r in bfs_distances(_edges(spark)).collect()
    }
    # component {a,b,c}: a-b=1, a-c=2 (via b), b-c=1; self rows d=0
    assert dist[("a", "a")] == 0
    assert dist[("a", "b")] == 1 and dist[("b", "a")] == 1
    assert dist[("a", "c")] == 2 and dist[("c", "a")] == 2
    assert dist[("b", "c")] == 1
    assert dist[("d", "e")] == 1
    # no cross-component rows
    assert ("a", "d") not in dist and ("d", "a") not in dist
    assert len(dist) == 9 + 4  # 3² pairs in C1 + 2² in C2


def test_bfs_max_iter_truncates(spark):
    dist = {
        (r["s"], r["n"]): r["d"]
        for r in bfs_distances(_edges(spark), max_iter=1).collect()
    }
    assert ("a", "b") in dist and ("a", "c") not in dist  # 2 hops cut


def test_centrality_stats_hand_computed(spark):
    got = {r["node_id"]: r for r in centrality_stats(_edges(spark)).collect()}
    assert set(got) == {"a", "b", "c", "d", "e"}
    # closeness = |reachable| / Σ dist
    assert got["a"]["closeness"] == round(2 / 3, 6)  # dists {b:1, c:2}
    assert got["b"]["closeness"] == 1.0              # dists {a:1, c:1}
    assert got["c"]["closeness"] == round(2 / 3, 6)
    assert got["d"]["closeness"] == 1.0              # dists {e:1}
    # betweenness: T = 3·2 + 2·1 = 8.
    # v∈C1 (c=3): (2·1) / (2·1 + 8 − 3·2) = 2/4 = 0.5
    #   (hand: v=a → connected ordered pairs avoiding a: (b,c),(c,b),
    #    (d,e),(e,d) = 4; through a: (b,c),(c,b) = 2 → 0.5)
    # v∈C2 (c=2): (1·0) / (1·0 + 8 − 2·1) = 0
    for v in "abc":
        assert got[v]["betweenness"] == 0.5
    for v in "de":
        assert got[v]["betweenness"] == 0.0
    # eigenvector = (deg + 0.1·Σ nbr deg) / n², n=5
    # a: (1 + 0.1·2)/25 = 0.048   b: (2 + 0.1·2)/25 = 0.088
    # d: (1 + 0.1·1)/25 = 0.044
    assert got["a"]["eigenvector"] == 0.048
    assert got["b"]["eigenvector"] == 0.088
    assert got["c"]["eigenvector"] == 0.048
    assert got["d"]["eigenvector"] == 0.044
    assert got["e"]["eigenvector"] == 0.044


def test_centrality_sampled_sources_matches_full(spark):
    """The sampled-sources path (CC-based component map) must agree with
    the all-pairs path on the sources it covers."""
    edges = _edges(spark)
    srcs = spark.createDataFrame([("a",), ("d",)], "node_id string")
    sampled = {
        r["node_id"]: r for r in centrality_stats(edges, sources=srcs).collect()
    }
    full = {r["node_id"]: r for r in centrality_stats(edges).collect()}
    assert set(sampled) == {"a", "d"}
    for v in sampled:
        for c in ("closeness", "betweenness", "eigenvector"):
            assert sampled[v][c] == full[v][c]


def test_centrality_single_component_betweenness_one(spark):
    """Connected graph with ≥3 nodes: every node's reachability
    betweenness is 1.0 (all connected pairs are 'through' every v)."""
    edges = spark.createDataFrame(
        [("x", "y"), ("y", "z"), ("z", "w")], "src string, dst string"
    )
    rows = centrality_stats(edges).collect()
    assert all(r["betweenness"] == 1.0 for r in rows)


def test_bfs_isolated_source_keeps_self_row(spark):
    """A requested source absent from the edge set must still emit its
    (s, s, 0) self row instead of vanishing."""
    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    srcs = spark.createDataFrame([("q",), ("a",)], "node_id string")
    dist = {
        (r["s"], r["n"]): r["d"]
        for r in bfs_distances(edges, sources=srcs).collect()
    }
    assert dist[("q", "q")] == 0
    assert dist[("a", "b")] == 1
    assert all(s != "q" or n == "q" for (s, n) in dist)


def test_centrality_capped_bfs_uses_exact_components(spark):
    """With a binding max_iter the component map must come from
    connected_components, not the truncated BFS: on a 5-node path with
    max_iter=2 every node is still in ONE component, so reachability
    betweenness is 1.0 everywhere (a BFS-derived map would split the
    path into fake components and produce sub-1 ratios)."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")],
        "src string, dst string",
    )
    got = {
        r["node_id"]: r
        for r in centrality_stats(edges, max_iter=2).collect()
    }
    assert set(got) == {"a", "b", "c", "d", "e"}
    assert all(r["betweenness"] == 1.0 for r in got.values())
    # closeness IS depth-bounded by request: a sees {b:1, c:2} → 2/3
    assert got["a"]["closeness"] == round(2 / 3, 6)
    # c sees both directions within 2 hops: {b:1, d:1, a:2, e:2} → 4/6
    assert got["c"]["closeness"] == round(4 / 6, 6)
