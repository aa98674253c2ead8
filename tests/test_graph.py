"""Graph metrics: degrees, PageRank vs a pure-python power-iteration oracle,
component stats."""

from __future__ import annotations

from neuronews_spark.operators.graph import (
    component_stats,
    degrees,
    pagerank,
    top_influencers,
)


def _pr_oracle(edges, alpha=0.85, iters=10):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    out_deg = {}
    for u, _ in edges:
        out_deg[u] = out_deg.get(u, 0) + 1
    rank = {x: 1.0 / n for x in nodes}
    for _ in range(iters):
        dangling = sum(r for x, r in rank.items() if x not in out_deg)
        inflow = {x: 0.0 for x in nodes}
        for u, v in edges:
            inflow[v] += rank[u] / out_deg[u]
        rank = {
            x: (1 - alpha) / n + alpha * (inflow[x] + dangling / n) for x in nodes
        }
    return rank


EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
    ("d", "c"),  # d has no in-edges; e (below) is dangling
    ("c", "e"),
]


def test_degrees(spark):
    edf = spark.createDataFrame(EDGES, "src string, dst string")
    got = {r["node_id"]: r for r in degrees(edf).collect()}
    assert got["a"]["out_degree"] == 2 and got["a"]["in_degree"] == 1
    assert got["c"]["in_degree"] == 3 and got["c"]["out_degree"] == 2
    assert got["e"]["out_degree"] == 0 and got["e"]["in_degree"] == 1
    assert got["d"]["degree"] == 1


def test_pagerank_matches_power_iteration_oracle(spark):
    edf = spark.createDataFrame(EDGES, "src string, dst string")
    got = {r["node_id"]: r["rank"] for r in pagerank(edf, iterations=8).collect()}
    exp = _pr_oracle(EDGES, iters=8)
    assert set(got) == set(exp)
    for k in exp:
        assert abs(got[k] - exp[k]) < 1e-9, k
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_top_influencers(spark):
    edf = spark.createDataFrame(EDGES, "src string, dst string")
    top = top_influencers(edf, k=1, iterations=8).collect()
    exp = _pr_oracle(EDGES, iters=8)
    assert top[0]["node_id"] == max(exp, key=lambda k: (exp[k], k))


def test_component_stats(spark):
    comp = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "c"), ("d", "d"), ("e", "d"), ("f", "d")],
        "node_id string, component string",
    )
    got = {r["size"]: r["n_components"] for r in component_stats(comp).collect()}
    assert got == {1: 1, 2: 1, 3: 1}
