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


def test_triangle_stats_hand_graph(spark):
    """K4-minus-one-edge ∪ a pendant node ∪ a disjoint triangle, given as
    messy directed input (dups, both directions, a self-loop):
    K4\{c,d}: a-b a-c a-d b-c b-d → triangles abc, abd; pendant e-a;
    disjoint triangle x-y-z."""
    from neuronews_spark.operators.graph import triangle_stats

    edges = spark.createDataFrame(
        [
            ("a", "b"), ("b", "a"), ("a", "c"), ("a", "d"), ("b", "c"),
            ("b", "d"), ("b", "d"),  # dup
            ("e", "a"),
            ("x", "y"), ("y", "z"), ("z", "x"),
            ("c", "c"),  # self-loop dropped
        ],
        "src string, dst string",
    )
    got = {r["node_id"]: r for r in triangle_stats(edges).collect()}
    exp = {
        # node: (degree, triangles, clustering)
        "a": (4, 2, 2 * 2 / (4 * 3)),
        "b": (3, 2, 2 * 2 / (3 * 2)),
        "c": (2, 1, 1.0),
        "d": (2, 1, 1.0),
        "e": (1, 0, 0.0),
        "x": (2, 1, 1.0),
        "y": (2, 1, 1.0),
        "z": (2, 1, 1.0),
    }
    assert set(got) == set(exp)
    for n, (d, t, c) in exp.items():
        assert got[n]["degree"] == d, n
        assert got[n]["triangles"] == t, n
        assert got[n]["clustering"] == round(c, 6), n


def test_triangle_stats_matches_brute_force(spark):
    """Random graph vs an itertools brute force — orientation must count
    every triangle exactly once regardless of degree ties."""
    import itertools
    import random

    from neuronews_spark.operators.graph import triangle_stats

    rng = random.Random(11)
    nodes = [f"n{i:02d}" for i in range(24)]
    und = {
        tuple(sorted(p))
        for p in itertools.combinations(nodes, 2)
        if rng.random() < 0.18
    }
    edges = spark.createDataFrame(
        [(a, b) if rng.random() < 0.5 else (b, a) for a, b in und],
        "src string, dst string",
    )
    tri_per_node = {n: 0 for n in nodes}
    deg = {n: 0 for n in nodes}
    for a, b in und:
        deg[a] += 1
        deg[b] += 1
    n_tri = 0
    for a, b, c in itertools.combinations(nodes, 3):
        if (
            tuple(sorted((a, b))) in und
            and tuple(sorted((b, c))) in und
            and tuple(sorted((a, c))) in und
        ):
            n_tri += 1
            for v in (a, b, c):
                tri_per_node[v] += 1
    got = {r["node_id"]: r for r in triangle_stats(edges).collect()}
    assert n_tri > 0  # non-degenerate draw
    assert sum(r["triangles"] for r in got.values()) == 3 * n_tri
    for n in nodes:
        if deg[n] == 0:
            assert n not in got  # isolated nodes have no edge rows
            continue
        assert got[n]["degree"] == deg[n], n
        assert got[n]["triangles"] == tri_per_node[n], n


def test_related_entities_hand_graph(spark):
    from neuronews_spark.operators.graph import related_entities

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("e", "f")], ["src", "dst"]
    )
    seeds = spark.createDataFrame([("a",), ("e",)], ["node_id"])
    got = {
        (r["seed"], r["node_id"]): r["hops"]
        for r in related_entities(edges, seeds, max_depth=2).collect()
    }
    # depth-bounded: d is 3 hops from a and must NOT appear; no self rows
    assert got == {
        ("a", "b"): 1,
        ("a", "c"): 2,
        ("e", "f"): 1,
    }


def test_related_entities_isolated_seed_yields_nothing(spark):
    from neuronews_spark.operators.graph import related_entities

    edges = spark.createDataFrame([("a", "b")], ["src", "dst"])
    seeds = spark.createDataFrame([("z",)], ["node_id"])
    assert related_entities(edges, seeds, max_depth=3).count() == 0
