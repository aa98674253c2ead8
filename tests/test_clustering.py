"""Connected components (large-star/small-star) — verified against a
driver-side union-find oracle on random graphs."""

from __future__ import annotations

import random

from neuronews_spark.operators.clustering import (
    components_for_vertices,
    connected_components,
)


def _uf_oracle(n: int, edges: list[tuple[int, int]]) -> dict[str, str]:
    parent = list(range(n))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    comp: dict[int, int] = {}
    for i in range(n):
        comp[i] = find(i)
    # components labeled by min member id (string form, matching the engine)
    by_root: dict[int, list[int]] = {}
    for i, r in comp.items():
        by_root.setdefault(r, []).append(i)
    out = {}
    for members in by_root.values():
        label = f"v{min(members):04d}"
        for m in members:
            out[f"v{m:04d}"] = label
    return out


def _run(spark, n: int, edges: list[tuple[int, int]]) -> dict[str, str]:
    edf = spark.createDataFrame(
        [(f"v{u:04d}", f"v{v:04d}") for u, v in edges] or [("vXXXX", "vXXXX")],
        "src string, dst string",
    )
    vdf = spark.createDataFrame([(f"v{i:04d}",) for i in range(n)], "node_id string")
    got = components_for_vertices(vdf, edf)
    return {r["node_id"]: r["component"] for r in got.collect()}


def test_chain_collapses_to_one_component(spark):
    n = 12
    edges = [(i, i + 1) for i in range(n - 1)]
    got = _run(spark, n, edges)
    assert set(got.values()) == {"v0000"}


def test_two_components_and_singletons(spark):
    got = _run(spark, 7, [(0, 1), (1, 2), (4, 5)])
    assert got["v0000"] == got["v0001"] == got["v0002"] == "v0000"
    assert got["v0004"] == got["v0005"] == "v0004"
    assert got["v0003"] == "v0003"  # isolated vertex = own singleton
    assert got["v0006"] == "v0006"


def test_random_graphs_match_union_find(spark):
    rng = random.Random(1234)
    for trial in range(3):
        n = 60
        m = rng.randrange(20, 80)
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        got = _run(spark, n, edges)
        exp = _uf_oracle(n, edges)
        assert got == exp, f"trial {trial}"


def test_self_loops_and_duplicates_ignored(spark):
    edf = spark.createDataFrame(
        [("a", "a"), ("a", "b"), ("b", "a"), ("a", "b")], "src string, dst string"
    )
    got = {r["node_id"]: r["component"] for r in connected_components(edf).collect()}
    assert got == {"a": "a", "b": "a"}


def test_empty_edges(spark):
    edf = spark.createDataFrame([], "src string, dst string")
    assert connected_components(edf).count() == 0


def test_star_loop_matches_driver_union_find(spark):
    """Differential: the distributed large-star/small-star path (forced via
    driver_max_edges=0) must agree exactly with the driver union-find fast
    path on a random graph."""
    import random

    rng = random.Random(7)
    edges = [
        (f"n{rng.randrange(60):02d}", f"n{rng.randrange(60):02d}")
        for _ in range(80)
    ]
    edf = spark.createDataFrame(edges, "src string, dst string")
    fast = {
        (r["node_id"], r["component"])
        for r in connected_components(edf).collect()
    }
    loop = {
        (r["node_id"], r["component"])
        for r in connected_components(edf, driver_max_edges=0).collect()
    }
    assert fast == loop and len(fast) > 0
