"""Transitive clustering: iterative connected components on DataFrames.

The reference achieves global transitive merging through its sequential
backfill (``resolution.py:229-264`` re-resolves every node against the
resolver's accumulating state). The distributed equivalent is connected
components over the matched-pair edge list — implemented here as the
**large-star / small-star** algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", SOCC'14), which converges in
O(log n) rounds and maps to plain DataFrame joins + aggregations:

  large-star: for each node u, attach every *larger* neighbor v to
              m(u) = min(N(u) ∪ {u})
  small-star: orient edges to (larger → smaller); attach all smaller
              neighbors and u itself to the minimum neighbor

Vertex ids are strings (surrogate node ids); min/ordering is plain string
ordering — no dense-int relabeling pass is needed, which matters at
10^12-turn scale where relabeling would itself be a full shuffle.

Each round materializes via ``localCheckpoint`` to truncate the lineage
(otherwise the plan doubles per iteration), and convergence is detected by
an order-insensitive xxhash64 signature of the edge set. An optional
``checkpoint_cb`` lets the pipeline persist per-round edges for resume.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon(edges: DataFrame) -> DataFrame:
    """Undirected canonical form (min, max), self-loops dropped, distinct."""
    return (
        edges.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _signature(edges: DataFrame) -> tuple[int, int]:
    # hash sum in decimal(38) — ANSI mode would overflow a long sum
    row = edges.select(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def _large_star(edges: DataFrame) -> DataFrame:
    bi = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    mins = bi.groupBy("src").agg(F.min("dst").alias("mn"))
    mins = mins.select(
        F.col("src").alias("u"), F.least("mn", F.col("src")).alias("m")
    )
    return (
        bi.join(mins, bi["src"] == mins["u"])
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    oriented = edges.select(
        F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
    ).filter(F.col("u") != F.col("v"))
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    part1 = (
        oriented.join(mins, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
    )
    part2 = mins.select(F.col("u").alias("src"), F.col("m").alias("dst"))
    return part1.union(part2)


def _components_driver(edges: DataFrame) -> DataFrame:
    """Union-find on the driver for SMALL edge sets — the fast path behind
    :func:`connected_components`'s size gate. One collect + one
    createDataFrame; removes the O(log n) rounds of driver-coordinated
    jobs whose fixed per-round latency dominates small graphs (and drags
    scaling efficiency, since it parallelizes with neither cores nor
    data). Output contract identical: component = lexicographic min id."""
    # Index-based storage: each node string is held ONCE (ids dict +
    # names list); the union-find itself runs on a compact int64 array
    # (8 B/node vs a ~100 B dict slot per node in a str→str parent dict)
    # — roughly halves driver heap at the size gate and makes find() a
    # pure array walk instead of per-hop dict hashing.
    from array import array

    ids: dict[str, int] = {}
    names: list[str] = []
    parent = array("q")

    def intern(x: str) -> int:
        i = ids.get(x)
        if i is None:
            i = len(names)
            ids[x] = i
            names.append(x)
            parent.append(i)
        return i

    def find(x: int) -> int:
        # path halving: single pass, no second write loop
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    # toLocalIterator streams one partition at a time: the driver never holds
    # the full list of Row objects, only the interned strings + int arrays
    # (the real driver-heap cost, which the size gate bounds)
    for r in edges.select("src", "dst").toLocalIterator(prefetchPartitions=True):
        ra, rb = find(intern(r["src"])), find(intern(r["dst"]))
        if ra != rb:
            # union by min id keeps the root the lexicographic minimum
            # (indices are first-seen order, so compare the STRINGS)
            if names[rb] < names[ra]:
                ra, rb = rb, ra
            parent[rb] = ra
    # Arrow-path createDataFrame from two string columns — no list of
    # 2M Python tuples on the peak-heap path
    import pandas as pd

    spark = edges.sparkSession
    if not names:
        return spark.createDataFrame([], "node_id string, component string")
    pdf = pd.DataFrame(
        {
            "node_id": names,
            "component": [names[find(i)] for i in range(len(names))],
        }
    )
    return spark.createDataFrame(pdf, "node_id string, component string")


# edge sets at or below this collect to the driver; the sustained cost is
# the union-find parent dict (≤2 nodes/edge × two ~17-char string ids +
# dict overhead ≈ 150-300 bytes/node → ~0.3-0.6 GB at the gate — rows
# themselves stream via toLocalIterator and are not all held at once).
# Above it the large-star/small-star loop engages.
DRIVER_CC_MAX_EDGES = 1_000_000


def connected_components(
    edges: DataFrame,
    max_iterations: int = 30,
    checkpoint_cb: Callable[[int, DataFrame], DataFrame] | None = None,
    driver_max_edges: int = DRIVER_CC_MAX_EDGES,
) -> DataFrame:
    """edges(src, dst) → (node_id, component) for every node that appears in
    ≥1 edge; ``component`` is the lexicographic minimum id of the cluster.

    Matched-pair graphs are tiny relative to the input (distinct surface
    forms, then only pairs that cleared scoring), so below
    ``driver_max_edges`` a driver-side union-find answers in one collect;
    the distributed star loop handles everything larger.

    ``checkpoint_cb(iteration, edges) -> edges`` may persist and re-read the
    per-round edge set (stage resumability); by default rounds are pinned
    with ``localCheckpoint`` only.
    """
    e = _canon(edges)
    e = e.localCheckpoint(eager=True)
    prev_sig = _signature(e)
    if prev_sig[0] == 0:
        return edges.sparkSession.createDataFrame([], "node_id string, component string")
    if prev_sig[0] <= driver_max_edges:
        return _components_driver(e)

    for it in range(max_iterations):
        e2 = _canon(_small_star(_large_star(e)))
        if checkpoint_cb is not None:
            e2 = checkpoint_cb(it, e2)
        else:
            e2 = e2.localCheckpoint(eager=True)
        sig = _signature(e2)
        e = e2
        if sig == prev_sig:
            break
        prev_sig = sig

    # Converged state is a set of stars; in canonical (min, max) edge form
    # the root is always ``src``, members are ``dst``.
    comp = e.select(F.col("dst").alias("node_id"), F.col("src").alias("component"))
    roots = e.select(F.col("src").alias("node_id"), F.col("src").alias("component"))
    return comp.union(roots).distinct()


def components_for_vertices(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "node_id",
    max_iterations: int = 30,
    checkpoint_cb: Callable[[int, DataFrame], DataFrame] | None = None,
    driver_max_edges: int = DRIVER_CC_MAX_EDGES,
) -> DataFrame:
    """All vertices → (node_id, component); isolated vertices become their
    own singleton component (the reference: an unmatched mention creates a
    fresh canonical node, resolution.py:140-149)."""
    cc = connected_components(
        edges,
        max_iterations=max_iterations,
        checkpoint_cb=checkpoint_cb,
        driver_max_edges=driver_max_edges,
    )
    ids = vertices.select(F.col(id_col).alias("node_id")).distinct()
    return ids.join(cc, "node_id", "left").select(
        "node_id", F.coalesce("component", "node_id").alias("component")
    )
