"""Conflict-graph tests: reference decision-tree cases
(conflict_graph.py:133-167) + Spark-vs-kernel differential over a
planted corpus covering every branch."""

from __future__ import annotations

from neuronews_spark.operators.conflicts import (
    cosine_py,
    detect_conflict_py,
    detect_conflicts,
    polarity_py,
)

POS = "costs increase while revenue and margin trends improve the outlook"
NEG = "costs decline while revenue and margin trends lower the outlook"
FLAT = "the quarterly outlook stays flat with costs unchanged"
OTHER = "users support the higher expansion plan and positive gain"


def test_polarity_and_cosine_kernels():
    assert polarity_py(POS) == 1
    assert polarity_py(NEG) == -1
    assert polarity_py(FLAT) == 0
    # stopwords ('the', 'and', 'while') are excluded from the bag
    assert cosine_py("the and while", POS) == 0.0
    assert cosine_py(POS, POS) == 1.0
    assert 0.0 < cosine_py(POS, NEG) < 1.0


def test_decision_tree_reference_cases():
    # direct: sim>=0.8 + opposite polarity (POS vs NEG share 7/9 tokens)
    assert cosine_py(POS, NEG) >= 0.65
    res = detect_conflict_py(POS, "news", NEG, "news")
    assert res is not None and res[0] == (
        "direct" if res[1] >= 0.8 else "implied"
    )
    # same polarity, same format, high sim, no explicit → no conflict
    assert detect_conflict_py(POS, "news", POS, "news") is None
    # cross-format upgrades to implied at sim>=0.65
    r = detect_conflict_py(POS, "news", POS, "transcript")
    assert r == ("implied", 1.0) or r[0] == "direct"  # explicit=False → implied
    assert detect_conflict_py(POS, "news", POS, "transcript") == ("implied", 1.0)
    # explicit contradiction: sim>=0.45 → direct, 0.30-0.45 → implied
    assert detect_conflict_py(POS, "news", POS, "news", explicit=True)[0] == "direct"
    lo = detect_conflict_py(FLAT, "news", NEG, "news", explicit=True)
    sim = cosine_py(FLAT, NEG)
    assert (lo is None) == (sim < 0.30)
    if lo:
        assert lo[0] == ("direct" if sim >= 0.45 else "implied")
    # unrelated texts: no conflict even with explicit flag if sim < 0.30
    assert detect_conflict_py("alpha beta gamma", "news", "delta epsilon zeta",
                              "blog", explicit=True) is None


def test_spark_matches_kernel(spark):
    types = ["news", "paper", "transcript", "blog", "note"]
    texts = [POS, NEG, FLAT, OTHER, POS + " extra token", NEG + " extra token"]
    rows = [
        (i * 10 + j, texts[(i + j) % len(texts)], types[(i * 3 + j) % len(types)],
         "topic%d" % (j % 2), "src%d" % (i % 4))
        for i in range(6)
        for j in range(2)
    ]
    claims = spark.createDataFrame(
        rows,
        "claim_id long, claim_text string, source_type string, "
        "topic string, source_name string",
    )
    explicit_rows = [
        (a, b)
        for a, _, _, ta, _ in rows
        for b, _, _, tb, _ in rows
        if a < b and ta == tb and (a + b) % 3 == 0
    ]
    explicit = spark.createDataFrame(explicit_rows, "claim_id_a long, claim_id_b long")
    got = {
        (r["claim_id_a"], r["claim_id_b"]): (r["conflict_type"], r["similarity_score"])
        for r in detect_conflicts(claims, explicit).collect()
    }

    by_id = {r[0]: r for r in rows}
    expected = {}
    eset = set(explicit_rows)
    for a in rows:
        for b in rows:
            if a[0] >= b[0] or a[3] != b[3] or a[4] == b[4]:
                continue
            res = detect_conflict_py(a[1], a[2], b[1], b[2], (a[0], b[0]) in eset)
            if res:
                expected[(a[0], b[0])] = res
    assert got == expected and len(expected) > 0


def test_controversy_graph_first_introduction_semantics(spark):
    """conflict_graph.py:329-434: node attrs come from the FIRST row (by
    sim desc, id tiebreak) that introduces the claim, a-node before
    b-node; edges carry round-3 severity."""
    from neuronews_spark.operators.conflicts import controversy_graph

    conflicts = spark.createDataFrame(
        [
            (1, 2, "direct", 0.95, "news", "blog", "t1"),
            (2, 3, "implied", 0.70, "blog", "paper", "t2"),
            (4, 5, "implied", 0.66666, "news", "news", "t3"),
        ],
        "claim_id_a long, claim_id_b long, conflict_type string, "
        "similarity_score double, source_type_a string, source_type_b string, "
        "topic string",
    )
    claims = spark.createDataFrame(
        [(i, "src%d" % i, "news") for i in range(1, 6)],
        "claim_id long, source_name string, source_type string",
    )
    nodes, edges = controversy_graph(conflicts, claims, limit=2)
    n = {r["id"]: (r["topic"], r["conflict_type"]) for r in nodes.collect()}
    # limit=2 keeps the 0.95 and 0.70 rows only; claim 2 appears in both
    # but is INTRODUCED by the higher-sim row -> topic t1/direct
    assert n == {1: ("t1", "direct"), 2: ("t1", "direct"), 3: ("t2", "implied")}
    e = {(r["source"], r["target"]): r["severity"] for r in edges.collect()}
    assert e == {(1, 2): 0.95, (2, 3): 0.7}
