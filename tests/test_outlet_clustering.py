"""Outlet framing clusters (outlet_clustering.py:88-303 semantics)."""

from __future__ import annotations

import numpy as np

from neuronews_spark.operators.outlet_clustering import (
    _kmeans,
    _pca_2d,
    _silhouette,
    _ward,
    build_outlet_vectors,
    label_cluster,
    run_outlet_clustering,
)


def test_label_cluster_reference_rules():
    dom = np.array([0.8, 0.1, 0.0, 0.0, 0.0, 0.0, 0.1])
    assert label_cluster(dom) == ("economic-dominant", "economic")
    bal = np.array([0.35, 0.30, 0.05, 0.0, 0.0, 0.0, 0.3])
    assert label_cluster(bal) == ("balanced-economic-security", "economic")
    foc = np.array([0.45, 0.10, 0.05, 0.0, 0.0, 0.0, 0.4])
    # top 0.45 <= 0.50, gap to 0.4 ('other') < 0.12? 0.45-0.40=0.05 < 0.12
    assert label_cluster(foc)[0].startswith("balanced-economic")


def test_numpy_kernels_find_planted_structure():
    rng = np.random.default_rng(5)
    a = rng.normal([0, 0], 0.05, (8, 2))
    b = rng.normal([3, 3], 0.05, (8, 2))
    m = np.vstack([a, b])
    for fn in (lambda x: _kmeans(x, 2), lambda x: _ward(x, 2)):
        labels = fn(m)
        assert len(set(labels[:8].tolist())) == 1
        assert len(set(labels[8:].tolist())) == 1
        assert labels[0] != labels[8]
        assert _silhouette(m, labels) > 0.9
    coords = _pca_2d(m)
    assert coords.shape == (16, 2)
    # the two groups separate along the first principal component
    assert abs(coords[:8, 0].mean() - coords[8:, 0].mean()) > 1.0


def test_build_vectors_and_cluster_end_to_end(spark):
    rows = []
    # outlets 0-2 lean 'economic' (value/cost), 3-5 lean 'scientific'
    for s in range(3):
        for d in range(4):
            rows.append((f"eco{s}", f"value cost price total value d{d}"))
    for s in range(3):
        for d in range(4):
            rows.append((f"sci{s}", f"scan test merge sort scan d{d}"))
    docs = spark.createDataFrame(rows, "source string, text string")
    vecs = build_outlet_vectors(docs)
    got = {r["source"]: r for r in vecs.collect()}
    assert len(got) == 6 and got["eco0"]["doc_count"] == 4
    v = np.asarray(got["eco0"]["vector"])
    assert abs(np.linalg.norm(v) - 1.0) < 1e-9  # L2-normalised

    res = run_outlet_clustering(vecs, k_min=2, k_max=4)
    assigned = {r["source"]: r for r in res.assignments.collect()}
    eco_ids = {assigned[f"eco{s}"]["cluster_id"] for s in range(3)}
    sci_ids = {assigned[f"sci{s}"]["cluster_id"] for s in range(3)}
    assert len(eco_ids) == 1 and len(sci_ids) == 1 and eco_ids != sci_ids
    assert res.k == 2 and res.silhouette > 0.5
    assert res.method in ("kmeans", "hierarchical")
    assert assigned["eco0"]["dominant_frame"] == "economic"
    assert assigned["sci0"]["dominant_frame"] == "scientific"


def test_driver_gate_rejects_outlet_explosion(spark):
    import pytest

    docs = spark.createDataFrame(
        [(f"outlet{i}", "value cost") for i in range(40)],
        "source string, text string",
    )
    vecs = build_outlet_vectors(docs)
    with pytest.raises(ValueError, match="driver_max_outlets"):
        run_outlet_clustering(vecs, driver_max_outlets=10)
