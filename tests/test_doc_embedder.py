"""Document embedder: hashed TF-IDF features, dense assembly, and the
text → vector → SRP/KMeans end-to-end path (article_embedder.py analog)."""

from __future__ import annotations

import hashlib
import math

import numpy as np
from pyspark.sql import functions as F

from neuronews_spark.operators.doc_embedder import (
    assemble_dense,
    hashed_tf_vectors,
    hashed_tfidf_features,
)


def _docs(spark):
    rows = [
        (1, "alpha beta gamma alpha"),
        (2, "alpha beta gamma alpha"),          # exact dup of 1
        (3, "alpha beta gamma delta"),          # near dup
        (4, "totally different words entirely"),
        (5, "one two three four five six"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tfidf_features_match_numpy_oracle(spark):
    dim = 16
    feats = hashed_tfidf_features(_docs(spark), dim=dim).collect()
    rows = {(r["doc"], r["bucket"]): r["value"] for r in feats}

    docs = {r["doc_id"]: r["text"] for r in _docs(spark).collect()}
    n = len(docs)

    def bucket(tok: str) -> int:
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % dim

    dfc: dict[int, int] = {}
    per_doc: dict[int, dict[int, int]] = {}
    for d, text in docs.items():
        tf: dict[int, int] = {}
        for t in text.lower().split():
            tf[bucket(t)] = tf.get(bucket(t), 0) + 1
        per_doc[d] = tf
        for bkt in tf:
            dfc[bkt] = dfc.get(bkt, 0) + 1
    for d, tf in per_doc.items():
        w = {
            bkt: c * (math.log((n + 1.0) / (dfc[bkt] + 1.0)) + 1.0)
            for bkt, c in tf.items()
        }
        l2 = math.sqrt(sum(x * x for x in w.values()))
        for bkt, x in w.items():
            assert abs(rows[(d, bkt)] - round(x / l2, 6)) <= 1e-6, (d, bkt)
    assert len(rows) == sum(len(tf) for tf in per_doc.values())


def test_dense_assembly_roundtrip_and_unit_norm(spark):
    dim = 16
    feats = hashed_tfidf_features(_docs(spark), dim=dim)
    dense = assemble_dense(feats, dim=dim).collect()
    assert all(len(r["embedding"]) == dim for r in dense)
    for r in dense:
        v = np.asarray(r["embedding"], dtype=np.float64)
        assert abs(np.linalg.norm(v) - 1.0) < 1e-4  # l2-normalized
    # exact duplicate docs get identical vectors
    by_id = {r["doc"]: list(r["embedding"]) for r in dense}
    assert by_id[1] == by_id[2]


def test_tf_vectors_fast_path(spark):
    dense = hashed_tf_vectors(_docs(spark), dim=32).collect()
    by_id = {r["doc"]: np.asarray(r["embedding"], dtype=np.float64) for r in dense}
    assert by_id[1].shape == (32,)
    assert abs(np.linalg.norm(by_id[1]) - 1.0) < 1e-5
    assert np.allclose(by_id[1], by_id[2])
    # near-dup docs more similar than unrelated docs
    sim_near = float(by_id[1] @ by_id[3])
    sim_far = float(by_id[1] @ by_id[4])
    assert sim_near > sim_far


def test_text_to_srp_and_kmeans_end_to_end(spark):
    from neuronews_spark.operators.dedup import srp_lsh_near_dups
    from neuronews_spark.operators.event_clustering import (
        cluster_summary,
        kmeans_clusters,
    )

    dense = assemble_dense(hashed_tfidf_features(_docs(spark), dim=16), dim=16)
    pairs = srp_lsh_near_dups(dense, "doc", "embedding", threshold=0.99).collect()
    assert any({r["id_a"], r["id_b"]} == {1, 2} for r in pairs)  # exact dups
    assigned = kmeans_clusters(dense, k=2, id_col="doc")
    summary = cluster_summary(assigned, id_col="doc").collect()
    assert sum(r["n_members"] for r in summary) == 5
