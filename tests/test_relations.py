"""Relationship pattern extraction (enhanced_entity_extractor.py:221-256,
599-641 semantics re-hosted as pandas-UDF scan + normalized equi-join)."""

from __future__ import annotations

from neuronews_spark.operators.relations import (
    extract_relation_candidates_py,
    extract_relations,
)


def test_kernel_patterns():
    got = extract_relation_candidates_py(
        "Geoffrey Hinton works at OpenAI Inc. Acme Corp competes with Beta LLC."
    )
    triples = {(r, s, d) for r, s, d, _ in got}
    assert ("WORKS_FOR", "Geoffrey Hinton", "OpenAI Inc") in triples
    assert any(r == "COMPETES_WITH" and "Acme Corp" in s for r, s, d in triples)
    # case-insensitive matching
    assert extract_relation_candidates_py("x DEVELOPS y")
    assert extract_relation_candidates_py("") == []


def test_extract_relations_resolves_against_vertices(spark):
    convs = spark.createDataFrame(
        [
            ("c1", "Geoffrey Hinton works at Acme Corp and uses Transformers."),
            ("c2", "Acme Corp competes with Acme Corp."),  # self → dropped
        ],
        "conv_id string, doc_text string",
    )
    vertices = spark.createDataFrame(
        [
            ("Person", "p1", "Geoffrey Hinton", "geoffrey hinton"),
            ("Organization", "o1", "Acme Corp", "acme corp"),
            ("Concept", "t1", "Transformers", "transformers"),
        ],
        "entity_type string, node_id string, name string, norm string",
    )
    rows = extract_relations(convs, vertices).collect()
    rels = {(r["relation_type"], r["src_node_id"], r["dst_node_id"]) for r in rows}
    assert ("WORKS_FOR", "p1", "o1") in rels
    # self-relation from c2 dropped
    assert not any(r["src_node_id"] == r["dst_node_id"] for r in rows)
    assert all(abs(r["confidence"] - 0.72) < 1e-9 for r in rows)


def test_relations_from_real_pipeline_vertices(spark):
    """Vertices produced by extract_mentions (type-conditional norms: the
    Organization branch strips legal suffixes, so the vertex for
    'Acme Corp' has norm 'acme') must still receive relations whose
    captured surface carries the suffix — round-1 review regression."""
    from neuronews_spark.operators.mentions import distinct_vertices, extract_mentions

    convs = spark.createDataFrame(
        [("c1", "Geoffrey Hinton works at Acme Corp in the morning.")],
        "conv_id string, doc_text string",
    )
    vertices = distinct_vertices(extract_mentions(convs))
    vrows = {r["name"]: r["norm"] for r in vertices.collect()}
    assert vrows.get("Acme Corp") == "acme"  # suffix-stripped org norm
    rows = extract_relations(convs, vertices).collect()
    rels = {(r["relation_type"], r["src_name"], r["dst_name"]) for r in rows}
    assert ("WORKS_FOR", "Geoffrey Hinton", "Acme Corp") in rels


def test_relation_confidence_tracks_entity_confidence(spark):
    """Confidence = min(src, dst entity confidence) × 0.9 — varies with the
    vertex confidences instead of a constant fold."""
    convs = spark.createDataFrame(
        [("c1", "Alpha Systems partners with Beta Group today.")],
        "conv_id string, doc_text string",
    )
    vertices = spark.createDataFrame(
        [
            ("Organization", "o1", "Alpha Systems", "alpha systems", 0.9),
            ("Organization", "o2", "Beta Group", "beta group", 0.6),
        ],
        "entity_type string, node_id string, name string, norm string, confidence double",
    )
    rows = extract_relations(convs, vertices, min_confidence=0.0).collect()
    assert rows, "expected a PARTNERS_WITH relation"
    assert all(abs(r["confidence"] - 0.6 * 0.9) < 1e-9 for r in rows)
