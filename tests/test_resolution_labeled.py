"""Labeled entity-resolution tests — behavioral port of the reference's
``tests/knowledge_graph/test_entity_resolution.py`` (lines cited per test),
run through the distributed blocking → scoring → clustering pipeline instead
of the sequential resolver. The tests assert cluster *membership* (exactly
what the reference tests assert), display-name election, and alias
accumulation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neuronews_spark.pipeline import resolve_from_mentions
from neuronews_spark.sources.synthetic import name_embeddings_df


def _mentions(spark, rows: list[tuple[str, str]]):
    """rows = [(entity_type, name)] → one mention per row, one conv each."""
    data = [
        (f"conv_{i:03d}", 0, name, etype) for i, (etype, name) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "conv_id string, mention_idx int, name string, entity_type string"
    )


def _clusters(result) -> dict[str, set[str]]:
    """entity name → set of member surface forms (via aliases)."""
    return {
        r["name"]: set(r["aliases"])
        for r in result.entities.collect()
    }


def _component_of(result) -> dict[str, str]:
    """surface name → component id (via vertices join components)."""
    v = result.vertices.join(result.components, "node_id")
    return {r["name"]: r["component"] for r in v.collect()}


# ----------------------------------------------------------------- people

def test_person_variants_resolve_to_one_entity(spark):
    # test_entity_resolution.py:29-39
    res = resolve_from_mentions(
        spark,
        _mentions(spark, [("Person", "Hinton"), ("Person", "Geoffrey Hinton"),
                          ("Person", "G. Hinton")]),
    )
    ents = res.entities.collect()
    assert len(ents) == 1
    assert ents[0]["name"] == "Geoffrey Hinton"  # most complete form elected
    assert {"Hinton", "Geoffrey Hinton", "G. Hinton"} <= set(ents[0]["aliases"])
    assert ents[0]["entity_type"] == "Person"


def test_different_surnames_not_merged(spark):
    # test_entity_resolution.py:42-47
    res = resolve_from_mentions(
        spark, _mentions(spark, [("Person", "John Smith"), ("Person", "Jane Smith")])
    )
    assert res.entities.count() == 2


def test_same_surname_incompatible_given_names_not_merged(spark):
    # test_entity_resolution.py:50-54
    res = resolve_from_mentions(
        spark,
        _mentions(spark, [("Person", "Geoffrey Hinton"), ("Person", "Martin Hinton")]),
    )
    assert res.entities.count() == 2


# ------------------------------------------------- organizations / concepts

def test_org_suffix_and_spacing_variants_merge(spark):
    # test_entity_resolution.py:62-68
    res = resolve_from_mentions(
        spark,
        _mentions(
            spark,
            [("Organization", "OpenAI"), ("Organization", "OpenAI Inc."),
             ("Organization", "Open AI")],
        ),
    )
    ents = res.entities.collect()
    assert len(ents) == 1
    assert {"OpenAI", "OpenAI Inc.", "Open AI"} <= set(ents[0]["aliases"])


def test_concept_plural_merges_but_distinct_stays_separate(spark):
    # test_entity_resolution.py:71-78
    res = resolve_from_mentions(
        spark,
        _mentions(
            spark,
            [("Concept", "Transformer"), ("Concept", "Transformers"),
             ("Concept", "Recurrent Neural Network")],
        ),
    )
    comp = _component_of(res)
    assert comp["Transformer"] == comp["Transformers"]
    assert comp["Recurrent Neural Network"] != comp["Transformer"]
    assert res.entities.count() == 2


def test_same_name_different_type_not_merged(spark):
    # test_entity_resolution.py:81-86
    res = resolve_from_mentions(
        spark, _mentions(spark, [("Person", "Apple"), ("Organization", "Apple")])
    )
    assert res.entities.count() == 2
    types = {r["entity_type"] for r in res.entities.collect()}
    assert types == {"Person", "Organization"}


# ------------------------------------------------------ embedding fallback

def test_embedding_fallback_merges_lexically_distant_names(spark):
    # test_entity_resolution.py:93-105
    res = resolve_from_mentions(
        spark,
        _mentions(
            spark,
            [("Concept", "New York City"), ("Concept", "NYC"),
             ("Concept", "Los Angeles")],
        ),
        name_embeddings=name_embeddings_df(spark),
    )
    comp = _component_of(res)
    assert comp["New York City"] == comp["NYC"]
    assert comp["Los Angeles"] != comp["NYC"]
    assert res.entities.count() == 2
    # the merging edge must be an embedding edge
    methods = {r["method"] for r in res.edges.collect()}
    assert "embedding" in methods


def test_no_embedding_no_merge(spark):
    res = resolve_from_mentions(
        spark,
        _mentions(spark, [("Concept", "New York City"), ("Concept", "NYC")]),
    )
    assert res.entities.count() == 2


# --------------------------------------------------------------- id map

def test_id_map_covers_all_vertices_and_points_at_entities(spark):
    res = resolve_from_mentions(
        spark,
        _mentions(spark, [("Person", "Hinton"), ("Person", "Geoffrey Hinton"),
                          ("Concept", "Transformer")]),
    )
    id_map = {r["node_id"]: r["entity_id"] for r in res.id_map.collect()}
    vertex_ids = {r["node_id"] for r in res.vertices.collect()}
    assert set(id_map) == vertex_ids
    entity_ids = {r["entity_id"] for r in res.entities.collect()}
    assert set(id_map.values()) == entity_ids
    # merged vertices share an entity id
    hinton_ids = [
        id_map[r["node_id"]]
        for r in res.vertices.filter(F.col("entity_type") == "Person").collect()
    ]
    assert len(set(hinton_ids)) == 1


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
