"""Canonical backfill semantics — port of the reference's store-backfill
tests (test_entity_resolution.py:113-149): node merging remaps triples to
canonical ids, self-loops are dropped, and re-asserted facts accumulate
provenance with the max-confidence representative."""

from __future__ import annotations

from pyspark.sql import functions as F

from neuronews_spark.kg.ontology import constraint_rows, is_valid_relation
from neuronews_spark.operators.canonicalize import (
    accumulate_provenance,
    remap_edges,
)
from neuronews_spark.pipeline import resolve_from_mentions


def _mentions(spark, rows):
    data = [(f"conv_{i:03d}", 0, name, etype) for i, (etype, name) in enumerate(rows)]
    return spark.createDataFrame(
        data, "conv_id string, mention_idx int, name string, entity_type string"
    )


def test_canonicalize_merges_nodes_and_remaps_triples(spark):
    # test_entity_resolution.py:113-132: two person fragments collapse; both
    # AUTHORED_BY/MENTIONS triples survive pointing at the canonical person.
    res = resolve_from_mentions(
        spark, _mentions(spark, [("Person", "Hinton"), ("Person", "Geoffrey Hinton")])
    )
    id_rows = {r["node_id"]: r["entity_id"] for r in res.id_map.collect()}
    assert len(set(id_rows.values())) == 1  # one canonical person

    hinton_id, geoff_id = sorted(id_rows)
    edges = spark.createDataFrame(
        [
            ("doc1", "AUTHORED_BY", hinton_id, "doc1", 0.9, "c1", "x"),
            ("doc1", "MENTIONS", geoff_id, "doc1", 0.9, "c1", "x"),
        ],
        "subject string, predicate string, object string, source_doc string,"
        " confidence double, chunk_id string, extractor string",
    )
    remapped = remap_edges(edges, res.id_map).collect()
    assert len(remapped) == 2
    objs = {r["object"] for r in remapped}
    assert objs == set(id_rows.values())  # both now point at the canonical id


def test_self_loops_dropped_after_merge(spark):
    res = resolve_from_mentions(
        spark, _mentions(spark, [("Concept", "Transformer"), ("Concept", "Transformers")])
    )
    ids = sorted({r["node_id"] for r in res.id_map.collect()})
    a, b = ids[0], ids[1]
    # an edge between two fragments of the SAME entity collapses to a
    # self-loop after remapping → dropped (resolution.py:256-257)
    edges = spark.createDataFrame(
        [(a, "PART_OF", b, "d", 0.5, None, None)],
        "subject string, predicate string, object string, source_doc string,"
        " confidence double, chunk_id string, extractor string",
    )
    assert remap_edges(edges, res.id_map).count() == 0


def test_provenance_accumulates_on_merged_facts(spark):
    # test_entity_resolution.py:135-149: both DEFINES assertions collapse to
    # one fact with 2 provenance records; max-confidence representative kept
    res = resolve_from_mentions(
        spark, _mentions(spark, [("Concept", "Transformer"), ("Concept", "Transformers")])
    )
    ids = sorted({r["node_id"] for r in res.id_map.collect()})
    edges = spark.createDataFrame(
        [
            ("doc:paper", "DEFINES", ids[0], "doc:paper", 0.8, "x", "e1"),
            ("doc:paper", "DEFINES", ids[1], "doc:paper", 0.6, "y", "e2"),
        ],
        "subject string, predicate string, object string, source_doc string,"
        " confidence double, chunk_id string, extractor string",
    )
    facts = accumulate_provenance(remap_edges(edges, res.id_map)).collect()
    assert len(facts) == 1
    f = facts[0]
    assert f["n_assertions"] == 2
    assert len(f["provenances"]) == 2
    assert f["provenance"]["confidence"] == 0.8  # max-confidence representative


def test_ontology_constraint_rows_match_validator(spark):
    # the broadcast allow-list must agree with the subtype-aware validator
    # (reference test_kg_foundation.py:55-77 parametrized matrix)
    from neuronews_spark.kg.ontology import EntityType, RelationType

    rows = set(constraint_rows())
    for rel in RelationType:
        for st in EntityType:
            for ot in EntityType:
                expected = is_valid_relation(rel, st, ot)
                assert ((rel.value, st.value, ot.value) in rows) == expected


def test_ontology_join_filter_quarantines_invalid(spark):
    rules = spark.createDataFrame(
        constraint_rows(), "predicate string, subject_type string, object_type string"
    )
    edges = spark.createDataFrame(
        [
            ("d1", "MENTIONS", "p1", "Document", "Person"),     # valid
            ("p1", "AUTHORED_BY", "d1", "Person", "Document"),  # invalid (reversed)
            ("c1", "PART_OF", "c2", "Concept", "Concept"),      # valid
            ("p1", "CITES", "d1", "Person", "Document"),        # invalid
        ],
        "subject string, predicate string, object string, subject_type string, object_type string",
    )
    valid = edges.join(
        F.broadcast(rules), ["predicate", "subject_type", "object_type"], "left_semi"
    )
    quarantined = edges.join(
        F.broadcast(rules), ["predicate", "subject_type", "object_type"], "left_anti"
    )
    assert valid.count() == 2
    assert {r["predicate"] for r in quarantined.collect()} == {"AUTHORED_BY", "CITES"}


def test_fused_mention_edges_matches_generic_path(spark):
    """Differential: build_mention_edges (int-shuffle fused path) must
    reproduce mentions_to_edges → remap_edges → accumulate_provenance on
    everything except the tie-broken representative (all confidences are
    equal, so the generic max_by pick is arbitrary; the fused path pins
    min mention_idx)."""
    from neuronews_spark.operators.canonicalize import (
        accumulate_provenance,
        build_mention_edges,
        mentions_to_edges,
        remap_edges,
    )
    from neuronews_spark.operators.conversations import assemble_conversations
    from neuronews_spark.operators.mentions import distinct_vertices, extract_mentions
    from neuronews_spark.pipeline import EntityResolutionPipeline
    from neuronews_spark.sources.synthetic import synthetic_transcripts

    t = synthetic_transcripts(spark, n_turns=3000, turns_per_conv=10)
    res = EntityResolutionPipeline(spark).run(t)
    mentions = res.mentions

    generic = accumulate_provenance(
        remap_edges(mentions_to_edges(mentions), res.id_map)
    )
    fused = build_mention_edges(mentions, res.id_map)

    def key(rows):
        return sorted(
            (r["subject"], r["predicate"], r["object"], r["n_assertions"],
             tuple(sorted(p["chunk_id"] for p in r["provenances"])))
            for r in rows
        )

    g, f = key(generic.collect()), key(fused.collect())
    assert g == f and len(f) > 50
    # fused representative is the min mention_idx provenance
    for r in fused.collect():
        assert r["provenance"]["chunk_id"] == min(
            (p["chunk_id"] for p in r["provenances"]),
            key=lambda c: int(c.rsplit("#", 1)[1]),
        )
