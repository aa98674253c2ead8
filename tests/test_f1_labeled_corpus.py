"""Pairwise F1 on the labeled synthetic corpus — the north-star metric:
F1 ≥ 0.99 on labeled same-block pairs, ground truth = the *greedy reference
resolver's* actual clustering of the same corpus (not our own rules)."""

from __future__ import annotations

from pyspark.sql import functions as F

from neuronews_spark.evaluation import labeled_same_block_pairs, pairwise_scores
from neuronews_spark.operators.blocking import build_blocks
from neuronews_spark.pipeline import resolve_from_mentions
from neuronews_spark.reference_oracle import greedy_clusters
from neuronews_spark.sources.synthetic import (
    EMBEDDING_VECTORS,
    labeled_corpus,
    name_embeddings_df,
)


def test_pairwise_f1_against_greedy_reference(spark):
    mentions, families_df, fams = labeled_corpus(spark, seed=42, copies=2)
    # ground truth from the greedy reference-semantics oracle, processing
    # mentions in a fixed deterministic order (sorted, as a stand-in for the
    # reference's ingest order)
    typed_surfaces = sorted(
        {(r["entity_type"], r["name"]) for r in mentions.collect()}
    )
    truth = greedy_clusters(
        list(typed_surfaces), embedder=lambda n: EMBEDDING_VECTORS[n]
    )

    res = resolve_from_mentions(
        spark, mentions, name_embeddings=name_embeddings_df(spark)
    )

    # map typed surfaces → node_id → oracle group
    v = res.vertices.select("node_id", "entity_type", "aliases").collect()
    truth_rows = []
    for r in v:
        groups = {
            truth[(r["entity_type"], a)]
            for a in r["aliases"]
            if (r["entity_type"], a) in truth
        }
        assert len(groups) == 1, (
            f"vertex aliases span oracle groups: {r['aliases']} -> {groups}"
        )
        truth_rows.append((r["node_id"], f"g{groups.pop()}"))
    truth_df = spark.createDataFrame(truth_rows, "node_id string, group_id string")

    blocks = build_blocks(res.vertices)
    labeled = labeled_same_block_pairs(blocks, truth_df)
    scores = pairwise_scores(labeled, res.components)
    assert scores["n_pairs"] > 100, scores
    assert scores["f1"] >= 0.99, scores
    # with an unambiguous corpus greedy and transitive closure coincide
    assert scores["precision"] == 1.0, scores
    assert scores["recall"] == 1.0, scores


def test_greedy_oracle_reproduces_reference_labeled_cases(spark):
    # sanity: the oracle itself reproduces the reference's labeled tests
    g = greedy_clusters(
        [
            ("Person", "Hinton"),
            ("Person", "Geoffrey Hinton"),
            ("Person", "G. Hinton"),
            ("Person", "John Smith"),
            ("Person", "Jane Smith"),
            ("Organization", "OpenAI"),
            ("Organization", "OpenAI Inc."),
            ("Organization", "Open AI"),
            ("Concept", "Transformer"),
            ("Concept", "Transformers"),
            ("Concept", "Recurrent Neural Network"),
        ]
    )
    assert g[("Person", "Hinton")] == g[("Person", "Geoffrey Hinton")] == g[("Person", "G. Hinton")]
    assert g[("Person", "John Smith")] != g[("Person", "Jane Smith")]
    assert g[("Organization", "OpenAI")] == g[("Organization", "OpenAI Inc.")] == g[("Organization", "Open AI")]
    assert g[("Concept", "Transformer")] == g[("Concept", "Transformers")]
    assert g[("Concept", "Recurrent Neural Network")] != g[("Concept", "Transformer")]


def test_text_pipeline_end_to_end_recovers_families(spark):
    """Full path: synthetic transcripts (text) → extraction → resolution."""
    from neuronews_spark.pipeline import EntityResolutionPipeline
    from neuronews_spark.sources.synthetic import synthetic_transcripts

    transcripts = synthetic_transcripts(spark, n_turns=3000, turns_per_conv=10)
    pipe = EntityResolutionPipeline(spark)
    result = pipe.run(transcripts)
    ents = result.entities.collect()
    assert len(ents) > 10
    by_name = {r["name"]: r for r in ents}
    # planted person family: "Geoffrey Hinton" + "Dr. Hinton" variant must
    # have merged (surname block + person compatibility)
    if "Geoffrey Hinton" in by_name:
        assert "Hinton" in by_name["Geoffrey Hinton"]["aliases"]
        assert by_name["Geoffrey Hinton"]["entity_type"] == "Person"
    # no cross-type merges
    for r in ents:
        assert r["n_surfaces"] >= 1
    # mention edges exist and are provenance-bearing
    me = result.mention_edges.limit(5).collect()
    assert me and all(r["provenance"]["confidence"] == 0.8 for r in me)
