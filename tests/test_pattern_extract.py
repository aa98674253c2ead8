"""5-type pattern/keyword extractor (enhanced_entity_extractor.py:136-218,
461-516,570-597 semantics) — reference-shaped cases + Spark-vs-Python
differential."""

from __future__ import annotations

from collections import Counter

from neuronews_spark.operators.pattern_extract import (
    extract_pattern_entities,
    extract_pattern_mentions,
    extract_pattern_mentions_py,
)

TEXTS = [
    "Dr. Smith joined Acme Corp in Silicon Valley.",
    "Machine Learning and GDPR compliance at OpenAI Inc. are a big deal.",
    "We use Kubernetes, Docker and a REST API. Contact John Henry Smith.",
    "acme corp again, plus quantum computing and the CCPA.",
    "",
]


def _docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def test_mentions_match_python_mirror(spark):
    got = (
        extract_pattern_mentions(_docs(spark))
        .orderBy("doc", "entity_type", "surface")
        .collect()
    )
    by_doc: dict[int, Counter] = {}
    for r in got:
        by_doc.setdefault(r["doc"], Counter())[
            (r["surface"], r["entity_type"], r["confidence"])
        ] += 1
    for i, t in enumerate(TEXTS):
        expected = Counter(extract_pattern_mentions_py(t))
        assert by_doc.get(i, Counter()) == expected, (i, by_doc.get(i), expected)


def test_reference_shaped_typing_and_confidence(spark):
    rows = extract_pattern_mentions(_docs(spark)).collect()
    triples = {(r["surface"], r["entity_type"], r["confidence"]) for r in rows}
    # title pattern → PERSON at 0.8
    assert ("Dr. Smith", "PERSON", 0.8) in triples
    # org suffix pattern at 0.8
    assert any(s.endswith("Corp") and e == "ORGANIZATION" for s, e, _ in triples)
    # keyword matches recover ORIGINAL casing at 0.9
    assert ("Machine Learning", "TECHNOLOGY", 0.9) in triples
    assert ("GDPR", "POLICY", 0.9) in triples
    # LOCATION 'X Valley' pattern
    assert any(e == "LOCATION" and s.endswith("Valley") for s, e, _ in triples)


def test_merge_normalization_and_ids(spark):
    ents = {
        (r["entity_type"], r["norm"]): r
        for r in extract_pattern_entities(_docs(spark)).collect()
    }
    # ORGANIZATION norm drops the suffix; 'Acme Corp' and 'acme corp'
    # normalize apart only by case — the reference's _normalize_text keeps
    # case for orgs, so they are distinct entities (parity, not a bug)
    org_norms = {k[1] for k in ents if k[0] == "ORGANIZATION"}
    assert "Acme" in org_norms and "acme" in org_norms
    import hashlib

    r = ents[("ORGANIZATION", "Acme")]
    assert r["entity_id"] == hashlib.md5(b"ORGANIZATION:Acme").hexdigest()[:12]
    # keyword entity merged across docs: kubernetes/docker single-doc
    tech = ents.get(("TECHNOLOGY", "quantum computing"))
    assert tech is not None and tech["confidence"] == 0.9
    # PERSON norm word-capitalizes
    assert ("PERSON", "Dr. Smith") in ents or ("PERSON", "Dr. smith") not in ents


def test_mention_count_and_aliases_merge(spark):
    ents = {
        (r["entity_type"], r["norm"]): r
        for r in extract_pattern_entities(_docs(spark)).collect()
    }
    # 'REST API' produces both 'rest api' and 'api' keyword mentions —
    # overlapping keywords each count (reference scans per keyword)
    api = ents.get(("TECHNOLOGY", "REST API"))
    assert api is not None
    assert ents.get(("TECHNOLOGY", "API")) is not None
