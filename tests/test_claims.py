"""Claim extraction (claim_extractor.py:22-166 semantics): reference-shaped
cases + Spark-vs-Python differential on punctuated multi-sentence text."""

from __future__ import annotations

from neuronews_spark.operators.claims import extract_claims, extract_claims_py

TEXTS = [
    "Transformers improve translation quality. Do they?",
    "The model does not improve latency. RNNs were slower than transformers!",
    "Attention is all you need.",
    "The approach cannot improve accuracy.",
    "The system fails under load.",
    "short one",
    "Never is a word",  # verb at... 'is' with only neg before it
    "",
]


def test_python_kernel_reference_cases():
    got = extract_claims_py(TEXTS[0])
    assert got == [
        ("Transformers improve translation quality.", "Transformers",
         "improve", "translation quality", False)
    ]  # the question sentence is rejected
    neg = extract_claims_py(TEXTS[1])
    assert ("The model does not improve latency.", "The model", "improve",
            "latency", True) in neg
    assert any(p == "were" and s == "RNNs" for _, s, p, _, n in neg)
    cannot = extract_claims_py(TEXTS[3])
    assert cannot == [
        ("The approach cannot improve accuracy.", "The approach", "improve",
         "accuracy", True)
    ]
    # 'fails' is NOT in the claim-verb set (parity with the reference's
    # verb list) → no claim anchors in this sentence
    assert extract_claims_py(TEXTS[4]) == []
    assert extract_claims_py(TEXTS[5]) == []
    # all-neg/aux prefix before the verb → no subject → rejected
    assert extract_claims_py(TEXTS[6]) == []


def test_spark_matches_python_mirror(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    rows = extract_claims(df).collect()
    got = {}
    for r in rows:
        got.setdefault(r["doc"], []).append(
            (r["claim_text"], r["subject"], r["predicate"], r["object"], r["negated"])
        )
    for i, t in enumerate(TEXTS):
        assert sorted(got.get(i, [])) == sorted(extract_claims_py(t)), (i, t)
    # confidence constant
    assert all(abs(r["confidence"] - 0.6) < 1e-9 for r in rows)
