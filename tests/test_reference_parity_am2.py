"""Second parity batch: the reference's conflict-graph, fact-check, and
actor-metadata unit tests against this engine's kernels (same inputs,
same expected outputs).

Sources: test_conflict_graph_coverage.py:70-230,
test_factcheck.py:28-67, test_metadata_coverage.py:64-110.
"""

from __future__ import annotations

from neuronews_spark.operators.actors import entity_id_py, valid_name_py
from neuronews_spark.operators.conflicts import (
    cosine_py,
    detect_conflict_py,
    polarity_py,
)
from neuronews_spark.operators.factcheck import (
    lookup_claim_stub,
    normalize_verdict_py,
)


# --- conflict graph: tokenize/cosine/polarity -------------------------

def test_cosine_reference_cases():
    assert cosine_py("economy inflation growth", "economy inflation growth") == 1.0
    assert cosine_py("economy inflation", "football stadium") == 0.0
    # stopwords-only side → empty bag → 0.0
    assert cosine_py("the and for", "economy inflation") == 0.0
    assert cosine_py("", "") == 0.0
    s = cosine_py("economy inflation growth prices", "economy inflation decline prices")
    assert 0.0 < s < 1.0
    assert round(cosine_py("economy inflation growth", "economy prices growth"), 4) == \
        cosine_py("economy inflation growth", "economy prices growth")


def test_polarity_reference_cases():
    assert polarity_py("The market will rise and improve") == 1
    assert polarity_py("The market will fall and decline") == -1
    assert polarity_py("prices rise then fall") == 0
    assert polarity_py("committee met on tuesday") == 0


def test_detect_conflict_reference_branches():
    # direct via high sim + opposite polarity
    r = detect_conflict_py(
        "economy inflation prices growth markets outlook forecast rise", "news",
        "economy inflation prices growth markets outlook forecast fall", "blog",
    )
    assert r is not None and r[0] == "direct" and r[1] >= 0.80
    # direct via explicit contradiction at mid similarity
    r = detect_conflict_py(
        "economy inflation prices growth stable outlook", "news",
        "economy inflation prices markets weak outlook", "news",
        explicit=True,
    )
    assert r is not None and r[0] == "direct" and r[1] >= 0.45
    # implied via cross-format (direct gate fails: no polarity/explicit)
    r = detect_conflict_py(
        "economy inflation prices growth markets stable", "news",
        "economy inflation prices growth markets outlook", "paper",
    )
    assert r is not None and r[0] == "implied"
    # implied via explicit at low similarity [0.30, 0.45)
    r = detect_conflict_py(
        "economy inflation growth markets committee session policy", "news",
        "economy inflation growth healthcare reform program funding", "news",
        explicit=True,
    )
    assert r is not None and r[0] == "implied" and 0.30 <= r[1] < 0.45
    # identical same-format text with no opposing signal → no conflict
    assert detect_conflict_py(
        "economy inflation prices growth markets stable", "news",
        "economy inflation prices growth markets stable", "news",
    ) is None
    # disjoint vocabulary → no conflict even with explicit flag
    assert detect_conflict_py(
        "football stadium crowd", "news", "economy inflation prices", "blog",
        explicit=True,
    ) is None


# --- fact-check verdict normalisation ---------------------------------

def test_factcheck_reference_cases():
    for rating in ["True", "Mostly True", "Correct", "Accurate", "CONFIRMED"]:
        assert normalize_verdict_py(rating) == "verified", rating
    for rating in ["False", "Mostly False", "Incorrect", "Pants on Fire",
                   "FABRICATED"]:
        assert normalize_verdict_py(rating) == "disputed", rating
    for rating in ["Mixed", "Half True", "Misleading", "Needs Context",
                   "Partly True"]:
        assert normalize_verdict_py(rating) == "mixed", rating
    assert normalize_verdict_py("Unknown") == "unverified"
    assert normalize_verdict_py("Largely true") == "verified"
    assert normalize_verdict_py("Demonstrably false") == "disputed"
    assert normalize_verdict_py("Highly misleading") == "mixed"
    assert normalize_verdict_py("") == "unverified"
    assert normalize_verdict_py("  True  ") == "verified"
    assert lookup_claim_stub("The earth orbits the sun.") is None


# --- actor metadata ----------------------------------------------------

def test_entity_id_reference_cases():
    a = entity_id_py("Barack Obama")
    assert a == entity_id_py("  barack   obama ")
    assert a.startswith("ent-") and len(a) == len("ent-") + 12
    assert entity_id_py("Alice") != entity_id_py("Bob")


def test_valid_name_reference_cases():
    assert valid_name_py("Jane Doe") and valid_name_py("WHO")
    assert not valid_name_py("")
    assert not valid_name_py("a")
    assert not valid_name_py("the")
    assert not valid_name_py("lowercase")
