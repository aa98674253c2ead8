"""Property-based robustness tests (hypothesis) for the kernels that
were rewritten for performance this round — the zip_with shingle kernel
vs the original sequence+slice formula, and the inverted-index jaccard
vs a direct set computation — plus crash-safety of the regex chains on
arbitrary text."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from neuronews_spark.operators.attribution import classify_attribution_py
from neuronews_spark.operators.conflicts import cosine_py
from neuronews_spark.operators.positions import position_confidence_py

words = st.lists(
    st.text(alphabet="abcdefgh", min_size=1, max_size=6), min_size=0, max_size=12
)


def _shingles_py(tokens: list[str], n: int) -> list[str]:
    """Reference semantics of token_shingles: n-grams of the token list,
    distinct preserving first occurrence; < n tokens → the joined text."""
    if len(tokens) < n:
        return [" ".join(tokens)]
    grams = [" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]
    out, seen = [], set()
    for g in grams:
        if g not in seen:
            seen.add(g)
            out.append(g)
    return out


def test_shingle_kernel_property(spark):
    # one Spark round-trip over a hypothesis-generated batch per n
    import hypothesis

    cases: list[list[str]] = []

    @settings(max_examples=60, deadline=None)
    @given(words)
    def collect(ws):
        cases.append(ws)

    collect()
    from neuronews_spark.functions.normalize import token_shingles

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(cases)], "i long, norm string"
    )
    for n in (1, 2, 3):
        got = {
            r["i"]: r["g"]
            for r in df.select(
                "i", token_shingles(F.col("norm"), n=n).alias("g")
            ).collect()
        }
        for i, ws in enumerate(cases):
            toks = [w for w in " ".join(ws).split(" ") if w]
            assert got[i] == _shingles_py(toks, n), (n, ws)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200), st.text(max_size=200))
def test_cosine_is_symmetric_and_bounded(a, b):
    s = cosine_py(a, b)
    assert 0.0 <= s <= 1.0
    assert s == cosine_py(b, a)
    if s > 0:
        assert cosine_py(a, a) == 1.0


@settings(max_examples=200, deadline=None)
@given(
    st.text(max_size=300),
    st.sampled_from(["news", "paper", "transcript", "blog", "note", "web",
                     "book", "weird"]),
)
def test_attribution_kernel_total(text, source_type):
    attributed, snippet = classify_attribution_py(text, source_type)
    assert isinstance(attributed, bool)
    assert snippet is None or (isinstance(snippet, str) and len(snippet) <= 120)
    if not attributed:
        assert snippet is None


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=300))
def test_position_confidence_total(text):
    is_pos, conf = position_confidence_py(text)
    assert isinstance(is_pos, bool)
    assert 0.0 <= conf <= 0.95 + 1e-12
    if text.strip().endswith("?"):
        assert is_pos is False
