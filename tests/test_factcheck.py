"""Fact-check verdict normalisation + stale sweep tests
(factcheck.py:57-92,221-233)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from neuronews_spark.operators.factcheck import (
    lookup_claim_stub,
    normalize_verdict,
    normalize_verdict_py,
    select_stale,
)

CASES = {
    "True": "verified",
    " Mostly False ": "disputed",
    "HALF TRUE": "mixed",
    "Pants on Fire": "disputed",
    "four pinocchios": "disputed",
    "two pinocchios": "mixed",
    "rated accurate by reviewers": "verified",
    "a fabricated story": "disputed",
    "requires context": "mixed",
    "no rating available": "unverified",
    "believed by many": "disputed",  # 'lie' ⊂ 'believed' — faithful quirk
    "utterly wrong claim": "unverified",  # 'wrong' is exact-only, no partial
    "": "unverified",
}


def test_kernel_cases():
    for rating, want in CASES.items():
        assert normalize_verdict_py(rating) == want, rating


def test_spark_matches_kernel(spark):
    df = spark.createDataFrame([(r,) for r in CASES], "rating string")
    got = {
        r["rating"]: r["v"]
        for r in df.select(
            "rating", normalize_verdict(F.col("rating")).alias("v")
        ).collect()
    }
    assert got == CASES


def test_select_stale(spark):
    now = datetime.datetime(2024, 6, 1)
    rows = [
        (1, None, datetime.datetime(2024, 1, 1)),            # never checked
        (2, now - datetime.timedelta(days=8), datetime.datetime(2024, 1, 3)),
        (3, now - datetime.timedelta(days=7), datetime.datetime(2024, 1, 4)),  # fresh
        (4, now - datetime.timedelta(days=1), datetime.datetime(2024, 1, 5)),  # fresh
        (5, now - datetime.timedelta(days=30), None),        # stale, null order key
        (6, None, datetime.datetime(2024, 1, 2)),
    ]
    df = spark.createDataFrame(
        rows, "claim_id long, factcheck_checked_at timestamp, extracted_at timestamp"
    )
    out = select_stale(df, F.lit("2024-06-01 00:00:00").cast("timestamp"), limit=3)
    ids = [r["claim_id"] for r in out.collect()]
    # stale = {1, 2, 5, 6}; newest-first with nulls last, capped at 3
    assert ids == [2, 6, 1]


def test_lookup_stub_is_keyless_noop():
    assert lookup_claim_stub("any claim text") is None
