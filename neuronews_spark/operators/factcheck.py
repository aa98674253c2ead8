"""Fact-check verdict normalisation + stale-claim sweep.

Clean-room re-expression of the reference's fact-check integration
(``/root/reference/src/argument_mining/factcheck.py:57-256``).  The
external Google Fact Check Tools lookup cannot run here (no network, no
key) and is stubbed exactly like the reference's keyless path — but the
two pure pieces are real operators:

  normalize_verdict  ClaimReview textualRating → verified / disputed /
                     mixed / unverified: exact-set membership first,
                     then ordered partial-match fallbacks
                     (factcheck.py:57-92)
  select_stale       the nightly batch's work queue — claims never
                     checked or checked before now − 7d, newest first,
                     capped (factcheck.py:221-233); in Spark a filter +
                     top-k, not a table scan per night

Both are pure Column expressions mirrored by the DuckDB driver oracle
(``factcheck_verdicts``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# factcheck.py:57-74
TRUE_RATINGS = [
    "true", "mostly true", "correct", "accurate", "confirmed",
    "this is true", "verdict: true", "fact", "verified",
]
FALSE_RATINGS = [
    "false", "mostly false", "incorrect", "wrong", "inaccurate",
    "pants on fire", "four pinocchios", "three pinocchios", "fabricated",
    "lie", "this is false", "verdict: false",
]
MIXED_RATINGS = [
    "mixed", "half true", "half-true", "partly true", "partially true",
    "partially correct", "misleading", "needs context", "complicated",
    "in the middle", "two pinocchios", "one pinocchio",
]
# factcheck.py:81-89 — partial-match fallbacks, in priority order
TRUE_TOKENS = ["true", "correct", "accurate", "verified"]
FALSE_TOKENS = ["false", "incorrect", "fabricat", "lie"]
MIXED_TOKENS = ["mix", "mislead", "partial", "half", "context"]

RECHECK_DAYS = 7  # factcheck.py:37


def _any_contains(r: Column, tokens: list[str]) -> Column:
    hit = r.contains(tokens[0])
    for t in tokens[1:]:
        hit = hit | r.contains(t)
    return hit


def normalize_verdict(textual_rating: Column) -> Column:
    """factcheck.py:76-92 — exact sets, then partial fallbacks, else
    'unverified'.  Note the exact sets win over fallbacks: 'mostly
    false' is disputed even though it contains 'false' AND nothing else
    — order is exact-true, exact-false, exact-mixed, partial-true,
    partial-false, partial-mixed."""
    r = F.lower(F.trim(textual_rating))
    return (
        F.when(r.isin(TRUE_RATINGS), F.lit("verified"))
        .when(r.isin(FALSE_RATINGS), F.lit("disputed"))
        .when(r.isin(MIXED_RATINGS), F.lit("mixed"))
        .when(_any_contains(r, TRUE_TOKENS), F.lit("verified"))
        .when(_any_contains(r, FALSE_TOKENS), F.lit("disputed"))
        .when(_any_contains(r, MIXED_TOKENS), F.lit("mixed"))
        .otherwise(F.lit("unverified"))
    )


def select_stale(
    claims: DataFrame,
    now: Column,
    checked_col: str = "factcheck_checked_at",
    order_col: str = "extracted_at",
    limit: int = 50,
) -> DataFrame:
    """The batch work queue (factcheck.py:221-233): never-checked or
    checked before now − RECHECK_DAYS, newest extraction first (nulls
    last), capped at ``limit``.  The cap is a global top-k — at scale
    prefer per-partition ranking or a quantile cutoff over a single-
    partition sort; limit-after-orderBy lets Spark run it as a
    TakeOrdered (no full sort materialisation)."""
    cutoff = now - F.expr(f"INTERVAL {RECHECK_DAYS} DAYS")
    stale = claims.filter(
        F.col(checked_col).isNull() | (F.col(checked_col) < cutoff)
    )
    return stale.orderBy(
        F.col(order_col).desc_nulls_last()
    ).limit(limit)


def lookup_claim_stub(*_args, **_kwargs):
    """The external API client.  The reference returns None whenever
    GOOGLE_FACTCHECK_API_KEY is absent (factcheck.py:215-218) — this
    sandbox has no network, so that keyless no-op path is the only
    honest behaviour; a real deployment injects a client here."""
    return None


# ----------------------------------------------------------------------
# Python kernel mirror (differential tests only)
# ----------------------------------------------------------------------


def normalize_verdict_py(textual_rating: str) -> str:
    r = textual_rating.strip().lower()
    if r in set(TRUE_RATINGS):
        return "verified"
    if r in set(FALSE_RATINGS):
        return "disputed"
    if r in set(MIXED_RATINGS):
        return "mixed"
    for token in TRUE_TOKENS:
        if token in r:
            return "verified"
    for token in FALSE_TOKENS:
        if token in r:
            return "disputed"
    for token in MIXED_TOKENS:
        if token in r:
            return "mixed"
    return "unverified"
