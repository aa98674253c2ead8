"""Heuristic subject-predicate-object claim extraction.

Port of the reference's dependency-free claim extractor
(``/root/reference/src/knowledge_graph/claim_extractor.py:22-166``):
sentences split on terminal punctuation, each scanned for the FIRST
claim-anchoring verb; the subject is everything left of the verb after
walking back over auxiliaries/negations, the object everything right of
it; questions are rejected; negation is detected from the aux cluster
and the fails/fail verbs; confidence is the caller's constant (0.6).

Spark shape: pure Column math — token array via ``regexp_extract_all``,
verb index via ``array_min(zip_with(...))``, subject boundary via
``array_max(filter(sequence...))`` — no UDFs, fully codegen'd, and
mirrorable in DuckDB list functions (the oracled driver query). A Python
kernel mirror (``extract_claims_py``) backs the differential tests on
punctuated multi-sentence text.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# claim_extractor.py:22-31
CLAIM_VERBS = [
    "is", "are", "was", "were", "improves", "improve", "improved",
    "increases", "increase", "increased", "reduces", "reduce", "reduced",
    "outperforms", "outperform", "outperformed", "causes", "cause", "caused",
    "shows", "show", "showed", "demonstrates", "demonstrate", "enables",
    "enable", "achieves", "achieve", "achieved", "beats", "beat", "exceeds",
    "exceed", "requires", "require", "leads", "lead", "predicts", "predict",
    "produces", "produce", "yields", "yield", "affects", "affect", "supports",
    "support", "correlates", "correlate", "depends", "depend",
]

# claim_extractor.py:34-38
AUX = [
    "do", "does", "did", "be", "been", "being", "can", "could", "will",
    "would", "shall", "should", "may", "might", "must", "has", "have", "had",
]
NEG = ["not", "n't", "no", "never", "cannot", "can't", "without", "fails", "fail"]

_WORD_RE = r"[A-Za-z0-9']+"
_SENT_SPLIT = r"(?<=[.!?])\s+"
DEFAULT_CONFIDENCE = 0.6


def sentences(text: Column) -> Column:
    """Terminal-punctuation sentence split (claim_extractor.py:128-129) —
    Java regex supports the lookbehind the reference uses."""
    return F.filter(
        F.transform(F.split(F.trim(text), _SENT_SPLIT), lambda s: F.trim(s)),
        lambda s: s != F.lit(""),
    )


def spo_columns(sentence: Column):
    """(subject, predicate, object, negated, valid) column bundle for one
    sentence column — the _extract_spo kernel (:131-166) as Column math."""
    aux_neg = AUX + NEG
    words = F.regexp_extract_all(sentence, F.lit(_WORD_RE), F.lit(0))
    lower = F.transform(words, lambda w: F.lower(w))
    n = F.size(words)
    # first claim verb, 1-based (array_min ignores nulls)
    vidx = F.array_min(
        F.zip_with(
            lower,
            F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
            lambda w, i: F.when(w.isin(CLAIM_VERBS), i),
        )
    )
    # subject end: greatest index before the verb that is not aux/negation
    j = F.array_max(
        F.filter(
            F.sequence(F.lit(1), F.greatest(vidx - 1, F.lit(1))),
            lambda i: (i < vidx) & ~F.element_at(lower, i.cast("int")).isin(aux_neg),
        )
    )
    neg_window = F.when(
        vidx - 1 >= j + 1, F.sequence(j + 1, vidx - 1)
    ).otherwise(F.array().cast("array<bigint>"))
    negated = (
        F.exists(neg_window, lambda i: F.element_at(lower, i.cast("int")).isin(NEG))
        | F.element_at(lower, vidx.cast("int")).isin("fails", "fail")
    )
    valid = (
        ~F.trim(sentence).endswith("?")
        & (n >= 3)
        & vidx.isNotNull()
        & (vidx > 1)
        & (vidx < n)
        & j.isNotNull()
    )
    subject = F.array_join(F.slice(words, 1, j.cast("int")), " ")
    predicate = F.element_at(lower, vidx.cast("int"))
    obj = F.array_join(
        F.slice(words, (vidx + 1).cast("int"), (n - vidx).cast("int")), " "
    )
    return subject, predicate, obj, negated, valid


def extract_claims(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    confidence: float = DEFAULT_CONFIDENCE,
) -> DataFrame:
    """One row per extracted claim: (doc, sent_idx, claim_text, subject,
    predicate, object, negated, confidence)."""
    sent = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(sentences(F.col(text_col))).alias("sent_idx", "claim_text"),
    )
    subject, predicate, obj, negated, valid = spo_columns(F.col("claim_text"))
    return (
        sent.select(
            "doc",
            "sent_idx",
            "claim_text",
            subject.alias("subject"),
            predicate.alias("predicate"),
            obj.alias("object"),
            negated.alias("negated"),
            F.lit(confidence).alias("confidence"),
            valid.alias("_valid"),
        )
        .filter(F.col("_valid"))
        .drop("_valid")
    )


# ------------------------------------------------------- python mirror

def extract_claims_py(text: str) -> list[tuple[str, str, str, str, bool]]:
    """Driver-side kernel mirror for differential tests:
    (sentence, subject, predicate, object, negated)."""
    out = []
    for sentence in re.split(_SENT_SPLIT, (text or "").strip()):
        s = sentence.strip()
        if not s or s.endswith("?"):
            continue
        words = re.findall(_WORD_RE, s)
        if len(words) < 3:
            continue
        lower = [w.lower() for w in words]
        vidx = next((i for i, w in enumerate(lower) if w in set(CLAIM_VERBS)), None)
        if vidx is None or vidx == 0 or vidx >= len(words) - 1:
            continue
        negated = False
        j = vidx - 1
        while j >= 0 and (lower[j] in set(AUX) or lower[j] in set(NEG)):
            if lower[j] in set(NEG):
                negated = True
            j -= 1
        if j < 0:
            continue
        if lower[vidx] in ("fails", "fail"):
            negated = True
        out.append(
            (s, " ".join(words[: j + 1]), lower[vidx], " ".join(words[vidx + 1:]), negated)
        )
    return out
