"""Content-type-aware unsourced-assertion (attribution) classifier.

Clean-room re-expression of the reference's attribution detector
(``/root/reference/src/argument_mining/attribution.py:39-178``): for a
claim sentence and its document's ``source_type``, decide whether an
explicit source/basis is attributed inside the sentence and extract a
short attribution snippet.  Rules per type (attribution.py:7-17):

  news        according-to / per / citing / officials-say / X-said,
              with common-opener rejection for the said-pattern
  paper,book  APA parenthetical or numeric inline citation
  transcript  leading speaker label, "X said that", else news rules
  blog,note   first-person epistemic anchor counts as attributed;
              opinion-as-fact markers short-circuit to unattributed;
              else news rules

The reference sweeps rows one at a time through SQLite UPDATEs
(attribution.py:181-221); here the whole rule chain is pure Column
regexp math — JVM-side, codegen'd, no Python in the hot path — and each
regex is RE2-compatible so the exact chain is mirrorable in DuckDB for
the driver oracle (``claim_attribution``).  A Python kernel
(:func:`classify_attribution_py`) backs the differential tests.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# attribution.py:39-55 — news patterns
NEWS_ACCORDING = (
    r"(?i)\baccording\s+to\s+([\w\s,\.'-]{2,50}?)"
    r"(?:\s*[,;]|\s+(?:the|a|an|its|their)\b)"
)
NEWS_SAID = (
    r"(?i)([\w\s\-]{2,40}?)\s+(?:said|stated|confirmed|reported|told|announced|"
    r"noted|warned|argued|claimed|wrote|added|explained|revealed|disclosed|"
    r"indicated|stressed|emphasized|insisted|acknowledged|admitted|conceded)\b"
)
NEWS_PER = r"(?i)\bper\s+([\w\s,'-]{2,40}?)(?:\s*[,;]|$)"
NEWS_CITING = r"(?i)\bciting\s+([\w\s,'-]{2,40}?)(?:\s*[,;]|$)"
NEWS_OFFICIALS = (
    r"(?i)\b(officials?|researchers?|scientists?|analysts?|experts?|"
    r"authorities?|investigators?|sources?)\s+(?:said|say|confirmed|noted|reported)\b"
)
# attribution.py:57-61 — paper patterns (case-sensitive)
PAPER_APA = r"\((?:[A-Z][a-z]+(?:\s+et\s+al\.?)?(?:,\s*\d{4})?(?:;\s*)?){1,4}\)"
PAPER_NUMERIC = r"\[[\d,\s]+\]|\(\d+(?:,\s*\d+)*\)"
# attribution.py:63-70 — transcript patterns (label is case-sensitive)
TRANSCRIPT_LABEL = r"^([A-Z][a-z]+(?:\s+[A-Z][a-z]+){0,2})\s*:"
TRANSCRIPT_ATTR = (
    r"(?i)([\w\s\-]{2,35}?)\s+"
    r"(?:said|stated|explained|noted|argued|confirmed)\s+that\b"
)
# attribution.py:72-86 — blog/note anchors and opinion-as-fact markers
FIRST_PERSON = (
    r"(?i)\b(?:I\s+(?:found|noticed|observed|believe|think|argue|wrote|showed|"
    r"measured|tested|confirmed)|we\s+(?:found|observed|measured|tested|showed|"
    r"confirmed|reported)|in\s+my\s+(?:experience|view|opinion|analysis|testing))\b"
)
OPINION_AS_FACT = (
    r"(?i)\b(?:clearly|obviously|everyone knows|it is (?:clear|obvious|evident|"
    r"well.known)|undeniably|undoubtedly|of course|needless to say|"
    r"it goes without saying|it is(?:'s)? (?:simply|just) (?:true|a fact))\b"
)
# attribution.py:104-107 — sentence openers the said-pattern must reject
SAID_OPENER = r"^(?:the|a|an|this|that|it|they) "

CLIP_LEN = 120  # attribution.py:175-177


def _clip(snippet: Column) -> Column:
    return F.when(
        F.length(snippet) > CLIP_LEN,
        F.concat(F.substring(snippet, 1, 117), F.lit("…")),
    ).otherwise(snippet)


def _hit(snippet: Column) -> Column:
    return F.struct(
        F.lit(True).alias("attributed"), _clip(snippet).alias("attribution_text")
    )


def _miss() -> Column:
    return F.struct(
        F.lit(False).alias("attributed"),
        F.lit(None).cast("string").alias("attribution_text"),
    )


def _news(text: Column) -> Column:
    """attribution.py:93-109 — pattern priority according>per>citing>
    officials>said; said-snippet rejected when it opens with a common
    determiner/pronoun."""
    acc = F.regexp_extract(text, NEWS_ACCORDING, 1)
    per = F.regexp_extract(text, NEWS_PER, 1)
    cit = F.regexp_extract(text, NEWS_CITING, 1)
    off = F.regexp_extract(text, NEWS_OFFICIALS, 1)
    said = F.trim(F.regexp_extract(text, NEWS_SAID, 1))
    return (
        F.when(acc != "", _hit(F.trim(acc)))
        .when(per != "", _hit(F.trim(per)))
        .when(cit != "", _hit(F.trim(cit)))
        .when(off != "", _hit(F.trim(off)))
        .when((said != "") & ~F.lower(said).rlike(SAID_OPENER), _hit(said))
        .otherwise(_miss())
    )


def _paper(text: Column) -> Column:
    """attribution.py:112-119 — APA parenthetical, then numeric inline."""
    apa = F.regexp_extract(text, PAPER_APA, 0)
    num = F.regexp_extract(text, PAPER_NUMERIC, 0)
    return (
        F.when(apa != "", _hit(apa))
        .when(num != "", _hit(num))
        .otherwise(_miss())
    )


def _transcript(text: Column) -> Column:
    """attribution.py:122-130 — speaker label, quote attribution, else
    news rules (transcripts contain quotes)."""
    label = F.regexp_extract(text, TRANSCRIPT_LABEL, 1)
    attr = F.regexp_extract(text, TRANSCRIPT_ATTR, 1)
    return (
        F.when(label != "", _hit(F.trim(label)))
        .when(attr != "", _hit(F.trim(attr)))
        .otherwise(_news(text))
    )


def _blog_note(text: Column) -> Column:
    """attribution.py:133-142 — first-person anchor attributes; an
    opinion-as-fact marker short-circuits to unattributed BEFORE the
    news fallback."""
    fp = F.regexp_extract(text, FIRST_PERSON, 0)
    return (
        F.when(fp != "", _hit(F.trim(fp)))
        .when(text.rlike(OPINION_AS_FACT), _miss())
        .otherwise(_news(text))
    )


def classify_attribution(text: Column, source_type: Column) -> Column:
    """struct<attributed boolean, attribution_text string> for one claim
    (attribution.py:149-178 dispatch; unknown types use news rules)."""
    return (
        F.when(source_type.isin("paper", "book"), _paper(text))
        .when(source_type == "transcript", _transcript(text))
        .when(source_type.isin("blog", "note"), _blog_note(text))
        .otherwise(_news(text))
    )


def with_attribution(
    df: DataFrame, text_col: str = "claim_text", type_col: str = "source_type"
) -> DataFrame:
    """Append ``attributed``/``attribution_text`` columns — the batch
    analog of attribution.py:181-221's row-at-a-time UPDATE sweep, as a
    single narrow projection (no shuffle, no Python)."""
    a = classify_attribution(F.col(text_col), F.col(type_col))
    return df.withColumn("attributed", a["attributed"]).withColumn(
        "attribution_text", a["attribution_text"]
    )


# ----------------------------------------------------------------------
# Python kernel mirror (differential tests only — not the engine path)
# ----------------------------------------------------------------------

_PY_PATS = {
    name: re.compile(pat.replace("(?i)", "", 1), re.I if pat.startswith("(?i)") else 0)
    for name, pat in [
        ("according", NEWS_ACCORDING),
        ("said", NEWS_SAID),
        ("per", NEWS_PER),
        ("citing", NEWS_CITING),
        ("officials", NEWS_OFFICIALS),
        ("apa", PAPER_APA),
        ("numeric", PAPER_NUMERIC),
        ("label", TRANSCRIPT_LABEL),
        ("tattr", TRANSCRIPT_ATTR),
        ("first_person", FIRST_PERSON),
        ("opinion", OPINION_AS_FACT),
    ]
}


def _py_news(text: str):
    for key in ("according", "per", "citing"):
        m = _PY_PATS[key].search(text)
        if m:
            return True, m.group(1).strip()
    m = _PY_PATS["officials"].search(text)
    if m:
        return True, m.group(1).strip()
    m = _PY_PATS["said"].search(text)
    if m:
        snippet = m.group(1).strip()
        if snippet and not snippet.lower().startswith(
            ("the ", "a ", "an ", "this ", "that ", "it ", "they ")
        ):
            return True, snippet
    return False, None


def _py_paper(text: str):
    for key in ("apa", "numeric"):
        m = _PY_PATS[key].search(text)
        if m:
            return True, m.group(0)
    return False, None


def _py_transcript(text: str):
    m = _PY_PATS["label"].search(text)
    if m:
        return True, m.group(1).strip()
    m = _PY_PATS["tattr"].search(text)
    if m:
        return True, m.group(1).strip()
    return _py_news(text)


def _py_blog(text: str):
    m = _PY_PATS["first_person"].search(text)
    if m:
        return True, m.group(0).strip()
    if _PY_PATS["opinion"].search(text):
        return False, None
    return _py_news(text)


def classify_attribution_py(text: str, source_type: str):
    """Reference-faithful Python mirror (attribution.py:160-178)."""
    fn = {
        "news": _py_news,
        "paper": _py_paper,
        "book": _py_paper,
        "transcript": _py_transcript,
        "blog": _py_blog,
        "note": _py_blog,
        "web": _py_news,
    }.get(source_type, _py_news)
    attributed, snippet = fn(text)
    if snippet and len(snippet) > CLIP_LEN:
        snippet = snippet[:117] + "…"
    return attributed, snippet
