"""PII detection and redaction over a text column.

The reference repo scrapes public news and carries no PII scrubber; any
pipeline that feeds scraped or conversational text into model training
needs one, so this is part of the engine's training-data suite (same tier
as dedup/decontamination). Everything is pure JVM Column regex — no UDF,
no shuffle, whole-stage-codegen friendly — so it runs at scan speed on
the widest text scans.

Patterns are deliberately conservative, anchored, and expressible in both
Java regex (Spark) and RE2 (DuckDB) so the operator is oracle-checkable:
  email  [A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}
  ssn    \\b\\d{3}-\\d{2}-\\d{4}\\b        (checked BEFORE phone; the two
  phone  \\b\\d{3}-\\d{3}-\\d{4}\\b         shapes cannot overlap: group-2
                                          length 2 vs 3 plus \\b anchors)
  ipv4   \\b(\\d{1,3}\\.){3}\\d{1,3}\\b

Redaction replaces every occurrence with the type tag (<EMAIL>, <SSN>,
<PHONE>, <IP>), applied in that order on the running text; counts are
taken per-pattern on the ORIGINAL text so they are replacement-order
independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
SSN_RE = r"\b\d{3}-\d{2}-\d{4}\b"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
IPV4_RE = r"\b(\d{1,3}\.){3}\d{1,3}\b"

# (name, pattern, tag) in application order — email first (may contain
# digit runs), SSN before phone (disjoint but documents the intent), IP last
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ssn", SSN_RE, "<SSN>"),
    ("phone", PHONE_RE, "<PHONE>"),
    ("ip", IPV4_RE, "<IP>"),
]


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-type occurrence counts on the raw text (int columns)."""
    return {
        name: F.size(F.regexp_extract_all(text, F.lit(pat), 0)).alias(f"n_{name}")
        for name, pat, _tag in PII_PATTERNS
    }


def redact_text(text: Column) -> Column:
    """Replace every PII occurrence with its type tag, in PII_PATTERNS
    order (Spark regexp_replace is global, like DuckDB's 'g' flag)."""
    out = text
    for _name, pat, tag in PII_PATTERNS:
        out = F.regexp_replace(out, pat, tag)
    return out


def redact_pii(df: DataFrame, text_col: str, out_col: str = "redacted") -> DataFrame:
    """Append per-type counts (``n_email``/``n_ssn``/``n_phone``/``n_ip``)
    and the redacted text. Pure projection: no shuffle, no UDF."""
    text = F.col(text_col)
    counts = pii_counts(text)
    return df.select(
        "*",
        *[counts[name] for name, _p, _t in PII_PATTERNS],
        redact_text(text).alias(out_col),
    )
