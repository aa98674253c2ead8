"""Labelled argument-mining training-dataset builder (claims / stance /
frames) with split assignment and inter-annotator-agreement simulation.

Clean-room re-expression of the reference's dataset producer
(``/root/reference/scripts/build_am_dataset.py:677-932``): templated
sentences are instantiated from value banks, capped at 4 occurrences per
distinct text, labelled (is_claim, stance, frames, topic), assigned
70/15/15 train/val/test splits, and a 500-example train subset gets a
simulated second annotator at a target agreement rate with Cohen's κ
reported (…:779-810).

Spark-first pivots (both documented order-dependence removals, same
pattern as sources/synthetic.py):

* the reference's ``rng.choice`` driver loop is replaced by
  deterministic hash-indexed selection per (row id, placeholder) — each
  row's template and fill values are a pure function of its id, so
  generation distributes and replays identically at any parallelism;
* ``rng.shuffle`` + positional 70/15/15 becomes a hash-range split
  (``h(id) % 100 < 70 | < 85``) — the scale-correct equivalent (no
  global shuffle, stable under appends), expected fractions identical;
* the κ "nudge upward" retry loop (…:800-804) is dropped: the
  deterministic annotator simulation hits the configured agreement rate
  in expectation and κ is reported AS MEASURED — with this subset bank's
  class balance that lands roughly 0.6–0.9 depending on task (κ punishes
  imbalanced label marginals); the reference instead mutates annotator-2
  labels until κ ≥ 0.70, which manufactures the agreement statistic the
  dataset is supposed to measure.

Everything is Column math (regexp_replace fills, one window for the
per-text cap, grouped aggregation for κ) and mirrors in DuckDB — driver
queries ``am_claims_dataset`` and ``am_iaa_kappa``.

The template/value banks here are a representative subset of the
reference's ~650-line bank (one per (is_claim, stance) cell and source
type family); the omitted entries are pure data with identical plumbing.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

STANCE_LABELS = ["supportive", "critical", "neutral", "ambiguous"]  # dataset.py:16

# (template, is_claim, stance, frames, topic_key) — build_am_dataset.py bank shape
TEMPLATES: list[tuple[str, int, str, list[str], str]] = [
    ("{cb} raised interest rates by {bp} basis points to {rate}%.",
     1, "neutral", ["economic"], "economic"),
    ("{metric} {direction} {val}% {period}, according to official data.",
     1, "neutral", ["economic"], "economic"),
    ("Parliament passed the bill by {va} votes to {vb}.",
     1, "neutral", ["political", "legal"], "political"),
    ("{metric} hit a decade high of {val}%, exposing the failure of current policy.",
     1, "critical", ["economic", "political"], "economic"),
    ("The policy has failed to address the root causes of poverty and inequality.",
     1, "critical", ["political", "economic", "humanitarian"], "social"),
    ("This policy has delivered measurable improvements in air quality across the region.",
     1, "supportive", ["economic", "environment"], "environment"),
    ("{pol} pointed out that {pct}% of planned deliverables have been missed.",
     1, "critical", ["political"], "political"),
    ("Our analysis reveals a statistically significant correlation (r = {r}, {pval}).",
     1, "neutral", ["scientific"], "science"),
    ("It remains to be seen whether the policy will have the intended effect.",
     0, "ambiguous", ["political"], "political"),
    ("It remains to be seen how the community will respond over the next"
     " {val} months.",
     0, "ambiguous", ["other"], "social"),
    ("Whether the effect persists beyond the {val}-month follow-up period"
     " remains to be determined.",
     0, "ambiguous", ["scientific"], "science"),
    ("Will the economy recover in time for the next election?",
     0, "ambiguous", ["economic", "political"], "economic"),
]

VALUE_BANKS: dict[str, list[str]] = {
    "cb": ["The Federal Reserve", "The European Central Bank",
           "The Bank of England", "The Bank of Japan"],
    "bp": ["25", "50", "75", "100"],
    "rate": ["3.5", "4.0", "4.5", "5.0", "5.25"],
    "metric": ["GDP growth", "the unemployment rate", "inflation",
               "the trade deficit", "consumer confidence"],
    "direction": ["fell", "rose", "declined", "surged", "slipped", "jumped"],
    "val": ["0.3", "1.2", "2.1", "3.8", "4.2", "5.1", "8.3"],
    "period": ["last quarter", "in March", "year-on-year", "in Q3"],
    "pct": ["3", "8", "14", "22", "35", "47"],
    "va": ["312", "228", "302", "341"],
    "vb": ["189", "162", "127", "220"],
    "pol": ["The minister", "The senator", "The governor", "The committee chair"],
    "r": ["0.74", "0.82", "0.68", "0.91"],
    "pval": ["p < 0.001", "p < 0.01", "p = 0.02", "p < 0.05"],
}

TOPICS: dict[str, list[str]] = {
    "economic": ["economic growth", "fiscal policy", "inflation", "markets"],
    "political": ["immigration", "climate policy", "foreign policy",
                  "the proposed bill"],
    "social": ["housing", "education", "welfare reform"],
    "environment": ["air quality", "emissions policy"],
    "science": ["clinical trials", "research funding"],
}

MAX_PER_TEXT = 4  # build_am_dataset.py:741
SPLIT_TRAIN, SPLIT_VAL = 70, 85  # …:813-831 (70/15/15)


def _h(id_col: Column, salt: int) -> Column:
    """Deterministic per-(row, placeholder) hash — DuckDB-mirrorable.
    The multiplier is salt-dependent: an affine-in-id hash has
    salt-independent row differences, which made every placeholder pick
    collide jointly (two ids that agreed on the template agreed on every
    fill too, collapsing the corpus)."""
    return F.pmod(
        id_col * (2654435761 + salt * 6700417) + F.lit(salt) * 40503 + 17,
        F.lit(2**31),
    )


def pick(id_col: Column, values: list[str], salt: int) -> Column:
    return F.element_at(
        F.array(*[F.lit(v) for v in values]),
        (_h(id_col, salt) % len(values) + 1).cast("int"),
    )


def instantiate(df: DataFrame, id_col: str = "ex_id") -> DataFrame:
    """One labelled example per input row: template by id-hash, every
    ``{placeholder}`` filled by (id, key)-hashed bank values, topic from
    the template's topic pool (build_am_dataset.py:677-775)."""
    eid = F.col(id_col)
    n = len(TEMPLATES)
    idx = (_h(eid, 0) % n).cast("int")
    tmpl = F.element_at(
        F.array(*[F.lit(t[0]) for t in TEMPLATES]), idx + 1
    )
    text = tmpl
    for salt, (key, values) in enumerate(VALUE_BANKS.items(), start=1):
        text = F.regexp_replace(text, r"\{" + key + r"\}", pick(eid, values, salt))
    is_claim = F.element_at(F.array(*[F.lit(t[1]) for t in TEMPLATES]), idx + 1)
    stance = F.element_at(F.array(*[F.lit(t[2]) for t in TEMPLATES]), idx + 1)
    frames = F.element_at(
        F.array(*[F.lit(",".join(t[3])) for t in TEMPLATES]), idx + 1
    )
    topic_pool = F.element_at(
        F.array(
            *[
                F.array(*[F.lit(v) for v in TOPICS.get(t[4], TOPICS["political"])])
                for t in TEMPLATES
            ]
        ),
        idx + 1,
    )
    topic = F.element_at(
        topic_pool, (_h(eid, 99) % F.size(topic_pool) + 1).cast("int")
    )
    return df.select(
        eid.alias("ex_id"),
        text.alias("text"),
        is_claim.alias("is_claim"),
        stance.alias("stance"),
        frames.alias("frames"),
        topic.alias("topic"),
    )


def cap_per_text(df: DataFrame, max_per_text: int = MAX_PER_TEXT) -> DataFrame:
    """≤ max_per_text rows per distinct text, keeping lowest ids — the
    reference's text_count gate (build_am_dataset.py:754-758); a window,
    not a driver dict."""
    w = Window.partitionBy("text").orderBy("ex_id")
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_per_text)
        .drop("_rn")
    )


def assign_split(id_col: Column) -> Column:
    """Hash-range 70/15/15 (pivot from the reference's shuffle+position)."""
    bucket = _h(id_col, 7) % 100
    return (
        F.when(bucket < SPLIT_TRAIN, F.lit("train"))
        .when(bucket < SPLIT_VAL, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def second_annotator(
    label: Column, id_col: Column, label_set: list[str], agreement_pct: int
) -> Column:
    """Simulated annotator 2 (build_am_dataset.py:779-797): agrees with
    probability agreement_pct/100, else a deterministic different label."""
    roll = _h(id_col, 13) % 100
    others = F.array_remove(F.array(*[F.lit(s) for s in label_set]), label)
    alt = F.element_at(others, (_h(id_col, 23) % F.size(others) + 1).cast("int"))
    return F.when(roll < agreement_pct, label).otherwise(alt)


def cohen_kappa(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Cohen's κ as one grouped aggregation: po = agreement rate, pe =
    Σ_label p_a(label)·p_b(label), κ = (po − pe)/(1 − pe) — the
    sklearn.cohen_kappa_score semantics (build_am_dataset.py:798) without
    a driver-side confusion matrix."""
    a, b = F.col(a_col), F.col(b_col)
    n = F.count(F.lit(1))
    po = F.sum(F.when(a == b, 1).otherwise(0)) / n
    # marginals via two aggregations joined on the label
    ma = df.groupBy(a.alias("label")).agg(F.count(F.lit(1)).alias("ca"))
    mb = df.groupBy(b.alias("label")).agg(F.count(F.lit(1)).alias("cb"))
    tot = df.count()
    pe_df = (
        ma.join(mb, "label", "full")
        .fillna({"ca": 0, "cb": 0})
        .agg(
            (
                F.sum(F.col("ca").cast("double") * F.col("cb").cast("double"))
                / (tot * tot)
            ).alias("pe")
        )
    )
    po_df = df.agg(po.alias("po"), n.alias("n"))
    return po_df.crossJoin(pe_df).select(
        "n",
        F.round("po", 6).alias("po"),
        F.round("pe", 6).alias("pe"),
        F.round((F.col("po") - F.col("pe")) / (1 - F.col("pe")), 6).alias("kappa"),
    )


# ----------------------------------------------------------------------
# Python kernel mirror (differential tests only)
# ----------------------------------------------------------------------


def _h_py(eid: int, salt: int) -> int:
    return (eid * (2654435761 + salt * 6700417) + salt * 40503 + 17) % (2**31)


def instantiate_py(eid: int) -> dict:
    idx = _h_py(eid, 0) % len(TEMPLATES)
    tmpl, is_claim, stance, frames, topic_key = TEMPLATES[idx]
    text = tmpl
    for salt, (key, values) in enumerate(VALUE_BANKS.items(), start=1):
        text = re.sub(
            r"\{" + key + r"\}", values[_h_py(eid, salt) % len(values)], text
        )
    pool = TOPICS.get(topic_key, TOPICS["political"])
    return {
        "ex_id": eid,
        "text": text,
        "is_claim": is_claim,
        "stance": stance,
        "frames": ",".join(frames),
        "topic": pool[_h_py(eid, 99) % len(pool)],
    }


def assign_split_py(eid: int) -> str:
    bucket = _h_py(eid, 7) % 100
    return "train" if bucket < SPLIT_TRAIN else ("val" if bucket < SPLIT_VAL else "test")


def second_annotator_py(label: str, eid: int, label_set: list[str], agreement_pct: int) -> str:
    if _h_py(eid, 13) % 100 < agreement_pct:
        return label
    others = [s for s in label_set if s != label]
    return others[_h_py(eid, 23) % len(others)] if others else label


def cohen_kappa_py(pairs: list[tuple[str, str]]) -> float:
    n = len(pairs)
    po = sum(1 for a, b in pairs if a == b) / n
    ca: dict[str, int] = {}
    cb: dict[str, int] = {}
    for a, b in pairs:
        ca[a] = ca.get(a, 0) + 1
        cb[b] = cb.get(b, 0) + 1
    pe = sum(ca.get(k, 0) * cb.get(k, 0) for k in set(ca) | set(cb)) / (n * n)
    return (po - pe) / (1 - pe)
