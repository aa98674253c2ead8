"""Deterministic synthetic transcripts + labeled ER ground truth.

Two generators, both pure functions of (seed, scale) — no external data:

``synthetic_transcripts``
    Distributed Column-math generator (spark.range → hash-indexed literal
    pools, zero Python workers) for the input table of BASELINE.json
    ``input_hint``: ``transcripts(conv_id, turn_idx, role, text, tool, ts)``.
    Each conversation's turns embed surface-form variants of one planted
    entity family, phrased so the reference's capitalized-sequence extractor
    (kg_updater.py:88-153) assigns the intended type:
      person   "Given Surname"  /  "Dr. Surname" (title context → PERSON)
      org      "Base Corp" / "Base Company" / "Base Group" (suffix → ORG)
      concept  3-token singular/plural variants (→ CONCEPT)
    ~1% of turns pile onto 3 hot conversations (skew fixture), mirroring the
    FIXTURES.md skew requirement.

``labeled_corpus``
    Driver-side typed mention corpus + family ground truth for pairwise-F1
    evaluation: the exact cases of the reference's labeled tests
    (tests/knowledge_graph/test_entity_resolution.py:29-105 — Hinton family,
    OpenAI family, Transformer/Transformers, Smith negatives, cross-type
    Apple, embedding-only NYC pair) plus N generated families with
    initial-form, suffix, spacing and plural variants, and same-surname
    negative pairs. Families are constructed unambiguously (no bare surname
    shared by two families), where greedy resolution (reference) and
    transitive closure (ours) provably coincide — see SURVEY.md §7.0.
"""

from __future__ import annotations

import random
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Deterministic pseudo-name pools
# ---------------------------------------------------------------------------

_CONS = "bcdfghklmnprstvz"
_VOWS = "aeiou"


def _mkword(rng: random.Random, syllables: int = 2) -> str:
    w = "".join(
        rng.choice(_CONS) + rng.choice(_VOWS) for _ in range(syllables)
    ) + rng.choice("nrstl")
    return w


def _cap(w: str) -> str:
    return w[:1].upper() + w[1:]


@dataclass(frozen=True)
class Family:
    family_id: str
    entity_type: str  # intended ontology type
    variants: tuple[str, ...]  # surface forms that must cluster together


def make_families(seed: int = 42, n_person: int = 24, n_org: int = 16, n_concept: int = 16) -> list[Family]:
    """Generated families with unique stems (plus reference-test families)."""
    rng = random.Random(seed)
    used: set[str] = set()

    def fresh(syllables: int = 2) -> str:
        while True:
            w = _mkword(rng, syllables)
            if w not in used:
                used.add(w)
                return w

    fams: list[Family] = [
        # the reference's labeled clusters (test_entity_resolution.py:29-105)
        Family("ref_hinton", "Person", ("Geoffrey Hinton", "Hinton", "G. Hinton")),
        Family("ref_john_smith", "Person", ("John Smith",)),
        Family("ref_jane_smith", "Person", ("Jane Smith",)),
        Family("ref_martin", "Person", ("Martin Hinton",)),
        Family("ref_openai", "Organization", ("OpenAI", "OpenAI Inc.", "Open AI")),
        Family("ref_transformer", "Concept", ("Transformer", "Transformers")),
        Family("ref_rnn", "Concept", ("Recurrent Neural Network",)),
        Family("ref_apple_person", "Person", ("Apple",)),
        Family("ref_apple_org", "Organization", ("Apple",)),
    ]
    # NOTE: ref_martin shares the Hinton surname with ref_hinton — under the
    # bare-surname alias "Hinton" the greedy reference itself is
    # order-dependent there; generated families below avoid shared surnames.
    for i in range(n_person):
        given, surname = _cap(fresh()), _cap(fresh(3))
        has_negative = i % 3 == 0
        variants = [f"{given} {surname}", f"{given[0]}. {surname}"]
        # a bare-surname variant is only planted when the surname is unique
        # to this family: with a same-surname negative present, the bare
        # surname is *ambiguous* and the greedy reference itself becomes
        # insertion-order-dependent (it joins whichever cluster came first,
        # resolution.py:171-179) — no order-free pipeline can match an
        # order-dependent label, so the labeled corpus excludes the case
        if i % 2 == 0 and not has_negative:
            variants.append(surname)
        fams.append(Family(f"p{i}", "Person", tuple(variants)))
        if has_negative:  # same-surname negative: must NOT merge
            other = _cap(fresh())
            fams.append(Family(f"p{i}_neg", "Person", (f"{other} {surname}",)))
    for i in range(n_org):
        base = _cap(fresh(3))
        fams.append(
            Family(
                f"o{i}",
                "Organization",
                (base, f"{base} Inc.", f"{base} Corp", f"{base} Group"),
            )
        )
    for i in range(n_concept):
        a, b = _cap(fresh()), _cap(fresh())
        fams.append(
            Family(
                f"c{i}",
                "Concept",
                (f"{a} {b} Theory", f"{a} {b} Theories"),
            )
        )
        if i % 4 == 0:
            fams.append(Family(f"c{i}_neg", "Concept", (_cap(fresh(4)),)))
    return fams


# embedding-only pair (test_entity_resolution.py:93-105)
EMBEDDING_VECTORS: dict[str, list[float]] = {
    "New York City": [1.0, 0.0, 0.0],
    "NYC": [0.99, 0.01, 0.0],
    "Los Angeles": [0.0, 1.0, 0.0],
}


def name_embeddings_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(k, v) for k, v in EMBEDDING_VECTORS.items()],
        "name string, vector array<double>",
    )


def labeled_corpus(
    spark: SparkSession, seed: int = 42, copies: int = 3, **family_kw
) -> tuple[DataFrame, DataFrame, list[Family]]:
    """Typed mention instances + family labels.

    Returns (mentions, families_df, families):
      mentions: conv_id, mention_idx, name, entity_type — ``copies``
        instances of every variant spread over synthetic conversations
        (exercises the mention-dedup-merge aggregation).
      families_df: family_id, entity_type, name — ground truth membership.
    """
    fams = make_families(seed, **family_kw)
    rng = random.Random(seed + 1)
    mention_rows = []
    family_rows = []
    for fam in fams:
        for v in fam.variants:
            family_rows.append((fam.family_id, fam.entity_type, v))
            for c in range(copies):
                conv = f"conv_{rng.randrange(10_000):05d}"
                mention_rows.append((conv, rng.randrange(50), v, fam.entity_type))
    mentions = spark.createDataFrame(
        mention_rows, "conv_id string, mention_idx int, name string, entity_type string"
    )
    families_df = spark.createDataFrame(
        family_rows, "family_id string, entity_type string, name string"
    )
    return mentions, families_df, fams


# ---------------------------------------------------------------------------
# Distributed transcript generator (Column math only)
# ---------------------------------------------------------------------------

_FILLER = (
    "the agent reviewed the request and suggested a plan for the next step "
    "before running the tool and summarizing results for the user"
).split()

_TEMPLATES = [
    ("please ask", "about the rollout plan"),
    ("we discussed", "during the standup"),
    ("the report cites", "as the primary driver"),
    ("we heard", "was mentioned again in the follow up"),
    ("according to", "the migration is on track"),
]


def _text_pools(seed: int, scale: int = 1) -> tuple[list[str], int]:
    """Flatten family variants into an indexable pool of *extractor-safe*
    phrases (pad each family to a fixed variant count V so indexing is pure
    arithmetic: pool[f * V + v]). ``scale`` multiplies the family counts so
    the distinct-surface population grows with the benchmark input."""
    fams = make_families(
        seed, n_person=24 * scale, n_org=16 * scale, n_concept=16 * scale
    )
    V = 3
    pool: list[str] = []
    for fam in fams:
        # keep only surfaces the capitalized-sequence extractor can type
        # correctly inside running text
        if fam.entity_type == "Person":
            safe = [v for v in fam.variants if len(v.split()) == 2 and "." not in v]
            solo = [v for v in fam.variants if len(v.split()) == 1]
            safe += [f"Dr. {v}" for v in solo]  # title context → PERSON
        elif fam.entity_type == "Organization":
            safe = [v for v in fam.variants if v.split()[-1].rstrip(".") in
                    ("Inc", "Corp", "Company", "Group")]
        else:
            safe = [v for v in fam.variants if len(v.split()) != 2]
        if not safe:
            continue
        pool.extend((safe * V)[:V])
    return pool, V


def synthetic_transcripts(
    spark: SparkSession,
    n_turns: int = 10_000,
    turns_per_conv: int = 20,
    seed: int = 42,
    partitions: int | None = None,
    family_scale: int | None = None,
) -> DataFrame:
    """Generate ``transcripts(conv_id, turn_idx, role, text, tool, ts)``.

    Column math over ``spark.range`` + one broadcast join against the
    surface pool — generation scales to arbitrary row counts without driver
    involvement and without growing the query plan. ~1% of turns land in 3
    hot conversations to exercise skew handling. ``family_scale`` (default:
    grows with n_turns) multiplies the planted entity-family count so the
    distinct-surface population — the ER problem size — scales with input.
    """
    if family_scale is None:
        family_scale = max(1, n_turns // 50_000)
    pool, V = _text_pools(seed, scale=family_scale)
    n_fam = len(pool) // V
    pool_df = F.broadcast(
        spark.createDataFrame(
            list(enumerate(pool)), "pool_idx int, surface string"
        )
    )
    fillers = F.array(*[F.lit(w) for w in _FILLER])
    tpl_pre = F.array(*[F.lit(p) for p, _ in _TEMPLATES])
    tpl_suf = F.array(*[F.lit(s) for _, s in _TEMPLATES])
    roles = F.array(F.lit("user"), F.lit("assistant"), F.lit("assistant"), F.lit("tool"))

    df = spark.range(0, n_turns, 1, partitions or spark.sparkContext.defaultParallelism)
    h = lambda k: F.pmod(F.xxhash64(F.col("id"), F.lit(seed + k)), F.lit(2**31))  # noqa: E731

    is_hot = (h(0) % 100) == 0
    base_conv = (F.col("id") / turns_per_conv).cast("long")
    conv_num = F.when(is_hot, h(1) % 3 + 1_000_000_000).otherwise(base_conv)
    conv_id = F.concat(F.lit("conv_"), F.format_string("%012d", conv_num))

    fam = (h(2) % F.lit(n_fam)).cast("int")
    var = (h(3) % F.lit(V)).cast("int")
    tpl_idx = (h(4) % F.lit(len(_TEMPLATES)) + 1).cast("int")
    fill = F.concat_ws(
        " ",
        F.element_at(fillers, (h(5) % F.lit(len(_FILLER)) + 1).cast("int")),
        F.element_at(fillers, (h(6) % F.lit(len(_FILLER)) + 1).cast("int")),
    )

    role = F.element_at(roles, (h(7) % 4 + 1).cast("int"))
    tool = F.when(role == "tool", F.lit("search")).otherwise(F.lit(None).cast("string"))
    # turn_idx must be unique + stable within conv: derive from id rank within
    # conv deterministically — id itself is monotone, so id works for normal
    # convs; hot convs get id-offset indexes (still unique & ordered by id)
    turn_idx = F.when(is_hot, F.col("id")).otherwise(
        F.col("id") % turns_per_conv
    ).cast("int")
    ts = F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id"))

    base = df.select(
        conv_id.alias("conv_id"),
        turn_idx.alias("turn_idx"),
        role.alias("role"),
        tool.alias("tool"),
        ts.alias("ts"),
        (fam * V + var).alias("pool_idx"),
        tpl_idx.alias("tpl_idx"),
        fill.alias("fill"),
    )
    with_surface = base.join(pool_df, "pool_idx")
    text = F.concat_ws(
        " ",
        F.col("fill"),
        F.element_at(tpl_pre, F.col("tpl_idx")),
        F.col("surface"),
        F.element_at(tpl_suf, F.col("tpl_idx")),
        F.col("fill"),
    )
    return with_surface.select(
        "conv_id",
        "turn_idx",
        "role",
        text.alias("text"),
        "tool",
        "ts",
    )
