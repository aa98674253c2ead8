"""Blocking: map ER vertices into candidate blocks, generate candidate pairs.

The reference restricts its candidate scan to nodes of the same type
(``resolution.py:104-108`` ``_by_type`` index) with an exact-alias-index
fast path (``resolution.py:165-167``). At 10^12-turn scale an all-pairs
scan within type is impossible, so we block (north rule): a vertex lands in
a small set of blocks and only same-block pairs are ever scored. Pairwise
F1 is *defined over same-block pairs*, so every predicate the reference can
fire must be reachable through ≥1 blocking modality:

  modality            reaches reference predicate
  ------------------  ------------------------------------------------------
  x: exact norm       exact alias-index hit (resolution.py:165-167)
  p: surname          _person_compatible — it *requires* equal surnames
                      (resolution.py:63), so surname blocking is lossless
                      for the person path
  t: token            _token_containment — containment implies ≥1 shared
                      token (every token of the smaller side is shared)
  s: sorted tokens    fuzzy sorted-token key (data_validation_pipeline.py:
                      248-280) — word-order variants
  m: MinHash-LSH      SequenceMatcher ratio ≥ 0.88 ⇒ high char-shingle
                      overlap; LSH over char-3gram shingles recovers those
                      pairs with tunable recall (16 hashes × 4 bands)

All keys are pure Column expressions (see ``functions.normalize``); the
pair generator is one self-equi-join on ``block_key`` with ``id_a < id_b``
ordering + global pair dedup. Hot blocks (common surnames, stop-token
blocks) are capped: blocks larger than ``max_block_size`` are *dropped and
reported* through the returned stats DataFrame (per-partition lineage),
bounding the worst-case pair count at cap²/2 per block.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from neuronews_spark.functions.normalize import (
    char_shingles,
    fuzzy_sort_key,
    minhash_band_keys,
    tokens,
)


def block_keys_column(
    entity_type: Column,
    norm: Column,
    n_hashes: int = 16,
    bands: int = 4,
    with_token_keys: bool = True,
) -> Column:
    """Array of blocking keys for one vertex (all modalities, type-scoped)."""
    keys = [
        F.array(F.concat_ws("|", F.lit("x"), entity_type, norm)),
        F.array(F.concat_ws("|", F.lit("s"), entity_type, fuzzy_sort_key(norm))),
        F.when(
            entity_type == F.lit("Person"),
            F.array(F.concat_ws("|", F.lit("p"), F.element_at(tokens(norm), -1))),
        ).otherwise(F.array().cast("array<string>")),
        F.transform(
            minhash_band_keys(char_shingles(norm), n_hashes=n_hashes, bands=bands),
            lambda k: F.concat_ws("|", k, entity_type),
        ),
    ]
    if with_token_keys:
        keys.append(
            F.transform(
                tokens(norm),
                lambda t: F.concat_ws("|", F.lit("t"), entity_type, t),
            )
        )
    return F.array_distinct(F.concat(*keys))


def build_blocks(
    vertices: DataFrame,
    n_hashes: int = 16,
    bands: int = 4,
    with_token_keys: bool = True,
) -> DataFrame:
    """vertices(entity_type, name, norm, node_id, ...) →
    (block_key, node_id, entity_type, name, norm): one row per (vertex, key).
    """
    return vertices.select(
        F.explode(
            block_keys_column(
                F.col("entity_type"),
                F.col("norm"),
                n_hashes=n_hashes,
                bands=bands,
                with_token_keys=with_token_keys,
            )
        ).alias("block_key"),
        "node_id",
        "entity_type",
        "name",
        "norm",
    )


def block_stats(blocks: DataFrame) -> DataFrame:
    """Per-block sizes — the blocking-stage lineage/metrics source."""
    return blocks.groupBy("block_key").agg(
        F.count(F.lit(1)).alias("block_size"),
        F.first("entity_type").alias("entity_type"),
    )


def candidate_pairs(
    blocks: DataFrame,
    max_block_size: int = 1000,
) -> tuple[DataFrame, DataFrame]:
    """Same-block self-join → distinct candidate pairs (id_a < id_b).

    Returns ``(pairs, capped_blocks)``:
      pairs: id_a, id_b, type (entity_type), name_a, name_b, norm_a, norm_b,
             block_key (an arbitrary key the pair met under — kept for the
             same-block F1 evaluation)
      capped_blocks: blocks exceeding ``max_block_size`` that were excluded
             (block_key, block_size) — written to lineage by the pipeline,
             never silently dropped.

    The join shuffles both sides on ``block_key``; AQE skew-join splits any
    residual hot key. Pair dedup is a groupBy on (id_a, id_b) keeping one
    witness block key (min), which also gives map-side partial aggregation.
    """
    sizes = block_stats(blocks)
    capped = sizes.filter(F.col("block_size") > max_block_size).select(
        "block_key", "block_size", "entity_type"
    )
    ok_blocks = blocks.join(
        F.broadcast(capped.select("block_key")), "block_key", "left_anti"
    )

    a = ok_blocks.alias("a")
    b = ok_blocks.alias("b")
    raw = (
        a.join(b, on="block_key")
        .filter(F.col("a.node_id") < F.col("b.node_id"))
        .select(
            F.col("block_key"),
            F.col("a.node_id").alias("id_a"),
            F.col("b.node_id").alias("id_b"),
            F.col("a.entity_type").alias("type"),
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
            F.col("a.norm").alias("norm_a"),
            F.col("b.norm").alias("norm_b"),
        )
    )
    pairs = raw.groupBy("id_a", "id_b").agg(
        F.min("block_key").alias("block_key"),
        F.first("type").alias("type"),
        F.first("name_a").alias("name_a"),
        F.first("name_b").alias("name_b"),
        F.first("norm_a").alias("norm_a"),
        F.first("norm_b").alias("norm_b"),
    )
    return pairs, capped
