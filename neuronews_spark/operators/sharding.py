"""Deterministic training-order shuffle and shard assignment.

The last stage of a pretraining-data pipeline: give every document a
stable (shard, position) so N training workers can each read one shard
in a reproducible pseudo-random order.  ``df.orderBy(rand())`` is wrong
twice at 100 TB — a global sort is one giant range-exchange, and
``rand()`` changes on retry/recompute, so two readers of the "same"
dataset can see different orders.

``deterministic_shuffle`` instead derives everything from md5 of the
row id (the :func:`stratified_sample` convention):

- ``shard`` = leading 32 hash bits mod ``n_shards`` — uniform, stable;
- ``pos``   = rank of the full hash within the shard.

The plan is ONE hash-partitioned exchange on ``shard`` followed by a
per-shard sort (each shard sorts independently — no global ordering,
no single reducer), which is exactly how the data will be consumed:
worker *i* reads shard *i* in ``pos`` order.  Changing ``seed``
reshuffles; changing ``n_shards`` only reassigns shard boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["deterministic_shuffle"]


def deterministic_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
    seed: int = 17,
) -> DataFrame:
    """(id, shard, pos): stable pseudo-random shard + in-shard order.

    ``pos`` is 1-based and dense within each shard.  The md5 key is
    also returned (``shuffle_key``) so a downstream writer can re-sort
    cheaply without recomputing the hash.  Ties on the full 128-bit
    hash are broken by id — unreachable in practice, but it makes the
    ordering a total function of (seed, id) by construction rather
    than by collision-probability argument.

    Scale note: the exchange hashes on ``shard``, so the job's
    parallelism IS ``n_shards`` — at cluster scale pick n_shards ≥
    executor cores (training runs want hundreds-to-thousands of shards
    anyway; the 8 here is test-sized).  Each shard sorts independently
    (no global order), so shard size, not corpus size, bounds task
    memory."""
    key = F.md5(
        F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
    )
    shard = F.pmod(
        F.conv(F.substring(key, 1, 8), 16, 10).cast("long"),
        F.lit(n_shards),
    ).cast("int")
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col("shuffle_key"), F.col(id_col))
    )
    return (
        df.select(
            F.col(id_col),
            key.alias("shuffle_key"),
            shard.alias("shard"),
        )
        .withColumn("pos", F.row_number().over(w))
    )
