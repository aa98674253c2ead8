"""Structured-Streaming ingest: watermark dedup + exactly-once merge sink.

Re-creates the reference's streaming path over any streaming source:

  * watermark + key dedup   stream_write_raw.py:105-109
    (``withWatermark(ts, '2 hours')`` → drop duplicate ids; late events
    beyond the watermark are dropped — test_watermark_deduplication.py
    semantics: ≤1 row per key survives, >2h-late rows never land)
  * exactly-once foreachBatch MERGE   stream_write_raw_exactly_once.py:132-173
    (idempotent per-micro-batch MERGE keyed by id — here backed by the
    ParquetCatalog merge_upsert, identical SQL against a real Iceberg
    catalog)
  * Kafka JSON parsing   stream_write_raw_exactly_once.py:88-120
    (``from_json`` with an explicit schema + flatten — provided as a
    transformation usable on any source that yields a ``value`` column)

Local tests drive these with a file source + ``maxFilesPerTrigger=1`` so
each fixture file becomes one micro-batch (the late-data scenario needs
multiple batches to advance the watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from neuronews_spark.sources.tables import ParquetCatalog

ARTICLE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("published_at", T.TimestampType()),
        T.StructField("title", T.StringType()),
        T.StructField("body", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("url", T.StringType()),
    ]
)


def parse_json_stream(raw: DataFrame, schema: T.StructType = ARTICLE_SCHEMA) -> DataFrame:
    """Kafka-style value parsing: cast value → from_json → flatten +
    processing timestamp (stream_write_raw_exactly_once.py:88-120)."""
    return (
        raw.select(F.from_json(F.col("value").cast("string"), schema).alias("r"))
        .select("r.*")
        .withColumn("processed_at", F.current_timestamp())
    )


def to_json_records(df: DataFrame, key_col: str = "id") -> DataFrame:
    """Inverse of :func:`parse_json_stream`: serialize rows to the Kafka
    producer shape (key, value) with ``to_json`` over all columns — the
    ``to_json`` half of the reference's JSON ser/de surface
    (enhanced_graph_populator.py:551-560, document_model.py:61-82)."""
    payload = F.to_json(F.struct(*[F.col(c) for c in df.columns]))
    return df.select(
        F.col(key_col).cast("string").alias("key"), payload.alias("value")
    )


def watermark_dedup(
    stream: DataFrame,
    ts_col: str = "published_at",
    key: str = "id",
    delay: str = "2 hours",
) -> DataFrame:
    """stream_write_raw.py:105-109: watermark + per-key dedup. Uses
    ``dropDuplicatesWithinWatermark`` so the dedup state is evicted once the
    watermark passes (bounded state at 10^12-turn scale)."""
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark([key])


def start_dedup_to_memory(
    stream: DataFrame,
    query_name: str,
    ts_col: str = "published_at",
    key: str = "id",
    delay: str = "2 hours",
) -> StreamingQuery:
    """Test/demo sink: deduped stream → in-memory table."""
    deduped = watermark_dedup(stream, ts_col=ts_col, key=key, delay=delay)
    return (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )


def start_exactly_once_merge(
    stream: DataFrame,
    catalog: ParquetCatalog,
    table: str,
    key: str = "id",
    dedup_order: str | None = None,
    checkpoint_dir: str | None = None,
    processing_time: str | None = None,
) -> StreamingQuery:
    """Exactly-once sink: every micro-batch MERGEs into the target keyed by
    ``key`` (stream_write_raw_exactly_once.py:132-173). Re-delivered batches
    re-merge the same keys → idempotent; the checkpoint makes restarts
    resume from the last committed offset."""

    def _merge(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        catalog.merge_upsert(table, batch, key=key, dedup_order=dedup_order)

    writer = stream.writeStream.foreachBatch(_merge).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if processing_time:
        # micro-batch cadence (stream_write_raw_exactly_once.py:172:
        # trigger(processingTime='10 seconds'))
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def session_window_stats(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap: str = "30 minutes",
    value_col: str | None = None,
    watermark_delay: str | None = None,
) -> DataFrame:
    """Gap-based session aggregation via the built-in ``session_window``
    — the Spark-native form of ``operators/temporal.sessionize`` that
    also runs UNCHANGED on a stream: with ``watermark_delay`` set and a
    streaming input, append mode emits each session exactly once, when
    the watermark passes session_end + gap, and the session state store
    is evicted with it (bounded state at 10^12-turn scale — the same
    reason watermark_dedup uses dropDuplicatesWithinWatermark).

    Boundary note vs the batch operator: ``session_window`` starts a new
    session when the gap is >= the duration (window end is exclusive);
    ``sessionize`` splits only when strictly greater. The two agree on
    any input without an exact-gap tie (microsecond timestamps make
    those vanishingly rare; the differential test pins both behaviors).

    No custom ``applyInPandasWithState`` needed: the built-in covers the
    semantics, stays JVM-side, and composes with watermarks for free.
    """
    src = df
    if watermark_delay is not None:
        src = src.withWatermark(ts_col, watermark_delay)
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    ]
    if value_col is not None:
        aggs.append(
            F.sum(F.round(F.col(value_col) * 100).cast("long")).alias(
                "sum_value_cents"
            )
        )
    return (
        src.groupBy(F.col(key), F.session_window(F.col(ts_col), gap))
        .agg(*aggs)
        .select(
            key,
            F.col("session_window.start").alias("window_start"),
            F.col("session_window.end").alias("window_end"),
            "n_events",
            "session_start",
            "session_end",
            *(["sum_value_cents"] if value_col is not None else []),
        )
    )


def stateful_running_counts(
    df: DataFrame,
    key: str = "entity",
    watermark: tuple[str, str] | None = None,
) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    a per-key running counter that survives across micro-batches —
    the streaming-native form of the reference's per-entity mention
    counters, which kg_updater.py re-reads and increments per batch
    (src/knowledge_graph/kg_updater.py mention-count accumulation).

    Every micro-batch emits ONE row per key seen in that batch:
    (key, batch_rows, running_total, batches_seen), where
    running_total/batches_seen fold in all previous batches from the
    state store.  This is the escape hatch for stateful semantics the
    built-ins can't express (session_window_stats deliberately uses
    the built-in; this exists for genuinely custom state shapes) —
    state is a 2-int struct per key, Arrow-batched per group, and the
    state store shards by the grouping key exactly like a shuffle, so
    the operator scales with executors, not with stream length.

    ``watermark=(ts_col, delay)`` is accepted for symmetry with the
    other streaming ops (it bounds other stateful operators composed
    downstream); the counter itself keeps state for every key by
    design — at 10^12-turn scale you cap the key domain upstream
    (canonical entity ids, not raw surface forms).

    The pytest drives it through three real micro-batches (file source,
    maxFilesPerTrigger=1) and asserts the folded state per key.
    """
    import pandas as pd  # noqa: PLC0415 — Arrow path only

    from pyspark.sql.streaming.state import (  # noqa: PLC0415
        GroupState,
        GroupStateTimeout,
    )

    src = df
    if watermark is not None:
        src = src.withWatermark(*watermark)

    def _count(key_tuple, pdfs, state: GroupState):
        n = 0
        for pdf in pdfs:
            n += len(pdf)
        if state.exists:
            total, batches = state.get
        else:
            total, batches = 0, 0
        total += n
        batches += 1
        state.update((total, batches))
        yield pd.DataFrame(
            {
                key: [key_tuple[0]],
                "batch_rows": [n],
                "running_total": [total],
                "batches_seen": [batches],
            }
        )

    return src.groupBy(key).applyInPandasWithState(
        _count,
        outputStructType=(
            f"{key} string, batch_rows bigint, "
            "running_total bigint, batches_seen int"
        ),
        stateStructType="total bigint, batches int",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def start_incremental_er(
    stream_mentions: DataFrame,
    catalog: ParquetCatalog,
    store_table: str = "entity_store",
    out_table: str = "resolutions",
    checkpoint_dir: str | None = None,
    threshold: float = 0.88,
    scorer: str = "difflib",
    name_embeddings: DataFrame | None = None,
    embedding_threshold: float = 0.83,
) -> StreamingQuery:
    """Day-2 ER as a stream: every mention micro-batch resolves against
    the CURRENT canonical store (`operators/incremental_er
    .attach_increment` — the reference's per-ingest
    kg_updater.update_from_document:193 loop, batched), then

      * resolutions MERGE into ``out_table`` keyed by mention_id, and
      * every resolved (form → entity) pair MERGEs into ``store_table``
        keyed by the registered form — the distributed
        ``EntityResolver._register`` (resolution.py:222-227): future
        variants of a surface resolve to the same id, including
        entities FOUNDED by an earlier micro-batch.

    Exactly-once: replayed batches re-merge the same keys.  The entity
    ASSIGNMENT is replay-stable — a replayed mention that originally
    founded (or fuzzily matched) an entity now exact-matches the form
    its first delivery registered, yielding the SAME entity_id; only
    the audit columns (match_kind/score) reflect the re-evaluation.
    """

    def _attach(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        from neuronews_spark.operators.incremental_er import attach_increment

        spark = batch.sparkSession
        if catalog.exists(store_table):
            store = catalog.read(store_table).select(
                "entity_id", "entity_type", "norm"
            )
        else:
            store = spark.createDataFrame(
                [], "entity_id string, entity_type string, norm string"
            )
        res = attach_increment(
            store,
            batch,
            threshold=threshold,
            scorer=scorer,
            name_embeddings=name_embeddings,
            embedding_threshold=embedding_threshold,
        ).localCheckpoint(eager=True)  # one evaluation feeds both merges
        catalog.merge_upsert(
            out_table,
            res.withColumn("batch_id", F.lit(int(epoch_id))),
            key="mention_id",
        )
        forms = res.select(
            F.concat_ws(":", "entity_type", "norm").alias("form_key"),
            "entity_id",
            "entity_type",
            "norm",
        )
        catalog.merge_upsert(store_table, forms, key="form_key")

    writer = stream_mentions.writeStream.foreachBatch(_attach).outputMode(
        "update"
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
