"""Kafka source adapters + streaming throughput observability.

The sandbox has no Kafka broker, so everything here is split the way the
north rule wants it anyway: PURE option builders (unit-testable, config
only — point them at a real cluster and the reader runs unchanged) plus
thin reader wrappers, re-creating:

  * bounded batch backfill by offset / timestamp window
    (``/root/reference/jobs/spark/batch_backfill_kafka.py:44-120``). The
    reference hardcodes partition 0 in its offsets JSON (``:55-56``); the
    builders here take per-partition maps — the multi-partition form the
    Kafka source actually requires at scale — and collapse to the
    reference's shape for single-partition topics. Timestamp windows use
    ``startingTimestamp``/``endingTimestamp`` (ms), the documented Spark
    options for time-bounded reads.
  * the streaming reader options of
    ``stream_write_raw_exactly_once.py:76-86`` (earliest offsets,
    ``failOnDataLoss=false``).
  * backfill-while-paused: stop the stream (checkpoint holds its
    position), run the bounded batch read through the SAME parse + merge
    path (idempotent MERGE absorbs overlap), restart the stream from the
    checkpoint (``batch_backfill_kafka.py:1-10`` workflow).
  * lag/throughput observability (``stream_write_raw_exactly_once.py:
    207-215`` polls ``lastProgress``): a ``StreamingQueryListener``
    capturing rows/s per micro-batch, flushable into the lineage table.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession

try:  # pyspark >= 3.4
    from pyspark.sql.streaming.listener import StreamingQueryListener
except ImportError:  # pragma: no cover
    StreamingQueryListener = object  # type: ignore[assignment,misc]


# --------------------------------------------------------- option builders

def offsets_json(topic: str, partition_offsets: dict[int, int]) -> str:
    """Per-partition offsets in the JSON shape the Kafka source expects:
    ``{"topic": {"0": 123, "1": 456}}``."""
    return json.dumps(
        {topic: {str(p): int(o) for p, o in sorted(partition_offsets.items())}}
    )


def batch_options_by_offsets(
    topic: str,
    bootstrap_servers: str,
    starting: dict[int, int] | int,
    ending: dict[int, int] | int,
) -> dict[str, str]:
    """Bounded read by offset window (batch_backfill_kafka.py:44-57).
    ``starting``/``ending`` may be per-partition maps or a single int
    (applied to partition 0 — the reference's single-partition shape)."""
    if isinstance(starting, int):
        starting = {0: starting}
    if isinstance(ending, int):
        ending = {0: ending}
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": offsets_json(topic, starting),
        "endingOffsets": offsets_json(topic, ending),
    }


def batch_options_by_timestamps(
    topic: str,
    bootstrap_servers: str,
    start_ts_ms: int,
    end_ts_ms: int,
) -> dict[str, str]:
    """Bounded read by timestamp window in epoch-ms
    (batch_backfill_kafka.py:59-73; the global startingTimestamp /
    endingTimestamp options resolve to per-partition offsets broker-side)."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingTimestamp": str(int(start_ts_ms)),
        "endingTimestamp": str(int(end_ts_ms)),
    }


def batch_options_from_beginning(
    topic: str, bootstrap_servers: str
) -> dict[str, str]:
    """Full-topic bounded read (batch_backfill_kafka.py:75-85)."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": "earliest",
        "endingOffsets": "latest",
    }


def stream_options(
    topic: str,
    bootstrap_servers: str,
    starting_offsets: str = "earliest",
    fail_on_data_loss: bool = False,
) -> dict[str, str]:
    """Unbounded streaming reader options
    (stream_write_raw_exactly_once.py:76-86)."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": str(bool(fail_on_data_loss)).lower(),
    }


# ----------------------------------------------------------- reader shims

def read_kafka_batch(spark: SparkSession, options: dict[str, str]) -> DataFrame:
    """Bounded Kafka read — config only; requires the Kafka connector on a
    real cluster. The returned frame has the standard Kafka columns
    (key, value, topic, partition, offset, timestamp)."""
    return spark.read.format("kafka").options(**options).load()


def read_kafka_stream(spark: SparkSession, options: dict[str, str]) -> DataFrame:
    """Unbounded Kafka read — config only (see read_kafka_batch)."""
    return spark.readStream.format("kafka").options(**options).load()


# ------------------------------------------------------ progress listener

class ProgressCapture(StreamingQueryListener):
    """Captures per-micro-batch throughput from streaming progress events
    (the listener form of the reference's lastProgress polling loop,
    stream_write_raw_exactly_once.py:207-215).

    Rows buffer in memory (listener callbacks run on a driver event
    thread, where starting Spark jobs is unsafe); ``flush(lineage)``
    appends them to the lineage table as
    (stage='streaming', metric, key=query name, value) rows."""

    def __init__(self) -> None:
        self.rows: list[tuple[str, str, float]] = []

    # StreamingQueryListener interface
    def onQueryStarted(self, event: Any) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event: Any) -> None:  # noqa: N802
        p = event.progress
        name = p.name or p.id
        for metric, value in (
            ("input_rows_per_sec", p.inputRowsPerSecond),
            ("processed_rows_per_sec", p.processedRowsPerSecond),
            ("num_input_rows", p.numInputRows),
            ("batch_id", p.batchId),
        ):
            if value is not None:
                self.rows.append((metric, str(name), float(value)))

    def onQueryTerminated(self, event: Any) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event: Any) -> None:  # noqa: N802
        pass

    def flush(self, lineage) -> int:
        """Append captured metrics to a LineageWriter; returns row count."""
        rows, self.rows = self.rows, []
        for metric, key, value in rows:
            lineage.scalar("streaming", metric, value, key=key)
        return len(rows)
