"""Conversation assembly: window-ordered turn concatenation.

Semantics from the reference's media connector
(``/root/reference/src/ingestion/connectors/media/models.py:82-83``:
``full_text = " ".join(seg.text for seg in segments)`` with segments in
``segment_index`` order, ``connector.py:60-117``): one conversation's text is
the single-space join of its turns' text in stable ``turn_idx`` order, with
**per-turn text equality preserved** (no trimming, no reordering — the row
invariant from BASELINE.json input_hint).

Spark-first shape: a single ``groupBy(conv_id)`` with
``array_sort(collect_list(struct(turn_idx, text)))`` — one shuffle keyed by
``conv_id``, map-side partial aggregation, no Python workers, no window
function (a window would sort within partitions *and* carry every turn row
through; the aggregate form collapses to one row per conversation in the
same shuffle).

Scale notes (100 TB / 10^12 turns): the shuffle key is ``conv_id`` so hot
conversations skew a partition — AQE skew-join/partition splitting is on in
the session, and ``assemble_conversations`` exposes ``max_turns`` to cap
pathological conversations (capped rows are reported via the lineage table,
never silently dropped).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TRANSCRIPT_COLUMNS = ("conv_id", "turn_idx", "role", "text", "tool", "ts")


def assemble_conversations(
    transcripts: DataFrame,
    max_turns: int | None = None,
) -> DataFrame:
    """transcripts(conv_id, turn_idx, role, text, tool, ts) → one row per
    conversation: ``doc_text`` = ordered single-space concat of turn text.

    Returns columns: conv_id, doc_text, n_turns, started_at, ended_at.
    ``max_turns`` keeps only the first N turns per conversation (by
    turn_idx) — ``n_turns`` still counts all turns so capping is auditable.
    """
    turns_struct = F.array_sort(
        F.collect_list(F.struct(F.col("turn_idx"), F.col("text")))
    )
    if max_turns is not None:
        kept = F.slice(turns_struct, 1, max_turns)
    else:
        kept = turns_struct
    doc_text = F.array_join(
        F.transform(kept, lambda s: F.coalesce(s["text"], F.lit(""))), " "
    )
    return transcripts.groupBy("conv_id").agg(
        doc_text.alias("doc_text"),
        F.count(F.lit(1)).alias("n_turns"),
        F.min("ts").alias("started_at"),
        F.max("ts").alias("ended_at"),
    )


def explode_turns(conversations: DataFrame) -> DataFrame:
    """Round-trip helper for the per-turn equality invariant test:
    split ``doc_text`` back into turns (only valid when no turn text
    itself contains the join separator in ambiguous ways — tests use it
    on fixtures constructed to be unambiguous)."""
    return conversations.select(
        "conv_id",
        F.posexplode(F.split(F.col("doc_text"), " ")).alias("pos", "word"),
    )


def conversation_stats(transcripts: DataFrame) -> DataFrame:
    """Per-conversation transcript analytics — the profile you compute
    over an agent-conversation corpus before training on it: turn
    counts by role, user→assistant handoff count, text volume, wall
    duration, and the distinct tools invoked.

    Returns one row per conv_id:
      n_turns, n_user, n_assistant, n_tool, n_role_switches (adjacent
      turns whose role differs, in turn_idx order), total_chars,
      first_ts, last_ts, duration_s (exact integer seconds),
      tools_used (comma-joined sorted distinct non-null tools — a
      string, not an array, so it hashes across engines).

    Plan: ONE shuffle on conv_id — the lag window and the groupBy share
    the partitioning, so Catalyst plans a single exchange; every
    aggregate is exact-integer / min / max (order-free).  At 10^12
    turns this is the same conv-keyed exchange the assembly step
    already pays; hot conversations land on AQE skew handling like
    assemble_conversations documents.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    flagged = transcripts.withColumn("_prev_role", F.lag("role").over(w))
    return flagged.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.count_if(F.col("role") == "user").alias("n_user"),
        F.count_if(F.col("role") == "assistant").alias("n_assistant"),
        F.count_if(F.col("role") == "tool").alias("n_tool"),
        F.count_if(
            F.col("_prev_role").isNotNull()
            & (F.col("role") != F.col("_prev_role"))
        ).alias("n_role_switches"),
        F.sum(F.length(F.coalesce(F.col("text"), F.lit("")))).alias(
            "total_chars"
        ),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        (
            F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))
        ).alias("duration_s"),
        F.concat_ws(
            ",", F.sort_array(F.collect_set(F.col("tool")))
        ).alias("tools_used"),
    )
