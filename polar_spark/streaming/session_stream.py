"""Streaming sessionization: native ``session_window`` + event-time
watermark, append-mode finalization.

The batch operator (``relational`` / registered query ``sessionize``)
answers "what sessions does THIS table contain"; this is the unbounded
form: per-key session windows merge as events arrive, stay open in
Spark-managed state while new events fall within ``gap`` of the
session's end, and are emitted exactly once — closed — when the
event-time watermark passes ``session_end``.  That is the semantics the
reference's Cassini consumers approximate with per-topic rolling state
(SURVEY §2.8); here the engine owns merge/expiry/exactly-once instead
of hand-rolled actor state.

Scale posture: state is per OPEN session only (bounded by active keys,
not history), merges are done by the session-window state store, and
late events older than ``watermark_delay`` are dropped at the source —
no unbounded replay buffer.  At 100 TB/day the operator shards by
``key_col`` across executors; nothing here collects or loops on the
driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize_stream(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """events(key, ts timestamp, event_type) → closed sessions
    (key, session_start, session_end, n_events, n_types, span_sec).

    ``session_end`` is the native window end (last event + gap);
    ``span_sec`` is last−first event in whole seconds (exact long).
    Append mode: a session row appears exactly once, after the
    watermark passes its window end.
    """
    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(F.col(key_col), F.session_window(ts_col, gap).alias("w"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.size(F.collect_set("event_type")).cast("long").alias("n_types"),
            F.min(ts_col).alias("first_ts"),
            F.max(ts_col).alias("last_ts"),
        )
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "n_types",
            (F.unix_timestamp("last_ts") - F.unix_timestamp("first_ts"))
            .cast("long")
            .alias("span_sec"),
        )
    )


def sessionize_batch(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
) -> DataFrame:
    """Batch twin of :func:`sessionize_stream` — identical output
    schema over a static table (parity oracle for the streaming path:
    every CLOSED streaming session must appear here bit-identical)."""
    return (
        events.groupBy(F.col(key_col), F.session_window(ts_col, gap).alias("w"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.size(F.collect_set("event_type")).cast("long").alias("n_types"),
            F.min(ts_col).alias("first_ts"),
            F.max(ts_col).alias("last_ts"),
        )
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "n_types",
            (F.unix_timestamp("last_ts") - F.unix_timestamp("first_ts"))
            .cast("long")
            .alias("span_sec"),
        )
    )
