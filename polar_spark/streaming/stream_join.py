"""Watermarked stream-stream interval join.

The reference correlates event streams pairwise inside its consumers
(e.g. pipeline events joined to the runner/job events that executed
them) by buffering one side in actor state.  The Spark-native form is
Structured Streaming's stream-stream join: BOTH sides carry event-time
watermarks, the join condition bounds how long either side's state can
be buffered (the interval), and the engine evicts state past the
watermark automatically — bounded memory at unbounded input, the thing
the actor-state formulation has to hand-roll.

``attribution_join`` implements the canonical use: attribute each
``purchase`` to the ``view`` events of the same user within the
preceding ``window_minutes`` — the streaming sessionless attribution
join of an events pipeline.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_SCHEMA = "event_id long, user_id long, event_type string, ts timestamp"


def attribution_join(
    spark: SparkSession,
    views_dir: str,
    purchases_dir: str,
    checkpoint_dir: str,
    window_minutes: int = 60,
    watermark_minutes: int = 30,
    max_files_per_trigger: int = 4,
    progress_out: list | None = None,
) -> DataFrame:
    """Drains two JSONL event logs through a watermarked stream-stream
    interval join and returns the materialized attributions
    ``(purchase_id, view_id, user_id, lag_sec)``.

    Join condition: same user, ``view.ts ≤ purchase.ts ≤ view.ts +
    window``.  Both sides are watermarked, so Spark bounds the buffered
    state to watermark + interval — the plan carries the state-eviction
    contract (inspect ``StreamingSymmetricHashJoin`` in the query
    progress).  ``availableNow`` drains deterministically for tests;
    the same code runs continuous with a real trigger.
    """
    views = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(views_dir)
        .where(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", f"{watermark_minutes} minutes")
    )
    purchases = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(purchases_dir)
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", f"{watermark_minutes} minutes")
    )
    joined = purchases.join(
        views,
        F.expr(
            f"""
            user_id = v_user AND
            v_ts <= p_ts AND
            p_ts <= v_ts + interval {int(window_minutes)} minutes
            """
        ),
        "inner",
    ).select(
        "purchase_id",
        "view_id",
        "user_id",
        (F.unix_timestamp("p_ts") - F.unix_timestamp("v_ts")).alias("lag_sec"),
    )

    out: list[DataFrame] = []
    q = (
        joined.writeStream.foreachBatch(
            lambda b, _i: out.append(b.localCheckpoint(eager=True))
        )
        .option("checkpointLocation", os.path.join(checkpoint_dir, "ckpt"))
        .queryName(f"attribution_join_{int(time.monotonic() * 1000)}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if progress_out is not None:
        progress_out.extend(q.recentProgress)
    if not out:
        return spark.createDataFrame(
            [], "purchase_id long, view_id long, user_id long, lag_sec long"
        )
    acc = out[0]
    for b in out[1:]:
        acc = acc.unionByName(b)
    return acc
