"""Structured Streaming ingestion: the Cassini broker path, Spark-native.

The reference moves events through a custom mTLS pub/sub broker with
per-topic FIFO queues, offline spill-to-JSONL and replay
(/root/reference/src/agents/cassini/broker/src/topic.rs:16-63,
client/src/lib.rs:42-120).  Its delivery contract is *at-least-once +
idempotent MERGE absorbs duplicates* (controller.rs:458-460).

Spark-native equivalent:

- topics → event-log directories (or Kafka topics on a cluster); here
  a file source with a fixed schema
- at-least-once + idempotent merge → ``foreachBatch`` into the
  GraphStore (each micro-batch is one atomic snapshot commit; replays
  of the same data are no-ops by merge semantics)
- offline queue/replay → checkpointLocation (source offsets tracked;
  restart resumes from the last committed batch)
- reorder tolerance (stub-then-fill, linker.rs:402-408) → the store's
  full-outer merge + coalesce — NO watermark-drop, matching the
  reference's never-drop-late-data behavior; watermarks are available
  as additive policy for windowed aggregates only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from polar_spark.operators.graph_store import GraphStore
from polar_spark.operators.provenance import EVENT_SCHEMA, project_events


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 16
) -> DataFrame:
    """File-source event stream with the provenance schema (one JSON file
    per publish, the JSONL spill format of the reference's offline
    queue)."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(path)
    )


def start_graph_ingestion(
    events: DataFrame,
    store: GraphStore,
    checkpoint_dir: str,
    query_name: str = "polar_graph_ingest",
) -> StreamingQuery:
    """events stream → graph store, exactly-once per micro-batch.

    Each micro-batch runs the same batch projection (`project_events`)
    and commits via the store's idempotent merges — the one-code-path
    batch/streaming design: streaming is just incremental batching of
    the identical DAG.
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        verts, edges, transitions = project_events(batch_df)
        store.upsert_nodes(verts)
        store.ensure_edges(edges)
        if not transitions.isEmpty():
            store.update_state(transitions)

    return (
        events.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_metrics(
    events: DataFrame,
    ts_col: str = "observed_at",
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming windowed aggregate (broker metrics analog — the
    reference's cassini metrics: per-stage counts/latency,
    /root/reference/src/agents/cassini/broker/src/metrics.rs:5-45).
    Watermark applies here (aggregation state eviction), NOT to graph
    ingestion."""
    with_ts = events.withColumn("_ts", F.to_timestamp(ts_col))
    win = F.window("_ts", window, slide) if slide else F.window("_ts", window)
    return (
        with_ts.withWatermark("_ts", watermark)
        .groupBy(win, "type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "type",
            "n_events",
        )
    )
