"""Broker stress-scenario harness, Spark-native.

The reference ships a test harness that exercises its broker under
parameterized workloads — producer/consumer actors, message-size/rate
control, metrics for throughput, latency, loss and integrity
(/root/reference/src/agents/cassini/test/README.md:3-60).  This module
is the Spark-native analog over the event-log streaming path: a
scenario materializes a deterministic message corpus (sequence numbers
+ content checksums), PRODUCES it as JSONL into a topic log (the
reference's offline-spill format), CONSUMES it with the Structured
Streaming file source under ``availableNow``, and reports the same
metric families the reference's harness logs:

- sent / received counts, loss rate (per-topic sequence accounting)
- duplicate rate (at-least-once delivery surfaced, not hidden)
- checksum integrity failures
- produce / drain walls, messages/sec, per-micro-batch durations

Scenario classes mirror the reference's taxonomy: **throughput** (many
small messages), **batch** (fewer, larger payloads), **topic churn**
(messages spread over many short-lived topics), **mixed** (all of the
above at once).  Corpora are deterministic (seeded) so runs are
reproducible and loss/corruption injections are testable.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MSG_SCHEMA = "topic string, seq long, payload string, checksum string, ts timestamp"


@dataclass
class ScenarioSpec:
    """One producer workload: ``n`` messages of ``payload_bytes`` spread
    round-robin over ``topics`` topic names prefixed ``topic_prefix``."""

    name: str
    n: int
    payload_bytes: int
    topics: int
    topic_prefix: str = "t"
    seed: int = 42
    produce_files: int = 8


def throughput_scenario(n: int = 20_000, payload_bytes: int = 32, topics: int = 4) -> ScenarioSpec:
    """Small messages at high rate — the broker hot path."""
    return ScenarioSpec("throughput", n, payload_bytes, topics)


def batch_scenario(n: int = 200, payload_bytes: int = 65_536, topics: int = 2) -> ScenarioSpec:
    """Fewer, larger payloads — per-message overhead amortization."""
    return ScenarioSpec("batch", n, payload_bytes, topics)


def topic_churn_scenario(n: int = 5_000, payload_bytes: int = 64, topics: int = 200) -> ScenarioSpec:
    """Many short-lived topics — topic-metadata pressure."""
    return ScenarioSpec("churn", n, payload_bytes, topics)


def mixed_scenarios() -> list[ScenarioSpec]:
    """Concurrent producers on multiple topic families."""
    return [
        ScenarioSpec("mix_small", 8_000, 32, 4, topic_prefix="small"),
        ScenarioSpec("mix_large", 100, 32_768, 2, topic_prefix="large"),
        ScenarioSpec("mix_churn", 2_000, 64, 50, topic_prefix="churn"),
    ]


def generate_messages(spark: SparkSession, spec: ScenarioSpec) -> DataFrame:
    """Deterministic corpus: per-message payload derived from
    (seed, seq) by repeating a seeded hex digest to ``payload_bytes``;
    checksum = sha256(payload) — all JVM expressions."""
    base = spark.range(0, spec.n, 1, spec.produce_files)
    digest = F.sha2(F.concat_ws(":", F.lit(spec.seed), F.col("id")), 256)
    reps = spec.payload_bytes // 64 + 1
    payload = F.substring(F.repeat(digest, reps), 1, spec.payload_bytes)
    return base.select(
        F.concat_ws("_", F.lit(spec.topic_prefix), (F.col("id") % spec.topics)).alias("topic"),
        (F.col("id") / spec.topics).cast("long").alias("seq"),
        payload.alias("payload"),
        F.sha2(payload, 256).alias("checksum"),
        # producer-side timestamp: consumer-side latency = batch arrival
        # wall − ts (the reference harness's per-message latency metric)
        F.current_timestamp().alias("ts"),
    )


@dataclass
class ScenarioMetrics:
    name: str
    sent: int = 0
    received: int = 0
    lost: int = 0
    duplicates: int = 0
    integrity_failures: int = 0
    topics_seen: int = 0
    produce_sec: float = 0.0
    drain_sec: float = 0.0
    msgs_per_sec: float = 0.0
    batch_durations_ms: list[int] = field(default_factory=list)
    # per-message consumer-side latency (batch arrival − produce ts),
    # the reference harness's latency metric family (cassini/test/
    # README.md: metrics collection — throughput, latency, loss)
    latency_p50_ms: float | None = None
    latency_p99_ms: float | None = None
    latency_max_ms: float | None = None

    def as_dict(self) -> dict:
        return dict(self.__dict__)


def run_scenario(
    spark: SparkSession,
    specs: ScenarioSpec | list[ScenarioSpec],
    workdir: str,
    max_files_per_trigger: int = 4,
) -> ScenarioMetrics:
    """Produce the corpus (JSONL topic log), drain it through the
    streaming file source, and account every message.

    Loss is computed per topic against the producer's own sequence
    contract (0..max_seq dense), so deleting a log file between produce
    and drain surfaces as ``lost`` — the reference's consumer-side
    sequence verification.  Duplicates (= received − distinct) surface
    at-least-once redelivery.  ``integrity_failures`` recomputes the
    checksum consumer-side."""
    if isinstance(specs, ScenarioSpec):
        specs = [specs]
    name = "+".join(s.name for s in specs)
    log_dir = os.path.join(workdir, "log")
    ckpt = os.path.join(workdir, "ckpt")
    os.makedirs(log_dir, exist_ok=True)

    t0 = time.monotonic()
    sent = 0
    for spec in specs:
        corpus = generate_messages(spark, spec)
        sent += corpus.count()
        corpus.write.mode("append").json(log_dir)
    produce_sec = time.monotonic() - t0

    received: list[DataFrame] = []
    arrivals_us: list[int] = []

    def sink(batch_df: DataFrame, _batch_id: int) -> None:
        received.append(batch_df.localCheckpoint(eager=True))
        arrivals_us.append(time.time_ns() // 1000)

    stream = (
        spark.readStream.schema(MSG_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(log_dir)
    )
    t0 = time.monotonic()
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .queryName(f"scenario_{name}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    drain_sec = time.monotonic() - t0
    batch_ms = [
        int(p["durationMs"].get("triggerExecution", 0)) for p in q.recentProgress
    ]

    m = ScenarioMetrics(name=name, sent=sent, produce_sec=round(produce_sec, 3),
                        drain_sec=round(drain_sec, 3), batch_durations_ms=batch_ms)
    if not received:
        m.lost = sent
        return m
    got = received[0]
    for b in received[1:]:
        got = got.unionByName(b)
    agg = got.agg(
        F.count("*").alias("n"),
        F.count_distinct("topic", "seq").alias("n_distinct"),
        F.count_distinct("topic").alias("n_topics"),
        F.sum((F.sha2("payload", 256) != F.col("checksum")).cast("long")).alias("bad"),
    ).collect()[0]
    m.received = int(agg["n"])
    m.duplicates = int(agg["n"] - agg["n_distinct"])
    m.topics_seen = int(agg["n_topics"])
    m.integrity_failures = int(agg["bad"] or 0)
    # sequence accounting: the producer's contract is a dense 0..k seq
    # per topic, so sent − distinct(topic, seq) counts every dropped
    # message — mid-stream gaps and entirely-missing topics alike
    m.lost = sent - int(agg["n_distinct"])
    m.msgs_per_sec = round(m.received / drain_sec, 1) if drain_sec else 0.0
    # consumer-side latency per MESSAGE: arrival wall of the batch that
    # delivered it (post-materialization) − its producer timestamp
    lat = None
    for b, arr in zip(received, arrivals_us):
        one = b.select(
            ((F.lit(arr) - F.unix_micros(F.col("ts"))) / F.lit(1000.0)).alias("lat_ms")
        )
        lat = one if lat is None else lat.unionByName(one)
    if lat is not None:
        row = lat.agg(
            F.percentile_approx("lat_ms", 0.5, 10_000).alias("p50"),
            F.percentile_approx("lat_ms", 0.99, 10_000).alias("p99"),
            F.max("lat_ms").alias("mx"),
        ).collect()[0]
        if row["p50"] is not None:
            m.latency_p50_ms = round(float(row["p50"]), 1)
            m.latency_p99_ms = round(float(row["p99"]), 1)
            m.latency_max_ms = round(float(row["mx"]), 1)
    return m
