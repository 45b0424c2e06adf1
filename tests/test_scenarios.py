"""Broker stress-scenario harness tests: clean runs account every
message; injected loss and corruption are DETECTED (the harness's whole
point is that these metrics move when the pipeline misbehaves)."""

import glob
import os

import pytest

from polar_spark.streaming import scenarios


def _run(spark, tmp_path, spec, sub="run"):
    return scenarios.run_scenario(spark, spec, str(tmp_path / sub))


def test_throughput_scenario_clean(spark, tmp_path):
    m = _run(spark, tmp_path, scenarios.throughput_scenario(n=2000, topics=4))
    assert m.sent == 2000 and m.received == 2000
    assert m.lost == 0 and m.duplicates == 0 and m.integrity_failures == 0
    assert m.topics_seen == 4
    assert m.msgs_per_sec > 0 and m.batch_durations_ms


def test_batch_scenario_clean(spark, tmp_path):
    m = _run(spark, tmp_path, scenarios.batch_scenario(n=50, payload_bytes=16384))
    assert m.sent == 50 and m.received == 50 and m.lost == 0
    assert m.integrity_failures == 0


def test_topic_churn_scenario_clean(spark, tmp_path):
    m = _run(spark, tmp_path, scenarios.topic_churn_scenario(n=1000, topics=100))
    assert m.sent == 1000 and m.lost == 0
    assert m.topics_seen == 100


def test_mixed_scenarios_clean(spark, tmp_path):
    specs = scenarios.mixed_scenarios()
    for s in specs:
        s.n = min(s.n, 500)
    m = _run(spark, tmp_path, specs)
    assert m.sent == sum(s.n for s in specs)
    assert m.lost == 0 and m.integrity_failures == 0


def test_injected_loss_is_detected(spark, tmp_path):
    """Deleting a produced log file between produce and drain must
    surface as lost messages — the consumer-side sequence check."""
    workdir = tmp_path / "lossy"
    spec = scenarios.throughput_scenario(n=2000, topics=4)
    log_dir = str(workdir / "log")
    os.makedirs(log_dir, exist_ok=True)
    corpus = scenarios.generate_messages(spark, spec)
    corpus.write.mode("append").json(log_dir)
    victims = sorted(glob.glob(os.path.join(log_dir, "part-*")))
    os.remove(victims[0])

    # drain manually (produce already done): reuse run_scenario's spec
    # with zero extra production by pointing a fresh run at the dir
    import time

    from pyspark.sql import functions as F

    stream = (
        spark.readStream.schema(scenarios.MSG_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .json(log_dir)
    )
    received = []
    q = (
        stream.writeStream.foreachBatch(
            lambda b, _i: received.append(b.localCheckpoint(eager=True))
        )
        .option("checkpointLocation", str(workdir / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = received[0]
    for b in received[1:]:
        got = got.unionByName(b)
    n_distinct = got.select("topic", "seq").distinct().count()
    assert n_distinct < 2000  # loss visible in the sequence accounting


def test_injected_corruption_is_detected(spark, tmp_path):
    """Flipping payload bytes after production must surface as checksum
    integrity failures."""
    workdir = tmp_path / "corrupt"
    spec = scenarios.batch_scenario(n=20, payload_bytes=1024)
    log_dir = str(workdir / "log")
    os.makedirs(log_dir, exist_ok=True)
    scenarios.generate_messages(spark, spec).write.mode("append").json(log_dir)
    # corrupt one payload byte IN PLACE (same file length — the file
    # source validates sizes) in the first non-empty file
    marker = b'"payload":"'
    for victim in sorted(glob.glob(os.path.join(log_dir, "part-*"))):
        with open(victim, "rb") as f:
            raw = f.read()
        at = raw.find(marker)
        if at < 0:
            continue
        pos = at + len(marker)
        flip = b"0" if raw[pos : pos + 1] != b"0" else b"1"
        with open(victim, "wb") as f:
            f.write(raw[:pos] + flip + raw[pos + 1 :])
        # drop Hadoop's local-FS CRC sidecar so the corruption reaches
        # the APPLICATION-level checksum (the thing under test), the
        # way bit rot on HDFS/S3 without sidecars would
        crc = os.path.join(
            os.path.dirname(victim), "." + os.path.basename(victim) + ".crc"
        )
        if os.path.exists(crc):
            os.remove(crc)
        break

    m = scenarios.run_scenario(spark, ScenarioNoop(), str(workdir))
    assert m.integrity_failures > 0


class ScenarioNoop(scenarios.ScenarioSpec):
    """Zero-message spec: drain-only run over an existing log dir."""

    def __init__(self):
        super().__init__("noop", 0, 0, 1)


def test_latency_percentiles_recorded(spark, tmp_path):
    m = scenarios.run_scenario(
        spark, scenarios.throughput_scenario(n=2000), str(tmp_path / "lat")
    )
    assert m.lost == 0 and m.integrity_failures == 0
    assert m.latency_p50_ms is not None
    # ordering + sanity: p50 <= p99 <= max, all positive
    assert 0 < m.latency_p50_ms <= m.latency_p99_ms <= m.latency_max_ms
    d = m.as_dict()
    assert {"latency_p50_ms", "latency_p99_ms", "latency_max_ms"} <= set(d)
