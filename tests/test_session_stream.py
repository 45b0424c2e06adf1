"""Streaming session windows: merge-within-gap, watermark-driven
finalization (append exactly-once), late-event drop, and bit-parity of
every closed session with the batch twin."""

import json
import os
import shutil
import tempfile

import pytest

from polar_spark.streaming.session_stream import sessionize_batch, sessionize_stream

SCHEMA = "user_id long, ts timestamp, event_type string"


@pytest.fixture()
def dirs():
    root = tempfile.mkdtemp(prefix="polar_sess_")
    src = os.path.join(root, "src")
    ck = os.path.join(root, "ck")
    out = os.path.join(root, "out")
    os.makedirs(src)
    yield src, ck, out
    shutil.rmtree(root, ignore_errors=True)


def _write(src, name, rows):
    with open(os.path.join(src, name), "w") as f:
        for u, ts, et in rows:
            f.write(json.dumps({"user_id": u, "ts": ts, "event_type": et}) + "\n")


def _run(spark, src, ck, out):
    stream = spark.readStream.schema(SCHEMA).json(src)
    q = (
        sessionize_stream(stream, gap="10 minutes", watermark_delay="5 minutes")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    try:
        return {
            (
                r["user_id"],
                str(r["session_start"]),
                str(r["session_end"]),
                r["n_events"],
                r["n_types"],
                r["span_sec"],
            )
            for r in spark.read.parquet(out).collect()
        }
    except Exception:
        return set()  # no output files yet


def test_sessions_close_when_watermark_passes(spark, dirs):
    src, ck, out = dirs
    # user 1: two events 3 min apart (one session); user 2: one event
    _write(src, "b0.json", [
        (1, "2024-01-01 10:00:00", "view"),
        (1, "2024-01-01 10:03:00", "click"),
        (2, "2024-01-01 10:01:00", "view"),
    ])
    got = _run(spark, src, ck, out)
    assert got == set()  # watermark has not passed any session end yet

    # a much later event advances the watermark past both sessions
    _write(src, "b1.json", [(3, "2024-01-01 12:00:00", "view")])
    got = _run(spark, src, ck, out)
    assert (1, "2024-01-01 10:00:00", "2024-01-01 10:13:00", 2, 2, 180) in got
    assert (2, "2024-01-01 10:01:00", "2024-01-01 10:11:00", 1, 1, 0) in got
    # user 3's own session is still open (nothing after it)
    assert not any(r[0] == 3 for r in got)


def test_events_within_gap_merge_across_batches(spark, dirs):
    src, ck, out = dirs
    _write(src, "b0.json", [(1, "2024-01-01 10:00:00", "view")])
    _run(spark, src, ck, out)
    # second event 8 min later (< 10 min gap) must MERGE into the open
    # session held in state, not open a new one
    _write(src, "b1.json", [(1, "2024-01-01 10:08:00", "click")])
    _run(spark, src, ck, out)
    _write(src, "b2.json", [(9, "2024-01-01 12:00:00", "view")])
    got = _run(spark, src, ck, out)
    assert (1, "2024-01-01 10:00:00", "2024-01-01 10:18:00", 2, 2, 480) in got


def test_late_event_beyond_watermark_dropped(spark, dirs):
    src, ck, out = dirs
    _write(src, "b0.json", [
        (1, "2024-01-01 10:00:00", "view"),
        (9, "2024-01-01 12:00:00", "view"),  # advances watermark to 11:55
    ])
    got = _run(spark, src, ck, out)
    base = {r for r in got if r[0] == 1}
    assert (1, "2024-01-01 10:00:00", "2024-01-01 10:10:00", 1, 1, 0) in base

    # an event far older than the watermark: no effect on closed output
    _write(src, "b1.json", [(1, "2024-01-01 10:01:00", "late")])
    _write(src, "b2.json", [(9, "2024-01-01 14:00:00", "view")])
    got = _run(spark, src, ck, out)
    assert {r for r in got if r[0] == 1} == base


def test_closed_sessions_match_batch_twin(spark, dirs):
    src, ck, out = dirs
    rows = [
        (1, "2024-01-01 10:00:00", "view"),
        (1, "2024-01-01 10:05:00", "click"),
        (1, "2024-01-01 10:30:00", "view"),   # new session (25 min gap)
        (2, "2024-01-01 10:02:00", "view"),
        (2, "2024-01-01 10:09:00", "buy"),
        (3, "2024-01-01 09:55:00", "view"),
    ]
    # all rows in one delivery (a second run would place them behind
    # the first run's watermark — the late-drop test covers that);
    # then a flush key closes every session
    _write(src, "b0.json", rows)
    _run(spark, src, ck, out)
    _write(src, "b1.json", [(9, "2024-01-01 13:00:00", "view")])
    closed = _run(spark, src, ck, out)

    from pyspark.sql import functions as F

    batch = sessionize_batch(
        spark.createDataFrame(
            rows, "user_id long, ts string, event_type string"
        ).withColumn("ts", F.col("ts").cast("timestamp")),
        gap="10 minutes",
    )
    batch_set = {
        (
            r["user_id"],
            str(r["session_start"]),
            str(r["session_end"]),
            r["n_events"],
            r["n_types"],
            r["span_sec"],
        )
        for r in batch.collect()
    }
    # every closed streaming session appears bit-identical in batch
    for s in closed:
        if s[0] == 9:
            continue  # the flush key's session is still open
        assert s in batch_set, s
    # and all sessions of keys 1,2,3 did close
    assert len([s for s in closed if s[0] in (1, 2, 3)]) == len(
        [s for s in batch_set if s[0] in (1, 2, 3)]
    )
