"""applyInPandasWithState high-water mark: only commits past the
per-(repo, ref) mark flow through; the mark persists across
micro-batches via the checkpoint."""

import json
import os
import shutil
import tempfile

import pytest

from polar_spark.streaming.watermark import incremental_commits_stream

SCHEMA = "repo string, ref_name string, oid string, time long"


@pytest.fixture()
def dirs():
    root = tempfile.mkdtemp(prefix="polar_wm_")
    src = os.path.join(root, "src")
    ck = os.path.join(root, "ck")
    out = os.path.join(root, "out")
    os.makedirs(src)
    yield src, ck, out
    shutil.rmtree(root, ignore_errors=True)


def _write(src, name, rows):
    with open(os.path.join(src, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run_batch(spark, src, ck, out):
    stream = spark.readStream.schema(SCHEMA).json(src)
    q = (
        incremental_commits_stream(stream)
        .writeStream.format("json")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.schema(SCHEMA).json(out)
    return {(r["repo"], r["ref_name"], r["oid"]) for r in got.collect()}


def test_high_water_mark_across_batches(spark, dirs):
    src, ck, out = dirs
    _write(src, "b0.json", [
        {"repo": "r", "ref_name": "main", "oid": "c1", "time": 1},
        {"repo": "r", "ref_name": "main", "oid": "c2", "time": 2},
        {"repo": "r", "ref_name": "dev", "oid": "d5", "time": 5},
    ])
    seen = _run_batch(spark, src, ck, out)
    assert seen == {("r", "main", "c1"), ("r", "main", "c2"), ("r", "dev", "d5")}

    # batch 2: re-delivery of c2 (time 2) must be filtered by the mark;
    # c3 advances; dev's older-than-mark d4 is dropped (per-ref marks
    # are independent — lib.rs:693-701)
    _write(src, "b1.json", [
        {"repo": "r", "ref_name": "main", "oid": "c2", "time": 2},
        {"repo": "r", "ref_name": "main", "oid": "c3", "time": 3},
        {"repo": "r", "ref_name": "dev", "oid": "d4", "time": 4},
    ])
    seen = _run_batch(spark, src, ck, out)
    assert seen == {
        ("r", "main", "c1"),
        ("r", "main", "c2"),
        ("r", "dev", "d5"),
        ("r", "main", "c3"),
    }
