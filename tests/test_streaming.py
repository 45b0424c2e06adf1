"""Structured Streaming ingestion smoke: file-source events drive the
graph store to the same state as the batch path; restart resumes from
the checkpoint without duplicating effects."""

import json
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from polar_spark.operators.graph_store import GraphStore
from polar_spark.streaming.ingest import read_event_stream, start_graph_ingestion


def _write_event(d: str, i: int, payload: dict) -> None:
    with open(os.path.join(d, f"ev{i:03d}.json"), "w") as f:
        f.write(json.dumps(payload) + "\n")


@pytest.fixture()
def dirs():
    root = tempfile.mkdtemp(prefix="polar_stream_")
    ev_dir = os.path.join(root, "events")
    ck_dir = os.path.join(root, "ckpt")
    st_dir = os.path.join(root, "store")
    os.makedirs(ev_dir)
    yield ev_dir, ck_dir, st_dir
    shutil.rmtree(root, ignore_errors=True)


def test_streaming_ingestion_and_resume(spark, dirs):
    ev_dir, ck_dir, st_dir = dirs
    store = GraphStore(spark, st_dir)

    _write_event(
        ev_dir,
        0,
        {
            "type": "execution_started",
            "build_id": "b-1",
            "commit_sha": "abc",
            "ref_name": "main",
            "repo_url": "https://git/x",
            "observed_at": "2026-01-01T00:00:00Z",
        },
    )
    _write_event(
        ev_dir,
        1,
        {
            "type": "artifact_produced",
            "build_id": "b-1",
            "artifact_content_hash": "h1",
            "artifact_type": "sbom",
            "name": "s",
            "observed_at": "2026-01-01T00:00:01Z",
        },
    )

    q = start_graph_ingestion(read_event_stream(spark, ev_dir), store, ck_dir)
    q.awaitTermination(120)

    labels = {r["label"] for r in store.vertices.collect()}
    assert {"BuildJob", "GitCommit", "BuildArtifact"} <= labels
    assert store.edges.where(F.col("rel_type") == "BUILT_BY").count() == 1
    n_edges = store.edges.count()

    # restart with NO new files: checkpoint prevents reprocessing
    q2 = start_graph_ingestion(read_event_stream(spark, ev_dir), store, ck_dir)
    q2.awaitTermination(120)
    assert store.edges.count() == n_edges

    # new event after restart is picked up incrementally
    _write_event(
        ev_dir,
        2,
        {
            "type": "vulnerability_found",
            "build_id": "b-1",
            "identifier": "CVE-1",
            "severity": "low",
            "in_artifact": "h1",
            "observed_at": "2026-01-01T00:00:02Z",
        },
    )
    q3 = start_graph_ingestion(read_event_stream(spark, ev_dir), store, ck_dir)
    q3.awaitTermination(120)
    assert store.edges.where(F.col("rel_type") == "FOUND_IN").count() == 1
