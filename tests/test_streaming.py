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


def test_dedup_maintainer_across_batches(spark, tmp_path):
    """Streaming exact dedup: first-seen content survives, cross-batch
    and within-batch duplicates drop, replay is idempotent, state
    survives a 'restart' (fresh maintainer over the same work_dir)."""
    from polar_spark.streaming.dedup_stream import DedupMaintainer

    work = str(tmp_path / "dedup_state")
    m = DedupMaintainer(spark, work)
    b1 = spark.createDataFrame(
        [(0, "alpha"), (1, "beta"), (2, "alpha"), (3, "gamma")],
        "doc_id long, text string",
    )
    s1 = m.apply_batch(b1)
    assert s1["batch_rows"] == 4 and s1["batch_kept"] == 3 and s1["seen"] == 3

    # batch 2 overlaps batch 1 ('beta', 'gamma') and itself ('delta' x2)
    b2 = spark.createDataFrame(
        [(10, "beta"), (11, "delta"), (12, "delta"), (13, "gamma")],
        "doc_id long, text string",
    )
    kept_preview = sorted(r["id"] for r in m.kept_ids(b2).collect())
    s2 = m.apply_batch(b2)
    assert kept_preview == [11]
    assert s2["batch_kept"] == 1 and s2["seen"] == 4

    # replaying batch 2 keeps nothing (at-least-once idempotence)
    s3 = m.apply_batch(b2)
    assert s3["batch_kept"] == 0 and s3["seen"] == 4

    # restart: a fresh maintainer reads the same durable state
    m2 = DedupMaintainer(spark, work)
    assert m2.state()["seen"] == 4
    assert sorted(r["id"] for r in m2.kept_ids(b1).collect()) == []


def test_dedup_maintainer_streaming_drain(spark, tmp_path):
    """foreachBatch surface: a file-source backlog drains with
    availableNow and the seen table lands versioned."""
    import json as _json
    import os as _os

    from polar_spark.streaming.dedup_stream import (
        DedupMaintainer,
        start_dedup_maintenance,
    )

    src_dir = str(tmp_path / "docs_in")
    _os.makedirs(src_dir)
    with open(_os.path.join(src_dir, "b1.json"), "w") as f:
        for i, t in [(0, "one"), (1, "two"), (2, "one")]:
            f.write(_json.dumps({"doc_id": i, "text": t}) + "\n")
    stream = (
        spark.readStream.schema("doc_id long, text string").json(src_dir)
    )
    m = DedupMaintainer(spark, str(tmp_path / "state"))
    start_dedup_maintenance(stream, m, str(tmp_path / "ckpt")).awaitTermination()
    assert m.state()["seen"] == 2
    assert m.seen().count() == 2


def test_heavy_hitters_maintainer_across_batches(spark, tmp_path):
    """Streaming CM heavy hitters: batch folds merge, estimates are
    exact upper bounds (exact here — key domain << width), replayed
    batch_ids are skipped (exactly-once), restart reads durable state."""
    from polar_spark.streaming.topk_stream import HeavyHittersMaintainer

    work = str(tmp_path / "hh_state")
    m = HeavyHittersMaintainer(spark, work, key_col="k", width=512, max_candidates=50)
    b1 = spark.createDataFrame([(x % 5,) for x in range(100)], "k long")
    s1 = m.apply_batch(b1, batch_id=0)
    assert s1["version"] == 1 and s1["batch_rows"] == 100

    b2 = spark.createDataFrame([(7,)] * 60 + [(1,)] * 40, "k long")
    s2 = m.apply_batch(b2, batch_id=1)
    assert s2["version"] == 2

    top = {r["k"]: r["est"] for r in m.topk(3).collect()}
    # exact counts: k=1 → 20+40=60, k=7 → 60, others 20; CM is exact at
    # this cardinality (7 keys, width 512, no collisions possible? —
    # collisions would only ever OVER-estimate, so assert >= and topset)
    assert set(top) == {1, 7, 0} or set(top) == {1, 7, 2}
    assert top[1] >= 60 and top[7] >= 60

    # replaying batch 1 is a no-op (exactly-once on batch_id)
    s3 = m.apply_batch(b2, batch_id=1)
    assert s3.get("skipped_replay") is True and m.state()["version"] == 2

    # restart: fresh maintainer over the same work_dir sees the state
    m2 = HeavyHittersMaintainer(spark, work, key_col="k", width=512)
    assert m2.state()["version"] == 2
    top2 = {r["k"]: r["est"] for r in m2.topk(2).collect()}
    assert top2 == {k: v for k, v in top.items() if k in top2}


def test_heavy_hitters_streaming_drain(spark, tmp_path):
    """foreachBatch surface: a file backlog drains with availableNow;
    the recorded last_batch_id makes a re-run of the same checkpoint a
    no-op."""
    from polar_spark.streaming.topk_stream import (
        HeavyHittersMaintainer,
        start_heavy_hitters_maintenance,
    )

    src = tmp_path / "hh_src"
    src.mkdir()
    spark.createDataFrame([(x % 3,) for x in range(30)], "k long").write.mode(
        "overwrite"
    ).parquet(str(src / "p1"))
    stream = spark.readStream.schema("k long").parquet(str(src / "p1"))
    m = HeavyHittersMaintainer(spark, str(tmp_path / "hh_state2"), key_col="k")
    q = start_heavy_hitters_maintenance(
        stream, m, checkpoint=str(tmp_path / "hh_ckpt")
    )
    q.awaitTermination(120)
    st = m.state()
    assert st is not None and st["version"] >= 1
    top = {r["k"]: r["est"] for r in m.topk(3).collect()}
    assert top == {0: 10, 1: 10, 2: 10}


def test_quantile_maintainer_fold_restart_replay(spark, tmp_path):
    """Streaming log2-histogram quantiles: batch folds sum to the whole,
    replayed recorded batches are SKIPPED (sum fold is not idempotent —
    the skip IS the exactly-once mechanism), fresh instances resume."""
    from polar_spark.operators.sketches import log_hist_quantiles
    from polar_spark.streaming.quantile_stream import QuantileMaintainer

    m = QuantileMaintainer(spark, str(tmp_path), value_col="v", group_col="g")
    b1 = spark.range(1, 1001).selectExpr("id AS v", "CAST(id % 2 AS STRING) AS g")
    b2 = spark.range(1001, 3001).selectExpr("id AS v", "CAST(id % 2 AS STRING) AS g")
    m.apply_batch(b1, batch_id=0)
    m.apply_batch(b2, batch_id=1)
    # fold == whole: histogram equals the batch sketch of the union
    whole = log_hist_quantiles(
        b1.unionByName(b2), "v", "g", [0.5, 0.9, 0.99]
    )
    got = {(r["g"], r["q"]): r["est"] for r in m.quantiles([0.5, 0.9, 0.99]).collect()}
    want = {(r["g"], r["q"]): r["est"] for r in whole.collect()}
    assert got == want
    # bucket-width error bound vs the true quantile (values 1..3000)
    for (g, q), est in got.items():
        true = q * 3000
        assert true / 2 <= est <= true * 2 + 3
    # restart from pointer
    m2 = QuantileMaintainer(spark, str(tmp_path), value_col="v", group_col="g")
    assert m2.state()["version"] == 2
    before = {(r["g"], r["bucket"]): r["cnt"] for r in m2.histogram().collect()}
    # recorded replay skipped — histogram unchanged (sum would double-count)
    out = m2.apply_batch(b2, batch_id=1)
    assert out.get("skipped_replay") is True
    after = {(r["g"], r["bucket"]): r["cnt"] for r in m2.histogram().collect()}
    assert after == before
    # total mass equals rows folded exactly once
    assert sum(after.values()) == 3000


def test_quantile_maintainer_streaming_drain(spark, tmp_path):
    """foreachBatch surface: file backlog drains with availableNow."""
    import json as _json
    import os as _os

    from polar_spark.streaming.quantile_stream import (
        QuantileMaintainer,
        start_quantile_maintenance,
    )

    src_dir = str(tmp_path / "vals_in")
    _os.makedirs(src_dir)
    with open(_os.path.join(src_dir, "b1.json"), "w") as f:
        for i in range(1, 101):
            f.write(_json.dumps({"v": i, "g": "a"}) + "\n")
    stream = spark.readStream.schema("v long, g string").json(src_dir)
    m = QuantileMaintainer(spark, str(tmp_path / "state"))
    start_quantile_maintenance(stream, m, str(tmp_path / "ckpt")).awaitTermination()
    assert m.state()["batch_rows"] == 100
    q = {r["q"]: r["est"] for r in m.quantiles([0.5]).collect()}
    assert 32 <= q[0.5] <= 100  # p50 of 1..100 -> bucket est 1.5*2^5 = 48
