"""Ports of the reference's graph-semantics contract tests
(/root/reference/src/agents/lib/src/graph/tests.rs — file:line cited
per test)."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from polar_spark.operators.graph_store import GraphStore


@pytest.fixture()
def store(spark):
    tmp = tempfile.mkdtemp(prefix="polar_store_")
    yield GraphStore(spark, tmp)
    shutil.rmtree(tmp, ignore_errors=True)


def _nodes(spark, rows):
    return spark.createDataFrame(
        rows, "label string, key string, props map<string,string>, observed_at string"
    )


def _edges(spark, rows):
    return spark.createDataFrame(
        rows,
        "src_label string, src_key string, dst_label string, dst_key string, "
        "rel_type string, props map<string,string>, observed_at string",
    )


def test_upsert_creates_node_with_props(store, spark):
    # tests.rs:173-216
    store.upsert_nodes(
        _nodes(spark, [("BuildJob", "b1", {"status": "running"}, "2026-01-01T00:00:00Z")])
    )
    rows = store.vertices.collect()
    assert len(rows) == 1
    assert rows[0]["label"] == "BuildJob" and rows[0]["props"]["status"] == "running"


def test_upsert_idempotent_three_times_one_node(store, spark):
    # tests.rs:218-246: same key x3 → exactly 1 node, props updated
    for status in ("queued", "running", "done"):
        store.upsert_nodes(_nodes(spark, [("BuildJob", "b1", {"status": status}, None)]))
    rows = store.vertices.collect()
    assert len(rows) == 1
    assert rows[0]["props"]["status"] == "done"


def test_upsert_merges_props_not_replaces(store, spark):
    # SET updates listed props, leaves others (controller.rs:252-276)
    store.upsert_nodes(_nodes(spark, [("Pod", "p1", {"a": "1", "b": "2"}, None)]))
    store.upsert_nodes(_nodes(spark, [("Pod", "p1", {"b": "3", "c": "4"}, None)]))
    props = store.vertices.collect()[0]["props"]
    assert props == {"a": "1", "b": "3", "c": "4"}


def test_ensure_edge_creates_both_endpoints(store, spark):
    # tests.rs:248-280: cross-vocabulary edge creates stub endpoints
    store.ensure_edges(
        _edges(spark, [("GitCommit", "abc", "BuildJob", "b1", "BUILT_BY", None, None)])
    )
    vs = {(r["label"], r["key"]) for r in store.vertices.collect()}
    assert vs == {("GitCommit", "abc"), ("BuildJob", "b1")}
    assert store.edges.count() == 1


def test_ensure_edge_idempotent_three_times_one_edge(store, spark):
    # tests.rs:282-312
    for _ in range(3):
        store.ensure_edges(
            _edges(spark, [("GitCommit", "abc", "BuildJob", "b1", "BUILT_BY", None, None)])
        )
    assert store.edges.count() == 1
    assert store.vertices.count() == 2


def test_stub_then_upsert_fills_props(store, spark):
    # out-of-order tolerance: stub MERGEd on first reference, props SET
    # when the authoritative event arrives (linker.rs:402-408)
    store.ensure_edges(
        _edges(spark, [("Sbom", "h1", "Package", "pkg:cargo/serde@1.0", "DESCRIBES", None, None)])
    )
    store.upsert_nodes(
        _nodes(spark, [("Package", "pkg:cargo/serde@1.0", {"name": "serde"}, None)])
    )
    row = store.vertices.where(F.col("label") == "Package").collect()[0]
    assert row["props"]["name"] == "serde"
    assert store.edges.count() == 1


def test_batch_dedup_latest_wins(store, spark):
    # set-oriented replacement for single-writer serialization: duplicate
    # keys in one batch collapse deterministically, latest observed_at wins
    store.upsert_nodes(
        _nodes(
            spark,
            [
                ("Pod", "p1", {"phase": "Pending"}, "2026-01-01T00:00:00Z"),
                ("Pod", "p1", {"phase": "Running"}, "2026-01-02T00:00:00Z"),
                ("Pod", "p1", {"phase": "Unknown"}, "2025-12-31T00:00:00Z"),
            ],
        )
    )
    rows = store.vertices.collect()
    assert len(rows) == 1
    assert rows[0]["props"]["phase"] == "Running"


def test_replace_edges_latest_pointer(store, spark):
    # M3 ReplaceEdge (controller.rs:315-337): delete-all-then-one
    store.ensure_edges(
        _edges(spark, [("GitRef", "r1", "GitCommit", "c1", "POINTS_TO", None, None)])
    )
    store.replace_edges(
        _edges(spark, [("GitRef", "r1", "GitCommit", "c2", "POINTS_TO", None, None)])
    )
    rows = store.edges.where(F.col("rel_type") == "POINTS_TO").collect()
    assert len(rows) == 1
    assert rows[0]["dst_key"] == "c2"


def test_remove_edges(store, spark):
    store.ensure_edges(
        _edges(
            spark,
            [
                ("A", "a", "B", "b1", "T", None, None),
                ("A", "a", "B", "b2", "T", None, None),
                ("A", "a", "B", "b3", "OTHER", None, None),
            ],
        )
    )
    store.remove_edges(
        spark.createDataFrame(
            [("A", "a", "T")], "src_label string, src_key string, rel_type string"
        )
    )
    rows = store.edges.collect()
    assert len(rows) == 1 and rows[0]["rel_type"] == "OTHER"


def test_update_state_temporal_chain(store, spark):
    # tests.rs:314-374: anchor + instance + TRANSITIONED_TO + OF_TYPE + HAS_STATE
    t = spark.createDataFrame(
        [("BuildJob", "b1", "BuildJobState", "b1@t1", "2026-01-01T00:00:00Z", {"s": "running"})],
        "resource_label string, resource_key string, state_type string, "
        "instance_key string, valid_from string, props map<string,string>",
    )
    store.update_state(t)
    labels = {(r["label"], r["key"]) for r in store.vertices.collect()}
    assert ("State", "BuildJobState") in labels
    assert ("BuildJob", "b1") in labels
    assert ("BuildJobStateState", "b1@t1") in labels
    rels = {r["rel_type"] for r in store.edges.collect()}
    assert rels == {"TRANSITIONED_TO", "OF_TYPE", "HAS_STATE"}
    assert store.state_history.count() == 1


def test_update_state_append_only_and_pointer_replaced(store, spark):
    # tests.rs:376-437: 2 transitions → 2 immutable history rows,
    # exactly 1 HAS_STATE pointer, pointing at the latest instance
    schema = (
        "resource_label string, resource_key string, state_type string, "
        "instance_key string, valid_from string, props map<string,string>"
    )
    store.update_state(
        spark.createDataFrame(
            [("Pod", "p1", "PodState", "p1@t1", "2026-01-01T00:00:00Z", {"phase": "Pending"})],
            schema,
        )
    )
    store.update_state(
        spark.createDataFrame(
            [("Pod", "p1", "PodState", "p1@t2", "2026-01-02T00:00:00Z", {"phase": "Running"})],
            schema,
        )
    )
    assert store.state_history.count() == 2  # append-only
    has_state = store.edges.where(F.col("rel_type") == "HAS_STATE").collect()
    assert len(has_state) == 1
    assert has_state[0]["dst_key"] == "p1@t2"  # points at latest
    cur = store.current_state.collect()
    assert len(cur) == 1 and cur[0]["props"]["phase"] == "Running"
    # replaying transition 1 must NOT move the pointer back (idempotent
    # replay — controller.rs:458-460) if it is older
    store.update_state(
        spark.createDataFrame(
            [("Pod", "p1", "PodState", "p1@t1", "2026-01-01T00:00:00Z", {"phase": "Pending"})],
            schema,
        )
    )
    assert store.state_history.count() == 2


def test_update_state_replay_keeps_history_immutable(store, spark):
    schema = (
        "resource_label string, resource_key string, state_type string, "
        "instance_key string, valid_from string, props map<string,string>"
    )
    t = spark.createDataFrame(
        [("Job", "j1", "JobState", "j1@t1", "2026-01-01T00:00:00Z", {"x": "1"})], schema
    )
    store.update_state(t)
    # re-delivery with *different* props must not mutate the instance
    t2 = spark.createDataFrame(
        [("Job", "j1", "JobState", "j1@t1", "2026-01-01T00:00:00Z", {"x": "CHANGED"})], schema
    )
    store.update_state(t2)
    hist = store.state_history.collect()
    assert len(hist) == 1
    assert hist[0]["props"] == {"x": "1"}


def _nodefile_state(store, label):
    """({cell: version}, {file: mtime+size}) for one vertex partition
    (all of its buckets)."""
    import os

    parts = store._parts_for("vertices", [label])
    files = {}
    for ck, part in parts.items():
        d = os.path.join(store.path, "vertices", f"v{part['v']}", part["dir"])
        for f in os.listdir(d):
            p = os.path.join(d, f)
            files[(ck, f)] = (os.path.getmtime(p), os.path.getsize(p))
    return {ck: p["v"] for ck, p in parts.items()}, files


def test_partition_scoped_commit_leaves_untouched_files(store, spark):
    """Commit I/O is O(touched partitions): writing label B must not
    rewrite (or even version-bump) label A's files."""
    store.upsert_nodes(_nodes(spark, [("A", "a1", {"x": "1"}, None)]))
    va, files_a = _nodefile_state(store, "A")
    store.upsert_nodes(_nodes(spark, [("B", "b1", {"y": "2"}, None)]))
    store.upsert_nodes(_nodes(spark, [("B", "b2", {"y": "3"}, None)]))
    va2, files_a2 = _nodefile_state(store, "A")
    assert va2 == va and files_a2 == files_a  # byte-untouched across commits
    assert store.vertices.count() == 3
    # ensure_edges between B and C: its stub upsert touches B/C but
    # must still leave A's files alone
    store.ensure_edges(_edges(spark, [("B", "b1", "C", "c1", "T", None, None)]))
    va3, files_a3 = _nodefile_state(store, "A")
    assert va3 == va and files_a3 == files_a


def test_time_travel_and_retention(spark, tmp_path):
    store = GraphStore(spark, str(tmp_path / "tt"), retention=3)
    store.upsert_nodes(_nodes(spark, [("Pod", "p1", {"phase": "Pending"}, "t1")]))
    v1 = store.version
    store.upsert_nodes(_nodes(spark, [("Pod", "p1", {"phase": "Running"}, "t2")]))
    v2 = store.version
    store.upsert_nodes(_nodes(spark, [("Pod", "p2", {"phase": "Pending"}, "t3")]))
    # read an OLDER snapshot after two later commits (the reader-pin
    # contract: retained snapshots stay readable)
    old = store.table_at("vertices", v1).collect()
    assert len(old) == 1 and old[0]["props"]["phase"] == "Pending"
    mid = store.table_at("vertices", v2).collect()
    assert len(mid) == 1 and mid[0]["props"]["phase"] == "Running"
    assert store.vertices.count() == 2
    # beyond the horizon → explicit error
    for _ in range(4):
        store.upsert_nodes(_nodes(spark, [("Pod", "p2", {"n": "x"}, None)]))
    with pytest.raises(ValueError, match="not retained"):
        store.table_at("vertices", v1)


def test_manifest_stats(spark, tmp_path):
    store = GraphStore(spark, str(tmp_path / "st"), collect_stats=True)
    store.upsert_nodes(
        _nodes(spark, [("Pod", "p1", None, None), ("Pod", "p2", None, None), ("Job", "j1", None, None)])
    )
    snap = store.snapshots()[-1]
    assert snap["stats"]["vertices"] == {"Pod": 2, "Job": 1}


def test_remove_edges_drains_partition(store, spark):
    store.ensure_edges(_edges(spark, [("A", "a", "B", "b", "ONLY", None, None)]))
    store.remove_edges(
        spark.createDataFrame([("A", "a", "ONLY")], "src_label string, src_key string, rel_type string")
    )
    assert store.edges.count() == 0
    assert store._parts_for("edges", ["ONLY"]) == {}  # pointer dropped


def test_update_state_is_one_atomic_commit(store, spark):
    """The staged M5 lands in ONE snapshot spanning history, vertices
    and edges (round 2: 3 commits; the reference wraps the five steps
    in one transaction) — a reader can never see the instance vertex
    without its TRANSITIONED_TO/HAS_STATE edges."""
    before = store.version
    store.update_state(
        spark.createDataFrame(
            [("Pod", "p1", "PodState", "p1@t1", "2026-01-01", {"phase": "Pending"})],
            "resource_label string, resource_key string, state_type string, "
            "instance_key string, valid_from string, props map<string,string>",
        )
    )
    assert store.version - before == 1


def test_compaction_preserves_data(store, spark):
    for i in range(3):
        store.upsert_nodes(_nodes(spark, [("Pod", f"p{i}", {"n": str(i)}, None)]))
        store.upsert_nodes(_nodes(spark, [("Job", f"j{i}", None, None)]))
    before = sorted(map(tuple, store.vertices.select("label", "key").collect()))
    store.compact("vertices")
    parts = store._manifest()["tables"]["vertices"]
    assert len({p["v"] for p in parts.values()}) == 1  # one version dir
    after = sorted(map(tuple, store.vertices.select("label", "key").collect()))
    assert after == before


def test_raw_query(store, spark):
    store.ensure_edges(
        _edges(spark, [("A", "a1", "B", "b1", "LINKS", None, None)])
    )
    out = store.raw_query(
        "SELECT count(*) AS n FROM edges JOIN vertices v ON v.label = edges.src_label "
        "AND v.key = edges.src_key"
    ).collect()
    assert out[0]["n"] == 1


def test_edge_table_for_analytics(store, spark):
    store.ensure_edges(
        _edges(
            spark,
            [
                ("R", "r1", "R", "r2", "DEPENDS_ON", None, None),
                ("R", "r2", "R", "r3", "DEPENDS_ON", None, None),
                ("R", "r1", "R", "r1b", "OTHER", None, None),
            ],
        )
    )
    et = store.edge_table("DEPENDS_ON")
    assert et.count() == 2
    assert et.select("src").distinct().count() == 2


def test_null_and_empty_partition_values_preserved(store, spark):
    """Null/'' label or rel_type (reachable via dynamic labels from scan
    data) must not be dropped or misclassified as a drained partition
    (ADVICE r2): they normalize to the '__unset__' sentinel."""
    store.upsert_nodes(
        _nodes(spark, [(None, "k1", {"a": "1"}, "t0"), ("", "k2", None, "t0"),
                       ("Pod", "p1", None, "t0")])
    )
    got = sorted(map(tuple, store.vertices.select("label", "key").collect()))
    assert got == [("Pod", "p1"), ("__unset__", "k1"), ("__unset__", "k2")]
    # a later commit on another label must not pop the sentinel partition
    store.upsert_nodes(_nodes(spark, [("Job", "j1", None, "t0")]))
    assert store.vertices.where(F.col("label") == "__unset__").count() == 2
    # edges with null rel_type follow the same rule
    store.ensure_edges(_edges(spark, [("A", "a1", "B", "b1", None, None, "t0")]))
    assert store.edges.where(F.col("rel_type") == "__unset__").count() == 1
    # idempotent replay of the normalized batch
    store.upsert_nodes(_nodes(spark, [(None, "k1", {"a": "2"}, "t1")]))
    row = store.vertices.where(
        (F.col("label") == "__unset__") & (F.col("key") == "k1")
    ).collect()
    assert len(row) == 1 and row[0]["props"]["a"] == "2"


def _cellfile_state(store, name):
    """{(cell, file): (mtime, size)} across every current cell of a table."""
    import os

    out = {}
    for ck, part in store._manifest()["tables"][name].items():
        d = os.path.join(store.path, name, f"v{part['v']}", part["dir"])
        for f in os.listdir(d):
            p = os.path.join(d, f)
            out[(ck, f)] = (os.path.getmtime(p), os.path.getsize(p))
    return out


def test_bucket_scoped_commit_leaves_untouched_buckets(spark, tmp_path):
    """A commit into a HOT partition (one rel_type) rewrites only the
    buckets its batch's source keys hash to — untouched buckets of the
    SAME partition stay byte-identical (VERDICT r2 #5)."""
    store = GraphStore(spark, str(tmp_path / "bk"), buckets=8)
    seed = _edges(
        spark,
        [("A", f"a{i}", "B", f"b{i}", "CONTAINS", None, "t0") for i in range(64)],
    )
    store.ensure_edges(seed)
    before = _cellfile_state(store, "edges")
    n_cells = len(store._parts_for("edges", ["CONTAINS"]))
    assert n_cells > 1  # the hot partition is actually spread over buckets
    # a single-edge batch touches exactly the buckets of its keys
    store.ensure_edges(_edges(spark, [("A", "a3", "B", "bX", "CONTAINS", None, "t1")]))
    after = _cellfile_state(store, "edges")
    untouched_same = [
        k for k in before if k in after and after[k] == before[k] and k[0].endswith("|CONTAINS")
    ]
    changed = [k[0] for k in before if k not in after or after[k] != before[k]]
    assert untouched_same, "every bucket of the hot partition was rewritten"
    # only the stub-vertex + edge buckets of 'a3' moved, not all 8
    touched_buckets = {c for c in changed}
    assert len({c.split("|", 1)[0] for c in touched_buckets}) <= 2
    assert store.edges.count() == 65


def test_ensure_edges_single_snapshot(store, spark):
    """ensure_edges lands stubs + edges in ONE version bump — no
    intermediate state with stub vertices and no edges."""
    before = store.version
    store.ensure_edges(_edges(spark, [("X", "x1", "Y", "y1", "LINKS", None, "t0")]))
    assert store.version - before == 1
    # the snapshot at that version shows both tables moved together
    snap = store.table_at("vertices", store.version).count()
    edges = store.table_at("edges", store.version).count()
    assert snap >= 2 and edges >= 1


def test_replace_edges_single_snapshot(store, spark):
    before = store.version
    store.replace_edges(_edges(spark, [("X", "x1", "Y", "y2", "POINTS", None, "t0")]))
    assert store.version - before == 1


def test_auto_compaction_bounds_version_dirs(spark, tmp_path):
    """With compact_every=8, repeated commits to one partition keep the
    on-disk version-dir count bounded (VERDICT r2 #9) and lose no data."""
    import os

    store = GraphStore(
        spark, str(tmp_path / "ac"), retention=2, buckets=4, compact_every=8
    )
    for i in range(20):
        store.upsert_nodes(_nodes(spark, [("Pod", f"p{i % 6}", {"i": str(i)}, f"t{i:03d}")]))
    vdirs = [d for d in os.listdir(os.path.join(str(tmp_path / "ac"), "vertices")) if d.startswith("v")]
    # without compaction+gc this would approach 20; bounded well below
    assert len(vdirs) <= 8, vdirs
    assert store.vertices.count() == 6
    got = {r["key"]: r["props"]["i"] for r in store.vertices.collect()}
    # latest wins per key: max i < 20 with i % 6 == k
    assert got == {f"p{k}": str(max(i for i in range(20) if i % 6 == k)) for k in range(6)}
