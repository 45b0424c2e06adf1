"""E2E provenance smoke test — the reference's event sequence and its 9
golden queries (/root/reference/scripts/pipeline/smoke-test.nu:23-139),
plus git projection semantics (FIXTURES.md §3)."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from polar_spark.operators.git_projection import (
    detect_ref_changes,
    incremental_walk,
    project_commits,
    project_ref_updates,
)
from polar_spark.operators.graph_store import GraphStore
from polar_spark.operators.provenance import EVENT_SCHEMA, SMOKE_QUERIES, project_events


def _smoke_events(spark):
    """The exact sequence of smoke-test.nu:23-120: ExecutionStarted →
    StageStarted → ArtifactProduced(sbom) → SbomAnalyzed (root polar,
    components serde+tokio, serde→tokio edge) → ArtifactProduced(bin) →
    BinaryLinked → ContainerImageCreated(1 layer) → ArtifactProduced
    (image) → VulnerabilityFound → StageCompleted → ExecutionCompleted."""
    base = {k: None for k in (
        "build_id commit_sha ref_name repo_url stage_id stage_name duration_secs outcome "
        "severity identifier artifact_content_hash artifact_type name root_purl "
        "sbom_content_hash config_digest layers dep_edges components in_artifact "
        "manifest_digest registry_host".split()
    )}
    root = "pkg:cargo/polar@0.1.0"
    rows = []

    def ev(t, i, **kw):
        d = dict(base)
        d.update(type=t, build_id="b-1", observed_at=f"2026-01-01T00:00:{i:02d}Z", **kw)
        rows.append(d)

    ev("execution_started", 0, commit_sha="abc123", ref_name="main", repo_url="https://git/x")
    ev("stage_started", 1, stage_id="s1", stage_name="build")
    ev("artifact_produced", 2, artifact_content_hash="sbomhash", artifact_type="sbom", name="sbom.json")
    ev(
        "sbom_analyzed",
        3,
        sbom_content_hash="sbomhash",
        root_purl=root,
        components=["pkg:cargo/serde@1.0", "pkg:cargo/tokio@1.38"],
        dep_edges=[{"from_ref": "pkg:cargo/serde@1.0", "to_refs": ["pkg:cargo/tokio@1.38"]}],
    )
    ev("artifact_produced", 4, artifact_content_hash="binhash", artifact_type="elf-binary", name="polar")
    ev("binary_linked", 5, artifact_content_hash="binhash", root_purl=root, sbom_content_hash="sbomhash")
    ev("container_image_created", 6, config_digest="cfgdigest", layers=[{"order": 0, "diff_id": "sha256:l0"}])
    ev("artifact_produced", 7, artifact_content_hash="imghash", artifact_type="oci-image", name="img")
    ev("vulnerability_found", 8, identifier="CVE-2024-12345", severity="high", in_artifact="binhash")
    ev("stage_completed", 9, stage_id="s1", duration_secs=42, outcome="success")
    ev("execution_completed", 10, outcome="success")
    return spark.createDataFrame(rows, EVENT_SCHEMA)


@pytest.fixture()
def store(spark):
    tmp = tempfile.mkdtemp(prefix="polar_smoke_")
    yield GraphStore(spark, tmp)
    shutil.rmtree(tmp, ignore_errors=True)


def test_smoke_sequence_golden_queries(spark, store):
    events = _smoke_events(spark)
    verts, edges, transitions = project_events(events)
    store.upsert_nodes(verts)
    store.ensure_edges(edges)
    store.update_state(transitions)

    expected = {
        "build_job_exists": 1,
        "built_by": 1,
        "has_stage": 1,
        "found_vulnerability": 1,
        "built_from": 1,
        "describes": 1,
        # explicit serde→tokio plus flat-fallback root→serde, root→tokio
        # (the root has no explicit dep entry — linker.rs:166-202)
        "depends_on": 3,
        "has_layer": 1,
        "found_in": 1,
        # taxonomy edge always written on execution_started; the smoke
        # sequence carries no backend identity and no index manifests
        "is_build_execution": 1,
        "executed_in": 0,
        "has_manifest": 0,
    }
    got = {k: store.raw_query(q).collect()[0]["n"] for k, q in SMOKE_QUERIES.items()}
    assert got == expected

    # replay idempotency: re-applying the whole batch changes nothing
    before_v, before_e = store.vertices.count(), store.edges.count()
    store.upsert_nodes(verts)
    store.ensure_edges(edges)
    store.update_state(transitions)
    assert store.vertices.count() == before_v
    assert store.edges.count() == before_e

    # temporal chain: 2 lifecycle transitions, current = completed
    assert store.state_history.count() == 2
    cur = store.current_state.collect()
    assert len(cur) == 1 and cur[0]["props"]["phase"] == "success"


def test_executed_in_and_has_manifest(spark, store):
    """Round-2 build-processor completion: EXECUTED_IN → dynamic-label
    BackendJob (projection.rs:116-132), IS → BuildExecution taxonomy
    (projection.rs:134-147), HAS_MANIFEST index→child with platform
    props on the edge (linker.rs:846-904)."""
    base = {f.split(" ")[0]: None for f in (
        "type build_id commit_sha ref_name repo_url stage_id stage_name duration_secs "
        "outcome severity identifier artifact_content_hash artifact_type name root_purl "
        "sbom_content_hash config_digest layers dep_edges components in_artifact "
        "manifest_digest registry_host backend_label backend_id manifests observed_at".split()
    )}
    rows = [
        {**base, "type": "execution_started", "build_id": "b-9", "commit_sha": "c9",
         "ref_name": "main", "repo_url": "https://git/x",
         "backend_label": "KubeJob", "backend_id": "uid-77", "observed_at": "t0"},
        {**base, "type": "execution_started", "build_id": "b-10", "commit_sha": "c9",
         "ref_name": "main", "repo_url": "https://git/x", "observed_at": "t0"},  # no backend
        {**base, "type": "oci_artifact_resolved", "manifest_digest": "sha256:idx",
         "manifests": [
             {"digest": "sha256:amd", "media_type": "mt", "size": 10,
              "platform_os": "linux", "platform_arch": "amd64", "platform_variant": None},
             {"digest": "sha256:arm", "media_type": "mt", "size": 11,
              "platform_os": "linux", "platform_arch": "arm64", "platform_variant": "v8"},
         ],
         "observed_at": "t1"},
    ]
    from polar_spark.operators.provenance import EVENT_SCHEMA as ES

    verts, edges, _tr = project_events(spark.createDataFrame(rows, ES))
    store.upsert_nodes(verts)
    store.ensure_edges(edges)
    ex = store.edges.where(F.col("rel_type") == "EXECUTED_IN").collect()
    assert len(ex) == 1  # backend identity is optional
    assert (ex[0]["src_key"], ex[0]["dst_label"], ex[0]["dst_key"]) == ("b-9", "KubeJob", "uid-77")
    assert ex[0]["props"]["at"] == "t0"
    is_e = store.edges.where(F.col("rel_type") == "IS").collect()
    assert {r["src_key"] for r in is_e} == {"b-9", "b-10"}
    assert all(r["dst_label"] == "BuildExecution" for r in is_e)
    hm = {r["dst_key"]: r for r in store.edges.where(F.col("rel_type") == "HAS_MANIFEST").collect()}
    assert set(hm) == {"sha256:amd", "sha256:arm"}
    assert hm["sha256:arm"]["props"]["platform_variant"] == "v8"
    assert "platform_variant" not in hm["sha256:amd"]["props"]  # conditional
    assert hm["sha256:amd"]["props"]["descriptor_size"] == "10"
    # child stubs exist with descriptor props (stub-then-fill)
    stub = store.vertices.where(F.col("key") == "sha256:amd").collect()[0]
    assert stub["label"] == "OCIArtifact" and stub["props"]["media_type"] == "mt"


def _commits(spark, rows):
    return spark.createDataFrame(
        rows,
        "repo string, oid string, ref_name string, committer string, time long, "
        "message string, parents array<string>, observed_at string",
    )


def test_commit_projection_self_parent_guard(spark, store):
    c = _commits(
        spark,
        [
            ("https://Host/Repo.git", "c2", "main", "a@x", 2, "m2", ["c1"], "t"),
            ("https://Host/Repo.git", "c1", "main", "a@x", 1, "m1", ["c1"], "t"),  # self-parent
        ],
    )
    verts, edges = project_commits(c)
    store.upsert_nodes(verts)
    store.ensure_edges(edges)
    parents = store.edges.where(F.col("rel_type") == "PARENT").collect()
    assert len(parents) == 1 and parents[0]["src_key"] == "c2"
    # repo identity normalized (lowercased host, .git stripped)
    repos = {r["key"] for r in store.vertices.where(F.col("label") == "GitRepository").collect()}
    assert repos == {"https://host/Repo"}


def test_incremental_walk_depth_and_watermark(spark):
    rows = [
        ("r", f"c{i}", "main", "a@x", i, f"m{i}", [], "t") for i in range(20)
    ]
    c = _commits(spark, rows)
    walked = incremental_walk(c, max_depth=5)
    got = sorted(r["oid"] for r in walked.collect())
    assert got == sorted(f"c{i}" for i in range(15, 20))  # newest 5
    ls = spark.createDataFrame([("r", "main", 17)], "repo string, ref_name string, last_time long")
    walked2 = incremental_walk(c, last_seen=ls, max_depth=5)
    assert sorted(r["oid"] for r in walked2.collect()) == ["c18", "c19"]


def test_force_push_ref_update(spark, store):
    prev = spark.createDataFrame(
        [("r", "main", "tip1", "t0")], "repo string, ref_name string, new string, observed_at string"
    )
    cur = spark.createDataFrame(
        [("r", "main", "tip2", "t1"), ("r", "dev", "d1", "t1")],
        "repo string, ref_name string, new string, observed_at string",
    )
    changes = detect_ref_changes(cur, prev)
    rows = {(r["ref_name"]): r for r in changes.collect()}
    assert rows["main"]["old"] == "tip1" and rows["main"]["new"] == "tip2"
    assert rows["dev"]["old"] is None  # new ref
    # POINTS_TO is a replace-edge: only the new tip remains
    v1, e1 = project_ref_updates(
        spark.createDataFrame(
            [("r", "main", None, "tip1", "t0")],
            "repo string, ref_name string, old string, new string, observed_at string",
        )
    )
    store.upsert_nodes(v1)
    store.replace_edges(e1)
    v2, e2 = project_ref_updates(changes.where(F.col("ref_name") == "main"))
    store.upsert_nodes(v2)
    store.replace_edges(e2)
    pts = store.edges.where(F.col("rel_type") == "POINTS_TO").collect()
    assert len(pts) == 1
    assert pts[0]["dst_key"] == "tip2"
    assert pts[0]["props"]["old"] == "tip1"  # force-push records old tip


def test_oci_resolution_and_config_digest_identity(spark, store):
    """J6 + resolver parity: INSTANCE_OF on config digest, HOSTED_BY on
    normalized registry host, HAS_LAYER with order props."""
    rows = [
        {
            "type": "container_image_created",
            "build_id": "b-2",
            "config_digest": "sha256:cfg",
            "manifest_digest": "sha256:man",
            "layers": [{"order": 0, "diff_id": "sha256:l0"}],
            "observed_at": "t1",
        },
        {
            "type": "oci_artifact_resolved",
            "manifest_digest": "sha256:man",
            "registry_host": "https://registry.example.com/",
            "layers": [{"order": 0, "diff_id": "sha256:l0"}, {"order": 1, "diff_id": "sha256:l1"}],
            "observed_at": "t2",
        },
    ]
    base_cols = EVENT_SCHEMA.replace(" array<struct<order:int, diff_id:string>>", "").split(", ")
    full = []
    for r in rows:
        d = {c.split(" ")[0]: None for c in base_cols}
        d.update(r)
        full.append(d)
    events = spark.createDataFrame(full, EVENT_SCHEMA)
    verts, edges, _tr = project_events(events)
    store.upsert_nodes(verts)
    store.ensure_edges(edges)
    inst = store.edges.where(F.col("rel_type") == "INSTANCE_OF").collect()
    assert len(inst) == 1
    assert (inst[0]["src_key"], inst[0]["dst_key"]) == ("sha256:man", "sha256:cfg")
    hosted = store.edges.where(F.col("rel_type") == "HOSTED_BY").collect()
    assert len(hosted) == 1 and hosted[0]["dst_key"] == "registry.example.com"
    layers = store.edges.where(
        (F.col("rel_type") == "HAS_LAYER") & (F.col("src_label") == "OCIArtifact")
    ).collect()
    assert {(r["dst_key"], r["props"]["order"]) for r in layers} == {
        ("sha256:l0", "0"),
        ("sha256:l1", "1"),
    }


def test_uuid5_parity(spark):
    import uuid as _uuid

    from polar_spark.functions.arrow_udfs import uuid5_url

    url = "https://gitlab.example.com"
    got = (
        spark.createDataFrame([(url,)], "u string")
        .select(uuid5_url("u").alias("id"))
        .collect()[0]["id"]
    )
    assert got == str(_uuid.uuid5(_uuid.NAMESPACE_URL, url))


def test_resolve_default_refs(spark):
    from polar_spark.operators.git_projection import resolve_default_refs

    refs = spark.createDataFrame(
        [
            ("r1", "HEAD", "origin/trunk", "t"),
            ("r1", "main", "c1", "t"),
            ("r2", "main", "c2", "t"),
        ],
        "repo string, ref_name string, new string, observed_at string",
    )
    got = {r["repo"]: r["default_ref"] for r in resolve_default_refs(refs).collect()}
    assert got == {"r1": "origin/trunk", "r2": "origin/main"}
