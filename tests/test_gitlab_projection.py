"""GitLab domain projection tests — semantics mirrored from the
reference consumers (users.rs / groups.rs / pipelines.rs /
repositories.rs / runners.rs / projects.rs / meta.rs): null guards,
conditional prop emission, default substitution, edge vocabulary."""

import pytest
from pyspark.sql import functions as F

from polar_spark.operators import gitlab_projection as gl


def _rows(df):
    return [r.asDict(recursive=True) for r in df.collect()]


def test_users_props_and_observed_edge(spark):
    users = spark.createDataFrame(
        [
            ("gl0", "1", "alice", "active", True, "2024-01-01", "2024-06-01",
             None, "acme", "https://gl/alice", "/alice", "t0"),
            ("gl0", "2", None, "blocked", False, None, None,
             "earth", None, "https://gl/u2", "/u2", "t0"),
        ],
        "instance_id string, user_id string, username string, state string, "
        "bot boolean, created_at string, last_activity_on string, location string, "
        "organization string, web_url string, web_path string, observed_at string",
    )
    verts, edges = gl.project_users(users)
    v = {r["key"]: r for r in _rows(verts.where(F.col("label") == "GitlabUser"))}
    assert v["gl0/1"]["props"]["username"] == "alice"
    assert v["gl0/1"]["props"]["bot"] == "true"
    assert "location" not in v["gl0/1"]["props"]  # conditional emission
    assert "username" not in v["gl0/2"]["props"]
    assert v["gl0/2"]["props"]["location"] == "earth"
    assert _rows(verts.where(F.col("label") == "GitlabInstance"))[0]["key"] == "gl0"
    e = _rows(edges)
    assert all(r["rel_type"] == "OBSERVED_USER" and r["src_key"] == "gl0" for r in e)
    assert {r["dst_key"] for r in e} == {"gl0/1", "gl0/2"}


def test_memberships_null_project_guard_and_edge_props(spark):
    m = spark.createDataFrame(
        [
            ("gl0", "1", "p1", 40, "2024-02-02", None, "t0"),
            ("gl0", "1", None, 30, None, None, "t0"),  # skipped (no project)
            ("gl0", "2", "p1", None, None, "2025-01-01", "t0"),
        ],
        "instance_id string, user_id string, project_id string, access_level int, "
        "created_at string, expires_at string, observed_at string",
    )
    _verts, edges = gl.project_project_memberships(m)
    e = {(r["src_key"], r["dst_key"]): r for r in _rows(edges)}
    assert len(e) == 2  # null-project row dropped
    assert e[("gl0/1", "gl0/p1")]["props"] == {"access_level": "40", "created_at": "2024-02-02"}
    assert e[("gl0/2", "gl0/p1")]["props"] == {"expires_at": "2025-01-01"}
    assert all(r["rel_type"] == "MEMBER_OF" for r in e.values())


def test_jobs_null_guards(spark):
    jobs = spark.createDataFrame(
        [
            ("gl0", "pl1", "j1", "success", "build", "2024-01-01", "abc", 120, None, "r1", "t0"),
            ("gl0", "pl1", "j2", "failed", "test", "2024-01-01", "abc", 60, "oom", None, "t0"),
            ("gl0", "pl1", None, "skipped", "x", None, "abc", None, None, "r1", "t0"),
        ],
        "instance_id string, pipeline_id string, job_id string, status string, "
        "name string, created_at string, short_sha string, duration long, "
        "failure_message string, runner_id string, observed_at string",
    )
    verts, edges = gl.project_jobs(jobs)
    assert verts.count() == 2  # job without id skipped (pipelines.rs:137-139)
    has_job = _rows(edges.where(F.col("rel_type") == "HAS_JOB"))
    exec_by = _rows(edges.where(F.col("rel_type") == "EXECUTED_BY"))
    assert {r["dst_key"] for r in has_job} == {"gl0/j1", "gl0/j2"}
    assert len(exec_by) == 1  # only the job with a runner (pipelines.rs:194-206)
    assert exec_by[0]["src_key"] == "gl0/j1" and exec_by[0]["dst_key"] == "gl0/r1"
    j2 = _rows(verts.where(F.col("key") == "gl0/j2"))[0]["props"]
    assert j2["failure_message"] == "oom" and j2["duration"] == "60"
    j1 = _rows(verts.where(F.col("key") == "gl0/j1"))[0]["props"]
    assert j1["failure_message"] == ""  # unwrap_or_default


def test_container_tags_digest_guard_and_defaults(spark):
    tags = spark.createDataFrame(
        [
            ("p1", "cr1", "sha256:aa", None, "reg/img:1", "rev@sha256:aa", "rev", "100", "2024", "t0"),
            ("p1", "cr1", None, "oci", "reg/img:2", None, None, None, None, "t0"),  # skipped
        ],
        "project_id string, repository_id string, digest string, media_type string, "
        "location string, revision string, short_revision string, total_size string, "
        "created_at string, observed_at string",
    )
    verts, edges = gl.project_container_tags(tags)
    v = _rows(verts)
    assert len(v) == 1  # null digest skipped (repositories.rs:141-143)
    assert v[0]["key"] == "cr1@sha256:aa"
    assert v[0]["props"]["media_type"] == "unknown"  # default substitution
    e = _rows(edges)
    assert e[0]["src_key"] == "p1/cr1" and e[0]["rel_type"] == "CONTAINS_TAG"


def test_artifacts_download_path_guard(spark):
    arts = spark.createDataFrame(
        [
            ("gl0", "https://gl", "j1", "a1", "report", "10", None, "/dl/a1", "t0"),
            ("gl0", "https://gl", "j1", "a2", None, "20", "2025", None, "t0"),  # skipped
        ],
        "instance_id string, base_url string, job_id string, artifact_id string, "
        "name string, size string, expire_at string, download_path string, observed_at string",
    )
    verts, edges = gl.project_artifacts(arts)
    v = _rows(verts)
    assert len(v) == 1 and v[0]["key"] == "gl0/a1"
    assert v[0]["props"]["download_path"] == "https://gl/dl/a1"
    assert v[0]["props"]["expire_at"] == "null"  # pipelines.rs:86-89
    assert _rows(edges)[0]["rel_type"] == "PRODUCED"


def test_group_membership_edges(spark):
    base = "instance_id string, group_id string, {m} string, observed_at string"
    members = spark.createDataFrame(
        [("gl0", "g1", "1", "t0"), ("gl0", "g1", None, "t0")],
        base.format(m="user_id"),
    )
    gp = spark.createDataFrame([("gl0", "g1", "p1", "t0")], base.format(m="project_id"))
    gr = spark.createDataFrame([("gl0", "g1", "r1", "t0")], base.format(m="runner_id"))
    _v1, e1 = gl.project_group_members(members)
    _v2, e2 = gl.project_group_projects(gp)
    _v3, e3 = gl.project_group_runners(gr)
    assert _rows(e1) == [
        {"src_label": "GitlabUser", "src_key": "gl0/1", "dst_label": "GitlabGroup",
         "dst_key": "gl0/g1", "rel_type": "IN_GROUP", "props": None, "observed_at": "t0"}
    ]
    assert _rows(e2)[0]["src_label"] == "GitlabProject"
    assert _rows(e3)[0]["src_label"] == "GitlabRunner"
    assert all(r["rel_type"] == "IN_GROUP" for r in _rows(e2) + _rows(e3))


def test_runners_tag_list_join_and_projects_defaults(spark):
    runners = spark.createDataFrame(
        [
            ("gl0", "r1", False, "GROUP_TYPE", "ONLINE", "NOT_PROTECTED", True,
             ["docker", "linux"], "t0"),
            ("gl0", "r2", True, "INSTANCE_TYPE", "OFFLINE", "REF_PROTECTED", False, None, "t0"),
        ],
        "instance_id string, runner_id string, paused boolean, runner_type string, "
        "status string, access_level string, run_untagged boolean, "
        "tag_list array<string>, observed_at string",
    )
    verts, edges = gl.project_runners(runners)
    v = {r["key"]: r["props"] for r in _rows(verts.where(F.col("label") == "GitlabRunner"))}
    assert v["gl0/r1"]["tag_list"] == "docker,linux"  # comma-join (runners.rs:86-89)
    assert v["gl0/r2"]["tag_list"] == ""  # unwrap_or_default
    assert all(r["rel_type"] == "OBSERVED_RUNNER" for r in _rows(edges))

    projects = spark.createDataFrame(
        [("gl0", "p1", "proj", "org/proj", None, None, None, None, "t0")],
        "instance_id string, project_id string, name string, full_path string, "
        "created_at string, last_activity_at string, http_url_to_repo string, "
        "ssh_url_to_repo string, observed_at string",
    )
    pv, pe = gl.project_projects(projects)
    p = _rows(pv.where(F.col("label") == "GitlabProject"))[0]["props"]
    assert p["created_at"] == "unknown" and p["last_activity_at"] == "unknown"
    assert p["http_url_to_repo"] == ""
    assert _rows(pe)[0]["rel_type"] == "OBSERVED_PROJECT"


def test_packages_produced_and_files(spark):
    pkgs = spark.createDataFrame(
        [("gl0", "p1", "pkg9", "libx", "1.2", "MAVEN", "DEFAULT", None, ["pl1", "pl2"], "t0")],
        "instance_id string, project_id string, package_id string, name string, "
        "version string, package_type string, status string, status_message string, "
        "pipeline_ids array<string>, observed_at string",
    )
    verts, edges = gl.project_packages(pkgs)
    assert _rows(verts)[0]["key"] == "pkg9"  # keyed on package_id alone
    rels = sorted((r["rel_type"], r["src_key"]) for r in _rows(edges))
    assert rels == [
        ("HAS_PACKAGE", "gl0/p1"), ("PRODUCED", "gl0/pl1"), ("PRODUCED", "gl0/pl2"),
    ]
    files = spark.createDataFrame(
        [("pkg9", "f1", "libx-1.2.jar", "t0")],
        "package_id string, file_id string, file_name string, observed_at string",
    )
    fv, fe = gl.project_package_files(files)
    assert _rows(fv)[0]["key"] == "pkg9/f1"
    assert _rows(fe)[0]["rel_type"] == "CONTAINS_FILE"


def test_pipeline_store_roundtrip_idempotent(spark, tmp_path):
    """End-to-end: pipelines project into the GraphStore, replay is
    idempotent (tests.rs:458-460 analog), props are queryable."""
    from polar_spark.operators.graph_store import GraphStore

    pipelines = spark.createDataFrame(
        [
            ("gl0", "p1", "pl1", True, "2024-01-01", None, "abc", False, False,
             300, 5, 1.5, None, "push", False, True, "t0"),
            ("gl0", "p1", "pl2", False, "2024-01-02", "2024-01-02", "def", False,
             True, 600, 7, None, "script_failure", "schedule", True, False, "t1"),
        ],
        "instance_id string, project_id string, pipeline_id string, active boolean, "
        "created_at string, finished_at string, sha string, child boolean, "
        "complete boolean, duration long, total_jobs long, compute_minutes double, "
        "failure_reason string, source string, trigger boolean, latest boolean, "
        "observed_at string",
    )
    verts, edges = gl.project_pipelines(pipelines)
    store = GraphStore(spark, str(tmp_path / "g"))
    for _ in range(2):  # replay idempotent
        store.upsert_nodes(verts)
        store.ensure_edges(edges)
    assert store.vertices.where(F.col("label") == "GitlabPipeline").count() == 2
    assert store.edges.where(F.col("rel_type") == "HAS_PIPELINE").count() == 2
    dur = store.raw_query(
        "SELECT SUM(CAST(props['duration'] AS BIGINT)) AS d FROM vertices "
        "WHERE label = 'GitlabPipeline'"
    ).collect()[0]["d"]
    assert dur == 900
    fr = store.raw_query(
        "SELECT props['failure_reason'] AS fr FROM vertices WHERE key = 'gl0/pl1'"
    ).collect()[0]["fr"]
    assert fr == ""  # unwrap_or_default on None


def test_licenses_and_instances(spark):
    inst = spark.createDataFrame(
        [("gl0", "https://gl", "17.0", True, "t0")],
        "instance_id string, base_url string, version string, enterprise boolean, observed_at string",
    )
    iv = gl.project_instances(inst)
    p = _rows(iv)[0]["props"]
    assert p == {"enterprise": "true", "gitlab_version": "17.0", "base_url": "https://gl"}
    lic = spark.createDataFrame(
        [("gl0", "lic1", "2024", "2024", "2025", "ultimate", "license", None, "t0")],
        "instance_id string, license_id string, created_at string, starts_at string, "
        "expires_at string, plan string, entry_type string, users_in_license int, "
        "observed_at string",
    )
    lv, le = gl.project_licenses(lic)
    props = _rows(lv.where(F.col("label") == "License"))[0]["props"]
    assert props["users_in_licenseCount"] == "0"  # map_or(I64(0)) (meta.rs:56)
    assert props["plan"] == "ultimate"
    assert _rows(le)[0]["rel_type"] == "OBSERVED_LICENSE"
