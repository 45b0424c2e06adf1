"""K8s per-kind resource projections: guards, JSON-blob props, edge
mount props, lifecycle variant routing, phase derivation — semantics
mirrored from kubernetes/consume/src/lib.rs."""

import json

import pytest
from pyspark.sql import functions as F

from polar_spark.operators import kube_resources as kr


def _rows(df):
    return [r.asDict(recursive=True) for r in df.collect()]


OWNER_T = "array<struct<kind:string, uid:string>>"


def test_kube_job_phase_derivation_and_owner(spark):
    jobs = spark.createDataFrame(
        [
            ("u1", "j1", "ci", "bid-1", 0, 1, 0, None, [("CronJob", "cj1")], "t0", "t0"),
            ("u2", "j2", None, None, 0, 0, 2, "oom", None, "t0", "t0"),
            ("u3", "j3", "ci", None, 1, 0, 1, None, None, "t0", "t0"),
            ("u4", "j4", "ci", None, 0, 0, 0, None, None, "t0", "t0"),
        ],
        f"uid string, name string, namespace string, cyclops_build_id string, "
        f"active int, succeeded int, failed int, failure_reason string, "
        f"owner_refs {OWNER_T}, valid_from string, observed_at string",
    )
    verts, edges, trans = kr.project_kube_jobs(jobs)
    v = {r["key"]: r["props"] for r in _rows(verts)}
    assert v["u1"]["cyclops_build_id"] == "bid-1"
    assert v["u2"]["cyclops_build_id"] == ""  # unwrap_or_default (lib.rs:102-108)
    assert v["u2"]["namespace"] == "default"
    e = _rows(edges)
    assert e == [
        {"src_label": "CronJob", "src_key": "cj1", "dst_label": "KubeJob",
         "dst_key": "u1", "rel_type": "OWNS", "props": None, "observed_at": "t0"}
    ]
    phases = {r["resource_key"]: r["props"]["phase"] for r in _rows(trans)}
    # lib.rs:146-155: succeeded>0 → Succeeded; failed>0 & active==0 →
    # Failed; active>0 → Running; else Pending
    assert phases == {"u1": "Succeeded", "u2": "Failed", "u3": "Running", "u4": "Pending"}


def test_pod_volumes_backed_by(spark):
    vols = spark.createDataFrame(
        [
            ("p1", "ns", "v1", "cm1", None, None, "t0"),
            ("p1", "ns", "v2", None, "sec1", None, "t0"),
            ("p1", None, "v3", None, None, "claim1", "t0"),
            ("p1", "ns", "v4", None, None, None, "t0"),
        ],
        "pod_uid string, namespace string, name string, config_map string, "
        "secret_name string, pvc_claim string, observed_at string",
    )
    verts, edges = kr.project_pod_volumes(vols)
    uses = _rows(edges.where(F.col("rel_type") == "USES_VOLUME"))
    assert len(uses) == 4 and all(r["src_key"] == "p1" for r in uses)
    backed = {(r["src_key"], r["dst_label"]) for r in _rows(edges.where(F.col("rel_type") == "BACKED_BY"))}
    assert backed == {
        ("ns/v1", "KubeConfigMap"), ("ns/v2", "KubeSecret"),
        ("default/v3", "KubePersistentVolumeClaim"),  # default namespace
    }


def test_pod_containers_image_guard_and_json_props(spark):
    env_t = "array<struct<name:string, value:string, config_map:string, secret:string>>"
    containers = spark.createDataFrame(
        [
            ("p1", "ns", "app", "img:1", "Always", None, "/w", False, True,
             [("FOO", "bar", None, None), ("CM", None, "cfg1", None), ("SEC", None, None, "s1")],
             [("http", 8080)], ("500m", "1Gi"), "t0"),
            ("p1", "ns", "no-image", None, None, None, None, None, None, None, None, None, "t0"),
        ],
        f"pod_uid string, namespace string, name string, image string, "
        f"image_pull_policy string, restart_policy string, working_dir string, "
        f"stdin boolean, tty boolean, env {env_t}, "
        f"ports array<struct<name:string, container_port:int>>, "
        f"resources struct<cpu:string, memory:string>, observed_at string",
    )
    verts, edges = kr.project_pod_containers(containers)
    v = _rows(verts)
    assert len(v) == 1  # image null guard (lib.rs:389-391)
    assert v[0]["key"] == "p1/app"
    ports = json.loads(v[0]["props"]["ports"])  # opt_json blob (lib.rs:427-445)
    assert ports == [{"name": "http", "container_port": 8080}]
    assert json.loads(v[0]["props"]["resources"]) == {"cpu": "500m", "memory": "1Gi"}
    rels = sorted((r["rel_type"], r["dst_label"], r["dst_key"]) for r in _rows(edges))
    assert rels == [
        ("HAS_CONTAINER", "KubePodContainer", "p1/app"),
        ("USES_CONFIGMAP", "KubeConfigMap", "ns/cfg1"),
        ("USES_SECRET", "KubeSecret", "ns/s1"),
    ]


def test_container_mount_props_on_edge(spark):
    mounts = spark.createDataFrame(
        [("p1", "app", "ns", "v1", "/data", None, "t0")],
        "pod_uid string, container_name string, namespace string, volume_name string, "
        "mount_path string, read_only boolean, observed_at string",
    )
    e = _rows(kr.project_container_mounts(mounts))[0]
    assert e["src_key"] == "p1/app" and e["dst_key"] == "ns/v1"
    # mount metadata on the EDGE; read_only unwrap_or(false) (lib.rs:451-487)
    assert e["props"]["mount_path"] == "/data" and e["props"]["read_only"] == "false"


def test_container_state_variant_routing(spark):
    statuses = spark.createDataFrame(
        [
            ("p1", "app", "waiting", "ImagePullBackOff", "no image", None, None, None, 3, "t1", "t1"),
            ("p1", "app", "running", None, None, True, True, None, 0, "t2", "t2"),
            ("p1", "app", "terminated", "OOMKilled", None, None, None, 137, 5, "t3", "t3"),
            ("p1", "app", None, None, None, None, None, None, 1, "t4", "t4"),
        ],
        "pod_uid string, container_name string, state string, reason string, "
        "message string, started boolean, ready boolean, exit_code int, "
        "restart_count int, valid_from string, observed_at string",
    )
    trans = {r["valid_from"]: r["props"] for r in _rows(kr.project_container_states(statuses))}
    assert trans["t1"]["phase"] == "Waiting" and trans["t1"]["reason"] == "ImagePullBackOff"
    assert trans["t2"]["phase"] == "Running" and trans["t2"]["ready"] == "true"
    assert trans["t3"]["phase"] == "Terminated" and trans["t3"]["exit_code"] == "137"
    assert trans["t4"]["phase"] == "null" and trans["t4"]["restart_count"] == "1"
    assert "exit_code" not in trans["t1"]  # variant props don't leak


def test_deployment_replicaset_states_roundtrip(spark, tmp_path):
    from polar_spark.operators.graph_store import GraphStore

    deps = spark.createDataFrame(
        [("d1", "api", "prod", 3, 3, None, "True", None, "t0", "t0")],
        "uid string, name string, namespace string, available_replicas int, "
        "updated_replicas int, unavailable_replicas int, progressing_condition string, "
        "available_condition string, valid_from string, observed_at string",
    )
    dv, dt = kr.project_deployments(deps)
    rs = spark.createDataFrame(
        [("r1", "api-abc", "prod", 3, 2, 2, [("Deployment", "d1")], "t0", "t0")],
        f"uid string, name string, namespace string, replicas int, ready_replicas int, "
        f"available_replicas int, owner_refs {OWNER_T}, valid_from string, observed_at string",
    )
    rv, re_, rt = kr.project_replicasets(rs)
    assert _rows(dt)[0]["props"]["unavailable_replicas"] == "0"  # unwrap_or(0)
    assert _rows(dt)[0]["props"]["available_condition"] == "null"  # NULL_FIELD
    assert _rows(re_)[0]["src_label"] == "Deployment"

    store = GraphStore(spark, str(tmp_path / "g"))
    store.upsert_nodes(dv.unionByName(rv))
    store.ensure_edges(re_)
    store.update_state(dt.unionByName(rt))
    cur = {r["resource_key"]: r for r in store.current_state.collect()}
    assert cur["d1"]["props"]["available_replicas"] == "3"
    assert cur["r1"]["props"]["ready_replicas"] == "2"
    # HAS_STATE pointer exists per resource (M5 step 5)
    assert store.edges.where(F.col("rel_type") == "HAS_STATE").count() == 2


def test_schedule_vocabulary(spark):
    sched = spark.createDataFrame(
        [
            ("Permanent", "agent-1", None, "t0"),
            ("Adhoc", None, "gitlab-observer", "t0"),
            ("Ephemeral", None, "one-shot", "t0"),
        ],
        "variant string, agent_id string, agent_type string, observed_at string",
    )
    v = {r["label"]: r for r in _rows(kr.project_schedules(sched))}
    assert v["Schedule_Permanent"]["key"] == "agent-1"
    assert v["Schedule_Permanent"]["props"] == {"agent_id": "agent-1"}
    assert v["Schedule_Adhoc"]["key"] == "gitlab-observer"
    assert v["Schedule_Adhoc"]["props"] == {"agent_type": "gitlab-observer"}
    assert v["Schedule_Ephemeral"]["props"] == {"agent_type": "one-shot"}


def test_pods_state_and_owners(spark):
    pods = spark.createDataFrame(
        [("p1", "web-0", "prod", "sa", "Running", True, [("ReplicaSet", "r1")], "t0", "t0")],
        f"uid string, name string, namespace string, sa_name string, phase string, "
        f"ready boolean, owner_refs {OWNER_T}, valid_from string, observed_at string",
    )
    verts, edges, trans = kr.project_pods(pods)
    assert _rows(verts)[0]["props"]["sa_name"] == "sa"
    assert _rows(edges)[0]["src_label"] == "ReplicaSet"
    t = _rows(trans)[0]
    assert t["props"] == {"phase": "Running", "ready": "true"}
    assert t["instance_key"] == "p1@t0"
