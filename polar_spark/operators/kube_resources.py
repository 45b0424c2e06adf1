"""Kubernetes per-kind resource projections (S8 of SURVEY §2.1).

The reference implements ``GraphOperable`` per watched kind
(/root/reference/src/agents/kubernetes/consume/src/lib.rs):

- Job: anchor node w/ the surfaced ``cyclops.build/id`` label, owner
  refs, phase derivation from status counters (lib.rs:85-216)
- Pod: anchor + PodState transition, volumes (USES_VOLUME, BACKED_BY
  ConfigMap/Secret/PVC), containers (HAS_CONTAINER with the image null
  guard, JSON-blob props via ``opt_json``), per-container mount edges
  with mount props *on the edge*, env-ref USES_CONFIGMAP/USES_SECRET,
  container lifecycle states (Waiting/Running/Terminated variant
  routing) (lib.rs:217-696)
- Deployment / ReplicaSet: anchor + immutable state instance from
  status counters (lib.rs:697-1000)

Each is a set-oriented projection producing (vertices, edges[,
transitions]) in graph-store shape; ``transitions`` feed
``GraphStore.update_state`` (the M5 five-step temporal pattern).
Namespaces remain vertex *props*, exactly as in the reference — there
is no Namespace node kind.

Keys follow KubeNodeKey: Pod/Job/Deployment/ReplicaSet by uid,
PodContainer by (pod_uid, name), Volume/ConfigMap/Secret/PVC by
(namespace, name), *State instances by (uid[, name], valid_from).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PROPS = "map<string,string>"


def _nk(namespace: str | Column, name: str | Column) -> Column:
    ns = F.col(namespace) if isinstance(namespace, str) else namespace
    nm = F.col(name) if isinstance(name, str) else name
    return F.concat_ws("/", F.coalesce(ns, F.lit("default")), nm)


def _props(*pairs: tuple[str, Column]) -> Column:
    m = F.create_map(*[x for k, v in pairs for x in (F.lit(k), v.cast("string"))])
    return F.map_filter(m, lambda _k, v: v.isNotNull())


def _verts(df: DataFrame, label: str | Column, key: Column, props: Column | None = None) -> DataFrame:
    return df.select(
        (F.lit(label) if isinstance(label, str) else label).alias("label"),
        key.alias("key"),
        (props if props is not None else F.lit(None).cast(_PROPS)).alias("props"),
        F.col("observed_at"),
    )


def _edges(df, src_label, src_key, dst_label, dst_key, rel, props=None) -> DataFrame:
    return df.select(
        F.lit(src_label).alias("src_label"),
        src_key.alias("src_key"),
        F.lit(dst_label).alias("dst_label"),
        dst_key.alias("dst_key"),
        F.lit(rel).alias("rel_type"),
        (props if props is not None else F.lit(None).cast(_PROPS)).alias("props"),
        F.col("observed_at"),
    )


def _transitions(df, resource_label: str, resource_key: Column, props: Column) -> DataFrame:
    """UpdateState input (resource → <Kind>State instance) mirroring
    ``state_type_key: KubeNodeKey::State`` + deterministic per-kind
    instance keys (lib.rs:255-270)."""
    return df.select(
        F.lit(resource_label).alias("resource_label"),
        resource_key.alias("resource_key"),
        F.lit(resource_label).alias("state_type"),
        F.concat_ws("@", resource_key, F.col("valid_from")).alias("instance_key"),
        F.col("valid_from"),
        props.alias("props"),
    )


# ------------------------------------------------------------------ Job


def project_kube_jobs(jobs: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Job anchors + OWNS owner-ref edges + JobState transitions with
    the reference's phase derivation (lib.rs:85-216).

    jobs(uid, name, namespace, cyclops_build_id, active, succeeded,
         failed, failure_reason, owner_refs array<struct<kind:string,
         uid:string>>, valid_from, observed_at)
    """
    verts = _verts(
        jobs,
        "KubeJob",
        F.col("uid"),
        _props(
            ("name", F.col("name")),
            ("namespace", F.coalesce(F.col("namespace"), F.lit("default"))),
            # unwrap_or_default: absent label → "" (lib.rs:102-108)
            ("cyclops_build_id", F.coalesce(F.col("cyclops_build_id"), F.lit(""))),
            ("observed_at", F.col("observed_at")),
        ),
    )
    owners = jobs.select("uid", "observed_at", F.explode_outer("owner_refs").alias("o")).where(
        F.col("o").isNotNull()
    )
    edges = owners.select(
        F.col("o.kind").alias("src_label"),  # dynamic owner label (J9)
        F.col("o.uid").alias("src_key"),
        F.lit("KubeJob").alias("dst_label"),
        F.col("uid").alias("dst_key"),
        F.lit("OWNS").alias("rel_type"),
        F.lit(None).cast(_PROPS).alias("props"),
        F.col("observed_at"),
    )
    active = F.coalesce(F.col("active"), F.lit(0))
    succeeded = F.coalesce(F.col("succeeded"), F.lit(0))
    failed = F.coalesce(F.col("failed"), F.lit(0))
    phase = (
        F.when(succeeded > 0, "Succeeded")
        .when((failed > 0) & (active == 0), "Failed")
        .when(active > 0, "Running")
        .otherwise("Pending")
    )
    trans = _transitions(
        jobs,
        "KubeJob",
        F.col("uid"),
        _props(
            ("phase", phase),
            ("active", active),
            ("succeeded", succeeded),
            ("failed", failed),
            ("failure_reason", F.coalesce(F.col("failure_reason"), F.lit(""))),
            ("valid_from", F.col("valid_from")),
            ("observed_at", F.col("observed_at")),
        ),
    )
    return verts, edges, trans


# ------------------------------------------------------------------ Pod


def project_pods(pods: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Pod anchors + PodState (phase, ready) transitions + OWNS edges
    (lib.rs:217-296).

    pods(uid, name, namespace, sa_name, phase, ready,
         owner_refs array<struct<kind:string,uid:string>>,
         valid_from, observed_at)
    """
    verts = _verts(
        pods,
        "KubePod",
        F.col("uid"),
        _props(
            ("name", F.col("name")),
            ("namespace", F.coalesce(F.col("namespace"), F.lit("default"))),
            ("sa_name", F.coalesce(F.col("sa_name"), F.lit(""))),
            ("observed_at", F.col("observed_at")),
        ),
    )
    owners = pods.select("uid", "observed_at", F.explode_outer("owner_refs").alias("o")).where(
        F.col("o").isNotNull()
    )
    edges = owners.select(
        F.col("o.kind").alias("src_label"),
        F.col("o.uid").alias("src_key"),
        F.lit("KubePod").alias("dst_label"),
        F.col("uid").alias("dst_key"),
        F.lit("OWNS").alias("rel_type"),
        F.lit(None).cast(_PROPS).alias("props"),
        F.col("observed_at"),
    )
    trans = _transitions(
        pods,
        "KubePod",
        F.col("uid"),
        _props(
            ("phase", F.col("phase")),
            ("ready", F.coalesce(F.col("ready"), F.lit(False))),
        ),
    )
    return verts, edges, trans


def project_pod_volumes(volumes: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Pod spec volumes → Volume stubs + (pod)-[:USES_VOLUME]->(vol) +
    conditional (vol)-[:BACKED_BY]->(ConfigMap|Secret|PVC)
    (lib.rs:299-383).

    volumes(pod_uid, namespace, name, config_map, secret_name,
            pvc_claim, observed_at) — backing columns nullable.
    """
    vkey = _nk("namespace", "name")
    verts = _verts(volumes, "KubeVolume", vkey)
    edges = _edges(volumes, "KubePod", F.col("pod_uid"), "KubeVolume", vkey, "USES_VOLUME")
    for col, label in (("config_map", "KubeConfigMap"), ("secret_name", "KubeSecret"),
                       ("pvc_claim", "KubePersistentVolumeClaim")):
        backed = volumes.where(F.col(col).isNotNull())
        bkey = _nk("namespace", col)
        verts = verts.unionByName(_verts(backed, label, bkey))
        edges = edges.unionByName(
            _edges(backed, "KubeVolume", vkey, label, bkey, "BACKED_BY")
        )
    return verts, edges


def project_pod_containers(containers: DataFrame) -> tuple[DataFrame, DataFrame]:
    """PodContainer vertices + (pod)-[:HAS_CONTAINER]->(container);
    containers without an image are skipped (the ``let Some(image)
    else continue`` guard, lib.rs:389-391).  Complex spec structs are
    serialized wholesale into JSON-string props (``opt_json``,
    lib.rs:76-83 / 427-445) via ``to_json``.

    containers(pod_uid, namespace, name, image, image_pull_policy,
               restart_policy, working_dir, stdin, tty,
               env array<struct<name:string,value:string,
                   config_map:string,secret:string>>,
               ports array<struct<name:string,container_port:int>>,
               resources struct<cpu:string,memory:string>,
               observed_at)
    """
    c = containers.where(F.col("image").isNotNull())
    key = F.concat_ws("/", F.col("pod_uid"), F.col("name"))
    verts = _verts(
        c,
        "KubePodContainer",
        key,
        _props(
            ("name", F.col("name")),
            ("image", F.col("image")),
            ("image_pull_policy", F.col("image_pull_policy")),
            ("restart_policy", F.col("restart_policy")),
            ("working_dir", F.col("working_dir")),
            ("stdin", F.col("stdin")),
            ("tty", F.col("tty")),
            # JSON-blob props: null structs stay absent (GraphValue::Null)
            ("env", F.when(F.col("env").isNotNull(), F.to_json("env"))),
            ("ports", F.when(F.col("ports").isNotNull(), F.to_json("ports"))),
            ("resources", F.when(F.col("resources").isNotNull(), F.to_json("resources"))),
        ),
    )
    edges = _edges(c, "KubePod", F.col("pod_uid"), "KubePodContainer", key, "HAS_CONTAINER")
    # env value_from refs → pod-level USES_CONFIGMAP / USES_SECRET
    env = c.select("pod_uid", "namespace", "observed_at", F.explode_outer("env").alias("e"))
    for field, label, rel in (
        ("e.config_map", "KubeConfigMap", "USES_CONFIGMAP"),
        ("e.secret", "KubeSecret", "USES_SECRET"),
    ):
        refs = env.where(F.col(field).isNotNull())
        edges = edges.unionByName(
            _edges(refs, "KubePod", F.col("pod_uid"), label, _nk("namespace", F.col(field)), rel)
        )
    return verts, edges


def project_container_mounts(mounts: DataFrame) -> DataFrame:
    """(container)-[:USES_VOLUME {mount_path, read_only, name}]->(volume)
    — mount metadata lives on the EDGE because the same volume mounts
    differently per container (lib.rs:451-487).

    mounts(pod_uid, container_name, namespace, volume_name, mount_path,
           read_only, observed_at)
    """
    return _edges(
        mounts,
        "KubePodContainer",
        F.concat_ws("/", F.col("pod_uid"), F.col("container_name")),
        "KubeVolume",
        _nk("namespace", "volume_name"),
        "USES_VOLUME",
        _props(
            ("mount_path", F.col("mount_path")),
            ("read_only", F.coalesce(F.col("read_only"), F.lit(False))),
            ("name", F.col("volume_name")),
            ("observed_at", F.col("observed_at")),
        ),
    )


def project_container_states(statuses: DataFrame) -> DataFrame:
    """Container lifecycle → state transitions with per-variant props
    (Waiting/Running/Terminated/null — the P7 event-variant routing,
    lib.rs:508-607).

    statuses(pod_uid, container_name, state, reason, message, started,
             ready, exit_code, restart_count, valid_from, observed_at)
    """
    rc = ("restart_count", F.coalesce(F.col("restart_count"), F.lit(0)))
    waiting = _props(
        ("reason", F.coalesce(F.col("reason"), F.lit(""))),
        ("message", F.coalesce(F.col("message"), F.lit(""))),
        rc,
        ("phase", F.lit("Waiting")),
    )
    running = _props(
        ("started", F.coalesce(F.col("started"), F.lit(False))),
        ("ready", F.coalesce(F.col("ready"), F.lit(False))),
        rc,
        ("phase", F.lit("Running")),
    )
    terminated = _props(
        ("exit_code", F.coalesce(F.col("exit_code"), F.lit(0))),
        ("reason", F.coalesce(F.col("reason"), F.lit(""))),
        rc,
        ("phase", F.lit("Terminated")),
    )
    unknown = _props(rc, ("phase", F.lit("null")))
    props = (
        F.when(F.col("state") == "waiting", waiting)
        .when(F.col("state") == "running", running)
        .when(F.col("state") == "terminated", terminated)
        .otherwise(unknown)
    )
    ckey = F.concat_ws("/", F.col("pod_uid"), F.col("container_name"))
    return statuses.select(
        F.lit("KubePodContainer").alias("resource_label"),
        ckey.alias("resource_key"),
        F.lit("KubePodContainer").alias("state_type"),
        F.concat_ws("@", ckey, F.col("valid_from")).alias("instance_key"),
        F.col("valid_from"),
        props.alias("props"),
    )


# ------------------------------------------------- Deployment / ReplicaSet


def project_deployments(deployments: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Deployment anchors + DeploymentState transitions from status
    counters; missing counters default 0, missing conditions "null"
    (lib.rs:697-882).

    deployments(uid, name, namespace, available_replicas,
                updated_replicas, unavailable_replicas,
                progressing_condition, available_condition,
                valid_from, observed_at)
    """
    verts = _verts(
        deployments,
        "KubeDeployment",
        F.col("uid"),
        _props(
            ("name", F.col("name")),
            ("namespace", F.coalesce(F.col("namespace"), F.lit("default"))),
            ("observed_at", F.col("observed_at")),
        ),
    )
    trans = _transitions(
        deployments,
        "KubeDeployment",
        F.col("uid"),
        _props(
            ("available_replicas", F.coalesce(F.col("available_replicas"), F.lit(0))),
            ("updated_replicas", F.coalesce(F.col("updated_replicas"), F.lit(0))),
            ("unavailable_replicas", F.coalesce(F.col("unavailable_replicas"), F.lit(0))),
            ("progressing_condition", F.coalesce(F.col("progressing_condition"), F.lit("null"))),
            ("available_condition", F.coalesce(F.col("available_condition"), F.lit("null"))),
        ),
    )
    return verts, trans


def project_replicasets(replicasets: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """ReplicaSet anchors + OWNS owner edges + ReplicaSetState
    transitions (lib.rs:883-1000).

    replicasets(uid, name, namespace, replicas, ready_replicas,
                available_replicas, owner_refs array<struct<kind:string,
                uid:string>>, valid_from, observed_at)
    """
    verts = _verts(
        replicasets,
        "KubeReplicaSet",
        F.col("uid"),
        _props(
            ("name", F.col("name")),
            ("namespace", F.coalesce(F.col("namespace"), F.lit("default"))),
            ("observed_at", F.col("observed_at")),
        ),
    )
    owners = replicasets.select(
        "uid", "observed_at", F.explode_outer("owner_refs").alias("o")
    ).where(F.col("o").isNotNull())
    edges = owners.select(
        F.col("o.kind").alias("src_label"),
        F.col("o.uid").alias("src_key"),
        F.lit("KubeReplicaSet").alias("dst_label"),
        F.col("uid").alias("dst_key"),
        F.lit("OWNS").alias("rel_type"),
        F.lit(None).cast(_PROPS).alias("props"),
        F.col("observed_at"),
    )
    trans = _transitions(
        replicasets,
        "KubeReplicaSet",
        F.col("uid"),
        _props(
            ("replicas", F.coalesce(F.col("replicas"), F.lit(0))),
            ("ready_replicas", F.coalesce(F.col("ready_replicas"), F.lit(0))),
            ("available_replicas", F.coalesce(F.col("available_replicas"), F.lit(0))),
        ),
    )
    return verts, edges, trans


# ------------------------------------------------------------- Schedule


def project_schedules(schedules: DataFrame) -> DataFrame:
    """Scheduler vocabulary: Schedule:{Permanent,Adhoc,Ephemeral}
    multi-label nodes (/root/reference/src/agents/lib/src/graph/nodes/
    schedule.rs:3-26) — the multi-label is encoded as the dynamic-label
    form ``Schedule_<variant>`` (M8), keyed on agent_id for Permanent
    and agent_type otherwise.

    schedules(variant, agent_id, agent_type, observed_at)
    """
    key = F.when(F.col("variant") == "Permanent", F.col("agent_id")).otherwise(
        F.col("agent_type")
    )
    return schedules.select(
        F.concat(F.lit("Schedule_"), F.col("variant")).alias("label"),
        key.alias("key"),
        _props(
            ("agent_id", F.when(F.col("variant") == "Permanent", F.col("agent_id"))),
            ("agent_type", F.when(F.col("variant") != "Permanent", F.col("agent_type"))),
        ).alias("props"),
        F.col("observed_at"),
    )
