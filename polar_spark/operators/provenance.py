"""Provenance-event projection: the reference's build-processor path,
set-oriented.

The reference routes ``ProvenanceEvent`` variants to two handlers:
lifecycle events → ``project_event`` (BuildJob anchor, temporal state,
BUILT_BY / EXECUTED_IN / HAS_STAGE edges —
/root/reference/src/agents/build-processor/src/projection.rs:37-440)
and artifact/discovery events → the linker (content-hash identity
joins, SBOM dependency tree —
/root/reference/src/agents/build-processor/src/linker.rs:72-992).

Here both are *column projections over one events DataFrame*: variant
routing is a filter (P7), every handler emits (vertices, edges)
DataFrames, and the union feeds ``GraphStore.upsert_nodes`` /
``ensure_edges``.  Replay-idempotency comes from the store's merge
semantics — exactly the reference's correctness argument
(projection.rs:26-31).

Event schema (FIXTURES.md §4, mirroring events.rs variants):

    events(type, build_id, commit_sha, ref_name, repo_url, stage_id,
           stage_name, duration_secs, outcome, severity, identifier,
           artifact_content_hash, artifact_type, name, root_purl,
           sbom_content_hash, config_digest,
           layers array<struct<order:int, diff_id:string>>,
           dep_edges array<struct<from_ref:string, to_refs:array<string>>>,
           components array<string>, in_artifact, observed_at)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EVENT_SCHEMA = (
    "type string, build_id string, commit_sha string, ref_name string, "
    "repo_url string, stage_id string, stage_name string, duration_secs long, "
    "outcome string, severity string, identifier string, "
    "artifact_content_hash string, artifact_type string, name string, "
    "root_purl string, sbom_content_hash string, config_digest string, "
    "layers array<struct<order:int, diff_id:string>>, "
    "dep_edges array<struct<from_ref:string, to_refs:array<string>>>, "
    "components array<string>, in_artifact string, "
    "manifest_digest string, registry_host string, "
    "backend_label string, backend_id string, "
    "manifests array<struct<digest:string, media_type:string, size:long, "
    "platform_os:string, platform_arch:string, platform_variant:string>>, "
    "observed_at string"
)


def _v(df: DataFrame, label, key, props=None) -> DataFrame:
    cols = [
        (F.lit(label) if isinstance(label, str) else label).alias("label"),
        key.alias("key"),
        (props if props is not None else F.lit(None).cast("map<string,string>")).alias("props"),
        F.col("observed_at"),
    ]
    return df.select(*cols)


def _e(df: DataFrame, sl, sk, dl, dk, rel, props=None) -> DataFrame:
    return df.select(
        (F.lit(sl) if isinstance(sl, str) else sl).alias("src_label"),
        sk.alias("src_key"),
        (F.lit(dl) if isinstance(dl, str) else dl).alias("dst_label"),
        dk.alias("dst_key"),
        F.lit(rel).alias("rel_type"),
        (props if props is not None else F.lit(None).cast("map<string,string>")).alias("props"),
        F.col("observed_at"),
    )


def project_events(events: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """events → (vertices, edges, state_transitions).

    One declarative DAG: each variant's projection is a filtered select;
    unions are by name.  Cited parity per branch below.
    """
    ev = events
    verts: list[DataFrame] = []
    edges: list[DataFrame] = []

    # ExecutionStarted: BuildJob anchor + BUILT_BY GitCommit + state
    # (projection.rs:49-132)
    started = ev.where(F.col("type") == "execution_started")
    verts.append(
        _v(
            started,
            "BuildJob",
            F.col("build_id"),
            F.create_map(
                F.lit("ref_name"), F.col("ref_name"), F.lit("repo_url"), F.col("repo_url")
            ),
        )
    )
    verts.append(_v(started, "GitCommit", F.col("commit_sha")))
    edges.append(
        _e(started, "GitCommit", F.col("commit_sha"), "BuildJob", F.col("build_id"), "BUILT_BY")
    )
    # EXECUTED_IN → BackendJob: optional, only when the event carries
    # backend identity; the backend node has a DYNAMIC label (e.g. the
    # k8s Job uid written by the kube consumer) — the cross-vocabulary
    # stitch (projection.rs:116-132)
    backed = started.where(F.col("backend_label").isNotNull() & F.col("backend_id").isNotNull())
    verts.append(_v(backed, F.col("backend_label"), F.col("backend_id")))
    edges.append(
        _e(
            backed,
            "BuildJob",
            F.col("build_id"),
            F.col("backend_label"),
            F.col("backend_id"),
            "EXECUTED_IN",
            F.create_map(F.lit("at"), F.col("observed_at")),
        )
    )
    # IS → BuildExecution: taxonomy anchor edge, consistent with
    # OCIArtifact-[:IS]->Artifact in the artifact domain
    # (projection.rs:134-147)
    verts.append(_v(started, "BuildExecution", F.lit("BuildExecution")))
    edges.append(
        _e(started, "BuildJob", F.col("build_id"), "BuildExecution", F.lit("BuildExecution"), "IS")
    )

    # StageStarted/StageCompleted: HAS_STAGE (projection.rs:181; order-
    # independent — stub then props, linker.rs:402-408)
    stages = ev.where(F.col("type").isin("stage_started", "stage_completed"))
    verts.append(
        _v(
            stages,
            "BuildStage",
            F.concat_ws("#", "build_id", "stage_id"),
            F.when(
                F.col("type") == "stage_completed",
                F.create_map(
                    F.lit("outcome"), F.col("outcome"),
                    F.lit("duration_secs"), F.col("duration_secs").cast("string"),
                ),
            ).otherwise(F.create_map(F.lit("stage_name"), F.col("stage_name"))),
        )
    )
    edges.append(
        _e(
            stages,
            "BuildJob",
            F.col("build_id"),
            "BuildStage",
            F.concat_ws("#", "build_id", "stage_id"),
            "HAS_STAGE",
        )
    )

    # ArtifactProduced: BuildArtifact by content hash + PRODUCED
    # (projection.rs:255; identity events.rs:175-177)
    produced = ev.where(F.col("type") == "artifact_produced")
    verts.append(
        _v(
            produced,
            "BuildArtifact",
            F.col("artifact_content_hash"),
            F.create_map(F.lit("artifact_type"), F.col("artifact_type"), F.lit("name"), F.col("name")),
        )
    )
    edges.append(
        _e(produced, "BuildJob", F.col("build_id"), "BuildArtifact", F.col("artifact_content_hash"), "PRODUCED")
    )

    # SbomAnalyzed: Sbom + ANALYZED_AS (hash join J4, linker.rs:284-297),
    # DESCRIBES root, Package purl upserts, DEPENDS_ON tree w/ flat
    # fallback (linker.rs:154-223)
    sbom = ev.where(F.col("type") == "sbom_analyzed")
    verts.append(_v(sbom, "Sbom", F.col("sbom_content_hash")))
    verts.append(_v(sbom, "Package", F.col("root_purl")))
    verts.append(
        _v(
            sbom.select("observed_at", F.explode("components").alias("purl")),
            "Package",
            F.col("purl"),
        )
    )
    edges.append(
        _e(sbom, "BuildArtifact", F.col("sbom_content_hash"), "Sbom", F.col("sbom_content_hash"), "ANALYZED_AS")
    )
    edges.append(_e(sbom, "Sbom", F.col("sbom_content_hash"), "Package", F.col("root_purl"), "DESCRIBES"))
    dep_exploded = sbom.select(
        "observed_at", "root_purl", "components", F.explode_outer("dep_edges").alias("de")
    )
    explicit = dep_exploded.where(F.col("de").isNotNull()).select(
        "observed_at", F.col("de.from_ref").alias("from_ref"), F.explode("de.to_refs").alias("to_ref")
    )
    edges.append(
        _e(explicit, "Package", F.col("from_ref"), "Package", F.col("to_ref"), "DEPENDS_ON")
    )
    # flat fallback: no explicit root entry → root DEPENDS_ON every component
    no_root = (
        sbom.select("observed_at", "root_purl", "components", "dep_edges")
        .where(
            ~F.exists(
                F.coalesce(F.col("dep_edges"), F.array()),
                lambda d: d["from_ref"] == F.col("root_purl"),
            )
        )
        .select("observed_at", "root_purl", F.explode("components").alias("to_ref"))
    )
    edges.append(_e(no_root, "Package", F.col("root_purl"), "Package", F.col("to_ref"), "DEPENDS_ON"))

    # BinaryLinked: Binary BUILT_FROM root Package; Sbom ATTESTS Binary
    # (linker.rs:361-431)
    linked = ev.where(F.col("type") == "binary_linked")
    verts.append(_v(linked, "Binary", F.col("artifact_content_hash")))
    edges.append(
        _e(linked, "Binary", F.col("artifact_content_hash"), "Package", F.col("root_purl"), "BUILT_FROM")
    )
    edges.append(
        _e(linked, "Sbom", F.col("sbom_content_hash"), "Binary", F.col("artifact_content_hash"), "ATTESTS")
    )

    # ContainerImageCreated: ContainerImage by config digest + HAS_LAYER
    # w/ order prop (linker.rs:441-575)
    img = ev.where(F.col("type") == "container_image_created")
    verts.append(_v(img, "ContainerImage", F.col("config_digest")))
    layer = img.select("observed_at", "config_digest", F.explode("layers").alias("l"))
    verts.append(_v(layer, "OCILayer", F.col("l.diff_id")))
    edges.append(
        _e(
            layer,
            "ContainerImage",
            F.col("config_digest"),
            "OCILayer",
            F.col("l.diff_id"),
            "HAS_LAYER",
            F.create_map(F.lit("order"), F.col("l.order").cast("string")),
        )
    )

    # J6 config-digest identity: same image content in any registry —
    # OCIArtifact(manifest digest) INSTANCE_OF ContainerImage(config
    # digest) (linker.rs:441-463,589-618)
    img_with_manifest = img.where(F.col("manifest_digest").isNotNull())
    verts.append(_v(img_with_manifest, "OCIArtifact", F.col("manifest_digest")))
    edges.append(
        _e(
            img_with_manifest,
            "OCIArtifact",
            F.col("manifest_digest"),
            "ContainerImage",
            F.col("config_digest"),
            "INSTANCE_OF",
        )
    )

    # OCIArtifactResolved (the resolver's enrichment —
    # /root/reference/src/agents/resolver/src/main.rs:318-415; linker
    # writes OCIArtifact/OCILayer/OCIRegistry + HAS_LAYER/HOSTED_BY,
    # linker.rs:650-906); registry identity normalized per
    # repositories.rs:105-111
    from polar_spark.functions.normalize import strip_registry_host

    resolved = ev.where(F.col("type") == "oci_artifact_resolved")
    verts.append(_v(resolved, "OCIArtifact", F.col("manifest_digest")))
    reg = resolved.where(F.col("registry_host").isNotNull())
    verts.append(_v(reg, "OCIRegistry", strip_registry_host("registry_host")))
    edges.append(
        _e(
            reg,
            "OCIArtifact",
            F.col("manifest_digest"),
            "OCIRegistry",
            strip_registry_host("registry_host"),
            "HOSTED_BY",
        )
    )
    rlayer = resolved.select("observed_at", "manifest_digest", F.explode("layers").alias("l"))
    verts.append(_v(rlayer, "OCILayer", F.col("l.diff_id")))
    edges.append(
        _e(
            rlayer,
            "OCIArtifact",
            F.col("manifest_digest"),
            "OCILayer",
            F.col("l.diff_id"),
            "HAS_LAYER",
            F.create_map(F.lit("order"), F.col("l.order").cast("string")),
        )
    )
    # HAS_MANIFEST: index manifest → child manifest stubs (you may not
    # have fetched the child yet — stub-then-fill), descriptor + platform
    # props on the EDGE, platform variant conditional (linker.rs:846-904)
    rman = resolved.select("observed_at", "manifest_digest", F.explode_outer("manifests").alias("m")).where(
        F.col("m").isNotNull()
    )
    verts.append(
        _v(
            rman,
            "OCIArtifact",
            F.col("m.digest"),
            F.map_filter(
                F.create_map(
                    F.lit("digest"), F.col("m.digest"),
                    F.lit("media_type"), F.col("m.media_type"),
                    F.lit("size"), F.col("m.size").cast("string"),
                ),
                lambda _k, v: v.isNotNull(),
            ),
        )
    )
    edges.append(
        _e(
            rman,
            "OCIArtifact",
            F.col("manifest_digest"),
            "OCIArtifact",
            F.col("m.digest"),
            "HAS_MANIFEST",
            F.map_filter(
                F.create_map(
                    F.lit("descriptor_media_type"), F.col("m.media_type"),
                    F.lit("descriptor_size"), F.col("m.size").cast("string"),
                    F.lit("platform_os"), F.col("m.platform_os"),
                    F.lit("platform_arch"), F.col("m.platform_arch"),
                    F.lit("platform_variant"), F.col("m.platform_variant"),
                ),
                lambda _k, v: v.isNotNull(),
            ),
        )
    )

    # VulnerabilityFound: Vulnerability + FOUND_VULNERABILITY + FOUND_IN
    # (projection.rs:255-270)
    vuln = ev.where(F.col("type") == "vulnerability_found")
    verts.append(
        _v(vuln, "Vulnerability", F.col("identifier"), F.create_map(F.lit("severity"), F.col("severity")))
    )
    edges.append(
        _e(vuln, "BuildJob", F.col("build_id"), "Vulnerability", F.col("identifier"), "FOUND_VULNERABILITY")
    )
    edges.append(
        _e(vuln, "Vulnerability", F.col("identifier"), "BuildArtifact", F.col("in_artifact"), "FOUND_IN")
    )

    # lifecycle state transitions (UpdateState M5: projection.rs:199-240)
    lifecycle = ev.where(
        F.col("type").isin("execution_started", "execution_completed")
    ).select(
        F.lit("BuildJob").alias("resource_label"),
        F.col("build_id").alias("resource_key"),
        F.lit("BuildJobState").alias("state_type"),
        F.concat_ws("@", "build_id", "observed_at").alias("instance_key"),
        F.col("observed_at").alias("valid_from"),
        F.create_map(
            F.lit("phase"),
            F.when(F.col("type") == "execution_started", F.lit("running")).otherwise(
                F.coalesce(F.col("outcome"), F.lit("completed"))
            ),
        ).alias("props"),
    )

    all_v = verts[0]
    for v in verts[1:]:
        all_v = all_v.unionByName(v)
    all_e = edges[0]
    for e in edges[1:]:
        all_e = all_e.unionByName(e)
    return all_v.where(F.col("key").isNotNull()), all_e.where(
        F.col("src_key").isNotNull() & F.col("dst_key").isNotNull()
    ), lifecycle


# The 9 golden verification queries of the reference smoke test
# (/root/reference/scripts/pipeline/smoke-test.nu:122-138) as SQL over
# the graph-store views (run via GraphStore.raw_query).
SMOKE_QUERIES: dict[str, str] = {
    "build_job_exists": "SELECT count(*) AS n FROM vertices WHERE label = 'BuildJob'",
    "built_by": (
        "SELECT count(*) AS n FROM edges WHERE rel_type = 'BUILT_BY' "
        "AND src_label = 'GitCommit' AND dst_label = 'BuildJob'"
    ),
    "has_stage": (
        "SELECT count(*) AS n FROM edges WHERE rel_type = 'HAS_STAGE' "
        "AND src_label = 'BuildJob' AND dst_label = 'BuildStage'"
    ),
    "found_vulnerability": (
        "SELECT count(*) AS n FROM edges WHERE rel_type = 'FOUND_VULNERABILITY'"
    ),
    "built_from": (
        "SELECT count(*) AS n FROM edges WHERE rel_type = 'BUILT_FROM' "
        "AND src_label = 'Binary' AND dst_label = 'Package'"
    ),
    "describes": (
        "SELECT count(*) AS n FROM edges WHERE rel_type = 'DESCRIBES' "
        "AND src_label = 'Sbom' AND dst_label = 'Package'"
    ),
    "depends_on": (
        "SELECT count(*) AS n FROM edges WHERE rel_type = 'DEPENDS_ON' "
        "AND src_label = 'Package' AND dst_label = 'Package'"
    ),
    "has_layer": (
        "SELECT count(*) AS n FROM edges WHERE rel_type = 'HAS_LAYER' "
        "AND src_label = 'ContainerImage' AND dst_label = 'OCILayer'"
    ),
    "found_in": (
        "SELECT count(*) AS n FROM edges WHERE rel_type = 'FOUND_IN' "
        "AND src_label = 'Vulnerability' AND dst_label = 'BuildArtifact'"
    ),
    "executed_in": (
        "SELECT count(*) AS n FROM edges WHERE rel_type = 'EXECUTED_IN' "
        "AND src_label = 'BuildJob'"
    ),
    "is_build_execution": (
        "SELECT count(*) AS n FROM edges WHERE rel_type = 'IS' "
        "AND src_label = 'BuildJob' AND dst_label = 'BuildExecution'"
    ),
    "has_manifest": (
        "SELECT count(*) AS n FROM edges WHERE rel_type = 'HAS_MANIFEST' "
        "AND src_label = 'OCIArtifact' AND dst_label = 'OCIArtifact'"
    ),
}
