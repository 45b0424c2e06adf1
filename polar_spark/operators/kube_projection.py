"""Kubernetes/Flux reconciliation joins (J7 + J8 of SURVEY §2.5).

The reference links cluster state back to supply-chain artifacts with
two raw-Cypher joins in the kubernetes consumer:

- J7 equi-join: ``MATCH (state:FluxOCIRepositoryState {digest:$d})
  <-[:TRANSITIONED_TO]-(repo)  MATCH (oci:OCIArtifact {digest:$d})
  MERGE (repo)-[:RECONCILED]->(oci)``
  (/root/reference/src/agents/kubernetes/consume/src/lib.rs:1091-1103)
- J8 suffix theta-join: ``MATCH (state:FluxKustomizationState) WHERE
  state.last_applied_revision ENDS WITH $digest  MATCH (oci:OCIArtifact
  {digest:$digest})  MERGE (ks)-[:DEPLOYED]->(oci)``
  (lib.rs:1281-1291)

Here both are set-oriented joins over the graph-store tables.  For J8
we implement the literal non-equi predicate *and* the preferred
rewrite: pre-extract the digest from the revision
(``split('@')[1]`` — lib.rs:1275-1279, via
:func:`polar_spark.functions.normalize.digest_from_revision`) which
restores an equi-join Catalyst can hash — at scale the ENDS WITH form
is a broadcast-nested-loop; the rewrite is the plan you actually want.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polar_spark.functions.normalize import digest_from_revision
from polar_spark.operators.graph_store import GraphStore


def _state_anchors(store: GraphStore, state_label: str) -> DataFrame:
    """(anchor_label, anchor_key, state_key) for TRANSITIONED_TO edges
    into instances of ``state_label``."""
    return (
        store.edges.where(
            (F.col("rel_type") == "TRANSITIONED_TO") & (F.col("dst_label") == state_label)
        )
        .select(
            F.col("src_label").alias("anchor_label"),
            F.col("src_key").alias("anchor_key"),
            F.col("dst_key").alias("state_key"),
        )
        .distinct()
    )


def reconcile_oci_repositories(store: GraphStore) -> int:
    """J7: FluxOCIRepository whose state carries the digest of a known
    OCIArtifact → RECONCILED edge.  Returns edges created (matched)."""
    states = store.vertices.where(F.col("label") == "FluxOCIRepositoryState").select(
        F.col("key").alias("state_key"),
        F.element_at("props", "digest").alias("digest"),
        "observed_at",
    )
    oci = store.vertices.where(F.col("label") == "OCIArtifact").select(
        F.col("key").alias("digest")
    )
    matched = (
        _state_anchors(store, "FluxOCIRepositoryState")
        .join(states, "state_key")
        .join(oci, "digest")  # equi-join on content digest
        .select(
            F.col("anchor_label").alias("src_label"),
            F.col("anchor_key").alias("src_key"),
            F.lit("OCIArtifact").alias("dst_label"),
            F.col("digest").alias("dst_key"),
            F.lit("RECONCILED").alias("rel_type"),
            F.lit(None).cast("map<string,string>").alias("props"),
            F.col("observed_at"),
        )
    )
    n = matched.count()
    if n:
        store.ensure_edges(matched)
    return n


def link_deployed_kustomizations(store: GraphStore, use_theta: bool = False) -> int:
    """J8: FluxKustomization whose state's last_applied_revision ends
    with a known OCIArtifact digest → DEPLOYED edge.

    ``use_theta=True`` runs the literal ``ENDS WITH`` non-equi join
    (reference semantics, BNL plan); default pre-extracts the digest
    and hash-joins — same result whenever revisions are
    ``name@sha256:...`` shaped."""
    states = store.vertices.where(F.col("label") == "FluxKustomizationState").select(
        F.col("key").alias("state_key"),
        F.element_at("props", "last_applied_revision").alias("rev"),
        "observed_at",
    )
    oci = store.vertices.where(F.col("label") == "OCIArtifact").select(
        F.col("key").alias("digest")
    )
    anchored = _state_anchors(store, "FluxKustomizationState").join(states, "state_key")
    if use_theta:
        matched = anchored.join(oci, F.col("rev").endswith(F.col("digest")))
    else:
        matched = anchored.withColumn("_d", digest_from_revision("rev")).join(
            oci, F.col("_d") == F.col("digest")
        )
    edges = matched.select(
        F.col("anchor_label").alias("src_label"),
        F.col("anchor_key").alias("src_key"),
        F.lit("OCIArtifact").alias("dst_label"),
        F.col("digest").alias("dst_key"),
        F.lit("DEPLOYED").alias("rel_type"),
        F.lit(None).cast("map<string,string>").alias("props"),
        F.col("observed_at"),
    )
    n = edges.count()
    if n:
        store.ensure_edges(edges)
    return n


def owner_reference_edges(resources: DataFrame) -> DataFrame:
    """J9: k8s ownerReferences → (owner)-[:OWNS]->(child)
    (/root/reference/src/agents/kubernetes/consume/src/lib.rs:36-53).

    ``resources``: (kind, uid, owner_refs array<struct<kind:string,
    uid:string>>, observed_at)."""
    return resources.select(
        "kind", "uid", "observed_at", F.explode("owner_refs").alias("o")
    ).select(
        F.col("o.kind").alias("src_label"),
        F.col("o.uid").alias("src_key"),
        F.col("kind").alias("dst_label"),
        F.col("uid").alias("dst_key"),
        F.lit("OWNS").alias("rel_type"),
        F.lit(None).cast("map<string,string>").alias("props"),
        F.col("observed_at"),
    )
