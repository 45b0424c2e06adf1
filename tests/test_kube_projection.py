"""The four provenance-chain scenarios of the reference's seed-graph
(/root/reference/scripts/seed-graph.nu:7-134 — FIXTURES.md §5),
exercising the J7 equi-join and J8 suffix theta-join."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from polar_spark.operators.graph_store import GraphStore
from polar_spark.operators.kube_projection import (
    link_deployed_kustomizations,
    owner_reference_edges,
    reconcile_oci_repositories,
)

DIGEST = "sha256:aabbcc"
STATE_SCHEMA = (
    "resource_label string, resource_key string, state_type string, "
    "instance_key string, valid_from string, props map<string,string>"
)


@pytest.fixture()
def store(spark):
    tmp = tempfile.mkdtemp(prefix="polar_kube_")
    yield GraphStore(spark, tmp)
    shutil.rmtree(tmp, ignore_errors=True)


def _seed_oci(spark, store):
    store.upsert_nodes(
        spark.createDataFrame(
            [("OCIArtifact", DIGEST, None, "t0")],
            "label string, key string, props map<string,string>, observed_at string",
        )
    )


def _seed_flux_repo(spark, store, digest=DIGEST):
    store.update_state(
        spark.createDataFrame(
            [("FluxOCIRepository", "repo-1", "FluxOCIRepository", "repo-1@t1", "t1", {"digest": digest})],
            STATE_SCHEMA,
        )
    )


def _seed_kustomization(spark, store, revision=f"main@{DIGEST}"):
    store.update_state(
        spark.createDataFrame(
            [
                (
                    "FluxKustomization",
                    "ks-1",
                    "FluxKustomization",
                    "ks-1@t2",
                    "t2",
                    {"last_applied_revision": revision},
                )
            ],
            STATE_SCHEMA,
        )
    )


def test_happy_path_chain(spark, store):
    _seed_oci(spark, store)
    _seed_flux_repo(spark, store)
    _seed_kustomization(spark, store)
    assert reconcile_oci_repositories(store) == 1
    assert link_deployed_kustomizations(store) == 1
    rec = store.edges.where(F.col("rel_type") == "RECONCILED").collect()
    dep = store.edges.where(F.col("rel_type") == "DEPLOYED").collect()
    assert rec[0]["src_key"] == "repo-1" and rec[0]["dst_key"] == DIGEST
    assert dep[0]["src_key"] == "ks-1" and dep[0]["dst_key"] == DIGEST
    # theta form produces the identical edge set (idempotent re-merge)
    n_before = store.edges.count()
    assert link_deployed_kustomizations(store, use_theta=True) == 1
    assert store.edges.count() == n_before


def test_missing_reconciliation(spark, store):
    # no Flux nodes at all → RECONCILED absent (reference exit code 6)
    _seed_oci(spark, store)
    _seed_kustomization(spark, store)
    assert reconcile_oci_repositories(store) == 0
    assert store.edges.where(F.col("rel_type") == "RECONCILED").count() == 0


def test_deployment_pending(spark, store):
    # Flux repo fetched but no FluxKustomizationState → DEPLOYED absent
    _seed_oci(spark, store)
    _seed_flux_repo(spark, store)
    assert reconcile_oci_repositories(store) == 1
    assert link_deployed_kustomizations(store) == 0
    assert store.edges.where(F.col("rel_type") == "DEPLOYED").count() == 0


def test_digest_mismatch(spark, store):
    # stale revision digest → suffix join finds nothing
    _seed_oci(spark, store)
    _seed_flux_repo(spark, store)
    _seed_kustomization(spark, store, revision="main@sha256:stale999")
    assert link_deployed_kustomizations(store) == 0
    assert link_deployed_kustomizations(store, use_theta=True) == 0


def test_owner_reference_edges(spark, store):
    res = spark.createDataFrame(
        [
            ("Pod", "pod-1", [{"kind": "ReplicaSet", "uid": "rs-1"}], "t"),
            ("ReplicaSet", "rs-1", [{"kind": "KubernetesDeployment", "uid": "dep-1"}], "t"),
        ],
        "kind string, uid string, owner_refs array<struct<kind:string,uid:string>>, observed_at string",
    )
    edges = owner_reference_edges(res)
    store.ensure_edges(edges)
    owns = {(r["src_key"], r["dst_key"]) for r in store.edges.where(F.col("rel_type") == "OWNS").collect()}
    assert owns == {("rs-1", "pod-1"), ("dep-1", "rs-1")}
