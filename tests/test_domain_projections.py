"""Jira + OpenAPI domain projections (S10/S11, J10, M7/M8 analogs)."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from polar_spark.operators.graph_store import GraphStore
from polar_spark.operators.jira_projection import (
    changelog_transitions,
    project_issues,
    project_users,
)
from polar_spark.operators.openapi_projection import project_specs


@pytest.fixture()
def store(spark):
    tmp = tempfile.mkdtemp(prefix="polar_dom_")
    yield GraphStore(spark, tmp)
    shutil.rmtree(tmp, ignore_errors=True)


def test_jira_users_and_groups(spark, store):
    users = spark.createDataFrame(
        [
            ("u1", "Alice", "a@x", ["dev", "ops"], "t"),
            ("u2", "Bob", "b@x", None, "t"),
        ],
        "key string, display_name string, email string, groups array<string>, observed_at string",
    )
    v, e = project_users(users)
    store.upsert_nodes(v)
    store.ensure_edges(e)
    assert store.vertices.where(F.col("label") == "JiraUser").count() == 2
    assert store.vertices.where(F.col("label") == "JiraGroup").count() == 2
    grp = {(r["src_key"], r["dst_key"]) for r in store.edges.where(F.col("rel_type") == "IN_GROUP").collect()}
    assert grp == {("u1", "dev"), ("u1", "ops")}
    # M7 batch-upsert semantics: re-delivery is a no-op
    store.upsert_nodes(v)
    assert store.vertices.count() == 4


def test_jira_issues_and_changelog_state(spark, store):
    issues = spark.createDataFrame(
        [
            ("I-1", "PROJ", "Bug", None, "open", ["security"], "t1"),
            ("I-2", "PROJ", "Task", "I-1", "open", None, "t1"),
        ],
        "key string, project string, issue_type string, parent_key string, "
        "status string, labels array<string>, observed_at string",
    )
    v, e = project_issues(issues)
    store.upsert_nodes(v)
    store.ensure_edges(e)
    labels = {r["label"] for r in store.vertices.collect()}
    assert {"JiraIssue", "JiraIssue_security", "JiraProject", "JiraIssueType"} <= labels
    rels = {
        (r["rel_type"], r["src_key"], r["dst_key"]) for r in store.edges.collect()
    }
    assert ("PART_OF", "I-1", "PROJ") in rels
    assert ("HAS_TYPE", "I-2", "Task") in rels
    assert ("CHILD_OF", "I-2", "I-1") in rels

    logs = spark.createDataFrame(
        [
            ("I-1", "100", "status", "open", "in_progress", "t2", "t2"),
            ("I-1", "101", "status", "in_progress", "done", "t3", "t3"),
        ],
        "issue_key string, changelog_id string, field string, from_value string, "
        "to_value string, at string, observed_at string",
    )
    store.update_state(changelog_transitions(logs))
    assert store.state_history.count() == 2  # append-only Transitioned chain
    cur = store.current_state.collect()
    assert len(cur) == 1 and cur[0]["props"]["to"] == "done"


def test_openapi_has_endpoint(spark, store):
    specs = spark.createDataFrame(
        [
            (
                "billing",
                "1.2",
                [
                    {"path": "/invoices", "method": "GET", "operation_id": "listInvoices"},
                    {"path": "/invoices", "method": "POST", "operation_id": "createInvoice"},
                ],
                "t",
            )
        ],
        "title string, version string, "
        "endpoints array<struct<path:string,method:string,operation_id:string>>, observed_at string",
    )
    v, e = project_specs(specs)
    store.upsert_nodes(v)
    store.ensure_edges(e)
    eps = store.vertices.where(F.col("label") == "Endpoint").collect()
    assert {r["props"]["operationId"] for r in eps} == {"listInvoices", "createInvoice"}
    he = store.edges.where(F.col("rel_type") == "hasEndpoint")
    assert he.count() == 2
    assert {r["src_key"] for r in he.collect()} == {"billing"}
