"""Jira entity projection (S10 of SURVEY §2.1).

The reference builds Jira graph writes as string-assembled batch UNWIND
upserts (the one place it is already set-oriented — M7):
users (/root/reference/src/agents/jira/process/src/users.rs:99-105),
projects (projects.rs:99-101), groups (groups.rs:103), and issues with
dynamic labels, CHILD_OF/PART_OF/HAS_TYPE edges and changelog-driven
``Transitioned`` state (issues.rs:86-577).

Here each is a column projection into the graph-store shape; the UNWIND
batch form is simply the store's native batch merge.

Input schemas:

    users(key, display_name, email, groups array<string>, observed_at)
    issues(key, project, issue_type, parent_key /*nullable*/,
           status, labels array<string>, observed_at)
    changelogs(issue_key, changelog_id, field, from_value, to_value,
           at, observed_at)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def project_users(users: DataFrame) -> tuple[DataFrame, DataFrame]:
    """JiraUser nodes + IN_GROUP edges to JiraGroup
    (users.rs:99-105; groups.rs:132-227)."""
    verts = users.select(
        F.lit("JiraUser").alias("label"),
        F.col("key"),
        F.create_map(
            F.lit("display_name"), F.col("display_name"), F.lit("email"), F.col("email")
        ).alias("props"),
        F.col("observed_at"),
    )
    grp = users.select("key", "observed_at", F.explode_outer("groups").alias("group"))
    gverts = grp.where(F.col("group").isNotNull()).select(
        F.lit("JiraGroup").alias("label"),
        F.col("group").alias("key"),
        F.lit(None).cast("map<string,string>").alias("props"),
        F.col("observed_at"),
    )
    edges = grp.where(F.col("group").isNotNull()).select(
        F.lit("JiraUser").alias("src_label"),
        F.col("key").alias("src_key"),
        F.lit("JiraGroup").alias("dst_label"),
        F.col("group").alias("dst_key"),
        F.lit("IN_GROUP").alias("rel_type"),
        F.lit(None).cast("map<string,string>").alias("props"),
        F.col("observed_at"),
    )
    return verts.unionByName(gverts), edges


def project_issues(issues: DataFrame) -> tuple[DataFrame, DataFrame]:
    """JiraIssue (+ dynamic per-label vertices), JiraIssueType,
    JiraProject; PART_OF / HAS_TYPE / CHILD_OF edges
    (issues.rs:353-418)."""
    verts = issues.select(
        F.lit("JiraIssue").alias("label"),
        F.col("key"),
        F.create_map(F.lit("status"), F.col("status")).alias("props"),
        F.col("observed_at"),
    )
    # dynamic labels (JiraIssue_<label>) — M8 dynamic-label rows
    lab = issues.select("key", "observed_at", F.explode_outer("labels").alias("l"))
    verts = verts.unionByName(
        lab.where(F.col("l").isNotNull()).select(
            F.concat(F.lit("JiraIssue_"), F.col("l")).alias("label"),
            F.col("key"),
            F.lit(None).cast("map<string,string>").alias("props"),
            F.col("observed_at"),
        )
    )
    verts = verts.unionByName(
        issues.select(
            F.lit("JiraProject").alias("label"),
            F.col("project").alias("key"),
            F.lit(None).cast("map<string,string>").alias("props"),
            F.col("observed_at"),
        )
    ).unionByName(
        issues.select(
            F.lit("JiraIssueType").alias("label"),
            F.col("issue_type").alias("key"),
            F.lit(None).cast("map<string,string>").alias("props"),
            F.col("observed_at"),
        )
    )

    def edge(dst_label, dst_key, rel):
        return issues.select(
            F.lit("JiraIssue").alias("src_label"),
            F.col("key").alias("src_key"),
            F.lit(dst_label).alias("dst_label"),
            dst_key.alias("dst_key"),
            F.lit(rel).alias("rel_type"),
            F.lit(None).cast("map<string,string>").alias("props"),
            F.col("observed_at"),
        )

    edges = edge("JiraProject", F.col("project"), "PART_OF").unionByName(
        edge("JiraIssueType", F.col("issue_type"), "HAS_TYPE")
    )
    child = issues.where(F.col("parent_key").isNotNull())
    edges = edges.unionByName(
        child.select(
            F.lit("JiraIssue").alias("src_label"),
            F.col("key").alias("src_key"),
            F.lit("JiraIssue").alias("dst_label"),
            F.col("parent_key").alias("dst_key"),
            F.lit("CHILD_OF").alias("rel_type"),
            F.lit(None).cast("map<string,string>").alias("props"),
            F.col("observed_at"),
        )
    )
    return verts, edges


def changelog_transitions(changelogs: DataFrame) -> DataFrame:
    """Changelog rows → UpdateState transitions
    (JiraIssueChangeLog←(baseId,id), ``Transitioned`` —
    issues.rs:577): feed to ``GraphStore.update_state``."""
    return changelogs.select(
        F.lit("JiraIssue").alias("resource_label"),
        F.col("issue_key").alias("resource_key"),
        F.lit("JiraIssueState").alias("state_type"),
        F.concat_ws("#", "issue_key", "changelog_id").alias("instance_key"),
        F.col("at").alias("valid_from"),
        F.create_map(
            F.lit("field"), F.col("field"),
            F.lit("from"), F.col("from_value"),
            F.lit("to"), F.col("to_value"),
        ).alias("props"),
    )
