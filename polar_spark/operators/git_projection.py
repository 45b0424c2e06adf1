"""Git-history projection: commits/refs → graph entities.

Parity with the git processor (/root/reference/src/agents/git/process/
src/main.rs:32-159): ``CommitDiscovered`` → UpsertNode repo, UpsertNode
commit (props), CONTAINS edge, PARENT edges (self-parent guarded);
``RefUpdated`` → GitRef node + POINTS_TO edge with observed_at.
Incremental-walk semantics (high-water mark + depth bound —
/root/reference/src/agents/git/observe/src/lib.rs:615-654) become a
watermark predicate + windowed rank.

Input schemas (FIXTURES.md §3):

    commits(repo, oid, ref_name, committer, time long, message,
            parents array<string>, observed_at)
    refs(repo, ref_name, old /*nullable*/, new, observed_at)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from polar_spark.functions.normalize import normalize_repo_url


def project_commits(commits: DataFrame) -> tuple[DataFrame, DataFrame]:
    """commits → (vertices, edges): GitRepository + GitCommit vertices;
    CONTAINS and PARENT edges (child→parent; self-parent skipped —
    main.rs:78-82)."""
    c = commits.withColumn("repo_id", normalize_repo_url("repo"))
    repo_v = c.select(
        F.lit("GitRepository").alias("label"),
        F.col("repo_id").alias("key"),
        F.lit(None).cast("map<string,string>").alias("props"),
        F.col("observed_at"),
    )
    commit_v = c.select(
        F.lit("GitCommit").alias("label"),
        F.col("oid").alias("key"),
        F.create_map(
            F.lit("committer"), F.col("committer"),
            F.lit("time"), F.col("time").cast("string"),
            F.lit("message"), F.col("message"),
        ).alias("props"),
        F.col("observed_at"),
    )
    contains = c.select(
        F.lit("GitRepository").alias("src_label"),
        F.col("repo_id").alias("src_key"),
        F.lit("GitCommit").alias("dst_label"),
        F.col("oid").alias("dst_key"),
        F.lit("CONTAINS").alias("rel_type"),
        F.lit(None).cast("map<string,string>").alias("props"),
        F.col("observed_at"),
    )
    parent = (
        c.select("oid", "observed_at", F.explode("parents").alias("parent_oid"))
        .where(F.col("parent_oid") != F.col("oid"))  # self-parent guard
        .select(
            F.lit("GitCommit").alias("src_label"),
            F.col("oid").alias("src_key"),
            F.lit("GitCommit").alias("dst_label"),
            F.col("parent_oid").alias("dst_key"),
            F.lit("PARENT").alias("rel_type"),
            F.lit(None).cast("map<string,string>").alias("props"),
            F.col("observed_at"),
        )
    )
    return repo_v.unionByName(commit_v), contains.unionByName(parent)


def project_ref_updates(refs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """refs → GitRef vertices + POINTS_TO{observed_at} replace-edges
    (latest-pointer, main.rs:113-151).  Feed the edges to
    ``GraphStore.replace_edges`` so a force-push *replaces* the pointer
    (old tip recorded in props)."""
    r = refs.withColumn("repo_id", normalize_repo_url("repo"))
    ref_key = F.concat_ws("#", "repo_id", "ref_name")
    verts = r.select(
        F.lit("GitRef").alias("label"),
        ref_key.alias("key"),
        F.create_map(F.lit("name"), F.col("ref_name")).alias("props"),
        F.col("observed_at"),
    )
    edges = r.select(
        F.lit("GitRef").alias("src_label"),
        ref_key.alias("src_key"),
        F.lit("GitCommit").alias("dst_label"),
        F.col("new").alias("dst_key"),
        F.lit("POINTS_TO").alias("rel_type"),
        F.when(
            F.col("old").isNotNull(),
            F.create_map(
                F.lit("observed_at"), F.col("observed_at"), F.lit("old"), F.col("old")
            ),
        )
        .otherwise(F.create_map(F.lit("observed_at"), F.col("observed_at")))
        .alias("props"),
        F.col("observed_at"),
    )
    return verts, edges


def incremental_walk(
    commits: DataFrame,
    last_seen: DataFrame | None = None,
    max_depth: int = 100,
) -> DataFrame:
    """The incremental revwalk as a declarative plan
    (lib.rs:615-654): keep commits newer than the per-(repo, ref)
    high-water mark, newest-first, hard depth bound.

    ``last_seen``: (repo, ref_name, last_time long) watermark table.
    """
    c = commits
    if last_seen is not None:
        c = c.join(last_seen, ["repo", "ref_name"], "left").where(
            F.col("last_time").isNull() | (F.col("time") > F.col("last_time"))
        ).drop("last_time")
    w = Window.partitionBy("repo", "ref_name").orderBy(F.desc("time"), F.desc("oid"))
    return (
        c.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= max_depth)
        .drop("_rn")
    )


def resolve_default_refs(refs: DataFrame) -> DataFrame:
    """S3 ref-resolution fallback (/root/reference/src/agents/git/
    observe/src/lib.rs:538-559): per repo, the symbolic HEAD target if
    observed, else ``origin/main``.

    ``refs``: (repo, ref_name, new, observed_at) — a row with
    ref_name='HEAD' carries the symbolic target in ``new``."""
    head = (
        refs.where(F.col("ref_name") == "HEAD")
        .groupBy("repo")
        .agg(F.max("new").alias("_head_target"))
    )
    return (
        refs.select("repo")
        .distinct()
        .join(head, "repo", "left")
        .select(
            "repo",
            F.coalesce(F.col("_head_target"), F.lit("origin/main")).alias("default_ref"),
        )
    )


def detect_ref_changes(current: DataFrame, previous: DataFrame | None) -> DataFrame:
    """Per-ref change detection (S4, lib.rs:655-704): compare the new
    refs snapshot against the previous; emit RefUpdated rows
    (repo, ref_name, old nullable, new, observed_at) for new or moved
    tips — including force-pushes (old != new, not an ancestor check:
    the reference emits old+new and lets the graph hold both)."""
    cur = current.select("repo", "ref_name", F.col("new"), "observed_at")
    if previous is None:
        return cur.select(
            "repo", "ref_name", F.lit(None).cast("string").alias("old"), "new", "observed_at"
        )
    prev = previous.select("repo", "ref_name", F.col("new").alias("old"))
    return (
        cur.join(prev, ["repo", "ref_name"], "left")
        .where(F.col("old").isNull() | (F.col("old") != F.col("new")))
        .select("repo", "ref_name", "old", "new", "observed_at")
    )
