"""GitLab domain projections (S5-S7 of SURVEY §2.1) — the reference's
largest vocabulary, re-expressed as column projections into the
graph-store shape.

The reference's GitLab consumers receive GraphQL/REST scan envelopes
and emit per-entity ``UpsertNode``/``EnsureEdge`` ops through the
serialized graph controller:

- GitlabNodeKey vocabulary (13 node types)
  — /root/reference/src/agents/lib/src/graph/nodes/gitlab.rs:5-71
- instance metadata + licenses (OBSERVED_LICENSE)
  — /root/reference/src/agents/gitlab/consume/src/meta.rs:25-126
- users (OBSERVED_USER) + project memberships (MEMBER_OF with
  access_level/created_at/expires_at *edge* props)
  — users.rs:44-212
- groups (OBSERVED_GROUP) + members/projects/runners (IN_GROUP)
  — groups.rs:44-227
- projects (OBSERVED_PROJECT, "unknown" default substitution)
  — projects.rs:57-106
- runners (OBSERVED_RUNNER, tag_list comma-join) — runners.rs:50-106
- pipelines (HAS_PIPELINE) / jobs (HAS_JOB, EXECUTED_BY null-guard) /
  artifacts (PRODUCED, download_path guard) — pipelines.rs:50-306
- container repositories (BELONGS_TO) / tags (CONTAINS_TAG,
  null-digest guard, "unknown" media_type) / packages (HAS_PACKAGE,
  PRODUCED from pipelines) / package files (CONTAINS_FILE)
  — repositories.rs:47-300

Here every handler is a *set-oriented* projection: one narrow
``select`` per vertex/edge family over the scan table (no shuffle —
the only shuffles in this domain happen inside ``GraphStore``'s batch
merge).  Conditional property emission (P6) is ``map_filter`` dropping
null values; default substitution (P5) is ``coalesce``; null guards
(P2) are ``where`` filters mirroring the reference's ``continue``
branches.

Composite natural keys follow GitlabNodeKey's field tuples verbatim
(``instance_id/user_id`` etc.; ContainerRepository is keyed on
(project_id, repository_id) and Package on package_id alone, exactly
as in gitlab.rs:30-46).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PROPS = "map<string,string>"


def _k(*cols: Column | str) -> Column:
    return F.concat_ws("/", *[F.col(c) if isinstance(c, str) else c for c in cols])


def _props(*pairs: tuple[str, Column]) -> Column:
    """props map with conditional emission: null values are dropped
    (the reference only pushes a Property when the field is Some)."""
    m = F.create_map(*[x for k, v in pairs for x in (F.lit(k), v.cast("string"))])
    return F.map_filter(m, lambda _k_, v: v.isNotNull())


def _verts(df: DataFrame, label: str, key: Column, props: Column | None = None) -> DataFrame:
    return df.select(
        F.lit(label).alias("label"),
        key.alias("key"),
        (props if props is not None else F.lit(None).cast(_PROPS)).alias("props"),
        F.col("observed_at"),
    )


def _edges(
    df: DataFrame,
    src_label: str,
    src_key: Column,
    dst_label: str,
    dst_key: Column,
    rel: str,
    props: Column | None = None,
) -> DataFrame:
    return df.select(
        F.lit(src_label).alias("src_label"),
        src_key.alias("src_key"),
        F.lit(dst_label).alias("dst_label"),
        dst_key.alias("dst_key"),
        F.lit(rel).alias("rel_type"),
        (props if props is not None else F.lit(None).cast(_PROPS)).alias("props"),
        F.col("observed_at"),
    )


def _instance_stubs(df: DataFrame) -> DataFrame:
    return _verts(df, "GitlabInstance", F.col("instance_id")).dropDuplicates(["key"])


# ---------------------------------------------------------------- meta


def project_instances(instances: DataFrame) -> DataFrame:
    """GitlabInstance vertices with metadata props (meta.rs:101-126).

    instances(instance_id, base_url, version, enterprise, observed_at)
    """
    return _verts(
        instances,
        "GitlabInstance",
        F.col("instance_id"),
        _props(
            ("enterprise", F.col("enterprise")),
            ("gitlab_version", F.col("version")),
            ("base_url", F.col("base_url")),
        ),
    )


def project_licenses(licenses: DataFrame) -> tuple[DataFrame, DataFrame]:
    """License vertices + OBSERVED_LICENSE (meta.rs:25-73).

    licenses(instance_id, license_id, created_at, starts_at, expires_at,
             plan, entry_type, users_in_license, observed_at)
    """
    key = _k("instance_id", "license_id")
    verts = _verts(
        licenses,
        "License",
        key,
        _props(
            ("created_at", F.col("created_at")),
            ("starts_at", F.col("starts_at")),
            ("expires_at", F.col("expires_at")),
            ("plan", F.col("plan")),
            ("type", F.col("entry_type")),
            # users_in_licenseCount defaults to 0 (meta.rs:56)
            ("users_in_licenseCount", F.coalesce(F.col("users_in_license"), F.lit(0))),
        ),
    ).unionByName(_instance_stubs(licenses))
    edges = _edges(
        licenses, "GitlabInstance", F.col("instance_id"), "License", key, "OBSERVED_LICENSE"
    )
    return verts, edges


# ---------------------------------------------------------------- users


def project_users(users: DataFrame) -> tuple[DataFrame, DataFrame]:
    """GitlabUser vertices + OBSERVED_USER from the instance
    (users.rs:44-137; conditional props for Option fields).

    users(instance_id, user_id, username, state, bot, created_at,
          last_activity_on, location, organization, web_url, web_path,
          observed_at)
    """
    key = _k("instance_id", "user_id")
    verts = _verts(
        users,
        "GitlabUser",
        key,
        _props(
            ("username", F.col("username")),
            ("state", F.col("state")),
            ("bot", F.col("bot")),
            ("created_at", F.col("created_at")),
            ("last_activity_on", F.col("last_activity_on")),
            ("location", F.col("location")),
            ("organization", F.col("organization")),
            ("web_url", F.col("web_url")),
            ("web_path", F.col("web_path")),
        ),
    ).unionByName(_instance_stubs(users))
    edges = _edges(
        users, "GitlabInstance", F.col("instance_id"), "GitlabUser", key, "OBSERVED_USER"
    )
    return verts, edges


def project_project_memberships(memberships: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(user)-[:MEMBER_OF {access_level, created_at, expires_at}]->(project)
    with *edge* props conditionally emitted (users.rs:147-212); rows
    with a null project are skipped (the reference's ``let Some(project)
    else continue``).

    memberships(instance_id, user_id, project_id, access_level,
                created_at, expires_at, observed_at)
    """
    m = memberships.where(F.col("project_id").isNotNull())
    ukey = _k("instance_id", "user_id")
    pkey = _k("instance_id", "project_id")
    verts = _verts(m, "GitlabUser", ukey).unionByName(_verts(m, "GitlabProject", pkey))
    edges = _edges(
        m,
        "GitlabUser",
        ukey,
        "GitlabProject",
        pkey,
        "MEMBER_OF",
        _props(
            ("access_level", F.col("access_level")),
            ("created_at", F.col("created_at")),
            ("expires_at", F.col("expires_at")),
        ),
    )
    return verts, edges


# ---------------------------------------------------------------- groups


def project_groups(groups: DataFrame) -> tuple[DataFrame, DataFrame]:
    """GitlabGroup vertices + OBSERVED_GROUP (groups.rs:44-96).

    groups(instance_id, group_id, full_name, full_path, created_at,
           observed_at)
    """
    key = _k("instance_id", "group_id")
    verts = _verts(
        groups,
        "GitlabGroup",
        key,
        _props(
            ("full_name", F.col("full_name")),
            ("full_path", F.col("full_path")),
            ("created_at", F.col("created_at")),  # conditional (groups.rs:75-80)
        ),
    ).unionByName(_instance_stubs(groups))
    edges = _edges(
        groups, "GitlabInstance", F.col("instance_id"), "GitlabGroup", key, "OBSERVED_GROUP"
    )
    return verts, edges


def _in_group(df: DataFrame, member_label: str, member_key: Column) -> tuple[DataFrame, DataFrame]:
    gkey = _k("instance_id", "group_id")
    verts = _verts(df, member_label, member_key).unionByName(_verts(df, "GitlabGroup", gkey))
    return verts, _edges(df, member_label, member_key, "GitlabGroup", gkey, "IN_GROUP")


def project_group_members(members: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(user)-[:IN_GROUP]->(group); null users skipped (groups.rs:98-136).

    members(instance_id, group_id, user_id, observed_at)
    """
    m = members.where(F.col("user_id").isNotNull())
    return _in_group(m, "GitlabUser", _k("instance_id", "user_id"))


def project_group_projects(group_projects: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(project)-[:IN_GROUP]->(group) (groups.rs:146-185).

    group_projects(instance_id, group_id, project_id, observed_at)
    """
    return _in_group(group_projects, "GitlabProject", _k("instance_id", "project_id"))


def project_group_runners(group_runners: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(runner)-[:IN_GROUP]->(group) (groups.rs:187-227).

    group_runners(instance_id, group_id, runner_id, observed_at)
    """
    return _in_group(group_runners, "GitlabRunner", _k("instance_id", "runner_id"))


# ---------------------------------------------------------------- projects


def project_projects(projects: DataFrame) -> tuple[DataFrame, DataFrame]:
    """GitlabProject vertices + OBSERVED_PROJECT; missing dates become
    the literal "unknown" (P5 default substitution — projects.rs:70-80),
    missing URLs become "" (projects.rs:92-99).

    projects(instance_id, project_id, name, full_path, created_at,
             last_activity_at, http_url_to_repo, ssh_url_to_repo,
             observed_at)
    """
    key = _k("instance_id", "project_id")
    verts = _verts(
        projects,
        "GitlabProject",
        key,
        _props(
            ("name", F.col("name")),
            ("full_path", F.col("full_path")),
            ("created_at", F.coalesce(F.col("created_at"), F.lit("unknown"))),
            ("last_activity_at", F.coalesce(F.col("last_activity_at"), F.lit("unknown"))),
            ("http_url_to_repo", F.coalesce(F.col("http_url_to_repo"), F.lit(""))),
            ("ssh_url_to_repo", F.coalesce(F.col("ssh_url_to_repo"), F.lit(""))),
        ),
    ).unionByName(_instance_stubs(projects))
    edges = _edges(
        projects, "GitlabInstance", F.col("instance_id"), "GitlabProject", key, "OBSERVED_PROJECT"
    )
    return verts, edges


# ---------------------------------------------------------------- runners


def project_runners(runners: DataFrame) -> tuple[DataFrame, DataFrame]:
    """GitlabRunner vertices + OBSERVED_RUNNER; tag_list is comma-joined
    (runners.rs:50-106).

    runners(instance_id, runner_id, paused, runner_type, status,
            access_level, run_untagged, tag_list array<string>,
            observed_at)
    """
    key = _k("instance_id", "runner_id")
    verts = _verts(
        runners,
        "GitlabRunner",
        key,
        _props(
            ("paused", F.col("paused")),
            ("runner_type", F.col("runner_type")),
            ("status", F.col("status")),
            ("access_level", F.col("access_level")),
            ("run_untagged", F.col("run_untagged")),
            # tag_list.unwrap_or_default().join(",") (runners.rs:86-89)
            ("tag_list", F.concat_ws(",", F.coalesce(F.col("tag_list"), F.array()))),
        ),
    ).unionByName(_instance_stubs(runners))
    edges = _edges(
        runners, "GitlabInstance", F.col("instance_id"), "GitlabRunner", key, "OBSERVED_RUNNER"
    )
    return verts, edges


# ---------------------------------------------------------------- CI


def project_pipelines(pipelines: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Pipeline vertices + (project)-[:HAS_PIPELINE]->(pipeline)
    (pipelines.rs:225-306; unwrap_or_default on the Option fields).

    pipelines(instance_id, project_id, pipeline_id, active, created_at,
              finished_at, sha, child, complete, duration, total_jobs,
              compute_minutes, failure_reason, source, trigger, latest,
              observed_at)
    """
    key = _k("instance_id", "pipeline_id")
    pkey = _k("instance_id", "project_id")
    verts = _verts(
        pipelines,
        "GitlabPipeline",
        key,
        _props(
            ("active", F.col("active")),
            ("created_at", F.col("created_at")),
            ("finished_at", F.coalesce(F.col("finished_at"), F.lit(""))),
            ("sha", F.coalesce(F.col("sha"), F.lit(""))),
            ("child", F.col("child")),
            ("complete", F.col("complete")),
            ("duration", F.coalesce(F.col("duration"), F.lit(0))),
            ("total_jobs", F.col("total_jobs")),
            ("compute_minutes", F.coalesce(F.col("compute_minutes"), F.lit(0.0))),
            ("failure_reason", F.coalesce(F.col("failure_reason"), F.lit(""))),
            ("source", F.coalesce(F.col("source"), F.lit(""))),
            ("trigger", F.col("trigger")),
            ("latest", F.col("latest")),
            ("observed_at", F.col("observed_at")),
        ),
    ).unionByName(_verts(pipelines, "GitlabProject", pkey))
    edges = _edges(pipelines, "GitlabProject", pkey, "GitlabPipeline", key, "HAS_PIPELINE")
    return verts, edges


def project_jobs(jobs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Job vertices + (pipeline)-[:HAS_JOB]->(job) +
    (job)-[:EXECUTED_BY]->(runner).  Jobs without an id are skipped and
    EXECUTED_BY is emitted only when the job carries a runner — the
    reference's two null guards (pipelines.rs:137-139,194-206).

    jobs(instance_id, pipeline_id, job_id, status, name, created_at,
         short_sha, duration, failure_message, runner_id, observed_at)
    """
    j = jobs.where(F.col("job_id").isNotNull())
    key = _k("instance_id", "job_id")
    pkey = _k("instance_id", "pipeline_id")
    verts = _verts(
        j,
        "GitlabJob",
        key,
        _props(
            ("status", F.coalesce(F.col("status"), F.lit(""))),
            ("name", F.coalesce(F.col("name"), F.lit(""))),
            ("created_at", F.coalesce(F.col("created_at"), F.lit(""))),
            ("short_sha", F.col("short_sha")),
            ("duration", F.coalesce(F.col("duration"), F.lit(0))),
            ("failure_message", F.coalesce(F.col("failure_message"), F.lit(""))),
            ("observed_at", F.col("observed_at")),
        ),
    )
    edges = _edges(j, "GitlabPipeline", pkey, "GitlabJob", key, "HAS_JOB")
    with_runner = j.where(F.col("runner_id").isNotNull())
    edges = edges.unionByName(
        _edges(
            with_runner,
            "GitlabJob",
            key,
            "GitlabRunner",
            _k("instance_id", "runner_id"),
            "EXECUTED_BY",
        )
    )
    return verts, edges


def project_artifacts(artifacts: DataFrame) -> tuple[DataFrame, DataFrame]:
    """PipelineArtifact vertices + (job)-[:PRODUCED]->(artifact); only
    artifacts with a download_path project (pipelines.rs:60-61), the
    full URL is base_url + download_path (pipelines.rs:43-45), a null
    expire_at becomes the literal "null" (pipelines.rs:86-89).

    artifacts(instance_id, base_url, job_id, artifact_id, name, size,
              expire_at, download_path, observed_at)
    """
    a = artifacts.where(F.col("download_path").isNotNull())
    key = _k("instance_id", "artifact_id")
    verts = _verts(
        a,
        "GitlabPipelineArtifact",
        key,
        _props(
            ("name", F.coalesce(F.col("name"), F.lit(""))),
            ("size", F.col("size")),
            ("expire_at", F.coalesce(F.col("expire_at"), F.lit("null"))),
            ("download_path", F.concat(F.col("base_url"), F.col("download_path"))),
        ),
    )
    edges = _edges(
        a, "GitlabJob", _k("instance_id", "job_id"), "GitlabPipelineArtifact", key, "PRODUCED"
    )
    return verts, edges


# ---------------------------------------------------------------- registry


def project_container_repositories(repos: DataFrame) -> tuple[DataFrame, DataFrame]:
    """ContainerRepository vertices + (repo)-[:BELONGS_TO]->(project)
    (repositories.rs:47-128); key is (project_id, repository_id) per
    gitlab.rs:31-34.

    repos(instance_id, project_id, repository_id, created_at,
          updated_at, location, name, path, migration_state,
          protection_rule_exists, tags_count, observed_at)
    """
    key = _k("project_id", "repository_id")
    pkey = _k("instance_id", "project_id")
    verts = _verts(
        repos,
        "GitlabContainerRepository",
        key,
        _props(
            ("created_at", F.col("created_at")),
            ("updated_at", F.col("updated_at")),
            ("location", F.col("location")),
            ("name", F.col("name")),
            ("path", F.col("path")),
            ("migration_state", F.col("migration_state")),
            ("protection_rule_exists", F.col("protection_rule_exists")),
            ("tags_count", F.col("tags_count")),
        ),
    ).unionByName(_verts(repos, "GitlabProject", pkey))
    edges = _edges(
        repos, "GitlabContainerRepository", key, "GitlabProject", pkey, "BELONGS_TO"
    )
    return verts, edges


def project_container_tags(tags: DataFrame) -> tuple[DataFrame, DataFrame]:
    """ContainerRepositoryTag vertices + (repo)-[:CONTAINS_TAG]->(tag);
    tags with no digest are skipped (the P2 null guard,
    repositories.rs:141-143), media_type defaults to "unknown"
    (repositories.rs:156-162).

    tags(project_id, repository_id, digest, media_type, location,
         revision, short_revision, total_size, created_at, observed_at)
    """
    t = tags.where(F.col("digest").isNotNull())
    key = F.concat_ws("@", F.col("repository_id"), F.col("digest"))
    rkey = _k("project_id", "repository_id")
    verts = _verts(
        t,
        "GitlabContainerRepositoryTag",
        key,
        _props(
            ("media_type", F.coalesce(F.col("media_type"), F.lit("unknown"))),
            ("location", F.col("location")),
            ("revision", F.coalesce(F.col("revision"), F.lit(""))),
            ("short_revision", F.coalesce(F.col("short_revision"), F.lit(""))),
            ("total_size", F.coalesce(F.col("total_size"), F.lit(""))),
            ("created_at", F.coalesce(F.col("created_at"), F.lit(""))),
        ),
    )
    edges = _edges(
        t, "GitlabContainerRepository", rkey, "GitlabContainerRepositoryTag", key, "CONTAINS_TAG"
    )
    return verts, edges


def project_packages(packages: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Package vertices + (project)-[:HAS_PACKAGE]->(pkg) +
    (pipeline)-[:PRODUCED]->(pkg) for each producing pipeline
    (repositories.rs:202-265); Package is keyed on package_id alone
    (gitlab.rs:35-37).

    packages(instance_id, project_id, package_id, name, version,
             package_type, status, status_message,
             pipeline_ids array<string>, observed_at)
    """
    verts = _verts(
        packages,
        "GitlabPackage",
        F.col("package_id"),
        _props(
            ("name", F.col("name")),
            ("version", F.coalesce(F.col("version"), F.lit(""))),
            ("package_type", F.col("package_type")),
            ("status", F.col("status")),
            ("status_message", F.coalesce(F.col("status_message"), F.lit(""))),
        ),
    )
    edges = _edges(
        packages,
        "GitlabProject",
        _k("instance_id", "project_id"),
        "GitlabPackage",
        F.col("package_id"),
        "HAS_PACKAGE",
    )
    prod = packages.select(
        "instance_id", "package_id", "observed_at",
        F.explode_outer("pipeline_ids").alias("pipeline_id"),
    ).where(F.col("pipeline_id").isNotNull())
    edges = edges.unionByName(
        _edges(
            prod,
            "GitlabPipeline",
            _k("instance_id", "pipeline_id"),
            "GitlabPackage",
            F.col("package_id"),
            "PRODUCED",
        )
    )
    return verts, edges


def project_package_files(files: DataFrame) -> tuple[DataFrame, DataFrame]:
    """PackageFile vertices + (pkg)-[:CONTAINS_FILE]->(file)
    (repositories.rs:267-300).

    files(package_id, file_id, file_name, observed_at)
    """
    key = _k("package_id", "file_id")
    verts = _verts(files, "GitlabPackageFile", key, _props(("file_name", F.col("file_name"))))
    edges = _edges(
        files, "GitlabPackage", F.col("package_id"), "GitlabPackageFile", key, "CONTAINS_FILE"
    )
    return verts, edges
