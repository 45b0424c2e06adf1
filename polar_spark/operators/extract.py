"""Entity/edge extraction from the source-code table.

Spark re-expression of the reference's ingestion path: observers emit
typed entities which processors project into graph nodes/edges
(git: /root/reference/src/agents/git/process/src/main.rs:32-159;
SBOM dependency tree: /root/reference/src/agents/build-processor/
src/linker.rs:72-237).  Here the whole path is one declarative DAG
over the ``(repo, path, commit, lang, content)`` table:

  source scan → files (sha256 content addressing)
              → packages (purl identity)
              → DEPENDS_ON edge table (the north-star edge table)

Two implementations of dependency parsing:

- ``extract_dependencies`` (default): pure built-in expressions —
  ``split``/``explode``/``regexp_extract`` stay inside whole-stage
  codegen; zero Python in the hot path.
- ``extract_dependencies_arrow``: ``mapInPandas`` with vectorized
  pandas ``str.extract`` — the Arrow-UDF formulation mandated as a
  capability by the input hint.  Tests assert both produce identical
  edge sets; benchmarks pick the expression path.

Scale: the only shuffle in edge-table construction is the final
dedup by (src,dst) — partial aggregation map-side; the manifest filter
(`path IN (...)`) prunes >90% of rows before any regex runs and is
pushed into the parquet scan.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polar_spark.functions.normalize import content_sha256, purl, vertex_id

MANIFEST_PATHS = {"Cargo.toml": "rust", "requirements.txt": "python", "package.json": "javascript"}

# One dependency-line regex per ecosystem.  Anchored, single-line.
_DEP_RE = {
    # serde = "1.0"   (skip [section] and key = value of package metadata)
    "rust": r'^\s*([A-Za-z0-9_][A-Za-z0-9_-]*)\s*=\s*"([^"]+)"\s*$',
    # numpy==1.26
    "python": r"^\s*([A-Za-z0-9_][A-Za-z0-9._-]*)\s*==\s*([A-Za-z0-9.*+!-]+)\s*$",
    # "lodash": "4.17.21",
    "javascript": r'^\s*"([A-Za-z0-9@/_.-]+)"\s*:\s*"([^"]+)",?\s*$',
}


def extract_files(source: DataFrame) -> DataFrame:
    """files(repo, path, commit, lang, content_sha256, size_bytes).

    The content sha256 is the reference's content-addressing invariant
    (/root/reference/src/agents/lib/src/events.rs:175-177) — computed
    JVM-side with ``sha2``; checked row-for-row against hashlib in
    tests.
    """
    return source.select(
        "repo",
        "path",
        "commit",
        "lang",
        content_sha256("content").alias("content_sha256"),
        F.length(F.col("content").cast("binary")).alias("size_bytes"),
    )


def _manifest_rows(source: DataFrame) -> DataFrame:
    # partition-pruning-friendly: path predicate pushed to the scan
    return source.where(F.col("path").isin(*MANIFEST_PATHS.keys()))


def extract_dependencies(source: DataFrame) -> DataFrame:
    """deps(repo, commit, lang, dep_name, dep_version) via built-in
    expressions only (codegen hot path).

    Rust section handling: lines before ``[dependencies]`` are ignored
    (the reference parses the structured SBOM instead — linker.rs:154-
    223 — our manifests are the pre-SBOM source of the same facts).
    """
    m = _manifest_rows(source)
    branches = []
    for lang, rx in _DEP_RE.items():
        part = m.where(F.col("lang") == lang)
        body = F.col("content")
        if lang == "rust":
            # drop everything before the [dependencies] section header
            body = F.element_at(F.split(body, r"\[dependencies\]", 2), -1)
        lines = part.select(
            "repo", "commit", "lang", F.explode(F.split(body, "\n")).alias("line")
        )
        parsed = lines.select(
            "repo",
            "commit",
            "lang",
            F.regexp_extract("line", rx, 1).alias("dep_name"),
            F.regexp_extract("line", rx, 2).alias("dep_version"),
        ).where(F.col("dep_name") != "")
        branches.append(parsed)
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    # json manifests carry a top-level "name" key that is not a dependency
    return out.where(~((F.col("lang") == "javascript") & (F.col("dep_name") == "name")))


def extract_dependencies_arrow(source: DataFrame) -> DataFrame:
    """Same contract as :func:`extract_dependencies`, as a vectorized
    Arrow UDF (``mapInPandas`` + pandas ``str.extractall`` — batch-at-
    a-time, never per-row Python)."""
    import re

    m = _manifest_rows(source).select("repo", "commit", "lang", "content")
    res = {k: re.compile(v, re.M) for k, v in _DEP_RE.items()}

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for lang, grp in pdf.groupby("lang"):
                rx = res.get(lang)
                if rx is None or grp.empty:
                    continue
                body = grp["content"]
                if lang == "rust":
                    body = body.str.split(r"\[dependencies\]", n=1, regex=True).str[-1]
                hits = body.str.extractall(rx)
                if hits.empty:
                    continue
                hits = hits.reset_index(level=1, drop=True)
                joined = grp[["repo", "commit", "lang"]].join(hits)
                joined = joined.rename(columns={0: "dep_name", 1: "dep_version"})
                joined = joined.dropna(subset=["dep_name"])
                if lang == "javascript":
                    joined = joined[joined["dep_name"] != "name"]
                frames.append(joined)
            if frames:
                out = pd.concat(frames, ignore_index=True)
            else:
                out = pd.DataFrame(
                    columns=["repo", "commit", "lang", "dep_name", "dep_version"]
                )
            yield out[["repo", "commit", "lang", "dep_name", "dep_version"]]

    return m.mapInPandas(
        parse, schema="repo string, commit string, lang string, dep_name string, dep_version string"
    )


def extract_packages(deps: DataFrame) -> DataFrame:
    """packages(purl, name, version, ecosystem) — purl is the merge key,
    name/version updatable props (reference: PackageRef,
    /root/reference/src/agents/lib/src/events.rs:108-122)."""
    return (
        deps.select(
            purl("lang", "dep_name", "dep_version").alias("purl"),
            F.col("dep_name").alias("name"),
            F.col("dep_version").alias("version"),
            F.col("lang").alias("ecosystem"),
        )
        .dropDuplicates(["purl"])
    )


def build_repo_edges(deps: DataFrame, repos: DataFrame) -> DataFrame:
    """The north-star edge table: repo→repo DEPENDS_ON.

    A dependency whose package name matches another repo's short name
    is an internal dependency (the Spark analog of the SBOM
    purl↔purl DEPENDS_ON graph, /root/reference/src/agents/
    build-processor/src/linker.rs:204-223).

    ``repos`` must have (repo, repo_name).  The repo dimension is tiny
    relative to deps (one row per repo vs many deps) → broadcast join,
    no shuffle on the big side; the final dedup is the single shuffle.

    Returns edges(src, dst, etype, src_repo, dst_repo) with stable
    long ids (xxhash64 of the repo identity).
    """
    resolved = deps.join(
        F.broadcast(repos.select(F.col("repo").alias("dst_repo"), "repo_name")),
        deps.dep_name == F.col("repo_name"),
        "inner",
    )
    out = (
        resolved.where(F.col("repo") != F.col("dst_repo"))
        .select(
            vertex_id(F.lit("GitRepository"), F.col("repo")).alias("src"),
            vertex_id(F.lit("GitRepository"), F.col("dst_repo")).alias("dst"),
            F.lit("DEPENDS_ON").alias("etype"),
            F.col("repo").alias("src_repo"),
            F.col("dst_repo"),
        )
        .dropDuplicates(["src", "dst"])
    )
    return out


def repos_dim(source: DataFrame) -> DataFrame:
    """Tiny repo dimension (repo identity + short name) for edge
    resolution; short name = last path segment of the normalized URL."""
    return (
        source.select("repo")
        .distinct()
        .withColumn("repo_name", F.element_at(F.split(F.col("repo"), "/"), -1))
    )
