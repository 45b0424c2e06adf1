"""Deterministic synthetic source-code corpus.

Produces the exact input shape mandated by BASELINE.json ``input_hint``:

    (repo: string, path: string, commit: string, lang: string, content: string)

Generation is *distributed and deterministic*: one ``spark.range`` row
per (repo, commit) expands inside ``mapInPandas`` into that snapshot's
file rows, derived purely from (seed, repo_idx, commit_idx).  No driver
-side materialization — at 10^12-file scale the generator parallelizes
like any other scan.

Planted ground truth: each repo carries one manifest file
(Cargo.toml / requirements.txt / package.json by ecosystem — mirroring
the purl ecosystems of the reference's SBOM model,
/root/reference/src/agents/lib/src/events.rs:114-122) whose dependency
lines are drawn from a Zipf-skewed package universe.  Package index
p < n_repos refers to repo p (an *internal* dependency → a repo→repo
edge, the north-star edge table); p >= n_repos is an external package.
Zipf skew gives a few hub packages (cf. serde/tokio in the reference
smoke fixture, /root/reference/scripts/pipeline/smoke-test.nu:46-56)
so skew/salting paths get exercised honestly.

``expected_repo_edges`` replays the same pure per-repo function and is
the tests' oracle.
"""

from __future__ import annotations

import hashlib
import json
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SOURCE_SCHEMA = "repo string, path string, commit string, lang string, content string"

_ECOSYSTEMS = ["rust", "python", "javascript"]
_MANIFEST = {
    "rust": ("Cargo.toml", "toml"),
    "python": ("requirements.txt", "text"),
    "javascript": ("package.json", "json"),
}
_WORDS = (
    "graph node edge merge state commit repo artifact digest layer package "
    "registry pipeline job runner observe process link resolve schedule topic "
    "broker event stream vertex rank component label triangle shuffle partition"
).split()


def repo_url(repo_idx: int) -> str:
    """Normalized repo identity (already in the canonical form of
    normalize_repo_url — /root/reference/src/agents/lib/src/graph/nodes/git.rs:24-38:
    lowercase scheme+host, no trailing slash, no .git)."""
    return f"https://gitlab.example.com/org{repo_idx % 7}/repo{repo_idx}"


def repo_ecosystem(repo_idx: int) -> str:
    return _ECOSYSTEMS[repo_idx % len(_ECOSYSTEMS)]


def package_name(pkg_idx: int, n_repos: int) -> str:
    return f"repo{pkg_idx}" if pkg_idx < n_repos else f"extpkg{pkg_idx - n_repos}"


def package_version(pkg_idx: int) -> str:
    return f"{1 + pkg_idx % 3}.{pkg_idx % 10}"


def commit_sha(repo_idx: int, commit_idx: int, seed: int) -> str:
    return hashlib.sha1(f"{seed}:{repo_idx}:{commit_idx}".encode()).hexdigest()


def repo_dep_indices(
    repo_idx: int,
    n_repos: int,
    n_external: int,
    seed: int,
    min_deps: int = 3,
    max_deps: int = 12,
    zipf_a: float = 1.4,
) -> list[int]:
    """Pure per-repo dependency choice — shared by the distributed
    generator and the test oracle so the planted edge set is exact."""
    rng = np.random.default_rng([seed, repo_idx])
    k = int(rng.integers(min_deps, max_deps + 1))
    universe = n_repos + n_external
    # Zipf over the package universe: low indices are hubs.
    raw = rng.zipf(zipf_a, size=4 * k)
    idx = [int(x - 1) for x in raw if x - 1 < universe and int(x - 1) != repo_idx]
    out: list[int] = []
    for p in idx:
        if p not in out:
            out.append(p)
        if len(out) == k:
            break
    return out


def _manifest_content(repo_idx: int, n_repos: int, deps: list[int], eco: str) -> str:
    names = [(package_name(p, n_repos), package_version(p)) for p in deps]
    if eco == "rust":
        lines = ["[package]", f'name = "repo{repo_idx}"', "", "[dependencies]"]
        lines += [f'{n} = "{v}"' for n, v in names]
        return "\n".join(lines)
    if eco == "python":
        return "\n".join(f"{n}=={v}" for n, v in names)
    return json.dumps(
        {"name": f"repo{repo_idx}", "dependencies": {n: v for n, v in names}},
        indent=1,
        sort_keys=True,
    )


def _code_file(rng: np.random.Generator, repo_idx: int, file_idx: int, commit_idx: int) -> str:
    n = int(rng.integers(30, 120))
    words = rng.choice(_WORDS, size=n)
    body = " ".join(words.tolist())
    return f"// repo{repo_idx} file{file_idx} rev{commit_idx}\n{body}\n"


def gen_source_table(
    spark: SparkSession,
    n_repos: int = 100,
    files_per_repo: int = 10,
    n_commits: int = 1,
    n_external: int = 200,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic generator → DataFrame(SOURCE_SCHEMA).

    One input row per (repo, commit); expansion to file rows happens in
    executors via an Arrow-batched pandas generator (no per-row Python
    in the Spark-facing surface; the inner loop is driver-free and
    O(files_per_repo) python per *snapshot*, amortized over a full
    pandas batch before hitting Arrow).
    """
    n_parts = partitions or max(spark.sparkContext.defaultParallelism, 8)
    base = spark.range(0, n_repos * n_commits, 1, n_parts)

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple[str, str, str, str, str]] = []
            for rid in pdf["id"].tolist():
                repo_idx = int(rid) // n_commits
                commit_idx = int(rid) % n_commits
                url = repo_url(repo_idx)
                eco = repo_ecosystem(repo_idx)
                sha = commit_sha(repo_idx, commit_idx, seed)
                mpath, _ = _MANIFEST[eco]
                deps = repo_dep_indices(repo_idx, n_repos, n_external, seed)
                rows.append((url, mpath, sha, eco, _manifest_content(repo_idx, n_repos, deps, eco)))
                rng = np.random.default_rng([seed, repo_idx, commit_idx, 7])
                ext = {"rust": "rs", "python": "py", "javascript": "js"}[eco]
                for f in range(files_per_repo):
                    rows.append(
                        (
                            url,
                            f"src/file{f}.{ext}",
                            sha,
                            eco,
                            _code_file(rng, repo_idx, f, commit_idx),
                        )
                    )
            yield pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])

    return base.mapInPandas(expand, schema=SOURCE_SCHEMA)


def gen_zipf_edges(
    spark: SparkSession,
    m: int,
    n_vertices: int,
    seed: int = 42,
    skew: float = 2.0,
    partitions: int | None = None,
) -> "DataFrame":
    """Deterministic skewed benchmark graph, generated entirely JVM-side
    (``spark.range`` + xxhash64 arithmetic — no Python in the path, no
    I/O): src follows a power-law toward low ids (hub sources), dst is
    uniform.  Used for throughput/scaling benchmarks where the graph
    must be identical across parallelism levels."""
    from pyspark.sql import functions as F

    n_parts = partitions or max(spark.sparkContext.defaultParallelism, 8)
    ids = spark.range(0, m, 1, n_parts)
    u = (F.abs(F.xxhash64("id", F.lit(seed))) % F.lit(1_000_000)) / F.lit(1_000_000.0)
    src = (F.abs(F.xxhash64("id", F.lit(seed + 1))) % F.lit(n_vertices)).cast("long")
    # power-law dst: hub *receivers* (popular packages) — exercises the
    # skewed aggregation path
    dst = F.floor(F.lit(float(n_vertices)) * F.pow(u, F.lit(skew))).cast("long")
    return ids.select(src.alias("src"), dst.alias("dst")).where(F.col("src") != F.col("dst"))


def expected_repo_edges(
    n_repos: int, n_external: int = 200, seed: int = 42
) -> set[tuple[int, int]]:
    """Oracle: the exact set of internal repo→repo dependency pairs the
    generator plants (src_repo_idx, dst_repo_idx)."""
    edges: set[tuple[int, int]] = set()
    for r in range(n_repos):
        for p in repo_dep_indices(r, n_repos, n_external, seed):
            if p < n_repos:
                edges.add((r, p))
    return edges


def expected_package_deps(
    n_repos: int, n_external: int = 200, seed: int = 42
) -> set[tuple[int, int]]:
    """Oracle: all (repo_idx, package_idx) dependency pairs (internal + external)."""
    return {
        (r, p)
        for r in range(n_repos)
        for p in repo_dep_indices(r, n_repos, n_external, seed)
    }
