"""Extraction parity tests: planted ground truth, sha256 per-row
invariant, expression-path == Arrow-path equivalence."""

import hashlib

import pytest

from polar_spark.operators.extract import (
    build_repo_edges,
    extract_dependencies,
    extract_dependencies_arrow,
    extract_files,
    extract_packages,
    repos_dim,
)
from polar_spark.sources.synthetic import (
    expected_package_deps,
    expected_repo_edges,
    gen_source_table,
    package_name,
    package_version,
    repo_url,
)

N_REPOS, N_EXT, SEED = 40, 120, 42


@pytest.fixture(scope="module")
def source(spark):
    df = gen_source_table(
        spark, n_repos=N_REPOS, files_per_repo=4, n_commits=2, n_external=N_EXT, seed=SEED
    ).cache()
    df.count()
    return df


def test_sha256_per_row_invariant(source):
    """content sha256 equality vs hashlib — the reference's content
    addressing (/root/reference/src/agents/lib/src/events.rs:175-177)."""
    files = extract_files(source)
    sample = files.join(
        source.select("repo", "path", "commit", "content"), ["repo", "path", "commit"]
    ).limit(200).collect()
    assert sample
    for row in sample:
        assert row["content_sha256"] == hashlib.sha256(row["content"].encode()).hexdigest()
        assert row["size_bytes"] == len(row["content"].encode())


def test_dependency_extraction_matches_ground_truth(source):
    deps = extract_dependencies(source)
    got = {
        (r["repo"], r["dep_name"], r["dep_version"])
        for r in deps.select("repo", "dep_name", "dep_version").distinct().collect()
    }
    exp = {
        (repo_url(r), package_name(p, N_REPOS), package_version(p))
        for r, p in expected_package_deps(N_REPOS, N_EXT, SEED)
    }
    assert got == exp


def test_arrow_path_equals_expression_path(source):
    a = set(
        map(
            tuple,
            extract_dependencies(source)
            .select("repo", "commit", "dep_name", "dep_version")
            .distinct()
            .collect(),
        )
    )
    b = set(
        map(
            tuple,
            extract_dependencies_arrow(source)
            .select("repo", "commit", "dep_name", "dep_version")
            .distinct()
            .collect(),
        )
    )
    assert a == b


def test_repo_edge_table_matches_planted_graph(source):
    deps = extract_dependencies(source)
    edges = build_repo_edges(deps, repos_dim(source))
    got = {(r["src_repo"], r["dst_repo"]) for r in edges.collect()}
    exp = {(repo_url(a), repo_url(b)) for a, b in expected_repo_edges(N_REPOS, N_EXT, SEED)}
    assert got == exp
    # ids are stable hashes, no collisions at this scale, no self-edges
    rows = edges.collect()
    assert all(r["src"] != r["dst"] for r in rows)
    id_of = {}
    for r in rows:
        for key, vid in ((r["src_repo"], r["src"]), (r["dst_repo"], r["dst"])):
            assert id_of.setdefault(key, vid) == vid


def test_packages_purl_identity(source):
    pkgs = extract_packages(extract_dependencies(source))
    rows = pkgs.collect()
    assert len(rows) == len({r["purl"] for r in rows})  # purl is the key
    by_name = {(r["name"], r["version"], r["ecosystem"]) for r in rows}
    exp_pairs = expected_package_deps(N_REPOS, N_EXT, SEED)
    # every planted (eco, name, version) combo appears
    for _, p in list(exp_pairs)[:50]:
        name, ver = package_name(p, N_REPOS), package_version(p)
        assert any(n == name and v == ver for n, v, _ in by_name)
