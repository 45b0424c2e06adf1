"""Scalar parity functions vs the reference's normalization invariants."""

import pytest
from pyspark.sql import functions as F

from polar_spark.functions import normalize as N


def _one(spark, col, value):
    return spark.createDataFrame([(value,)], "x string").select(col.alias("y")).collect()[0]["y"]


@pytest.mark.parametrize(
    "raw,expected",
    [
        # /root/reference/src/agents/lib/src/graph/nodes/git.rs:24-38
        ("HTTPS://GitLab.Example.com/Org/Repo.git", "https://gitlab.example.com/Org/Repo"),
        ("https://gitlab.example.com/org/repo/", "https://gitlab.example.com/org/repo"),
        ("  https://Host/Path  ", "https://host/Path"),
        ("git@host:path", "git@host:path"),  # no scheme → untouched case
        ("https://host/repo.git/", "https://host/repo"),
    ],
)
def test_normalize_repo_url(spark, raw, expected):
    assert _one(spark, N.normalize_repo_url("x"), raw) == expected


def test_repo_id_from_url(spark):
    # ``://`` → ``_`` then ``/`` → ``_``  (nodes/git.rs:14-18)
    assert (
        _one(spark, N.repo_id_from_url("x"), "https://h/a/b")
        == "https_h_a_b"
    )


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("https://registry.example.com/", "registry.example.com"),
        ("http://reg:5000", "reg:5000"),
        ("reg.local/", "reg.local"),
    ],
)
def test_strip_registry_host(spark, raw, expected):
    # repositories.rs:105-111
    assert _one(spark, N.strip_registry_host("x"), raw) == expected


def test_digest_from_revision(spark):
    # kubernetes/consume/src/lib.rs:1275-1279
    assert (
        _one(spark, N.digest_from_revision("x"), "main@sha256:abc123")
        == "sha256:abc123"
    )
    assert _one(spark, N.digest_from_revision("x"), "no-digest-here") is None


def test_extract_gitlab_id(spark):
    # gitlab gid → trailing digits (observe/src/repositories.rs:55-56)
    assert _one(spark, N.extract_gitlab_id("x"), "gid://gitlab/Project/4217") == 4217


def test_purl(spark):
    row = (
        spark.createDataFrame([("rust", "serde", "1.0")], "e string, n string, v string")
        .select(N.purl("e", "n", "v").alias("p"))
        .collect()[0]["p"]
    )
    assert row == "pkg:cargo/serde@1.0"


def test_content_sha256_matches_hashlib(spark):
    import hashlib

    val = "hello polar\n"
    got = _one(spark, N.content_sha256("x"), val)
    assert got == hashlib.sha256(val.encode()).hexdigest()


def test_vertex_id_stable_and_distinct(spark):
    df = spark.createDataFrame(
        [("GitRepository", "a"), ("GitRepository", "b"), ("GitCommit", "a")],
        "label string, key string",
    ).select("label", "key", N.vertex_id("label", "key").alias("id"))
    rows = df.collect()
    assert len({r["id"] for r in rows}) == 3  # label participates in identity
    again = df.collect()
    assert sorted(r["id"] for r in rows) == sorted(r["id"] for r in again)
