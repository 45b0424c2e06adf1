"""Scalar-function parity with the reference — UDF-free.

Every function here is a composition of built-in ``pyspark.sql.functions``
(JVM-side, whole-stage-codegen'd), reproducing the exact normalization
invariants of the reference (file:line cited per function).  These are
the row-level identities the per-row parity checks depend on, so parity
must be byte-exact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_repo_url(col: Column | str) -> Column:
    """Parity with ``normalize_repo_url``
    (/root/reference/src/agents/lib/src/graph/nodes/git.rs:24-38):
    trim whitespace, drop trailing ``/`` then trailing ``.git``,
    lowercase scheme and host, preserve path case.
    """
    c = F.trim(F.col(col) if isinstance(col, str) else col)
    c = F.regexp_replace(c, r"/+$", "")
    c = F.regexp_replace(c, r"\.git$", "")
    # lowercase "scheme://host" prefix only; path part untouched
    scheme_host = F.regexp_extract(c, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/]*)", 1)
    tail = F.substring(c, F.length(scheme_host) + F.lit(1), F.lit(2_000_000))
    return F.when(scheme_host != "", F.concat(F.lower(scheme_host), tail)).otherwise(c)


def repo_id_from_url(col: Column | str) -> Column:
    """Parity with ``RepoId::from_url``
    (/root/reference/src/agents/lib/src/graph/nodes/git.rs:14-18):
    ``://`` → ``_`` then ``/`` → ``_`` over the *normalized* URL."""
    c = normalize_repo_url(col)
    return F.regexp_replace(F.regexp_replace(c, "://", "_"), "/", "_")


def strip_registry_host(col: Column | str) -> Column:
    """Registry host normalization — strip scheme and trailing slash
    (/root/reference/src/agents/gitlab/consume/src/repositories.rs:105-111)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.regexp_replace(c, r"^[A-Za-z][A-Za-z0-9+.-]*://", ""), r"/+$", "")


def digest_from_revision(col: Column | str) -> Column:
    """``revision.split('@').nth(1)``
    (/root/reference/src/agents/kubernetes/consume/src/lib.rs:1275-1279);
    null when there is no ``@`` part."""
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, "@")
    return F.when(F.size(parts) >= 2, F.element_at(parts, 2)).otherwise(F.lit(None))


def extract_gitlab_id(col: Column | str) -> Column:
    """Numeric id from a GitLab gid URI — trailing digits
    (/root/reference/src/agents/gitlab/observe/src/repositories.rs:55-56)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(c, r"(\d+)$", 1).cast("long")


def content_sha256(col: Column | str) -> Column:
    """Content addressing: sha256 hex of the content bytes — the
    artifact primary key throughout the reference
    (/root/reference/src/agents/lib/src/events.rs:175-177,
    scripts/pipeline/core/hashing.nu).  The per-row invariant the
    driver verifies."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(c.cast("binary"), 256)


_PURL_TYPE = {"rust": "cargo", "python": "pypi", "javascript": "npm"}


def purl(eco_col: Column | str, name_col: Column | str, version_col: Column | str) -> Column:
    """Package URL identity — the Package merge key of the reference's
    SBOM model (/root/reference/src/agents/lib/src/events.rs:114-122):
    ``pkg:<type>/<name>@<version>``."""
    eco = F.col(eco_col) if isinstance(eco_col, str) else eco_col
    name = F.col(name_col) if isinstance(name_col, str) else name_col
    ver = F.col(version_col) if isinstance(version_col, str) else version_col
    mapping = F.create_map(
        *[x for k, v in _PURL_TYPE.items() for x in (F.lit(k), F.lit(v))]
    )
    ptype = F.coalesce(mapping[eco], eco)
    return F.concat(F.lit("pkg:"), ptype, F.lit("/"), name, F.lit("@"), ver)


def vertex_id(label_col: Column | str, key_col: Column | str) -> Column:
    """Stable synthetic long id for iterative compute: xxhash64 over
    (label, natural key) — replaces Neo4j's internal node ids while the
    natural key stays on the row for per-vertex parity with the
    reference (GraphNodeKey composite-key identity,
    /root/reference/src/agents/lib/src/graph/controller.rs:60-101)."""
    lab = F.col(label_col) if isinstance(label_col, str) else label_col
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    return F.xxhash64(lab, key)
