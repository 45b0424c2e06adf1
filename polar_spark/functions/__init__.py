from polar_spark.functions.normalize import (  # noqa: F401
    content_sha256,
    digest_from_revision,
    extract_gitlab_id,
    normalize_repo_url,
    purl,
    repo_id_from_url,
    strip_registry_host,
    vertex_id,
)
