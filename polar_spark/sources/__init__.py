from polar_spark.sources.synthetic import (  # noqa: F401
    gen_source_table,
    expected_repo_edges,
    repo_url,
)
from polar_spark.sources.tables import load_table, load_all  # noqa: F401
