"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in :mod:`polar_spark.operators.analytics_queries`;
this module only adapts them to the contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: PageRank centrality of
    the customer→supplier demand graph, top-10 suppliers with names —
    the end-to-end slice of the north-star pipeline (edge-table build →
    iterative rank with dangling handling → dimension join)."""
    from pyspark.sql import functions as F

    from polar_spark.operators.analytics_queries import demand_edges
    from polar_spark.plans import pregel
    from polar_spark.sources.tables import load_table

    sf_dir = "/root/testdata/sf0.001"
    ranks, _stats = pregel.pagerank(demand_edges(spark, sf_dir), tol=1e-6, max_iter=50)
    supplier = load_table(spark, "supplier", sf_dir)
    return (
        ranks.join(supplier, ranks.id == supplier.s_suppkey)
        .select("s_suppkey", "s_name", F.round("rank", 7).alias("pagerank"))
        .orderBy(F.desc("pagerank"), F.asc("s_suppkey"))
        .limit(10)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family from SURVEY.md §2."""
    from polar_spark.operators.analytics_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (same column names/types)."""
    from polar_spark.operators.analytics_queries import ORACLES

    return dict(ORACLES)
