"""Bucketed-table layout: shuffle-free joins for the persisted edge
table.

The north rule's edge table is re-joined on its key by every iterative
operator (PageRank, CC, LPA join ranks/labels back to edges each
round).  Persisting it BUCKETED by that key (``DataFrameWriter
.bucketBy(n, key).sortBy(key)``) makes Spark's scan report the hash
partitioning, so a join between two tables bucketed the same way needs
NO Exchange on either side — the 100-TB equivalent of "pay the shuffle
once at write time, never again at read time".  This is the
catalog-table analog of what ``pregel`` does in-session with
``repartition`` + ``localCheckpoint``.

Sandbox substitution note (same seam discipline as
``store_backend.IcebergBackend``): with Iceberg jars this is
``write.partitionedBy(bucket(n, key))`` + storage-partitioned joins;
the session-catalog parquet bucketing used here has identical join-time
semantics and is executable in this env.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int,
    path: str,
    sort: bool = True,
) -> DataFrame:
    """Persist ``df`` as a bucketed (and optionally sort-bucketed)
    session-catalog parquet table at ``path`` and return the re-read
    table.  Joins between tables bucketed by the same key and bucket
    count are exchange-free; ``sort=True`` additionally removes the
    per-task Sort under sort-merge joins."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    w = (
        df.write.format("parquet")
        .mode("overwrite")
        .option("path", path)
        .bucketBy(buckets, key)
    )
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)
    return spark.table(table)


def exchange_count(df: DataFrame) -> int:
    """Number of SHUFFLE Exchange operators in the executed plan.

    BroadcastExchange is excluded (dimension replication, not the
    data-sized shuffle bucketing removes).  Lines inside an
    ``InMemoryRelation`` dump are excluded too: a cached leaf prints
    its STORED build plan (with that plan's exchanges, once per AQE
    initial/final section) as part of the scan's tree text — those
    shuffles already ran at cache time and are not part of this query.
    """
    plan = df._jdf.queryExecution().executedPlan().toString()

    def indent(line: str) -> int:
        i = 0
        while i < len(line) and line[i] in " :+-*(|=":
            i += 1
        return i

    count = 0
    imr_indent: int | None = None
    for line in plan.splitlines():
        body = line.strip()
        if not body:
            continue
        ind = indent(line)
        if imr_indent is not None:
            if ind > imr_indent:
                continue  # still inside the cached-relation dump
            imr_indent = None
        if "InMemoryRelation" in line:
            imr_indent = ind
            continue
        if any(
            f"Exchange {kind}" in line
            for kind in ("hashpartitioning", "rangepartitioning", "SinglePartition")
        ):
            count += 1
    return count


def bucketed_join_audit(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame,
    buckets: int,
    base_path: str,
    table_prefix: str = "polar_bucketed",
) -> dict:
    """Write edges (bucketed by src) and vertices (bucketed by id),
    then compare the executed plans of the per-iteration join shape
    ``edges ⨝ vertices ON src = id`` over bucketed vs plain inputs.
    Returns exchange counts + row counts (identical results asserted
    by the caller/tests).  The bucketed join should show ZERO
    exchanges; the plain join shuffles both sides."""
    et, vt = f"{table_prefix}_e", f"{table_prefix}_v"
    be = write_bucketed(edges, et, "src", buckets, f"{base_path}/{et}")
    bv = write_bucketed(
        vertices.withColumnRenamed("id", "src"), vt, "src", buckets, f"{base_path}/{vt}"
    )
    bucketed = be.join(bv, "src")
    plain = edges.join(vertices.withColumnRenamed("id", "src"), "src")
    # pin sort-merge for the audit: at fixture scale the planner would
    # broadcast BOTH variants and hide the shuffle the audit measures
    # (at edge-table scale neither side is broadcastable)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = {
            "bucketed_exchanges": exchange_count(bucketed),
            "plain_exchanges": exchange_count(plain),
            "bucketed_rows": bucketed.count(),
            "plain_rows": plain.count(),
        }
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    return out
