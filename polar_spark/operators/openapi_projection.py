"""OpenAPI spec projection (S11 / J10 of SURVEY §2).

Parity with the openapi processor
(/root/reference/src/agents/openapi/process/src/actors.rs:217-300):
Application and Endpoint nodes, ``hasEndpoint`` match-by-property edge.

Input: specs(title, version, endpoints array<struct<path:string,
method:string, operation_id:string>>, observed_at)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def project_specs(specs: DataFrame) -> tuple[DataFrame, DataFrame]:
    apps = specs.select(
        F.lit("Application").alias("label"),
        F.col("title").alias("key"),
        F.create_map(F.lit("version"), F.col("version")).alias("props"),
        F.col("observed_at"),
    )
    ep = specs.select("title", "observed_at", F.explode("endpoints").alias("e"))
    ep_key = F.concat_ws(" ", F.col("e.method"), F.col("e.path"))
    everts = ep.select(
        F.lit("Endpoint").alias("label"),
        ep_key.alias("key"),
        F.create_map(F.lit("operationId"), F.col("e.operation_id")).alias("props"),
        F.col("observed_at"),
    )
    edges = ep.select(
        F.lit("Application").alias("src_label"),
        F.col("title").alias("src_key"),
        F.lit("Endpoint").alias("dst_label"),
        ep_key.alias("dst_key"),
        F.lit("hasEndpoint").alias("rel_type"),
        F.lit(None).cast("map<string,string>").alias("props"),
        F.col("observed_at"),
    )
    return apps.unionByName(everts), edges
