"""Bucketed-table joins: the write-once-shuffle-never layout for the
persisted edge table.  Asserts the PLAN (zero Exchange on the bucketed
join; the plain join shuffles) and result identity."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from polar_spark.plans.bucketing import (
    bucketed_join_audit,
    exchange_count,
    write_bucketed,
)


@pytest.fixture()
def tmp(spark):
    d = tempfile.mkdtemp(prefix="polar_bucket_")
    yield d
    spark.sql("DROP TABLE IF EXISTS polar_bucketed_e")
    spark.sql("DROP TABLE IF EXISTS polar_bucketed_v")
    spark.sql("DROP TABLE IF EXISTS polar_bucket_solo")
    shutil.rmtree(d, ignore_errors=True)


def test_bucketed_join_is_exchange_free(spark, tmp):
    edges = spark.range(2000).select(
        (F.col("id") % 500).alias("src"), (F.col("id") % 97).alias("dst")
    )
    verts = spark.range(500).select(F.col("id"), (F.col("id") * 7).alias("rank"))
    audit = bucketed_join_audit(spark, edges, verts, buckets=8, base_path=tmp)
    assert audit["bucketed_exchanges"] == 0
    assert audit["plain_exchanges"] >= 2  # both sides shuffle
    assert audit["bucketed_rows"] == audit["plain_rows"] == 2000


def test_bucketed_join_results_identical(spark, tmp):
    edges = spark.range(300).select(
        (F.col("id") % 50).alias("src"), (F.col("id") % 13).alias("dst")
    )
    verts = spark.range(50).select(F.col("id"), (F.col("id") * 3).alias("rank"))
    et = write_bucketed(edges, "polar_bucketed_e", "src", 4, f"{tmp}/e")
    vt = write_bucketed(
        verts.withColumnRenamed("id", "src"), "polar_bucketed_v", "src", 4, f"{tmp}/v"
    )
    got = sorted(map(tuple, et.join(vt, "src").collect()))
    want = sorted(
        map(tuple, edges.join(verts.withColumnRenamed("id", "src"), "src").collect())
    )
    assert got == want


def test_bucketed_aggregate_needs_no_exchange(spark, tmp):
    # groupBy on the bucket key rides the bucketing too — the per-
    # iteration "aggregate messages by dst" shape if bucketed by dst
    df = spark.range(1000).select((F.col("id") % 64).alias("src"), F.col("id").alias("v"))
    t = write_bucketed(df, "polar_bucket_solo", "src", 8, f"{tmp}/solo")
    agg = t.groupBy("src").agg(F.sum("v").alias("s"))
    assert exchange_count(agg) == 0
    plain = df.groupBy("src").agg(F.sum("v").alias("s"))
    assert exchange_count(plain) >= 1
