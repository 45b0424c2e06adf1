"""Deterministic sampling / split assignment (operators/sampling.py).

Properties under test: total coverage + disjointness of splits, weight
validation, per-stratum fraction accuracy, determinism across
partitionings (the reproducibility contract), and the no-shuffle plan
shape (selection must stay a pure map stage so it scales for free).
"""

import pytest
from pyspark.sql import functions as F

from polar_spark.operators.sampling import (
    BUCKETS,
    hash_bucket,
    split_assign,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(0, 5000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 4).cast("string")).alias("source"),
    )


def test_split_covers_every_row_disjointly(docs):
    out = split_assign(docs, [("train", 0.9), ("val", 0.05), ("test", 0.05)], seed=11)
    assert out.count() == 5000
    # every row gets exactly one split label, and proportions are within
    # the hash-uniformity tolerance of the requested weights
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 5000 - 0.9) < 0.03
    assert abs(counts["val"] / 5000 - 0.05) < 0.02
    assert abs(counts["test"] / 5000 - 0.05) < 0.02


def test_split_weights_must_sum_to_one(docs):
    with pytest.raises(ValueError, match="sum to 1"):
        split_assign(docs, [("a", 0.5), ("b", 0.3)])


def test_split_deterministic_across_partitionings(docs):
    a = split_assign(docs, [("train", 0.8), ("heldout", 0.2)], seed=7)
    b = split_assign(docs.repartition(13), [("train", 0.8), ("heldout", 0.2)], seed=7)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_split_seed_changes_assignment(docs):
    a = split_assign(docs, [("train", 0.5), ("test", 0.5)], seed=1)
    b = split_assign(docs, [("train", 0.5), ("test", 0.5)], seed=2)
    moved = a.alias("a").join(b.alias("b"), "doc_id").where(
        F.col("a.split") != F.col("b.split")
    )
    assert moved.count() > 0


def test_stratified_fractions_per_stratum(docs):
    out = stratified_sample(
        docs, {"src0": 1.0, "src1": 0.5, "src2": 0.0}, seed=23, default_fraction=0.1
    )
    got = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert got.get("src0") == 1250          # keep-all stratum is exact
    assert "src2" not in got                # zero-fraction stratum drops out
    assert abs(got["src1"] / 1250 - 0.5) < 0.06
    assert abs(got.get("src3", 0) / 1250 - 0.1) < 0.05   # default fraction


def test_stratified_is_subset_and_idempotent(docs):
    out = stratified_sample(docs, {"src0": 0.25}, seed=5)
    ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    again = {r["doc_id"] for r in stratified_sample(docs, {"src0": 0.25}, seed=5).select("doc_id").collect()}
    assert ids == again
    assert ids <= {r["doc_id"] for r in docs.select("doc_id").collect()}


def test_bucket_range_and_no_shuffle_plan(docs):
    b = docs.select(hash_bucket(F.col("doc_id"), seed=3).alias("b"))
    mn, mx = b.agg(F.min("b"), F.max("b")).first()
    assert 0 <= mn and mx < BUCKETS
    # selection is a pure map stage: no Exchange in the physical plan
    plan = stratified_sample(docs, {"src0": 0.5})._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_weighted_bernoulli_rate_tracks_weight(spark):
    from polar_spark.operators.sampling import BUCKETS, hash_bucket, weighted_bernoulli

    df = spark.range(0, 4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, F.lit(500)).otherwise(F.lit(1500)).alias("w"),
    )
    kept = weighted_bernoulli(df, "w", 2000, id_col="doc_id", seed=7)
    lo = kept.where(F.col("w") == 500).count() / 2000
    hi = kept.where(F.col("w") == 1500).count() / 2000
    assert abs(lo - 0.25) < 0.05 and abs(hi - 0.75) < 0.05
    # deterministic: second run identical membership
    again = weighted_bernoulli(df, "w", 2000, id_col="doc_id", seed=7)
    assert kept.exceptAll(again).count() == 0 and again.exceptAll(kept).count() == 0
    # weight >= cap keeps everything
    full = weighted_bernoulli(
        df.withColumn("w", F.lit(2000)), "w", 2000, id_col="doc_id", seed=7
    )
    assert full.count() == 4000
    # the coin is the shared hash_bucket
    b = df.select(hash_bucket(F.col("doc_id"), 7).alias("b")).agg(F.max("b")).head()[0]
    assert b < BUCKETS
