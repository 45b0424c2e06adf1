"""Count-min sketch + skew report (operators/sketches.py).

Properties: never underestimates, overestimate within the ε·N bound,
cell table bounded by depth·width, halves merge to the whole sketch,
the estimate join broadcasts (probe side never shuffles the sketch),
and the heavy-hitter ranking finds the true heavy keys.
"""

import pytest
from pyspark.sql import functions as F

from polar_spark.operators.sketches import (
    cm_estimate,
    cm_heavy_hitters,
    cm_merge,
    cm_sketch,
    skew_report,
)

DEPTH, WIDTH, SEED = 4, 256, 3


@pytest.fixture(scope="module")
def stream(spark):
    # Zipf-ish: key k appears ~ (200 // (k+1)) times → key 0 is heavy
    rows = [(k,) for k in range(50) for _ in range(200 // (k + 1))]
    return spark.createDataFrame(rows, "key long")


def test_never_underestimates_and_bounded(stream):
    sk = cm_sketch(stream, "key", DEPTH, WIDTH, SEED)
    keys = stream.select("key").distinct()
    est = {
        r["key"]: r["est"]
        for r in cm_estimate(sk, keys, "key", DEPTH, WIDTH, SEED).collect()
    }
    true = {
        r["key"]: r["n"]
        for r in stream.groupBy("key").agg(F.count("*").alias("n")).collect()
    }
    n_total = stream.count()
    assert set(est) == set(true)
    for k in true:
        assert est[k] >= true[k], f"underestimate at {k}"
        # ε = e/width; allow 3x slack on the probabilistic bound
        assert est[k] - true[k] <= 3 * 2.72 * n_total / WIDTH + 1


def test_cell_table_bounded_and_merge_equals_whole(stream, spark):
    sk = cm_sketch(stream, "key", DEPTH, WIDTH, SEED)
    assert sk.count() <= DEPTH * WIDTH
    a = stream.where(F.col("key") % 2 == 0)
    b = stream.where(F.col("key") % 2 == 1)
    merged = cm_merge(
        cm_sketch(a, "key", DEPTH, WIDTH, SEED), cm_sketch(b, "key", DEPTH, WIDTH, SEED)
    )
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, sk.collect()))


def test_estimate_plan_broadcasts_sketch(stream):
    sk = cm_sketch(stream, "key", DEPTH, WIDTH, SEED)
    est = cm_estimate(sk, stream.select("key").distinct(), "key", DEPTH, WIDTH, SEED)
    plan = est._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_heavy_hitters_find_true_heavies(stream):
    top = [r["key"] for r in cm_heavy_hitters(stream, "key", k=5, depth=DEPTH, width=WIDTH, seed=SEED).collect()]
    # the 3 truly heaviest keys (200, 100, 66 occurrences) must surface
    assert set(top[:3]) >= {0, 1}
    assert 0 in top and 1 in top and 2 in top


def test_skew_report_matches_exact_counts(stream):
    got = skew_report(stream, "key", top=3).collect()
    assert [r["key"] for r in got] == [0, 1, 2]
    total = stream.count()
    assert got[0]["n"] == 200
    assert got[0]["share_ppm"] == 200 * 1_000_000 // total


# --------------------------------------------------------------------------
# Bloom-filter runtime join pruning


def test_bloom_no_false_negatives(spark):
    from polar_spark.operators.sketches import bloom_build, bloom_masks, bloom_member

    members = spark.createDataFrame([(k * 7 + 3,) for k in range(200)], "key long")
    masks = bloom_masks(bloom_build(members, "key", num_words=16, k=3, seed=5), 16)
    # every true member must pass the filter
    passed = members.where(bloom_member(F.col("key"), masks, k=3, seed=5)).count()
    assert passed == 200


def test_bloom_semi_join_equals_exact(spark):
    from polar_spark.operators.sketches import bloom_semi_join

    probe = spark.createDataFrame([(k,) for k in range(1000)], "key long")
    build = spark.createDataFrame([(k * 13,) for k in range(40)], "bkey long")
    got = sorted(r["key"] for r in bloom_semi_join(probe, build, "key", "bkey", 16, 3, 5).collect())
    want = sorted(
        r["key"]
        for r in probe.join(
            build.select(F.col("bkey").alias("key")).distinct(), "key", "left_semi"
        ).collect()
    )
    assert got == want


def test_bloom_prune_is_map_stage(spark):
    """The probe-side bloom filter is a pure map expression — no
    shuffle, no Python eval — so at scale it prunes BEFORE the exact
    join's exchange."""
    from polar_spark.operators.sketches import bloom_build, bloom_masks, bloom_member

    build = spark.createDataFrame([(k * 13,) for k in range(40)], "bkey long")
    masks = bloom_masks(bloom_build(build, "bkey", 16, 3, 5), 16)
    probe = spark.range(1000).select(F.col("id").alias("key"))
    pruned = probe.where(bloom_member(F.col("key"), masks, 3, 5))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_bloom_masks_merge_by_or(spark):
    """Filters built on shards OR-merge to the whole-set filter — the
    mergeability that makes the build side shard/stream-friendly."""
    from polar_spark.operators.sketches import bloom_build, bloom_masks

    whole = spark.createDataFrame([(k,) for k in range(100)], "key long")
    a = whole.where(F.col("key") < 50)
    b = whole.where(F.col("key") >= 50)
    mw = bloom_masks(bloom_build(whole, "key", 16, 3, 5), 16)
    ma = bloom_masks(bloom_build(a, "key", 16, 3, 5), 16)
    mb = bloom_masks(bloom_build(b, "key", 16, 3, 5), 16)
    assert [x | y for x, y in zip(ma, mb)] == mw


# --------------------------------------------------------------------------
# Flajolet-Martin per-group distinct estimation


def test_fm_distinct_tracks_exact(spark):
    from polar_spark.operators.sketches import fm_distinct

    # group g has (g+1)*20 distinct keys, each duplicated 3x
    rows = [
        (g, k + g * 10_000)
        for g in range(4)
        for k in range((g + 1) * 20)
        for _ in range(3)
    ]
    df = spark.createDataFrame(rows, "g long, key long")
    est = {r["g"]: r["est"] for r in fm_distinct(df, "g", "key", replicas=16, seed=1).collect()}
    for g in range(4):
        exact = (g + 1) * 20
        # FM with 16 replicas: stddev ~ 1.1/sqrt(16) ≈ 28% — allow 2σ
        assert exact * 0.4 <= est[g] <= exact * 2.5, (g, exact, est[g])


def test_fm_distinct_ignores_duplicates(spark):
    """Registers OR idempotently: duplicating every row must not move
    the estimate at all (the property exact COUNT(DISTINCT) pays a full
    key shuffle for)."""
    from polar_spark.operators.sketches import fm_distinct

    base = spark.createDataFrame([(0, k) for k in range(100)], "g long, key long")
    doubled = base.unionByName(base).unionByName(base)
    e1 = fm_distinct(base, "g", "key").collect()[0]["est"]
    e2 = fm_distinct(doubled, "g", "key").collect()[0]["est"]
    assert e1 == e2


def test_fm_distinct_is_single_aggregation(spark):
    from polar_spark.operators.sketches import fm_distinct

    df = spark.createDataFrame([(0, k) for k in range(100)], "g long, key long")
    plan = fm_distinct(df, "g", "key")._jdf.queryExecution().executedPlan().toString()
    # one hash-aggregate pair (partial + final) over ONE exchange
    assert plan.count("Exchange") == 1
    assert "EvalPython" not in plan


# --------------------------------------------------------------------------
# log2-histogram quantiles


def test_log_hist_quantiles_bucket_bound(spark):
    """Estimate must land in the same log2 bucket as the true
    quantile — the sketch's error contract."""
    import math

    vals = sorted(v * 37 % 10_000 + 1 for v in range(2_000))
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v long")
    from polar_spark.operators.sketches import log_hist_quantiles

    got = {r["q"]: r["est"] for r in log_hist_quantiles(df, "v", "g", [0.5, 0.9, 0.99]).collect()}
    for q in (0.5, 0.9, 0.99):
        true = vals[math.ceil(q * len(vals)) - 1]
        b = int(math.floor(math.log2(true)))
        assert 2**b <= got[q] < 2 ** (b + 1), (q, true, got[q])


def test_log_hist_merges_across_shards(spark):
    """Quantiles of the union == quantiles from summed shard
    histograms (trivially true here because the operator IS one
    aggregation — asserted by splitting the input)."""
    from polar_spark.operators.sketches import log_hist_quantiles

    df = spark.createDataFrame([("g", v + 1) for v in range(1_000)], "g string, v long")
    whole = sorted(map(tuple, log_hist_quantiles(df, "v", "g", [0.5, 0.9]).collect()))
    shards = df.where("v % 2 = 0").unionByName(df.where("v % 2 = 1"))
    again = sorted(map(tuple, log_hist_quantiles(shards, "v", "g", [0.5, 0.9]).collect()))
    assert whole == again
