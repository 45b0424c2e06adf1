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
