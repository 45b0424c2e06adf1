"""Stream-stream interval join: result equals the static join, window
bounds respected, state-eviction operator present in the plan."""

import os

from pyspark.sql import functions as F

from polar_spark.streaming.stream_join import EVENT_SCHEMA, attribution_join


def _write_events(spark, path, rows):
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    df.coalesce(2).write.mode("overwrite").json(path)
    return df


def _fixture_rows():
    # user 1: view at t0, purchase 10 min later (IN window) and another
    # purchase 2 h later (OUT).  user 2: purchase with no prior view
    # (view comes AFTER — violates v_ts <= p_ts).  user 3: two views
    # before one purchase -> two attributions.
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1, 12, 0, 0)

    def ts(minutes):
        return t0 + timedelta(minutes=minutes)

    views = [
        (100, 1, "view", ts(0)),
        (101, 2, "view", ts(50)),
        (102, 3, "view", ts(0)),
        (103, 3, "view", ts(30)),
    ]
    purchases = [
        (200, 1, "purchase", ts(10)),
        (201, 1, "purchase", ts(120)),
        (202, 2, "purchase", ts(40)),
        (203, 3, "purchase", ts(45)),
    ]
    return views, purchases


def test_attribution_join_matches_static(spark, tmp_path):
    views, purchases = _fixture_rows()
    vdir, pdir = str(tmp_path / "views"), str(tmp_path / "purch")
    vdf = _write_events(spark, vdir, views)
    pdf = _write_events(spark, pdir, purchases)

    got = attribution_join(spark, vdir, pdir, str(tmp_path / "wd"), window_minutes=60)
    rows = sorted(
        (r["purchase_id"], r["view_id"], r["user_id"], r["lag_sec"])
        for r in got.collect()
    )
    # static truth (same condition, batch engine)
    v = vdf.select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
    )
    p = pdf.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts")
    )
    exp = sorted(
        (r["purchase_id"], r["view_id"], r["user_id"], r["lag_sec"])
        for r in p.join(
            v,
            F.expr(
                "user_id = v_user AND v_ts <= p_ts "
                "AND p_ts <= v_ts + interval 60 minutes"
            ),
        )
        .select(
            "purchase_id",
            "view_id",
            "user_id",
            (F.unix_timestamp("p_ts") - F.unix_timestamp("v_ts")).alias("lag_sec"),
        )
        .collect()
    )
    assert rows == exp
    # semantics spot checks: in-window pair present, out-of-window and
    # view-after-purchase absent, double attribution for user 3
    assert (200, 100, 1, 600) in rows
    assert all(r[0] != 201 for r in rows), "2h-later purchase must not attribute"
    assert all(r[0] != 202 for r in rows), "view AFTER purchase must not attribute"
    assert {r[1] for r in rows if r[0] == 203} == {102, 103}


def test_stream_join_uses_bounded_state_operator(spark, tmp_path):
    """The streaming plan must run a symmetric-hash-join STATE operator
    with watermark-driven eviction — that operator IS the
    bounded-memory contract at unbounded input."""
    import json

    views, purchases = _fixture_rows()
    vdir, pdir = str(tmp_path / "v2"), str(tmp_path / "p2")
    _write_events(spark, vdir, views)
    _write_events(spark, pdir, purchases)

    progress = []
    got = attribution_join(
        spark, vdir, pdir, str(tmp_path / "wd2"), window_minutes=60,
        progress_out=progress,
    )
    assert got.count() > 0
    assert progress, "availableNow run must report progress"
    ops = [
        so
        for p in progress
        for so in json.loads(p.json).get("stateOperators", [])
    ]
    assert any(
        "symmetricHashJoin" in (o.get("operatorName") or "") for o in ops
    ), f"state operators: {[o.get('operatorName') for o in ops]}"
    # watermark advanced on both sides (eventTime map populated)
    wm = [json.loads(p.json).get("eventTime", {}) for p in progress]
    assert any("watermark" in e for e in wm)
