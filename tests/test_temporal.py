"""Unit semantics for the temporal joins (operators/temporal.py)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from vmware_graph_spark.operators.temporal import asof_join, range_join


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_asof_backward_latest_and_ties(spark):
    left = spark.createDataFrame(
        [("u", 1, ts("2024-01-01 10:00:00")),
         ("u", 2, ts("2024-01-01 12:00:00")),
         ("u", 3, ts("2024-01-01 08:00:00"))],
        ["k", "lid", "ts"],
    )
    right = spark.createDataFrame(
        [("u", ts("2024-01-01 09:00:00"), "a"),
         ("u", ts("2024-01-01 10:00:00"), "b"),   # tie with lid=1 → matches (<=)
         ("u", ts("2024-01-01 11:30:00"), "c")],
        ["k", "ts", "val"],
    )
    out = {
        r.lid: (r.r_val, r.r_ts)
        for r in asof_join(left, right, "k", "ts", "ts", right_cols=["val"]).collect()
    }
    assert out[1][0] == "b"            # equal timestamp included
    assert out[2][0] == "c"            # latest prior, not just any prior
    assert out[3] == (None, None)      # nothing at or before 08:00


def test_asof_key_isolation(spark):
    left = spark.createDataFrame([("a", 1, ts("2024-01-01 10:00:00"))], ["k", "lid", "ts"])
    right = spark.createDataFrame([("b", ts("2024-01-01 09:00:00"), "x")], ["k", "ts", "val"])
    row = asof_join(left, right, "k", "ts", "ts", right_cols=["val"]).collect()[0]
    assert row.r_val is None  # other key's rows never leak


def test_range_join_boundaries_and_multibin(spark):
    pts = spark.createDataFrame(
        [("u", i, ts(t)) for i, t in [
            (1, "2024-01-01 10:00:00"),   # == start: included
            (2, "2024-01-01 17:00:00"),   # == end: included
            (3, "2024-01-01 17:00:01"),   # past end: excluded
            (4, "2024-01-01 13:30:00"),   # interior, different bin than start
        ]],
        ["k", "pid", "ts"],
    )
    iv = spark.createDataFrame(
        [("u", ts("2024-01-01 10:00:00"), ts("2024-01-01 17:00:00"))],
        ["k", "s", "e"],
    )
    got = {r.pid for r in range_join(pts, iv, "k", "ts", "s", "e", bin_seconds=3600).collect()}
    assert got == {1, 2, 4}


def test_range_join_overlapping_intervals(spark):
    pts = spark.createDataFrame([("u", 1, ts("2024-01-01 12:00:00"))], ["k", "pid", "ts"])
    iv = spark.createDataFrame(
        [("u", "i1", ts("2024-01-01 11:00:00"), ts("2024-01-01 13:00:00")),
         ("u", "i2", ts("2024-01-01 11:30:00"), ts("2024-01-01 12:30:00")),
         ("u", "i3", ts("2024-01-01 13:00:00"), ts("2024-01-01 14:00:00")),
         ("u", "bad", ts("2024-01-01 14:00:00"), ts("2024-01-01 13:00:00"))],
        ["k", "iid", "s", "e"],
    )
    got = {r.iid for r in range_join(pts, iv, "k", "ts", "s", "e", bin_seconds=600).collect()}
    assert got == {"i1", "i2"}  # i3 doesn't contain, bad is degenerate


def test_range_join_plan_is_equijoin(spark):
    # The whole point: no BroadcastNestedLoopJoin / CartesianProduct.
    pts = spark.createDataFrame([("u", 1, ts("2024-01-01 12:00:00"))], ["k", "pid", "ts"])
    iv = spark.createDataFrame(
        [("u", ts("2024-01-01 11:00:00"), ts("2024-01-01 13:00:00"))], ["k", "s", "e"]
    )
    plan = range_join(pts, iv, "k", "ts", "s", "e")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_resample_grid_ffill_semantics(spark):
    """Daily-grid forward fill: null before the first event, events at
    exactly the grid instant are included (<=), latest-at-same-ts wins
    via the max-event_id dedup."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    from vmware_graph_spark.operators.temporal import asof_join

    e = spark.createDataFrame(
        [
            (1, "2024-01-02 00:00:00", 7, 10.0),
            (2, "2024-01-02 00:00:00", 7, 20.0),  # same instant, higher id wins
            (3, "2024-01-03 12:00:00", 7, 30.0),
        ],
        ["event_id", "ts_s", "user_id", "value"],
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"), "user_id", "value")
    w = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    ev = e.withColumn("rn", F.row_number().over(w)).filter("rn = 1").select(
        "user_id", "ts", "value"
    )
    grid = spark.createDataFrame(
        [(7, f"2024-01-0{d} 00:00:00") for d in (1, 2, 3, 4)], ["user_id", "g_s"]
    ).select("user_id", F.col("g_s").cast("timestamp").alias("gts"))
    got = {
        r["gts"].day: r["r_value"]
        for r in asof_join(grid, ev, "user_id", "gts", "ts", right_cols=["value"]).collect()
    }
    assert got == {1: None, 2: 20.0, 3: 20.0, 4: 30.0}


def test_incremental_topk_equals_full_recompute(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from vmware_graph_spark.operators.temporal import incremental_topk

    df = spark.createDataFrame(
        [(i, float((i * 37) % 101)) for i in range(200)], ["k", "v"]
    )
    base = df.filter("k % 3 != 0")
    delta = df.filter("k % 3 = 0")
    base_topk = base.orderBy(F.col("v").desc(), "k").limit(10)
    inc = incremental_topk(base_topk, delta, order_cols=["-v", "k"], k=10)
    w = Window.orderBy(F.col("v").desc(), "k")
    full = (
        df.orderBy(F.col("v").desc(), "k")
        .limit(10)
        .withColumn("rank", F.row_number().over(w).cast("int"))
    )
    assert sorted(map(tuple, inc.collect())) == sorted(map(tuple, full.collect()))


def test_change_intervals_compresses_runs(spark):
    from vmware_graph_spark.operators.temporal import change_intervals

    df = spark.createDataFrame(
        [
            (1, "a", 1), (1, "a", 2), (1, "b", 3), (1, "b", 4), (1, "a", 5),
            (2, "x", 1),
        ],
        ["k", "attr", "ts"],
    )
    rows = sorted(
        change_intervals(df, "k", "attr", "ts").collect(),
        key=lambda r: (r.k, r.valid_from),
    )
    assert [(r.k, r.attr, r.valid_from, r.valid_to, r.is_current) for r in rows] == [
        (1, "a", 1, 3, False),
        (1, "b", 3, 5, False),
        (1, "a", 5, None, True),  # a reappears → NEW version, not merged
        (2, "x", 1, None, True),
    ]


def test_asof_forward_earliest_and_ties(spark):
    left = spark.createDataFrame(
        [("u", 1, ts("2024-01-01 10:00:00")),
         ("u", 2, ts("2024-01-01 12:00:00")),
         ("u", 3, ts("2024-01-01 23:00:00"))],
        ["k", "lid", "ts"],
    )
    right = spark.createDataFrame(
        [("u", ts("2024-01-01 10:00:00"), "a"),   # tie with lid=1 → matches (>=)
         ("u", ts("2024-01-01 11:00:00"), "b"),
         ("u", ts("2024-01-01 13:00:00"), "c")],
        ["k", "ts", "val"],
    )
    out = {
        r.lid: (r.r_val, r.r_ts)
        for r in asof_join(
            left, right, "k", "ts", "ts", right_cols=["val"], direction="forward"
        ).collect()
    }
    assert out[1][0] == "a"            # equal timestamp included
    assert out[2][0] == "c"            # earliest following, not just any
    assert out[3] == (None, None)      # nothing at or after 23:00


def test_asof_direction_validation(spark):
    import pytest

    left = spark.createDataFrame([("a", 1, ts("2024-01-01 10:00:00"))], ["k", "lid", "ts"])
    with pytest.raises(ValueError):
        asof_join(left, left, "k", "ts", "ts", right_cols=["lid"], direction="sideways")
