"""Structured Streaming tests: stream results must match the batch twins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vmware_graph_spark.sources.tables import load_table
from vmware_graph_spark.streaming import (
    dedup_within_watermark,
    read_event_stream,
    run_available_to_memory,
    sessionize_stream,
    windowed_event_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def event_dir(spark, tmp_path_factory):
    """Events re-written as 3 parquet files (µs timestamps) so the file
    source produces multiple micro-batches."""
    path = str(tmp_path_factory.mktemp("events_stream"))
    load_table(spark, SF, "events").repartition(3).write.mode("overwrite").parquet(path)
    return path


def test_windowed_counts_match_batch(spark, event_dir):
    stream = windowed_event_counts(read_event_stream(spark, event_dir), window="1 hour")
    run_available_to_memory(stream, "win_counts", output_mode="complete")
    got = {
        (r.window_start, r.event_type): (r.n, round(r.sum_value, 6))
        for r in spark.table("win_counts").collect()
    }
    batch = (
        spark.read.parquet(event_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    )
    want = {(r.w.start, r.event_type): (r.n, round(r.s, 6)) for r in batch}
    assert got == want


def test_dedup_within_watermark(spark, event_dir, tmp_path):
    dup_dir = str(tmp_path / "dup")
    df = spark.read.parquet(event_dir)
    df.unionByName(df.limit(200)).repartition(2).write.parquet(dup_dir)
    stream = dedup_within_watermark(read_event_stream(spark, dup_dir), watermark="24 hours")
    run_available_to_memory(stream, "dedup_events")
    assert spark.table("dedup_events").select("event_id").distinct().count() == spark.table(
        "dedup_events"
    ).count()
    assert spark.table("dedup_events").count() == df.select("event_id").distinct().count()


def test_sessionize_stream_matches_batch(spark, tmp_path):
    """The stateful sessionizer's final per-user counts must equal the
    batch gaps-and-islands computation."""
    rows = [
        (1, "2024-01-01 10:00:00"), (1, "2024-01-01 10:10:00"),  # session 1
        (1, "2024-01-01 12:00:00"),  # gap > 30 min → session 2
        (2, "2024-01-01 09:00:00"),  # session 1
        (2, "2024-01-02 09:00:00"), (2, "2024-01-02 09:29:00"),  # session 2
    ]
    df = spark.createDataFrame(
        [(i, u, t, "click", 1.0, "{}") for i, (u, t) in enumerate(rows)],
        "event_id long, user_id long, ts string, event_type string, value double, props string",
    ).select("event_id", F.col("ts").cast("timestamp").alias("ts"), "user_id", "event_type", "value", "props")
    path = str(tmp_path / "sess")
    df.coalesce(1).write.parquet(path)

    stream = sessionize_stream(read_event_stream(spark, path), gap_seconds=1800)
    run_available_to_memory(stream, "sessions", output_mode="update")
    out = spark.table("sessions")
    # update mode can emit several rows per user: the final state is the
    # one with the highest event count
    final = {
        r.user_id: r.n_sessions
        for r in out.withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
                    "user_id"
                ).orderBy(F.col("n_events").desc())
            ),
        )
        .filter(F.col("rn") == 1)
        .collect()
    }
    assert final == {1: 2, 2: 2}


def test_interval_join_stream_matches_batch(spark, event_dir):
    """Stream-stream click↔view interval join must equal the batch
    inequality join over the same inputs."""
    from vmware_graph_spark.streaming import interval_join_stream

    def clicks(df):
        return df.filter(F.col("event_type") == "click").select(
            "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
        )

    def views(df):
        return df.filter(F.col("event_type") == "view").select(
            F.col("user_id").alias("user_id"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )

    joined = interval_join_stream(
        clicks(read_event_stream(spark, event_dir)),
        views(read_event_stream(spark, event_dir)),
        "user_id",
        "click_ts",
        "view_ts",
        max_delay_seconds=1800,
        # The fixture files are NOT time-ordered, so every micro-batch
        # contains rows 'late' w.r.t. the watermark the previous batch
        # advanced to. A watermark covering the full 30-day span keeps
        # the comparison to the batch twin exact; production would rely
        # on roughly-ordered arrival and use a tight horizon.
        watermark="960 hours",
    )
    run_available_to_memory(joined, "cv_join")
    got = {
        (r.click_id, r.view_id) for r in spark.table("cv_join").collect()
    }

    b = spark.read.parquet(event_dir)
    bc, bv = clicks(b), views(b)
    batch = bc.join(
        bv,
        (bc.user_id == bv.user_id)
        & (bv.view_ts <= bc.click_ts)
        & (bv.view_ts >= bc.click_ts - F.expr("INTERVAL 1800 SECONDS")),
    )
    want = {(r.click_id, r.view_id) for r in batch.collect()}
    assert got == want and len(want) > 0


def test_stream_merge_into_incremental_table(spark, event_dir, tmp_path):
    """Streaming CDC refresh: micro-batches MERGE INTO the
    tenant-partitioned incremental table; the drained table equals the
    batch content, and a later correction batch wins on its keys."""
    from vmware_graph_spark.store.incremental import IncrementalTable
    from vmware_graph_spark.streaming import read_event_stream, stream_merge_into

    table = IncrementalTable(
        spark, str(tmp_path / "tbl"), ["event_id"], tenant_col="event_type"
    )
    stream = read_event_stream(spark, event_dir).select(
        "event_id", "event_type", "user_id", "value"
    )
    stream_merge_into(stream, table, str(tmp_path / "ckpt"))

    batch = spark.read.parquet(event_dir).select(
        "event_id", "event_type", "user_id", "value"
    )
    # partitionBy moves the tenant column to the end on read-back;
    # exceptAll is positional, so re-project to the batch column order.
    got = table.read().select("event_id", "event_type", "user_id", "value")
    assert got.count() == batch.count()
    assert got.exceptAll(batch).isEmpty()

    # Correction feed: new values for 10 clicks — update must win.
    fixes = (
        batch.filter(F.col("event_type") == "click")
        .limit(10)
        .withColumn("value", F.lit(-1.0))
    )
    fix_dir = str(tmp_path / "fixes")
    fixes.coalesce(1).write.parquet(fix_dir)
    stream_merge_into(
        read_event_stream_projected(spark, fix_dir), table, str(tmp_path / "ckpt2")
    )
    assert table.read().filter(F.col("value") == -1.0).count() == 10
    assert table.read().count() == batch.count()


def read_event_stream_projected(spark, path):
    from vmware_graph_spark.streaming import read_event_stream

    return (
        spark.readStream.schema("event_id bigint, event_type string, user_id bigint, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def test_stream_static_enrich_broadcasts_dim_and_drops_unmatched(spark, tmp_path):
    from vmware_graph_spark.streaming.events import (
        read_event_stream,
        run_available_to_memory,
        stream_static_enrich,
    )
    from pyspark.sql import functions as F
    import uuid

    ev = spark.createDataFrame(
        [(1, "2024-01-01 00:00:01", 7, "click", 1.0, "{}"),
         (2, "2024-01-01 00:00:02", 8, "view", 2.0, "{}")],
        "event_id long, ts_s string, user_id long, event_type string, value double, props string",
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"),
             "user_id", "event_type", "value", "props")
    p = str(tmp_path / "ev")
    ev.write.parquet(p)
    dim = spark.createDataFrame([(7, "gold")], ["user_id", "segment"])
    out = stream_static_enrich(read_event_stream(spark, p), dim, "user_id")
    name = "t_enrich_" + uuid.uuid4().hex[:8]
    run_available_to_memory(out, name)
    rows = spark.table(name).select("event_id", "segment").collect()
    # inner join: user 8 (no dim row) dropped; user 7 enriched.
    assert [(r["event_id"], r["segment"]) for r in rows] == [(1, "gold")]
