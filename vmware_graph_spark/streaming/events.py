"""Structured Streaming over the events table (SURVEY §2.11 streaming).

The reference is batch-only; these are the north-star streaming
extensions: watermarked tumbling/sliding windows, exactly-once dedup
within the watermark, and a custom stateful sessionizer via
``applyInPandasWithState`` — the one genuinely stateful operator we
take on (SURVEY §7 hard parts).

All operators take/return streaming DataFrames; tests drive them with
the parquet file source + ``availableNow`` and assert against the batch
twins in ``queries.py``, so stream and batch semantics stay locked.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)

# State-store parallelism for stream drains. A stateful streaming
# operator creates ONE state store per shuffle partition per operator,
# and every micro-batch pays each store's snapshot/commit I/O — with
# the batch default (cores, e.g. 32 locally) the per-trigger fixed cost
# dwarfs the data work for fixture-scale drains (measured 21→14 s on
# streaming_left_interval_join at 4 vs 16 partitions, identical rows).
# Partition count never changes WHAT a drain emits (grouping, watermark
# advancement and join matching are partitioning-independent); it only
# sizes the state layout, which should track key cardinality and
# arrival rate, not the batch shuffle width. Production streams size it
# via SPARK_GRAFT_STREAM_PARTITIONS (or keep their own session conf —
# the scope below only ever LOWERS toward the target, never raises).
STREAM_PARTITIONS_ENV = "SPARK_GRAFT_STREAM_PARTITIONS"


class drain_partitions:
    """Context manager: scope ``spark.sql.shuffle.partitions`` down to
    the stream-drain target around a ``start()``+``awaitTermination()``
    block, restoring the caller's value afterwards (exception-safe).
    The conf is captured by the streaming query AT START, so the scope
    must enclose ``start()``."""

    def __init__(self, spark: SparkSession):
        self._spark = spark
        self._saved: str | None = None

    def __enter__(self):
        cur = int(self._spark.conf.get("spark.sql.shuffle.partitions"))
        want = int(os.environ.get(STREAM_PARTITIONS_ENV, "4"))
        if 0 < want < cur:
            self._saved = str(cur)
            self._spark.conf.set("spark.sql.shuffle.partitions", str(want))
        return self

    def __exit__(self, *exc):
        if self._saved is not None:
            self._spark.conf.set("spark.sql.shuffle.partitions", self._saved)
        return False


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over an events parquet directory. One file per
    micro-batch keeps tests deterministic; production would swap in a
    Kafka source with the same downstream schema."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def windowed_event_counts(
    events: DataFrame,
    *,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    exact_sums: bool = False,
) -> DataFrame:
    """Watermarked tumbling/sliding window counts per event type.

    Late rows beyond the watermark are dropped; state for closed
    windows is evicted — bounded state at any scale. ``exact_sums``
    accumulates in decimal (order-independent, engine-reproducible —
    the queries.py determinism contract) instead of raw double.
    """
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    sum_expr = (
        F.sum(F.round("value", 4).cast("decimal(18,4)")).cast("double")
        if exact_sums
        else F.sum("value")
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(w.alias("w"), "event_type")
        .agg(F.count("*").alias("n"), sum_expr.alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def stream_static_enrich(stream: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream-static equi-join (the enrichment pattern): each
    micro-batch joins against the static dimension — Spark re-plans the
    static side per batch, so a dim refreshed on disk is picked up
    without restarting the stream. The dim is broadcast (dimension
    tables are broadcast-sized by definition here); the stream side
    never shuffles for the join, keeping per-batch latency flat at any
    corpus scale. Inner join: unmatched stream rows are dropped
    (reference J1 inner-join semantics)."""
    return stream.join(F.broadcast(dim), on, "inner")


def dedup_within_watermark(events: DataFrame, *, watermark: str = "2 hours") -> DataFrame:
    """Exactly-once event delivery: drop duplicate event_ids arriving
    within the watermark horizon (CDC-style refresh dedup). State size
    is bounded by the watermark — the unbounded-keys pitfall of plain
    dropDuplicates on a stream."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


_SESSION_STATE = StructType(
    [
        StructField("session_count", IntegerType()),
        StructField("last_ts_ms", LongType()),
        StructField("event_count", LongType()),
    ]
)
_SESSION_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_sessions", IntegerType()),
        StructField("n_events", LongType()),
        StructField("last_ts", TimestampType()),
    ]
)


def sessionize_stream(events: DataFrame, *, gap_seconds: int = 1800) -> DataFrame:
    """Custom stateful operator: per-user session counting with an
    inactivity gap, via applyInPandasWithState (update mode).

    State per user = (sessions so far, last event time, events so far);
    a batch's events are sorted by event time and extend or break the
    current session. Emits the running totals each update.
    """
    gap_ms = gap_seconds * 1000

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            sessions, last_ms, total = state.get
        else:
            sessions, last_ms, total = 0, None, 0
        ts_ms: list[int] = []
        for pdf in pdfs:
            ts_ms.extend(int(t.value // 1_000_000) for t in pd.to_datetime(pdf["ts"]))
        ts_ms.sort()
        for t in ts_ms:
            if last_ms is None or t - last_ms > gap_ms:
                sessions += 1
            last_ms = t
            total += 1
        state.update((sessions, last_ms, total))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_sessions": [sessions],
                "n_events": [total],
                "last_ts": [pd.Timestamp(last_ms, unit="ms")],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn, _SESSION_OUT, _SESSION_STATE, "update", GroupStateTimeout.NoTimeout
    )


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    *,
    max_delay_seconds: int = 3600,
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner interval join: each left event pairs with the
    right events of the same key in ``[left_ts - max_delay, left_ts]``.

    Both sides carry a watermark AND the join condition bounds
    right_ts relative to left_ts — the two things Structured Streaming
    needs to evict join state (without the time bound, state grows
    forever). Column names must be disjoint apart from ``on``.
    """
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    cond = (
        (l[on] == r[on])
        & (r[right_ts] <= l[left_ts])
        & (r[right_ts] >= l[left_ts] - F.expr(f"INTERVAL {max_delay_seconds} SECONDS"))
    )
    return l.join(r, cond).drop(r[on])


def stream_merge_into(
    sdf: DataFrame,
    table,
    checkpoint_dir: str,
    *,
    delete_missing: bool = False,
) -> None:
    """CDC-style streaming refresh: drain the change stream into an
    ``store.incremental.IncrementalTable`` via ``foreachBatch`` — each
    micro-batch is one tenant-scoped MERGE INTO (upsert + optional
    not-matched-by-source sweep), giving the reference's refresh
    protocol a continuous-arrival form. The checkpoint directory makes
    delivery exactly-once across restarts; the merge itself is
    idempotent per batch (last-writer-wins on the natural key), so
    replays converge."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        table.merge(batch_df, delete_missing=delete_missing)

    with drain_partitions(sdf.sparkSession):
        q = (
            sdf.writeStream.foreachBatch(handle)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


def stream_windowed_counts_phased(
    spark: SparkSession,
    arrival_files: list[str],
    stream_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> list[Any]:
    """Watermarked windowed counts where each ``arrival_files`` entry
    lands in its OWN ``availableNow`` drain against one shared
    checkpoint + append file sink — the restart-driven shape that makes
    late-data DROPS actually observable.

    Within a single availableNow run Spark's watermark advances with a
    one-batch lag and state eviction runs at batch end, so a late file
    in the same run still merges into live window state and nothing
    drops. Across runs the checkpointed watermark is already in force
    when the late file's batch starts: its rows targeting
    already-finalized (evicted + emitted) windows are discarded —
    visible as ``numRowsDroppedByWatermark`` in each query's progress
    — which is exactly how a production restart ingests a delayed
    upstream backfill. Returns the completed StreamingQuery handles so
    callers can assert on those metrics; the emitted result parquet in
    ``out_dir`` holds only windows finalized by the checkpointed
    watermark, each counting only its on-time rows."""
    import shutil

    done = []
    for i, f in enumerate(arrival_files):
        shutil.copy(f, os.path.join(stream_dir, f"arrival-{i}.parquet"))
        sdf = windowed_event_counts(
            read_event_stream(spark, stream_dir), window=window, watermark=watermark
        ).select("window_start", "event_type", "n")
        with drain_partitions(sdf.sparkSession):
            q = (
                sdf.writeStream.format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", checkpoint_dir)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        done.append(q)
    return done


def run_available_to_memory(sdf: DataFrame, name: str, *, output_mode: str = "append") -> None:
    """Drain all available input through the streaming query into a
    memory sink table ``name`` (test/driver harness helper)."""
    with drain_partitions(sdf.sparkSession):
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


def stream_dedup_against(
    sdf: DataFrame,
    ref: DataFrame,
    id_col: str,
    text_col: str,
    out_dir: str,
    checkpoint_dir: str,
    **dedup_kw: Any,
) -> None:
    """Continuous-arrival corpus dedup: drain a stream of NEW documents
    through ``operators.dedup.dedup_against`` the STATIC reference
    corpus, one micro-batch at a time, appending per-document decisions
    (exact_dup / near_dup / kept) to ``out_dir``.

    Because every decision depends only on the single new document vs
    the reference — never on other new arrivals — the union of
    micro-batch outputs is EXACTLY the full-batch result regardless of
    how arrivals split into batches (the property the oracle twin
    checks). The checkpoint makes delivery exactly-once across
    restarts. The reference's fingerprints/signatures are derived and
    persisted ONCE, outside the trigger loop
    (``prepare_dedup_reference``) and reused every batch, so per-batch
    cost follows the batch; each batch's OWN pins are reclaimed at the
    batch boundary (``release_pins`` — DISK_ONLY blocks are never
    LRU-evicted, so an always-on stream would otherwise accumulate one
    batch of blocks per trigger, round-8 ADVICE), which cannot touch
    the caller-owned reference artifacts."""
    from vmware_graph_spark.operators.dedup import (
        dedup_against_prepared,
        prepare_dedup_reference,
        release_dedup_reference,
    )
    from vmware_graph_spark.operators.pin import release_pins

    verify_kw = {
        k: v for k, v in dedup_kw.items() if k == "verify_threshold"
    }
    prep_kw = {k: v for k, v in dedup_kw.items() if k != "verify_threshold"}
    prepared = prepare_dedup_reference(ref, id_col, text_col, **prep_kw)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        dedup_against_prepared(
            batch_df, prepared, id_col, text_col, **verify_kw
        ).write.mode("append").parquet(out_dir)
        release_pins()

    with drain_partitions(sdf.sparkSession):
        q = (
            sdf.writeStream.foreachBatch(handle)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
        finally:
            release_dedup_reference(prepared)


def stream_cms_heavy_hitters(
    sdf: DataFrame,
    value_expr,
    out_dir: str,
    checkpoint_dir: str,
    *,
    width: int = 64,
    depth: int = 4,
) -> None:
    """Mergeable-sketch streaming aggregation: each micro-batch folds
    its rows into a CMS PARTIAL — ≤ depth·width counter cells plus the
    batch's distinct probe triples — and appends the partials, never
    raw rows. CMS cells merge by plain addition, so summing the
    partials afterwards reconstructs EXACTLY the sketch a single batch
    pass would build (the property the oracle twin checks); state per
    batch is O(depth·width + distinct values), independent of batch row
    count. This is the streaming form every mergeable sketch here
    (KMV, CMS) supports by construction — on a cluster the partials
    land in a compacted table and a reader merges on demand."""
    from vmware_graph_spark.functions.sketch import cms_hashed

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        hashed = cms_hashed(
            batch_df.select(value_expr.alias("__val")), "__val",
            width=width, depth=depth,
        )
        hashed.groupBy("__i", "__b").agg(F.count("*").alias("__c")).write.mode(
            "append"
        ).parquet(out_dir + "/counters")
        hashed.select("__v", "__i", "__b").distinct().write.mode("append").parquet(
            out_dir + "/probes"
        )

    with drain_partitions(sdf.sparkSession):
        q = (
            sdf.writeStream.foreachBatch(handle)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


def cms_merge_estimates(
    spark: SparkSession, out_dir: str, *, min_count: int = 1
) -> DataFrame:
    """Merge drained CMS partials (exact cell-wise sum) and estimate:
    (value, est) for every probed value with estimate ≥ min_count —
    identical to the single-pass batch sketch over the same rows."""
    counters = (
        spark.read.parquet(out_dir + "/counters")
        .groupBy("__i", "__b")
        .agg(F.sum("__c").alias("__c"))
    )
    probes = spark.read.parquet(out_dir + "/probes").distinct()
    return (
        probes.join(counters, ["__i", "__b"])
        .groupBy("__v")
        .agg(F.min("__c").alias("est"))
        .filter(F.col("est") >= min_count)
        .select(F.col("__v").alias("value"), "est")
    )


def stream_kmv_partials(
    sdf: DataFrame,
    group_expr,
    value_expr,
    out_dir: str,
    checkpoint_dir: str,
    *,
    k: int = 256,
    seed: int = 0,
) -> None:
    """Streaming KMV distinct-count partials: each micro-batch keeps
    only its k smallest DISTINCT value hashes per group and appends
    them — O(k·groups) per batch, independent of batch row count.
    Correct by the min-k lattice property: every hash in the merged
    sketch's global k-minimum is necessarily within its own batch's
    k-minimum, so min-k(distinct-union of partials) equals the batch
    sketch exactly (the oracle twin checks bit-identity with
    ``functions.sketch.kmv_distinct``)."""
    from pyspark.sql import Window

    from vmware_graph_spark.functions.sketch import uniform_hash60

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        hashed = (
            batch_df.select(group_expr.alias("__g"), value_expr.alias("__val"))
            .filter(F.col("__val").isNotNull())
            .select("__g", uniform_hash60("__val", seed).alias("__h"))
            .distinct()
        )
        w = Window.partitionBy("__g").orderBy("__h")
        kept = (
            hashed.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .drop("__rn")
        )
        kept.write.mode("append").parquet(out_dir)

    with drain_partitions(sdf.sparkSession):
        q = (
            sdf.writeStream.foreachBatch(handle)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


def kmv_merge_estimate(spark: SparkSession, out_dir: str, *, k: int = 256) -> DataFrame:
    """Merge drained KMV partials and estimate per-group distinct
    counts: (``__g``, ``est_distinct``) — identical formula (and, by
    the min-k property, identical output) to the one-pass batch
    ``kmv_distinct`` over the same rows."""
    from pyspark.sql import Window

    from vmware_graph_spark.functions.sketch import HASH_SPACE

    merged = spark.read.parquet(out_dir).distinct()
    w = Window.partitionBy("__g").orderBy("__h")
    kept = merged.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k)
    est = F.when(
        F.count("*") < k, F.count("*").cast("double")
    ).otherwise(
        (F.lit(float(k - 1)) * F.lit(float(HASH_SPACE))) / F.max("__h").cast("double")
    )
    return kept.groupBy("__g").agg(F.round(est).cast("bigint").alias("est_distinct"))
