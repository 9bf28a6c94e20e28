"""Temporal joins Spark lacks as builtins: as-of join and range join.

Both are named operators a time-series / training-data pipeline needs
(event attribution, interval containment) that naive SQL expresses as
inequality joins — which Spark executes as broadcast-nested-loop or
cartesian at 100 TB. These implementations restore linear shapes:

- ``asof_join``: union + carry-forward window. One shuffle on the join
  key; the "latest right row at or before the left timestamp" is a
  ``last(..., ignorenulls=True)`` over the merged, time-ordered stream.
  No row explosion, no inequality join, works at any key cardinality.
- ``range_join``: interval bucketization. Intervals explode to the
  fixed-width bins they cover, points map to their single bin, and the
  equi-join on (key, bin) + residual BETWEEN filter replaces the
  inequality join. Bin width trades explode fan-out (long intervals)
  against bucket selectivity.

DuckDB oracles: native ``ASOF JOIN`` / plain ``BETWEEN`` join — the
reference semantics these must reproduce exactly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    *,
    right_cols: list[str],
    prefix: str = "r_",
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the latest right row of the same ``on``
    key with ``right_ts <= left_ts`` (``direction="backward"``, the
    default, ties included) or the earliest right row with
    ``right_ts >= left_ts`` (``direction="forward"`` — next-event
    attribution, e.g. "first click after each view").

    Right rows must be unique per (on, right_ts) — pre-aggregate if
    not; the carried payload is a single struct so all right columns
    come from the SAME matched row. Left rows with no matching right
    row keep nulls. Output: every left column, plus ``prefix +
    right_ts`` and ``prefix + c`` for each ``right_cols`` entry. Both
    directions are the same single shuffle on ``on`` — forward just
    flips the tie order and looks down the following frame.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    payload = F.struct(F.col(right_ts).alias("__ts"), *[F.col(c) for c in right_cols])
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        payload.alias("__payload"),
    )
    l = left.withColumn("__t", F.col(left_ts)).withColumn(
        "__side", F.lit(1)
    ).withColumn("__payload", F.lit(None).cast(r.schema["__payload"].dataType))

    merged = l.unionByName(r, allowMissingColumns=True)
    if direction == "backward":
        # right rows sort before left rows at equal timestamps → <= semantics
        w = (
            Window.partitionBy(on)
            .orderBy("__t", "__side")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = merged.withColumn(
            "__match", F.last("__payload", ignorenulls=True).over(w)
        )
    else:
        # left rows sort before right rows at equal timestamps, so an
        # equal-ts right sits inside the left row's following frame →
        # >= semantics; first non-null payload = earliest such right.
        w = (
            Window.partitionBy(on)
            .orderBy(F.col("__t").asc(), F.col("__side").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carried = merged.withColumn(
            "__match", F.first("__payload", ignorenulls=True).over(w)
        )
    out = carried.filter(F.col("__side") == 1).select(
        *[F.col(c) for c in left.columns],
        F.col("__match.__ts").alias(f"{prefix}{right_ts}"),
        *[F.col(f"__match.{c}").alias(f"{prefix}{c}") for c in right_cols],
    )
    return out


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    *,
    bin_seconds: int = 3600,
) -> DataFrame:
    """Inner-join each point to every interval of the same key that
    contains it (``start_ts <= point_ts <= end_ts``), without an
    inequality join: intervals explode to the ``bin_seconds``-wide
    epoch bins they span, points hash to their single bin, and the
    equi-join on (key, bin) carries a residual BETWEEN filter. A point
    occupies exactly one bin, so no post-join dedup is needed.
    """
    s_bin = F.floor(F.unix_timestamp(start_ts) / bin_seconds)
    e_bin = F.floor(F.unix_timestamp(end_ts) / bin_seconds)
    iv = intervals.filter(F.col(start_ts) <= F.col(end_ts)).withColumn(
        "__bin", F.explode(F.sequence(s_bin, e_bin))
    )
    pt = points.withColumn("__bin", F.floor(F.unix_timestamp(point_ts) / bin_seconds))
    joined = pt.join(iv, [on, "__bin"]).filter(
        (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) <= F.col(end_ts))
    )
    return joined.drop("__bin")


def incremental_topk(
    prev_topk: DataFrame,
    delta: DataFrame,
    *,
    order_cols: Sequence[str],
    k: int,
) -> DataFrame:
    """Maintain a global top-k under batch arrival (the incremental
    top-k pattern, PAPERS.md EDBT 2020): merge the PREVIOUS top-k (at
    most k rows — never the full history) with the new batch and re-rank.

    Correct because top-k is a monotone semigroup under union:
    topk(A ∪ B) = topk(topk(A) ∪ B). Each refresh therefore touches
    k + |delta| rows instead of the full corpus — at 100 TB of
    accumulated history this is the difference between a streaming-able
    maintenance job and a nightly full re-sort. ``order_cols`` must be
    a TOTAL order ('-col' prefix for descending) or ranks are
    nondeterministic; the global sort is a TakeOrderedAndProject
    (per-partition heaps, k rows to the driver-side merge), never a
    full exchange.
    """
    cols = []
    for c in order_cols:
        cols.append(F.col(c[1:]).desc() if c.startswith("-") else F.col(c).asc())
    merged = prev_topk.unionByName(delta.select(*prev_topk.columns))
    w = Window.orderBy(*cols)
    return (
        merged.orderBy(*cols)
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("int"))
    )


def change_intervals(
    df: DataFrame, key_col: str, attr_col: str, ts_col: str
) -> DataFrame:
    """SCD-type-2 history build: compress an event/observation stream
    into attribute-validity intervals — (key, attr, valid_from,
    valid_to, is_current), one row per run of consecutive equal
    ``attr_col`` values in ``ts_col`` order.

    The change-point pass is lag() over (key, ts) — rows where the
    attribute differs from its predecessor open a version; lead() over
    the surviving change points closes it (null = current). Two window
    passes over the SAME (key, ts) partitioning, so Catalyst plans ONE
    shuffle and both windows run in it. This is how a mutable
    dimension's history is rebuilt from observations at warehouse
    scale — the write-side dual of the as-of join (which reads such
    intervals back).
    Rows must be unique per (key, ts) — at equal timestamps the run
    compression would be order-ambiguous; pre-dedup if not."""
    w = Window.partitionBy(key_col).orderBy(ts_col)
    prev = F.lag(attr_col).over(w)
    flagged = df.select(key_col, attr_col, ts_col).withColumn(
        "__is_change", prev.isNull() | (F.col(attr_col) != prev)
    )
    pts = flagged.filter(F.col("__is_change")).select(
        key_col, attr_col, F.col(ts_col).alias("valid_from")
    )
    w2 = Window.partitionBy(key_col).orderBy("valid_from")
    return pts.select(
        key_col,
        attr_col,
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.lead("valid_from").over(w2).isNull().alias("is_current"),
    )
