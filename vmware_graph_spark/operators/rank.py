"""Distributed exact global rank — the no-single-task total order.

A global ``row_number() OVER (ORDER BY …)`` serializes the whole input
through ONE task (Spark warns "Moving all data to a single partition").
The classic fix is a two-phase range rank, the same shape
``repartitionByRange`` + sort uses internally:

1. pick ~``buckets`` range cutpoints with one ``percentile_approx``
   pass (the cutpoints only steer PARTITIONING — exactness of the
   result never depends on them);
2. rank within each range bucket with a PARTITIONED window (parallel);
3. prefix-sum the per-bucket counts (a ≤``buckets``-row aggregate) and
   add each bucket's offset to its local ranks.

The output rank is exactly ``row_number() OVER (ORDER BY order_cols)``
— deterministic whenever ``order_cols`` is a total order — but the
only unpartitioned work is the bucket-count prefix sum over ≤
``buckets`` rows. Used by the equi-depth histogram and available to
any operator that needs vocabulary-/corpus-scale ranks (round-2
VERDICT "single-task global-rank windows").
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_RB, _LR, _OFF = "__range_bucket", "__local_rank", "__bucket_offset"


def _range_bucketed(df: DataFrame, first: str, buckets: int) -> DataFrame:
    """Append ``__range_bucket`` = the range partition of ``first``
    under ~``buckets`` percentile cutpoints — the shared phase 1 of
    every bucketed total-order operator here. The cutpoints only steer
    PARTITIONING; exactness of downstream ranks/carries/sums never
    depends on them. Equal keys always share a bucket (strict ``>``
    against each cut), so within-bucket windows see every tie.
    NaN keys are safe: Spark's comparison semantics treat NaN as
    larger than any value (unlike IEEE), so ``NaN > cut`` is true for
    every cut and NaN rows land in the LAST bucket — exactly where
    ``ORDER BY`` sorts them."""
    fracs = [i / buckets for i in range(1, buckets)]
    cuts_row = df.agg(
        F.percentile_approx(first, F.array(*[F.lit(f) for f in fracs]), 10_000).alias("c")
    ).first()
    cuts = sorted({c for c in (cuts_row["c"] or []) if c is not None})
    bucket = F.lit(0)
    for c in cuts:
        bucket = bucket + F.when(F.col(first) > F.lit(c), 1).otherwise(0)
    return df.withColumn(_RB, bucket)


def exact_global_rank(
    df: DataFrame,
    order_cols: Sequence[str],
    *,
    buckets: int = 64,
    rank_col: str = "rank",
    partition_cols: Sequence[str] = (),
) -> DataFrame:
    """Append ``rank_col`` = exact 1-based row_number under
    ``ORDER BY order_cols`` (must be a total order for deterministic
    output), without any single-partition window over the data.

    With ``partition_cols`` the rank restarts per partition group —
    ``row_number() OVER (PARTITION BY partition_cols ORDER BY
    order_cols)`` — still without funnelling any one group through a
    single task: the data window is partitioned by (group, range
    bucket), and the per-group offset prefix sum runs over
    ≤ |groups| × buckets rows.

    Cost: one ``percentile_approx`` aggregate (driver gets ≤ buckets
    scalars), one hash shuffle for the per-bucket window, one tiny
    bucket-count aggregate broadcast back. The data-sized window is
    partitioned by range bucket — at 100 TB each bucket is ~1/buckets
    of the slice and AQE splits stragglers.
    """
    pcols = list(partition_cols)
    b = _range_bucketed(df, order_cols[0], buckets)

    wloc = Window.partitionBy(*pcols, _RB).orderBy(
        *[F.col(c) for c in order_cols]
    )
    local = b.withColumn(_LR, F.row_number().over(wloc))

    # exclusive prefix sum over ≤ |groups| × buckets rows — the only
    # unpartitioned-by-bucket scan (per-group when partitioned)
    sizes = b.groupBy(*pcols, _RB).agg(F.count("*").alias("__n"))
    woff = (
        Window.partitionBy(*pcols).orderBy(_RB)
        if pcols
        else Window.orderBy(_RB)
    ).rowsBetween(Window.unboundedPreceding, -1)
    offs = sizes.select(
        *pcols, _RB, F.coalesce(F.sum("__n").over(woff), F.lit(0)).alias(_OFF)
    )
    return (
        local.join(F.broadcast(offs), [*pcols, _RB])
        .withColumn(rank_col, (F.col(_OFF) + F.col(_LR)).cast("bigint"))
        .drop(_RB, _LR, _OFF)
    )


def bucketed_carry(
    df: DataFrame,
    order_cols: Sequence[str],
    value_cols: Sequence[str],
    *,
    buckets: int = 64,
    prev_prefix: str = "prev_",
    next_prefix: str = "next_",
) -> DataFrame:
    """Global carry-forward AND carry-backward without a single-task
    window: appends, for each ``value_cols`` column ``v``,

    - ``prev_v`` = ``last(v, ignorenulls) OVER (ORDER BY order_cols
      ROWS UNBOUNDED PRECEDING AND 1 PRECEDING)``
    - ``next_v`` = ``first(v, ignorenulls) OVER (ORDER BY order_cols
      ROWS 1 FOLLOWING AND UNBOUNDED FOLLOWING)``

    — the merged-sort as-of-match shape (nearest-neighbor matching,
    gap fill) — bit-identical to the global windows, but the only
    data-sized windows are partitioned by range bucket; the
    cross-bucket handoff is a prefix carry over ≤ ``buckets`` rows
    broadcast back.

    ``value_cols`` must be null-together (all null or all non-null on
    a row — e.g. columns projected from the same tagged source row),
    because the boundary fixup carries them as one struct keyed on
    the first column's nullness. ``order_cols`` must be a total order
    for deterministic output.
    """
    vcols = list(value_cols)
    b = _range_bucketed(df, order_cols[0], buckets)

    wb = Window.partitionBy(_RB).orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, -1
    )
    wf = Window.partitionBy(_RB).orderBy(*order_cols).rowsBetween(
        1, Window.unboundedFollowing
    )
    local = b.select(
        "*",
        *[F.last(v, ignorenulls=True).over(wb).alias(f"__lp_{v}") for v in vcols],
        *[F.first(v, ignorenulls=True).over(wf).alias(f"__ln_{v}") for v in vcols],
    )

    # Per-bucket extremes of the NON-NULL rows (one struct each: max =
    # last in order, min = first), left-joined onto every occupied
    # bucket so empty-of-values buckets still receive a carry; the
    # prefix carry itself windows over ≤ buckets rows.
    tagged = b.filter(F.col(vcols[0]).isNotNull())
    ext = tagged.groupBy(_RB).agg(
        F.max(F.struct(*order_cols, *vcols)).alias("__mx"),
        F.min(F.struct(*order_cols, *vcols)).alias("__mn"),
    )
    occupied = b.select(_RB).distinct()
    cwb = Window.orderBy(_RB).rowsBetween(Window.unboundedPreceding, -1)
    cwf = Window.orderBy(_RB).rowsBetween(1, Window.unboundedFollowing)
    carry = (
        occupied.join(ext, _RB, "left")
        .select(
            _RB,
            F.last("__mx", ignorenulls=True).over(cwb).alias("__cin_prev"),
            F.first("__mn", ignorenulls=True).over(cwf).alias("__cin_next"),
        )
    )

    out = local.join(F.broadcast(carry), _RB)
    key_prev, key_next = f"__lp_{vcols[0]}", f"__ln_{vcols[0]}"
    sel = [c for c in df.columns]
    for v in vcols:
        sel.append(
            F.when(F.col(key_prev).isNull(), F.col(f"__cin_prev.{v}"))
            .otherwise(F.col(f"__lp_{v}"))
            .alias(f"{prev_prefix}{v}")
        )
    for v in vcols:
        sel.append(
            F.when(F.col(key_next).isNull(), F.col(f"__cin_next.{v}"))
            .otherwise(F.col(f"__ln_{v}"))
            .alias(f"{next_prefix}{v}")
        )
    return out.select(*sel)


def bucketed_prefix_sum(
    df: DataFrame,
    order_cols: Sequence[str],
    value_col: str,
    *,
    buckets: int = 64,
    out_col: str = "cum",
) -> DataFrame:
    """Append ``out_col`` = EXCLUSIVE running sum of ``value_col``
    under ``ORDER BY order_cols`` (``sum(v) OVER (ORDER BY … ROWS
    UNBOUNDED PRECEDING AND 1 PRECEDING)``, null→0) without a
    single-task window — the same two-phase range-bucket shape as
    :func:`exact_global_rank`: per-bucket exclusive sums in a
    partitioned window, per-bucket totals prefix-summed over
    ≤ ``buckets`` rows and broadcast back as offsets.

    ``order_cols`` must be a total order (exclusive frames are
    order-sensitive under ties). Ascending only — negate a numeric
    key for descending."""
    b = _range_bucketed(df, order_cols[0], buckets)

    wloc = Window.partitionBy(_RB).orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, -1
    )
    local = b.withColumn("__ps_loc", F.coalesce(F.sum(value_col).over(wloc), F.lit(0)))

    totals = b.groupBy(_RB).agg(F.sum(value_col).alias("__ps_tot"))
    woff = Window.orderBy(_RB).rowsBetween(Window.unboundedPreceding, -1)
    offs = totals.select(
        _RB, F.coalesce(F.sum("__ps_tot").over(woff), F.lit(0)).alias(_OFF)
    )
    return (
        local.join(F.broadcast(offs), _RB)
        .withColumn(out_col, F.col(_OFF) + F.col("__ps_loc"))
        .drop(_RB, _OFF, "__ps_loc")
    )


def ntile_from_rank(rank: F.Column, n_rows: int, n_tiles: int) -> F.Column:
    """SQL ``ntile(n_tiles)`` reconstructed from an exact global rank:
    the first ``n_rows % n_tiles`` tiles take ``⌈n/t⌉`` rows, the rest
    ``⌊n/t⌋`` — bit-identical to the window function, no window."""
    q, rem = divmod(int(n_rows), int(n_tiles))
    if q == 0:
        return rank.cast("int")
    big = rem * (q + 1)
    return (
        F.when(rank <= F.lit(big), F.floor((rank - 1) / F.lit(q + 1)) + 1)
        .otherwise(F.lit(rem) + F.floor((rank - F.lit(big) - 1) / F.lit(q)) + 1)
    ).cast("int")
