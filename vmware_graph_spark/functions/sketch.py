"""Deterministic, engine-portable approximate-aggregate sketches.

Spark's built-in ``approx_count_distinct`` / ``percentile_approx`` are
HLL- and KLL-based: correct, fast, but engine-specific — their outputs
can never hash-match a DuckDB oracle. This module provides the same
*capabilities* (distinct-count estimation, quantile estimation over a
sample) as pure Catalyst expressions over an md5-derived uniform hash,
so the SAME value is computed by Spark and by the ANSI-SQL oracle twin.

Scale design (100 TB):

- ``kmv_distinct`` is a K-Minimum-Values (theta) sketch: one
  ``distinct`` shuffle on (group, hash) followed by a per-group window
  that keeps only the ``k`` smallest hashes. Work after the distinct is
  O(k) per group and the final aggregate is a k-row-per-group reduce —
  no collect, no driver state, parallel across groups.
- ``hash_sample`` is deterministic Bernoulli sampling by hash
  threshold: a pure filter, fully pushed below any downstream shuffle,
  reproducible across runs/engines (unlike ``rand()``-based sampling)
  and stable under repartitioning (unlike ``df.sample``).
- ``disc_percentile`` picks the value at rank ``ceil(p * n)`` per
  group — the classic "type 1" discrete quantile. It sorts only within
  each group partition (single window shuffle). Combined with
  ``hash_sample`` it is the scale path for quantiles: sample fraction f
  bounds the sort to f·N rows while the hash keeps it deterministic.

Reference parity: the reference engine exposes no approximate
aggregates (refresh-vmware.cypher has only count()); these back the
SURVEY §2.11 approx-aggregate commitment with oracle-checkable math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: 2^60 — the hash universe size; 15 hex chars = 60 bits fits in int64.
HASH_SPACE = 1 << 60


def uniform_hash60(col, seed: int = 0):
    """Deterministic 60-bit uniform hash of ``col`` (any castable type).

    md5 → first 15 hex chars → bigint, identical in Spark
    (``conv(substring(md5(x),1,15),16,10)``) and DuckDB
    (``('0x' || substr(md5(x),1,15))::BIGINT``).
    """
    tagged = F.concat(F.lit(f"{seed}:"), F.col(col).cast("string") if isinstance(col, str) else col.cast("string"))
    return F.conv(F.substring(F.md5(tagged), 1, 15), 16, 10).cast("bigint")


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 256,
    seed: int = 0,
) -> DataFrame:
    """KMV distinct-count estimate per group: ``est_distinct`` (bigint).

    Keeps the ``k`` smallest distinct hash values per group; when fewer
    than ``k`` distinct values exist the estimate is exact, otherwise
    ``(k-1) / h_k`` scaled to the hash space (h_k = k-th smallest).
    Relative standard error ≈ 1/sqrt(k-2).

    All arithmetic is integer-or-IEEE-double with an explicit
    ``round`` — bit-identical between Spark and the DuckDB oracle.
    """
    h = uniform_hash60(value_col, seed).alias("__h")
    w = Window.partitionBy(*group_cols).orderBy("__h")
    kept = (
        df.select(*group_cols, h)
        .distinct()
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
    )
    est = F.when(
        F.count("*") < k, F.count("*").cast("double")
    ).otherwise(
        (F.lit(float(k - 1)) * F.lit(float(HASH_SPACE))) / F.max("__h").cast("double")
    )
    return kept.groupBy(*group_cols).agg(
        F.round(est).cast("bigint").alias("est_distinct")
    )


def hash_sample(df: DataFrame, key_col: str, fraction: float, seed: int = 0) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose 60-bit hash of
    ``key_col`` falls below ``fraction`` of the hash space.

    A pure filter — Catalyst pushes it to the scan, and the kept set is
    a function of the data alone (stable across partitioning, runs, and
    engines)."""
    return df.filter(uniform_hash60(key_col, seed) < int(fraction * HASH_SPACE))


def hash_split(
    df: DataFrame,
    key_col: str,
    *,
    weights: tuple[float, ...] = (0.8, 0.1, 0.1),
    names: tuple[str, ...] = ("train", "val", "test"),
    seed: int = 0,
) -> DataFrame:
    """Deterministic train/val/test assignment: adds a ``split`` column
    chosen by where the key's 60-bit hash lands in cumulative
    ``weights`` bands.

    Pure projection — no shuffle, no rand(). A row's split is a
    function of its key alone, so it survives reruns, repartitioning,
    and corpus growth (appending documents never flips an existing
    document's split — the property position-based splits lack, and the
    one that prevents silent train/test leakage across dataset
    versions)."""
    if len(weights) != len(names) or not names:
        raise ValueError("weights and names must be non-empty and same length")
    total = sum(weights)
    h = uniform_hash60(key_col, seed)
    chain = None
    acc = 0.0
    for w, name in zip(weights[:-1], names[:-1]):
        acc += w / total
        cond = h < int(acc * HASH_SPACE)
        chain = F.when(cond, name) if chain is None else chain.when(cond, name)
    split = chain.otherwise(names[-1]) if chain is not None else F.lit(names[-1])
    return df.withColumn("split", split)


def split_thresholds(
    weights: tuple[float, ...] = (0.8, 0.1, 0.1),
) -> list[int]:
    """The integer hash-space cut points ``hash_split`` uses, exposed so
    oracle SQL replicates the float accumulation bit-for-bit."""
    total = sum(weights)
    out, acc = [], 0.0
    for w in weights[:-1]:
        acc += w / total
        out.append(int(acc * HASH_SPACE))
    return out


def cms_hashed(df: DataFrame, value_col: str, *, width: int = 64, depth: int = 4) -> DataFrame:
    """Per-row CMS probe triples ``(__v, __i, __b)``: each value hashed
    into one bucket per depth row with the engine-portable md5 scheme.
    Shared by the batch sketch below and the streaming mergeable-partial
    path (``streaming.events.stream_cms_heavy_hitters``)."""
    v = df.select(F.col(value_col).cast("string").alias("__v"))
    rows_i = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("__i")
    probes = v.select("__v", rows_i)
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col("__i").cast("string"), F.lit(":"), F.col("__v"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    return probes.withColumn("__b", h % width)


def cms_heavy_hitters(
    df: DataFrame,
    value_col: str,
    *,
    width: int = 64,
    depth: int = 4,
    min_count: int = 1,
) -> DataFrame:
    """Count-min-sketch heavy hitters: (value, est) for every distinct
    value whose CMS estimate ≥ ``min_count``; ``est`` never
    underestimates the true count (one-sided error ≤ e·N/width with
    probability 1 − e^-depth).

    The sketch is ``depth`` md5 hash rows × ``width`` counters — a
    (depth·width)-cell table that REPLACES a full distinct-count
    shuffle when the value domain is huge: counters aggregate map-side
    into O(depth·width) state regardless of cardinality, then only the
    (typically few) probe values re-hash and take the row-wise min.
    md5 bucketing keeps every cell — and therefore every estimate —
    bit-identical to the DuckDB oracle, unlike JVM-hash sketches."""
    hashed = cms_hashed(df, value_col, width=width, depth=depth)
    counters = hashed.groupBy("__i", "__b").agg(F.count("*").alias("__c"))
    probe_vals = hashed.select("__v", "__i", "__b").distinct()
    est = (
        probe_vals.join(counters, ["__i", "__b"])
        .groupBy("__v")
        .agg(F.min("__c").alias("est"))
    )
    return est.filter(F.col("est") >= min_count).select(
        F.col("__v").alias("value"), "est"
    )


def disc_percentile(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    ps: list[float],
    out_names: list[str] | None = None,
) -> DataFrame:
    """Discrete (type-1) percentiles per group: value at rank
    ``ceil(p * n)`` in ascending ``value_col`` order.

    No interpolation — the result is an actual data value, so it is
    engine-exact by construction. One window shuffle per call covers
    every requested percentile."""
    out_names = out_names or [f"p{int(p * 100)}" for p in ps]
    w = Window.partitionBy(*group_cols).orderBy(value_col)
    ranked = df.select(*group_cols, value_col).withColumn(
        "__rn", F.row_number().over(w)
    ).withColumn("__n", F.count("*").over(Window.partitionBy(*group_cols)))
    aggs = [
        F.max(
            F.when(
                F.col("__rn")
                == F.greatest(F.lit(1), F.ceil(F.lit(p) * F.col("__n"))),
                F.col(value_col),
            )
        ).alias(name)
        for p, name in zip(ps, out_names)
    ]
    return ranked.groupBy(*group_cols).agg(*aggs)


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    *,
    default_fraction: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Deterministic stratified sampling: per-stratum keep fractions
    (the data-mixture knob of a training pipeline — e.g. upsample one
    source, downsample another) as a single hash-threshold filter.

    Like :func:`hash_sample`, the kept set is a pure function of the
    data: reproducible across engines, runs, and partitionings, and
    the filter pushes to the scan. Strata not listed keep
    ``default_fraction``.
    """
    thr = F.lit(int(default_fraction * HASH_SPACE))
    expr = None
    for stratum, frac in sorted(fractions.items()):
        cond = F.col(strata_col) == stratum
        lit = F.lit(int(frac * HASH_SPACE))
        expr = F.when(cond, lit) if expr is None else expr.when(cond, lit)
    threshold = thr if expr is None else expr.otherwise(thr)
    return df.filter(uniform_hash60(key_col, seed) < threshold)


def weighted_sample(
    df: DataFrame, key_col: str, weight_col: str, n: int, seed: int = 0
) -> DataFrame:
    """Deterministic weighted sampling without replacement (priority /
    exponential-race sampling, Efraimidis–Spirakis A-ES).

    Each row draws u = uniform-hash(key) ∈ (0,1) and a priority
    ``-ln(u) / weight``; the global n smallest priorities are the
    sample, so inclusion probability scales with weight — the
    data-mixture knob for length- or quality-weighted corpus draws.
    Deterministic: the draw is a hash of the key, not an RNG, so the
    sample is a function of the data alone. The top-n runs as
    ``orderBy().limit(n)`` — Spark's distributed TakeOrdered (per-
    partition partial top-n, then a single n-row merge), never a global
    sort. ln() is rounded to 10 decimals to kill cross-libm ulp drift
    before ranking; ties (astronomically rare) break on the key.
    """
    u = (uniform_hash60(key_col, seed).cast("double") + 0.5) / float(HASH_SPACE)
    priority = F.round(-F.log(u) / F.col(weight_col).cast("double"), 10)
    return (
        df.withColumn("priority", priority)
        .orderBy("priority", key_col)
        .limit(n)
    )
