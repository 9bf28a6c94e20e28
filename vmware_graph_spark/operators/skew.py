"""Skew mitigation: deterministic salted joins for hot keys.

AQE's skew-join handles most runtime skew (enabled in session.py), but
it only splits *sort-merge* partitions after a shuffle materializes;
when one key dominates a broadcast-ineligible dimension join (the
classic "every VM joins the same vCenter row" shape —
refresh-vmware.cypher:47,59 style lookups at fleet scale), pre-salting
bounds the worst task deterministically: replicate the small side
``salts`` ways, scatter the big side across replicas, join on
(key, salt). Output is row-identical to the plain join, so the same
oracle verifies both.

The salt is ``pmod(hash(<scatter cols>), salts)`` — a pure Catalyst
expression, deterministic per row (no rand(): nondeterministic salts
break retry semantics and oracle comparison; hash-salting keeps
re-executed tasks stable, which matters for exactly-once sinks).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    *,
    salts: int = 8,
    scatter_cols: Sequence[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join ``big`` ⋈ ``small`` on equi-keys with the hot-key load of
    each join key spread over ``salts`` partitions.

    ``small`` is replicated ``salts``× (explode of a literal sequence —
    fine for dimension-sized tables; the replication factor multiplies
    the small side only). ``scatter_cols`` picks which big-side columns
    feed the salt hash (default: all non-key columns, giving an even
    spread even when the key itself is constant).
    """
    on = list(on)
    scatter = list(scatter_cols) if scatter_cols else [c for c in big.columns if c not in on]
    if not scatter:
        scatter = on
    b = big.withColumn(_SALT, F.pmod(F.hash(*scatter), F.lit(salts)))
    s = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    return b.join(s, on=on + [_SALT], how=how).drop(_SALT)


def salted_count_distinct(
    df: DataFrame, group_cols: Sequence[str], value_col: str, *, salts: int = 16
) -> DataFrame:
    """Skew-proof EXACT distinct count: (group…, n_distinct).

    A plain ``countDistinct`` routes every row of a hot group through
    one reducer. Salting by a hash OF THE VALUE fixes that without
    approximation: distinct values partition cleanly across salts
    (the same value always lands on the same salt, different values
    never collide across salts), so

        count_distinct(group) = Σ_salt count_distinct(group, salt)

    exactly. Phase 1 dedups/counts within (group, salt) — the hot
    group's work spreads over ``salts`` reducers; phase 2 sums
    ``salts`` small rows per group. md5-derived salt keeps the split
    deterministic and engine-portable."""
    salt = (
        F.conv(F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        % salts
    )
    phase1 = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols, salt.alias("__salt"))
        .agg(F.countDistinct(value_col).alias("__d"))
    )
    return phase1.groupBy(*group_cols).agg(
        F.sum("__d").cast("bigint").alias("n_distinct")
    )
