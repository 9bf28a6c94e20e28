"""Bucketed table layout: shuffle-free co-located joins at 100 TB.

SURVEY §4 notes the reference's 17 ``CREATE INDEX`` statements
(refresh-vmware.cypher:2-20) have no Spark analog — the scale tool that
plays the same role for the *big* joins (VM ⋈ disk ⋈ datastore, or any
fact-fact join on a stable key) is hash bucketing: write both sides
pre-hash-partitioned (and sorted) on the join key into the same number
of buckets, and every subsequent join on that key is a zero-Exchange
sort-merge join — the shuffle is paid ONCE at write time and amortized
over every refresh/query that reuses the layout.

This matters at 100 TB because the shuffle is the dominant cost of a
fact-fact join: a bucketed layout turns an O(data) network exchange per
query into a purely local merge per bucket. Bucket count is chosen so
one bucket ≈ 128-512 MB at the target scale (64 buckets at sf0.1 stands
in for ~16k buckets at 100 TB; the mechanism is identical).

Verified in tests/test_bucketed.py: the joined plan contains NO
Exchange on either side (and no extra Sort when the buckets are
written sorted).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    *,
    num_buckets: int = 64,
    path: str | None = None,
    sort: bool = True,
) -> DataFrame:
    """Persist ``df`` hash-bucketed (and bucket-sorted) on ``keys``.

    Returns the catalog-backed DataFrame whose scan carries the
    bucketing metadata Catalyst uses to elide the join Exchange.
    """
    spark = df.sparkSession
    w = df.write.mode("overwrite").format("parquet").bucketBy(num_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)
    return spark.table(table)


def bucketed_join(
    left: DataFrame, right: DataFrame, on: Sequence[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket keys.

    Plain ``join`` — the point is that when both inputs come from
    :func:`write_bucketed` with the same bucket count, Catalyst plans a
    sort-merge join with zero Exchange operators; callers can assert
    that with :func:`assert_no_exchange`.
    """
    return left.join(right, on=list(on), how=how)


def assert_no_exchange(df: DataFrame) -> None:
    """Raise if the physical plan contains a shuffle Exchange."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "Exchange hashpartitioning" in plan:
        raise AssertionError(f"plan contains a shuffle Exchange:\n{plan}")
