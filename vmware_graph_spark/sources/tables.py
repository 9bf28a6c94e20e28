"""Relational table loaders for the driver-provided parquet fixtures.

One parquet file per table (TESTDATA.md). Scans stay declarative so
Catalyst pushes filters/projections into the parquet reader — verified
in tests via ``PushedFilters`` in the formatted plan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables — always broadcast-join sized at any SF the
# TPC-H-ish schema produces (region: 5 rows, nation: 25).
BROADCAST_TABLES = frozenset({"region", "nation"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table; known-tiny dimension tables carry a
    broadcast hint so every downstream join plans broadcast-hash."""
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # events.ts is parquet TIMESTAMP(NANOS): with nanosAsLong (session.py)
    # it arrives as bigint nanoseconds — convert to a proper timestamp
    # (integer µs division, matching DuckDB's ns→µs narrowing).
    for field in df.schema.fields:
        if field.name == "ts" and field.dataType.simpleString() == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return F.broadcast(df) if name in BROADCAST_TABLES else df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    names = names or TABLES
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, *, prefix: str = "") -> list[str]:
    """Register every fixture table as a temp view (``prefix + name``)
    so pure-SQL workflows (`spark.sql`) see the same catalog the DuckDB
    oracle does. Returns the view names registered."""
    out = []
    for name in TABLES:
        view = f"{prefix}{name}"
        load_table(spark, sf_dir, name).createOrReplaceTempView(view)
        out.append(view)
    return out
