"""Vector math over embedding columns (array<float>/array<double>).

Everything is expressed with Spark's higher-order functions
(``zip_with`` + ``aggregate``) so the arithmetic runs JVM-side with a
left-to-right fold — the same evaluation order DuckDB's list functions
use, which is what lets the cosine results hash-match the oracle
bit-for-bit. A vectorized pandas_udf path exists for wide batches but
the fold is the correctness reference.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_vec(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Left-fold dot product — deterministic summation order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """dot(a,b) / (|a| * |b|) — mirrors
    ``list_inner_product(a,b)/(sqrt(...)*sqrt(...))`` in the oracle."""
    return dot(a, b) / (norm(a) * norm(b))
