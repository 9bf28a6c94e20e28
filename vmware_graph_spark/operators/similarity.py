"""Similarity search over embedding columns.

Two paths:

- ``cosine_topk`` — exact brute force: broadcast the (small) query set,
  score every candidate, per-query top-k via window rank. This is the
  correctness baseline; cost is O(|Q|·|C|) but fully distributed and
  shuffle-free until the final (tiny) top-k aggregation.
- ``ivf_topk`` — scale path: candidates are bucketed by a deterministic
  coarse quantizer (sign pattern of leading dimensions — an LSH
  hyperplane family aligned to the axes); queries probe only their own
  bucket. Recall trades against fan-out exactly like IVF nprobe=1.

At 100 TB the bucket column becomes the partition key of the embedding
table so a probe touches one partition per query (partition pruning),
and the per-bucket top-k is a map-side heap before the global merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vmware_graph_spark.functions.vector import as_double_vec, cosine


def _score(queries: DataFrame, candidates: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_vec(vec_col).alias("__qv")
    )
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"), as_double_vec(vec_col).alias("__cv")
    )
    return (
        c.crossJoin(F.broadcast(q))
        .withColumn("cosine", cosine(F.col("__qv"), F.col("__cv")))
        .drop("__qv", "__cv")
    )


def _topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def cosine_topk(
    queries: DataFrame, candidates: DataFrame, *, id_col: str, vec_col: str, k: int = 10
) -> DataFrame:
    """Exact brute-force cosine top-k (ties broken by neighbor id)."""
    return _topk(_score(queries, candidates, id_col, vec_col), k)


def sign_bucket(vec_col, dims: int = 4):
    """Coarse quantizer: concatenated sign bits of the first ``dims``
    dimensions → up to 2^dims buckets. Deterministic + SQL-expressible
    (the oracle recomputes it with list indexing)."""
    v = as_double_vec(vec_col)
    bits = [
        F.when(F.element_at(v, i + 1) >= 0, F.lit("1")).otherwise(F.lit("0")) for i in range(dims)
    ]
    return F.concat(*bits)


def ivf_topk(
    queries: DataFrame,
    candidates: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    k: int = 10,
    bucket_dims: int = 4,
) -> DataFrame:
    """Bucketed ANN: score only candidates in the query's sign bucket."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double_vec(vec_col).alias("__qv"),
        sign_bucket(vec_col, bucket_dims).alias("__bucket"),
    )
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        as_double_vec(vec_col).alias("__cv"),
        sign_bucket(vec_col, bucket_dims).alias("__bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "__bucket")
        .withColumn("cosine", cosine(F.col("__qv"), F.col("__cv")))
        .drop("__qv", "__cv", "__bucket")
    )
    return _topk(scored, k)
