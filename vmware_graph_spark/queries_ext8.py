"""Round-5 extensions, batch 6: LSH candidate precision, degree
assortativity, and nDCG@10 ranking-quality evaluation.

Same registry/oracle discipline as ``queries.py``; see
``queries_ext3.py`` for the shared numeric-determinism rules.

Scale notes (100 TB):

- ``lsh_precision_vs_exact`` is the other half of the banding-tuning
  signal: ``lsh_recall_vs_exact`` tells you what the bands MISS,
  precision tells you how much verification work the candidates COST —
  together they pick (bands, rows) before a 100 TB dedup run. Same two
  kernels, one extra division.
- ``degree_assortativity_graph`` is a global one-row graph health
  metric (do hubs attach to hubs?) from exact integer moments over the
  edge list — degrees join in, five integer sums, one Pearson formula
  in pinned-order doubles.
- ``ndcg_matryoshka_vs_exact`` evaluates the truncated ANN tier with
  graded relevance (exact-rank-derived gains, log2 position discounts
  as precomputed literals — no libm at query time): the metric that
  penalizes burying a rank-1 neighbor, which recall@k and RBO treat
  mildly. Decimal gain accumulation keeps both engines bit-identical.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from vmware_graph_spark.queries import ORACLE, query
from vmware_graph_spark.queries_ext2 import _lsh_recall_sql
from vmware_graph_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# LSH candidate precision (complement of lsh_recall_vs_exact)
# ---------------------------------------------------------------------------


def _lsh_precision_sql() -> str:
    base = _lsh_recall_sql()
    needle = "/ (SELECT count(*) FROM exact), 6) AS recall"
    assert needle in base, "lsh recall oracle shape changed"
    return base.replace(
        needle, "/ (SELECT count(*) FROM cands), 6) AS precision"
    )


@query("lsh_precision_vs_exact", _lsh_precision_sql())
def lsh_precision_vs_exact(spark, sf_dir):
    """Candidate PRECISION of the MinHash-LSH banding against the exact
    >= 0.4-Jaccard pair set — the fraction of candidate pairs that
    survive verification, i.e. how much of the verify stage's work is
    wasted. Tuned jointly with ``lsh_recall_vs_exact`` (same kernels,
    same banding) to pick (bands, rows): more bands buys recall at the
    cost of this number."""
    from vmware_graph_spark.operators.dedup import (
        jaccard_pairs,
        minhash_lsh_candidates,
    )

    d = load_table(spark, sf_dir, "documents")
    exact = jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.4).select(
        "id_a", "id_b"
    )
    cands = minhash_lsh_candidates(d, "doc_id", "text", n=3, num_hashes=8, bands=4)
    hit = exact.join(cands, ["id_a", "id_b"])
    return (
        exact.agg(F.count("*").cast("bigint").alias("n_exact"))
        .crossJoin(cands.agg(F.count("*").cast("bigint").alias("n_candidates")))
        .crossJoin(hit.agg(F.count("*").cast("bigint").alias("n_hit")))
        .select(
            "n_exact",
            "n_candidates",
            "n_hit",
            F.round(
                F.col("n_hit").cast("double") / F.col("n_candidates"), 6
            ).alias("precision"),
        )
    )


# ---------------------------------------------------------------------------
# Degree assortativity of the part co-occurrence graph
# ---------------------------------------------------------------------------

_ASSORT_SQL = """
    WITH items AS (
      SELECT DISTINCT l_orderkey AS oid, l_partkey AS pid FROM lineitem
    ), e AS (
      SELECT a.pid AS a, b.pid AS b
      FROM items a JOIN items b ON a.oid = b.oid AND a.pid < b.pid
      GROUP BY a.pid, b.pid HAVING count(*) >= 2
    ), deg AS (
      SELECT pid, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT a AS pid FROM e UNION ALL SELECT b FROM e
      ) GROUP BY pid
    ), ends AS (
      SELECT da.d AS x, db.d AS y FROM e
      JOIN deg da ON e.a = da.pid JOIN deg db ON e.b = db.pid
      UNION ALL
      SELECT db.d, da.d FROM e
      JOIN deg da ON e.a = da.pid JOIN deg db ON e.b = db.pid
    ), m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM ends
    )
    SELECT n // 2 AS n_edges,
           round((n * sxy - sx * sy)::DOUBLE
                 / (sqrt((n * sxx - sx * sx)::DOUBLE)
                    * sqrt((n * syy - sy * sy)::DOUBLE)), 6) + 0
             AS assortativity
    FROM m
"""


@query("degree_assortativity_graph", _ASSORT_SQL)
def degree_assortativity_graph(spark, sf_dir):
    """Degree assortativity (Newman's r) of the part co-occurrence
    graph: the Pearson correlation of endpoint degrees over the
    symmetrized edge list — positive means hubs attach to hubs. Five
    exact INTEGER moments (degrees are integers) feed one pinned-order
    Pearson formula, so both engines agree to the bit; one degree
    aggregation + one edge⋈degree join, nothing quadratic."""
    items = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("oid"), F.col("l_partkey").alias("pid"))
        .distinct()
    )
    ia = items.select("oid", F.col("pid").alias("a"))
    ib = items.select(F.col("oid").alias("oid2"), F.col("pid").alias("b"))
    e = (
        ia.join(ib, (ia.oid == ib.oid2) & (ia.a < ib.b))
        .groupBy("a", "b")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= 2)
        .select("a", "b")
    )
    deg = (
        e.select(F.col("a").alias("pid"))
        .unionAll(e.select(F.col("b").alias("pid")))
        .groupBy("pid")
        .agg(F.count("*").cast("bigint").alias("d"))
    )
    da = deg.select(F.col("pid").alias("a"), F.col("d").alias("dx"))
    db = deg.select(F.col("pid").alias("b"), F.col("d").alias("dy"))
    joined = e.join(da, "a").join(db, "b")
    ends = joined.select(F.col("dx").alias("x"), F.col("dy").alias("y")).unionAll(
        joined.select(F.col("dy").alias("x"), F.col("dx").alias("y"))
    )
    m = ends.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    return m.select(
        F.expr("div(n, 2)").alias("n_edges"),
        (
            F.round(
                (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
                / (
                    F.sqrt(
                        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                            "double"
                        )
                    )
                    * F.sqrt(
                        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
                            "double"
                        )
                    )
                ),
                6,
            )
            + 0
        ).alias("assortativity"),
    )


# ---------------------------------------------------------------------------
# nDCG@10 of the matryoshka-truncated ranking vs exact
# ---------------------------------------------------------------------------

import math as _math

_NDCG_K = 10
# 1/log2(i+1) position discounts, precomputed literals (no libm at
# query time; both engines consume the identical 12-decimal strings)
_NDCG_W = {i: round(1.0 / _math.log2(i + 1), 12) for i in range(1, _NDCG_K + 1)}
# ideal DCG for graded gains rel(i) = K+1-i at positions 1..K
_NDCG_IDCG = round(
    sum((_NDCG_K + 1 - i) * _NDCG_W[i] for i in range(1, _NDCG_K + 1)), 12
)

_NDCG_GAIN_SQL = "CASE rb " + " ".join(
    f"WHEN {i} THEN {w:.12f}" for i, w in _NDCG_W.items()
) + " END"

_NDCG_SQL = f"""
    WITH full_t AS (
      SELECT vec_id,
             list_transform(embedding::DOUBLE[],
                            x -> x / sqrt(list_dot_product(embedding::DOUBLE[],
                                                           embedding::DOUBLE[]))) AS v
      FROM embeddings
    ),
    tr_t AS (
      SELECT vec_id,
             list_transform(list_slice(embedding::DOUBLE[], 1, 16),
                            x -> x / sqrt(list_dot_product(list_slice(embedding::DOUBLE[], 1, 16),
                                                           list_slice(embedding::DOUBLE[], 1, 16)))) AS v
      FROM embeddings
    ),
    fr AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS ra
      FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               list_dot_product(q.v, c.v) AS cos
        FROM full_t q JOIN full_t c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < 8
      )
    ),
    tr AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rb
      FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               list_dot_product(q.v, c.v) AS cos
        FROM tr_t q JOIN tr_t c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < 8
      )
    ),
    shared AS (
      SELECT t.query_id,
             CAST(({_NDCG_K + 1} - f.ra) AS BIGINT) AS rel, t.rb
      FROM tr t JOIN fr f
        ON f.query_id = t.query_id AND f.neighbor_id = t.neighbor_id
      WHERE t.rb <= {_NDCG_K} AND f.ra <= {_NDCG_K}
    ),
    qs AS (SELECT DISTINCT vec_id AS query_id FROM embeddings WHERE vec_id < 8)
    SELECT q.query_id,
           round(coalesce(CAST(sum(CAST(round(rel * ({_NDCG_GAIN_SQL}), 12)
                                        AS DECIMAL(18,12))) AS DOUBLE), 0.0)
                 / {_NDCG_IDCG:.12f}, 6) AS ndcg
    FROM qs q LEFT JOIN shared s ON s.query_id = q.query_id
    GROUP BY q.query_id ORDER BY q.query_id
"""


@query("ndcg_matryoshka_vs_exact", _NDCG_SQL)
def ndcg_matryoshka_vs_exact(spark, sf_dir):
    """nDCG@10 of the 16-dim matryoshka-truncated ranking against the
    exact full-dim ranking, with graded relevance rel = 11 - exact_rank
    — the evaluation that punishes burying a rank-1 neighbor, which
    recall@k (set overlap) and RBO (membership weights) only graze.
    Position discounts 1/log2(rb+1) are precomputed literals shared by
    both engines; gains accumulate as exact decimals. Completes the
    ranking-eval triad with ``ann_recall_bq_vs_exact`` and
    ``rbo_matryoshka_vs_exact``."""
    from vmware_graph_spark.functions.vector import dot
    from vmware_graph_spark.operators.similarity import truncate_normalize

    e = load_table(spark, sf_dir, "embeddings")

    def ranking(t, rank_name):
        q = t.filter(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("query_id"), F.col("__v").alias("__qv")
        )
        c = t.select(F.col("vec_id").alias("neighbor_id"), F.col("__v").alias("__cv"))
        s = (
            c.crossJoin(F.broadcast(q))
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .withColumn("cos", dot(F.col("__qv"), F.col("__cv")))
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cos").desc(), F.col("neighbor_id").asc()
        )
        return (
            s.withColumn(rank_name, F.row_number().over(w))
            .filter(F.col(rank_name) <= _NDCG_K)
            .select("query_id", "neighbor_id", rank_name)
        )

    fr = ranking(truncate_normalize(e, "embedding", 64, out_col="__v"), "ra")
    tr = ranking(truncate_normalize(e, "embedding", 16, out_col="__v"), "rb")
    shared = tr.join(fr, ["query_id", "neighbor_id"]).select(
        "query_id",
        (F.lit(_NDCG_K + 1) - F.col("ra")).cast("bigint").alias("rel"),
        "rb",
    )
    wmap = F.element_at(
        F.create_map(*[F.lit(x) for kv in _NDCG_W.items() for x in kv]),
        F.col("rb"),
    )
    gain = F.round(F.col("rel") * wmap, 12).cast("decimal(18,12)")
    qs = (
        e.filter(F.col("vec_id") < 8)
        .select(F.col("vec_id").alias("query_id"))
        .distinct()
    )
    return (
        qs.join(shared, "query_id", "left")
        .groupBy("query_id")
        .agg(
            F.round(
                F.coalesce(F.sum(gain).cast("double"), F.lit(0.0)) / _NDCG_IDCG,
                6,
            ).alias("ndcg")
        )
        .orderBy("query_id")
    )
