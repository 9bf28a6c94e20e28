"""Round-5 extensions, batch 13: Gini inequality and autocorrelation
diagnostics.

Same registry/oracle discipline as ``queries.py``; see
``queries_ext3.py`` for the shared numeric-determinism rules.

Scale notes (100 TB):

- ``gini_revenue_by_nation`` computes the Gini coefficient from the
  rank formula G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over the per-part
  revenue table — one rank window per nation over the (already
  reduced) aggregate, decimal-exact Σ(i·xᵢ).
- ``acf_daily_values`` computes lag-1 and lag-7 autocorrelations of
  the daily series from decimal-exact paired moments — the
  stationarity/seasonality diagnostic next to
  ``seasonal_naive_backtest`` (a high lag-7 ACF is what justifies the
  seasonal-naive baseline).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from vmware_graph_spark.queries import query
from vmware_graph_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# Gini coefficient of part revenue within each nation
# ---------------------------------------------------------------------------

_GINI_SQL = """
    WITH pr AS (
      SELECT s.s_nationkey AS nation, l.l_partkey AS part,
             sum(round(l.l_extendedprice, 2)::DECIMAL(18,2)) AS rev
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY s.s_nationkey, l.l_partkey
    ), ranked AS (
      SELECT nation, rev,
             row_number() OVER (PARTITION BY nation
                                ORDER BY rev, part) AS i
      FROM pr
    ), m AS (
      SELECT nation, CAST(count(*) AS BIGINT) AS n,
             sum(rev) AS s, sum(i * rev) AS si
      FROM ranked GROUP BY nation
    )
    SELECT nation, n AS n_parts,
           round(2 * si::DOUBLE / (n * s::DOUBLE)
                 - (n + 1)::DOUBLE / n, 6) + 0 AS gini
    FROM m WHERE n > 1 ORDER BY nation
"""


@query("gini_revenue_by_nation", _GINI_SQL)
def gini_revenue_by_nation(spark, sf_dir):
    """Gini inequality of per-part revenue within each nation, from
    the rank formula G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n — 0 when revenue
    spreads evenly across parts, →1 when one part takes everything.
    The continuous sibling of ``pareto_8020_parts_revenue``'s 80% cut;
    Σ(i·xᵢ) accumulates decimal-exact, the rank window runs over the
    reduced part-revenue table."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    pr = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(
            F.col("s_nationkey").alias("nation"),
            F.col("l_partkey").alias("part"),
        )
        .agg(F.sum(F.round("l_extendedprice", 2).cast("decimal(18,2)")).alias("rev"))
    )
    ranked = pr.withColumn(
        "i",
        F.row_number().over(Window.partitionBy("nation").orderBy("rev", "part")),
    )
    m = ranked.groupBy("nation").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("rev").alias("s"),
        F.sum(F.col("i") * F.col("rev")).alias("si"),
    )
    return (
        m.filter(F.col("n") > 1)
        .select(
            "nation",
            F.col("n").alias("n_parts"),
            (
                F.round(
                    2 * F.col("si").cast("double")
                    / (F.col("n") * F.col("s").cast("double"))
                    - (F.col("n") + 1).cast("double") / F.col("n"),
                    6,
                )
                + 0
            ).alias("gini"),
        )
        .orderBy("nation")
    )


# ---------------------------------------------------------------------------
# Autocorrelation (lag 1 and lag 7) of the daily value series
# ---------------------------------------------------------------------------


def _acf_block_sql(lag: int) -> str:
    return f"""
      SELECT {lag} AS lag, n AS n_pairs,
             round((sxy::DOUBLE - (sx::DOUBLE * sy::DOUBLE) / n)
                   / (sqrt(sxx::DOUBLE - (sx::DOUBLE * sx::DOUBLE) / n)
                      * sqrt(syy::DOUBLE - (sy::DOUBLE * sy::DOUBLE) / n)), 6)
               + 0 AS acf
      FROM (
        SELECT CAST(count(*) AS BIGINT) AS n,
               sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
               sum(x * x) AS sxx, sum(y * y) AS syy
        FROM (
          SELECT tot AS x,
                 lag(tot, {lag}) OVER (ORDER BY day) AS y
          FROM daily
        ) WHERE y IS NOT NULL
      )
    """


_ACF_SQL = (
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             sum(round(value, 2)::DECIMAL(18,2)) AS tot
      FROM events WHERE value IS NOT NULL GROUP BY 1
    )
    """
    + _acf_block_sql(1)
    + " UNION ALL "
    + _acf_block_sql(7)
    + " ORDER BY lag"
)


@query("acf_daily_values", _ACF_SQL)
def acf_daily_values(spark, sf_dir):
    """Autocorrelation of the daily value series at lag 1 (persistence)
    and lag 7 (weekly seasonality — the statistic that justifies
    ``seasonal_naive_backtest``'s baseline): Pearson r over
    (x_t, x_{t−lag}) pairs with decimal-exact paired moments and a
    pinned-order double formula. The lag windows run over the bounded
    day-grain aggregate."""
    daily = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.sum(F.round("value", 2).cast("decimal(18,2)")).alias("tot"))
    )

    def block(lag):
        w = Window.orderBy("day")
        pairs = daily.select(
            F.col("tot").alias("x"), F.lag("tot", lag).over(w).alias("y")
        ).filter(F.col("y").isNotNull())
        g = pairs.agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
        )
        acf = (
            F.col("sxy").cast("double")
            - (F.col("sx").cast("double") * F.col("sy").cast("double")) / F.col("n")
        ) / (
            F.sqrt(
                F.col("sxx").cast("double")
                - (F.col("sx").cast("double") * F.col("sx").cast("double"))
                / F.col("n")
            )
            * F.sqrt(
                F.col("syy").cast("double")
                - (F.col("sy").cast("double") * F.col("sy").cast("double"))
                / F.col("n")
            )
        )
        return g.select(
            F.lit(lag).alias("lag"),
            F.col("n").alias("n_pairs"),
            (F.round(acf, 6) + 0).alias("acf"),
        )

    return block(1).unionByName(block(7)).orderBy("lag")
