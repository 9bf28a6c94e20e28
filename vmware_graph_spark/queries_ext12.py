"""Round-5 extensions, batch 10: Pareto concentration, log2 degree
distributions, overdispersion checks, and labeled embedding margins.

Same registry/oracle discipline as ``queries.py``; see
``queries_ext3.py`` for the shared numeric-determinism rules.

Scale notes (100 TB):

- ``pareto_8020_parts_revenue`` finds each nation's 80%-revenue part
  head: one aggregate to part-level revenue, one per-nation rank
  window over that (already reduced) table, integer×decimal cross
  comparison for the 80% cut (5·cum ≥ 4·total — no division).
- ``degree_distribution_log2_bins`` profiles activity degrees into
  power-of-two bins with a pure-integer CASE ladder (no log) — the
  log-log histogram you check for power-law tails before picking skew
  strategies.
- ``overdispersion_daily_counts`` computes the variance-to-mean ratio
  of per-day event counts per type from exact integer moments — VMR≫1
  (overdispersion vs Poisson) is the burstiness signal at the
  aggregate grain.
- ``label_margin_embeddings`` measures labeled-cluster separation:
  distance to own-label centroid vs nearest other-label centroid, all
  per-dim terms rounded to 12 decimals and decimal-accumulated
  (partition-order-proof), then per-label margin stats — the
  embedding-quality readout before training a classifier on them.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from vmware_graph_spark.queries import query
from vmware_graph_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# Pareto 80/20 concentration of part revenue per nation
# ---------------------------------------------------------------------------

_PARETO_SQL = """
    WITH pr AS (
      SELECT s.s_nationkey AS nation, l.l_partkey AS part,
             sum(round(l.l_extendedprice, 2)::DECIMAL(18,2)) AS rev
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY s.s_nationkey, l.l_partkey
    ), ranked AS (
      SELECT nation, part, rev,
             sum(rev) OVER (PARTITION BY nation ORDER BY rev DESC, part
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             sum(rev) OVER (PARTITION BY nation) AS total,
             row_number() OVER (PARTITION BY nation
                                ORDER BY rev DESC, part) AS rn,
             count(*) OVER (PARTITION BY nation) AS n_parts
      FROM pr
    )
    SELECT nation, CAST(max(n_parts) AS BIGINT) AS n_parts,
           CAST(min(CASE WHEN 5 * cum >= 4 * total THEN rn END) AS BIGINT)
             AS n_for_80pct,
           round(min(CASE WHEN 5 * cum >= 4 * total THEN rn END)::DOUBLE
                 / max(n_parts), 6) AS concentration
    FROM ranked GROUP BY nation ORDER BY nation
"""


@query("pareto_8020_parts_revenue", _PARETO_SQL)
def pareto_8020_parts_revenue(spark, sf_dir):
    """Pareto concentration: per nation, how few parts carry 80% of
    supplier revenue. Part-level revenue reduces first (map-side
    combine); rank + cumulative windows run over that reduced table;
    the 80% cut compares 5·cum ≥ 4·total in exact decimals — no
    division, no float threshold. The business-side sibling of
    ``shuffle_skew_report``'s concentration diagnostics."""
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
    wn = Window.partitionBy("nation")
    wr = wn.orderBy(F.desc("rev"), "part")
    ranked = pr.select(
        "nation",
        "rev",
        F.sum("rev").over(wr.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.sum("rev").over(wn).alias("total"),
        F.row_number().over(wr).alias("rn"),
        F.count("*").over(wn).alias("n_parts"),
    )
    return (
        ranked.groupBy("nation")
        .agg(
            F.max("n_parts").cast("bigint").alias("n_parts"),
            F.min(
                F.when(5 * F.col("cum") >= 4 * F.col("total"), F.col("rn"))
            )
            .cast("bigint")
            .alias("n_for_80pct"),
            F.round(
                F.min(
                    F.when(5 * F.col("cum") >= 4 * F.col("total"), F.col("rn"))
                ).cast("double")
                / F.max("n_parts"),
                6,
            ).alias("concentration"),
        )
        .orderBy("nation")
    )


# ---------------------------------------------------------------------------
# Log2-binned degree distribution (integer, no log)
# ---------------------------------------------------------------------------


def _log2_case(x: str, max_pow: int = 20) -> str:
    arms = " ".join(
        f"WHEN {x} >= {2 ** k} THEN {k}" for k in range(max_pow, 0, -1)
    )
    return f"(CASE {arms} ELSE 0 END)"


_DEGREE_BINS_SQL = f"""
    WITH deg AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS d
      FROM events GROUP BY user_id
    )
    SELECT {_log2_case("d")} AS log2_bin,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(min(d) AS BIGINT) AS min_degree,
           CAST(max(d) AS BIGINT) AS max_degree
    FROM deg GROUP BY log2_bin ORDER BY log2_bin
"""


@query("degree_distribution_log2_bins", _DEGREE_BINS_SQL)
def degree_distribution_log2_bins(spark, sf_dir):
    """Log-log degree profile: per-user activity degrees bucketed into
    power-of-two bins via a pure-integer CASE ladder (floor(log2)
    without libm) — the histogram whose straight-line tail means
    power-law skew, i.e. the signal to reach for salting/hot-key
    isolation before a shuffle. One aggregate over the degree table."""
    deg = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").cast("bigint").alias("d"))
    )
    # ladder built lowest-first so the outermost WHEN tests the highest
    # power — matching the SQL CASE's first-match-wins order
    expr = F.lit(0)
    for k in range(1, 21):
        expr = F.when(F.col("d") >= 2**k, F.lit(k)).otherwise(expr)
    return (
        deg.groupBy(expr.alias("log2_bin"))
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.min("d").cast("bigint").alias("min_degree"),
            F.max("d").cast("bigint").alias("max_degree"),
        )
        .orderBy("log2_bin")
    )


# ---------------------------------------------------------------------------
# Overdispersion (variance-to-mean ratio) of daily counts
# ---------------------------------------------------------------------------

_VMR_SQL = """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ), m AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS d,
             CAST(sum(c) AS BIGINT) AS s, CAST(sum(c * c) AS BIGINT) AS ss
      FROM daily GROUP BY event_type
    )
    SELECT event_type, d AS n_days,
           round(s::DOUBLE / d, 6) AS mean_daily,
           round(((ss::DOUBLE - (s::DOUBLE * s::DOUBLE) / d) / (d - 1))
                 / (s::DOUBLE / d), 6) AS vmr,
           CASE WHEN ((ss::DOUBLE - (s::DOUBLE * s::DOUBLE) / d) / (d - 1))
                     / (s::DOUBLE / d) > 1.5 THEN 1 ELSE 0 END
             AS overdispersed
    FROM m WHERE d > 1 ORDER BY event_type
"""


@query("overdispersion_daily_counts", _VMR_SQL)
def overdispersion_daily_counts(spark, sf_dir):
    """Overdispersion check: variance-to-mean ratio of per-day event
    counts per type — VMR ≈ 1 is Poisson arrivals, VMR ≫ 1 means
    bursty/clumped traffic (choose negative-binomial models, expect
    hot partitions). Exact integer moments over the tiny type×day
    grid; the aggregate-grain sibling of ``burstiness_user_gaps``."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    m = daily.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("d"),
        F.sum("c").cast("bigint").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("d")
    var = (
        F.col("ss").cast("double")
        - (F.col("s").cast("double") * F.col("s").cast("double")) / F.col("d")
    ) / (F.col("d") - 1)
    return (
        m.filter(F.col("d") > 1)
        .select(
            "event_type",
            F.col("d").alias("n_days"),
            F.round(mean, 6).alias("mean_daily"),
            F.round(var / mean, 6).alias("vmr"),
            F.when(var / mean > 1.5, 1).otherwise(0).alias("overdispersed"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Labeled embedding margins (own-centroid vs nearest-other-centroid)
# ---------------------------------------------------------------------------

_MARGIN_D = 8

_MARGIN_SQL = f"""
    WITH e AS (
      SELECT vec_id, label, embedding[1:{_MARGIN_D}] AS v FROM embeddings
    ), dim AS (
      SELECT vec_id, label, u.i - 1 AS i,
             round(v[u.i], 6)::DECIMAL(18,6) AS x
      FROM e, UNNEST(range(1, {_MARGIN_D + 1})) AS u(i)
    ), cent AS (
      SELECT label AS clabel, i, sum(x) AS sx, count(*) AS n
      FROM dim GROUP BY label, i
    ), d2 AS (
      SELECT dim.vec_id, dim.label, cent.clabel,
             CAST(sum(round((dim.x::DOUBLE - cent.sx::DOUBLE / cent.n)
                            * (dim.x::DOUBLE - cent.sx::DOUBLE / cent.n), 12)
                      ::DECIMAL(28,12)) AS DOUBLE) AS dist2
      FROM dim JOIN cent ON dim.i = cent.i
      GROUP BY dim.vec_id, dim.label, cent.clabel
    ), ab AS (
      SELECT vec_id, label,
             max(CASE WHEN clabel = label THEN dist2 END) AS a,
             min(CASE WHEN clabel <> label THEN dist2 END) AS b
      FROM d2 GROUP BY vec_id, label
    ), marg AS (
      SELECT vec_id, label,
             round((b - a) / greatest(greatest(b, a), 1e-12), 12) AS m
      FROM ab
    )
    SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
           round(CAST(sum(m::DECIMAL(18,12)) AS DOUBLE) / count(*), 6)
             AS avg_margin,
           round(sum(CASE WHEN m > 0 THEN 1 ELSE 0 END)::DOUBLE
                 / count(*), 6) AS frac_separated
    FROM marg GROUP BY label ORDER BY label
"""


@query("label_margin_embeddings", _MARGIN_SQL)
def label_margin_embeddings(spark, sf_dir):
    """Labeled-cluster separation (silhouette-style margin without the
    O(n²) pair sums): each vector's squared distance to its OWN label
    centroid vs the NEAREST other label centroid, margin = (b−a)/max —
    positive means the label structure is recoverable from geometry.
    Per-dim terms round to 12 decimals and accumulate as exact decimals
    (partition-order-proof, same discipline as
    ``mahalanobis_outliers_embeddings``); centroids are a |labels|×d
    broadcast."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.slice("embedding", 1, _MARGIN_D).alias("v")
    )
    dim = e.select(
        "vec_id", "label", F.posexplode("v").alias("i", "x")
    ).select(
        "vec_id", "label", "i", F.round("x", 6).cast("decimal(18,6)").alias("x")
    )
    cent = dim.groupBy(F.col("label").alias("clabel"), "i").agg(
        F.sum("x").alias("sx"), F.count("*").alias("n")
    )
    mu = F.col("sx").cast("double") / F.col("n")
    term = F.round(
        (F.col("x").cast("double") - mu) * (F.col("x").cast("double") - mu), 12
    ).cast("decimal(28,12)")
    d2 = (
        dim.join(F.broadcast(cent), "i")
        .groupBy("vec_id", "label", "clabel")
        .agg(F.sum(term).cast("double").alias("dist2"))
    )
    ab = d2.groupBy("vec_id", "label").agg(
        F.max(F.when(F.col("clabel") == F.col("label"), F.col("dist2"))).alias("a"),
        F.min(F.when(F.col("clabel") != F.col("label"), F.col("dist2"))).alias("b"),
    )
    m = F.round(
        (F.col("b") - F.col("a"))
        / F.greatest(F.greatest(F.col("b"), F.col("a")), F.lit(1e-12)),
        12,
    )
    return (
        ab.select("label", m.alias("m"))
        .groupBy("label")
        .agg(
            F.count("*").cast("bigint").alias("n_vecs"),
            F.round(
                F.sum(F.col("m").cast("decimal(18,12)")).cast("double")
                / F.count("*"),
                6,
            ).alias("avg_margin"),
            F.round(
                F.sum(F.when(F.col("m") > 0, 1).otherwise(0)).cast("double")
                / F.count("*"),
                6,
            ).alias("frac_separated"),
        )
        .orderBy("label")
    )
