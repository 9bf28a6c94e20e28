"""Round-5 extensions, batch 2: CUPED variance-reduced experimentation,
Z-order pruning simulation, sorted-neighborhood entity resolution with
golden-record survivorship, gap-constrained sequential patterns,
conversion-latency percentiles, and model calibration bins.

Same registry/oracle discipline as ``queries.py``; see
``queries_ext3.py`` for the shared numeric-determinism rules.

Scale notes (100 TB):

- ``cuped_adjusted_ab_test`` is the experimentation-platform workhorse:
  per-user pre/post sums reduce in ONE shuffle, the CUPED theta comes
  from five decimal-exact global moments (a 1-row broadcast), and the
  adjustment is arithmetic on the 2-row cohort aggregate — variance
  reduction without any per-user second pass.
- ``zorder_pruning_simulation`` quantifies WHY the z-order layout jobs
  exist: it buckets each layout into parquet-row-group-sized runs,
  computes their min/max column stats, and counts how many groups a
  2-D predicate can skip. The simulation's global sort stands in for
  the layout job's ``repartitionByRange``; production never sorts at
  query time — it reads the stats this simulation models.
- ``golden_records_customers`` is sorted-neighborhood entity
  resolution: blocking + an in-block sort means cluster formation is a
  lag()-window (chained closeness), NOT an all-pairs join and NOT an
  iterative connected-components loop — the classic way MDM survives
  scale. Survivorship picks per-field winners with arg-min aggregates.
- ``skipgram_transitions_events`` extends journey mining to
  gap-constrained patterns (A → * → B) with one lead(2) frame over the
  existing per-user sort — no self-join.
- ``conversion_latency_percentiles`` ranks only the converters'
  latencies (a tiny fraction of events) after two map-side-combined
  per-user aggregates.
- ``score_calibration_bins`` is the reliability diagram for the quality
  gate: mapper-only scoring, an 11-row aggregate joined to outcomes.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from vmware_graph_spark.queries import query
from vmware_graph_spark.queries_ext2 import _ZX, _ZY, _ZY_SPARK, _zkey_expr
from vmware_graph_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# CUPED variance-reduced A/B readout
# ---------------------------------------------------------------------------

_CUPED_SPLIT = "TIMESTAMP '2024-01-16 00:00:00'"  # pre-period | post-period

_CUPED_SQL = f"""
    WITH per_user AS (
      SELECT user_id,
             coalesce(sum(CASE WHEN ts < {_CUPED_SPLIT}
                           THEN round(value, 2)::DECIMAL(18,2) END),
                      0::DECIMAL(18,2)) AS x,
             coalesce(sum(CASE WHEN ts >= {_CUPED_SPLIT}
                           THEN round(value, 2)::DECIMAL(18,2) END),
                      0::DECIMAL(18,2)) AS y
      FROM events WHERE value IS NOT NULL GROUP BY user_id
    ), g AS (
      SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx
      FROM per_user
    ), th AS (
      SELECT n, sx,
             (sxy::DOUBLE - (sx::DOUBLE * sy::DOUBLE) / n)
             / (sxx::DOUBLE - (sx::DOUBLE * sx::DOUBLE) / n) AS theta
      FROM g
    ), coh AS (
      SELECT CASE WHEN ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)),
                        1, 15))::BIGINT % 2 = 0
                  THEN 'A' ELSE 'B' END AS cohort,
             count(*) AS n_users, sum(x) AS sxc, sum(y) AS syc
      FROM per_user GROUP BY cohort
    )
    SELECT cohort, n_users,
           round(syc::DOUBLE / n_users, 6) AS mean_y,
           round(syc::DOUBLE / n_users
                 - theta * (sxc::DOUBLE / n_users - sx::DOUBLE / n), 6) + 0
             AS mean_y_cuped,
           round(theta, 6) + 0 AS theta
    FROM coh, th ORDER BY cohort
"""


@query("cuped_adjusted_ab_test", _CUPED_SQL)
def cuped_adjusted_ab_test(spark, sf_dir):
    """CUPED (Controlled-experiment Using Pre-Experiment Data) adjusted
    A/B readout: per-user pre-period covariate x and post-period metric
    y reduce in one shuffle; theta = cov(x,y)/var(x) comes from five
    decimal-exact global moments; adjusted cohort means subtract
    theta*(mean_x_cohort - mean_x_global). The hash cohort assignment
    matches ``ab_test_value_by_cohort`` (same md5 'ab:' split), so the
    two queries read the same experiment."""
    per_user = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("ts") < F.lit("2024-01-16 00:00:00").cast("timestamp"),
                        F.round("value", 2).cast("decimal(18,2)"),
                    )
                ),
                F.lit(0).cast("decimal(18,2)"),
            ).alias("x"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("ts") >= F.lit("2024-01-16 00:00:00").cast("timestamp"),
                        F.round("value", 2).cast("decimal(18,2)"),
                    )
                ),
                F.lit(0).cast("decimal(18,2)"),
            ).alias("y"),
        )
    )
    g = per_user.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    th = g.select(
        "n",
        "sx",
        (
            (
                F.col("sxy").cast("double")
                - (F.col("sx").cast("double") * F.col("sy").cast("double"))
                / F.col("n")
            )
            / (
                F.col("sxx").cast("double")
                - (F.col("sx").cast("double") * F.col("sx").cast("double"))
                / F.col("n")
            )
        ).alias("theta"),
    )
    cohort = F.when(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("ab:"), F.col("user_id").cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("bigint")
        % 2
        == 0,
        F.lit("A"),
    ).otherwise(F.lit("B"))
    coh = per_user.groupBy(cohort.alias("cohort")).agg(
        F.count("*").alias("n_users"),
        F.sum("x").alias("sxc"),
        F.sum("y").alias("syc"),
    )
    return (
        coh.crossJoin(F.broadcast(th))
        .select(
            "cohort",
            "n_users",
            F.round(F.col("syc").cast("double") / F.col("n_users"), 6).alias("mean_y"),
            (
                F.round(
                    F.col("syc").cast("double") / F.col("n_users")
                    - F.col("theta")
                    * (
                        F.col("sxc").cast("double") / F.col("n_users")
                        - F.col("sx").cast("double") / F.col("n")
                    ),
                    6,
                )
                + 0
            ).alias("mean_y_cuped"),
            (F.round("theta", 6) + 0).alias("theta"),
        )
        .orderBy("cohort")
    )


# ---------------------------------------------------------------------------
# Z-order vs natural layout: row-group pruning simulation
# ---------------------------------------------------------------------------

_RG_ROWS = 512  # simulated parquet row-group size
# the 2-D probe predicate, in the z-curve's own lane coordinates
_PX_LO, _PX_HI = 100, 199
_PY_LO, _PY_HI = 1000, 1199


def _prune_block_sql(layout: str, order_expr: str) -> str:
    return f"""
      SELECT '{layout}' AS layout, count(*) AS n_groups,
             CAST(coalesce(sum(CASE WHEN NOT (maxx < {_PX_LO} OR minx > {_PX_HI}
                               OR maxy < {_PY_LO} OR miny > {_PY_HI})
                          THEN 1 ELSE 0 END), 0) AS BIGINT) AS groups_scanned,
             round(coalesce(sum(CASE WHEN NOT (maxx < {_PX_LO} OR minx > {_PX_HI}
                               OR maxy < {_PY_LO} OR miny > {_PY_HI})
                          THEN 1 ELSE 0 END), 0)::DOUBLE / count(*), 6)
               AS scan_fraction
      FROM (
        SELECT grp, min(cx) AS minx, max(cx) AS maxx,
               min(cy) AS miny, max(cy) AS maxy
        FROM (
          SELECT (row_number() OVER (ORDER BY {order_expr}) - 1)
                 // {_RG_ROWS} AS grp,
                 cx, cy
          FROM lanes
        ) GROUP BY grp
      )
    """


_PRUNE_SQL = f"""
    WITH lanes AS (
      SELECT o_orderkey, {_ZX} AS cx, {_ZY} AS cy,
             {_zkey_expr("(" + _ZX + ")", "(" + _ZY + ")")} AS zkey
      FROM orders
    )
    {_prune_block_sql("natural", "o_orderkey")}
    UNION ALL
    {_prune_block_sql("zorder", "zkey, o_orderkey")}
    ORDER BY layout
"""


@query("zorder_pruning_simulation", _PRUNE_SQL)
def zorder_pruning_simulation(spark, sf_dir):
    """Quantifies the z-order layout's payoff: bucket the table into
    row-group-sized runs under (a) natural key order and (b) Morton
    order, compute each group's min/max stats on both predicate lanes,
    and count the groups a 2-D range predicate must scan. Natural order
    clusters only one dimension, so the other's stats are useless;
    Morton order bounds both. The global sort here simulates the layout
    job's repartitionByRange — production pays it once at write time,
    then every query reads only the surviving groups."""
    o = load_table(spark, sf_dir, "orders")
    lanes = o.selectExpr(
        "o_orderkey",
        f"{_ZX} AS cx",
        f"{_ZY_SPARK} AS cy",
        f"{_zkey_expr('(' + _ZX + ')', '(' + _ZY_SPARK + ')')} AS zkey",
    )

    def block(layout, order_cols):
        grp = (
            lanes.withColumn(
                "grp",
                F.expr(
                    f"div(row_number() OVER (ORDER BY {order_cols}) - 1, {_RG_ROWS})"
                ),
            )
            .groupBy("grp")
            .agg(
                F.min("cx").alias("minx"),
                F.max("cx").alias("maxx"),
                F.min("cy").alias("miny"),
                F.max("cy").alias("maxy"),
            )
        )
        scanned = F.when(
            ~(
                (F.col("maxx") < _PX_LO)
                | (F.col("minx") > _PX_HI)
                | (F.col("maxy") < _PY_LO)
                | (F.col("miny") > _PY_HI)
            ),
            1,
        ).otherwise(0)
        return grp.agg(
            F.lit(layout).alias("layout"),
            F.count("*").alias("n_groups"),
            F.coalesce(F.sum(scanned), F.lit(0)).cast("bigint").alias(
                "groups_scanned"
            ),
            F.round(
                F.coalesce(F.sum(scanned), F.lit(0)).cast("double") / F.count("*"), 6
            ).alias("scan_fraction"),
        ).select("layout", "n_groups", "groups_scanned", "scan_fraction")

    return (
        block("natural", "o_orderkey")
        .unionByName(block("zorder", "zkey, o_orderkey"))
        .orderBy("layout")
    )


# ---------------------------------------------------------------------------
# Sorted-neighborhood entity resolution → golden records
# ---------------------------------------------------------------------------

_GR_GAP = "100.00"  # max acctbal gap chaining two records into one cluster

_GOLDEN_SQL = f"""
    WITH c AS (
      SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
             round(c_acctbal, 2)::DECIMAL(18,2) AS bal
      FROM customer
    ), lagged AS (
      SELECT *,
             CASE WHEN bal - lag(bal) OVER (
                    PARTITION BY c_nationkey
                    ORDER BY bal, c_custkey) <= {_GR_GAP}::DECIMAL(18,2)
                  THEN 0 ELSE 1 END AS brk
      FROM c
    ), clustered AS (
      SELECT *,
             sum(brk) OVER (PARTITION BY c_nationkey
                            ORDER BY bal, c_custkey
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cseq
      FROM lagged
    )
    SELECT c_nationkey,
           min(c_custkey) AS cluster_id,
           count(*) AS n_members,
           CAST(max(bal) AS DOUBLE) AS max_acctbal,
           arg_min(c_name, c_custkey) AS canonical_name
    FROM clustered
    GROUP BY c_nationkey, cseq
    HAVING count(*) >= 2
    ORDER BY c_nationkey, cluster_id
"""


@query("golden_records_customers", _GOLDEN_SQL)
def golden_records_customers(spark, sf_dir):
    """Sorted-neighborhood entity resolution with golden-record
    survivorship: block on nation, sort each block by the
    match attribute, and chain records whose gap <= threshold into
    clusters with ONE lag()+running-sum window — no all-pairs join, no
    iterative components. Survivorship then elects per-field winners
    (stable min-key id, max balance, arg-min canonical name). The MDM
    'merge duplicates into a master record' op, shaped for scale."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_mktsegment",
        F.round("c_acctbal", 2).cast("decimal(18,2)").alias("bal"),
    )
    w = Window.partitionBy("c_nationkey").orderBy("bal", "c_custkey")
    lagged = c.withColumn(
        "brk",
        F.when(
            F.col("bal") - F.lag("bal").over(w)
            <= F.lit(_GR_GAP).cast("decimal(18,2)"),
            0,
        ).otherwise(1),
    )
    clustered = lagged.withColumn(
        "cseq", F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        clustered.groupBy("c_nationkey", "cseq")
        .agg(
            F.min("c_custkey").alias("cluster_id"),
            F.count("*").alias("n_members"),
            F.max("bal").cast("double").alias("max_acctbal"),
            F.expr("min_by(c_name, c_custkey)").alias("canonical_name"),
        )
        .filter(F.col("n_members") >= 2)
        .select(
            "c_nationkey",
            "cluster_id",
            "n_members",
            "max_acctbal",
            "canonical_name",
        )
        .orderBy("c_nationkey", "cluster_id")
    )


# ---------------------------------------------------------------------------
# Gap-constrained sequential patterns (A → * → B skip-grams)
# ---------------------------------------------------------------------------

_SKIPGRAM_SQL = """
    WITH seq AS (
      SELECT user_id, event_type AS a,
             lead(event_type, 2) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS b
      FROM events
    )
    SELECT a, b, count(*) AS n
    FROM seq WHERE b IS NOT NULL
    GROUP BY a, b
    ORDER BY n DESC, a, b LIMIT 20
"""


@query("skipgram_transitions_events", _SKIPGRAM_SQL)
def skipgram_transitions_events(spark, sf_dir):
    """Gap-constrained sequential patterns: corpus-wide counts of
    A → * → B (exactly one intervening event) from a lead(2) frame over
    the same per-user sort ``journey_trigrams_top`` uses — the
    skip-gram features sequence models consume, one window + one
    aggregate, never a self-join."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("a"),
        F.lead("event_type", 2).over(w).alias("b"),
    )
    return (
        seq.filter(F.col("b").isNotNull())
        .groupBy("a", "b")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "a", "b")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Conversion latency percentiles (first view → first purchase)
# ---------------------------------------------------------------------------

_LATENCY_SQL = """
    WITH fv AS (
      SELECT user_id, min(epoch_us(ts)) AS v_us
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ), fp AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS p_us, any_value(fv.v_us) AS v_us
      FROM events e JOIN fv ON e.user_id = fv.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > fv.v_us
      GROUP BY e.user_id
    ), lat AS (
      SELECT user_id, p_us - v_us AS lat_us FROM fp
    ), ranked AS (
      SELECT lat_us, row_number() OVER (ORDER BY lat_us, user_id) AS rn
      FROM lat
    ), counts AS (
      SELECT (SELECT count(*) FROM fv) AS n_viewers,
             (SELECT count(*) FROM lat) AS n_converters
    )
    SELECT n_viewers, n_converters,
           round(n_converters::DOUBLE / n_viewers, 6) AS conv_rate,
           round((SELECT lat_us FROM ranked, counts
                  WHERE rn = (50 * n_converters - 1) // 100 + 1)::DOUBLE
                 / 1000000, 6) AS p50_latency_s,
           round((SELECT lat_us FROM ranked, counts
                  WHERE rn = (90 * n_converters - 1) // 100 + 1)::DOUBLE
                 / 1000000, 6) AS p90_latency_s
    FROM counts
"""


@query("conversion_latency_percentiles", _LATENCY_SQL)
def conversion_latency_percentiles(spark, sf_dir):
    """Funnel latency: per-user first view, first purchase strictly
    after it, exact p50/p90 of the latency distribution by rank pick.
    Converter count grows with the corpus, so the rank is NOT a global
    ``row_number`` window (round-5 VERDICT: one task would sort every
    converter at 100×) — it comes from range-bucketed
    ``exact_global_rank``, bit-identical output, parallel sort.
    Microsecond-integer epoch math, so both engines agree exactly."""
    from vmware_graph_spark.operators.rank import exact_global_rank

    ev = load_table(spark, sf_dir, "events")
    fv = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(F.unix_micros(F.col("ts").cast("timestamp"))).alias("v_us"))
    )
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .join(fv, "user_id")
        .filter(F.unix_micros(F.col("ts").cast("timestamp")) > F.col("v_us"))
        .groupBy("user_id")
        .agg(
            F.min(F.unix_micros(F.col("ts").cast("timestamp"))).alias("p_us"),
            F.first("v_us").alias("v_us"),
        )
    )
    # pin the converter table: it feeds the rank's cutpoint aggregate,
    # the converter count, and the percentile picks — without the cut
    # each consumer re-runs the two event scans + joins (round-6 review)
    # pinned() not localCheckpoint: recompute is pure over parquet, so
    # keep lineage for executor-loss recovery (round-7 VERDICT #2)
    from vmware_graph_spark.operators.pin import pinned

    lat = pinned(
        fp.select("user_id", (F.col("p_us") - F.col("v_us")).alias("lat_us"))
    )
    ranked = exact_global_rank(lat, ["lat_us", "user_id"], rank_col="rn")
    counts = fv.agg(F.count("*").alias("n_viewers")).crossJoin(
        lat.agg(F.count("*").alias("n_converters"))
    )
    p50 = (
        ranked.crossJoin(F.broadcast(counts.select("n_converters")))
        .filter(F.col("rn") == F.expr("div(50 * n_converters - 1, 100) + 1"))
        .select(F.col("lat_us").alias("p50_us"))
    )
    p90 = (
        ranked.crossJoin(F.broadcast(counts.select(F.col("n_converters").alias("nc"))))
        .filter(F.col("rn") == F.expr("div(90 * nc - 1, 100) + 1"))
        .select(F.col("lat_us").alias("p90_us"))
    )
    return (
        counts.crossJoin(F.broadcast(p50))
        .crossJoin(F.broadcast(p90))
        .select(
            "n_viewers",
            "n_converters",
            F.round(
                F.col("n_converters").cast("double") / F.col("n_viewers"), 6
            ).alias("conv_rate"),
            F.round(F.col("p50_us").cast("double") / 1000000, 6).alias(
                "p50_latency_s"
            ),
            F.round(F.col("p90_us").cast("double") / 1000000, 6).alias(
                "p90_latency_s"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Quality-gate calibration bins (reliability diagram)
# ---------------------------------------------------------------------------

_CALIB_SQL = r"""
    WITH feats AS (
      SELECT doc_id, lang,
             len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))::DOUBLE AS n_tok,
             round(len(regexp_replace(text, '[^.,;:!?]', '', 'g'))::DOUBLE
                   / greatest(len(text), 1), 6) AS punct,
             round(CASE WHEN len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) > 0
                   THEN len(list_filter(list_filter(string_split_regex(text, '\s+'), x -> x <> ''),
                            x -> list_contains(['the','a','an','and','or','of','to','in','is','it',
                                                'that','for','on','as','with','was','at','by','be','this',
                                                'are','from','not','but','have'], lower(x))))::DOUBLE
                        / len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
                   ELSE 0.0 END, 6) AS stop_ratio,
             round(len(text)::DOUBLE / greatest(
                   len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')), 1), 6) AS avg_tok_len
      FROM documents
    ),
    scored AS (
      SELECT doc_id, lang,
             round(least(greatest(
               0.25 * round(0.01 * n_tok - 4.0 * punct + 2.5 * stop_ratio
                            - 0.3 * avg_tok_len + 0.5, 6) + 0.5, 0.0), 1.0), 6) AS score
      FROM feats
    )
    SELECT CAST(floor(score * 10) AS INTEGER) AS bucket,
           count(*) AS n_docs,
           round(CAST(sum(CAST(score AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_score,
           round(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::DOUBLE / count(*), 6) AS frac_en
    FROM scored
    GROUP BY bucket ORDER BY bucket
"""


@query("score_calibration_bins", _CALIB_SQL)
def score_calibration_bins(spark, sf_dir):
    """Reliability diagram for the frozen quality gate: the same
    hard-sigmoid score as ``logreg_quality_score``, binned, with the
    empirical outcome rate (here: fraction of English docs) per bin —
    the calibration readout that tells you whether the gate's scores
    mean what they say before you trust its threshold. Mapper-only
    scoring, one 11-row aggregate."""
    from vmware_graph_spark.functions.text import (
        n_tokens,
        punct_ratio,
        stopword_ratio,
    )

    d = load_table(spark, sf_dir, "documents")
    feats = d.select(
        "doc_id",
        "lang",
        n_tokens("text").cast("double").alias("n_tok"),
        F.round(punct_ratio("text"), 6).alias("punct"),
        F.round(stopword_ratio("text"), 6).alias("stop_ratio"),
        F.round(
            F.length("text").cast("double")
            / F.greatest(n_tokens("text"), F.lit(1)).cast("double"),
            6,
        ).alias("avg_tok_len"),
    )
    z = F.round(
        0.01 * F.col("n_tok")
        - 4.0 * F.col("punct")
        + 2.5 * F.col("stop_ratio")
        - 0.3 * F.col("avg_tok_len")
        + 0.5,
        6,
    )
    score = F.round(F.least(F.greatest(0.25 * z + 0.5, F.lit(0.0)), F.lit(1.0)), 6)
    scored = feats.select("doc_id", "lang", score.alias("score"))
    return (
        scored.groupBy(F.floor(F.col("score") * 10).cast("int").alias("bucket"))
        .agg(
            F.count("*").alias("n_docs"),
            F.round(
                F.sum(F.col("score").cast("decimal(18,6)")).cast("double")
                / F.count("*"),
                6,
            ).alias("avg_score"),
            F.round(
                F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).cast("double")
                / F.count("*"),
                6,
            ).alias("frac_en"),
        )
        .orderBy("bucket")
    )
