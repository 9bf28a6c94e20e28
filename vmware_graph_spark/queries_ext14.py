"""Round-5 extensions, batch 12: uplift deciles and matched-pairs ATT.

Same registry/oracle discipline as ``queries.py``; see
``queries_ext3.py`` for the shared numeric-determinism rules.

Scale notes (100 TB):

- Both operators run on the per-user pre/post aggregate (one shuffle
  over raw events, shared shape with the CUPED family); every window
  after that is over |users| rows, not events.
- ``matched_pairs_att`` matches each treated user to its
  nearest-covariate control with ONE merged sort + carry-forward/
  backward windows (the as-of join shape) — never the |A|×|B| distance
  matrix.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from vmware_graph_spark.queries import query
from vmware_graph_spark.sources.tables import load_table

_SPLIT = "TIMESTAMP '2024-01-16 00:00:00'"

_PER_USER_SQL = f"""
      SELECT user_id,
             CASE WHEN ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)),
                        1, 15))::BIGINT % 2 = 0
                  THEN 'A' ELSE 'B' END AS cohort,
             coalesce(sum(CASE WHEN ts < {_SPLIT}
                           THEN round(value, 2)::DECIMAL(18,2) END),
                      0::DECIMAL(18,2)) AS x,
             coalesce(sum(CASE WHEN ts >= {_SPLIT}
                           THEN round(value, 2)::DECIMAL(18,2) END),
                      0::DECIMAL(18,2)) AS y
      FROM events WHERE value IS NOT NULL GROUP BY user_id
"""

# ---------------------------------------------------------------------------
# Uplift deciles (Qini-table shape)
# ---------------------------------------------------------------------------

_UPLIFT_SQL = f"""
    WITH per_user AS ({_PER_USER_SQL}),
    ranked AS (
      SELECT *, ntile(10) OVER (ORDER BY x DESC, user_id) AS decile
      FROM per_user
    )
    SELECT decile,
           CAST(sum(CASE WHEN cohort = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           CAST(sum(CASE WHEN cohort = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
           round(sum(CASE WHEN cohort = 'A' THEN y END)::DOUBLE
                 / sum(CASE WHEN cohort = 'A' THEN 1 ELSE 0 END), 6) AS mean_y_a,
           round(sum(CASE WHEN cohort = 'B' THEN y END)::DOUBLE
                 / sum(CASE WHEN cohort = 'B' THEN 1 ELSE 0 END), 6) AS mean_y_b,
           round(sum(CASE WHEN cohort = 'A' THEN y END)::DOUBLE
                 / sum(CASE WHEN cohort = 'A' THEN 1 ELSE 0 END)
                 - sum(CASE WHEN cohort = 'B' THEN y END)::DOUBLE
                 / sum(CASE WHEN cohort = 'B' THEN 1 ELSE 0 END), 6) + 0
             AS uplift
    FROM ranked
    GROUP BY decile
    HAVING sum(CASE WHEN cohort = 'A' THEN 1 ELSE 0 END) > 0
       AND sum(CASE WHEN cohort = 'B' THEN 1 ELSE 0 END) > 0
    ORDER BY decile
"""


@query("uplift_deciles", _UPLIFT_SQL)
def uplift_deciles(spark, sf_dir):
    """Uplift decile table (the Qini-curve input): users ranked by
    pre-period spend into deciles, per-decile treated-minus-control
    post-period means — where the uplift concentrates tells you who to
    target. Same hash cohorts and period split as the CUPED/DiD/z-test
    family.

    No global window (round-5 VERDICT: the former unpartitioned
    ``ntile(10)`` serialized every user through one task — the
    per-user table grows with the corpus): the exact rank under
    ``ORDER BY x DESC, user_id`` comes from range-bucketed
    ``exact_global_rank`` (descending via negated key), and
    ``ntile_from_rank`` reconstructs the SQL ntile split in closed
    form — bit-identical to the oracle's window."""
    from vmware_graph_spark.operators.rank import exact_global_rank, ntile_from_rank

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
        .withColumn(
            "cohort",
            F.when(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(F.lit("ab:"), F.col("user_id").cast("string"))
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % 2
                == 0,
                "A",
            ).otherwise("B"),
        )
    )
    # pin the reduced per-user table: it feeds the count, the rank's
    # cutpoint aggregate, and the final DAG — without the cut each one
    # re-runs the full events scan + groupBy (round-6 review).
    # pinned() not localCheckpoint: user-scale table, lineage must
    # survive executor loss (round-7 VERDICT #2)
    from vmware_graph_spark.operators.pin import pinned

    per_user = pinned(per_user)
    n_users = per_user.count()
    ranked = exact_global_rank(
        per_user.withColumn("__negx", -F.col("x")),
        ["__negx", "user_id"],
        rank_col="__r",
    ).withColumn("decile", ntile_from_rank(F.col("__r"), n_users, 10))
    na = F.sum(F.when(F.col("cohort") == "A", 1).otherwise(0))
    nb = F.sum(F.when(F.col("cohort") == "B", 1).otherwise(0))
    ya = F.sum(F.when(F.col("cohort") == "A", F.col("y"))).cast("double")
    yb = F.sum(F.when(F.col("cohort") == "B", F.col("y"))).cast("double")
    return (
        ranked.groupBy("decile")
        .agg(
            na.cast("bigint").alias("n_a"),
            nb.cast("bigint").alias("n_b"),
            F.round(ya / na, 6).alias("mean_y_a"),
            F.round(yb / nb, 6).alias("mean_y_b"),
            (F.round(ya / na - yb / nb, 6) + 0).alias("uplift"),
        )
        .filter((F.col("n_a") > 0) & (F.col("n_b") > 0))
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# Matched-pairs ATT (nearest-covariate control via merged sort)
# ---------------------------------------------------------------------------

_ATT_SQL = f"""
    WITH per_user AS ({_PER_USER_SQL}),
    merged AS (
      SELECT *,
             CASE WHEN cohort = 'B' THEN user_id END AS b_id,
             CASE WHEN cohort = 'B' THEN x END AS b_x,
             CASE WHEN cohort = 'B' THEN y END AS b_y
      FROM per_user
    ), carried AS (
      SELECT *,
             last_value(b_id IGNORE NULLS) OVER w AS prev_b,
             last_value(b_x IGNORE NULLS) OVER w AS prev_bx,
             last_value(b_y IGNORE NULLS) OVER w AS prev_by,
             first_value(b_id IGNORE NULLS) OVER wf AS next_b,
             first_value(b_x IGNORE NULLS) OVER wf AS next_bx,
             first_value(b_y IGNORE NULLS) OVER wf AS next_by
      FROM merged
      WINDOW w AS (ORDER BY x, user_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             wf AS (ORDER BY x, user_id
                    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
    ), matched AS (
      SELECT user_id, x, y,
             CASE WHEN prev_b IS NULL THEN next_by
                  WHEN next_b IS NULL THEN prev_by
                  WHEN (x - prev_bx) <= (next_bx - x) THEN prev_by
                  ELSE next_by END AS my,
             CASE WHEN prev_b IS NULL THEN next_bx
                  WHEN next_b IS NULL THEN prev_bx
                  WHEN (x - prev_bx) <= (next_bx - x) THEN prev_bx
                  ELSE next_bx END AS mx
      FROM carried WHERE cohort = 'A'
    )
    SELECT CAST(count(*) AS BIGINT) AS n_matched,
           round(sum(y - my)::DOUBLE / count(*), 6) + 0 AS att,
           round(sum(abs(x - mx))::DOUBLE / count(*), 6) AS mean_covariate_gap
    FROM matched WHERE my IS NOT NULL
"""


@query("matched_pairs_att", _ATT_SQL)
def matched_pairs_att(spark, sf_dir):
    """Matched-pairs average treatment effect on the treated: each
    treated (cohort A) user pairs with the control whose pre-period
    covariate is nearest — found with ONE merged sort + carry-forward/
    backward IGNORE NULLS carries (the as-of join shape), never an
    |A|×|B| distance matrix. ATT = mean matched post-period difference;
    the covariate gap reports match quality. Decimal-exact sums
    throughout.

    The carries are NOT global windows (round-5 VERDICT: two
    unpartitioned ``last(..., ignorenulls)`` windows serialized every
    user through one task): ``operators.rank.bucketed_carry`` runs
    them per range bucket with a ≤buckets-row broadcast boundary
    fixup — bit-identical to the oracle's global windows."""
    from vmware_graph_spark.operators.rank import bucketed_carry

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
        .withColumn(
            "cohort",
            F.when(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(F.lit("ab:"), F.col("user_id").cast("string"))
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % 2
                == 0,
                "A",
            ).otherwise("B"),
        )
    )
    merged = per_user.select(
        "user_id",
        "cohort",
        "x",
        "y",
        F.when(F.col("cohort") == "B", F.col("user_id")).alias("b_id"),
        F.when(F.col("cohort") == "B", F.col("x")).alias("b_x"),
        F.when(F.col("cohort") == "B", F.col("y")).alias("b_y"),
    )
    # pin: merged feeds the carry's cutpoint aggregate AND the main
    # window DAG — one events scan, not two (round-6 review).
    # pinned() not localCheckpoint: lineage kept for executor-loss
    # recovery (round-7 VERDICT #2)
    from vmware_graph_spark.operators.pin import pinned

    merged = pinned(merged)
    carried = bucketed_carry(
        merged,
        ["x", "user_id"],
        ["b_id", "b_x", "b_y"],
        prev_prefix="prev_",
        next_prefix="next_",
    ).withColumnsRenamed(
        {
            "prev_b_id": "prev_b",
            "prev_b_x": "prev_bx",
            "prev_b_y": "prev_by",
            "next_b_id": "next_b",
            "next_b_x": "next_bx",
            "next_b_y": "next_by",
        }
    )
    use_prev = (
        F.col("next_b").isNull()
        | (
            F.col("prev_b").isNotNull()
            & ((F.col("x") - F.col("prev_bx")) <= (F.col("next_bx") - F.col("x")))
        )
    )
    matched = carried.filter(F.col("cohort") == "A").select(
        "x",
        "y",
        F.when(F.col("prev_b").isNull(), F.col("next_by"))
        .when(use_prev, F.col("prev_by"))
        .otherwise(F.col("next_by"))
        .alias("my"),
        F.when(F.col("prev_b").isNull(), F.col("next_bx"))
        .when(use_prev, F.col("prev_bx"))
        .otherwise(F.col("next_bx"))
        .alias("mx"),
    )
    return matched.filter(F.col("my").isNotNull()).agg(
        F.count("*").cast("bigint").alias("n_matched"),
        (
            F.round(F.sum(F.col("y") - F.col("my")).cast("double") / F.count("*"), 6)
            + 0
        ).alias("att"),
        F.round(
            F.sum(F.abs(F.col("x") - F.col("mx"))).cast("double") / F.count("*"), 6
        ).alias("mean_covariate_gap"),
    )
