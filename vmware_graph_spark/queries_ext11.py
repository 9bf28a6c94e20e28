"""Round-5 extensions, batch 9: AUC model evaluation, cross-source
quantile normalization, difference-in-differences, and seasonal-naive
forecast backtesting.

Same registry/oracle discipline as ``queries.py``; see
``queries_ext3.py`` for the shared numeric-determinism rules.

Scale notes (100 TB):

- ``auc_quality_vs_lang`` computes ROC-AUC as the Mann-Whitney U from
  tie-corrected midranks — doubled midranks keep EVERYTHING integer
  until the final division, and the ranks run over the distinct-score
  histogram (already reduced), never row-at-a-time.
- ``quantile_normalize_by_source`` maps each source's value
  distribution onto the pooled distribution by exact rank arithmetic
  (ceil(r·N/n_s) index pick) — the batch-effect correction that makes
  heterogeneous sources comparable; one rank window per side + an
  integer-key equi-join.
- ``did_estimate_value`` is the difference-in-differences causal
  readout over the hash-assigned cohorts and the CUPED period split:
  four decimal-exact cell means, one pinned-order double expression.
- ``seasonal_naive_backtest`` backtests the simplest seasonal
  forecaster (value(d) ≈ value(d−7)) with per-day absolute percentage
  errors — lag(7) over the day-grain aggregate, the baseline any real
  forecaster must beat.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from vmware_graph_spark.operators.rank import exact_global_rank
from vmware_graph_spark.queries import query
from vmware_graph_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# ROC-AUC of the quality score against the English-language outcome
# ---------------------------------------------------------------------------

_AUC_SQL = r"""
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
    ), scored AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
             round(least(greatest(
               0.25 * round(0.01 * n_tok - 4.0 * punct + 2.5 * stop_ratio
                            - 0.3 * avg_tok_len + 0.5, 6) + 0.5, 0.0), 1.0), 6) AS score
      FROM feats
    ), hist AS (
      SELECT score, CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(y) AS BIGINT) AS pos
      FROM scored GROUP BY score
    ), ranked AS (
      SELECT score, cnt, pos,
             coalesce(sum(cnt) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      FROM hist
    ), agg AS (
      SELECT CAST(sum(pos * (2 * cum_before + cnt + 1)) AS BIGINT) AS s2,
             CAST(sum(pos) AS BIGINT) AS n1,
             CAST(sum(cnt - pos) AS BIGINT) AS n0
      FROM ranked
    )
    SELECT n1 AS n_pos, n0 AS n_neg,
           round((s2 - n1 * (n1 + 1))::DOUBLE / (2 * n1 * n0), 6) AS auc
    FROM agg
"""


@query("auc_quality_vs_lang", _AUC_SQL)
def auc_quality_vs_lang(spark, sf_dir):
    """ROC-AUC of the frozen quality score against the English-doc
    outcome, as the tie-corrected Mann-Whitney U: per-distinct-score
    counts give midranks (doubled so everything stays INTEGER — the .5
    midranks of ties never touch floats), U₂ = 2·ΣposRank − n₁(n₁+1),
    AUC = U₂ / (2·n₁·n₀). Ranks window over the score histogram, not
    rows. Completes the model-eval set with
    ``score_calibration_bins``."""
    from vmware_graph_spark.functions.text import (
        n_tokens,
        punct_ratio,
        stopword_ratio,
    )

    d = load_table(spark, sf_dir, "documents")
    feats = d.select(
        (F.col("lang") == "en").cast("int").alias("y"),
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
    scored = feats.select("y", score.alias("score"))
    hist = scored.groupBy("score").agg(
        F.count("*").cast("bigint").alias("cnt"),
        F.sum("y").cast("bigint").alias("pos"),
    )
    wc = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    ranked = hist.withColumn(
        "cum_before", F.coalesce(F.sum("cnt").over(wc), F.lit(0))
    )
    agg = ranked.agg(
        F.sum(
            F.col("pos") * (2 * F.col("cum_before") + F.col("cnt") + 1)
        )
        .cast("bigint")
        .alias("s2"),
        F.sum("pos").cast("bigint").alias("n1"),
        F.sum(F.col("cnt") - F.col("pos")).cast("bigint").alias("n0"),
    )
    return agg.select(
        F.col("n1").alias("n_pos"),
        F.col("n0").alias("n_neg"),
        F.round(
            (F.col("s2") - F.col("n1") * (F.col("n1") + 1)).cast("double")
            / (2 * F.col("n1") * F.col("n0")),
            6,
        ).alias("auc"),
    )


# ---------------------------------------------------------------------------
# Cross-source quantile normalization
# ---------------------------------------------------------------------------

_QNORM_SQL = """
    WITH v AS (
      SELECT source, doc_id, CAST(n_chars AS BIGINT) AS x FROM documents
    ), g AS (
      SELECT x, row_number() OVER (ORDER BY x, doc_id) AS rg,
             count(*) OVER () AS nn
      FROM v
    ), s AS (
      SELECT source, doc_id, x,
             row_number() OVER (PARTITION BY source ORDER BY x, doc_id) AS rs,
             count(*) OVER (PARTITION BY source) AS ns
      FROM v
    ), mapped AS (
      SELECT s.source, s.x AS before_x, g.x AS after_x
      FROM s JOIN g
        ON g.rg = (s.rs * g.nn + s.ns - 1) // s.ns
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n,
           round(sum(before_x)::DOUBLE / count(*), 6) AS mean_before,
           round(sum(after_x)::DOUBLE / count(*), 6) AS mean_after
    FROM mapped GROUP BY source ORDER BY source
"""


@query("quantile_normalize_by_source", _QNORM_SQL)
def quantile_normalize_by_source(spark, sf_dir):
    """Quantile normalization across sources (batch-effect correction):
    each source's k-th order statistic maps to the pooled
    distribution's value at exact rank ceil(r·N/n_s) — pure integer
    rank arithmetic, one window per side, one integer-key equi-join.
    After normalization every source draws from the same empirical
    distribution; the per-source means converging is the visible
    effect. The doc-size column stands in for any skewed per-source
    metric."""
    v = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", F.col("n_chars").cast("bigint").alias("x")
    )
    # Pooled rank: range-bucketed exact rank (operators/rank.py) — no
    # single-task ORDER BY window over the corpus.
    g = exact_global_rank(
        v.select(F.col("x").alias("gx"), "doc_id"), ["gx", "doc_id"], rank_col="rg"
    ).select("gx", "rg")
    # Per-source rank: same operator partitioned by source, so a huge
    # source never funnels through one task either.
    tot = v.agg(F.count("*").cast("bigint").alias("nn"))
    ns = v.groupBy("source").agg(F.count("*").cast("bigint").alias("ns"))
    s = (
        exact_global_rank(
            v, ["x", "doc_id"], rank_col="rs", partition_cols=["source"]
        )
        .join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "tkey", F.expr("div(rs * nn + ns - 1, ns)").cast("bigint")
        )
    )
    # All computed-key inputs live on the s side → true equi-join on
    # (rg = tkey), hashable and AQE-skew-splittable at scale.
    mapped = s.join(g, F.col("rg") == F.col("tkey"))
    return (
        mapped.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.sum("x").cast("double") / F.count("*"), 6).alias(
                "mean_before"
            ),
            F.round(F.sum("gx").cast("double") / F.count("*"), 6).alias(
                "mean_after"
            ),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Difference-in-differences over hash cohorts and the period split
# ---------------------------------------------------------------------------

_DID_SQL = """
    WITH cells AS (
      SELECT CASE WHEN ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)),
                        1, 15))::BIGINT % 2 = 0
                  THEN 'A' ELSE 'B' END AS cohort,
             CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                  THEN 'pre' ELSE 'post' END AS period,
             round(value, 2)::DECIMAL(18,2) AS v
      FROM events WHERE value IS NOT NULL
    ), m AS (
      SELECT cohort, period, sum(v) AS s, CAST(count(*) AS BIGINT) AS n
      FROM cells GROUP BY cohort, period
    ), wide AS (
      SELECT max(CASE WHEN cohort = 'A' AND period = 'pre' THEN s::DOUBLE / n END) AS a_pre,
             max(CASE WHEN cohort = 'A' AND period = 'post' THEN s::DOUBLE / n END) AS a_post,
             max(CASE WHEN cohort = 'B' AND period = 'pre' THEN s::DOUBLE / n END) AS b_pre,
             max(CASE WHEN cohort = 'B' AND period = 'post' THEN s::DOUBLE / n END) AS b_post
      FROM m
    )
    SELECT round(a_pre, 6) AS a_pre, round(a_post, 6) AS a_post,
           round(b_pre, 6) AS b_pre, round(b_post, 6) AS b_post,
           round((a_post - a_pre) - (b_post - b_pre), 6) + 0 AS did
    FROM wide
"""


@query("did_estimate_value", _DID_SQL)
def did_estimate_value(spark, sf_dir):
    """Difference-in-differences: the treatment effect estimate
    (A_post − A_pre) − (B_post − B_pre) over the same hash-assigned
    cohorts and period split the CUPED/z-test family uses — the causal
    readout when only one cohort was treated after the split. Four
    decimal-exact cell means from ONE aggregation, then a pinned-order
    double expression."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
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
    period = F.when(
        F.col("ts") < F.lit("2024-01-16 00:00:00").cast("timestamp"), "pre"
    ).otherwise("post")
    m = ev.groupBy(cohort.alias("cohort"), period.alias("period")).agg(
        F.sum(F.round("value", 2).cast("decimal(18,2)")).alias("s"),
        F.count("*").cast("bigint").alias("n"),
    )
    mean = F.col("s").cast("double") / F.col("n")

    def cell(c, p):
        return F.max(
            F.when((F.col("cohort") == c) & (F.col("period") == p), mean)
        )

    wide = m.agg(
        cell("A", "pre").alias("a_pre"),
        cell("A", "post").alias("a_post"),
        cell("B", "pre").alias("b_pre"),
        cell("B", "post").alias("b_post"),
    )
    return wide.select(
        F.round("a_pre", 6).alias("a_pre"),
        F.round("a_post", 6).alias("a_post"),
        F.round("b_pre", 6).alias("b_pre"),
        F.round("b_post", 6).alias("b_post"),
        (
            F.round(
                (F.col("a_post") - F.col("a_pre"))
                - (F.col("b_post") - F.col("b_pre")),
                6,
            )
            + 0
        ).alias("did"),
    )


# ---------------------------------------------------------------------------
# Seasonal-naive forecast backtest (value(d) ~ value(d-7))
# ---------------------------------------------------------------------------

_BACKTEST_SQL = """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             sum(round(value, 2)::DECIMAL(18,2)) AS tot
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ), f AS (
      SELECT day, tot,
             lag(tot, 7) OVER (ORDER BY day) AS fc
      FROM daily
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           tot::DOUBLE AS actual, fc::DOUBLE AS forecast,
           round(abs((tot - fc)::DOUBLE) / tot::DOUBLE, 6) AS ape
    FROM f WHERE fc IS NOT NULL ORDER BY day
"""


@query("seasonal_naive_backtest", _BACKTEST_SQL)
def seasonal_naive_backtest(spark, sf_dir):
    """Seasonal-naive forecast backtest: predict each day's total with
    the same weekday last week (lag 7 over the day-grain aggregate) and
    report per-day absolute percentage error — the baseline every real
    forecaster must beat, and the drift monitor when it suddenly
    degrades. Decimal daily totals keep the APE inputs exact."""
    daily = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.sum(F.round("value", 2).cast("decimal(18,2)")).alias("tot"))
    )
    f = daily.withColumn("fc", F.lag("tot", 7).over(Window.orderBy("day")))
    return (
        f.filter(F.col("fc").isNotNull())
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("tot").cast("double").alias("actual"),
            F.col("fc").cast("double").alias("forecast"),
            F.round(
                F.abs((F.col("tot") - F.col("fc")).cast("double"))
                / F.col("tot").cast("double"),
                6,
            ).alias("ape"),
        )
        .orderBy("day")
    )
