"""Round-5 extensions, batch 11: cluster-sampling design effects,
lexical diversity, peak detection, and effective dimensionality.

Same registry/oracle discipline as ``queries.py``; see
``queries_ext3.py`` for the shared numeric-determinism rules.

Scale notes (100 TB):

- ``cluster_sampling_design_effect`` is survey methodology in-engine:
  intraclass correlation from ANOVA sums (all decimal-exact) and the
  design effect 1+(m̄−1)·ICC that tells you how much clustered
  sampling inflates variance — the number that sizes an eval sample
  drawn by cluster (file, shard, source) instead of i.i.d.
- ``type_token_ratio_by_source`` computes lexical diversity (TTR,
  hapax fraction) per corpus slice from the token histogram — no libm,
  one shuffle.
- ``daily_peaks_value`` finds strict local maxima with prominence on
  the day-grain series — lag/lead over the bounded aggregate.
- ``effective_dim_embeddings`` is the participation ratio
  (Σλ)²/Σλ² over per-dim variances: how many dimensions the embedding
  space REALLY uses — the diagnostic behind matryoshka truncation
  choices. One d-cell reduction, one row out.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from vmware_graph_spark.queries import query
from vmware_graph_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# Cluster-sampling design effect (ICC + deff) over nation clusters
# ---------------------------------------------------------------------------

_DEFF_SQL = """
    WITH y AS (
      SELECT c_nationkey AS cl, round(c_acctbal, 2)::DECIMAL(18,2) AS v
      FROM customer
    ), per_cl AS (
      SELECT cl, CAST(count(*) AS BIGINT) AS n, sum(v) AS s, sum(v * v) AS ss
      FROM y GROUP BY cl
    ), g AS (
      SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS nn,
             CAST(sum(s) AS DOUBLE) AS st, CAST(sum(ss) AS DOUBLE) AS sst,
             CAST(sum((s * s)::DOUBLE / n) AS DOUBLE) AS sb
      FROM per_cl
    ), f AS (
      SELECT k, nn,
             (sb - (st * st) / nn) / (k - 1) AS msb,
             ((sst - (st * st) / nn) - (sb - (st * st) / nn)) / (nn - k) AS msw,
             nn::DOUBLE / k AS mbar
      FROM g
    )
    SELECT k AS n_clusters, nn AS n_rows,
           round((msb - msw) / (msb + (mbar - 1) * msw), 6) + 0 AS icc,
           round(1 + (mbar - 1)
                 * ((msb - msw) / (msb + (mbar - 1) * msw)), 6) + 0 AS deff
    FROM f
"""


@query("cluster_sampling_design_effect", _DEFF_SQL)
def cluster_sampling_design_effect(spark, sf_dir):
    """Design effect of cluster sampling (clusters = nations, outcome =
    account balance): intraclass correlation from the ANOVA
    between/within mean squares — all sums decimal-exact, the final
    formula pinned-order doubles — and deff = 1 + (m̄−1)·ICC, the
    variance-inflation factor that tells you how much larger a
    cluster-drawn eval sample must be than an i.i.d. one. One per-
    cluster reduction + one fold of the k-row summary."""
    y = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("cl"),
        F.round("c_acctbal", 2).cast("decimal(18,2)").alias("v"),
    )
    per_cl = y.groupBy("cl").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("ss"),
    )
    g = per_cl.agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("s").cast("double").alias("st"),
        F.sum("ss").cast("double").alias("sst"),
        F.sum((F.col("s") * F.col("s")).cast("double") / F.col("n")).alias("sb"),
    )
    msb = (F.col("sb") - (F.col("st") * F.col("st")) / F.col("nn")) / (F.col("k") - 1)
    ssw = (F.col("sst") - (F.col("st") * F.col("st")) / F.col("nn")) - (
        F.col("sb") - (F.col("st") * F.col("st")) / F.col("nn")
    )
    msw = ssw / (F.col("nn") - F.col("k"))
    mbar = F.col("nn").cast("double") / F.col("k")
    icc = (msb - msw) / (msb + (mbar - 1) * msw)
    return g.select(
        F.col("k").alias("n_clusters"),
        F.col("nn").alias("n_rows"),
        (F.round(icc, 6) + 0).alias("icc"),
        (F.round(1 + (mbar - 1) * icc, 6) + 0).alias("deff"),
    )


# ---------------------------------------------------------------------------
# Lexical diversity per corpus slice
# ---------------------------------------------------------------------------

_TTR_SQL = r"""
    WITH t AS (
      SELECT source,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
      FROM documents
    ), uni AS (
      SELECT source, tok, CAST(count(*) AS BIGINT) AS n
      FROM t, UNNEST(toks) AS u(tok) GROUP BY source, tok
    )
    SELECT source,
           CAST(sum(n) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_types,
           round(count(*)::DOUBLE / sum(n), 6) AS ttr,
           round(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)::DOUBLE
                 / count(*), 6) AS hapax_frac
    FROM uni GROUP BY source ORDER BY source
"""


@query("type_token_ratio_by_source", _TTR_SQL)
def type_token_ratio_by_source(spark, sf_dir):
    """Lexical diversity per corpus slice: type-token ratio and hapax
    (frequency-1) fraction from the per-source token histogram — the
    libm-free diversity features that flag boilerplate-heavy or
    synthetic slices next to ``oov_rate_by_source``. One explode + one
    hash shuffle; everything after runs on the histogram."""
    t = load_table(spark, sf_dir, "documents").select(
        "source",
        F.explode(F.filter(F.split("text", r"\s+"), lambda x: x != "")).alias("tok"),
    )
    uni = t.groupBy("source", "tok").agg(F.count("*").cast("bigint").alias("n"))
    return (
        uni.groupBy("source")
        .agg(
            F.sum("n").cast("bigint").alias("n_tokens"),
            F.count("*").cast("bigint").alias("n_types"),
            F.round(F.count("*").cast("double") / F.sum("n"), 6).alias("ttr"),
            F.round(
                F.sum(F.when(F.col("n") == 1, 1).otherwise(0)).cast("double")
                / F.count("*"),
                6,
            ).alias("hapax_frac"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Local-maxima peak detection with prominence on the daily series
# ---------------------------------------------------------------------------

_PEAKS_SQL = """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             sum(round(value, 2)::DECIMAL(18,2)) AS tot
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ), w AS (
      SELECT day, tot,
             lag(tot) OVER (ORDER BY day) AS prev,
             lead(tot) OVER (ORDER BY day) AS nxt
      FROM daily
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, tot::DOUBLE AS total,
           CAST(least(tot - prev, tot - nxt) AS DOUBLE) AS prominence
    FROM w
    WHERE prev IS NOT NULL AND nxt IS NOT NULL
      AND tot > prev AND tot > nxt
    ORDER BY day
"""


@query("daily_peaks_value", _PEAKS_SQL)
def daily_peaks_value(spark, sf_dir):
    """Peak detection: strict local maxima of the daily value series
    with min-neighbor prominence — the spike candidates an alerting
    pipeline feeds to ``seasonal_dow_anomalies`` for confirmation.
    Lag/lead over the bounded day-grain aggregate; decimal totals keep
    the comparisons exact."""
    daily = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.sum(F.round("value", 2).cast("decimal(18,2)")).alias("tot"))
    )
    w = Window.orderBy("day")
    d = daily.select(
        "day",
        "tot",
        F.lag("tot").over(w).alias("prev"),
        F.lead("tot").over(w).alias("nxt"),
    )
    return (
        d.filter(
            F.col("prev").isNotNull()
            & F.col("nxt").isNotNull()
            & (F.col("tot") > F.col("prev"))
            & (F.col("tot") > F.col("nxt"))
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("tot").cast("double").alias("total"),
            F.least(
                F.col("tot") - F.col("prev"), F.col("tot") - F.col("nxt")
            )
            .cast("double")
            .alias("prominence"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Effective dimensionality (participation ratio) of the embeddings
# ---------------------------------------------------------------------------

_EFFD_D = 64

_EFFD_SQL = f"""
    WITH dim AS (
      SELECT u.i - 1 AS i, round(embedding[u.i], 6)::DECIMAL(18,6) AS x
      FROM embeddings, UNNEST(range(1, {_EFFD_D + 1})) AS u(i)
    ), st AS (
      SELECT i, sum(x) AS sx, sum(x * x) AS sxx, count(*) AS n
      FROM dim GROUP BY i
    ), vr AS (
      SELECT i,
             round((sxx::DOUBLE - (sx::DOUBLE * sx::DOUBLE) / n) / (n - 1), 12)
               ::DECIMAL(28,12) AS v,
             round(round((sxx::DOUBLE - (sx::DOUBLE * sx::DOUBLE) / n)
                         / (n - 1), 12)
                   * round((sxx::DOUBLE - (sx::DOUBLE * sx::DOUBLE) / n)
                           / (n - 1), 12), 18)::DECIMAL(38,18) AS v2
      FROM st
    )
    SELECT CAST(count(*) AS BIGINT) AS n_dims,
           round(CAST(sum(v) AS DOUBLE), 6) AS total_variance,
           round((CAST(sum(v) AS DOUBLE) * CAST(sum(v) AS DOUBLE))
                 / CAST(sum(v2) AS DOUBLE), 6) AS participation_ratio
    FROM vr
"""


@query("effective_dim_embeddings", _EFFD_SQL)
def effective_dim_embeddings(spark, sf_dir):
    """Effective dimensionality of the embedding space: the
    participation ratio (Σλᵢ)²/Σλᵢ² over per-dimension variances —
    d when all dims carry equal variance, ~1 when one dominates. The
    diagnostic that justifies (or vetoes) matryoshka truncation
    (``matryoshka_topk_embeddings``'s 16-dim tier). Per-dim variances
    reduce decimal-exact; rounded to 12 decimals and re-accumulated as
    decimals so the 64-term folds match across engines."""
    dim = (
        load_table(spark, sf_dir, "embeddings")
        .select(F.posexplode(F.slice("embedding", 1, _EFFD_D)).alias("i", "x"))
        .select("i", F.round("x", 6).cast("decimal(18,6)").alias("x"))
    )
    st = dim.groupBy("i").agg(
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.count("*").alias("n"),
    )
    vd = F.round(
        (
            F.col("sxx").cast("double")
            - (F.col("sx").cast("double") * F.col("sx").cast("double")) / F.col("n")
        )
        / (F.col("n") - 1),
        12,
    )
    vr = st.select(
        vd.cast("decimal(28,12)").alias("v"),
        F.round(vd * vd, 18).cast("decimal(38,18)").alias("v2"),
    )
    return vr.agg(
        F.count("*").cast("bigint").alias("n_dims"),
        F.round(F.sum("v").cast("double"), 6).alias("total_variance"),
        F.round(
            (F.sum("v").cast("double") * F.sum("v").cast("double"))
            / F.sum("v2").cast("double"),
            6,
        ).alias("participation_ratio"),
    )
