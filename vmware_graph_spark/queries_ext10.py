"""Round-5 extensions, batch 8: median imputation, Mahalanobis
embedding outliers, point-in-time training-matrix assembly, and KWIC
concordance.

Same registry/oracle discipline as ``queries.py``; see
``queries_ext3.py`` for the shared numeric-determinism rules.

Scale notes (100 TB):

- ``impute_event_values`` is the data-repair stage: per-group exact
  medians by rank pick (windows over each group once), broadcast back
  as fill values — imputation without a second full scan.
- ``mahalanobis_outliers_embeddings`` turns the per-dim moment table
  (same decimal-exact reduction as ``embedding_covariance_matrix``,
  diagonal only) into a standardized distance per vector; the per-dim
  terms round to 12 decimals and accumulate as exact decimals, so the
  distributed per-vector sum is partition-order-proof.
- ``training_matrix_pit_features`` assembles a leakage-free training
  matrix: every label row (purchase) carries features computed from a
  STRICTLY-BEFORE event-time RANGE frame (trailing 7-day counts/sums,
  lifetime count) — the point-in-time-correctness contract of a
  feature store, expressed as three frames over ONE per-user sort.
- ``kwic_concordance_top_token`` is keyword-in-context retrieval: the
  corpus's top token broadcast against positional postings, ±2-token
  windows sliced from the already-tokenized arrays.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from vmware_graph_spark.queries import query
from vmware_graph_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# Median imputation of missing event values
# ---------------------------------------------------------------------------

_IMPUTE_SQL = """
    WITH v AS (
      SELECT event_type, event_id, round(value, 2)::DECIMAL(18,2) AS val
      FROM events
    ), nn AS (
      SELECT event_type, event_id, val,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY val, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM v WHERE val IS NOT NULL
    ), med AS (
      SELECT event_type,
             max(CASE WHEN rn = (n + 1) // 2 THEN val END) AS med
      FROM nn GROUP BY event_type
    )
    SELECT v.event_type,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(CASE WHEN v.val IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_imputed,
           CAST(med AS DOUBLE) AS fill_value,
           round(CAST(sum(coalesce(v.val, med)) AS DOUBLE) / count(*), 6)
             AS mean_after
    FROM v JOIN med ON v.event_type = med.event_type
    GROUP BY v.event_type, med ORDER BY v.event_type
"""


@query("impute_event_values", _IMPUTE_SQL)
def impute_event_values(spark, sf_dir):
    """Median imputation (data repair): per-group exact lower median by
    rank pick fills the group's NULLs, and the report shows fill
    values, imputed counts, and the post-imputation mean from
    decimal-exact sums. The median table is |groups| rows broadcast
    back — no second scan of the raw data beyond the join."""
    v = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.round("value", 2).cast("decimal(18,2)").alias("val"),
    )
    nn = v.filter(F.col("val").isNotNull())
    w = Window.partitionBy("event_type").orderBy("val", "event_id")
    ranked = nn.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(Window.partitionBy("event_type"))
    )
    med = ranked.groupBy("event_type").agg(
        F.max(
            F.when(F.col("rn") == F.expr("div(n + 1, 2)"), F.col("val"))
        ).alias("med")
    )
    return (
        v.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "med")
        .agg(
            F.count("*").cast("bigint").alias("n_total"),
            F.sum(F.when(F.col("val").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_imputed"),
            F.round(
                F.sum(F.coalesce(F.col("val"), F.col("med"))).cast("double")
                / F.count("*"),
                6,
            ).alias("mean_after"),
        )
        .select(
            "event_type",
            "n_total",
            "n_imputed",
            F.col("med").cast("double").alias("fill_value"),
            "mean_after",
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Mahalanobis (diagonal) outliers over embeddings
# ---------------------------------------------------------------------------

_MAHA_D = 8
_MAHA_TOPK = 10

_MAHA_SQL = f"""
    WITH e AS (
      SELECT vec_id, embedding[1:{_MAHA_D}] AS v FROM embeddings
    ), dim AS (
      SELECT vec_id, u.i - 1 AS i, round(v[u.i], 6)::DECIMAL(18,6) AS x
      FROM e, UNNEST(range(1, {_MAHA_D + 1})) AS u(i)
    ), st AS (
      SELECT i, sum(x) AS sx, sum(x * x) AS sxx, count(*) AS n
      FROM dim GROUP BY i
    ), terms AS (
      SELECT dim.vec_id,
             round(
               (dim.x::DOUBLE - st.sx::DOUBLE / st.n)
               * (dim.x::DOUBLE - st.sx::DOUBLE / st.n)
               / ((st.sxx::DOUBLE - (st.sx::DOUBLE * st.sx::DOUBLE) / st.n)
                  / (st.n - 1)), 12)::DECIMAL(28,12) AS t
      FROM dim JOIN st ON dim.i = st.i
    )
    SELECT vec_id, round(CAST(sum(t) AS DOUBLE), 6) AS md2
    FROM terms GROUP BY vec_id
    ORDER BY md2 DESC, vec_id LIMIT {_MAHA_TOPK}
"""


@query("mahalanobis_outliers_embeddings", _MAHA_SQL)
def mahalanobis_outliers_embeddings(spark, sf_dir):
    """Diagonal-covariance Mahalanobis outlier scan over the leading
    embedding dims: per-dim mean/variance from decimal-exact moments
    (one d-row broadcast), then md² = Σ (x−μ)²/σ² per vector with each
    term rounded to 12 decimals and accumulated as exact decimals —
    the distributed per-vector sum cannot drift with partition order.
    Top-k standardized-distance anomalies, the embedding-space health
    check before indexing a corpus."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.slice("embedding", 1, _MAHA_D).alias("v")
    )
    dim = e.select(
        "vec_id", F.posexplode("v").alias("i", "x")
    ).select("vec_id", "i", F.round("x", 6).cast("decimal(18,6)").alias("x"))
    st = dim.groupBy("i").agg(
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.count("*").alias("n"),
    )
    mu = F.col("sx").cast("double") / F.col("n")
    var = (
        F.col("sxx").cast("double")
        - (F.col("sx").cast("double") * F.col("sx").cast("double")) / F.col("n")
    ) / (F.col("n") - 1)
    terms = dim.join(F.broadcast(st), "i").select(
        "vec_id",
        F.round(
            (F.col("x").cast("double") - mu) * (F.col("x").cast("double") - mu) / var,
            12,
        )
        .cast("decimal(28,12)")
        .alias("t"),
    )
    return (
        terms.groupBy("vec_id")
        .agg(F.round(F.sum("t").cast("double"), 6).alias("md2"))
        .orderBy(F.desc("md2"), "vec_id")
        .limit(_MAHA_TOPK)
    )


# ---------------------------------------------------------------------------
# Point-in-time training-matrix assembly
# ---------------------------------------------------------------------------

_PIT_7D_US = 7 * 24 * 3600 * 1_000_000

_PIT_SQL = f"""
    WITH ev AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
             round(value, 2)::DECIMAL(18,2) AS val
      FROM events
    ), feat AS (
      SELECT event_id, user_id, event_type,
             CAST(count(*) OVER w7 AS BIGINT) AS f_cnt_7d,
             CAST(coalesce(sum(val) OVER w7, 0::DECIMAL(18,2)) AS DOUBLE)
               AS f_val_7d,
             CAST(count(*) OVER wlife AS BIGINT) AS f_life_cnt
      FROM ev
      WINDOW w7 AS (PARTITION BY user_id ORDER BY us
                    RANGE BETWEEN {_PIT_7D_US} PRECEDING AND 1 PRECEDING),
             wlife AS (PARTITION BY user_id ORDER BY us
                       RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id, f_cnt_7d, f_val_7d, f_life_cnt
    FROM feat WHERE event_type = 'purchase'
    ORDER BY event_id
"""


@query("training_matrix_pit_features", _PIT_SQL)
def training_matrix_pit_features(spark, sf_dir):
    """Point-in-time-correct training matrix: each label row (purchase
    event) carries features computed from STRICTLY-BEFORE data only —
    trailing-7-day event count and value sum, plus lifetime count — via
    event-time RANGE frames ending at 1 microsecond before the label.
    This is the feature-store leakage contract; all three frames share
    ONE per-user time sort. Same-timestamp rows are excluded from their
    own features by the exclusive bound in both engines."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.round("value", 2).cast("decimal(18,2)").alias("val"),
    )
    base = Window.partitionBy("user_id").orderBy("us")
    w7 = base.rangeBetween(-_PIT_7D_US, -1)
    wlife = base.rangeBetween(Window.unboundedPreceding, -1)
    feat = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.count("*").over(w7).cast("bigint").alias("f_cnt_7d"),
        F.coalesce(F.sum("val").over(w7), F.lit(0).cast("decimal(18,2)"))
        .cast("double")
        .alias("f_val_7d"),
        F.count("*").over(wlife).cast("bigint").alias("f_life_cnt"),
    )
    return (
        feat.filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "f_cnt_7d", "f_val_7d", "f_life_cnt")
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Keyword-in-context concordance for the corpus's top token
# ---------------------------------------------------------------------------

_KWIC_TOPN = 15

_KWIC_SQL = rf"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
      FROM documents
    ), uni AS (
      SELECT tok, count(*) AS n FROM t, UNNEST(toks) AS u(tok) GROUP BY tok
    ), top AS (
      SELECT tok FROM uni ORDER BY n DESC, tok LIMIT 1
    ), hits AS (
      SELECT doc_id, u.i AS pos,
             array_to_string(
               list_slice(toks, greatest(u.i - 2, 1), u.i + 2), ' ') AS context
      FROM t, UNNEST(range(1, len(toks) + 1)) AS u(i), top
      WHERE toks[u.i] = top.tok
    )
    SELECT h.doc_id, h.pos - 1 AS pos, top.tok AS keyword, h.context
    FROM hits h, top
    ORDER BY doc_id, pos LIMIT {_KWIC_TOPN}
"""


@query("kwic_concordance_top_token", _KWIC_SQL)
def kwic_concordance_top_token(spark, sf_dir):
    """Keyword-in-context concordance: the corpus's most frequent token
    (broadcast, 1 row) located in positional postings, each occurrence
    rendered with its ±2-token window sliced straight from the
    tokenized arrays — the corpus-inspection tool lexicographers and
    data-quality reviewers use. Postings work is |occurrences of one
    token|, never corpus-quadratic."""
    t = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.filter(F.split("text", r"\s+"), lambda x: x != "").alias("toks"),
    )
    uni = (
        t.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
    )
    top = uni.orderBy(F.desc("n"), "tok").limit(1).select(
        F.col("tok").alias("keyword")
    )
    hits = (
        t.crossJoin(F.broadcast(top))
        .select(
            "doc_id",
            "keyword",
            F.posexplode("toks").alias("pos", "tok"),
            F.col("toks"),
        )
        .filter(F.col("tok") == F.col("keyword"))
        .select(
            "doc_id",
            "pos",
            "keyword",
            F.array_join(
                F.expr(
                    "slice(toks, greatest(pos - 1, 1),"
                    " pos + 3 - greatest(pos - 1, 1) + 1)"
                ),
                " ",
            ).alias("context"),
        )
    )
    return hits.orderBy("doc_id", "pos").limit(_KWIC_TOPN)
