"""Round-5 extensions, batch 7: harmonic centrality, Markov absorption
attribution, burstiness features, and cohort LTV curves.

Same registry/oracle discipline as ``queries.py``; see
``queries_ext3.py`` for the shared numeric-determinism rules.

Scale notes (100 TB):

- ``harmonic_centrality_landmarks`` folds the multi-landmark BFS
  distance table (already the bounded product of
  ``shortest_paths_region_landmarks``) into per-landmark harmonic sums
  with 1/d as decimal literals — no division at aggregation time, one
  hash agg over the distance table.
- ``markov_absorption_purchase`` is Markov-chain attribution: the
  |types|² transition counts come to the driver (k-means-centroid-sized
  state), the K-step absorption recursion runs there in pinned order,
  and the unrolled-CTE oracle replays it list-for-list — the "how
  likely does a journey starting at X reach purchase" readout behind
  removal-effect attribution.
- ``burstiness_user_gaps`` computes Goh-Barabási burstiness
  (σ−μ)/(σ+μ) over inter-event gaps from exact integer millisecond
  moments — one lag window + one aggregate per user.
- ``cohort_ltv_curve`` extends the retention triangle to value: cohort
  × age cumulative revenue per user, a running-sum window over the
  (already tiny) cohort-age aggregate.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from vmware_graph_spark.queries import query
from vmware_graph_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# Harmonic centrality from landmark BFS distances
# ---------------------------------------------------------------------------

# 1/d as 12-decimal literals: no division (and no engine-varying
# rational rounding) inside the aggregation.
_HARM_W = {1: "1.000000000000", 2: "0.500000000000", 3: "0.333333333333",
           4: "0.250000000000", 5: "0.200000000000"}
_HARM_CASE = "CASE dist " + " ".join(
    f"WHEN {d} THEN {w}::DECIMAL(18,12)" for d, w in _HARM_W.items()
) + " ELSE 0::DECIMAL(18,12) END"

_HARMONIC_SQL = f"""
    WITH dist AS (
      SELECT 'r' || r_regionkey AS id, 'r' || r_regionkey AS landmark, 0 AS dist
      FROM region
      UNION ALL
      SELECT 'n' || n_nationkey, 'r' || n_regionkey, 1 FROM nation
      UNION ALL
      SELECT 'c' || c_custkey, 'r' || n_regionkey, 2
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      UNION ALL
      SELECT 'o' || o_orderkey, 'r' || n_regionkey, 3
      FROM orders JOIN customer ON o_custkey = c_custkey
                  JOIN nation ON c_nationkey = n_nationkey
      WHERE o_orderkey % 10 = 0
    )
    SELECT landmark, CAST(count(*) AS BIGINT) AS n_reached,
           round(CAST(sum({_HARM_CASE}) AS DOUBLE), 6) AS harmonic
    FROM dist WHERE dist > 0
    GROUP BY landmark ORDER BY landmark
"""


@query("harmonic_centrality_landmarks", _HARMONIC_SQL)
def harmonic_centrality_landmarks(spark, sf_dir):
    """Harmonic centrality of each landmark — Σ 1/d over every vertex
    it reaches — folded from the same multi-landmark BFS distance table
    ``shortest_paths_region_landmarks`` produces. The 1/d weights are
    decimal literals (exact, engine-identical accumulation); the whole
    metric is one hash aggregate over the distance table, which BFS
    already bounded to |V|·|landmarks| rows."""
    from vmware_graph_spark.analytics.motif import shortest_paths

    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0)
    rid = F.concat(F.lit("r"), F.col("r_regionkey"))
    nid = F.concat(F.lit("n"), F.col("n_nationkey"))
    cid = F.concat(F.lit("c"), F.col("c_custkey"))
    oid = F.concat(F.lit("o"), F.col("o_orderkey"))
    vertices = (
        r.select(rid.alias("id"))
        .unionByName(n.select(nid.alias("id")))
        .unionByName(c.select(cid.alias("id")))
        .unionByName(o.select(oid.alias("id")))
    )
    edges = (
        n.select(F.concat(F.lit("r"), F.col("n_regionkey")).alias("src"), nid.alias("dst"))
        .unionByName(
            c.select(F.concat(F.lit("n"), F.col("c_nationkey")).alias("src"), cid.alias("dst"))
        )
        .unionByName(
            o.select(F.concat(F.lit("c"), F.col("o_custkey")).alias("src"), oid.alias("dst"))
        )
    )
    landmarks = r.select(rid.alias("id"))
    dist = shortest_paths(vertices, edges, landmarks, max_hops=5, directed=True)
    expr = F.lit("0").cast("decimal(18,12)")
    for d in sorted(_HARM_W, reverse=True):
        expr = F.when(
            F.col("dist") == d, F.lit(_HARM_W[d]).cast("decimal(18,12)")
        ).otherwise(expr)
    return (
        dist.filter(F.col("dist") > 0)
        .groupBy("landmark")
        .agg(
            F.count("*").cast("bigint").alias("n_reached"),
            F.round(F.sum(expr).cast("double"), 6).alias("harmonic"),
        )
        .orderBy("landmark")
    )


# ---------------------------------------------------------------------------
# Markov absorption probability (reach 'purchase' within K steps)
# ---------------------------------------------------------------------------

_ABS_K = 5
_ABS_TARGET = "purchase"


def _absorption_sql() -> str:
    """Unrolled absorption recursion over the transition matrix, with
    the probability vector as an index-ordered list so every float op
    (left-to-right list_sum, exact count division) matches the
    driver-side Python loop exactly."""
    ctes = [
        """tr AS MATERIALIZED (
      SELECT event_type AS cur,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    )""",
        """ty AS MATERIALIZED (
      SELECT event_type,
             row_number() OVER (ORDER BY event_type) - 1 AS ix
      FROM (SELECT DISTINCT event_type FROM events)
    )""",
        "k AS (SELECT count(*) AS k FROM ty)",
        """cnt AS MATERIALIZED (
      SELECT a.ix AS i, b.ix AS j,
             CAST(coalesce(sum(CASE WHEN tr.cur = a.event_type
                                AND tr.nxt = b.event_type
                               THEN 1 ELSE 0 END), 0) AS BIGINT) AS n
      FROM ty a CROSS JOIN ty b
      LEFT JOIN tr ON tr.cur = a.event_type AND tr.nxt = b.event_type
      GROUP BY a.ix, b.ix
    )""",
        """tot AS (SELECT i, sum(n) AS t FROM cnt GROUP BY i)""",
        """tm AS (
      SELECT list(CASE WHEN t > 0 THEN n::DOUBLE / t ELSE 0.0 END
                  ORDER BY i * (SELECT k FROM k) + j) AS m
      FROM cnt JOIN tot USING (i)
    )""",
        f"""pur AS (
      SELECT list(CASE WHEN event_type = '{_ABS_TARGET}' THEN 1 ELSE 0 END
                  ORDER BY ix) AS f
      FROM ty
    )""",
        "p0 AS (SELECT m, f, (SELECT k FROM k) AS kk,"
        " list_transform(range(0, (SELECT k FROM k)), i -> 0.0) AS p"
        " FROM tm, pur)",
    ]
    for s in range(1, _ABS_K + 1):
        ctes.append(
            f"p{s} AS (SELECT m, f, kk, list_transform(range(0, kk),"
            f" i -> list_sum(list_transform(range(0, kk),"
            f" j -> m[i * kk + j + 1]"
            f" * (CASE WHEN f[j + 1] = 1 THEN 1.0 ELSE p[j + 1] END)))) AS p"
            f" FROM p{s - 1})"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT ty.event_type, round(p[ty.ix + 1], 6) + 0 AS p_absorb"
        f"\nFROM p{_ABS_K}, ty ORDER BY ty.event_type"
    )


@query("markov_absorption_purchase", _absorption_sql())
def markov_absorption_purchase(spark, sf_dir):
    """Markov-chain attribution: probability that a journey currently
    at state X reaches '{_ABS_TARGET}' within K={_ABS_K} transitions,
    from the first-order transition matrix
    (``event_transition_matrix``'s counts). The |types|² counts come to
    the driver (tiny, k-means-centroid-sized state), the absorption
    recursion p' = T·(absorb ? 1 : p) runs there in pinned index order,
    and the oracle replays it as unrolled list CTEs — the quantity
    behind Markov removal-effect attribution."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = (
        ev.select("event_type", F.lead("event_type").over(w).alias("nxt"))
        .filter(F.col("nxt").isNotNull())
        .groupBy(F.col("event_type").alias("cur"), "nxt")
        .agg(F.count("*").alias("n"))
    )
    types = sorted(r["event_type"] for r in ev.select("event_type").distinct().collect())
    ix = {t: i for i, t in enumerate(types)}
    k = len(types)
    cnt = [[0] * k for _ in range(k)]
    for r in tr.collect():
        cnt[ix[r["cur"]]][ix[r["nxt"]]] = r["n"]
    t = [[0.0] * k for _ in range(k)]
    for i in range(k):
        tot = sum(cnt[i])
        if tot > 0:
            for j in range(k):
                t[i][j] = cnt[i][j] / tot
    absorb = [1 if ty == _ABS_TARGET else 0 for ty in types]
    p = [0.0] * k
    for _ in range(_ABS_K):
        p = [
            sum(
                t[i][j] * (1.0 if absorb[j] == 1 else p[j])
                for j in range(k)
            )
            for i in range(k)
        ]
    rows = [(types[i], round(p[i], 6) + 0) for i in range(k)]
    return spark.createDataFrame(rows, "event_type string, p_absorb double")


# ---------------------------------------------------------------------------
# Burstiness of per-user inter-event gaps
# ---------------------------------------------------------------------------

_BURST_MIN_GAPS = 5

_BURSTINESS_SQL = f"""
    WITH g AS (
      SELECT user_id,
             epoch_us(ts) // 1000
               - lag(epoch_us(ts) // 1000) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS gap_ms
      FROM events
    ), m AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
             CAST(sum(gap_ms) AS BIGINT) AS sg,
             CAST(sum(gap_ms * gap_ms) AS BIGINT) AS sgg
      FROM g WHERE gap_ms IS NOT NULL GROUP BY user_id
      HAVING count(*) >= {_BURST_MIN_GAPS}
    )
    SELECT user_id, n_gaps,
           round(sg::DOUBLE / n_gaps / 1000, 6) AS mean_gap_s,
           round((sqrt(sgg::DOUBLE / n_gaps - (sg::DOUBLE / n_gaps)
                       * (sg::DOUBLE / n_gaps)) - sg::DOUBLE / n_gaps)
                 / (sqrt(sgg::DOUBLE / n_gaps - (sg::DOUBLE / n_gaps)
                         * (sg::DOUBLE / n_gaps)) + sg::DOUBLE / n_gaps), 6)
             + 0 AS burstiness
    FROM m ORDER BY user_id
"""


@query("burstiness_user_gaps", _BURSTINESS_SQL)
def burstiness_user_gaps(spark, sf_dir):
    """Goh-Barabási burstiness B = (σ−μ)/(σ+μ) of each user's
    inter-event gaps: B→−1 for metronome users, ~0 for Poisson, →1 for
    extreme bursts — the temporal feature that separates bots from
    humans. Gaps are integer milliseconds (squares stay inside BIGINT),
    moments are exact integer sums, and the float path is
    pinned-order +,*,/ and sqrt. One lag window + one aggregate."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ms = F.expr("div(unix_micros(cast(ts as timestamp)), 1000)")
    g = ev.select(
        "user_id", (ms - F.lag(ms).over(w)).alias("gap_ms")
    ).filter(F.col("gap_ms").isNotNull())
    m = (
        g.groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_gaps"),
            F.sum("gap_ms").cast("bigint").alias("sg"),
            F.sum(F.col("gap_ms") * F.col("gap_ms")).cast("bigint").alias("sgg"),
        )
        .filter(F.col("n_gaps") >= _BURST_MIN_GAPS)
    )
    mu = F.col("sg").cast("double") / F.col("n_gaps")
    sigma = F.sqrt(F.col("sgg").cast("double") / F.col("n_gaps") - mu * mu)
    return m.select(
        "user_id",
        "n_gaps",
        F.round(F.col("sg").cast("double") / F.col("n_gaps") / 1000, 6).alias(
            "mean_gap_s"
        ),
        (F.round((sigma - mu) / (sigma + mu), 6) + 0).alias("burstiness"),
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# Cohort LTV (cumulative value per user by cohort age)
# ---------------------------------------------------------------------------

_LTV_SQL = """
    WITH firsts AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY user_id
    ), cohort_size AS (
      SELECT cohort_day, CAST(count(*) AS BIGINT) AS n_users
      FROM firsts GROUP BY cohort_day
    ), daily AS (
      SELECT f.cohort_day,
             datediff('day', f.cohort_day, CAST(e.ts AS DATE)) AS age,
             sum(round(e.value, 2)::DECIMAL(18,2)) AS v
      FROM events e JOIN firsts f ON e.user_id = f.user_id
      WHERE e.value IS NOT NULL
      GROUP BY f.cohort_day, datediff('day', f.cohort_day, CAST(e.ts AS DATE))
    )
    SELECT strftime(d.cohort_day, '%Y-%m-%d') AS cohort_day, d.age, cs.n_users,
           round(CAST(sum(d.v) OVER (PARTITION BY d.cohort_day ORDER BY d.age
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                 / cs.n_users, 6) AS ltv_per_user
    FROM daily d JOIN cohort_size cs ON d.cohort_day = cs.cohort_day
    ORDER BY cohort_day, age
"""


@query("cohort_ltv_curve", _LTV_SQL)
def cohort_ltv_curve(spark, sf_dir):
    """Cohort LTV curves — the value sibling of
    ``cohort_retention_daily``: users cohorted by first-seen day,
    per-(cohort, age) revenue accumulated into a running
    lifetime-value-per-user curve. Raw events reduce map-side to the
    tiny cohort×age grid before any window; decimal value sums keep
    both engines exact."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort_day"))
    size = firsts.groupBy("cohort_day").agg(
        F.count("*").cast("bigint").alias("n_users")
    )
    daily = (
        ev.filter(F.col("value").isNotNull())
        .join(F.broadcast(firsts), "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.to_date("ts"), F.col("cohort_day")).alias("age"),
        )
        .agg(F.sum(F.round("value", 2).cast("decimal(18,2)")).alias("v"))
    )
    wrun = (
        Window.partitionBy("cohort_day")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        daily.join(F.broadcast(size), "cohort_day")
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            "age",
            "n_users",
            F.round(
                F.sum("v").over(wrun).cast("double") / F.col("n_users"), 6
            ).alias("ltv_per_user"),
        )
        .orderBy("cohort_day", "age")
    )
