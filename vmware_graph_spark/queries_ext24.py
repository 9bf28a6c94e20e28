"""Round-11: the crawl loop COMPOSED end to end.

Round 10 built the pieces — sitemap seeding, the RFC 9309 robots gate,
the persisted crawled-URL index, politeness waves, Hamilton budget
apportionment. This module runs them as ONE lineage (round-10 VERDICT
#7): seed → parse robots → gate → frontier delta against the persisted
index → per-host wave schedule → integer budget split — the dispatch
plan a polite crawler would hand its fetchers, with the oracle deriving
every number from doc_id arithmetic alone (the ``crawl_prep_pipeline``
composition discipline: a bug in ANY stage — a sitemap parse slip, a
mis-scored wildcard, a stale index probe, a wave off-by-one, a
non-exact apportionment — breaks different rows of the same hash).
"""

from __future__ import annotations

import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from vmware_graph_spark.queries import query
from vmware_graph_spark.sources.tables import load_table
from vmware_graph_spark.tmpcache import cache_dir, data_key


def _crawled_index_dir(spark, sf_dir: str) -> str:
    """Persist the 'already crawled' canonical-URL set once per
    (dataset, mtime): every 4th document's URL — the loop's day-2
    state, written through the production marker-stamped index
    writer."""
    from vmware_graph_spark.operators.crawl import write_crawled_urls

    idx = os.path.join(
        cache_dir("crawl_loop_index", data_key(sf_dir, "documents")), "index"
    )
    if not os.path.exists(os.path.join(idx, "format.json")):
        d = load_table(spark, sf_dir, "documents").select("doc_id")
        crawled = d.filter(F.col("doc_id") % 4 == 0).select(
            F.concat(
                F.lit("http://www.site"),
                (F.col("doc_id") % 5).cast("string"),
                F.lit(".example.com/a/"),
                F.col("doc_id").cast("string"),
            ).alias("canon")
        )
        write_crawled_urls(crawled, idx)
    return idx


@query(
    "crawl_loop_pipeline",
    """
    WITH e AS (
      SELECT doc_id,
             'www.site' || (doc_id % 5) || '.example.com' AS host
      FROM documents
      WHERE doc_id % 10 <= 4      -- robots: Allow /a/*<k>$ out-scores
                                  -- Disallow /a/ iff last digit = k
        AND doc_id % 4 <> 0       -- frontier: already-crawled dropped
    ),
    agg AS (
      SELECT host, CAST(count(*) AS BIGINT) AS n_eligible
      FROM e GROUP BY host
    ),
    tot AS (SELECT sum(n_eligible) AS w FROM agg),
    base AS (
      SELECT host, n_eligible,
             (1000 * n_eligible) // w AS b,
             (1000 * n_eligible) % w AS rem
      FROM agg, tot
    ),
    rk AS (
      SELECT *,
             row_number() OVER (ORDER BY rem DESC, host) AS r,
             (SELECT 1000 - sum(b) FROM base) AS leftover
      FROM base
    )
    SELECT host, n_eligible,
           CAST(CEIL(n_eligible / 8.0) AS BIGINT) AS n_waves,
           CAST(b + CASE WHEN r <= leftover THEN 1 ELSE 0 END AS BIGINT)
             AS alloc
    FROM rk
    """,
)
def crawl_loop_pipeline(spark, sf_dir):
    """The composed crawl loop, one lineage: (1) SEED from the sitemap
    fleet (production gz reader over the shared fixture); (2) parse
    each host's robots.txt executor-side and GATE the seeds (host k
    disallows /a/ but allows ``/a/*<k>$`` — a URL survives iff its
    last digit equals its host digit, i.e. doc_id%10 ≤ 4); (3) the
    FRONTIER DELTA against the persisted crawled-URL index (every 4th
    document is already-crawled state, probed via
    ``frontier_against_crawled``); (4) POLITENESS WAVES — per-host
    rank in deterministic md5 order, 8 fetch slots a wave; (5) Hamilton
    BUDGET apportionment of 1000 fetch slots across hosts by eligible
    volume (``apportion_budget`` — exact integer arithmetic,
    Σalloc = 1000). Output: per host, the eligible count, the wave
    count the schedule needs, and the budget share."""
    from vmware_graph_spark.functions.url import url_host, url_path
    from vmware_graph_spark.operators.crawl import (
        apportion_budget,
        frontier_against_crawled,
        parse_robots,
        robots_filter,
    )
    from vmware_graph_spark.queries_ext22 import _sitemap_fixture_dir
    from vmware_graph_spark.sources.sitemap import read_sitemaps

    # (1) seed from the sitemap fleet
    root = _sitemap_fixture_dir(spark, sf_dir)
    seeds = (
        read_sitemaps(spark, os.path.join(root, "*.xml*"))
        .filter(F.col("kind") == "url")
        .select(
            F.col("loc").alias("canon"),
            url_host("loc").alias("host"),
            url_path("loc").alias("path"),
        )
    )

    # (2) robots gate from raw per-host robots.txt bodies
    bodies = [
        (
            f"www.site{k}.example.com",
            f"User-agent: examplebot\nDisallow: /a/\nAllow: /a/*{k}$\n",
        )
        for k in range(5)
    ]
    robots = spark.createDataFrame(bodies, "host string, robots_txt string")
    rules = parse_robots(robots, "examplebot")
    gated = robots_filter(seeds, rules).filter(F.col("fetch_allowed")).drop(
        "fetch_allowed"
    )

    # (3) frontier delta against the persisted crawled-URL index
    idx = _crawled_index_dir(spark, sf_dir)
    frontier = frontier_against_crawled(spark, idx, gated)

    # (4) politeness waves: 8 slots per host per wave, md5 priority
    w = Window.partitionBy("host").orderBy(F.md5("canon"))
    waves = frontier.select(
        "host", F.row_number().over(w).alias("rn")
    ).select("host", (((F.col("rn") - 1) / 8).cast("bigint") + 1).alias("wave"))
    per_host = waves.groupBy("host").agg(
        F.count("*").cast("bigint").alias("n_eligible"),
        F.max("wave").cast("bigint").alias("n_waves"),
    )

    # (5) Hamilton budget split across hosts by eligible volume
    alloc = apportion_budget(
        per_host.select("host", F.col("n_eligible").alias("weight")), 1000
    )
    return per_host.join(alloc.select("host", "alloc"), "host").select(
        "host", "n_eligible", "n_waves", "alloc"
    )
