"""One scale row for the COMPOSED crawl loop (round-10 VERDICT #7):
seed → robots parse+gate → frontier delta against the persisted
crawled-URL index → per-host politeness waves → Hamilton budget split,
as a single lineage at frontier scale.

Shape differences vs the oracle-paired ``crawl_loop_pipeline`` query
(documented, deliberate): seeds are generated IN-ENGINE (spark.range —
the sitemap FILE decode cost is measured separately in the
``maintenance.sitemap_decode`` tiers) and the host space is 10k hosts
(so the per-host politeness window partitions stay bounded — the
giant-host escape has its own executed query + plan test). The robots
bodies still parse through the production executor-side parser, the
crawled index is the production marker-stamped layout, and the entire
per-host result (eligible count, wave count, Hamilton allocation over
a 1M-slot budget) is compared row-for-row against a DuckDB integer
recompute from first principles — 0 differences required.

Appends a ``crawl_loop`` section to CRAWL_SCALEBENCH.json with
--merge, else writes /tmp/crawl_loop_scalebench.json.

Usage: python tools/crawl_loop_scalebench.py [--merge] [n_seeds]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_HOSTS = 10_000
BUDGET = 1_000_000
IDX = "/tmp/vgs_crawl_loop_idx"


def main() -> None:
    import duckdb
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from vmware_graph_spark.operators.crawl import (
        apportion_budget,
        frontier_against_crawled,
        parse_robots,
        robots_filter,
        write_crawled_urls,
    )
    from vmware_graph_spark.session import get_spark, tune

    args = [int(c) for c in sys.argv[1:] if not c.startswith("-")]
    n_seeds = args[0] if args else 5_000_000

    spark = get_spark("crawl-loop-scalebench")
    tune(spark)
    spark.sparkContext.setLogLevel("ERROR")

    i = F.col("id")
    seeds = spark.range(n_seeds).select(
        F.concat(F.lit("h"), (i % N_HOSTS).cast("string")).alias("host"),
        F.concat(F.lit("/a/"), i.cast("string")).alias("path"),
        F.concat(
            F.lit("http://h"), (i % N_HOSTS).cast("string"),
            F.lit(".example.com/a/"), i.cast("string"),
        ).alias("canon"),
    )

    # day-2 state: every 4th seed is already crawled (persisted index)
    shutil.rmtree(IDX, ignore_errors=True)
    t0 = time.time()
    write_crawled_urls(seeds.filter(i % 4 == 0).select("canon"), IDX)
    index_build_s = round(time.time() - t0, 2)

    # robots bodies for every host, parsed through the production path
    k = F.col("id")
    robots = spark.range(N_HOSTS).select(
        F.concat(F.lit("h"), k.cast("string")).alias("host"),
        F.concat(
            F.lit("User-agent: examplebot\nDisallow: /a/\nAllow: /a/*"),
            (k % 7).cast("string"), F.lit("$\n"),
        ).alias("robots_txt"),
    )

    t0 = time.time()
    rules = parse_robots(robots, "examplebot")
    gated = robots_filter(
        seeds, rules, rules_rows=2 * N_HOSTS
    ).filter(F.col("fetch_allowed")).drop("fetch_allowed")
    frontier = frontier_against_crawled(spark, IDX, gated)
    w = Window.partitionBy("host").orderBy(F.md5("canon"))
    waves = frontier.select("host", F.row_number().over(w).alias("rn")).select(
        "host", (((F.col("rn") - 1) / 8).cast("bigint") + 1).alias("wave")
    )
    per_host = waves.groupBy("host").agg(
        F.count("*").cast("bigint").alias("n_eligible"),
        F.max("wave").cast("bigint").alias("n_waves"),
    )
    alloc = apportion_budget(
        per_host.select("host", F.col("n_eligible").alias("weight")), BUDGET
    )
    got = sorted(
        (r.host, r.n_eligible, r.n_waves, r.alloc)
        for r in per_host.join(alloc.select("host", "alloc"), "host").collect()
    )
    loop_s = round(time.time() - t0, 2)

    want = sorted(
        tuple(r)
        for r in duckdb.sql(
            f"""
            WITH e AS (
              SELECT (i % {N_HOSTS}) AS h FROM range({n_seeds}) t(i)
              WHERE i % 10 = (i % {N_HOSTS}) % 7 AND i % 4 <> 0
            ),
            agg AS (SELECT h, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY h),
            tot AS (SELECT sum(n) AS w FROM agg),
            base AS (
              SELECT h, n, ({BUDGET} * n) // w AS b, ({BUDGET} * n) % w AS rem
              FROM agg, tot
            ),
            rk AS (
              -- remainder ties break on the HOST STRING (the engine's
              -- key), not the numeric id: 'h10' < 'h2'
              SELECT *, row_number() OVER (ORDER BY rem DESC, ('h' || h)) AS r,
                     (SELECT {BUDGET} - sum(b) FROM base) AS leftover
              FROM base
            )
            SELECT 'h' || h AS host, n,
                   CAST(CEIL(n / 8.0) AS BIGINT) AS n_waves,
                   CAST(b + CASE WHEN r <= leftover THEN 1 ELSE 0 END AS BIGINT)
            FROM rk
            """
        ).fetchall()
    )
    diffs = sum(1 for a, b in zip(got, want) if a != b) + abs(len(got) - len(want))
    assert diffs == 0, f"{diffs} per-host rows differ from the DuckDB recompute"

    report = {
        "load_1m_at_start": round(os.getloadavg()[0], 2),
        "seeds": n_seeds,
        "hosts": N_HOSTS,
        "budget": BUDGET,
        "index_keys": n_seeds // 4 + (1 if n_seeds % 4 else 0),
        "index_build_s": index_build_s,
        "loop_s": loop_s,
        "seeds_per_s": round(n_seeds / loop_s, 0),
        "eligible": int(sum(r[1] for r in got)),
        "alloc_total": int(sum(r[3] for r in got)),
        "per_host_rows_vs_duckdb_diffs": diffs,
    }
    assert report["alloc_total"] == BUDGET
    shutil.rmtree(IDX, ignore_errors=True)

    if "--merge" in sys.argv:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "CRAWL_SCALEBENCH.json",
        )
        with open(path) as f:
            doc = json.load(f)
        doc["crawl_loop"] = report
        with open(path, "w") as f:
            json.dump(doc, f, indent=2)
    else:
        with open("/tmp/crawl_loop_scalebench.json", "w") as f:
            json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
