"""Scale rows for the page-level REP chain (round-12): pages →
``page_directives`` (meta-robots + X-Robots-Tag) → ``extract_links_rel``
→ rel-token filter → resolve → canonicalize → per-target in-link counts,
at 1x/10x page volume.

Pages are generated IN-ENGINE (Catalyst concat over spark.range — no
driver bytes): arm i%4 ∈ {clean, meta-nofollow, header-nofollow, clean},
each page carrying one plain and one rel=nofollow anchor, so the
followed-link total and the distinct-target count are exactly derivable
and asserted per tier — the measured pages/s double as at-scale
correctness checks (the crawl_scalebench discipline).

Appends a ``page_rep`` section to CRAWL_SCALEBENCH.json with --merge,
else writes /tmp/page_rep_scalebench.json.

Usage: python tools/page_rep_scalebench.py [--merge] [n_pages...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_TARGETS = 100_000


def main() -> None:
    from pyspark.sql import functions as F

    from vmware_graph_spark.functions.url import (
        extract_links_rel,
        resolve_href,
        url_canonical,
        url_host,
        url_scheme,
    )
    from vmware_graph_spark.operators.crawl import page_directives
    from vmware_graph_spark.session import get_spark, tune

    tiers = [int(c) for c in sys.argv[1:] if not c.startswith("-")] or [
        200_000,
        2_000_000,
    ]

    load_at_start = round(os.getloadavg()[0], 2)
    spark = get_spark("page-rep-scalebench")
    tune(spark)
    spark.sparkContext.setLogLevel("ERROR")

    report: dict = {"load_1m_at_start": load_at_start, "tiers": {}}
    for n in tiers:
        i = F.col("id")
        s = i.cast("string")
        m = (i % N_TARGETS).cast("string")
        tm = F.concat(
            F.lit("http://t"), ((i % N_TARGETS) % 50).cast("string"),
            F.lit(".example.com/t/"), m,
        )
        meta = F.when(
            i % 4 == 1, F.lit('<meta name="robots" content="nofollow">')
        ).otherwise(F.lit(""))
        html = F.concat(
            F.lit("<html><head>"), meta,
            F.lit('</head><body><p>filler text for realism, page '), s,
            F.lit('</p><a href="'), tm, F.lit('">go</a>'),
            F.lit('<a rel="nofollow" href="'), tm, F.lit('?ad=1">ad</a>'),
            F.lit("</body></html>"),
        )
        hdr = F.when(i % 4 == 2, F.lit("nofollow")).otherwise(
            F.lit(None).cast("string")
        )
        pages = spark.range(n).select(
            F.concat(F.lit("http://p"), (i % 1000).cast("string"),
                     F.lit(".example.com/a/"), s).alias("url"),
            html.alias("html"),
            hdr.alias("x_robots"),
        )

        t0 = time.time()
        pd_ = page_directives(F.col("html"), F.col("x_robots"))
        followable = pages.filter(~pd_["nofollow"])
        links = followable.select(
            url_scheme("url").alias("s"),
            url_host("url").alias("h"),
            F.explode(extract_links_rel("html")).alias("l"),
        ).filter(~F.col("l.rel").rlike(r"(^|\s)nofollow($|\s)"))
        resolved = links.select(
            resolve_href(F.col("s"), F.col("h"), F.col("l.href")).alias("r")
        ).filter(F.col("r").isNotNull())
        agg = (
            resolved.select(url_canonical("r").alias("target"))
            .groupBy("target")
            .agg(F.count("*").alias("c"))
            .agg(
                F.count("*").alias("targets"),
                F.sum("c").alias("inlinks"),
            )
            .collect()[0]
        )
        wall = round(time.time() - t0, 2)

        # exactly derivable: arms 0 and 3 contribute ONE followed link
        # each. (page, arm) repeats with period lcm(N_TARGETS, 4) =
        # N_TARGETS (N_TARGETS ≡ 0 mod 4), so target id and REP arm
        # correlate PERMANENTLY: only even-ish residues (m%4 ∈ {0,3})
        # ever receive a followed link — one period determines the
        # distinct-target set exactly.
        want_inlinks = sum(1 for k in range(4) if k in (0, 3)) * (n // 4)
        want_inlinks += sum(1 for r in range(n % 4) if r in (0, 3))
        want_targets = len(
            {k % N_TARGETS for k in range(min(n, N_TARGETS)) if k % 4 in (0, 3)}
        )
        assert agg["inlinks"] == want_inlinks, (agg["inlinks"], want_inlinks)
        assert agg["targets"] == want_targets, (agg["targets"], want_targets)

        report["tiers"][str(n)] = {
            "pages": n,
            "wall_s": wall,
            "pages_per_s": round(n / wall, 0),
            "followed_inlinks": int(agg["inlinks"]),
            "distinct_targets": int(agg["targets"]),
        }
        print(json.dumps({str(n): report["tiers"][str(n)]}), file=sys.stderr)

    if "--merge" in sys.argv:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "CRAWL_SCALEBENCH.json",
        )
        with open(path) as f:
            doc = json.load(f)
        doc["page_rep"] = report
        with open(path, "w") as f:
            json.dump(doc, f, indent=2)
    else:
        with open("/tmp/page_rep_scalebench.json", "w") as f:
            json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
