"""Scale measurement for the persisted crawled-URL index (round-10):
day-2 crawl-loop cost must be ∝ the arriving wave, not the corpus.

Corpus tiers: 60k / 600k / 6M crawled canonical URLs persisted once
(``write_crawled_urls``); against each tier a FIXED 20k-URL wave (half
overlapping the corpus, half new) is probed (``frontier_against_
crawled`` — one anti-join; the index side is a single-column columnar
scan) and extended (``extend_crawled_urls`` — anti-join + append of
the fresh half). Probe/extend growth across 100× corpus growth should
be bounded by the index COLUMN SCAN, not by rewrite (the index is
never rewritten); decisions are asserted exactly at every tier.

Appends a ``frontier_index`` section to CRAWL_SCALEBENCH.json when run
with --merge, else writes /tmp/frontier_index_scalebench.json.

Usage: python tools/frontier_index_scalebench.py [--merge]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IDX_ROOT = "/tmp/vgs_frontier_idx"
WAVE = 20_000


def main() -> None:
    from pyspark.sql import functions as F

    from vmware_graph_spark.operators.crawl import (
        extend_crawled_urls,
        frontier_against_crawled,
        write_crawled_urls,
    )
    from vmware_graph_spark.session import get_spark, tune

    spark = get_spark("frontier-index-scalebench")
    tune(spark)
    spark.sparkContext.setLogLevel("ERROR")

    def urls(lo: int, hi: int):
        return spark.range(lo, hi).select(
            F.concat(
                F.lit("http://www.site"), (F.col("id") % 97).cast("string"),
                F.lit(".example.com/p/"), F.col("id").cast("string"),
            ).alias("canon")
        )

    report = {"wave_urls": WAVE, "tiers": {}}
    for corpus in (60_000, 600_000, 6_000_000):
        idx = os.path.join(IDX_ROOT, str(corpus))
        shutil.rmtree(idx, ignore_errors=True)

        t0 = time.time()
        write_crawled_urls(urls(0, corpus), idx)
        build_s = round(time.time() - t0, 2)

        # fixed wave: WAVE/2 already crawled + WAVE/2 genuinely new
        wave = urls(corpus - WAVE // 2, corpus + WAVE // 2)

        t0 = time.time()
        n_new = frontier_against_crawled(spark, idx, wave).count()
        probe_s = round(time.time() - t0, 2)
        assert n_new == WAVE // 2, (corpus, n_new)

        t0 = time.time()
        extend_crawled_urls(spark, wave, idx)
        extend_s = round(time.time() - t0, 2)

        # post-extend: same wave now fully crawled; index grew by the
        # fresh half only (idempotent overlap handling at scale)
        assert frontier_against_crawled(spark, idx, wave).count() == 0
        n_rows = spark.read.parquet(f"{idx}/urls.parquet").count()
        assert n_rows == corpus + WAVE // 2, (corpus, n_rows)

        report["tiers"][str(corpus)] = {
            "corpus_urls": corpus,
            "build_s": build_s,
            "probe_s": probe_s,
            "extend_s": extend_s,
            "wave_new_found": n_new,
            "rows_after_extend": n_rows,
        }
        print(json.dumps({str(corpus): report["tiers"][str(corpus)]}), file=sys.stderr)
        shutil.rmtree(idx, ignore_errors=True)

    if "--merge" in sys.argv:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "CRAWL_SCALEBENCH.json",
        )
        with open(path) as f:
            doc = json.load(f)
        doc["frontier_index"] = report
        with open(path, "w") as f:
            json.dump(doc, f, indent=2)
    else:
        with open("/tmp/frontier_index_scalebench.json", "w") as f:
            json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
