"""Scale measurement for the WET conversion SINK (round-10 VERDICT
#5): ``write_wet`` was correctness-pinned (`wet_conversion_roundtrip`)
but never measured — and re-sharding extracted text into WET archives
is a real crawl-prep cost at 100 TB.

Tiers: 1x/10x/100x RECORDS (sf0.1 documents ≈ 50k rows as the 1x
unit; tenant-shifted copies keep URIs distinct), written BOTH plain
and per-member-gzipped (the Common Crawl layout) from the executors
(one ``.warc.wet[.gz]`` file per partition; the driver never touches
record bytes). Each tier asserts the ROUNDTRIP, not just the wall:
the sink's files are read back through ``read_warc(types=
('conversion',))`` and full-joined against the source on URI with an
md5(text) comparison — 0 mismatches required — so the measured
records/s double as at-scale correctness checks (the crawl_scalebench
discipline).

Appends a ``wet_sink`` section to CRAWL_SCALEBENCH.json with --merge,
else writes /tmp/wet_scalebench.json.

Usage: python tools/wet_scalebench.py [--merge] [copies...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC_SF = os.environ.get("WET_SRC_SF", "/root/testdata/sf0.1")
OUT = "/tmp/vgs_wet_sink"


def main() -> None:
    from pyspark.sql import functions as F

    from vmware_graph_spark.session import get_spark, tune
    from vmware_graph_spark.sources.warc import read_warc, write_wet

    copies = [int(c) for c in sys.argv[1:] if not c.startswith("-")] or [1, 10, 100]

    spark = get_spark("wet-scalebench")
    tune(spark)
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet(f"{SRC_SF}/documents.parquet").select("doc_id", "text")

    report: dict = {
        "load_1m_at_start": round(os.getloadavg()[0], 2),
        "tiers": {},
    }
    for n in copies:
        src = base.select(
            F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("c"),
            "doc_id",
            "text",
        ).select(
            F.concat(
                F.lit("http://www.site"),
                (F.col("doc_id") % 5).cast("string"),
                F.lit(".example.com/a/"),
                (F.col("doc_id") + F.col("c") * 10_000_000).cast("string"),
            ).alias("uri"),
            F.col("text"),
        )
        # the sink's job IS re-sharding extracted text — route the
        # exploded rows through an explicit repartition so every tier
        # writes the distributed shape (one file per partition from
        # its executor), not one giant task off a single parquet split.
        src = src.repartition(32)
        n_records = src.count()

        entry: dict = {"records": n_records}
        for gz, tag in ((False, "plain"), (True, "gz")):
            out_dir = os.path.join(OUT, tag)
            if os.path.isdir(out_dir):
                shutil.rmtree(out_dir)
            t0 = time.time()
            written = write_wet(src, out_dir, gzip_members=gz)
            wall = round(time.time() - t0, 2)
            assert written == n_records, (written, n_records)
            out_bytes = sum(
                os.path.getsize(os.path.join(out_dir, f))
                for f in os.listdir(out_dir)
            )

            # roundtrip decisions at THIS tier: read the sink's files
            # back and md5-compare every record's text against the
            # source by URI (full join; 0 mismatches).
            glob = os.path.join(out_dir, f"*.warc.wet{'.gz' if gz else ''}")
            t0 = time.time()
            back = read_warc(spark, glob, types=("conversion",)).select(
                F.col("uri"), F.md5(F.col("body").cast("string")).alias("h_back")
            )
            mismatches = (
                src.select("uri", F.md5("text").alias("h_src"))
                .join(back, "uri", "full")
                .filter(
                    F.col("h_src").isNull()
                    | F.col("h_back").isNull()
                    | (F.col("h_src") != F.col("h_back"))
                )
                .count()
            )
            verify_s = round(time.time() - t0, 2)
            assert mismatches == 0, (tag, n, mismatches)

            entry[tag] = {
                "write_s": wall,
                "records_per_s": round(n_records / wall, 0),
                "bytes": out_bytes,
                "mb_per_s": round(out_bytes / wall / 1e6, 1),
                "files": len(os.listdir(out_dir)),
                "roundtrip_verify_s": verify_s,
                "roundtrip_mismatches": mismatches,
            }
        entry["gz_compression"] = round(
            entry["plain"]["bytes"] / entry["gz"]["bytes"], 2
        )
        report["tiers"][str(n)] = entry
        print(json.dumps({str(n): entry}), file=sys.stderr)

    shutil.rmtree(OUT, ignore_errors=True)
    if "--merge" in sys.argv:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "CRAWL_SCALEBENCH.json",
        )
        with open(path) as f:
            doc = json.load(f)
        doc["wet_sink"] = report
        with open(path, "w") as f:
            json.dump(doc, f, indent=2)
    else:
        with open("/tmp/wet_scalebench.json", "w") as f:
            json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
