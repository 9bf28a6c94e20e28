"""Scale measurement for the persisted ANN index (round-9 addition):
build + fixed-batch probe at 1x/10x/100x corpus size.

Corpus: sf0.1 embeddings (2,000 × 64d) replicated in-engine with
tenant-shifted vec_ids (labels unchanged — a FIXED codebook, so
growing the corpus grows the inverted LISTS, which is the honest IVF
trade: probe cost within the assigned list is linear in list size
until the codebook is re-trained with more centroids).

Per tier: index build wall (train + assign + cluster-partitioned
write), fixed 100-query probe wall reading ONLY the index, probe row
count (100 × k), and a determinism check (second probe identical).

Usage: python tools/ann_index_scalebench.py [out_json] [copies...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1/embeddings.parquet"
ROOT = "/tmp/vgs_ann_index_sb"


def main() -> None:
    out_json = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ann_index_scalebench.json"
    copies = [int(c) for c in sys.argv[2:]] or [1, 10, 100]

    from pyspark.sql import functions as F

    from vmware_graph_spark.operators.similarity import (
        ann_topk_against_index,
        write_ann_index,
    )
    from vmware_graph_spark.session import get_spark, tune

    spark = get_spark("ann-index-scalebench")
    tune(spark)
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet(SRC)
    queries = base.filter(F.col("vec_id") % 20 == 0).select(
        "vec_id", "embedding"
    )
    n_q = queries.count()

    report: dict = {"load_1m_at_start": round(os.getloadavg()[0], 2), "copies": {}}
    for n in copies:
        corpus = (
            base.select(
                "vec_id", "embedding", "label",
                F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("c"),
            )
            .select(
                (F.col("vec_id") + F.col("c") * 1_000_000).alias("vec_id"),
                "embedding",
                "label",
            )
        )
        n_vec = corpus.count()
        idx = os.path.join(ROOT, f"idx_{n}")
        if os.path.isdir(idx):
            shutil.rmtree(idx)
        os.makedirs(idx)

        t0 = time.time()
        write_ann_index(corpus, idx, "vec_id", "embedding", "label")
        build_s = round(time.time() - t0, 2)

        t0 = time.time()
        out1 = ann_topk_against_index(
            spark, idx, queries, "vec_id", "embedding", k=5
        ).collect()
        probe_s = round(time.time() - t0, 2)

        out2 = ann_topk_against_index(
            spark, idx, queries, "vec_id", "embedding", k=5
        ).collect()
        same = {(r.qid, r.rank, r.cid) for r in out1} == {
            (r.qid, r.rank, r.cid) for r in out2
        }

        entry = {
            "corpus_vectors": n_vec,
            "queries": n_q,
            "build_s": build_s,
            "probe_s": probe_s,
            "probe_rows": len(out1),
            "probe_deterministic": bool(same),
        }
        report["copies"][f"{n}"] = entry
        print(json.dumps({f"{n}": entry}), file=sys.stderr)

    with open(out_json, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
