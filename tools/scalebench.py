"""Scale-growth measurement: ~10× the sf0.1 fixtures, same queries.

The driver bench (bench.py) times the headline set at one scale factor;
this tool is the evidence behind the 100 TB design notes — it builds a
~sf1 dataset (10 key-shifted, content-perturbed copies of the sf0.1
fact tables; dimensions unchanged) in /tmp and times a representative
query slice at BOTH scales, reporting the runtime growth ratio per
query. A shape that is linear-in-rows should grow ≈10× or less (fixed
job overhead amortizes); anything super-linear is a design bug the
local bench can't see.

Perturbations keep workload shape honest:
- documents: every 3rd token gets a per-copy suffix, so copies are NOT
  near-duplicates of each other (Jaccard ≈ 0 across copies) and the
  LSH pair structure scales like a real corpus, not like 10 identical
  mirrors (which would quadratically inflate every band bucket).
- embeddings: small per-copy, per-dim offset — copies are distinct
  vectors with the same distribution.
- events: user_id shifts per copy (10× users, same per-user density —
  the growth mode a real event stream has).
- orders/lineitem: orderkey-shifted copies over the SAME customers
  (10× orders per customer).

Usage: python tools/scalebench.py [n_copies] [out_json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
SCALED = "/tmp/vgs_scale"

QUERIES_TO_TIME = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_region_revenue",
    "window_topk_orders_per_customer",
    "exact_dedup_documents",
    "minhash_lsh_pairs_documents",
    "simhash_documents",
    "cosine_topk_embeddings",
    "asof_join_clicks_views",
    "sessionize_user_events",
    "connected_components_bipartite",
    "kmeans_clusters_embeddings",
    "dup_span_removal_documents",
    "random_walks_parts",
    "embedding_covariance_matrix",
    "record_linkage_customer_supplier",
    "bloom_prune_join_orders",
    "shuffle_skew_report",
    # round-3 additions: the de-bottlenecked global-window rewrites and
    # the new corpus ops, measured at both scales like everything else
    "jaccard_pairs_prefix_filtered",
    "zipf_slope_token_frequencies",
    "equidepth_histogram_event_values",
    "bm25_topk_documents",
    "nn_descent_knn_graph",
    # round-3 continuation: new linear-scan corpus ops
    "gazetteer_phrase_tag_totals",
    "bleu2_adjacent_docs",
    "modularity_trade_nation_partition",
    "token_budget_selection_by_lang",
    # round-4: split/decontamination/quality family
    "leakage_safe_split_documents",
    "decontaminate_against_heldout",
    "token_entropy_quality",
    "length_bucket_packing_plan",
]

COPY_AS_IS = ["region", "nation", "customer", "part", "supplier"]


def build_scaled(spark, n_copies: int) -> None:
    from pyspark.sql import functions as F

    if os.path.isdir(SCALED):
        shutil.rmtree(SCALED)
    os.makedirs(SCALED, exist_ok=True)
    for t in COPY_AS_IS:
        spark.read.parquet(f"{BASE}/{t}.parquet").write.mode("overwrite").parquet(
            f"{SCALED}/{t}.parquet"
        )

    def copies(df, shift_exprs):
        parts = []
        for i in range(n_copies):
            c = df
            for col, fn in shift_exprs.items():
                c = c.withColumn(col, fn(i))
            parts.append(c)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    orders = spark.read.parquet(f"{BASE}/orders.parquet")
    copies(
        orders, {"o_orderkey": lambda i: F.col("o_orderkey") + F.lit(i * 10_000_000)}
    ).write.mode("overwrite").parquet(f"{SCALED}/orders.parquet")

    li = spark.read.parquet(f"{BASE}/lineitem.parquet")
    copies(
        li, {"l_orderkey": lambda i: F.col("l_orderkey") + F.lit(i * 10_000_000)}
    ).write.mode("overwrite").parquet(f"{SCALED}/lineitem.parquet")

    ev = spark.read.parquet(f"{BASE}/events.parquet")
    copies(
        ev,
        {
            "event_id": lambda i: F.col("event_id") + F.lit(i * 1_000_000),
            "user_id": lambda i: F.col("user_id") + F.lit(i * 100_000),
        },
    ).write.mode("overwrite").parquet(f"{SCALED}/events.parquet")

    docs = spark.read.parquet(f"{BASE}/documents.parquet")

    def perturb_text(i):
        if i == 0:
            return lambda _i: F.col("text")
        return None

    doc_parts = [docs]
    for i in range(1, n_copies):
        doc_parts.append(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 1_000_000)).withColumn(
                "text",
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda x, j: F.when(
                            j % 3 == 0, F.concat(x, F.lit(f"~c{i}"))
                        ).otherwise(x),
                    ),
                    " ",
                ),
            )
        )
    out = doc_parts[0]
    for p in doc_parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{SCALED}/documents.parquet")

    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    emb_parts = [emb]
    for i in range(1, n_copies):
        emb_parts.append(
            emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * 1_000_000)).withColumn(
                "embedding",
                F.transform(
                    F.col("embedding"),
                    lambda x, j: (
                        x + F.lit(0.0001 * i) * ((j % 7) - F.lit(3)).cast("float")
                    ).cast("float"),
                ),
            )
        )
    out = emb_parts[0]
    for p in emb_parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{SCALED}/embeddings.parquet")


def time_queries(spark, sf_dir: str) -> dict[str, float]:
    from vmware_graph_spark.queries import QUERIES

    res = {}
    for name in QUERIES_TO_TIME:
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        res[name] = round(time.time() - t0, 3)
    return res


def main() -> None:
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_json = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scalebench.json"

    from vmware_graph_spark.session import get_spark, tune

    spark = get_spark("scalebench")
    tune(spark)
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    build_scaled(spark, n_copies)
    build_s = round(time.time() - t0, 1)

    base = time_queries(spark, BASE)
    scaled = time_queries(spark, SCALED)
    report = {
        "n_copies": n_copies,
        "build_s": build_s,
        "base_s": base,
        "scaled_s": scaled,
        "ratio": {
            k: round(scaled[k] / base[k], 2) if base[k] > 0 else None for k in base
        },
    }
    with open(out_json, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
