"""Scale measurement for the reference's CORE workload: the full
RVTools 2-pass refresh (refresh-vmware.cypher E1 — mark → ingest →
sweep), per stage, at 1×/10×/100× workbook volume (round-7 VERDICT
"Next #1": everything above sf0.01 was unmeasured).

The synthetic workbook derives hosts from ``supplier`` and VMs from
``customer`` (queries.py `_workbook`), so workbook volume scales with
those tables while the vCenter/cluster dimensions stay fixed (5 vCs /
25 clusters) — the growth mode a real estate has (more VMs per
cluster, not more vCenters):

- 1×   = sf0.01  (1.5k VMs / 100 hosts — the round-3..7 datapoint)
- 10×  = sf0.1   (15k VMs / 1k hosts — driver-provided)
- 100× = /tmp/vgs_ingest_scale (150k VMs / 10k hosts — ten key-shifted
  copies of sf0.1's customer+supplier; nation/region/orders as-is)

Per scale, two measurements:

1. HEADLINE (production shape, no extra materialization):
   cold build  = run_ingest(workbook A) + publish snapshot
   refresh     = refresh(workbook A′, prev) + orphan count + publish
2. PER-STAGE attribution (separate run): after each stage call, force
   the labels/edge batches that stage queued — extra flushes make the
   total exceed the headline (stated in the artifact), but the split
   shows which stage's EXECUTION grows with volume, which the lazy
   headline run cannot attribute.

Usage: python tools/ingest_scalebench.py [out_json] [scales...]
       scales from {1,10,100}; default all three.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALED = "/tmp/vgs_ingest_scale"
SNAP = "/tmp/vgs_ingest_snap"
COPY_AS_IS = ["region", "nation", "orders"]
SHIFT = {"supplier": "s_suppkey", "customer": "c_custkey"}


def build_scaled(spark, n_copies: int = 10) -> None:
    """Ten key-shifted copies of sf0.1's customer/supplier → ~150k VMs /
    10k hosts. Shifted keys keep every `ck % k` branch distribution of
    the vInfo fixture; names collide across copies (real estates have
    duplicate VM names) while UUIDs — derived from the key — stay
    unique."""
    from pyspark.sql import functions as F

    base = "/root/testdata/sf0.1"
    if os.path.isdir(SCALED):
        shutil.rmtree(SCALED)
    os.makedirs(SCALED, exist_ok=True)
    for t in COPY_AS_IS:
        spark.read.parquet(f"{base}/{t}.parquet").write.mode("overwrite").parquet(
            f"{SCALED}/{t}.parquet"
        )
    for t, key in SHIFT.items():
        df = spark.read.parquet(f"{base}/{t}.parquet")
        parts = [
            df.withColumn(key, F.col(key) + F.lit(i * 10_000_000))
            for i in range(n_copies)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{SCALED}/{t}.parquet")


def _fresh_snap(tag: str) -> str:
    d = f"{SNAP}_{tag}"
    if os.path.isdir(d):
        shutil.rmtree(d)
    return d


def headline(spark, sf_dir: str, tag: str) -> dict:
    """Production-shape cold build + A→A′ refresh, one number each."""
    from vmware_graph_spark.ingest.refresh import refresh, run_ingest
    from vmware_graph_spark.queries import _workbook
    from vmware_graph_spark.store.graph import GraphStore

    snap = _fresh_snap(tag)

    t0 = time.time()
    store = run_ingest(spark, _workbook(spark, sf_dir))
    store.publish(snap)
    cold_s = round(time.time() - t0, 1)
    counts = GraphStore.read(spark, snap).counts()

    t0 = time.time()
    prev = GraphStore.read(spark, snap)
    res = refresh(spark, _workbook(spark, sf_dir, prime=True), prev=prev)
    orphans = res.orphans.count()
    res.store.publish(snap)
    refresh_s = round(time.time() - t0, 1)

    return {
        "cold_build_s": cold_s,
        "refresh_sweep_s": refresh_s,
        "orphans_swept": orphans,
        "labels": len([k for k in counts if k != "edges"]),
        "nodes": sum(v for k, v in counts.items() if k != "edges"),
        "edges": counts.get("edges", 0),
    }


def per_stage(spark, sf_dir: str) -> dict[str, float]:
    """Stage-attributed cold build: force-materialize what each stage
    queued right after its call. Totals exceed the headline (extra
    flush jobs) by design — this run answers 'which stage grows',
    not 'how long is the build'."""
    from vmware_graph_spark.ingest.stages import STAGE_SHEETS, STAGES
    from vmware_graph_spark.queries import _workbook
    from vmware_graph_spark.store.graph import GraphStore

    sheets = _workbook(spark, sf_dir)
    store = GraphStore(spark)
    out: dict[str, float] = {}
    for stage in STAGES:
        if STAGE_SHEETS[stage] not in sheets:
            continue
        seen_batches = len(store._edge_batches)
        t0 = time.time()
        stage(store, sheets)
        # force exactly what this stage queued: its pending label
        # merges (flush + materialize) and its new edge batches
        for label in list(store._pending):
            store.vertices(label).write.format("noop").mode("overwrite").save()
        for b in store._edge_batches[seen_batches:]:
            b.write.format("noop").mode("overwrite").save()
        out[stage.__name__] = round(time.time() - t0, 2)
    return out


def main() -> None:
    out_json = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ingest_scalebench.json"
    scales = [int(s) for s in sys.argv[2:]] or [1, 10, 100]

    from vmware_graph_spark.session import get_spark, tune

    spark = get_spark("ingest-scalebench")
    tune(spark)
    spark.sparkContext.setLogLevel("ERROR")

    dirs = {1: "/root/testdata/sf0.01", 10: "/root/testdata/sf0.1", 100: SCALED}
    report: dict = {"scales": {}, "load_1m_at_start": round(os.getloadavg()[0], 2)}
    if 100 in scales:
        t0 = time.time()
        build_scaled(spark)
        report["build_100x_s"] = round(time.time() - t0, 1)

    for s in scales:
        print(f"== scale {s}x ({dirs[s]}) ==", file=sys.stderr)
        entry = headline(spark, dirs[s], f"s{s}")
        entry["per_stage_forced_s"] = per_stage(spark, dirs[s])
        report["scales"][f"{s}x"] = entry
        print(json.dumps({f"{s}x": entry}), file=sys.stderr)

    with open(out_json, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
