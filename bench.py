"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q1": sec, ...}, "sf": <sf>}

HEADLINE METRIC POLICY (round-11 VERDICT #2): ``value`` — the RAW
per-query-median suite total from an IDLE-GATED (load<2 quiesce),
CALIBRATION-GATED (probe median within ±15% of CALIB_REF) run — is the
committed headline. ``value_normalized`` is DIAGNOSTIC ONLY: the
calibration probe (a tiny fixed CPU job) does not share the suite's
load sensitivity, so proportional normalization AMPLIFIES probe noise
instead of absorbing it (same-code normalized spread 13.3→33.2 s in
BENCHLOG while gated raw values sat at 26.9-29.1 s). Read
cross-round comparisons as: raw ``value`` where ``calib_within_gate``
is true; treat ``value_normalized`` as a host-drift annotation, never
as the regression signal.

Each query is forced with a noop write (full computation, no driver
collect). The headline set spans the engine's surface: scan-agg, joins,
windows, merge/upsert, dedup (exact + LSH), similarity, text, graph.
The suite runs SPARK_GRAFT_BENCH_PASSES (default 3) full passes after
a load<2 quiesce gate; the reported per-query numbers are medians and
the artifact carries the per-pass totals (`runs`) and min/max `band`.
`load_1m_per_run` samples the 1-minute load at each pass START — from
pass 2 on it mostly reads the PREVIOUS pass's own decaying self-load,
so only the first entry (gated <2) indicates external contention.

Continuity: HEADLINE is PINNED as of round 2 (the 21 names below match
BENCH_r02.json exactly) — do not rename or reorder, so per-query
history stays diffable across rounds. Every run also APPENDS its
result to BENCHLOG.jsonl (timestamped) for regression tracking.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_region_revenue",
    "window_topk_orders_per_customer",
    "merge_nodes_set",
    "merge_edges_undirected_canonical",
    "snapshot_diff_orphans",
    "exact_dedup_documents",
    "minhash_lsh_pairs_documents",
    "simhash_documents",
    "cosine_topk_embeddings",
    "text_stats",
    "sessionize_user_events",
    "connected_components_bipartite",
    "ingest_vhost_stage",
    "ingest_vinfo_conditional_stage",
    "corpus_prep_pipeline",
    "near_dedup_clusters",
    "asof_join_clicks_views",
    "dup_span_removal_documents",
    "bpe_train_merges",
]

# Reference runtime (sec) of the _calibration probe, committed from the
# idle host state of round 9 (load 0.70; median of 7 solo reps
# 0.473-1.075 s). Used to scale raw totals into `value_normalized`;
# never retuned afterwards so the normalized series stays comparable.
CALIB_REF = 0.543

# CALIBRATION GATE (round-10 VERDICT #6): a committed artifact must
# come from a run whose median calibration probe is within
# ±CALIB_GATE_PCT of CALIB_REF — BENCH_r10 was captured under load
# (calib drift up to 1.5x within the run) and read as a phantom +9%.
# When an attempt's median probe lands outside the gate, the suite
# re-quiesces and re-runs the counted passes (up to
# SPARK_GRAFT_BENCH_ATTEMPTS attempts, default 3) and commits the
# attempt whose probe sits CLOSEST to the reference; the artifact
# carries `calib_within_gate` + per-attempt probe medians so a still-
# drifting host is identifiable rather than silently normalized away.
CALIB_GATE_PCT = 15


def _quiesce(max_wait_s: int = 240, idle_load: float = 2.0) -> float:
    """Wait (bounded) for background load to drain before timing.

    BENCH_r05 recorded an 18% phantom regression because the suite ran
    concurrently with end-of-round snapshot work — the numbers were
    load noise, not code (round-5 VERDICT #8), and BENCH_r07 was
    captured at load 7.07, 16% above the same-day idle runs (round-7
    VERDICT #2 — gate tightened to <2 with a longer budget). If the
    1-minute load average exceeds ``idle_load``, poll until it drops or
    the wait budget runs out, then proceed either way — the run is
    never refused, but the observed load is annotated in the output
    so a noisy number is identifiable after the fact."""
    deadline = time.time() + max_wait_s
    load = os.getloadavg()[0]
    while load > idle_load and time.time() < deadline:
        time.sleep(10)
        load = os.getloadavg()[0]
    return load


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    load_at_start = round(_quiesce(), 2)

    from vmware_graph_spark.queries import QUERIES
    from vmware_graph_spark.session import get_spark

    spark = get_spark("vmware-graph-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # Silence the known-benign "Failed to update accumulator (Unknown
    # class)" DAGScheduler ERROR spam (the BENCH_r02 tail trace):
    # lazily-materialized localCheckpoint RDDs (GraphStore lineage
    # cuts, _sheet_fixture) compute under a LATER SQL execution, whose
    # task completions then report SQLMetrics accumulators the original
    # execution already unregistered. DAGScheduler catches exactly this
    # (updateAccumulators' non-fatal catch, DAGScheduler.scala:1787-94)
    # and only logs; results are unaffected (rc=0, timings complete).
    # Suppression is scoped to THAT message only (a log4j2 RegexFilter
    # DENYing "Failed to update accumulator"), so every other scheduler
    # ERROR still reaches stderr; a REAL scheduler failure additionally
    # surfaces as a raised job error in Python.
    jvm = spark.sparkContext._jvm
    result_enum = jvm.org.apache.logging.log4j.core.Filter.Result
    flt = jvm.org.apache.logging.log4j.core.filter.RegexFilter.createFilter(
        ".*Failed to update accumulator.*", None, True,
        result_enum.DENY, result_enum.NEUTRAL,
    )
    ctx = jvm.org.apache.logging.log4j.core.LoggerContext.getContext(False)
    ctx.getConfiguration().getLoggerConfig(
        "org.apache.spark.scheduler.DAGScheduler"
    ).addFilter(flt)
    ctx.updateLoggers()

    # Warm the JVM + parquet footers + codegen paths (agg/join/window/
    # shuffle) once so the first timed query doesn't absorb cold-start.
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    li.count()
    from pyspark.sql import Window as _W
    from pyspark.sql import functions as _F

    warm = spark.range(10_000).withColumn("g", _F.col("id") % 7)
    (
        warm.join(warm.groupBy("g").agg(_F.sum("id").alias("s")), "g")
        .withColumn("rn", _F.row_number().over(_W.partitionBy("g").orderBy("id")))
        .agg(_F.sum("rn"))
        .collect()
    )
    # ... and the noop datasource commit path, which every timed query
    # uses — otherwise its classloading lands in the first query's time.
    warm.write.format("noop").mode("overwrite").save()

    def _calibration(n: int = 3) -> float:
        """Host-drift probe (round-8 VERDICT #4): a FIXED, data-free,
        CPU-bound Spark job (md5 over a 20M-row range, all 32 cores)
        timed around each pass. Its runtime depends only on how fast
        this host currently executes JVM compute — same-day idle
        medians of the SUITE drifted 27.4→34.8 s with identical code
        (BENCHLOG), and this probe moves with that drift while being
        immune to code changes in the engine. Median of ``n`` reps."""
        reps = []
        for _ in range(n):
            t0 = time.time()
            (
                spark.range(20_000_000)
                .select(_F.md5(_F.col("id").cast("string")).alias("h"))
                .select(_F.max("h"))
                .collect()
            )
            reps.append(time.time() - t0)
        reps.sort()
        return reps[len(reps) // 2]

    # MEASUREMENT FIX (round 12, documented in OPTIMIZATION_r12.md):
    # several queries pin shared subtrees via persist(DISK_ONLY)
    # (operators/pin.py). Spark's CacheManager substitutes a cached
    # relation into ANY later plan that is structurally equal, so
    # without an explicit release, pass 2/3 (and later queries in the
    # same pass that share subtrees, e.g. near_dedup_clusters after
    # minhash_lsh_pairs_documents) read pass-1 blocks instead of
    # recomputing from parquet — the timings then measure the block
    # store, not the engine. Releasing the pin registry after each
    # timed query restores per-invocation isolation: every query
    # computes from the parquet inputs every time. Within-invocation
    # pin sharing (the legitimate single-materialization of a subtree
    # used twice in ONE query) is untouched. The pre-fix series
    # (BENCHLOG ≤ 2026-08-17, BENCH_r11 and earlier) was measured
    # without the release and reads FASTER on the dedup/BPE family;
    # kept as-is for the record, not comparable query-by-query.
    from vmware_graph_spark.operators.pin import release_pins

    def _run_pass() -> dict[str, float]:
        t: dict[str, float] = {}
        for name in HEADLINE:
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            t[name] = round(time.time() - t0, 3)
            release_pins()
        return t

    # UNCOUNTED warmup pass (round-8 VERDICT #7): every committed
    # 3-pass run's first pass was 1.5-2.5× the warm ones (JIT +
    # classloading + first-touch page cache, not code), which widened
    # `band` into uselessness. The full suite runs once untimed-…
    # (well: timed but EXCLUDED from medians), committed separately as
    # `cold_pass_total`/`cold_queries` so the cold-start story stays
    # visible (round-8 ADVICE: record the cold-cache per-query
    # timings). Bridge to the r2-r8 series: those medians were
    # median-of-3-including-cold, which for a one-outlier series picks
    # the middle (warm) pass — so `value` remains comparable; only the
    # band tightens.
    _calibration(1)  # warm the probe's own codegen before first use
    cold = _run_pass()

    # Counted passes; report the per-query MEDIAN plus the per-pass
    # totals and their min/max band, so a committed artifact carries
    # its own noise evidence (round-7 VERDICT #2: a single loaded run
    # made <30% per-query regressions invisible).
    n_passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))

    def median(vals: list[float]) -> float:
        s = sorted(vals)
        mid = len(s) // 2
        return s[mid] if len(s) % 2 else (s[mid - 1] + s[mid]) / 2

    # NOTE: caches are deliberately NOT cleared between passes — the
    # historical series (r2-r7 min-of-2) is warm, and a clearCache
    # variant was measured to raise medians ~1.5 s without removing
    # the occasional slow pass (GC/compaction pauses show up in the
    # band either way; that is what `runs`/`band` are for).
    def _attempt() -> tuple[list[dict[str, float]], list[float], list[float]]:
        pp: list[dict[str, float]] = []
        loads: list[float] = []
        calib: list[float] = []
        for _ in range(n_passes):
            loads.append(round(os.getloadavg()[0], 2))
            calib.append(round(_calibration(), 3))
            pp.append(_run_pass())
        return pp, loads, calib

    # the calibration gate: retry whole attempts (re-quiescing first)
    # while the probe median sits outside ±CALIB_GATE_PCT of CALIB_REF;
    # keep the attempt closest to the reference.
    max_attempts = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_ATTEMPTS", "3")))
    gate_lo = CALIB_REF * (1 - CALIB_GATE_PCT / 100)
    gate_hi = CALIB_REF * (1 + CALIB_GATE_PCT / 100)
    attempts: list[tuple[list[dict[str, float]], list[float], list[float]]] = []
    attempt_calib_medians: list[float] = []
    for a in range(max_attempts):
        if a > 0:
            _quiesce()
        attempts.append(_attempt())
        attempt_calib_medians.append(round(median(attempts[-1][2]), 3))
        if gate_lo <= attempt_calib_medians[-1] <= gate_hi:
            break
    best = min(
        range(len(attempts)),
        key=lambda a: abs(attempt_calib_medians[a] - CALIB_REF),
    )
    per_pass, pass_loads, calib_per_pass = attempts[best]
    calib_within_gate = gate_lo <= attempt_calib_medians[best] <= gate_hi

    timings = {
        name: round(median([p[name] for p in per_pass]), 3) for name in HEADLINE
    }
    run_totals = [round(sum(p.values()), 3) for p in per_pass]

    total = round(sum(timings.values()), 3)
    # DIAGNOSTIC normalized total (round-11 VERDICT #2 demoted it from
    # headline): raw total scaled by CALIB_REF/median(calib). The
    # probe's load sensitivity is not the suite's, so this AMPLIFIES
    # probe noise under contention — the committed headline is the raw
    # `value` from a calib-gated idle run; this field only annotates
    # how far the host's scalar compute speed sat from the reference.
    calib_med = median(calib_per_pass)
    value_normalized = round(total * (CALIB_REF / calib_med), 3) if calib_med else None
    result = {
        "metric": "headline_suite_total",
        "value": total,
        "unit": "sec",
        "headline_policy": "value = raw idle+calib-gated per-query-median "
                           "total; value_normalized is diagnostic only",
        "queries": timings,
        "sf": sf,
        "load_1m_at_start": load_at_start,
        "runs": run_totals,
        "band": [min(run_totals), max(run_totals)],
        "load_1m_per_run": pass_loads,
        "cold_pass_total": round(sum(cold.values()), 3),
        "cold_queries": cold,
        "calib_per_pass": calib_per_pass,
        "calib_ref": CALIB_REF,
        "value_normalized": value_normalized,
        "calib_gate_pct": CALIB_GATE_PCT,
        "calib_within_gate": calib_within_gate,
        "calib_attempt_medians": attempt_calib_medians,
    }
    print(json.dumps(result))
    # per-query history for round-over-round regression diffing
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCHLOG.jsonl"), "a") as f:
            f.write(json.dumps({"ts": time.strftime("%Y-%m-%dT%H:%M:%S"), **result}) + "\n")
    except OSError:
        pass  # read-only checkout: stdout line is still the contract


if __name__ == "__main__":
    main()
