"""Scale measurement for the robots gate's SIZE-GATED join strategy
(round-10 VERDICT #1): below ROBOTS_BROADCAST_MAX_RULES the per-host
rules table broadcasts (zero frontier shuffle); above it the gate
falls back to a shuffle-hash join on host. This tool proves both
regimes at host counts the weak-list flag was about:

- 100k hosts (broadcast regime): the measured-tier fast path;
- 1M hosts (broadcast regime, ~2.1M rule rows): ALSO re-run with the
  fallback FORCED (broadcast_max_rules=0) and every (host, path)
  verdict compared — a full-join disagreement count, asserted 0, so
  regime parity is executed, not prose;
- 10M hosts (~21.4M rule rows > the 4M-row gate): the fallback
  EXECUTES BY DEFAULT — the configuration that previously forced a
  multi-GB broadcast. Correctness at this tier is an exact
  arithmetic check: the allowed-count is derived independently in
  DuckDB integer arithmetic from the fixture's residue classes.

Fixture (all in-engine, spark.range — no driver-side rows): host i
carries Disallow /private/, Allow /private/ok, and every 7th host a
wildcard Disallow /*.zip$; URL j lands on host j % n_hosts with a
path from four residue classes (no-match allow, literal disallow,
longer-literal allow override, wildcard-anchor disallow on 7th
hosts) — so longest-match, tie-break, wildcard and rule-free
resolution all execute at every tier.

Appends a ``robots_gate`` section to CRAWL_SCALEBENCH.json with
--merge, else writes /tmp/robots_scalebench.json.

Usage: python tools/robots_scalebench.py [--merge] [host_counts...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import duckdb
    from pyspark.sql import functions as F

    from vmware_graph_spark.operators.crawl import (
        ROBOTS_BROADCAST_MAX_RULES,
        robots_filter,
    )
    from vmware_graph_spark.session import get_spark, tune

    tiers = [int(c) for c in sys.argv[1:] if not c.startswith("-")] or [
        100_000,
        1_000_000,
        10_000_000,
    ]

    spark = get_spark("robots-scalebench")
    tune(spark)
    spark.sparkContext.setLogLevel("ERROR")

    def fixture(n_hosts: int, n_urls: int):
        hosts = spark.range(n_hosts).select(
            F.concat(F.lit("h"), F.col("id")).alias("host"),
            F.col("id").alias("hid"),
        )
        rules = (
            hosts.select(
                "host",
                F.lit("/private/").alias("path_prefix"),
                F.lit(False).alias("allow"),
            )
            .unionAll(
                hosts.select(
                    "host", F.lit("/private/ok").alias("path_prefix"),
                    F.lit(True).alias("allow"),
                )
            )
            .unionAll(
                hosts.filter(F.col("hid") % 7 == 0).select(
                    "host", F.lit("/*.zip$").alias("path_prefix"),
                    F.lit(False).alias("allow"),
                )
            )
        )
        n_rules = 2 * n_hosts + (n_hosts + 6) // 7
        j = F.col("id")
        urls = spark.range(n_urls).select(
            F.concat(F.lit("h"), (j % n_hosts).cast("string")).alias("host"),
            F.when(j % 4 == 0, F.concat(F.lit("/a/"), j.cast("string")))
            .when(j % 4 == 1, F.concat(F.lit("/private/x"), j.cast("string")))
            .when(j % 4 == 2, F.concat(F.lit("/private/ok"), j.cast("string")))
            .otherwise(F.concat(F.lit("/files/f"), j.cast("string"), F.lit(".zip")))
            .alias("path"),
        )
        return rules, n_rules, urls

    def expected_allowed(n_hosts: int, n_urls: int) -> int:
        # exact integer oracle, independent engine: class 0 and 2 allow,
        # class 1 disallows, class 3 disallows only on every-7th hosts.
        return duckdb.sql(
            f"SELECT count(*) FROM range({n_urls}) t(i) "
            "WHERE i % 4 = 0 OR i % 4 = 2 "
            f"   OR (i % 4 = 3 AND (i % {n_hosts}) % 7 <> 0)"
        ).fetchone()[0]

    def join_node(df) -> str:
        plan = df._jdf.queryExecution().executedPlan().toString()
        if "ShuffledHashJoin" in plan:
            return "shuffle_hash"
        if "BroadcastHashJoin" in plan:
            return "broadcast"
        return "other"

    report: dict = {
        "load_1m_at_start": round(os.getloadavg()[0], 2),
        "broadcast_max_rules": ROBOTS_BROADCAST_MAX_RULES,
        "tiers": {},
    }
    for n_hosts in tiers:
        n_urls = max(n_hosts, 2_000_000)
        rules, n_rules, urls = fixture(n_hosts, n_urls)

        t0 = time.time()
        out = robots_filter(urls, rules, rules_rows=n_rules)
        allowed = out.filter(F.col("fetch_allowed")).count()
        gate_s = round(time.time() - t0, 2)
        want = expected_allowed(n_hosts, n_urls)
        assert allowed == want, (n_hosts, allowed, want)

        entry = {
            "hosts": n_hosts,
            "rule_rows": n_rules,
            "frontier_urls": n_urls,
            "regime": join_node(out),
            "gate_s": gate_s,
            "urls_per_s": round(n_urls / gate_s, 0),
            "allowed": allowed,
            "allowed_expected": want,
        }
        expected_regime = (
            "broadcast" if n_rules <= ROBOTS_BROADCAST_MAX_RULES else "shuffle_hash"
        )
        assert entry["regime"] == expected_regime, (entry["regime"], expected_regime)

        if n_hosts == 1_000_000:
            # regime parity, executed: force the fallback on the SAME
            # fixture and count (host, path) verdict disagreements.
            t0 = time.time()
            forced = robots_filter(
                urls, rules, rules_rows=n_rules, broadcast_max_rules=0
            )
            assert join_node(forced) == "shuffle_hash"
            disagree = (
                out.withColumnRenamed("fetch_allowed", "a")
                .join(
                    forced.withColumnRenamed("fetch_allowed", "b"),
                    ["host", "path"],
                    "full",
                )
                .filter(
                    F.col("a").isNull()
                    | F.col("b").isNull()
                    | (F.col("a") != F.col("b"))
                )
                .count()
            )
            entry["forced_fallback_s"] = round(time.time() - t0, 2)
            entry["verdict_disagreements_vs_broadcast"] = disagree
            assert disagree == 0, disagree

            # the COUNT-OFF-PERSIST path (round-12, verdict #6): omit
            # rules_rows — the operator persists the per-host aggregate
            # and counts input rows off it (the parse lineage runs
            # once). Same verdict total, and the wall records what the
            # self-counting gate costs at 1M hosts / 2.1M rules.
            t0 = time.time()
            self_counted = robots_filter(urls, rules)
            allowed_sc = self_counted.filter(F.col("fetch_allowed")).count()
            entry["self_counted_gate_s"] = round(time.time() - t0, 2)
            entry["self_counted_allowed"] = allowed_sc
            assert allowed_sc == want, (allowed_sc, want)
            spark.catalog.clearCache()  # drop the operator's persist

        report["tiers"][str(n_hosts)] = entry
        print(json.dumps({str(n_hosts): entry}), file=sys.stderr)

    if "--merge" in sys.argv:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "CRAWL_SCALEBENCH.json",
        )
        with open(path) as f:
            doc = json.load(f)
        doc["robots_gate"] = report
        with open(path, "w") as f:
            json.dump(doc, f, indent=2)
    else:
        with open("/tmp/robots_scalebench.json", "w") as f:
            json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
