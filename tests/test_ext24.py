"""Round-11: composed crawl loop + sitemap-prior recrawl scheduling."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_recrawl_priority_with_sitemap_arms(spark):
    """History precedence, changefreq prior ladder, unknown-freq
    default, missing/future lastmod clamp."""
    from vmware_graph_spark.operators.crawl import (
        DEFAULT_RATE_PRIOR,
        recrawl_priority_with_sitemap,
    )

    history = spark.createDataFrame(
        [
            ("u1", "2026-06-01 00:00:00", "a"),
            ("u1", "2026-06-22 00:00:00", "b"),
        ],
        "url string, fetch_ts string, fp string",
    )
    sitemap = spark.createDataFrame(
        [
            ("u1", "2026-01-01", "always"),    # has history -> ignored
            ("u2", "2026-07-17", "weekly"),    # 30 days * 0.25
            ("u3", "2026-09-01", "daily"),     # future lastmod -> 0
            ("u4", None, "quarterly"),         # unknown freq + no lastmod
            ("u5", "2026-08-06", "never"),     # rate 0 -> priority 0
        ],
        "loc string, lastmod string, changefreq string",
    )
    out = {
        r.url: r
        for r in recrawl_priority_with_sitemap(
            history, sitemap, F.lit("2026-08-16")
        ).collect()
    }
    assert len(out) == 5
    u1 = out["u1"]
    assert (u1.source, u1.n_fetches, u1.change_rate, u1.age_days) == (
        "history", 2, 1.0, 55
    )
    u2 = out["u2"]
    assert (u2.source, u2.change_rate, u2.age_days, u2.priority) == (
        "sitemap", 0.25, 30, 7.5
    )
    assert (out["u3"].age_days, out["u3"].priority) == (0, 0.0)
    u4 = out["u4"]
    assert (u4.change_rate, u4.age_days) == (DEFAULT_RATE_PRIOR, 0)
    assert (out["u5"].change_rate, out["u5"].priority) == (0.0, 0.0)


def test_parse_robots_sitemap_urls_edges():
    from vmware_graph_spark.operators.crawl import parse_robots_sitemap_urls

    txt = (
        "﻿# bom + comment\n"
        "User-agent: a\nDisallow: /x\n"
        "Sitemap: http://h/s1.xml\n"
        "SITEMAP:   https://h/s2.xml.gz   # trailing comment\n"
        "Sitemap: http://h/s1.xml\n"          # duplicate
        "Sitemap: /relative.xml\n"            # protocol-invalid
        "Sitemap: ftp://h/s.xml\n"            # non-http scheme
        "Sitemap:\n"                          # empty
        "Sitemap http://h/nocolon.xml\n"      # no separator
        "Sitemap: http://h/s3.xml and junk\n"  # trailing junk dropped
    )
    assert parse_robots_sitemap_urls(txt) == [
        "http://h/s1.xml",
        "https://h/s2.xml.gz",
        "http://h/s3.xml",
    ]
    assert parse_robots_sitemap_urls("") == []


def test_robots_access_policy_arms(spark):
    from vmware_graph_spark.operators.crawl import robots_access_policy

    df = spark.createDataFrame(
        [(200,), (204,), (301,), (404,), (451,), (500,), (503,), (None,)],
        "status int",
    )
    got = {
        r.status: r.p
        for r in df.select(
            "status", robots_access_policy(F.col("status")).alias("p")
        ).collect()
    }
    assert got[200] == got[204] == "use_rules"
    assert got[404] == got[451] == "allow_all"
    # unresolved 3xx, 5xx and unreachable all assume complete disallow
    assert got[301] == got[500] == got[503] == got[None] == "disallow_all"

    # RFC 9309 §2.3.1.2's MAY-unavailable arm (round-11 VERDICT #5):
    # only the unresolved-3xx verdict flips — everything else holds
    rfc = {
        r.status: r.p
        for r in df.select(
            "status",
            robots_access_policy(
                F.col("status"), unresolved_redirect="unavailable"
            ).alias("p"),
        ).collect()
    }
    assert rfc[301] == "allow_all"
    assert {k: v for k, v in rfc.items() if k != 301} == {
        k: v for k, v in got.items() if k != 301
    }

    import pytest as _pytest

    with _pytest.raises(ValueError):
        robots_access_policy(F.col("status"), unresolved_redirect="maybe")


def test_detect_crawl_traps_template_and_threshold(spark):
    from vmware_graph_spark.operators.crawl import detect_crawl_traps

    rows = [(f"http://h/cal/{2000 + i % 4}/{i}", f"fp{i % 2}") for i in range(40)]
    rows += [(f"http://h/art/{i}", f"u{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "url string, fp string")
    got = {r.template: r for r in detect_crawl_traps(
        df, min_urls=10, max_content_ratio=0.1
    ).collect()}
    t = got["h/cal/N/N"]
    assert (t.n_urls, t.n_fps, t.is_trap) == (40, 2, 1)
    a = got["h/art/N"]
    assert (a.n_urls, a.n_fps, a.is_trap) == (40, 40, 0)
    # threshold boundary: n_fps == ceil(n_urls * ratio) still convicts
    edge = spark.createDataFrame(
        [(f"http://h/x/{i}", f"f{i % 4}") for i in range(40)],
        "url string, fp string",
    )
    e = detect_crawl_traps(edge, min_urls=10, max_content_ratio=0.1).collect()[0]
    assert (e.n_fps, e.is_trap) == (4, 1)


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_robots_availability_gate_plan(spark):
    """The availability composition stays broadcast-only: the rules
    side and the 5-row status table both replicate; the frontier never
    hash-partitions on its key."""
    from vmware_graph_spark.queries_ext24 import robots_availability_gate

    plan = _plan_of(robots_availability_gate(spark, SF))
    assert "BroadcastHashJoin" in plan
    # allow the scan-level rebalance (REPARTITION_BY_NUM) hash spread;
    # forbid a JOIN-induced (ENSURE_REQUIREMENTS) exchange on doc_id
    assert not any(
        "hashpartitioning(doc_id" in ln and "ENSURE_REQUIREMENTS" in ln
        for ln in plan.splitlines()
    )
    assert "BatchEvalPython" not in plan


def test_crawl_trap_detection_plan_single_shuffle(spark):
    """Trap detection is one narrow aggregation: the only exchange is
    the (template) hash partitioning for the countDistinct rollup —
    no join, no Python."""
    from vmware_graph_spark.queries_ext24 import crawl_trap_detection

    plan = _plan_of(crawl_trap_detection(spark, SF))
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "SinglePartition" not in plan


def test_focused_crawl_priority_rows_and_plan(spark):
    """Anchor-relevance scoring: 50 targets, lexicon fraction 1/3 for
    topic0/1 in-links and 0 for topic2/3; the plan is join-free (the
    lexicon is a constant-folded membership) with one aggregation."""
    from vmware_graph_spark.queries_ext24 import focused_crawl_priority

    from collections import defaultdict

    from vmware_graph_spark.sources.tables import load_table

    df = focused_crawl_priority(spark, SF)
    rows = {r.target: r for r in df.collect()}
    ids = [
        r.doc_id
        for r in load_table(spark, SF, "documents").select("doc_id").collect()
    ]
    exp = defaultdict(list)
    for i in ids:
        exp[i % 50].append(1 / 3 if i % 4 in (0, 1) else 0.0)
    assert len(rows) == len(exp)
    for t, r in rows.items():
        m = int(t.rsplit("/", 1)[1])
        assert r.n_inlinks == len(exp[m])
        assert abs(r.topic_score - round(sum(exp[m]) / len(exp[m]), 6)) < 1e-9
    plan = _plan_of(df)
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_robots_cache_policy_arms(spark):
    from vmware_graph_spark.operators.crawl import robots_cache_policy

    rows = [
        ("2026-08-15 00:00:00", None),                      # default 24h, age 24h
        ("2026-08-15 23:00:00", "max-age=3600"),            # exactly max-age
        ("2026-08-15 23:00:01", "max-age=3600"),            # one second fresh
        ("2026-08-15 12:00:00", "no-store, private"),       # always refetch
        ("2026-08-17 00:00:00", None),                      # future fetch -> clamp
        ("2026-08-15 12:00:00", "s-maxage=1, max-age=7200"),  # first max-age wins
        ("2026-08-15 12:00:00", "maximum-age=1"),           # not the directive
        ("2026-08-15 12:00:00", "max-age=99999999999999999999"),  # overflow -> cap
        ("2026-08-15 12:00:00", "max-age=3155760000"),      # huge -> cap ~31y
    ]
    df = spark.createDataFrame(rows, "fetched string, cc string")
    pol = robots_cache_policy(
        F.to_timestamp("fetched"),
        F.to_timestamp(F.lit("2026-08-16 00:00:00")),
        F.col("cc"),
    )
    got = [
        (r.p.max_age_s, r.p.age_s, r.p.refetch_due)
        for r in df.select(pol.alias("p")).collect()
    ]
    assert got[0] == (86400, 86400, True)
    assert got[1] == (3600, 3600, True)
    assert got[2] == (3600, 3599, False)
    assert got[3] == (0, 43200, True)
    assert got[4] == (86400, 0, False)
    assert got[5] == (7200, 43200, True)
    assert got[6] == (86400, 43200, False)
    assert got[7] == (999_999_999, 43200, False)
    assert got[8] == (999_999_999, 43200, False)


def test_crawl_loop_pipeline_rows_and_plan(spark):
    """The composed loop's per-host output: budget conserves exactly,
    wave widths come from each host's DECLARED Crawl-delay (1/2/4/
    invalid/8 -> 8/4/2/8/1 — round-11 VERDICT #3), waves =
    ceil(n/width), and the plan broadcasts the rules side (5 hosts
    -> broadcast regime) with no Python in the frontier path except
    the robots parser."""
    from vmware_graph_spark.queries_ext24 import crawl_loop_pipeline

    widths = {0: 8, 1: 4, 2: 2, 3: 8, 4: 1}
    df = crawl_loop_pipeline(spark, SF)
    rows = df.collect()
    assert {r.host for r in rows} == {
        f"www.site{k}.example.com" for k in range(5)
    }
    assert sum(r.alloc for r in rows) == 1000
    for r in rows:
        k = int(r.host[len("www.site")])
        assert r.width == widths[k], r
        assert r.n_waves == -(-r.n_eligible // r.width), r
        assert r.alloc > 0 and r.n_eligible > 0

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    # the only Python node is the executor-side robots parser
    assert plan.count("ArrowEvalPython") == 0
    assert "BatchEvalPython" not in plan


def test_crawl_loop_wave_rank_is_range_bucketed(spark):
    """Round-11 VERDICT #3: the composed loop's wave schedule must not
    contain an unbounded per-host window — every data-sized
    row_number runs inside a (host, __range_bucket)-partitioned window
    (``exact_global_rank``), so a 99%-one-host frontier parallelizes
    across ~buckets tasks. The only permitted unpartitioned work is
    the bounded ≤ hosts x buckets offset prefix sums and
    apportion_budget's scalar totals."""
    import re

    from vmware_graph_spark.queries_ext24 import crawl_loop_pipeline

    df = crawl_loop_pipeline(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    rn_specs = re.findall(r"row_number\(\) windowspecdefinition\(([^)]*)\)", plan)
    assert rn_specs, plan[:3000]
    # apportion_budget's remainder rank + the wave rank: ALL bucketed
    for spec in rn_specs:
        assert "__range_bucket" in spec, spec
    # bounded exchanges only: the ≤buckets-row offset sums / scalar
    # totals (apportion_budget had 6 pre-composition; the wave rank
    # adds its own offset sum)
    assert plan.count("Arguments: SinglePartition") <= 8, plan[:3000]
