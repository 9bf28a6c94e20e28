"""Unit tests for the crawl-maintenance family (round-10): sitemap
source, recrawl scheduling, and URL-parameter mining."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# sitemap container
# ---------------------------------------------------------------------------

def test_parse_sitemap_urlset_and_index():
    from vmware_graph_spark.sources.sitemap import (
        make_sitemap_index,
        make_sitemap_xml,
        parse_sitemap,
    )

    entries = [
        {"loc": "http://h/a", "lastmod": "2026-01-02", "changefreq": "daily",
         "priority": "0.8"},
        {"loc": "http://h/b"},  # optional fields absent
    ]
    got = list(parse_sitemap(make_sitemap_xml(entries)))
    assert [e["kind"] for e in got] == ["url", "url"]
    assert got[0]["loc"] == "http://h/a" and got[0]["priority"] == "0.8"
    assert got[1]["lastmod"] is None and got[1]["changefreq"] is None

    idx = make_sitemap_index([("http://h/s1.xml.gz", "2026-02-03"),
                              ("http://h/s2.xml.gz", None)])
    got = list(parse_sitemap(idx))
    assert [(e["kind"], e["loc"], e["lastmod"]) for e in got] == [
        ("sitemap", "http://h/s1.xml.gz", "2026-02-03"),
        ("sitemap", "http://h/s2.xml.gz", None),
    ]


def test_parse_sitemap_namespace_tolerance_and_gzip():
    import gzip

    from vmware_graph_spark.sources.sitemap import parse_sitemap

    # no xmlns at all (common in the wild)
    bare = b"<urlset><url><loc>http://h/x</loc></url></urlset>"
    assert [e["loc"] for e in parse_sitemap(bare)] == ["http://h/x"]
    # namespace PREFIX form
    pfx = (
        b'<sm:urlset xmlns:sm="http://www.sitemaps.org/schemas/sitemap/0.9">'
        b"<sm:url><sm:loc>http://h/y</sm:loc><sm:priority>0.5</sm:priority>"
        b"</sm:url></sm:urlset>"
    )
    got = list(parse_sitemap(pfx))
    assert got[0]["loc"] == "http://h/y" and got[0]["priority"] == "0.5"
    # gzip transport
    assert [e["loc"] for e in parse_sitemap(gzip.compress(bare))] == ["http://h/x"]
    # extension elements under the root are skipped, not fatal
    ext = (
        b"<urlset><weird/><url><loc>http://h/z</loc>"
        b"<video:thing xmlns:video='v'>ignored</video:thing></url></urlset>"
    )
    assert [e["loc"] for e in parse_sitemap(ext)] == ["http://h/z"]


def test_parse_sitemap_rejects_corruption():
    from vmware_graph_spark.sources.sitemap import parse_sitemap

    with pytest.raises(ValueError):
        list(parse_sitemap(b"this is not xml"))
    with pytest.raises(ValueError):
        list(parse_sitemap(b"<html><body>nope</body></html>"))
    with pytest.raises(ValueError):
        list(parse_sitemap(b"<urlset><url><lastmod>2026-01-01</lastmod></url></urlset>"))


def test_read_sitemaps_fleet_roundtrip(spark, tmp_path):
    from vmware_graph_spark.sources.sitemap import read_sitemaps, write_sitemap_files

    shards = {
        "s1": [{"loc": "http://h/1", "priority": "0.3"}],
        "s2": [{"loc": "http://h/2"}, {"loc": "http://h/3", "lastmod": "2026-05-05"}],
    }
    write_sitemap_files(shards, str(tmp_path / "fleet"), gzip_files=True)
    out = read_sitemaps(spark, str(tmp_path / "fleet" / "*.xml*")).collect()
    urls = {r.loc: (r.kind, r.lastmod, r.priority) for r in out if r.kind == "url"}
    assert urls == {
        "http://h/1": ("url", None, 0.3),
        "http://h/2": ("url", None, None),
        "http://h/3": ("url", "2026-05-05", None),
    }
    # the index file's children surface as kind='sitemap' rows
    idx_rows = [r for r in out if r.kind == "sitemap"]
    assert {r.loc for r in idx_rows} == {
        "http://example.com/s1.xml.gz", "http://example.com/s2.xml.gz"
    }
    # provenance key: (file, entry_idx) unique
    keys = {(r.sitemap_file, r.entry_idx) for r in out}
    assert len(keys) == len(out)


def test_sitemap_seed_ingest_covers_every_document(spark):
    from vmware_graph_spark.queries_ext22 import sitemap_seed_ingest
    from vmware_graph_spark.sources.tables import load_table

    out = sitemap_seed_ingest(spark, SF)
    docs = load_table(spark, SF, "documents")
    assert out.count() == docs.count()
    assert out.filter(F.col("doc_id").isNull()).count() == 0
    assert out.filter(~F.col("changefreq").isin("daily", "weekly", "monthly")).count() == 0


# ---------------------------------------------------------------------------
# recrawl scheduling
# ---------------------------------------------------------------------------

def test_recrawl_priority_change_detection_and_rates(spark):
    from vmware_graph_spark.operators.crawl import recrawl_priority

    rows = [
        # u1: 3 fetches, changes at t2 only -> rate 1/2
        ("u1", "2026-01-01 00:00:00", "a"),
        ("u1", "2026-01-08 00:00:00", "b"),
        ("u1", "2026-01-15 00:00:00", "b"),
        # u2: single fetch -> rate 0, priority 0
        ("u2", "2026-01-01 00:00:00", "x"),
        # u3: every fetch changes -> rate 1
        ("u3", "2026-01-01 00:00:00", "p"),
        ("u3", "2026-01-02 00:00:00", "q"),
        ("u3", "2026-01-03 00:00:00", "r"),
    ]
    h = spark.createDataFrame(rows, "url string, ts string, fp string")
    h = h.select("url", F.to_timestamp("ts").alias("fetch_ts"), "fp")
    out = {
        r.url: (r.n_fetches, r.n_changes, r.change_rate, r.age_days, r.priority)
        for r in recrawl_priority(h, F.lit("2026-01-25")).collect()
    }
    assert out["u1"] == (3, 1, 0.5, 10, 5.0)
    assert out["u2"] == (1, 0, 0.0, 24, 0.0)
    assert out["u3"] == (3, 2, 1.0, 22, 22.0)


def test_recrawl_priority_ignores_row_order(spark):
    """Change detection orders by fetch_ts, not by input order."""
    from vmware_graph_spark.operators.crawl import recrawl_priority

    rows = [
        ("u", "2026-01-15 00:00:00", "b"),
        ("u", "2026-01-01 00:00:00", "a"),
        ("u", "2026-01-08 00:00:00", "b"),
    ]
    h = spark.createDataFrame(rows, "url string, ts string, fp string")
    h = h.select("url", F.to_timestamp("ts").alias("fetch_ts"), "fp")
    r = recrawl_priority(h, F.lit("2026-01-16")).collect()[0]
    assert (r.n_changes, r.change_rate) == (1, 0.5)


# ---------------------------------------------------------------------------
# Luhn / card redaction
# ---------------------------------------------------------------------------

def test_luhn_valid_property_vs_reference(spark):
    """The Catalyst Luhn aggregate must agree with an independent
    Python reference over random digit strings (and their corrected
    check digits, so both verdicts are exercised)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from vmware_graph_spark.functions.text import luhn_valid

    def ref(s: str) -> bool:
        total = 0
        for i, ch in enumerate(reversed(s)):
            d = int(ch)
            if i % 2 == 1:
                d *= 2
                if d > 9:
                    d -= 9
            total += d
        return len(s) >= 2 and total % 10 == 0

    digits = st.text("0123456789", min_size=12, max_size=19)

    @settings(max_examples=30, deadline=None)
    @given(st.lists(digits, min_size=1, max_size=8, unique=True))
    def check(batch):
        # add a corrected-check-digit variant of each so True happens
        fixed = []
        for s in batch:
            for last in range(10):
                if ref(s[:-1] + str(last)):
                    fixed.append(s[:-1] + str(last))
                    break
        all_s = list(dict.fromkeys(batch + fixed))
        df = spark.createDataFrame([(s,) for s in all_s], "d string")
        got = {r.d: r.v for r in df.select("d", luhn_valid("d").alias("v")).collect()}
        for s in all_s:
            assert got[s] == ref(s), (s, got[s], ref(s))

    check()
    # short-input guard: a lone digit has nothing to checksum ('0'
    # passed the pre-guard arithmetic vacuously — round-10 advice)
    df = spark.createDataFrame([("",), ("0",), ("00",), ("18",)], "d string")
    got = {r.d: r.v for r in df.select("d", luhn_valid("d").alias("v")).collect()}
    assert got == {"": False, "0": False, "00": True, "18": True}


def test_redact_cc_only_luhn_valid_spans(spark):
    from vmware_graph_spark.functions.text import redact_cc_numbers

    cases = [
        # valid 16-digit redacts; same-shape invalid survives
        ("pay 4111111111111111 now", "pay [CC] now"),
        ("pay 4111111111111112 now", "pay 4111111111111112 now"),
        # spaced and dashed spellings redact as one span
        ("card 5500 0000 0000 0004.", "card [CC]."),
        ("card 3400-0000-0000-009!", "card [CC]!"),
        # short digit runs are never candidates
        ("order 123456789012 ok", "order 123456789012 ok"),
        # two valid cards in one text both redact
        ("a 4111111111111111 b 6011000000000004 c", "a [CC] b [CC] c"),
        ("no digits at all", "no digits at all"),
    ]
    df = spark.createDataFrame(cases, "t string, want string")
    out = df.select(redact_cc_numbers("t").alias("r"), "want").collect()
    bad = [(r.r, r.want) for r in out if r.r != r.want]
    assert not bad, bad


# ---------------------------------------------------------------------------
# script profiling
# ---------------------------------------------------------------------------

def test_script_count_ranges_and_duckdb_twin(spark):
    """Counts match a character-level Python reference AND the DuckDB
    twin on mixed-script samples (kana counts as cjk, Latin-1 letters
    as latin, punctuation/digits as nothing)."""
    import duckdb

    from vmware_graph_spark.functions.text import (
        SCRIPT_RANGES,
        script_count,
        script_count_sql,
    )

    samples = [
        "hello world",                 # 10 latin
        "привет мир",                  # 9 cyrillic
        "日本語のテキスト",              # 8 cjk (ideographs + kana)
        "한국어 텍스트",                 # 6 hangul
        "mixed: café, Ψυχή, 中文!",    # latin incl é; greek; cjk
        "1234 !?",                     # nothing
        "",
    ]
    ref_ranges = {
        "latin": [(0x41, 0x5A), (0x61, 0x7A), (0xC0, 0x24F)],
        "cyrillic": [(0x400, 0x4FF)],
        "greek": [(0x370, 0x3FF)],
        "cjk": [(0x4E00, 0x9FFF), (0x3040, 0x30FF)],
        "hangul": [(0xAC00, 0xD7AF), (0x1100, 0x11FF)],
    }

    def ref(s, script):
        return sum(
            1 for ch in s
            if any(lo <= ord(ch) <= hi for lo, hi in ref_ranges[script])
        )

    df = spark.createDataFrame([(s,) for s in samples], "t string")
    con = duckdb.connect()
    for script in ref_ranges:
        got = [r.n for r in df.select(script_count("t", script).alias("n")).collect()]
        want = [ref(s, script) for s in samples]
        assert got == want, (script, got, want)
        sql = script_count_sql("t", script)
        twin = [con.execute(f"select {sql} from (select ? as t)", [s]).fetchone()[0]
                for s in samples]
        assert twin == want, (script, twin, want)
    assert set(ref_ranges) <= set(SCRIPT_RANGES)


# ---------------------------------------------------------------------------
# WET sink
# ---------------------------------------------------------------------------

def test_wet_roundtrip_and_executor_sink(spark, tmp_path):
    """make_wet_bytes frames conversion records parse_warc reads back
    byte-exact; write_wet lands one file per non-empty partition from
    the executors and the fleet reader recovers every row."""
    from vmware_graph_spark.sources.warc import (
        make_wet_bytes,
        parse_warc,
        read_warc,
        write_wet,
    )

    recs = [
        {"uri": "http://h/1", "text": "plain text"},
        {"uri": "http://h/2", "text": "framing hazards: \r\n\r\n WARC/1.0"},
        {"uri": "http://h/3", "text": ""},  # empty extraction survives
    ]
    back = list(parse_warc(make_wet_bytes(recs)))
    assert [(r["warc_type"], r["uri"], r["body"].decode()) for r in back] == [
        ("conversion", "http://h/1", "plain text"),
        ("conversion", "http://h/2", "framing hazards: \r\n\r\n WARC/1.0"),
        ("conversion", "http://h/3", ""),
    ]

    df = spark.createDataFrame(
        [(r["uri"], r["text"]) for r in recs], "uri string, text string"
    ).repartition(2)
    out_dir = str(tmp_path / "wet")
    n = write_wet(df, out_dir, gzip_members=True)
    assert n == 3
    got = {(r.uri, bytes(r.body).decode())
           for r in read_warc(spark, f"{out_dir}/*.warc.wet.gz",
                              types=("conversion",)).collect()}
    assert got == {(r["uri"], r["text"]) for r in recs}


# ---------------------------------------------------------------------------
# budget apportionment
# ---------------------------------------------------------------------------

def test_apportion_budget_exact_and_largest_remainder(spark):
    from vmware_graph_spark.operators.crawl import apportion_budget

    w = spark.createDataFrame(
        [("a", 5), ("b", 3), ("c", 3)], "host string, weight long"
    )
    # total 10, W=11: base = floor(50/11, 30/11, 30/11) = 4,2,2 -> R=2
    # remainders: a: 50%11=6; b,c: 30%11=8 -> b and c get the extras
    out = {r.host: r.alloc for r in apportion_budget(w, 10).collect()}
    assert out == {"a": 4, "b": 3, "c": 3}
    assert sum(out.values()) == 10

    # tie on remainder resolves by key; conservation holds regardless
    w2 = spark.createDataFrame(
        [(f"h{i}", 1) for i in range(7)], "host string, weight long"
    )
    out2 = {r.host: r.alloc for r in apportion_budget(w2, 10).collect()}
    assert sum(out2.values()) == 10
    # 10*1 div 7 = 1 each, R=3 extras to the 3 smallest keys (equal rems)
    assert out2 == {"h0": 2, "h1": 2, "h2": 2, "h3": 1, "h4": 1, "h5": 1, "h6": 1}


def test_budget_allocation_conserves(spark):
    from vmware_graph_spark.queries_ext22 import crawl_budget_allocation

    out = crawl_budget_allocation(spark, SF).collect()
    assert sum(r.alloc for r in out) == 1000
    assert all(r.alloc >= 0 for r in out)


# ---------------------------------------------------------------------------
# anchor text
# ---------------------------------------------------------------------------

def test_extract_links_pairs_and_hostile_markup(spark):
    from vmware_graph_spark.functions.url import extract_links

    html = (
        '<a href="/a">plain</a>'
        '<a href="/b"><b>bold</b>\n\t inner</a>'
        '<a class="k" href=/c>unquoted</a>'
        '<a href="/d" data-x="href=evil">safe</a>'
        '<a href="/e">first</a><a href="/f">second</a>'
        '<a href="/g">never closed...'
    )
    df = spark.createDataFrame([(html,)], "h string")
    out = [
        (r.l.href, r.l.text)
        for r in df.select(F.explode(extract_links("h")).alias("l")).collect()
    ]
    assert out == [
        ("/a", "plain"),
        ("/b", "bold inner"),     # inner tags stripped, whitespace collapsed
        ("/c", "unquoted"),
        ("/d", "safe"),           # attr-value 'href=' cannot hijack
        ("/e", "first"),          # lazy body: anchors don't merge
        ("/f", "second"),
        # '/g' never closes -> no pair, like a browser dropping the tail
    ]


def test_anchor_text_profile_invariants(spark):
    from vmware_graph_spark.queries_ext22 import anchor_text_profile
    from vmware_graph_spark.sources.tables import load_table

    out = anchor_text_profile(spark, SF)
    n_docs = load_table(spark, SF, "documents").count()
    rows = out.collect()
    assert len(rows) == n_docs
    assert all(r.n_links == 2 and r.texts.endswith("|read more") for r in rows)


# ---------------------------------------------------------------------------
# redirect chains
# ---------------------------------------------------------------------------

def test_resolve_redirects_chains_cycles_and_caps(spark):
    from vmware_graph_spark.operators.crawl import resolve_redirects

    edges = [("a", "b"), ("b", "c"), ("c", "T")]        # 3-hop chain
    edges += [("x", "y"), ("y", "x")]                     # 2-cycle
    edges += [("s", "s")]                                 # self-redirect
    edges += [("q", "T")]                                 # single hop
    edges += [(f"n{i}", f"n{i+1}") for i in range(40)]    # 40 hops > max 32
    df = spark.createDataFrame(edges, "src string, dst string")
    out = {r.src: (r.final_url, r.hops, r.status)
           for r in resolve_redirects(df, max_hops=32).collect()}
    assert out["a"] == ("T", 3, "ok")
    assert out["b"] == ("T", 2, "ok")
    assert out["q"] == ("T", 1, "ok")
    assert out["x"] == (None, None, "unresolved")
    assert out["y"] == (None, None, "unresolved")
    assert out["s"] == (None, None, "unresolved")
    assert out["n0"] == (None, None, "unresolved")  # beyond the hop cap
    assert out["n20"] == ("n40", 20, "ok")          # tail fits inside it
    assert len(out) == len(edges)                   # one row per source


def test_resolve_redirects_exact_cap_boundary(spark):
    """A chain of exactly max_hops resolves; max_hops+1 does not."""
    from vmware_graph_spark.operators.crawl import resolve_redirects

    edges = [(f"a{i}", f"a{i+1}") for i in range(8)]  # a0 -> a8: 8 hops
    df = spark.createDataFrame(edges, "src string, dst string")
    ok = {r.src: r.hops for r in resolve_redirects(df, max_hops=8).collect()
          if r.status == "ok"}
    assert ok["a0"] == 8
    out4 = {r.src: r.status for r in resolve_redirects(df, max_hops=4).collect()}
    assert out4["a0"] == "unresolved" and out4["a4"] == "ok"


# ---------------------------------------------------------------------------
# URL-parameter mining
# ---------------------------------------------------------------------------

def test_mine_content_params_convicts_and_acquits(spark):
    from vmware_graph_spark.operators.crawl import mine_content_params

    rows = []
    for i in range(4):
        for s in range(3):
            rows.append((f"http://h/p?id={i}&sess={s}", f"fp{i}"))
    pages = spark.createDataFrame(rows, "url string, fp string")
    out = {r.param_key: (r.n_multi_groups, r.n_divergent_groups, r.content_bearing)
           for r in mine_content_params(pages).collect()}
    # sess groups: fixed id, 3 sess values, same fp -> multi, never divergent
    assert out["sess"] == (4, 0, 0)
    # id groups: fixed sess, 4 id values, 4 fps -> divergent
    assert out["id"] == (3, 3, 1)


def test_mine_content_params_edge_cases(spark):
    from vmware_graph_spark.operators.crawl import mine_content_params

    pages = spark.createDataFrame(
        [
            ("http://h/only?solo=1", "f1"),      # singleton group -> (0,0,0)
            ("http://h/noquery", "f2"),          # no params -> no rows
            ("http://h/p?a=1&a=2&b=1", "f3"),    # duplicate key: one 'a' row
            ("http://h/p?a=9&b=1", "f4"),        # differs from f3 only in a
        ],
        "url string, fp string",
    )
    out = {r.param_key: (r.n_multi_groups, r.n_divergent_groups, r.content_bearing)
           for r in mine_content_params(pages).collect()}
    assert out["solo"] == (0, 0, 0)
    assert "noquery" not in out
    # removing ALL 'a' params makes the two /p URLs one group ('?b=1'),
    # with different fps -> convicted
    assert out["a"] == (1, 1, 1)
    assert out["b"] == (0, 0, 0)  # bases differ once b removed -> singletons


def test_url_param_mining_query_is_pure_catalyst(spark):
    from vmware_graph_spark.queries_ext22 import url_param_mining

    df = url_param_mining(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# within-doc repetition (queries_ext23)
# ---------------------------------------------------------------------------

def test_doc_repetition_stats_known_docs(spark):
    """Hand-checked repetition arithmetic on constructed docs."""
    from vmware_graph_spark.queries_ext23 import doc_repetition_stats  # noqa: F401
    from vmware_graph_spark.functions.text import tokens, word_shingles

    df = spark.createDataFrame(
        [
            (1, "a b c d"),            # no repeats
            (2, "a a a b"),            # 'a' x3 -> rep 3/4; bigram 'a a' x2
            (3, "x y x y x"),          # x3+y2 all repeated; 'x y' x2
        ],
        "doc_id long, text string",
    )
    t = df.select("doc_id", F.explode(tokens("text")).alias("tok"))
    c = t.groupBy("doc_id", "tok").agg(F.count("*").alias("n"))
    rep = {r.doc_id: r.rep for r in
           c.groupBy("doc_id").agg(
               F.coalesce(F.sum(F.when(F.col("n") > 1, F.col("n"))), F.lit(0))
               .alias("rep")).collect()}
    assert rep == {1: 0, 2: 3, 3: 5}
    bg = (df.select("doc_id", F.explode(word_shingles("text", 2)).alias("b"))
          .groupBy("doc_id", "b").agg(F.count("*").alias("n"))
          .groupBy("doc_id").agg(F.max("n").alias("m")))
    assert {r.doc_id: r.m for r in bg.collect()} == {1: 1, 2: 2, 3: 2}


def test_sitemap_escaping_and_lenient_priority(spark, tmp_path):
    """Locs with &/<> roundtrip through entity escaping (the spec
    REQUIRES escaping — real locs carry '&' constantly); a garbage
    priority value degrades to NULL instead of killing the file."""
    from vmware_graph_spark.sources.sitemap import (
        make_sitemap_xml,
        parse_sitemap,
        read_sitemaps,
        write_sitemap_files,
    )

    hostile = "http://h/p?a=1&b=2&x=<y>"
    back = list(parse_sitemap(make_sitemap_xml([{"loc": hostile}])))
    assert back[0]["loc"] == hostile

    xml = make_sitemap_xml(
        [{"loc": "http://h/ok", "priority": "not-a-number"}]
    )
    got = list(parse_sitemap(xml))
    assert got[0]["priority"] == "not-a-number"  # parser is raw strings
    write_sitemap_files(
        {"s": [{"loc": hostile, "priority": "junk"},
               {"loc": "http://h/2", "priority": "0.7"}]},
        str(tmp_path / "f"), index_name=None,
    )
    rows = {r.loc: r.priority
            for r in read_sitemaps(spark, str(tmp_path / "f" / "*.xml")).collect()}
    assert rows == {hostile: None, "http://h/2": 0.7}


def test_robots_txt_bom_and_redirect_duplicate_edges(spark):
    """A BOM-prefixed robots.txt must not lose its first group;
    duplicate redirect observations must not explode the doubling."""
    from vmware_graph_spark.operators.crawl import (
        parse_robots_txt,
        resolve_redirects,
    )

    txt = "﻿User-agent: bot\nDisallow: /x\n"
    assert parse_robots_txt(txt, "bot") == [("/x", False)]

    edges = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("a", "c"), ("b", "T")],
        "src string, dst string",
    )
    out = {r.src: (r.final_url, r.hops, r.status)
           for r in resolve_redirects(edges).collect()}
    # conflicts collapse to min(dst): a -> b -> T
    assert out == {"a": ("T", 2, "ok"), "b": ("T", 1, "ok")}


def test_write_wet_percent_encodes_control_chars(spark, tmp_path):
    from vmware_graph_spark.sources.warc import read_warc, write_wet

    df = spark.createDataFrame(
        [
            ("http://h/inject\r\nWARC-Evil: x", "body text"),
            # a dirty URI carrying a literal '%' must escape it too
            # (%25 before the control escape) so decoding is
            # unambiguous; a CLEAN %-URI passes through verbatim.
            ("http://h/a%20b\rc", "second"),
            ("http://h/clean%0Dspelling", "third"),
        ],
        "uri string, text string",
    )
    out_dir = str(tmp_path / "wet")
    assert write_wet(df, out_dir) == 3
    rows = read_warc(spark, f"{out_dir}/*.warc.wet",
                     types=("conversion",)).collect()
    uris = {bytes(r.body).decode(): r.uri for r in rows}
    assert uris["body text"] == "http://h/inject%0D%0AWARC-Evil: x"
    assert uris["second"] == "http://h/a%2520b%0Dc"
    assert uris["third"] == "http://h/clean%0Dspelling"


# ---------------------------------------------------------------------------
# round-10 review fixes
# ---------------------------------------------------------------------------

def test_href_hijack_space_inside_quoted_value(spark):
    """A quoted attribute value containing ' href=' must not hijack
    the capture (the prefix consumes quoted values atomically)."""
    from vmware_graph_spark.functions.url import extract_hrefs, extract_links

    df = spark.createDataFrame(
        [
            ('<a data-x="see href=evil" href="/real">t</a>',),
            ("<a data-x='see href=evil2' href=/real2>t</a>",),
        ],
        "html string",
    )
    got = [r.hs for r in df.select(extract_hrefs("html").alias("hs")).collect()]
    assert got == [["/real"], ["/real2"]]
    pairs = [
        [(p.href, p.text) for p in r.ls]
        for r in df.select(extract_links("html").alias("ls")).collect()
    ]
    assert pairs == [[("/real", "t")], [("/real2", "t")]]


def test_robots_unknown_fields_do_not_break_groups():
    """RFC 9309 §2.2.4: Crawl-delay/Sitemap/unknown records are
    transparent to grouping — agents around them merge."""
    from vmware_graph_spark.operators.crawl import parse_robots_txt

    txt = (
        "User-agent: examplebot\n"
        "Crawl-delay: 10\n"
        "User-agent: otherbot\n"
        "Disallow: /private\n"
    )
    # both agents share the ONE group; examplebot must see the rule
    assert parse_robots_txt(txt, "examplebot") == [("/private", False)]
    assert parse_robots_txt(txt, "otherbot") == [("/private", False)]
    # after a rule, an unknown field still doesn't merge the NEXT group
    txt2 = (
        "User-agent: a\nDisallow: /x\nCrawl-delay: 5\n\n"
        "User-agent: b\nDisallow: /y\n"
    )
    assert parse_robots_txt(txt2, "a") == [("/x", False)]
    assert parse_robots_txt(txt2, "b") == [("/y", False)]


def test_redact_cc_substring_of_longer_run_survives(spark):
    """A valid PAN recurring INSIDE a longer non-candidate digit run
    must not be replaced there (boundary-guarded, not literal)."""
    from vmware_graph_spark.functions.text import redact_cc_numbers

    t = "order 94111111111111111180 pay 4111111111111111 done"
    df = spark.createDataFrame([(t,)], "t string")
    got = df.select(redact_cc_numbers("t").alias("r")).collect()[0].r
    assert got == "order 94111111111111111180 pay [CC] done"


def test_resolve_redirects_cap_is_contract_not_reach(spark):
    """max_hops not a power of two: a chain longer than the cap is
    'unresolved' even though the doubling reach covers it."""
    from vmware_graph_spark.operators.crawl import resolve_redirects

    edges = [(f"a{i}", f"a{i+1}") for i in range(25)]  # a0: 25 hops
    df = spark.createDataFrame(edges, "src string, dst string")
    out = {r.src: (r.hops, r.status)
           for r in resolve_redirects(df, max_hops=20).collect()}
    assert out["a0"] == (None, "unresolved")   # 25 > 20 despite reach 32
    assert out["a5"] == (20, "ok")             # exactly the cap resolves
    assert out["a6"] == (19, "ok")


def test_sitemap_priority_nan_inf_degrade_to_null(spark, tmp_path):
    from vmware_graph_spark.sources.sitemap import read_sitemaps, write_sitemap_files

    write_sitemap_files(
        {"s": [{"loc": "http://h/1", "priority": "NaN"},
               {"loc": "http://h/2", "priority": "1e999"},
               {"loc": "http://h/3", "priority": "-inf"},
               {"loc": "http://h/4", "priority": "0.4"}]},
        str(tmp_path / "f"), index_name=None,
    )
    rows = {r.loc: r.priority
            for r in read_sitemaps(spark, str(tmp_path / "f" / "*.xml")).collect()}
    assert rows == {"http://h/1": None, "http://h/2": None,
                    "http://h/3": None, "http://h/4": 0.4}


def test_apportion_budget_zero_total_degenerate(spark):
    from vmware_graph_spark.operators.crawl import apportion_budget

    w = spark.createDataFrame([("a", 0), ("b", 0)], "host string, weight long")
    out = {r.host: r.alloc for r in apportion_budget(w, 1).collect()}
    # documented degenerate: no proportional base; key order gets slots
    assert out == {"a": 1, "b": 0}


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def test_decode_image_auto_bmp_variant_falls_back_or_raises():
    """A BMP past the stdlib subset (8-bit) falls to Pillow when
    present; without Pillow the stdlib strictness stands."""
    import struct

    import pytest as _pytest

    from vmware_graph_spark.operators.multimodal import decode_image_auto

    # minimal 8-bit BMP header (bpp=8 -> stdlib ValueError)
    dib = struct.pack("<IiiHHIIiiII", 40, 1, 1, 1, 8, 0, 4, 2835, 2835, 0, 0)
    b = b"BM" + struct.pack("<IHHI", 14 + 40 + 4, 0, 0, 14 + 40) + dib + b"\x00" * 4
    if _pil_available():
        d = decode_image_auto(b, "image/bmp")  # Pillow handles palettized
        assert (d.width, d.height) == (1, 1)
    else:
        with _pytest.raises(ValueError):
            decode_image_auto(b, "image/bmp")


def test_redact_cc_separator_joined_run_survives(spark):
    """A valid PAN separator-joined to more digits (an 18-digit
    '<card>-22' order id) must stay untouched — and so must the PAN
    occurrence inside it, even when the bare PAN is also present."""
    from vmware_graph_spark.functions.text import redact_cc_numbers

    t = "ref 4111111111111111-22 pay 4111111111111111 done"
    df = spark.createDataFrame([(t,)], "t string")
    got = df.select(redact_cc_numbers("t").alias("r")).collect()[0].r
    assert got == "ref 4111111111111111-22 pay [CC] done"


def test_redact_cc_token_with_replacement_specials(spark):
    from vmware_graph_spark.functions.text import redact_cc_numbers

    df = spark.createDataFrame([("pay 4111111111111111 now",)], "t string")
    got = df.select(
        redact_cc_numbers("t", token=r"US$1-\REDACTED").alias("r")
    ).collect()[0].r
    assert got == r"pay US$1-\REDACTED now"


def test_anchor_text_not_polluted_by_gt_in_attr(spark):
    """A '>' inside a later quoted attribute must not terminate the
    tag early and pollute the captured anchor text."""
    from vmware_graph_spark.functions.url import extract_links

    df = spark.createDataFrame(
        [
            ('<a href="/x" title="a>b">text</a>',),
            ('<a href="/x" data-y="> evil href=/bad">real</a>',),
        ],
        "html string",
    )
    pairs = [
        [(p.href, p.text) for p in r.ls]
        for r in df.select(extract_links("html").alias("ls")).collect()
    ]
    assert pairs == [[("/x", "text")], [("/x", "real")]]


def test_href_fail_closed_on_unbalanced_quotes(spark):
    """Documented contract: tags with unbalanced/misplaced quotes
    (invalid HTML5 attribute syntax) yield NO link — fail-closed, never
    a hijacked URL."""
    from vmware_graph_spark.functions.url import extract_hrefs

    df = spark.createDataFrame(
        [
            ("<a data-name=O'Brien href=/x>t</a>",),
            ('<a data-x="unclosed href=/z>t</a>',),
        ],
        "html string",
    )
    got = [r.hs for r in df.select(extract_hrefs("html").alias("hs")).collect()]
    assert got == [[], []]


def test_extract_links_property_vs_html_parser(spark):
    """On generated VALID HTML (balanced quotes — the documented
    fail-closed boundary), extract_links must agree with Python's real
    html.parser on every (href, text) pair: attribute order, quote
    style, hostile values containing 'href=', nested inline markup,
    and messy whitespace all covered."""
    from html.parser import HTMLParser

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from vmware_graph_spark.functions.url import extract_links

    class Ref(HTMLParser):
        def __init__(self):
            super().__init__()
            self.links, self._href, self._buf = [], None, []

        def handle_starttag(self, tag, attrs):
            if tag == "a":
                self._href = dict(attrs).get("href")
                self._buf = []

        def handle_data(self, data):
            if self._href is not None:
                self._buf.append(data)

        def handle_endtag(self, tag):
            if tag == "a" and self._href is not None:
                self.links.append(
                    (self._href, " ".join("".join(self._buf).split()))
                )
                self._href = None

    # href values are URL-LEGAL (no raw whitespace — RFC 3986 forbids
    # it, and the extractor's value grammar stops at whitespace); a
    # space-containing quoted href is outside the contract and covered
    # by its own case test below.
    href_val = st.sampled_from(
        ["/a", "/p?x=1&y=2", "http://h/q", "/odd=href=trick", "/b#f"]
    )
    extra_attr = st.sampled_from(
        ["", ' class="k"', " data-x='see href=evil'", ' title="a b"',
         ' rel="nofollow" target="_blank"']
    )
    text = st.sampled_from(
        ["plain", "two  words", "<b>bold</b> tail", "x\n\ty", ""]
    )
    quote = st.sampled_from(['"', "'"])

    def mk_anchor(h, extra, t, q):
        return f"<a{extra} href={q}{h}{q}>{t}</a>"

    anchor = st.builds(mk_anchor, href_val, extra_attr, text, quote)

    @settings(max_examples=60, deadline=None)
    @given(st.lists(anchor, min_size=1, max_size=5))
    def check(anchors):
        page = "<html><body>" + " mid ".join(anchors) + "</body></html>"
        ref = Ref()
        ref.feed(page)
        # the regex extractor skips href-less anchors by design;
        # html.parser reports them with href=None — filter those
        want = [(h, t) for h, t in ref.links if h is not None]
        df = spark.createDataFrame([(page,)], "h string")
        got = [
            (p.href, p.text)
            for r in df.select(extract_links("h").alias("ls")).collect()
            for p in r.ls
        ]
        # html.parser unescapes entities in attribute values; our
        # generated hrefs contain none, so direct comparison holds
        assert got == want, (page, got, want)

    check()


def test_extract_links_space_in_quoted_href_drops_anchor(spark):
    """A quoted href containing a raw space is not a legal URL (RFC
    3986); the pair extractor drops the anchor rather than emitting a
    truncated URL."""
    from vmware_graph_spark.functions.url import extract_links

    df = spark.createDataFrame(
        [('<a href="/with space">t</a> <a href="/ok">u</a>',)], "html string"
    )
    got = [
        (p.href, p.text)
        for r in df.select(extract_links("html").alias("ls")).collect()
        for p in r.ls
    ]
    assert got == [("/ok", "u")]
