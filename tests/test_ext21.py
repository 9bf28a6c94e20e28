"""Unit + property tests for the web-crawl prep family: WARC
writer/parser/fleet reader, HTML→text extraction, URL canonicalization,
and the composed registry queries."""

from __future__ import annotations

import contextlib
import io
import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# WARC container
# ---------------------------------------------------------------------------

def test_warc_roundtrip_framing_survives_hostile_bodies():
    """Content-Length framing, not marker scanning: bodies containing
    CRLFs, the record separator, and a literal 'WARC/1.0' line must
    come back byte-exact."""
    from vmware_graph_spark.sources.warc import make_warc_bytes, parse_warc

    bodies = [
        b"plain",
        b"",  # empty body
        b"line1\r\nline2\r\n\r\nline3",  # embedded header terminator
        b"WARC/1.0\r\nWARC-Type: response\r\n\r\nfake nested record",
        bytes(range(256)),  # non-UTF8 binary payload
    ]
    recs = [
        {"uri": f"http://h/{i}", "body": b, "status": 200 + i}
        for i, b in enumerate(bodies)
    ]
    data = make_warc_bytes(recs, warcinfo="test")
    out = list(parse_warc(data))
    assert [r["warc_type"] for r in out] == ["warcinfo"] + ["response"] * len(bodies)
    for i, r in enumerate(out[1:]):
        assert r["uri"] == f"http://h/{i}"
        assert r["http_status"] == 200 + i
        assert r["body"] == bodies[i]


def test_warc_parser_raises_on_corruption():
    from vmware_graph_spark.sources.warc import make_warc_bytes, parse_warc

    good = make_warc_bytes([{"uri": "http://h/1", "body": b"xyz"}])
    with pytest.raises(ValueError):
        list(parse_warc(b"GARBAGE" + good))
    with pytest.raises(ValueError):
        list(parse_warc(good[:-8]))  # truncated final block+separator
    # Missing Content-Length
    with pytest.raises(ValueError):
        list(parse_warc(b"WARC/1.0\r\nWARC-Type: response\r\n\r\nbody"))


def test_warc_roundtrip_property():
    """Random binary bodies (hypothesis) roundtrip byte-exact."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from vmware_graph_spark.sources.warc import make_warc_bytes, parse_warc

    @settings(max_examples=50, deadline=None)
    @given(st.lists(st.binary(max_size=300), min_size=1, max_size=5))
    def check(bodies):
        recs = [{"uri": f"http://h/{i}", "body": b} for i, b in enumerate(bodies)]
        out = list(parse_warc(make_warc_bytes(recs)))
        assert [r["body"] for r in out] == bodies

    check()


def test_read_warc_distributed_provenance(spark, tmp_path):
    """Fleet read: records across files, with per-file provenance and
    parse-order record_idx; warcinfo records filtered at the parser."""
    from vmware_graph_spark.sources.warc import write_warc_files

    shards = {
        "a": [
            {"uri": "http://h/1", "body": b"<p>one</p>"},
            {"uri": "http://h/2", "body": b"<p>two</p>", "status": 404},
        ],
        "b": [{"uri": "http://h/3", "body": b"<p>three</p>"}],
    }
    write_warc_files(shards, str(tmp_path))
    from vmware_graph_spark.sources.warc import read_warc

    out = read_warc(spark, str(tmp_path / "*.warc")).collect()
    assert len(out) == 3
    by_uri = {r.uri: r for r in out}
    assert by_uri["http://h/2"].http_status == 404
    assert bytes(by_uri["http://h/3"].body) == b"<p>three</p>"
    assert by_uri["http://h/1"].warc_file.endswith("a.warc")
    # warcinfo occupies record_idx 0 in each file; responses start at 1.
    assert by_uri["http://h/1"].record_idx == 1
    assert by_uri["http://h/3"].record_idx == 1


# ---------------------------------------------------------------------------
# HTML → text
# ---------------------------------------------------------------------------

def _extract_one(spark, html: str) -> str:
    from vmware_graph_spark.functions.text import html_to_text

    df = spark.createDataFrame([(html,)], "h string")
    return df.select(html_to_text("h").alias("t")).collect()[0].t


def test_html_to_text_rules(spark):
    cases = {
        # script content (incl. tags + bare '<') must not leak
        '<script a="b">var x = "<div>" && 1 < 2;</script>after': "after",
        "<style>p { color: red; }</style>body": "body",
        # comments may contain tags
        "<!-- <b>hidden</b> -->shown": "shown",
        # entity decode, &amp; last (single-decode semantics)
        "<p>a &amp;lt; b &quot;q&quot; &#39;s&#39; x&nbsp;y</p>": "a &lt; b \"q\" 's' x y",
        # whitespace collapse + trim
        "  <p>a</p>\n\n<p>b</p>\t": "a b",
        # no-markup passthrough
        "plain text": "plain text",
        # unclosed script swallows to end (documented greedy-safe behavior:
        # non-greedy needs a closer; without one the block rule doesn't
        # fire and the tag-strip leaves the script TEXT — spec'd below)
    }
    for html, want in cases.items():
        assert _extract_one(spark, html) == want, html


def test_html_to_text_matches_duckdb_twin(spark):
    """Cross-engine parity of the full chain on hostile pages."""
    import duckdb

    from vmware_graph_spark.functions.text import html_to_text_sql

    pages = [
        "<html><body><h1>T</h1><p>a  b</p></body></html>",
        '<script>s</script><style>c</style><!-- x --><p>&amp;&lt;&gt;</p>',
        "no tags at all",
        "<p>tail&nbsp;42</p>",
        "<SCRIPT>upper</SCRIPT>kept",  # (?i) on the block rules
    ]
    con = duckdb.connect()
    sql = html_to_text_sql("?")
    df = spark.createDataFrame([(p,) for p in pages], "h string")
    from vmware_graph_spark.functions.text import html_to_text

    got = [r.t for r in df.select(html_to_text("h").alias("t")).collect()]
    want = [con.execute(f"select {sql}", [p]).fetchone()[0] for p in pages]
    assert got == want


def test_html_numeric_character_refs_decode(spark):
    """Every table'd codepoint decodes from ALL its spellings (named,
    decimal, hex upper/lower, leading zeros) to exactly what Python's
    html.unescape produces; out-of-table refs pass through verbatim;
    '&'-producing refs keep single-decode semantics."""
    import html as _html

    from vmware_graph_spark.functions.text import _DECODED_ENTITIES, html_to_text

    spellings = []
    for cp, named, rep in _DECODED_ENTITIES + ((38, ("amp",), "&"),):
        forms = [f"&#{cp};", f"&#0{cp};", f"&#x{cp:x};", f"&#X{cp:X};"]
        forms += [f"&{n};" for n in named]
        for s in forms:
            # &nbsp;/&#160; normalize to plain space in the extractor
            want = " " if cp == 160 else rep
            assert _html.unescape(s) == (chr(cp) if cp != 160 else "\xa0")
            spellings.append((f"a{s}b", f"a{want}b".strip()))
    spellings += [
        ("x&#12345;y", "x&#12345;y"),          # outside the table: verbatim
        ("&amp;#39;", "&#39;"),                 # single decode, not "'"
        ("&#38;amp;", "&amp;"),                 # numeric & also single-decodes
        ("it&#8217;s fine", "it’s fine"),
    ]
    df = spark.createDataFrame(spellings, "h string, want string")
    rows = df.select(html_to_text("h").alias("t"), "want").collect()
    bad = [(r.t, r.want) for r in rows if r.t != r.want]
    assert not bad, bad


# ---------------------------------------------------------------------------
# URL canonicalization
# ---------------------------------------------------------------------------

def _canon_one(spark, url: str) -> str:
    from vmware_graph_spark.functions.url import url_canonical

    df = spark.createDataFrame([(url,)], "u string")
    return df.select(url_canonical("u").alias("c")).collect()[0].c


def test_url_canonical_rules(spark):
    cases = {
        "HTTP://WWW.Ex.COM:80/a?utm_source=x&b=2&a=1#f": "http://www.ex.com/a?a=1&b=2",
        # a '?' INSIDE the dropped fragment must not resurrect as a query
        "http://ex.com/a#sec?x=1": "http://ex.com/a",
        # '?' is legal INSIDE a query: anchor to the FIRST '?', so these
        # two spellings stay distinct instead of colliding on 'x=2'
        "http://ex.com/p?a=1?x=2": "http://ex.com/p?a=1?x=2",
        "http://ex.com/p?a=9?x=2": "http://ex.com/p?a=9?x=2",
        "https://Ex.com:443/": "https://ex.com/",
        "https://user:pw@Ex.com:8443/x": "https://ex.com:8443/x",  # non-default port kept
        "http://ex.com": "http://ex.com/",  # empty path -> '/'
        # 'ref' is content-bearing (e.g. a branch selector) and KEPT;
        # only the unambiguous analytics tags drop
        "http://ex.com/?gclid=1&fbclid=2&ref=3&msclkid=4": "http://ex.com/?ref=3",
        "http://ex.com/p?keep=1&utm_=x": "http://ex.com/p?keep=1",
        "ftp://Ex.com:80/f": "ftp://ex.com:80/f",  # :80 only default for http
    }
    for url, want in cases.items():
        assert _canon_one(spark, url) == want, url


def test_url_canonical_matches_duckdb_twin(spark):
    import duckdb

    from vmware_graph_spark.functions.url import url_canonical, url_canonical_sql

    urls = [
        "HTTP://WWW.Ex.COM:80/a?utm_source=x&b=2&a=1#f",
        "https://user@Host.NET/deep/path?z=1&y=2&x=3",
        "http://ex.com",
        "http://ex.com/?gclid=1",
        "weird-not-a-url",
    ]
    con = duckdb.connect()
    sql = url_canonical_sql("u")
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    got = [r.c for r in df.select(url_canonical("u").alias("c")).collect()]
    want = [
        con.execute(f"select {sql} from (select ? as u)", [u]).fetchone()[0]
        for u in urls
    ]
    assert got == want


# ---------------------------------------------------------------------------
# Registry queries (invariants; oracle hash parity is selfcheck's job)
# ---------------------------------------------------------------------------

def test_warc_fleet_ingest_covers_every_document(spark):
    from vmware_graph_spark.queries_ext21 import warc_fleet_ingest
    from vmware_graph_spark.sources.tables import load_table

    out = warc_fleet_ingest(spark, SF)
    docs = load_table(spark, SF, "documents")
    assert out.count() == docs.count()
    assert out.filter(F.col("doc_id").isNull()).count() == 0
    statuses = {r.http_status for r in out.select("http_status").distinct().collect()}
    assert statuses <= {200, 404} and 200 in statuses


def test_url_canonical_dedup_groups_are_3_and_1(spark):
    from vmware_graph_spark.queries_ext21 import url_canonical_dedup

    out = url_canonical_dedup(spark, SF)
    counts = {r.n_raw_urls for r in out.select("n_raw_urls").distinct().collect()}
    assert counts == {1, 3}


def test_crawl_prep_pipeline_excludes_non_200(spark):
    """Host rollup totals must reconcile with the 200-status page count."""
    from vmware_graph_spark.queries_ext21 import crawl_prep_pipeline
    from vmware_graph_spark.sources.tables import load_table

    out = crawl_prep_pipeline(spark, SF).collect()
    docs = load_table(spark, SF, "documents")
    n_ok = docs.filter(F.col("doc_id") % 53 != 0).count()
    assert sum(r.n_pages for r in out) <= n_ok  # token gate can only shrink
    assert sum(r.n_pages for r in out) > 0
    assert all(r.host.startswith("www.site") for r in out)


def test_html_extract_query_is_pure_catalyst(spark):
    """The HTML build + extraction must stay JVM-side: no Python eval
    node anywhere in the physical plan."""
    from vmware_graph_spark.queries_ext21 import html_extract_text_stats

    df = html_extract_text_stats(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_url_dedup_query_is_pure_catalyst(spark):
    from vmware_graph_spark.queries_ext21 import url_canonical_dedup

    df = url_canonical_dedup(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_streaming_crawl_ingest_equals_batch_twin(spark):
    """The drained streaming rollup must equal crawl_prep_pipeline
    row-for-row (per-page rows are batch-boundary independent), and a
    second invocation must be a cache hit (no second stream run)."""
    import time

    from vmware_graph_spark.queries_ext21 import (
        crawl_prep_pipeline,
        streaming_crawl_ingest,
    )

    batch = {r.host: (r.n_pages, r.total_toks, r.n_langs)
             for r in crawl_prep_pipeline(spark, SF).collect()}
    streamed = {r.host: (r.n_pages, r.total_toks, r.n_langs)
                for r in streaming_crawl_ingest(spark, SF).collect()}
    assert streamed == batch
    ckpt_dir = None
    import os as _os
    from vmware_graph_spark.tmpcache import cache_dir, data_key
    run_dir = cache_dir("crawl_stream", data_key(SF, "documents"))
    ckpt_dir = _os.path.join(run_dir, "ckpt")
    mtime_before = max(
        _os.path.getmtime(_os.path.join(r, f))
        for r, _, fs in _os.walk(ckpt_dir) for f in fs
    )
    again = {r.host: (r.n_pages, r.total_toks, r.n_langs)
             for r in streaming_crawl_ingest(spark, SF).collect()}
    assert again == batch
    # cache hit = no second stream run: the checkpoint was not touched
    mtime_after = max(
        _os.path.getmtime(_os.path.join(r, f))
        for r, _, fs in _os.walk(ckpt_dir) for f in fs
    )
    assert mtime_after == mtime_before


def test_read_warc_stream_parity_with_batch_reader(spark, tmp_path):
    """Same records, same columns, through both readers."""
    from vmware_graph_spark.sources.warc import (
        read_warc,
        read_warc_stream,
        write_warc_files,
    )

    shards = {
        "a": [{"uri": "http://h/1", "body": b"<p>one</p>"}],
        "b": [{"uri": "http://h/2", "body": b"<p>two</p>", "status": 500}],
    }
    write_warc_files(shards, str(tmp_path / "fleet"))
    glob = str(tmp_path / "fleet" / "*.warc")
    batch = read_warc(spark, glob)
    stream = read_warc_stream(spark, glob, max_files_per_trigger=1)
    assert stream.isStreaming and batch.schema == stream.schema
    sink = str(tmp_path / "sink")
    q = (
        stream.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not drain in 300s"
    got = {(r.uri, r.http_status, bytes(r.body)) for r in spark.read.parquet(sink).collect()}
    want = {(r.uri, r.http_status, bytes(r.body)) for r in batch.collect()}
    assert got == want and len(want) == 2


# ---------------------------------------------------------------------------
# robots.txt frontier filter
# ---------------------------------------------------------------------------

def test_robots_filter_longest_match_semantics(spark):
    from vmware_graph_spark.operators.crawl import robots_filter

    urls = spark.createDataFrame(
        [
            ("h1", "/a/x"),      # blocked by /a/
            ("h1", "/a/b/c"),    # allowed by deeper /a/b carve-out
            ("h1", "/other"),    # no matching rule -> allowed
            ("h2", "/a/x"),      # rule-free host -> allowed
            ("h1", ""),          # empty path, no match -> allowed
        ],
        "host string, path string",
    )
    rules = spark.createDataFrame(
        [("h1", "/a/", False), ("h1", "/a/b", True)],
        "host string, path_prefix string, allow boolean",
    )
    got = {(r.host, r.path): r.fetch_allowed for r in robots_filter(urls, rules).collect()}
    assert got == {
        ("h1", "/a/x"): False,
        ("h1", "/a/b/c"): True,
        ("h1", "/other"): True,
        ("h2", "/a/x"): True,
        ("h1", ""): True,
    }


def test_robots_filter_root_disallow_and_carveout(spark):
    """Disallow-everything with one Allow carve-out (the common
    crawl-hostile robots shape)."""
    from vmware_graph_spark.operators.crawl import robots_filter

    urls = spark.createDataFrame(
        [("h", "/public/page"), ("h", "/private/x"), ("h", "/")],
        "host string, path string",
    )
    rules = spark.createDataFrame(
        [("h", "/", False), ("h", "/public/", True)],
        "host string, path_prefix string, allow boolean",
    )
    got = {r.path: r.fetch_allowed for r in robots_filter(urls, rules).collect()}
    assert got == {"/public/page": True, "/private/x": False, "/": False}


def test_robots_filter_wildcards_and_anchor(spark):
    """RFC 9309 '*' and trailing '$': wildcard disallows, anchored
    match (no-match past the anchor), literal metachars, and
    most-octets precedence over a shorter Allow."""
    from vmware_graph_spark.operators.crawl import robots_filter

    urls = spark.createDataFrame(
        [("h", p) for p in
         ["/a/14", "/a/1", "/x.pdf", "/x.pdfz", "/s?sessionid=1",
          "/s?x=1", "/dot.path", "/dotXpath"]],
        "host string, path string",
    )
    rules = spark.createDataFrame(
        [("h", "/a/", False), ("h", "/a/1", True), ("h", "/a/*4$", False),
         ("h", "/*.pdf$", False), ("h", "/*?sessionid=", False),
         ("h", "/dot.path", False)],
        "host string, path_prefix string, allow boolean",
    )
    got = {r.path: r.fetch_allowed for r in robots_filter(urls, rules).collect()}
    assert got == {
        "/a/14": False,        # /a/*4$ (6 octets) out-scores Allow /a/1 (4)
        "/a/1": True,          # carve-out still wins where no wildcard hits
        "/x.pdf": False,       # the classic Disallow: /*.pdf$
        "/x.pdfz": True,       # $ anchors: .pdfz does NOT match
        "/s?sessionid=1": False,
        "/s?x=1": True,
        "/dot.path": False,    # '.' matched literally...
        "/dotXpath": True,     # ...so it must NOT match as regex-any
    }


def test_parse_robots_txt_group_selection():
    """RFC 9309 §2.2.1: exact token, prefix token, group merging,
    '*' fallback, empty-value no-op, comments/unknown fields."""
    from vmware_graph_spark.operators.crawl import parse_robots_txt

    txt = (
        "# comment\n"
        "User-agent: examplebot\n"
        "Disallow: /private/   # trailing comment\n"
        "Allow: /private/ok\n"
        "\n"
        "User-agent: otherbot\n"
        "User-agent: examplebot\n"
        "Disallow: /*.zip$\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /\n"
        "Crawl-delay: 10\n"
        "Sitemap: http://e/s.xml\n"
        "\n"
        "User-agent: greedybot\n"
        "Disallow:\n"
    )
    want = [("/private/", False), ("/private/ok", True), ("/*.zip$", False)]
    assert parse_robots_txt(txt, "ExampleBot") == want          # case-insensitive
    assert parse_robots_txt(txt, "examplebot-news") == want     # prefix token
    assert parse_robots_txt(txt, "unknown") == [("/", False)]   # * fallback
    assert parse_robots_txt(txt, "greedybot") == []             # empty = no-op
    assert parse_robots_txt("", "x") == []
    # most-specific separator-bounded prefix beats a shorter one
    two = (
        "User-agent: examplebot\nDisallow: /short\n\n"
        "User-agent: examplebot-news\nDisallow: /long\n"
    )
    assert parse_robots_txt(two, "examplebot-news-eu") == [("/long", False)]
    # prefix binding requires a separator boundary: a group token that
    # ends mid-word never captures the crawler (round-10 advice)
    mid = "User-agent: e\nDisallow: /e\n\nUser-agent: examp\nDisallow: /m\n"
    assert parse_robots_txt(mid, "examplebot") == []
    assert parse_robots_txt(mid + "User-agent: *\nDisallow: /star\n", "examplebot") == [
        ("/star", False)
    ]


def test_pct_normalize_property_vs_urllib(spark):
    """pct_normalize_query (Spark) and its DuckDB twin must agree with
    an independent re-based partial decoder on generated URL-legal
    query strings, and the result must be urllib-consistent: the
    normalization preserves full-decode identity
    (unquote(norm(s)) == unquote_plus(s)), is idempotent, and leaves
    no unreserved escape behind."""
    import re
    from urllib.parse import unquote, unquote_plus

    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from vmware_graph_spark.functions.url import (
        _UNRESERVED,
        pct_normalize_query,
        pct_normalize_query_sql,
    )

    unres_escapes = [f"%{ord(c):02X}" for c in "AzZ09._~-"] + [
        f"%{ord(c):02x}" for c in "qT5_~"
    ]
    atoms = st.sampled_from(
        ["a", "b", "Z", "7", "=", "&", "+", "-", ".", "~", "%2F", "%3D",
         "%26", "%2B", "%20", "%2f", "%C3"] + unres_escapes
    )
    qstr = st.lists(atoms, max_size=12).map("".join)

    def ref(s: str) -> str:
        s = s.replace("+", "%20")
        return re.sub(
            r"%([0-9A-Fa-f]{2})",
            lambda m: (
                chr(int(m.group(1), 16))
                if chr(int(m.group(1), 16)) in _UNRESERVED
                else m.group(0)
            ),
            s,
        )

    @settings(max_examples=25, deadline=None)
    @given(st.lists(qstr, min_size=1, max_size=10, unique=True))
    def check(batch):
        df = spark.createDataFrame([(s,) for s in batch], "s string")
        got_spark = {
            r.s: r.n
            for r in df.select("s", pct_normalize_query("s").alias("n")).collect()
        }
        con = duckdb.connect()
        sql = pct_normalize_query_sql("s")
        for s in batch:
            want = ref(s)
            assert got_spark[s] == want, (s, got_spark[s], want)
            got_duck = con.execute(
                f"SELECT {sql} FROM (SELECT ? AS s)", [s]
            ).fetchone()[0]
            assert got_duck == want, (s, got_duck, want)
            # urllib anchors (the round-10 directive's ground truth)
            assert unquote(want) == unquote_plus(s)
            assert ref(want) == want                      # idempotent
            assert not re.search(
                r"(?i)%(4[1-9a-f]|5[0-9a]|6[1-9a-f]|7[0-9a]|3[0-9]|2[de]|5f|7e)",
                want,
            )

    check()


def test_url_canonical_and_param_mining_merge_escape_spellings(spark):
    """The identity wins the directive was about: '%69d' == 'id' as a
    param key, 'a+b' == 'a%20b' as a value, and an escape-spelled
    tracking param is recognized and dropped."""
    from vmware_graph_spark.functions.url import url_canonical
    from vmware_graph_spark.operators.crawl import mine_content_params

    df = spark.createDataFrame(
        [
            ("http://h.example.com/p?%69d=7&x=a+b",),
            ("http://h.example.com/p?id=7&x=a%20b",),
            ("http://h.example.com/p?id=7&x=a%20b&utm%5Fsource=z",),
        ],
        "url string",
    )
    canon = [r.c for r in df.select(url_canonical("url").alias("c")).collect()]
    assert canon[0] == canon[1] == canon[2] == (
        "http://h.example.com/p?id=7&x=a%20b"
    )

    pages = spark.createDataFrame(
        [
            ("http://h/p?%69d=1&x=a+b", "fpA"),
            ("http://h/p?id=2&x=a%20b", "fpB"),
        ],
        "url string, fp string",
    )
    got = {r.param_key: r for r in mine_content_params(pages).collect()}
    # the two spellings of key 'id' and value 'a b' must form ONE
    # comparison group for x (divergent fps -> content-bearing id)
    assert set(got) == {"id", "x"}
    assert got["id"].n_multi_groups == 1 and got["id"].content_bearing == 1
    # x's two groups (id=1 vs id=2) stay singletons — no evidence
    assert got["x"].n_multi_groups == 0 and got["x"].content_bearing == 0


def test_parse_robots_crawl_delay():
    """Crawl-delay: consumed from the WINNING group (first valid value
    in document order across merges), invalid/negative/inf ignored,
    grouping transparency preserved."""
    from vmware_graph_spark.operators.crawl import parse_robots_txt_full

    txt = (
        "User-agent: a\nCrawl-delay: 10\nUser-agent: b\nDisallow: /x\n\n"
        "User-agent: b\nCrawl-delay: 2.5\nDisallow: /y\n\n"
        "User-agent: *\nCrawl-delay: 99\nDisallow: /\n"
    )
    # transparency: the delay inside the a/b agent run binds both
    assert parse_robots_txt_full(txt, "a") == ([("/x", False)], 10.0)
    # merge: b's groups merge; first valid delay in doc order wins
    assert parse_robots_txt_full(txt, "b") == (
        [("/x", False), ("/y", False)], 10.0
    )
    assert parse_robots_txt_full(txt, "zzz") == ([("/", False)], 99.0)
    bad = "User-agent: a\nCrawl-delay: soon\nCrawl-delay: -3\nCrawl-delay: inf\n"
    assert parse_robots_txt_full(bad, "a") == ([], None)
    assert parse_robots_txt_full(bad + "Crawl-delay: 0.5\n", "a") == ([], 0.5)
    assert parse_robots_txt_full("", "a") == ([], None)


def test_parse_robots_property_vs_reference_model():
    """parse_robots_txt_full vs an independent reference over generated
    group structures: exact-token wins, separator-bounded longest
    prefix, '*' fallback, group merging, and the Crawl-delay
    first-valid-in-doc-order rule riding the SAME selection."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from vmware_graph_spark.operators.crawl import parse_robots_txt_full

    tok = st.sampled_from(["*", "examplebot", "examplebot-news", "other", "ex"])
    delay = st.sampled_from([None, "1", "2.5", "soon", "-4", "0"])
    grp = st.tuples(
        st.lists(tok, min_size=1, max_size=2),
        st.lists(st.sampled_from(["/a", "/b/", "/c$"]), max_size=2),
        delay,
    )

    def render(groups):
        out = []
        for agents, rules, d in groups:
            for a in agents:
                out.append(f"User-agent: {a}")
            if d is not None:
                out.append(f"Crawl-delay: {d}")
            for p in rules:
                out.append(f"Disallow: {p}")
        return "\n".join(out) + "\n"

    def reference(groups, ua):
        # independent model of the documented semantics
        tokens = {a for agents, _, _ in groups for a in agents}
        if ua in tokens:
            win = ua
        else:
            pref = [
                t for t in tokens
                if t not in ("*", "") and ua.startswith(t)
                and len(t) < len(ua) and not ua[len(t)].isalnum()
            ]
            win = max(pref, key=len) if pref else ("*" if "*" in tokens else None)
        if win is None:
            return [], None
        rules, delays = [], []
        for agents, rs, d in groups:
            if win in agents:
                rules += [(p, False) for p in rs]
                if d is not None:
                    try:
                        v = float(d)
                        if v >= 0 and v != float("inf"):
                            delays.append(v)
                    except ValueError:
                        pass
        return rules, (delays[0] if delays else None)

    @settings(max_examples=200, deadline=None)
    @given(st.lists(grp, min_size=1, max_size=4), st.sampled_from(
        ["examplebot", "examplebot-news", "examplebot-news-eu", "unknown"]
    ))
    def check(groups, ua):
        # only Allow/Disallow lines close a User-agent run (Crawl-delay
        # is grouping-transparent), so a rendered group must end with
        # at least one rule or it would MERGE into the next group's
        # agent lines; pin every group with a rule so the reference's
        # group structure matches the rendered text's.
        groups = [(a, r or ["/a"], d) for a, r, d in groups]
        got = parse_robots_txt_full(render(groups), ua)
        assert got == reference(groups, ua), (groups, ua, got)

    check()


def test_robots_group_gate_arms(spark):
    """Every selection arm of robots_txt_group_gate produces the
    arithmetic verdict the oracle derives."""
    from vmware_graph_spark.queries_ext21 import robots_txt_group_gate

    out = robots_txt_group_gate(spark, SF).collect()
    assert out
    for r in out:
        want = 1 if (r.doc_id % 5 == 3 or r.doc_id % 10 == r.doc_id % 5) else 0
        assert r.fetch_allowed == want, (r.doc_id, r.host, r.fetch_allowed)


def test_robots_group_gate_plan_never_shuffles_frontier(spark):
    from vmware_graph_spark.queries_ext21 import robots_txt_group_gate

    df = robots_txt_group_gate(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    # the scan-level rebalance (REPARTITION_BY_NUM) may hash-SPREAD the
    # frontier on doc_id; what must never appear is a JOIN-induced
    # (ENSURE_REQUIREMENTS) hash exchange on the frontier key
    assert not any(
        "hashpartitioning(doc_id" in ln and "ENSURE_REQUIREMENTS" in ln
        for ln in plan.splitlines()
    )
    # the only Python node allowed is the robots-side parser
    assert plan.count("ArrowEvalPython") == 0


def test_robots_filter_plan_broadcasts_and_never_shuffles_frontier(spark):
    from vmware_graph_spark.queries_ext21 import robots_frontier_filter

    df = robots_frontier_filter(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    # the only allowed exchanges are on the tiny rules side (its groupBy
    # + the broadcast) and the scan-level rebalance (REPARTITION_BY_NUM);
    # the frontier must not hash-partition on its key FOR A JOIN
    assert not any(
        "hashpartitioning(doc_id" in ln and "ENSURE_REQUIREMENTS" in ln
        for ln in plan.splitlines()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_robots_filter_size_gate_regimes_and_verdict_parity(spark):
    """The rules-side broadcast is SIZE-GATED (round-10 VERDICT #1):
    below the threshold the plan broadcasts; above it (forced here via
    broadcast_max_rules=0) it falls back to a shuffle-hash join on
    host — and the two regimes produce bit-identical verdicts because
    they share the resolution expression."""
    from vmware_graph_spark.operators.crawl import robots_filter

    urls = spark.createDataFrame(
        [("h", f"/a/{i}") for i in range(40)] + [("g", "/z")],
        "host string, path string",
    )
    rules = spark.createDataFrame(
        [("h", "/a/", False), ("h", "/a/*3$", True), ("h", "/a/1", True)],
        "host string, path_prefix string, allow boolean",
    )

    def plan_of(df):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    fast = robots_filter(urls, rules)  # 3 rules << default threshold
    assert "BroadcastHashJoin" in plan_of(fast)

    slow = robots_filter(urls, rules, broadcast_max_rules=0)
    p = plan_of(slow)
    assert "ShuffledHashJoin" in p and "BroadcastHashJoin" not in p

    want = {(r.host, r.path): r.fetch_allowed for r in fast.collect()}
    got = {(r.host, r.path): r.fetch_allowed for r in slow.collect()}
    assert want == got and len(want) == 41
    # spot-check the semantics survived the regime switch
    assert got[("h", "/a/13")] is True      # wildcard-anchor carve-out
    assert got[("h", "/a/2")] is False      # longest-match disallow
    assert got[("h", "/a/1")] is True       # tie: allow beats disallow
    assert got[("g", "/z")] is True         # rule-free host

    # rules_rows short-circuits the gate's count job and still picks
    # the declared regime
    forced = robots_filter(urls, rules, broadcast_max_rules=2, rules_rows=3)
    assert "ShuffledHashJoin" in plan_of(forced)


def test_warc_gzip_transparent_whole_and_per_member(spark, tmp_path):
    """.warc.gz parses both as one gzip stream and as concatenated
    per-record members (the Common Crawl layout)."""
    import gzip

    from vmware_graph_spark.sources.warc import make_warc_bytes, parse_warc, read_warc

    recs = [
        {"uri": "http://h/1", "body": b"<p>one</p>"},
        {"uri": "http://h/2", "body": b"<p>two</p>"},
    ]
    whole = gzip.compress(make_warc_bytes(recs))
    per_member = b"".join(gzip.compress(make_warc_bytes([r])) for r in recs)
    for data in (whole, per_member):
        uris = [r["uri"] for r in parse_warc(data)]
        assert uris == ["http://h/1", "http://h/2"]
    (tmp_path / "a.warc.gz").write_bytes(per_member)
    out = read_warc(spark, str(tmp_path / "*.warc.gz")).collect()
    assert {r.uri for r in out} == {"http://h/1", "http://h/2"}


def test_write_warc_gzip_members_roundtrip(spark, tmp_path):
    """write_warc_files(gzip_members=True) emits the Common Crawl
    layout (one member per record incl. a warcinfo member) and the
    fleet reader returns byte-identical records to the plain fleet;
    bytes are mtime-free so fixtures stay deterministic."""
    from vmware_graph_spark.sources.warc import read_warc, write_warc_files

    shards = {
        "a": [{"uri": "http://h/1", "body": b"<p>one</p>"},
              {"uri": "http://h/2", "body": b"<p>two</p>", "status": 404}],
        "b": [{"uri": "http://h/3", "body": b"x" * 5000}],
    }
    p_plain = write_warc_files(shards, str(tmp_path / "plain"))
    p_gz = write_warc_files(shards, str(tmp_path / "gz"), gzip_members=True)
    assert [p.endswith(".warc") for p in p_plain] == [True, True]
    assert [p.endswith(".warc.gz") for p in p_gz] == [True, True]
    plain = {(r.uri, r.http_status, bytes(r.body))
             for r in read_warc(spark, str(tmp_path / "plain" / "*.warc")).collect()}
    gz = {(r.uri, r.http_status, bytes(r.body))
          for r in read_warc(spark, str(tmp_path / "gz" / "*.warc.gz")).collect()}
    assert plain == gz and len(plain) == 3
    # deterministic bytes (mtime=0): a rewrite is byte-identical
    b1 = (tmp_path / "gz" / "a.warc.gz").read_bytes()
    write_warc_files(shards, str(tmp_path / "gz2"), gzip_members=True)
    assert (tmp_path / "gz2" / "a.warc.gz").read_bytes() == b1


def test_jsonl_ingest_counts_reconcile(spark):
    """Good + corrupt rows partition the corpus exactly."""
    from vmware_graph_spark.queries_ext21 import jsonl_corpus_ingest
    from vmware_graph_spark.sources.tables import load_table

    out = {r.lang: (r.n_docs, r.total_toks)
           for r in jsonl_corpus_ingest(spark, SF).collect()}
    docs = load_table(spark, SF, "documents")
    n_total = docs.count()
    n_corrupt = docs.filter(F.col("doc_id") % 41 == 0).count()
    assert sum(n for n, _ in out.values()) == n_total
    assert out["_corrupt"] == (n_corrupt, 0)


def test_politeness_waves_cap_and_conservation(spark):
    from vmware_graph_spark.queries_ext21 import crawl_politeness_waves
    from vmware_graph_spark.sources.tables import load_table

    out = crawl_politeness_waves(spark, SF).collect()
    docs_n = load_table(spark, SF, "documents").count()
    assert sum(r.n_urls for r in out) == docs_n
    assert all(1 <= r.n_urls <= 8 for r in out)
    # every wave but a host's last must be FULL (no idle politeness slots)
    by_host = {}
    for r in out:
        by_host.setdefault(r.host, []).append((r.wave, r.n_urls))
    for waves in by_host.values():
        waves.sort()
        assert [w for w, _ in waves] == list(range(1, len(waves) + 1))
        assert all(n == 8 for _, n in waves[:-1])


def test_politeness_giant_host_routes_bucketed_and_matches_window(spark):
    """The giant-host twin must (a) equal the plain window's rollup
    row-for-row, (b) never funnel the frontier through one task: its
    windows are partitioned by (host, range-bucket), and no
    single-partition exchange appears."""
    from pyspark.sql import Window as W

    from vmware_graph_spark.queries_ext21 import crawl_politeness_waves_giant_host
    from vmware_graph_spark.sources.tables import load_table

    df = crawl_politeness_waves_giant_host(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "SinglePartition" not in plan
    assert "__range_bucket" in plan  # the bucketed-rank route, not a plain window
    got = {(r.host, r.wave): r.n_urls for r in df.collect()}

    d = load_table(spark, SF, "documents").select("doc_id")
    host = F.when(
        F.col("doc_id") % 101 == 0,
        F.concat(F.lit("www.side"), (F.col("doc_id") % 2).cast("string"),
                 F.lit(".example.com")),
    ).otherwise(F.lit("www.giant.example.com"))
    u = d.select(
        host.alias("host"),
        "doc_id",
        F.conv(F.substring(F.md5(F.concat(F.lit("http://x/"),
               F.col("doc_id").cast("string"))), 1, 15), 16, 10)
        .cast("bigint").alias("ord"),
    )
    rn = F.row_number().over(W.partitionBy("host").orderBy("ord", "doc_id"))
    want_df = (
        u.select("host", (((rn - 1) / 8).cast("bigint") + 1).alias("wave"))
        .groupBy("host", "wave")
        .agg(F.count("*").cast("bigint").alias("n_urls"))
    )
    want = {(r.host, r.wave): r.n_urls for r in want_df.collect()}
    assert got == want
    # one giant host dominates: its wave count dwarfs the side hosts'
    giant_waves = max(w for (h, w) in got if h == "www.giant.example.com")
    side_waves = max(w for (h, w) in got if h != "www.giant.example.com")
    assert giant_waves > 10 * side_waves


def test_sniff_charset_precedence_and_twin(spark):
    import duckdb

    from vmware_graph_spark.functions.text import sniff_charset, sniff_charset_sql

    cases = [
        ("text/html; charset=UTF-8", '<meta charset="latin-1">', "utf-8"),
        ("text/html", '<meta charset=big5>', "big5"),
        ("text/html", '<meta data-x="1" charset="gbk">', "gbk"),  # attr order free
        ("text/html", '<meta http-equiv="Content-Type" content="text/html; charset=KOI8-R">', "koi8-r"),
        ("text/html", "<p>nothing</p>", "utf-8"),
        ("TEXT/HTML; CHARSET='Windows-1252'", "", "windows-1252"),
    ]
    df = spark.createDataFrame(cases, "ct string, page string, want string")
    got = df.select(sniff_charset("ct", "page").alias("c"), "want").collect()
    assert all(r.c == r.want for r in got), [(r.c, r.want) for r in got]
    con = duckdb.connect()
    sql = sniff_charset_sql("ct", "page")
    for ct, page, want in cases:
        v = con.execute(
            f"select {sql} from (select ? as ct, ? as page)", [ct, page]
        ).fetchone()[0]
        assert v == want, (ct, page, v, want)


def test_extract_and_resolve_hrefs(spark):
    from vmware_graph_spark.functions.url import extract_hrefs, resolve_href

    df = spark.createDataFrame(
        [
            (
                "http",
                "h.com",
                '<a href="HTTPS://X.com/a">1</a> <a class=q href=/rel>2</a> '
                '<a href="#f">3</a> <a href="mailto:a@b">4</a> '
                "<a href='page.html'>5</a> <a href=\"//cdn.ex.net/j\">6</a>",
            )
        ],
        "s string, h string, html string",
    )
    out = df.select(
        F.explode(extract_hrefs("html")).alias("href"), "s", "h"
    ).select(
        "href", resolve_href(F.col("s"), F.col("h"), F.col("href")).alias("r")
    ).collect()
    got = {r.href: r.r for r in out}
    assert got == {
        "HTTPS://X.com/a": "HTTPS://X.com/a",
        "/rel": "http://h.com/rel",
        "#f": None,
        "mailto:a@b": None,
        "page.html": None,  # path-relative deliberately out of frontier scope
        "//cdn.ex.net/j": "http://cdn.ex.net/j",  # protocol-relative takes page scheme
    }


def test_extract_hrefs_not_hijacked_by_attr_value(spark):
    """An earlier attribute whose VALUE contains 'href=' must not
    hijack the capture (round-10 review finding)."""
    from vmware_graph_spark.functions.url import extract_hrefs

    df = spark.createDataFrame(
        [
            ('<a href="/real" data-x="href=evil">t</a>',),
            ('<a data-x="href=evil" href="/real">t</a>',),
            ("<a\nclass='k'\nhref=/nl>t</a>",),  # newline separators
        ],
        "html string",
    )
    got = [r.hs for r in df.select(extract_hrefs("html").alias("hs")).collect()]
    assert got == [["/real"], ["/real"], ["/nl"]]


def test_warc_non_utf8_header_bytes_parse(spark):
    """Real archives carry non-UTF-8 bytes in header values; the parser
    must fall back to latin-1 instead of raising UnicodeDecodeError."""
    from vmware_graph_spark.sources.warc import make_warc_bytes, parse_warc

    data = bytearray(
        make_warc_bytes(
            [{"uri": "http://h/XX", "body": b"<p>x</p>", "record_id": "<urn:r:0>"}]
        )
    )
    # patch the URI's placeholder to raw 0xE9 0xFF (invalid UTF-8)
    i = data.find(b"http://h/XX")
    data[i + 9 : i + 11] = b"\xe9\xff"
    recs = list(parse_warc(bytes(data)))
    assert len(recs) == 1
    assert recs[0]["uri"] == "http://h/" + b"\xe9\xff".decode("latin-1")
    assert recs[0]["body"] == b"<p>x</p>"


def test_link_frontier_boundary_doc_is_new(spark):
    """The max-id page's absolute link discovers a never-crawled URL."""
    from vmware_graph_spark.queries_ext21 import link_frontier_discovery
    from vmware_graph_spark.sources.tables import load_table

    out = {r.host: r.n_new_urls for r in link_frontier_discovery(spark, SF).collect()}
    docs = load_table(spark, SF, "documents")
    import pyspark.sql.functions as Fn

    mx = docs.agg(Fn.max("doc_id")).collect()[0][0]
    per_host = {
        r["k"]: r["n"]
        for r in docs.groupBy((Fn.col("doc_id") % 5).alias("k"))
        .agg(Fn.count("*").alias("n"))
        .collect()
    }
    # gaps in doc_id also add absolute-link discoveries; compute exactly
    ids = {r.doc_id for r in docs.select("doc_id").collect()}
    for did in ids:
        if did + 1 not in ids:
            per_host[(did + 1) % 5] = per_host.get((did + 1) % 5, 0) + 1
    want = {f"www.site{k}.example.com": n for k, n in per_host.items()}
    assert out == want


def test_crawled_urls_index_extend_probe_idempotent(spark, tmp_path):
    """The crawl loop's persisted state: probe excludes indexed URLs,
    extend appends only the fresh wave (cost ∝ batch), a retried /
    overlapping extend is a no-op, and a marker-less dir fails loudly."""
    import os

    import pytest as _pytest

    from vmware_graph_spark.operators.crawl import (
        extend_crawled_urls,
        frontier_against_crawled,
        write_crawled_urls,
    )

    idx = str(tmp_path / "crawled")
    day1 = spark.createDataFrame(
        [(f"http://h/{i}",) for i in range(100)], "canon string"
    )
    write_crawled_urls(day1, idx)
    cand = spark.createDataFrame(
        [(f"http://h/{i}",) for i in range(90, 130)], "canon string"
    )
    new1 = {r.canon for r in frontier_against_crawled(spark, idx, cand).collect()}
    assert new1 == {f"http://h/{i}" for i in range(100, 130)}

    # fetch wave 1 -> extend; next probe of the same candidates is empty
    extend_crawled_urls(spark, cand, idx)
    assert frontier_against_crawled(spark, idx, cand).count() == 0
    n_rows = spark.read.parquet(f"{idx}/urls.parquet").count()
    assert n_rows == 130  # 100 + the 30 genuinely new; overlap not re-appended

    # retried extend: no-op
    extend_crawled_urls(spark, cand, idx)
    assert spark.read.parquet(f"{idx}/urls.parquet").count() == 130

    # crash rule: marker stamped last -> marker-less dir fails loudly
    os.remove(os.path.join(idx, "format.json"))
    with _pytest.raises(FileNotFoundError):
        frontier_against_crawled(spark, idx, cand)
    with _pytest.raises(FileNotFoundError):
        extend_crawled_urls(spark, cand, idx)


def test_robots_filter_size_gate_executes_parse_once(spark):
    """When the caller omits ``rules_rows``, the size gate must count
    off a PERSISTED rules table — the executor-side parse lineage runs
    exactly once (round-11 VERDICT: ``rules.count()`` used to re-run
    the mapInPandas parse before the join did). Pinned with an
    accumulator inside the parse closure: 20 bodies parsed once = 20,
    a re-executing gate would read 40."""
    from pyspark.sql import functions as F

    from vmware_graph_spark.operators.crawl import robots_filter

    acc = spark.sparkContext.accumulator(0)
    robots = spark.createDataFrame(
        [(f"h{i}", "User-agent: *\nDisallow: /a/\n") for i in range(20)],
        "host string, robots_txt string",
    )

    def counted_parse(batches):
        import pandas as pd

        from vmware_graph_spark.operators.crawl import parse_robots_txt

        for pdf in batches:
            acc.add(len(pdf))
            rows = {"host": [], "path_prefix": [], "allow": []}
            for h, t in zip(pdf["host"], pdf["robots_txt"]):
                for pat, allow in parse_robots_txt(t or "", "examplebot"):
                    rows["host"].append(h)
                    rows["path_prefix"].append(pat)
                    rows["allow"].append(allow)
            yield pd.DataFrame(rows)

    rules = robots.mapInPandas(
        counted_parse, "host string, path_prefix string, allow boolean"
    )
    urls = spark.createDataFrame(
        [(f"h{i % 20}", f"/a/{i}") for i in range(100)], "host string, path string"
    )
    out = robots_filter(urls, rules)  # no rules_rows -> persist + count
    assert out.filter(~F.col("fetch_allowed")).count() == 100
    assert acc.value == 20, f"parse executed {acc.value}/20 input rows"


def test_crawled_index_url_canon_version_gate(spark, tmp_path):
    """An index keyed under an OLDER url_canonical form must fail
    loudly (round-11 advice: percent-normalization re-spelled URLs
    with unreserved escapes, so a v1 index silently re-admits
    previously crawled URLs as uncrawled)."""
    import json
    import os

    import pytest as _pytest

    from vmware_graph_spark.functions.url import URL_CANON_VERSION
    from vmware_graph_spark.operators.crawl import (
        crawl_index_current,
        frontier_against_crawled,
        write_crawled_urls,
    )

    idx = str(tmp_path / "crawled_v1")
    write_crawled_urls(
        spark.createDataFrame([("http://h/a",)], "canon string"), idx
    )
    marker = os.path.join(idx, "format.json")
    with open(marker) as fh:
        doc = json.load(fh)
    assert doc["url_canon"] == URL_CANON_VERSION
    assert crawl_index_current(idx)

    # age the marker to the pre-stamp era (an absent key reads as v1)
    del doc["url_canon"]
    with open(marker, "w") as fh:
        json.dump(doc, fh)
    assert not crawl_index_current(idx)
    cand = spark.createDataFrame([("http://h/b",)], "canon string")
    with _pytest.raises(ValueError, match="url_canonical v1"):
        frontier_against_crawled(spark, idx, cand)


def test_frontier_persisted_state_equals_inflight_twin(spark):
    from vmware_graph_spark.queries_ext21 import (
        frontier_dedup_persisted_state,
        link_frontier_discovery,
    )

    got = {r.host: r.n_new_urls
           for r in frontier_dedup_persisted_state(spark, SF).collect()}
    want = {r.host: r.n_new_urls
            for r in link_frontier_discovery(spark, SF).collect()}
    assert got == want and got


# ---------------------------------------------------------------------------
# persisted ANN index
# ---------------------------------------------------------------------------

def test_ann_index_probe_equals_inflight_twin(spark, tmp_path):
    """Index-only probe must be decision-identical to ivf_learned_topk,
    and the probe must raise loudly on a foreign/missing marker."""
    import json

    from vmware_graph_spark.operators.similarity import (
        ann_topk_against_index,
        ivf_learned_topk,
        write_ann_index,
    )
    from vmware_graph_spark.sources.tables import load_table

    e = load_table(spark, SF, "embeddings")
    qs = e.filter(F.col("vec_id") % 50 == 0).select("vec_id", "embedding")
    idx = str(tmp_path / "idx")
    import os

    os.makedirs(idx)
    write_ann_index(e, idx, "vec_id", "embedding", "label")
    got = {
        (r.qid, r.rank): (r.cid, round(r.cos, 9))
        for r in ann_topk_against_index(
            spark, idx, qs, "vec_id", "embedding", k=5
        ).collect()
    }
    want = {
        (r.qid, r.rank): (r.cid, round(r.cos, 9))
        for r in ivf_learned_topk(
            e, qs, "vec_id", "embedding", "label", k=5
        ).collect()
    }
    assert got == want and got
    # foreign marker -> loud failure
    with open(os.path.join(idx, "format.json"), "w") as f:
        json.dump({"kind": "something_else"}, f)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        ann_topk_against_index(spark, idx, qs, "vec_id", "embedding")


def test_ann_index_crash_marker_rule(spark, tmp_path):
    """format.json is stamped LAST: a crash mid-write leaves no marker,
    so a reader fails loudly instead of probing a half-built index."""
    import os

    from vmware_graph_spark.operators.similarity import write_ann_index
    from vmware_graph_spark.sources.tables import load_table

    e = load_table(spark, SF, "embeddings")
    idx = str(tmp_path / "idx2")
    os.makedirs(idx)
    write_ann_index(e, idx, "vec_id", "embedding", "label")
    assert os.path.exists(os.path.join(idx, "format.json"))
    # rebuild removes the marker FIRST — simulate a crash right after
    os.remove(os.path.join(idx, "format.json"))
    from vmware_graph_spark.operators.similarity import ann_topk_against_index

    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        ann_topk_against_index(
            spark, idx, e.limit(1), "vec_id", "embedding"
        )


# ---------------------------------------------------------------------------
# property tests: cross-engine parity over generated hostile inputs
# ---------------------------------------------------------------------------

def test_url_canonical_twin_parity_property(spark):
    """Spark and DuckDB twins must agree on URLs assembled from random
    parts (case, ports, userinfo, params incl. tracking, fragments)."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from vmware_graph_spark.functions.url import url_canonical, url_canonical_sql

    con = duckdb.connect()
    sql = url_canonical_sql("u")

    host_chars = st.text("abcXYZ09.-", min_size=1, max_size=8)
    param = st.sampled_from(
        ["a=1", "b=2", "utm_source=x", "gclid=9", "z=", "k=v&broken"]
    )
    urls = st.builds(
        lambda scheme, user, host, port, path, params, frag: (
            scheme
            + "://"
            + (user + "@" if user else "")
            + host
            + port
            + path
            + ("?" + "&".join(params) if params else "")
            + ("#" + frag if frag else "")
        ),
        st.sampled_from(["http", "HTTP", "https", "HtTpS", "ftp"]),
        st.sampled_from(["", "u", "u:p"]),
        host_chars,
        st.sampled_from(["", ":80", ":443", ":8080"]),
        st.sampled_from(["", "/", "/A/b", "/x%20y"]),
        st.lists(param, max_size=3),
        st.sampled_from(["", "f", "sec?x=1"]),
    )

    @settings(max_examples=120, deadline=None)
    @given(st.lists(urls, min_size=1, max_size=8, unique=True))
    def check(batch):
        df = spark.createDataFrame([(u,) for u in batch], "u string")
        got = {
            r.u: r.c
            for r in df.select("u", url_canonical("u").alias("c")).collect()
        }
        for u in batch:
            want = con.execute(
                f"select {sql} from (select ? as u)", [u]
            ).fetchone()[0]
            assert got[u] == want, (u, got[u], want)

    check()


def test_html_to_text_twin_parity_property(spark):
    """Spark and DuckDB extraction chains must agree on pages assembled
    from random markup fragments (nesting, entities, hostile text)."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from vmware_graph_spark.functions.text import html_to_text, html_to_text_sql

    con = duckdb.connect()
    sql = html_to_text_sql("h")

    frag = st.sampled_from(
        [
            "plain words",
            "<p>para</p>",
            "<script>var a = '<b>';</script>",
            "<style>p{x:1}</style>",
            "<!-- <div>c</div> -->",
            "&amp;lt; &quot;q&quot; x&nbsp;y",
            "<SCRIPT a=b>S</SCRIPT>",
            "<div class='k'>d</div>",
            "a < b",
            "tag<br>break",
            "\n\t  ",
            # numeric character references: decimal, hex (case/zeros),
            # double-escaped, and an out-of-table ref that must survive
            "it&#8217;s &#x27;x&#X27;",
            "&#039;zero&#x0027;",
            "dash&#8211;dash&#x2014;em",
            "&amp;#38; &#38;amp;",
            "&#12345; stays &#xBEEF;",
        ]
    )

    @settings(max_examples=80, deadline=None)
    @given(st.lists(frag, min_size=1, max_size=6))
    def check(frags):
        page = "".join(frags)
        df = spark.createDataFrame([(page,)], "h string")
        got = df.select(html_to_text("h").alias("t")).collect()[0].t
        want = con.execute(
            f"select {sql} from (select ? as h)", [page]
        ).fetchone()[0]
        assert got == want, (page, got, want)

    check()


def test_ann_index_extend_incremental_and_idempotent(spark, tmp_path):
    """Extend = assign-against-persisted-codebook + append; a probe
    after extend sees the new vectors; a retried (overlapping) extend
    changes nothing."""
    import os

    from vmware_graph_spark.operators.similarity import (
        ann_topk_against_index,
        extend_ann_index,
        write_ann_index,
    )
    from vmware_graph_spark.sources.tables import load_table

    e = load_table(spark, SF, "embeddings")
    old = e.filter(F.col("vec_id") % 3 != 0)
    new = e.filter(F.col("vec_id") % 3 == 0).select("vec_id", "embedding")
    idx = str(tmp_path / "idx")
    os.makedirs(idx)
    write_ann_index(old, idx, "vec_id", "embedding", "label")
    qs = e.filter(F.col("vec_id") % 50 == 0).select("vec_id", "embedding")
    before = {(r.qid, r.rank): r.cid
              for r in ann_topk_against_index(spark, idx, qs, "vec_id", "embedding").collect()}
    extend_ann_index(new, idx, "vec_id", "embedding")
    after = {(r.qid, r.rank): r.cid
             for r in ann_topk_against_index(spark, idx, qs, "vec_id", "embedding").collect()}
    new_ids = {r.vec_id for r in new.collect()}
    assert any(cid in new_ids for cid in after.values())
    assert before != after
    # retried/overlapping extend is a no-op
    extend_ann_index(new, idx, "vec_id", "embedding")
    again = {(r.qid, r.rank): r.cid
             for r in ann_topk_against_index(spark, idx, qs, "vec_id", "embedding").collect()}
    assert again == after
    n_rows = spark.read.parquet(f"{idx}/corpus.parquet").count()
    assert n_rows == e.count()


def test_robots_filter_property_vs_reference_model(spark):
    """The Catalyst pattern compilation + longest-match resolution must
    agree with an independent Python re-based reference (RFC 9309:
    most-octets pattern wins, '*' matches any sequence, trailing '$'
    anchors, Allow beats Disallow on ties, default allow) over
    generated rule sets and paths."""
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from vmware_graph_spark.operators.crawl import robots_filter

    prefix = st.sampled_from(
        [
            "/", "/a", "/a/", "/a/b", "/ab", "/b", "/a/b/c",
            # wildcard / anchor shapes, incl. metachars that must stay literal
            "/*b", "/a/*", "/a$", "/a/b$", "/*.x$", "/a/*c$", "/a.b", "/*?s=",
        ]
    )
    rule = st.tuples(prefix, st.booleans())
    path = st.sampled_from(
        [
            "/", "/a", "/a/", "/a/b", "/a/bx", "/a/b/c/d", "/ab", "/b/z",
            "/c", "", "/a.x", "/aZx", "/a/q.x", "/a/zc", "/p?s=1", "/a.b", "/aXb",
        ]
    )

    def reference(rules, p):
        best = None  # (score, allow)
        for pat, allow in rules:
            anchored = pat.endswith("$")
            body = pat[:-1] if anchored else pat
            rx = "^" + re.escape(body).replace(r"\*", ".*") + ("$" if anchored else "")
            if re.search(rx, p):
                score = 2 * len(pat) + int(allow)
                if best is None or score > best[0]:
                    best = (score, allow)
        return True if best is None else best[1]

    @settings(max_examples=40, deadline=None)
    @given(
        st.dictionaries(prefix, st.booleans(), max_size=5),
        st.lists(path, min_size=1, max_size=6, unique=True),
    )
    def check(rule_map, paths):
        rules = [("h", pre, allow) for pre, allow in rule_map.items()]
        urls = spark.createDataFrame(
            [("h", p) for p in paths], "host string, path string"
        )
        rules_df = spark.createDataFrame(
            rules or [("h", "/__never__", True)],
            "host string, path_prefix string, allow boolean",
        )
        got = {
            r.path: r.fetch_allowed
            for r in robots_filter(urls, rules_df).collect()
        }
        eff_rules = list(rule_map.items()) if rule_map else [("/__never__", True)]
        for p in paths:
            assert got[p] == reference(eff_rules, p), (rule_map, p, got[p])

    check()


def test_mrr_rows_exclude_self_and_bound(spark):
    from vmware_graph_spark.queries_ext21 import mrr_retrieval_labels
    from vmware_graph_spark.sources.tables import load_table

    out = mrr_retrieval_labels(spark, SF).collect()
    qs_n = (
        load_table(spark, SF, "embeddings").filter(F.col("vec_id") % 20 == 0).count()
    )
    assert len(out) == qs_n  # no-hit queries still present
    for r in out:
        assert 0 <= r.first_rel_rank <= 10
        if r.first_rel_rank == 0:
            assert r.rr == 0.0
        else:
            assert abs(r.rr - round(1 / r.first_rel_rank, 6)) < 1e-12
