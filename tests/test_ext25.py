"""Unit tests for the round-12 additions: reputation-weighted
budgeting, the RFC 9309 §2.3.1.2 redirect arm (covered in test_ext24),
the §2.5 parse limit, IP-grain politeness, and conditional-GET
revalidation economics."""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_truncate_robots_body_line_boundary():
    """The §2.5 cut lands on the LAST complete line inside the byte
    budget — never mid-record — and in-limit bodies pass untouched."""
    from vmware_graph_spark.operators.crawl import truncate_robots_body

    small = "User-agent: *\nDisallow: /a\n"
    assert truncate_robots_body(small) == small

    # 9-byte lines; a 25-byte budget keeps exactly two of them
    txt = "#2345678\n" * 4
    assert truncate_robots_body(txt, 25) == "#2345678\n" * 2
    # budget inside the first line -> empty body, not half a line
    assert truncate_robots_body("Disallow: /secret-path\n", 10) == ""
    # multi-byte characters: the cut is on a newline, so decode is safe
    uni = "# héllo wörld\n" * 100
    out = truncate_robots_body(uni, 64)
    assert out and uni.startswith(out) and out.endswith("\n")
    assert len(out.encode("utf-8")) <= 64


def test_parse_robots_applies_parse_limit():
    """Rules past the 500 KiB cap are ignored; rules before it bind."""
    from vmware_graph_spark.operators.crawl import parse_robots_txt

    pad = "#x\n" * 171_000  # 513 000 bytes
    txt = "User-agent: a\nDisallow: /pre/\n" + pad + "Disallow: /late/\n"
    assert parse_robots_txt(txt, "a") == [("/pre/", False)]
    # the whole group past the cap -> no rules at all
    assert parse_robots_txt(pad + "User-agent: a\nDisallow: /pre/\n", "a") == []


def test_revalidation_policy_precedence(spark):
    """ETag beats Last-Modified; empty-string validators are absent;
    savings only on the conditional arms."""
    from vmware_graph_spark.operators.crawl import revalidation_policy

    df = spark.createDataFrame(
        [
            ('W/"abc"', "Fri, 01 Aug 2026 00:00:00 GMT", 0.25, 1000),
            (None, "Fri, 01 Aug 2026 00:00:00 GMT", 0.5, 800),
            ("", None, 0.0, 600),
            (None, None, 0.9, 400),
            ("", "Fri, 01 Aug 2026 00:00:00 GMT", 1.0, 200),
        ],
        "etag string, lm string, rate double, len bigint",
    )
    pol = revalidation_policy(
        F.col("etag"), F.col("lm"), F.col("rate"), F.col("len")
    )
    got = [
        (r.m, r.s)
        for r in df.select(
            pol["mode"].alias("m"), pol["expected_saved_bytes"].alias("s")
        ).collect()
    ]
    assert got == [
        ("if-none-match", 750.0),       # etag wins over lm
        ("if-modified-since", 400.0),
        ("unconditional", 0.0),         # empty etag, no lm
        ("unconditional", 0.0),
        ("if-modified-since", 0.0),     # certain change: nothing saved
    ]


def test_ip_politeness_waves_grouping_and_plan(spark):
    """Waves schedule per IP (hosts sharing an address share the
    domain), full waves everywhere but each IP's last, and the per-IP
    rank is range-bucketed — no plain per-IP window."""
    from vmware_graph_spark.queries_ext25 import ip_politeness_waves

    df = ip_politeness_waves(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    rn_specs = re.findall(r"row_number\(\) windowspecdefinition\(([^)]*)\)", plan)
    assert rn_specs
    for spec in rn_specs:
        assert "__range_bucket" in spec, spec

    rows = df.collect()
    assert {r.ip for r in rows} == {"10.0.0.0", "10.0.0.1"}
    for ip in ("10.0.0.0", "10.0.0.1"):
        waves = sorted((r.wave, r.n_urls) for r in rows if r.ip == ip)
        assert [w for w, _ in waves] == list(range(1, len(waves) + 1))
        assert all(n == 8 for _, n in waves[:-1])
    # ip .0 fronts hosts {0,2,4}: some wave must mix multiple hosts
    assert max(r.n_hosts for r in rows if r.ip == "10.0.0.0") >= 2


def test_write_wet_target_member_bytes(spark, tmp_path):
    """Member sizing: the sink splits into ~ceil(total/target) files,
    every record survives the roundtrip, and the default (no target)
    behavior is unchanged."""
    import glob

    from vmware_graph_spark.sources.warc import read_warc, write_wet

    df = spark.createDataFrame(
        [(f"http://h/{i}", "x" * 1000) for i in range(200)],
        "uri string, text string",
    )
    out_dir = str(tmp_path / "wet_sized")
    # ~200 * (1000 + 2*12 + 140) ~ 233 KB serialized; 50 KB target -> ~5
    n = write_wet(df, out_dir, target_member_bytes=50_000)
    assert n == 200
    files = glob.glob(f"{out_dir}/*.warc.wet")
    assert 3 <= len(files) <= 7, len(files)
    back = read_warc(spark, f"{out_dir}/*.warc.wet", types=("conversion",))
    assert back.count() == 200
    assert back.select("uri").distinct().count() == 200


def _naive_gif_frame(pal_rgb, w, h, idx):
    """One GIF image block (GCE + descriptor + LOCAL 4-color table +
    clear-per-symbol 3-bit LZW) for the animation tests."""
    import struct

    pal = b"".join(bytes(c) for c in pal_rgb)
    gce = b"!\xf9\x04\x00\x00\x00\x00\x00"
    img = b"," + struct.pack("<HHHHB", 0, 0, w, h, 0x81)
    bits = []

    def emit(code):
        for k in range(3):
            bits.append((code >> k) & 1)

    for p in idx:
        emit(4)
        emit(p)
    emit(5)
    by = bytearray()
    for i in range(0, len(bits), 8):
        v = 0
        for j, bit in enumerate(bits[i : i + 8]):
            v |= bit << j
        by.append(v)
    blocks = b""
    for i in range(0, len(by), 255):
        chunk = bytes(by[i : i + 255])
        blocks += bytes([len(chunk)]) + chunk
    return gce + img + pal + b"\x02" + blocks + b"\x00"


def test_decode_gif_frames_multi_frame_local_tables():
    """Every frame decodes; local color tables override the (decoy)
    global one; frame dims may differ; truncation and frameless GIFs
    fail loudly."""
    import struct

    import pytest as _pytest

    from vmware_graph_spark.operators.multimodal import (
        decode_gif_frames,
        decode_image_stdlib,
    )

    head = b"GIF89a" + struct.pack("<HHBBB", 4, 2, 0x81, 0, 0) + b"\x00" * 12
    f0 = _naive_gif_frame([(10, 20, 30)] * 4, 4, 2, [0] * 8)
    f1 = _naive_gif_frame(
        [(100, 0, 0), (200, 0, 0), (100, 0, 0), (200, 0, 0)], 2, 2, [0, 1, 2, 3]
    )
    g = head + f0 + f1 + b";"
    frames = decode_gif_frames(g)
    assert [(f[0], f[1], f[2]) for f in frames] == [(0, 4, 2), (1, 2, 2)]
    assert frames[0][3:] == (10.0, 20.0, 30.0)   # local table, not the zeroed global
    assert frames[1][3] == 150.0                  # (100+200+100+200)/4
    # the single-frame decoder still reads exactly frame 0
    d = decode_image_stdlib(g, "image/gif")
    assert (d.width, d.height, d.mean_r) == (4, 2, 10.0)

    with _pytest.raises(ValueError):
        decode_gif_frames(head + b";")           # no image data
    with _pytest.raises(ValueError):
        decode_gif_frames(g[:-6])                # truncated mid-frame
    with _pytest.raises(ValueError):
        decode_gif_frames(b"NOTGIF")


def test_page_directives_and_rel_links(spark):
    """Meta/header directive grammar: restrictive union across sources,
    'none' = both, attribute order free, decoy meta names inert,
    'rel=' in anchor TEXT never fabricates a rel."""
    from vmware_graph_spark.functions.url import extract_links_rel
    from vmware_graph_spark.operators.crawl import page_directives

    df = spark.createDataFrame(
        [
            # restrictive union: meta says nofollow, header says noindex
            ('<meta name="robots" content="nofollow">', "noindex", True, True),
            # 'none' implies both; decoy viewport meta inert
            ('<meta content="none" name="robots"><meta name="viewport" '
             'content="noindex">', None, True, True),
            ('<meta name="viewport" content="noindex">', None, False, False),
            (None, "NOINDEX", True, False),
            ("<p>no directives</p>", "", False, False),
            # substring must not match: 'nofollowed' is not 'nofollow'
            ('<meta name="robots" content="nofollowed">', None, False, False),
            # UNQUOTED content value is legal HTML (round-12 self-review)
            ("<meta name=robots content=noindex>", None, True, False),
            # single-quoted list with spaces
            ("<meta name='robots' content='noindex , nofollow'>", None,
             True, True),
        ],
        "html string, hdr string, want_noindex boolean, want_nofollow boolean",
    )
    pd_ = page_directives(F.col("html"), F.col("hdr"))
    for r in df.select(
        "want_noindex", "want_nofollow",
        pd_["noindex"].alias("ni"), pd_["nofollow"].alias("nf"),
    ).collect():
        assert (r.ni, r.nf) == (r.want_noindex, r.want_nofollow), r

    links = spark.createDataFrame(
        [
            ('<a rel="NoFollow" href="/a">x</a>'
             '<a href="/b" rel="ugc sponsored">y</a>'
             '<a href="/c">rel=nofollow in text</a>',),
        ],
        "html string",
    ).select(F.explode(extract_links_rel("html")).alias("l")).collect()
    got = [(r.l.href, r.l.rel) for r in links]
    assert got == [("/a", "nofollow"), ("/b", "ugc sponsored"), ("/c", "")]


def test_page_directives_property_vs_htmlparser(spark):
    """page_directives vs an INDEPENDENT html.parser reference over
    generated pages: random attribute order, quote style (double /
    single / unquoted), case, decoy meta names, multiple robots metas,
    and header arms — the meta extraction and the restrictive-union
    directive logic must agree on every page."""
    import random
    from html.parser import HTMLParser

    from vmware_graph_spark.operators.crawl import page_directives

    rng = random.Random(42)
    names = ["robots", "ROBOTS", "viewport", "description"]
    contents = [
        "noindex", "nofollow", "none", "all", "noindex, nofollow",
        "NOINDEX , follow", "index,nofollow", "nofollowed", "",
    ]
    headers = [None, "", "noindex", "nofollow", "none", "index, archive"]

    def attr(name, val):
        q = rng.choice(['"', "'", ""])
        if q == "" and (" " in val or val == ""):
            q = '"'
        return f"{name}={q}{val}{q}"

    def meta_tag():
        name = rng.choice(names)
        content = rng.choice(contents)
        a = [attr("name", name), attr("content", content)]
        rng.shuffle(a)
        return "<meta " + " ".join(a) + ">"

    pages = []
    for i in range(200):
        body = "".join(meta_tag() for _ in range(rng.randint(0, 3)))
        pages.append((i, f"<html><head>{body}</head><body>x</body></html>",
                      rng.choice(headers)))

    class MetaRef(HTMLParser):
        def __init__(self):
            super().__init__()
            self.contents = []

        def handle_startendtag(self, tag, attrs):
            self.handle_starttag(tag, attrs)

        def handle_starttag(self, tag, attrs):
            if tag != "meta":
                return
            d = dict(attrs)
            if (d.get("name") or "").lower() == "robots":
                self.contents.append(d.get("content") or "")

    def ref_directives(html, hdr):
        p = MetaRef()
        p.feed(html)
        vals = list(p.contents) + ([hdr] if hdr else [])
        toks = {
            t.strip().lower()
            for v in vals
            for t in v.split(",")
        }
        return ("noindex" in toks or "none" in toks,
                "nofollow" in toks or "none" in toks)

    df = spark.createDataFrame(pages, "i int, html string, hdr string")
    pd_ = page_directives(F.col("html"), F.col("hdr"))
    got = {
        r.i: (r.ni, r.nf)
        for r in df.select(
            "i", pd_["noindex"].alias("ni"), pd_["nofollow"].alias("nf")
        ).collect()
    }
    for i, html, hdr in pages:
        assert got[i] == ref_directives(html, hdr), (i, html, hdr, got[i])


def test_extract_links_rel_property_vs_htmlparser(spark):
    """extract_links_rel's (href, rel) pairs vs html.parser over
    generated anchors: quote styles, attribute order, rel lists,
    relless anchors, and 'rel=' inside anchor text."""
    import random
    from html.parser import HTMLParser

    from vmware_graph_spark.functions.url import extract_links_rel

    rng = random.Random(7)
    rels = [None, "nofollow", "ugc nofollow", "sponsored", "UGC"]

    def anchor(i):
        href = f"/p/{i}"
        rel = rng.choice(rels)
        attrs = [f'href="{href}"']
        if rel is not None:
            q = rng.choice(['"', "'"])
            attrs.append(f"rel={q}{rel}{q}")
        rng.shuffle(attrs)
        text = rng.choice(["go", "rel=nofollow decoy", "x y"])
        return f"<a {' '.join(attrs)}>{text}</a>", href, (rel or "").lower()

    pages = []
    expect = {}
    for i in range(100):
        n = rng.randint(1, 4)
        parts = []
        exp = []
        for k in range(n):
            a, href, rel = anchor(i * 10 + k)
            parts.append(a)
            exp.append((href, rel))
        pages.append((i, "<html><body>" + "".join(parts) + "</body></html>"))
        expect[i] = exp

    class RelRef(HTMLParser):
        def __init__(self):
            super().__init__()
            self.out = []

        def handle_starttag(self, tag, attrs):
            if tag == "a":
                d = dict(attrs)
                self.out.append((d.get("href"), (d.get("rel") or "").lower()))

    df = spark.createDataFrame(pages, "i int, html string")
    got = {
        r.i: [(x.href, x.rel) for x in r.ls]
        for r in df.select("i", extract_links_rel("html").alias("ls")).collect()
    }
    for i, html in pages:
        ref = RelRef()
        ref.feed(html)
        assert got[i] == ref.out == expect[i], (i, html, got[i], ref.out)


def test_reputation_weighted_budget_conserves_and_orders(spark):
    """Σalloc = 1000 exactly, and the dup-heavy content farm (host0)
    gets the smallest share; the robots-blocking host1 sits between
    the farm and the healthy hosts."""
    from vmware_graph_spark.queries_ext25 import reputation_weighted_budget

    rows = {r.host: r for r in reputation_weighted_budget(spark, SF).collect()}
    assert len(rows) == 5
    assert sum(r.alloc for r in rows.values()) == 1000
    farm = rows["www.site0.example.com"]
    blocker = rows["www.site1.example.com"]
    healthy = [
        rows[f"www.site{k}.example.com"] for k in (2, 3, 4)
    ]
    assert farm.alloc < blocker.alloc
    assert all(blocker.alloc < h.alloc for h in healthy)
    assert all(r.weight >= 0 for r in rows.values())
