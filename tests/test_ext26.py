"""Round-12 ext26 family: structural boilerplate blocks, mojibake
audit, host-graph authority PageRank, CCNet perplexity buckets."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_block_primitives_and_classification(spark):
    from vmware_graph_spark.functions.text import (
        anchor_text_chars,
        classify_block,
        html_blocks,
        html_to_text,
    )

    doc_id, text = 13, "alpha beta gamma delta epsilon zeta eta theta iota"
    m, q = doc_id % 9, doc_id % 10
    html = (
        '<html><body><div class="nav"><a href="/">Home</a>'
        ' <a href="/about">About us</a> <a href="/contact">Contact</a></div>'
        f"<h1>Doc {doc_id}</h1><p>{text}</p>"
        f'<p>See <a href="/ref/{doc_id}">reference {q}</a>' + " pad" * m + "</p>"
        '<div class="footer"><a href="/tos">Terms</a>'
        ' <a href="/privacy">Privacy</a> (c) 2026</div></body></html>'
    )
    df = spark.createDataFrame([(doc_id, html)], "doc_id long, html string")
    rows = (
        df.select("doc_id", F.posexplode(html_blocks("html")).alias("pos", "frag"))
        .select(
            "pos",
            F.length(html_to_text("frag")).alias("n"),
            anchor_text_chars("frag").alias("a"),
        )
        .filter(F.col("n") > 0)
        .withColumn("cls", classify_block(F.col("n"), F.col("a")))
        .orderBy("pos")
        .collect()
    )
    got = [(r.n, r.a, r.cls) for r in rows]
    assert got == [
        (21, 19, "boilerplate"),        # nav: density 19/21
        (6, 0, "boilerplate"),          # h1: short
        (len(text), 0, "content"),      # document prose
        (15 + 4 * m, 11, "content"),    # m=4 -> density 11/31, len 31
        (22, 12, "boilerplate"),        # footer: density 12/22
    ]


def test_classify_block_threshold_edges(spark):
    from vmware_graph_spark.functions.text import classify_block

    df = spark.createDataFrame(
        [(20, 10), (20, 11), (19, 0), (20, 0)], "n int, a int"
    )
    got = [
        r.cls
        for r in df.select(
            classify_block(F.col("n"), F.col("a")).alias("cls")
        ).collect()
    ]
    # density == 0.5 is NOT boilerplate (rule is strict >); n == 20 is
    # NOT short (rule is strict <); n == 19 is.
    assert got == ["content", "boilerplate", "boilerplate", "content"]


def test_anchor_text_chars_tag_name_anchored(spark):
    from vmware_graph_spark.functions.text import anchor_text_chars

    df = spark.createDataFrame(
        [
            ("<abbr title=x>abbrev</abbr> none", 0),
            ("<a href=x>four</a>", 4),
            ("<a\nhref=x>nl</a> <a>two</a>", 5),  # whitespace incl newline; bare <a>
            ("<article>long tag</article>", 0),
        ],
        "frag string, want int",
    )
    rows = df.select("want", anchor_text_chars("frag").alias("got")).collect()
    for r in rows:
        assert r.got == r.want


def test_mojibake_flags(spark):
    from vmware_graph_spark.functions.text import (
        has_c1_controls,
        has_double_utf8,
        has_replacement_char,
    )

    df = spark.createDataFrame(
        [
            (1, "clean text", False, False, False),
            (2, "bad � here", True, False, False),
            (3, "cafÃ© double", False, True, False),
            (4, "nel \u0085 ctrl", False, False, True),
            (5, "plain Ã alone", False, False, False),  # no continuation char
        ],
        "id long, text string, r boolean, d boolean, c boolean",
    )
    rows = df.select(
        "id", "r", "d", "c",
        has_replacement_char("text").alias("gr"),
        has_double_utf8("text").alias("gd"),
        has_c1_controls("text").alias("gc"),
    ).collect()
    for r in rows:
        assert (r.gr, r.gd, r.gc) == (r.r, r.d, r.c), r.id


def test_mojibake_audit_counts(spark):
    from vmware_graph_spark.queries_ext26 import mojibake_artifact_audit

    got = {
        r.source: r
        for r in mojibake_artifact_audit(spark, SF_SMALL).collect()
    }
    con = duckdb.connect()
    ref = con.execute(
        "SELECT source, count(*) AS n, "
        "sum(CASE WHEN doc_id % 11 = 0 THEN 1 ELSE 0 END) AS r11, "
        "sum(CASE WHEN doc_id % 13 = 0 THEN 1 ELSE 0 END) AS r13, "
        "sum(CASE WHEN doc_id % 17 = 0 THEN 1 ELSE 0 END) AS r17 "
        f"FROM '{SF_SMALL}/documents.parquet' GROUP BY source"
    ).fetchall()
    assert len(got) == len(ref)
    for source, n, r11, r13, r17 in ref:
        g = got[source]
        assert (g.n_docs, g.n_replacement, g.n_double_utf8, g.n_c1_controls) == (
            n, r11, r13, r17
        )


def _host_pagerank_reference(doc_ids, iters=4):
    """Fixture edge dict from doc_ids + the CANONICAL pure-Python
    fixpoint replica (shared with tools/boilerplate_scalebench.py —
    the two references differ only in edge construction)."""
    from collections import Counter

    from tools.boilerplate_scalebench import weighted_pagerank_int_reference

    e0 = Counter()
    for did in doc_ids:
        src = did % 23
        e0[(src, (did * 7 + 3) % 23)] += 1
        if did % 3 == 0:
            e0[(src, (did * 5 + 11) % 23)] += 1
    edges = {(s, t): w for (s, t), w in e0.items() if s != t}
    rank = weighted_pagerank_int_reference(edges, iters=iters)
    return {f"site{v}.example.com": r for v, r in rank.items()}


def test_host_authority_pagerank_vs_reference(spark):
    from vmware_graph_spark.queries_ext26 import host_authority_pagerank

    con = duckdb.connect()
    doc_ids = [
        r[0]
        for r in con.execute(
            f"SELECT doc_id FROM '{SF_SMALL}/documents.parquet'"
        ).fetchall()
    ]
    want = _host_pagerank_reference(doc_ids)
    got = {
        r.host: r.rank_micros
        for r in host_authority_pagerank(spark, SF_SMALL).collect()
    }
    assert got == want
    # host 11's primary target is itself (7*11+3 = 80 = 11 mod 23): the
    # self-link must have been dropped, leaving only the secondary edge.
    assert "site11.example.com" in got


def test_ccnet_buckets_invariants(spark):
    from vmware_graph_spark.queries_ext26 import ccnet_perplexity_buckets
    from vmware_graph_spark.sources.tables import load_table

    rows = ccnet_perplexity_buckets(spark, SF_SMALL).collect()
    d = load_table(spark, SF_SMALL, "documents")
    lang_counts = {
        r.lang: r.n for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, {})[r.bucket] = r
    for lang, buckets in by_lang.items():
        assert set(buckets) == {"head", "middle", "tail"}
        ns = [buckets[b].n_docs for b in ("head", "middle", "tail")]
        assert sum(ns) == lang_counts[lang]
        assert max(ns) - min(ns) <= 1  # ntile balance
        # head is the LEAST perplexed tertile: mean logprob ordered
        assert (
            buckets["head"].avg_logprob
            >= buckets["middle"].avg_logprob
            >= buckets["tail"].avg_logprob
        )
    # token totals conserve against the whole corpus
    from vmware_graph_spark.operators.quality import unigram_logprob

    total = unigram_logprob(d, "doc_id", "text").agg(
        F.sum("n_tok").alias("t")
    ).collect()[0].t
    assert sum(r.total_tokens for r in rows) == total


def test_boilerplate_query_matches_arithmetic(spark):
    from vmware_graph_spark.queries_ext26 import boilerplate_block_classify

    got = {
        r.doc_id: r for r in boilerplate_block_classify(spark, SF_SMALL).collect()
    }
    con = duckdb.connect()
    ref = con.execute(
        f"SELECT doc_id, n_chars FROM '{SF_SMALL}/documents.parquet'"
    ).fetchall()
    assert len(got) == len(ref)
    for doc_id, n_chars in ref:
        m = doc_id % 9
        exp_content = (1 if n_chars >= 20 else 0) + (1 if m >= 2 else 0)
        g = got[doc_id]
        assert g.n_blocks == 5
        assert g.n_content == exp_content
        assert g.n_boiler == 5 - exp_content
        assert g.content_chars == (n_chars if n_chars >= 20 else 0) + (
            15 + 4 * m if m >= 2 else 0
        )


def test_content_extraction_reassembly_order(spark):
    from vmware_graph_spark.queries_ext26 import content_extraction_pipeline

    got = {
        r.doc_id: r for r in content_extraction_pipeline(spark, SF_SMALL).collect()
    }
    con = duckdb.connect()
    ref = con.execute(
        f"SELECT doc_id, text FROM '{SF_SMALL}/documents.parquet'"
    ).fetchall()
    assert len(got) == len(ref)
    import hashlib

    for doc_id, text in ref:
        m = doc_id % 9
        content = text
        if m >= 2:
            content += f" See reference {doc_id % 10}" + " pad" * m
        g = got[doc_id]
        assert g.content_md5 == hashlib.md5(content.encode()).hexdigest(), doc_id
        assert g.content_tokens == len(content.split())


def test_sniff_media_type_magic_bytes(spark):
    from vmware_graph_spark.operators.multimodal import sniff_media_type

    rows = [
        (1, bytes.fromhex("474946383761") + b"xx", "image/gif"),
        (2, bytes.fromhex("474946383961") + b"xx", "image/gif"),
        (3, bytes.fromhex("89504E470D0A1A0A") + b"xx", "image/png"),
        (4, bytes.fromhex("FFD8FFE0") + b"xx", "image/jpeg"),
        (5, b"RIFF" + b"\x10\x00\x00\x00" + b"WAVE" + b"xx", "audio/x-wav"),
        (6, b"RIFF" + b"\x10\x00\x00\x00" + b"AVI " + b"xx",
         "application/octet-stream"),  # RIFF but not WAVE
        (7, b"hello world", "application/octet-stream"),
        (8, b"GIF", "application/octet-stream"),  # truncated magic
    ]
    df = spark.createDataFrame(
        [(i, m) for i, m, _ in rows], "id long, media binary"
    )
    got = {r.id: r.mime for r in df.select(
        "id", sniff_media_type("media").alias("mime")).collect()}
    for i, _, want in rows:
        assert got[i] == want, (i, got[i], want)


def test_idn_host_flags(spark):
    from vmware_graph_spark.functions.url import (
        host_has_punycode,
        host_mixed_script,
    )

    rows = [
        (1, "www.example.com", False, False),
        (2, "xn--mnchen-3ya.example.com", True, False),
        (3, "sаle.example.com", False, True),    # Cyrillic а among Latin
        (4, "магазин.example.com", False, False),
        # ^ pure-Cyrillic LABEL under an ASCII TLD: a legitimate IDN,
        #   must NOT flag (the mix check is per-label, not whole-host)
        (5, "teXN--am.example.com", False, False),    # xn-- not at label start
        (6, "XN--test.example.com", True, False),     # case-insensitive ACE
    ]
    df = spark.createDataFrame(
        [(i, h) for i, h, _, _ in rows], "id long, host string"
    )
    got = {
        r.id: (r.p, r.m)
        for r in df.select(
            "id",
            host_has_punycode("host").alias("p"),
            host_mixed_script("host").alias("m"),
        ).collect()
    }
    for i, _, p, m in rows:
        assert got[i] == (p, m), (i, got[i], (p, m))


def test_anchor_text_chars_property_vs_htmlparser(spark):
    """anchor_text_chars vs an html.parser reference over generated
    anchors: quote styles, attribute order, multiple anchors per
    fragment, tag-name lookalikes, and markup-free inner text."""
    import random
    from html.parser import HTMLParser

    from vmware_graph_spark.functions.text import anchor_text_chars

    rng = random.Random(11)
    texts = ["go", "read the docs", "a b c", "x", "click here now"]
    lookalikes = ["<abbr title=q>zz</abbr>", "<article>w w</article>", ""]

    def anchor(i):
        attrs = [f'href="/p/{i}"']
        if rng.random() < 0.5:
            q = rng.choice(['"', "'"])
            attrs.append(f"rel={q}nofollow{q}")
        rng.shuffle(attrs)
        text = rng.choice(texts)
        return f"<a {' '.join(attrs)}>{text}</a>", len(text)

    frags = []
    expect = {}
    for i in range(100):
        parts, total = [], 0
        for k in range(rng.randint(1, 4)):
            a, n = anchor(i * 10 + k)
            parts.append(a)
            parts.append(rng.choice(lookalikes))
            total += n
        frags.append((i, "".join(parts)))
        expect[i] = total

    class AnchorChars(HTMLParser):
        def __init__(self):
            super().__init__()
            self.depth = 0
            self.n = 0

        def handle_starttag(self, tag, attrs):
            if tag == "a":
                self.depth += 1

        def handle_endtag(self, tag):
            if tag == "a" and self.depth:
                self.depth -= 1

        def handle_data(self, data):
            if self.depth:
                self.n += len(data)

    df = spark.createDataFrame(frags, "i int, frag string")
    got = {
        r.i: r.n
        for r in df.select("i", anchor_text_chars("frag").alias("n")).collect()
    }
    for i, frag in frags:
        ref = AnchorChars()
        ref.feed(frag)
        assert got[i] == ref.n == expect[i], (i, frag, got[i], ref.n)


def test_streaming_content_extract_matches_arithmetic(spark):
    from vmware_graph_spark.queries_ext26 import streaming_content_extract

    got = {
        r.host: r for r in streaming_content_extract(spark, SF_SMALL).collect()
    }
    con = duckdb.connect()
    ref = con.execute(
        "SELECT 'www.site' || (doc_id % 5) || '.example.com' AS host, "
        "count(*) AS n, "
        "sum(n_chars + 18 + 2 * length(CAST(doc_id AS VARCHAR))) AS chars "
        f"FROM '{SF_SMALL}/documents.parquet' "
        "WHERE doc_id % 53 <> 0 GROUP BY host"
    ).fetchall()
    assert len(got) == len(ref)
    for host, n, chars in ref:
        g = got[host]
        # the fleet template has exactly 3 non-empty blocks per page:
        # head+h1 run (content), prose (content), tail div (boiler)
        assert (g.n_pages, g.content_blocks, g.boiler_blocks, g.content_chars) == (
            n, 2 * n, n, chars
        )


def test_authority_weighted_budget_conserves_and_weights(spark):
    from vmware_graph_spark.queries_ext26 import (
        authority_weighted_budget,
        host_authority_pagerank,
    )

    rows = authority_weighted_budget(spark, SF_SMALL).collect()
    ranks = {
        r.host: r.rank_micros
        for r in host_authority_pagerank(spark, SF_SMALL).collect()
    }
    assert len(rows) == len(ranks)
    assert sum(r.alloc for r in rows) == 1000  # Hamilton conserves slots
    for r in rows:
        assert r.weight == ranks[r.host]  # rank IS the weight, unscaled
        # largest-remainder never strays more than 1 from the quota
        quota = 1000 * r.weight / sum(ranks.values())
        assert abs(r.alloc - quota) < 1.0 + 1e-9


def test_mojibake_cp1252_class(spark):
    """The dominant real-world mojibake — UTF-8 curly punctuation
    decoded as cp1252 — must flag as double_utf8 (review finding)."""
    from vmware_graph_spark.functions.text import has_double_utf8

    df = spark.createDataFrame(
        [
            (1, "donâ€™t stop", True),      # U+2019 as cp1252
            (2, "dashâ€”here", True),       # U+2014 as cp1252
            (3, "cafÃ© latin1", True),      # 2-byte latin-1 arm still fires
            (4, "plain ascii", False),
            (5, "genuine émigré prose", False),  # real accents alone: clean
        ],
        "id long, text string, want boolean",
    )
    for r in df.select("want", has_double_utf8("text").alias("got")).collect():
        assert r.got == r.want


def test_html_blocks_strips_script_closer_first(spark):
    """A block-break tag INSIDE a script/comment must not truncate the
    construct and leak its payload into visible text (review finding)."""
    from pyspark.sql import functions as F_

    from vmware_graph_spark.functions.text import html_blocks, html_to_text

    html = (
        '<div><script>document.write("</div>")</script>Real prose here.</div>'
        "<!-- trailing </p> comment --><p>Second block.</p>"
    )
    df = spark.createDataFrame([(html,)], "html string")
    texts = [
        r.t
        for r in df.select(
            F_.explode(html_blocks("html")).alias("frag")
        ).select(html_to_text("frag").alias("t")).collect()
        if r.t
    ]
    assert texts == ["Real prose here.", "Second block."]
    assert not any("document.write" in t for t in texts)


def test_anchor_chars_normalized_like_denominator(spark):
    """Anchor inner text counts VISIBLE chars: nested tags stripped,
    entities decoded, whitespace collapsed (review finding)."""
    from vmware_graph_spark.functions.text import anchor_text_chars

    df = spark.createDataFrame(
        [
            ("<a href=x>Q&amp;A</a>", 3),                 # entity decodes
            ("<a href=x><strong>hi</strong></a>", 2),     # nested tag strips
            ("<a href=x>the\n   annual\n   report</a>", 17),  # ws collapses
        ],
        "frag string, want int",
    )
    for r in df.select("want", anchor_text_chars("frag").alias("got")).collect():
        assert r.got == r.want


def test_html_blocks_semantic_closers(spark):
    """<nav>/<ul>-style boilerplate must split into its own block, not
    dilute into adjacent prose (review finding)."""
    from pyspark.sql import functions as F_

    from vmware_graph_spark.functions.text import (
        anchor_text_chars,
        classify_block,
        html_blocks,
        html_to_text,
    )

    html = (
        '<nav><a href="/">Home</a> <a href="/a">About</a></nav>'
        "<p>Two hundred imaginary characters of perfectly ordinary prose "
        "carrying the actual content of this page onward.</p>"
    )
    df = spark.createDataFrame([(html,)], "html string")
    rows = (
        df.select(F_.explode(html_blocks("html")).alias("frag"))
        .select(
            html_to_text("frag").alias("t"),
            anchor_text_chars("frag").alias("a"),
        )
        .filter(F_.length("t") > 0)
        .withColumn("cls", classify_block(F_.length("t"), F_.col("a")))
        .collect()
    )
    assert [r.cls for r in rows] == ["boilerplate", "content"]
    assert rows[0].t == "Home About"
