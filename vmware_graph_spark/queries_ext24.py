"""Round-11: the crawl loop COMPOSED end to end, the rest of the
RFC 9309 lifecycle, and the decoders the stdlib can genuinely own.

Round 10 built the crawl pieces — sitemap seeding, the RFC 9309 robots
gate, the persisted crawled-URL index, politeness waves, Hamilton
budget apportionment. This module (a) runs them as ONE lineage
(``crawl_loop_pipeline``, round-10 VERDICT #7): seed → parse robots →
gate → frontier delta against the persisted index → per-host wave
schedule → integer budget split — the dispatch plan a polite crawler
would hand its fetchers, with the oracle deriving every number from
doc_id arithmetic alone (the ``crawl_prep_pipeline`` composition
discipline: a bug in ANY stage breaks different rows of the same
hash); (b) completes the robots lifecycle — §2.3.1 access results
(``robots_availability_gate``), §2.4 caching
(``robots_cache_refresh_due``), ``Sitemap:`` seed discovery
(``robots_sitemap_discovery``); (c) adds the crawl-ops tables around
it — path-axis trap detection (``crawl_trap_detection``),
host reputation (``host_reputation_rollup``), sitemap-prior recrawl
(``recrawl_priority_sitemap_prior``); and (d) pins the round's REAL
stdlib decoders end to end — GIF/LZW (``multimodal_decode_gif_stats``)
and G.711 µ-law WAV (``audio_ulaw_rms_windows``) — through the
production Arrow paths with pure-arithmetic oracles.
"""

from __future__ import annotations

import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from vmware_graph_spark.queries import query
from vmware_graph_spark.sources.tables import load_table
from vmware_graph_spark.tmpcache import cache_dir, data_key


@query(
    "robots_sitemap_discovery",
    """
    WITH k AS (SELECT DISTINCT (doc_id % 5) AS k FROM documents),
    n AS (SELECT k.k, t.i FROM k, range(0, 5) t(i) WHERE t.i <= k.k)
    SELECT 'www.site' || k || '.example.com' AS host,
           'http://www.site' || k || '.example.com/sitemap_' || i
             || '.xml.gz' AS sitemap_url,
           CAST(i AS INTEGER) AS sitemap_idx
    FROM n
    UNION ALL
    SELECT 'www.site' || k || '.example.com' AS host,
           'HTTPS://www.site' || k || '.example.com/extra.xml'
             AS sitemap_url,
           CAST(k + 1 AS INTEGER) AS sitemap_idx
    FROM k
    """,
)
def robots_sitemap_discovery(spark, sf_dir):
    """The crawl loop's OTHER seed channel: hosts advertise their
    sitemaps in robots.txt ``Sitemap:`` lines (sitemaps.org — the
    field is User-agent-INDEPENDENT and may appear anywhere, which is
    exactly why RFC 9309 grouping treats it as transparent). Host k's
    body carries k+1 numbered sitemap URLs, a DUPLICATE of the first
    (deduped, order preserved), a protocol-invalid relative value
    (dropped — guessing a base would fetch attacker-chosen paths), a
    lowercase ``sitemap:`` field with an UPPERCASE scheme (field names
    case-insensitive, value verbatim) and a trailing comment, all
    interleaved with User-agent/Disallow noise the parser must see
    through. Bodies are BUILT IN CATALYST from the distinct host
    classes (sequence/transform/array_join) and parsed executor-side
    (``robots_sitemap_sources``); the oracle regenerates every
    (host, url, idx) row from arithmetic."""
    from vmware_graph_spark.operators.crawl import robots_sitemap_sources

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    ks = d.select((F.col("doc_id") % 5).alias("k")).distinct()
    kstr = F.col("k").cast("string")
    site = F.concat(F.lit("www.site"), kstr, F.lit(".example.com"))
    lines = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.col("k")),
            lambda i: F.concat(
                F.lit("Sitemap: http://"), site, F.lit("/sitemap_"),
                i.cast("string"), F.lit(".xml.gz\n"),
            ),
        ),
        "",
    )
    body = F.concat(
        F.lit("# discovered seeds\nUser-agent: examplebot\nDisallow: /private/\n"),
        lines,
        F.lit("Sitemap: http://"), site, F.lit("/sitemap_0.xml.gz\n"),
        F.lit("Sitemap: /relative/sitemap.xml\n"),
        F.lit("sitemap: HTTPS://"), site, F.lit("/extra.xml   # advertised\n"),
    )
    robots = ks.select(site.alias("host"), body.alias("robots_txt"))
    return robots_sitemap_sources(robots).select(
        "host", "sitemap_url", F.col("sitemap_idx").cast("int").alias("sitemap_idx")
    )


@query(
    "robots_availability_gate",
    """
    SELECT doc_id,
           'www.site' || (doc_id % 5) || '.example.com' AS host,
           CASE doc_id % 5 WHEN 0 THEN 'use_rules'
                WHEN 1 THEN 'allow_all' ELSE 'disallow_all' END AS policy,
           CAST(CASE WHEN doc_id % 5 = 1
                       OR (doc_id % 5 = 0 AND doc_id % 10 = 0)
                     THEN 1 ELSE 0 END AS INTEGER) AS fetch_allowed
    FROM documents
    """,
)
def robots_availability_gate(spark, sf_dir):
    """RFC 9309 §2.3.1 access-result policy composed with the rules
    gate: per host, the robots.txt FETCH outcome decides the gate
    mode — host0 200 (parse + rules: Disallow /a/ with an
    ``Allow: /a/*0$`` carve-out, so allowed ⇔ last digit 0), host1
    404 (unavailable → allow all, the RFC's explicit rule), host2 503
    and host3 network-unreachable (NULL status) → complete disallow,
    host4 an UNRESOLVED 301 (the fetch layer should have followed it;
    seen here it means the chain didn't resolve → unreachable →
    disallow). The oracle derives every verdict from doc_id
    arithmetic; a policy-arm or composition slip flips different
    hosts."""
    from vmware_graph_spark.operators.crawl import (
        parse_robots,
        robots_access_policy,
        robots_filter,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    k = (F.col("doc_id") % 5).cast("string")
    urls = d.select(
        "doc_id",
        F.concat(F.lit("www.site"), k, F.lit(".example.com")).alias("host"),
        F.concat(F.lit("/a/"), F.col("doc_id").cast("string")).alias("path"),
    )
    statuses = spark.createDataFrame(
        [
            ("www.site0.example.com", 200),
            ("www.site1.example.com", 404),
            ("www.site2.example.com", 503),
            ("www.site3.example.com", None),
            ("www.site4.example.com", 301),
        ],
        "host string, status int",
    ).select("host", robots_access_policy(F.col("status")).alias("policy"))
    robots = spark.createDataFrame(
        [
            (
                "www.site0.example.com",
                "User-agent: examplebot\nDisallow: /a/\nAllow: /a/*0$\n",
            )
        ],
        "host string, robots_txt string",
    )
    rules = parse_robots(robots, "examplebot")
    gated = robots_filter(urls, rules)
    out = gated.join(F.broadcast(statuses), "host", "left")
    verdict = (
        F.when(F.col("policy") == "allow_all", F.lit(True))
        .when(F.col("policy") == "disallow_all", F.lit(False))
        .otherwise(F.col("fetch_allowed"))
    )
    return out.select(
        "doc_id",
        "host",
        "policy",
        verdict.cast("int").alias("fetch_allowed"),
    )


@query(
    "robots_cache_refresh_due",
    """
    SELECT doc_id,
           CAST(CASE doc_id % 4
                  WHEN 1 THEN 3600 WHEN 2 THEN 0 ELSE 86400
                END AS BIGINT) AS max_age_s,
           CAST(greatest(0, 86400 - (doc_id % 48) * 3600) AS BIGINT)
             AS age_s,
           CAST(CASE WHEN greatest(0, 86400 - (doc_id % 48) * 3600)
                       >= CASE doc_id % 4
                            WHEN 1 THEN 3600 WHEN 2 THEN 0 ELSE 86400
                          END
                     THEN 1 ELSE 0 END AS INTEGER) AS refetch_due
    FROM documents
    """,
)
def robots_cache_refresh_due(spark, sf_dir):
    """RFC 9309 §2.4 robots caching (``robots_cache_policy`` — with
    this, the robots family covers the full lifecycle: §2.1-2.2
    parsing + group selection, §2.2.3 wildcards, §2.3.1 access
    results, §2.4 caching): per host, is the cached robots.txt still
    usable? Fetch times fan out hourly across two days (so ages span
    0-24h and clock-skewed FUTURE fetches clamp to 0), and the
    Cache-Control arms cover the absent-header 24h default, an
    explicit max-age=3600, a ``no-cache`` (always refetch), and a
    malformed ``max-age=oops`` falling back to the default. The oracle
    recomputes age/max-age/verdict from doc_id arithmetic."""
    from vmware_graph_spark.operators.crawl import robots_cache_policy

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    fetched = F.to_timestamp(F.lit("2026-08-15 00:00:00")) + F.make_dt_interval(
        F.lit(0), (F.col("doc_id") % 48).cast("int")
    )
    cc = (
        F.when(F.col("doc_id") % 4 == 1, F.lit("public, max-age=3600"))
        .when(F.col("doc_id") % 4 == 2, F.lit("no-cache"))
        .when(F.col("doc_id") % 4 == 3, F.lit("private, max-age=oops"))
        .otherwise(F.lit(None).cast("string"))
    )
    pol = robots_cache_policy(
        fetched, F.to_timestamp(F.lit("2026-08-16 00:00:00")), cc
    )
    return d.select(
        "doc_id",
        pol["max_age_s"].alias("max_age_s"),
        pol["age_s"].alias("age_s"),
        pol["refetch_due"].cast("int").alias("refetch_due"),
    )


@query(
    "crawl_trap_detection",
    """
    WITH d AS (SELECT count(DISTINCT doc_id) AS nd,
                      count(DISTINCT doc_id % 3) AS n3,
                      count(DISTINCT doc_id % 5) AS n5
               FROM documents)
    SELECT 'www.trap.example.com/cal/N/N' AS template,
           CAST(nd AS BIGINT) AS n_urls,
           CAST(n3 AS BIGINT) AS n_fps,
           CAST(CASE WHEN nd >= 100 AND n3 <= CEIL(nd * 0.1)
                     THEN 1 ELSE 0 END AS INTEGER) AS is_trap
    FROM d
    UNION ALL
    SELECT 'www.site.example.com/art/N',
           CAST(nd AS BIGINT), CAST(nd AS BIGINT),
           CAST(CASE WHEN nd >= 100 AND nd <= CEIL(nd * 0.1)
                     THEN 1 ELSE 0 END AS INTEGER)
    FROM d
    UNION ALL
    SELECT 'www.site.example.com/tiny/N',
           CAST(n5 AS BIGINT), CAST(1 AS BIGINT),
           CAST(CASE WHEN n5 >= 100 AND 1 <= CEIL(n5 * 0.1)
                     THEN 1 ELSE 0 END AS INTEGER)
    FROM d
    """,
)
def crawl_trap_detection(spark, sf_dir):
    """Crawler-trap detection on the PATH axis (``detect_crawl_traps``
    — the companion of ``url_param_mining``'s query-string axis):
    three synthesized URL families — an infinite-calendar trap
    (every document a distinct ``/cal/<year>/<id>`` spelling over just
    3 distinct contents), a healthy archive (distinct content per
    URL), and a tiny family below the evidence floor. Templates
    collapse digit runs to ``N``; a family is a trap when ≥100 URLs
    share ≤10% as many fingerprints. The oracle recomputes every
    count and the conviction from doc_id arithmetic."""
    from vmware_graph_spark.operators.crawl import detect_crawl_traps

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id").cast("string")
    trap = d.select(
        F.concat(
            F.lit("http://www.trap.example.com/cal/"),
            (F.lit(2000) + F.col("doc_id") % 50).cast("string"),
            F.lit("/"), i,
        ).alias("url"),
        F.concat(F.lit("shared"), (F.col("doc_id") % 3).cast("string")).alias("fp"),
    )
    art = d.select(
        F.concat(F.lit("http://www.site.example.com/art/"), i).alias("url"),
        F.md5(i).alias("fp"),
    )
    tiny = d.select(
        F.concat(
            F.lit("http://www.site.example.com/tiny/"),
            (F.col("doc_id") % 5).cast("string"),
        ).alias("url"),
        F.lit("t").alias("fp"),
    )
    pages = trap.unionAll(art).unionAll(tiny)
    return detect_crawl_traps(pages, min_urls=100, max_content_ratio=0.1)


@query(
    "host_reputation_rollup",
    """
    WITH d AS (SELECT doc_id, doc_id % 5 AS k FROM documents),
    a AS (
      SELECT k, CAST(count(*) AS BIGINT) AS n_pages,
             CAST(CASE WHEN k = 0 THEN count(DISTINCT doc_id % 7)
                       ELSE count(DISTINCT doc_id) END AS BIGINT)
               AS n_distinct_fp,
             CAST(sum(CASE WHEN k = 1 AND doc_id % 2 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_blocked
      FROM d GROUP BY k
    )
    SELECT 'www.site' || k || '.example.com' AS host,
           n_pages, n_distinct_fp,
           round(1 - n_distinct_fp / CAST(n_pages AS DOUBLE), 6) AS dup_rate,
           round(n_blocked / CAST(n_pages AS DOUBLE), 6) AS blocked_rate,
           round((n_distinct_fp / CAST(n_pages AS DOUBLE))
                 * (1 - n_blocked / CAST(n_pages AS DOUBLE)), 6) AS score
    FROM a
    """,
)
def host_reputation_rollup(spark, sf_dir):
    """Host-reputation scoring — the crawl-ops table that decides
    which hosts deserve future budget (feeds ``apportion_budget`` as
    weights): per host, the duplicate rate of its content fingerprints
    and the robots-blocked share of its URLs, combined into
    ``score = unique_share × allowed_share``. Fixture arms: host0 is
    a content farm (every page one of 7 fingerprints → dup-heavy),
    host1 robots-blocks its even-numbered pages (``Disallow: /a/``
    with odd-digit ``Allow: /a/*d$`` carve-outs — the verdict comes
    from the REAL gate, not fixture arithmetic), hosts 2-4 are
    healthy. One groupBy(host) over the gated pages; the robots side
    is the usual broadcast. The oracle recomputes counts, rates and
    the score from doc_id arithmetic."""
    from vmware_graph_spark.operators.crawl import robots_filter

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    k = F.col("doc_id") % 5
    pages = d.select(
        "doc_id",
        F.concat(F.lit("www.site"), k.cast("string"), F.lit(".example.com")).alias(
            "host"
        ),
        F.concat(F.lit("/a/"), F.col("doc_id").cast("string")).alias("path"),
        F.when(k == 0, F.md5((F.col("doc_id") % 7).cast("string")))
        .otherwise(F.md5(F.col("doc_id").cast("string")))
        .alias("fp"),
    )
    rules = spark.createDataFrame(
        [("www.site1.example.com", "/a/", False)]
        + [("www.site1.example.com", f"/a/*{dig}$", True) for dig in (1, 3, 5, 7, 9)],
        "host string, path_prefix string, allow boolean",
    )
    gated = robots_filter(pages, rules)
    agg = gated.groupBy("host").agg(
        F.count("*").cast("bigint").alias("n_pages"),
        F.countDistinct("fp").cast("bigint").alias("n_distinct_fp"),
        F.sum((~F.col("fetch_allowed")).cast("int")).cast("bigint").alias("__blk"),
    )
    uniq = F.col("n_distinct_fp") / F.col("n_pages")
    blk = F.col("__blk") / F.col("n_pages")
    return agg.select(
        "host",
        "n_pages",
        "n_distinct_fp",
        F.round(1 - uniq, 6).alias("dup_rate"),
        F.round(blk, 6).alias("blocked_rate"),
        F.round(uniq * (1 - blk), 6).alias("score"),
    )


@query(
    "multimodal_decode_gif_stats",
    """
    WITH d AS (
      SELECT doc_id, n_chars AS nc, 2 + doc_id % 3 AS w, 2 + doc_id % 2 AS h
      FROM documents
    ),
    px AS (
      SELECT doc_id, w, h, nc, unnest(range(w * h)) AS p FROM d
    ),
    m AS (
      SELECT doc_id, w, h,
             avg((nc + (p % 4) * 40) % 256) AS mr,
             avg((nc + (p % 4) * 40 + 85) % 256) AS mg,
             avg((nc + (p % 4) * 40 + 170) % 256) AS mb
      FROM px GROUP BY doc_id, w, h
    )
    SELECT doc_id AS asset_id, CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           round(mr, 6) AS mean_r, round(mg, 6) AS mean_g,
           round(mb, 6) AS mean_b
    FROM m
    """,
)
def multimodal_decode_gif_stats(spark, sf_dir):
    """REAL GIF decode, end to end (round-11: GIF needs no codec
    library — its LZW is ~60 lines of stdlib, so one more injection
    gate becomes a real decoder, the ``multimodal_decode_ppm_stats``
    move): deterministic GIF89a images are synthesized per document
    (dims from doc_id, a 4-color palette ramped from n_chars, pixel
    indices cycling the palette, plus a graphic-control extension the
    parser must skip), LZW-encoded with the protocol's clear-code
    resets, then decoded back through the production Arrow
    ``mapInPandas`` path — header, color table, extension skipping and
    LZW all exercised. The oracle recomputes width/height/channel
    means from the SOURCE arithmetic. (The builder's naive
    clear-per-symbol encoding is deliberately independent of the
    decoder; proper compressed streams incl. 12-bit table growth are
    covered by the LZW roundtrip property test.)"""
    import pandas as pd_

    from vmware_graph_spark.operators.multimodal import as_media, decode_images

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")

    def build(batches):
        import struct

        def gif(w, h, nc):
            pal = b"".join(
                bytes((
                    (nc + j * 40) % 256,
                    (nc + j * 40 + 85) % 256,
                    (nc + j * 40 + 170) % 256,
                ))
                for j in range(4)
            )
            head = b"GIF89a" + struct.pack("<HHBBB", w, h, 0x81, 0, 0)
            gce = b"!\xf9\x04\x00\x00\x00\x00\x00"
            img = b"," + struct.pack("<HHHHB", 0, 0, w, h, 0)
            # naive valid LZW: CLEAR before every literal keeps the
            # table empty and the code width constant at 3 bits
            bits = []
            def emit(code):
                for k in range(3):
                    bits.append((code >> k) & 1)
            for p in range(w * h):
                emit(4)           # clear
                emit(p % 4)       # literal palette index
            emit(5)               # EOI
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
            return head + pal + gce + img + b"\x02" + blocks + b"\x00;"

        for pdf in batches:
            medias = [
                gif(2 + int(did) % 3, 2 + int(did) % 2, int(nc))
                for did, nc in zip(pdf["doc_id"], pdf["n_chars"])
            ]
            yield pd_.DataFrame({"asset_id": pdf["doc_id"], "media": medias})

    assets = as_media(
        d.mapInPandas(build, "asset_id bigint, media binary"),
        "asset_id",
        "media",
        "image/gif",
    )
    out = decode_images(assets)
    return out.select(
        "asset_id",
        "width",
        "height",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
    )


@query(
    "focused_crawl_priority",
    """
    WITH l AS (
      SELECT doc_id,
             'http://www.site' || ((doc_id % 50) % 5) || '.example.com/b/'
               || (doc_id % 50) AS target,
             CASE WHEN doc_id % 4 IN (0, 1)
                  THEN 1.0 / 3 ELSE 0.0 END AS frac
      FROM documents
    )
    SELECT target,
           CAST(count(*) AS BIGINT) AS n_inlinks,
           round(avg(frac), 6) AS topic_score
    FROM l GROUP BY target
    """,
)
def focused_crawl_priority(spark, sf_dir):
    """FOCUSED crawling's frontier prioritization (the classic
    anchor-text relevance signal: the web describes a page by how
    others link to it, so a topical crawler scores candidate URLs by
    their in-link anchor text BEFORE fetching them): pages carry one
    anchor each whose visible text mentions ``topic<q>`` for
    q = doc_id%4 — the topic lexicon covers topics 0-1 only, so each
    anchor's term-match fraction is 1/3 or 0 — and every target
    aggregates its in-links' fractions into a priority score. The
    composition is the real pipeline: ``extract_links`` (hijack-safe
    pairs) → ``resolve_href`` → ``url_canonical`` → token split → a
    constant-folded lexicon membership (the gazetteer move, no join)
    → one groupBy(target). The oracle derives n_inlinks and the score
    from doc_id arithmetic alone."""
    from vmware_graph_spark.functions.url import (
        extract_links,
        resolve_href,
        url_canonical,
        url_host,
        url_scheme,
    )

    lexicon = ["topic0", "topic1"]

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    m = (F.col("doc_id") % 50).cast("string")
    km = ((F.col("doc_id") % 50) % 5).cast("string")
    q = (F.col("doc_id") % 4).cast("string")
    page_url = F.concat(
        F.lit("http://www.site"), (F.col("doc_id") % 5).cast("string"),
        F.lit(".example.com/a/"), F.col("doc_id").cast("string"),
    )
    body = F.concat(
        F.lit('<html><body><a href="http://www.site'), km,
        F.lit(".example.com/b/"), m,
        F.lit('" rel="x">topic'), q, F.lit(" filler word</a>"),
        F.lit('<a href="#skip">nav</a></body></html>'),
    )
    pages = d.select(page_url.alias("url"), body.alias("html"))
    links = pages.select(
        url_scheme("url").alias("s"),
        url_host("url").alias("h"),
        F.explode(extract_links("html")).alias("l"),
    )
    resolved = links.select(
        resolve_href(F.col("s"), F.col("h"), F.col("l.href")).alias("r"),
        F.split(F.lower(F.col("l.text")), r"\s+").alias("toks"),
    ).filter(F.col("r").isNotNull())
    frac = F.size(
        F.filter(F.col("toks"), lambda t: t.isin(*lexicon))
    ) / F.greatest(F.size("toks"), F.lit(1))
    scored = resolved.select(
        url_canonical("r").alias("target"), frac.alias("frac")
    )
    return scored.groupBy("target").agg(
        F.count("*").cast("bigint").alias("n_inlinks"),
        F.round(F.avg("frac"), 6).alias("topic_score"),
    )


@query(
    "audio_ulaw_rms_windows",
    """
    WITH d AS (SELECT doc_id, 64 + doc_id % 32 AS n FROM documents
               WHERE doc_id % 10 = 5),
    starts AS (SELECT doc_id, n, unnest(range(0, n, 16)) AS start FROM d),
    s AS (SELECT doc_id, n, unnest(range(n)) AS i FROM d),
    v AS (
      SELECT doc_id, i,
             255 - ((doc_id * 37 + i * 11) % 256) AS u2
      FROM s
    ),
    x AS (
      SELECT doc_id, i,
             ((u2 % 16) * 8 + 132)
               * CASE (u2 // 16) % 8
                   WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4 WHEN 3 THEN 8
                   WHEN 4 THEN 16 WHEN 5 THEN 32 WHEN 6 THEN 64 ELSE 128
                 END - 132 AS mag,
             u2 >= 128 AS neg
      FROM v
    ),
    smp AS (
      SELECT doc_id, i, CASE WHEN neg THEN -mag ELSE mag END AS s FROM x
    ),
    w AS (
      SELECT st.doc_id, st.start, CAST(count(*) AS BIGINT) AS n_smp,
             sqrt(CAST(sum(smp.s * smp.s) AS DOUBLE) / count(*)) AS rms
      FROM starts st JOIN smp
        ON smp.doc_id = st.doc_id AND smp.i >= st.start
       AND smp.i < st.start + 32
      GROUP BY st.doc_id, st.start
    )
    SELECT doc_id AS asset_id, CAST(start // 16 AS INTEGER) AS win_idx,
           CAST(start AS BIGINT) AS start, n_smp AS n, round(rms, 6) AS rms
    FROM w
    """,
)
def audio_ulaw_rms_windows(spark, sf_dir):
    """REAL G.711 µ-law decode, end to end (round-11: µ-law's
    'decompression' is the spec's bias-0x84 expansion formula — no
    codec library, so the telephony WAV variant joins PCM as a real
    stdlib decode): deterministic format-7 WAVs are synthesized per
    sampled document (µ-law byte ramp seeded by doc_id), decoded
    through the manual RIFF chunk walk + expansion, and folded to the
    same overlapping RMS windows as the PCM twin — while the oracle
    re-derives every int16 sample FROM THE EXPANSION FORMULA in pure
    integer SQL and recomputes each window's RMS, so a chunk-walk,
    sign, exponent-shift or bias slip breaks the hash. The expansion
    itself is additionally pinned against Python's independent
    ``audioop.ulaw2lin`` over all 256 byte values in pytest."""
    import struct as struct_

    import pandas as pd_

    from vmware_graph_spark.operators.multimodal import as_media, audio_rms_windows

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 5)
        .select("doc_id")
    )

    def build(batches):
        def wav_ulaw(payload: bytes) -> bytes:
            fmt = struct_.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 8)
            body = (
                b"WAVE"
                + b"fmt " + struct_.pack("<I", len(fmt)) + fmt
                + b"data" + struct_.pack("<I", len(payload)) + payload
                + (b"\x00" if len(payload) % 2 else b"")
            )
            return b"RIFF" + struct_.pack("<I", len(body)) + body

        for pdf in batches:
            medias = []
            for did in pdf["doc_id"]:
                n = 64 + did % 32
                payload = bytes((did * 37 + i * 11) % 256 for i in range(n))
                medias.append(wav_ulaw(payload))
            yield pd_.DataFrame({"asset_id": pdf["doc_id"], "media": medias})

    assets = as_media(
        d.mapInPandas(build, "asset_id bigint, media binary"),
        "asset_id",
        "media",
        "audio/wav",
    )
    out = audio_rms_windows(assets, window=32, hop=16)
    return out.select(
        "asset_id", "win_idx", "start", "n", F.round("rms", 6).alias("rms")
    )


def _crawled_index_dir(spark, sf_dir: str) -> str:
    """Persist the 'already crawled' canonical-URL set once per
    (dataset, mtime): every 4th document's URL — the loop's day-2
    state, written through the production marker-stamped index
    writer."""
    from vmware_graph_spark.operators.crawl import (
        crawl_index_current,
        write_crawled_urls,
    )

    idx = os.path.join(
        cache_dir("crawl_loop_index", data_key(sf_dir, "documents")), "index"
    )
    if not crawl_index_current(idx):  # absent, half-built, or keyed
        # under an older url_canonical version — rebuild either way
        d = load_table(spark, sf_dir, "documents").select("doc_id")
        crawled = d.filter(F.col("doc_id") % 4 == 0).select(
            F.concat(
                F.lit("http://www.site"),
                (F.col("doc_id") % 5).cast("string"),
                F.lit(".example.com/a/"),
                F.col("doc_id").cast("string"),
            ).alias("canon")
        )
        write_crawled_urls(crawled, idx)
    return idx


@query(
    "crawl_loop_pipeline",
    """
    WITH e AS (
      SELECT doc_id,
             'www.site' || (doc_id % 5) || '.example.com' AS host,
             (doc_id % 5) AS k
      FROM documents
      WHERE doc_id % 10 <= 4      -- robots: Allow /a/*<k>$ out-scores
                                  -- Disallow /a/ iff last digit = k
        AND doc_id % 4 <> 0       -- frontier: already-crawled dropped
    ),
    agg AS (
      SELECT host, k, CAST(count(*) AS BIGINT) AS n_eligible
      FROM e GROUP BY host, k
    ),
    wd AS (
      -- Crawl-delay 1/2/4/invalid/8 -> wave width max(1, floor(8/d))
      SELECT host, n_eligible,
             CAST(CASE k WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 2
                         WHEN 3 THEN 8 ELSE 1 END AS BIGINT) AS width
      FROM agg
    ),
    tot AS (SELECT sum(n_eligible) AS w FROM wd),
    base AS (
      SELECT host, n_eligible, width,
             (1000 * n_eligible) // w AS b,
             (1000 * n_eligible) % w AS rem
      FROM wd, tot
    ),
    rk AS (
      SELECT *,
             row_number() OVER (ORDER BY rem DESC, host) AS r,
             (SELECT 1000 - sum(b) FROM base) AS leftover
      FROM base
    )
    SELECT host, n_eligible, width,
           CAST(CEIL(CAST(n_eligible AS DOUBLE) / width) AS BIGINT)
             AS n_waves,
           CAST(b + CASE WHEN r <= leftover THEN 1 ELSE 0 END AS BIGINT)
             AS alloc
    FROM rk
    """,
)
def crawl_loop_pipeline(spark, sf_dir):
    """The composed crawl loop, one lineage: (1) SEED from the sitemap
    fleet (production gz reader over the shared fixture); (2) parse
    each host's robots.txt executor-side — the RULE gate (host k
    disallows /a/ but allows ``/a/*<k>$`` — a URL survives iff its
    last digit equals its host digit, i.e. doc_id%10 ≤ 4) AND the
    Crawl-delay (``parse_robots_delays`` over the SAME bodies — round-11
    VERDICT #3: the composition used a fixed 8-slot width while the
    delay-driven width lived only in the standalone query); (3) the
    FRONTIER DELTA against the persisted crawled-URL index (every 4th
    document is already-crawled state, probed via
    ``frontier_against_crawled``); (4) POLITENESS WAVES — per-host rank
    through ``exact_global_rank(partition_cols=['host'])`` (the
    range-bucketed skew escape, composed UNCONDITIONALLY: it computes
    the identical rank, so a 99%-one-host frontier no longer
    single-tasks the flagship loop — round-11 VERDICT #3), wave width
    ``max(1, floor(8/delay))`` (delays 1/2/4/8 → widths 8/4/2/1;
    host3's invalid 'Crawl-delay: soon' is ignored → default 1 s →
    width 8); (5) Hamilton BUDGET apportionment of 1000 fetch slots
    across hosts by eligible volume (``apportion_budget`` — exact
    integer arithmetic, Σalloc = 1000). Output: per host, the eligible
    count, the delay-driven wave width, the wave count the schedule
    needs, and the budget share. The no-unbounded-per-host-window
    property is plan-tested
    (tests/test_ext24.py::test_crawl_loop_wave_rank_is_range_bucketed)."""
    from vmware_graph_spark.functions.url import url_host, url_path
    from vmware_graph_spark.operators.crawl import (
        apportion_budget,
        frontier_against_crawled,
        parse_robots,
        parse_robots_delays,
        robots_filter,
    )
    from vmware_graph_spark.operators.rank import exact_global_rank
    from vmware_graph_spark.queries_ext22 import _sitemap_fixture_dir
    from vmware_graph_spark.sources.sitemap import read_sitemaps

    # (1) seed from the sitemap fleet
    root = _sitemap_fixture_dir(spark, sf_dir)
    seeds = (
        read_sitemaps(spark, os.path.join(root, "*.xml*"))
        .filter(F.col("kind") == "url")
        .select(
            F.col("loc").alias("canon"),
            url_host("loc").alias("host"),
            url_path("loc").alias("path"),
        )
    )

    # (2) robots gate + Crawl-delay pacing from the SAME raw bodies
    delays_by_k = {0: "1", 1: "2", 2: "4", 3: "soon", 4: "8"}
    bodies = [
        (
            f"www.site{k}.example.com",
            f"User-agent: examplebot\nCrawl-delay: {delays_by_k[k]}\n"
            f"Disallow: /a/\nAllow: /a/*{k}$\n",
        )
        for k in range(5)
    ]
    robots = spark.createDataFrame(bodies, "host string, robots_txt string")
    rules = parse_robots(robots, "examplebot")
    delays = parse_robots_delays(robots, "examplebot")
    gated = robots_filter(seeds, rules).filter(F.col("fetch_allowed")).drop(
        "fetch_allowed"
    )

    # (3) frontier delta against the persisted crawled-URL index
    idx = _crawled_index_dir(spark, sf_dir)
    frontier = frontier_against_crawled(spark, idx, gated)

    # (4) politeness waves: width = max(1, floor(8/delay)) slots per
    # host per wave; the per-host rank routes through the
    # range-bucketed exact rank (numeric 60-bit md5 priority, canon as
    # total-order tiebreak) so no host — however giant — funnels
    # through a single task
    width = F.greatest(
        F.lit(1).cast("bigint"),
        F.floor(F.lit(8.0) / F.coalesce(F.col("crawl_delay"), F.lit(1.0))),
    )
    sched = frontier.join(F.broadcast(delays), "host", "left").select(
        "host",
        "canon",
        width.alias("width"),
        F.conv(F.substring(F.md5("canon"), 1, 15), 16, 10)
        .cast("bigint")
        .alias("ord"),
    )
    r = exact_global_rank(
        sched, ["ord", "canon"], rank_col="rn", partition_cols=["host"]
    )
    waves = r.select(
        "host",
        "width",
        (((F.col("rn") - 1) / F.col("width")).cast("bigint") + 1).alias("wave"),
    )
    per_host = waves.groupBy("host", "width").agg(
        F.count("*").cast("bigint").alias("n_eligible"),
        F.max("wave").cast("bigint").alias("n_waves"),
    )

    # (5) Hamilton budget split across hosts by eligible volume
    alloc = apportion_budget(
        per_host.select("host", F.col("n_eligible").alias("weight")), 1000
    )
    return per_host.join(alloc.select("host", "alloc"), "host").select(
        "host", "n_eligible", "width", "n_waves", "alloc"
    )
