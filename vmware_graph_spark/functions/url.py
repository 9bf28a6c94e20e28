"""URL parsing + canonicalization (crawl prep), pure Catalyst.

A crawl's URL frontier and its post-hoc dedup both need ONE canonical
spelling per page. The spec here is the conservative, loss-free core
every pipeline agrees on (lowercase scheme/host, drop default port,
drop userinfo, drop fragment, drop tracking parameters, sort the rest,
empty path → '/'); anything stronger (www-stripping, %XX normalization,
path dot-segments) changes identity and stays a caller decision.

Everything is regexp_extract / split / filter / array_sort /
concat — JVM-side, codegen-friendly, no UDF, and each helper has a
DuckDB SQL twin built from the same constants so the oracle can verify
the chain verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Version of the CANONICAL URL FORM this module produces. Bumped
#: whenever `url_canonical`'s output can change for some input — v2 =
#: percent-normalization (RFC 3986 §6.2.2.2 unreserved-escape decode +
#: query '+'→'%20', round 11); v1 = the byte-wise query era before it.
#: Persisted artifacts KEYED on the canonical spelling (the crawled-URL
#: index) stamp this into their format.json so a reader can detect an
#: index built under an older canonical form instead of silently
#: re-crawling URLs whose spelling changed (round-11 advice).
URL_CANON_VERSION = 2

#: Query parameters that never affect page identity: analytics tags.
#: Anchored key-match against "key=value" pairs (shared with the twin).
#: Deliberately only the UNAMBIGUOUS set — 'ref' is widely
#: content-bearing (GitHub's ?ref=<branch> selects different content),
#: so dropping it would merge distinct pages and break the module's
#: conservative loss-free contract (round-9 review finding). Callers
#: with a known-analytics 'ref' pass their own ``tracking_re``.
TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid)="

# ---------------------------------------------------------------------------
# Percent-encoding normalization (RFC 3986 §6.2.2.2, round-10 VERDICT
# #3): '%69d' and 'id' are the same key, and 'a+b' vs 'a%20b' the same
# value — leaving them distinct splits identity groups and undercounts
# param-mining evidence. The SAFE normalization decodes only
# percent-escapes of UNRESERVED characters (ALPHA / DIGIT / - . _ ~) —
# the one transformation RFC 3986 defines as identity-preserving — and
# rewrites query '+' (the form-encoding spelling of space) to '%20'.
# Reserved-octet escapes (%2F, %3D, %26, …) stay encoded byte-wise:
# decoding them CHANGES identity, which violates this module's
# conservative loss-free contract. CONTRACT/CUTOFF (documented, shared
# by the SQL twin): input must be URL-LEGAL — every '%' begins a
# two-hex-digit escape, as RFC 3986 requires. On that grammar the
# sequential replace chain equals a single-pass partial decode in any
# order (escapes never overlap and decoded unreserved output can never
# complete a new escape next to a legal '%'); on MALFORMED input
# (a bare '%4' fragment) adjacent decodes may cascade — garbage in,
# byte-stable-garbage out. Case-insensitive, so '%7e' and '%7E' both
# normalize to '~'; hex case of RESERVED escapes is left byte-wise
# (the exact cutoff: keys/values compare byte-wise past the unreserved
# set). Bounded like the HTML entity table: 66 literal-pattern
# replaces, compiled once per expression, no UDF.
# ---------------------------------------------------------------------------

_UNRESERVED = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
#: (two-hex-digit code, decoded char) — the shared Spark/DuckDB table.
PCT_DECODE_TABLE = tuple((f"{ord(c):02X}", c) for c in _UNRESERVED)


def pct_normalize_query(col: Column | str) -> Column:
    """Normalize a QUERY STRING's percent-encoding: ``+`` → ``%20``
    first (form-encoded space; a literal plus stays distinct as its
    ``%2B`` spelling), then decode every unreserved escape. Safe to
    run on the whole query string before splitting — no unreserved
    character is a separator (``&``/``=`` are reserved and stay
    encoded). HOT-PATH GATE: the 67-replace chain is the identity on
    strings containing neither ``%`` nor ``+`` — the overwhelming
    majority of real query strings — so one cheap membership check
    routes those rows around the whole chain (shared by the SQL
    twin)."""
    c = _c(col)
    out = F.regexp_replace(c, r"\+", "%20")
    for hh, ch in PCT_DECODE_TABLE:
        out = F.regexp_replace(out, f"(?i)%{hh}", ch)
    return F.when(c.rlike(r"[%+]"), out).otherwise(c)


def pct_normalize_query_sql(x: str) -> str:
    """DuckDB twin of :func:`pct_normalize_query` — the same table,
    the same order, RE2 ``(?i)`` + global replace, the same
    clean-string gate."""
    out = f"regexp_replace({x}, '\\+', '%20', 'g')"
    for hh, ch in PCT_DECODE_TABLE:
        out = f"regexp_replace({out}, '(?i)%{hh}', '{ch}', 'g')"
    return f"CASE WHEN regexp_matches({x}, '[%+]') THEN {out} ELSE {x} END"


_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
# Anchored past the fragment-free prefix: a '?' INSIDE the fragment
# ("/a#sec?x=1") must not resurrect as a query string, or two
# spellings differing only in fragment get different canonicals
# (round-9 review finding — shared by the SQL twin via this constant).
# The prefix also excludes '?' so the query anchors to the FIRST '?':
# '?' is legal INSIDE a query per RFC 3986, and a greedy prefix made
# "?a=1?x" and "?a=2?x" collide to canonical query "x" (round-10
# review finding).
_QUERY_RE = r"^[^#?]*\?([^#]*)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def url_scheme(col: Column | str) -> Column:
    return F.lower(F.regexp_extract(_c(col), _SCHEME_RE, 1))


def url_host(col: Column | str) -> Column:
    """Lowercased host with userinfo and the scheme's default port
    stripped (http:80, https:443; other ports kept — they change
    identity)."""
    auth = F.regexp_extract(_c(col), _AUTH_RE, 1)
    host = F.lower(F.regexp_replace(auth, r"^[^@]*@", ""))
    scheme = url_scheme(col)
    return (
        F.when(scheme == "http", F.regexp_replace(host, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, r":443$", ""))
        .otherwise(host)
    )


def url_path(col: Column | str) -> Column:
    p = F.regexp_extract(_c(col), _PATH_RE, 1)
    return F.when(p == "", F.lit("/")).otherwise(p)


def url_query_canonical(col: Column | str, *, tracking_re: str = TRACKING_PARAM_RE) -> Column:
    """Query string with percent-encoding NORMALIZED (unreserved
    escapes decoded, ``+`` → ``%20`` — :func:`pct_normalize_query`,
    round-10 VERDICT #3), tracking params dropped and the survivors
    sorted (byte order on the full "key=value" pair — deterministic and
    engine-agnostic); '' when nothing survives. Normalization runs
    BEFORE the tracking filter, so an escape-spelled tracker
    (``utm%5Fsource``) is recognized and dropped. ``tracking_re`` lets
    a caller widen the drop set beyond the conservative default."""
    q = pct_normalize_query(F.regexp_extract(_c(col), _QUERY_RE, 1))
    parts = F.filter(
        F.split(q, "&"),
        lambda p: (p != "") & ~p.rlike(tracking_re),
    )
    return F.array_join(F.array_sort(parts), "&")


def url_canonical(col: Column | str, *, tracking_re: str = TRACKING_PARAM_RE) -> Column:
    """The canonical spelling: scheme://host/path[?sorted-query]."""
    qs = url_query_canonical(col, tracking_re=tracking_re)
    return F.concat(
        url_scheme(col),
        F.lit("://"),
        url_host(col),
        url_path(col),
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )


# ---------------------------------------------------------------------------
# DuckDB twins (same constants; DuckDB standard strings pass
# backslashes through verbatim, so the patterns embed as-is).
# ---------------------------------------------------------------------------

def url_scheme_sql(x: str) -> str:
    return f"lower(regexp_extract({x}, '{_SCHEME_RE}', 1))"


def url_host_sql(x: str) -> str:
    host = f"lower(regexp_replace(regexp_extract({x}, '{_AUTH_RE}', 1), '^[^@]*@', ''))"
    scheme = url_scheme_sql(x)
    return (
        f"CASE WHEN {scheme} = 'http' THEN regexp_replace({host}, ':80$', '') "
        f"WHEN {scheme} = 'https' THEN regexp_replace({host}, ':443$', '') "
        f"ELSE {host} END"
    )


def url_path_sql(x: str) -> str:
    p = f"regexp_extract({x}, '{_PATH_RE}', 1)"
    return f"CASE WHEN {p} = '' THEN '/' ELSE {p} END"


def url_query_canonical_sql(x: str, *, tracking_re: str = TRACKING_PARAM_RE) -> str:
    q = pct_normalize_query_sql(f"regexp_extract({x}, '{_QUERY_RE}', 1)")
    parts = (
        f"list_filter(string_split({q}, '&'), "
        f"p -> p <> '' AND NOT regexp_matches(p, '{tracking_re}'))"
    )
    # DuckDB: array_to_string([]) is NULL where Spark's array_join is ''.
    return f"coalesce(array_to_string(list_sort({parts}), '&'), '')"


def url_canonical_sql(x: str, *, tracking_re: str = TRACKING_PARAM_RE) -> str:
    qs = url_query_canonical_sql(x, tracking_re=tracking_re)
    return (
        f"({url_scheme_sql(x)} || '://' || {url_host_sql(x)} || {url_path_sql(x)} || "
        f"CASE WHEN {qs} = '' THEN '' ELSE '?' || {qs} END)"
    )


# ---------------------------------------------------------------------------
# Link extraction + resolution (the frontier-growing half of a crawl).
# ---------------------------------------------------------------------------

# The optional attribute prefix is LAZY, consumes QUOTED VALUES
# ATOMICALLY (the alternation can only cross a quote character by
# taking the full quoted-string branch), and must end at a whitespace
# boundary — so href= binds to the first real href ATTRIBUTE and
# nothing inside an attribute value can hijack the capture. Two prior
# forms fell to hijacks: greedy [^>]* (value containing 'href=') and a
# lazy prefix without quote-atomicity (value containing ' href=' —
# the whitespace inside the quotes served as the boundary; round-10
# review findings). FAIL-CLOSED contract: a tag with unbalanced or
# misplaced quote characters (invalid per the HTML5 attribute grammar
# — e.g. a bare apostrophe in an unquoted value) yields NO link. Any
# bare-quote fallback branch reopens the hijack through the lazy
# prefix (a shorter hijacking prefix always wins), so the choice is
# fail-closed vs hijackable, and a frontier must not fetch
# attacker-chosen URLs.
#
# LINEAR-TIME shape (round-10 advice): the tokens are POSSESSIVE
# (`++`, Java regex — this pattern is Spark-side only; oracles derive
# link expectations from first principles, never from this regex) and
# their first characters are mutually disjoint (non-space/quote/'>',
# '"', "'", whitespace), so tokenization at any position is
# deterministic and the engine never re-splits a whitespace run or a
# quoted value while backtracking — the prior form's single-char
# branch overlapped `\s` with the boundary terminator, giving O(n²)
# rejection on hostile href-free anchors. The whitespace boundary
# before `href=` is now a zero-width lookbehind, satisfied either by
# the `<a\s` separator itself (empty prefix) or by a possessive `\s++`
# token's last character.
_HREF_PREFIX = r"""(?:[^>"'\s]++|"[^"]*+"|'[^']*+'|\s++)*?(?<=\s)"""
_HREF_RE = r"""(?i)<a\s""" + _HREF_PREFIX + r"""href=["']?([^"'\s>]+)"""


def extract_hrefs(html: Column | str) -> Column:
    """All anchor hrefs in a page (array<string>), as written —
    absolute, relative, fragments, javascript: alike. Resolution and
    filtering are :func:`resolve_href`'s job."""
    h = F.col(html) if isinstance(html, str) else html
    return F.regexp_extract_all(h, F.lit(_HREF_RE), 1)


# Full-anchor form of _HREF_RE: same quote-atomic hijack-safe prefix,
# plus the element body up to the FIRST closing tag (lazy across
# newlines via (?s)) so the anchor TEXT rides along with its href.
# The href value's CLOSING quote is consumed and the post-href tail is
# quote-atomic like the prefix — a '>' inside a later quoted attribute
# (title="a>b") otherwise terminated the tag early and polluted the
# captured text (round-10 review finding). The tail's tokens are
# possessive for the same linear-time reason as _HREF_PREFIX (their
# first characters are disjoint, so the old greedy form never matched
# differently — it only backtracked uselessly on unbalanced quotes).
_ANCHOR_RE = (
    r"""(?is)<a\s""" + _HREF_PREFIX
    + r"""href=["']?([^"'\s>]+)["']?(?:[^>"']++|"[^"]*+"|'[^']*+')*+>(.*?)</a\s*>"""
)


def extract_links(html: Column | str) -> Column:
    """All anchors as ``array<struct<href,text>>`` — the href exactly
    as :func:`extract_hrefs` captures it, paired with the anchor's
    VISIBLE text (inner markup stripped, whitespace collapsed,
    trimmed). Anchor text is the classic link-context signal: the web
    describes a page by how others link to it (anchor-term profiles
    feed retrieval and quality scoring). Anchors that never close
    before the page ends yield nothing, matching a browser's recovery
    of unterminated trailing markup. Value grammar: href values are
    URL-LEGAL (no raw whitespace — RFC 3986 forbids it); an anchor
    whose quoted href contains a space is dropped rather than emitted
    truncated. On generated VALID HTML the pair output is
    property-tested identical to Python's html.parser."""
    h = F.col(html) if isinstance(html, str) else html
    matches = F.regexp_extract_all(h, F.lit(_ANCHOR_RE), 0)
    return F.transform(
        matches,
        lambda m: F.struct(
            F.regexp_extract(m, _ANCHOR_RE, 1).alias("href"),
            F.trim(
                F.regexp_replace(
                    F.regexp_replace(
                        F.regexp_extract(m, _ANCHOR_RE, 2), r"<[^>]*>", " "
                    ),
                    r"\s+",
                    " ",
                )
            ).alias("text"),
        ),
    )


def extract_links_rel(html: Column | str) -> Column:
    """:func:`extract_links` plus each anchor's ``rel`` attribute —
    ``array<struct<href,rel,text>>`` (rel lowercased, '' when absent).
    The rel value is extracted from the SAME matched anchor tag, so
    attribute order (rel before or after href) doesn't matter. This is
    the page-level REP layer's per-link signal: a crawler honoring
    ``rel="nofollow"`` (or its ``ugc``/``sponsored`` refinements)
    excludes the link from frontier discovery — see
    ``operators/crawl.py::page_directives`` for the page-wide meta /
    X-Robots-Tag layer."""
    h = F.col(html) if isinstance(html, str) else html
    matches = F.regexp_extract_all(h, F.lit(_ANCHOR_RE), 0)
    # rel is read from the OPENING TAG only (quote-atomic scan to the
    # tag's real '>'), never from the anchor text — '<a href=x>rel=no
    # follow</a>' must not fabricate a rel. rel is a SPACE-SEPARATED
    # list ("ugc nofollow"), so the quoted forms capture the whole
    # value; the unquoted form ends at whitespace by HTML grammar.
    tag_re = r"""(?is)^(<a\s(?:[^>"']++|"[^"]*+"|'[^']*+')*+>)"""
    rel_dq = r"""(?i)[\s"']rel\s*=\s*"([^"]*)\""""
    rel_sq = r"""(?i)[\s"']rel\s*=\s*'([^']*)'"""
    rel_uq = r"""(?i)[\s"']rel\s*=\s*([^"'\s>]+)"""

    def _rel(tag):
        dq = F.regexp_extract(tag, rel_dq, 1)
        sq = F.regexp_extract(tag, rel_sq, 1)
        uq = F.regexp_extract(tag, rel_uq, 1)
        return F.lower(
            F.when(dq != "", dq).when(sq != "", sq).otherwise(uq)
        )

    return F.transform(
        matches,
        lambda m: F.struct(
            F.regexp_extract(m, _ANCHOR_RE, 1).alias("href"),
            _rel(F.regexp_extract(m, tag_re, 1)).alias("rel"),
            F.trim(
                F.regexp_replace(
                    F.regexp_replace(
                        F.regexp_extract(m, _ANCHOR_RE, 2), r"<[^>]*>", " "
                    ),
                    r"\s+",
                    " ",
                )
            ).alias("text"),
        ),
    )


def resolve_href(scheme: Column, host: Column, href: Column) -> Column:
    """Resolve one href against its page's scheme://host: absolute
    http(s) passes through, protocol-relative ('//cdn.x.com/p') takes
    the page's scheme, root-relative joins the page origin, everything
    else (fragments, javascript:, mailto:, path-relative — which needs
    path algebra a frontier doesn't want) resolves to NULL and drops
    out of the frontier. The '//' check must precede the '/' check or
    protocol-relative links would fabricate 'http://host//cdn.x.com/p'
    (round-9 review finding)."""
    return (
        F.when(href.rlike(r"(?i)^https?://"), href)
        .when(href.startswith("//"), F.concat(scheme, F.lit(":"), href))
        .when(
            href.startswith("/"),
            F.concat(scheme, F.lit("://"), host, href),
        )
        .otherwise(F.lit(None).cast("string"))
    )


# ---------------------------------------------------------------------------
# Frontier hygiene: internationalized-domain tells. A crawl frontier
# mixes ASCII hosts with IDNs in two spellings — the ACE form (RFC 3490
# 'xn--' labels) and raw Unicode — and the classic abuse pattern is the
# homograph host: Latin letters with confusable non-ASCII codepoints
# swapped in. The two detectors below are the cheap page-one screen
# (full confusable tables are a curated-lookup concern, not a regex).
# ---------------------------------------------------------------------------

#: an ACE label anywhere in the host: start-of-string or after a dot.
PUNYCODE_LABEL_RE = r"(?i)(^|\.)xn--"


def host_has_punycode(col: Column | str) -> Column:
    """True when any label of the host is ACE-encoded ('xn--...')."""
    c = _c(col)
    return c.rlike(PUNYCODE_LABEL_RE)


def host_mixed_script(col: Column | str) -> Column:
    """True when any single LABEL of the host mixes ASCII letters with
    non-ASCII codepoints — the homograph precondition. The check is
    per-label, not whole-host: a pure-Unicode label under an ASCII TLD
    ('münchen.de') is a legitimate IDN spelling and must NOT flag,
    while one Cyrillic confusable riding among Latin letters inside a
    label is the signature worth flagging."""
    c = _c(col)
    return F.exists(
        F.split(c, r"\."),
        lambda lbl: lbl.rlike("[A-Za-z]") & lbl.rlike(r"[^\x00-\x7f]"),
    )
