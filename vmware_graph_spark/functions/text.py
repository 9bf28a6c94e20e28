"""Text-analysis functions for the training-data-pipeline extensions.

All pure Catalyst expressions (no Python UDFs): tokenization, shingling,
quality scores, fingerprinting, and a deterministic n-gram language-ID
heuristic. Each has an exact ANSI-SQL equivalent so the DuckDB oracle
can verify it — the SQL twin lives next to the query in
``vmware_graph_spark.queries``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col: Column | str) -> Column:
    """Whitespace tokens, empties removed (array<string>).

    Splits on ``\\s+`` (any whitespace run — tabs/newlines included),
    matching :func:`fingerprint`'s normalization; the DuckDB twin is
    ``list_filter(string_split_regex(x, '\\s+'), t -> t <> '')``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda t: t != "")


def n_tokens(col: Column | str) -> Column:
    return F.size(tokens(col))


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles as array<string> (MinHash/Jaccard input).

    Built with sequence+transform+slice so it stays JVM-side; documents
    shorter than n tokens yield an empty array.

    The token array is LET-BOUND via a 1-element outer transform
    (``flatten(transform(array(tokens), t -> ...))``): a lambda variable
    is evaluated once per row, whereas inlining ``tokens(col)`` into the
    inner per-shingle lambda re-ran split+filter for EVERY shingle —
    Catalyst subexpression elimination does not hoist common subtrees
    out of higher-order-function lambdas, so the old expression did
    O(tokens) splits per row (measured 2.3x on the minhash shingle
    scan at sf0.1; plan diff in plans/r12/).
    """

    def sh(t: Column) -> Column:
        # Guard the short-document case explicitly: F.sequence(1, 0)
        # yields a DESCENDING [1, 0] (not empty), and slice(_, 0, n)
        # throws.
        idx = F.when(
            F.size(t) >= n, F.sequence(F.lit(1), F.size(t) - (n - 1))
        ).otherwise(F.array().cast("array<int>"))
        return F.transform(idx, lambda i: F.array_join(F.slice(t, i, n), " "))

    return F.flatten(F.transform(F.array(tokens(col)), sh))


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of whitespace-normalized,
    lowercased text. Stable across engines (md5 is md5 everywhere)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.lower(F.regexp_replace(F.trim(c), r"\s+", " ")))


def punct_ratio(col: Column | str) -> Column:
    """#punctuation chars / #chars — one of the quality heuristics."""
    c = F.col(col) if isinstance(col, str) else col
    punct = F.length(F.regexp_replace(c, r"[^.,;:!?]", ""))
    return punct.cast("double") / F.greatest(F.length(c), F.lit(1)).cast("double")


# Tiny per-language markers for the heuristic language ID. Chosen to be
# regex-dialect-portable (Java regex and RE2 agree on \b and \x{...}).
# zh is checked first: presence of any CJK Unified Ideograph is decisive,
# whereas the Latin stopword markers can collide across languages.
_LANG_MARKERS = [
    ("zh", r"[\x{4e00}-\x{9fff}]"),
    ("es", r"\b(el|la|los|las|que|por)\b"),
    ("de", r"\b(der|die|das|und|nicht)\b"),
    ("fr", r"\b(le|les|des|une|est)\b"),
    ("en", r"\b(the|a|of|and|is)\b"),
]


def lang_id(col: Column | str) -> Column:
    """First-match n-gram language heuristic over stopword markers.

    Deliberately simple and deterministic (CASE over regexes) so the
    DuckDB oracle can run the identical logic; a production pipeline
    would swap in a fastText-style model behind the same column contract.
    """
    c = F.col(col) if isinstance(col, str) else col
    expr = None
    for lang, pat in _LANG_MARKERS:
        cond = c.rlike(pat)
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    return expr.otherwise(F.lit("unknown"))


def lang_id_sql(col: str) -> str:
    """The DuckDB-SQL twin of :func:`lang_id` (same markers, same order)."""
    whens = "\n".join(
        f"WHEN regexp_matches({col}, '{pat}') THEN '{lang}'" for lang, pat in _LANG_MARKERS
    )
    return f"CASE {whens} ELSE 'unknown' END"


# GPT-2-style pre-tokenizer pieces: contractions, space-prefixed word /
# number / punctuation runs. Portable across Java regex and RE2 (no
# lookarounds), so the DuckDB oracle replays it verbatim.
BPE_PIECE_RE = r"(?:'s|'t|'re|'ve|'m|'ll|'d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"

# Tiny English stopword core for quality scoring (kept deliberately
# small and frozen — a moving list would churn every oracle).
STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "as", "with", "was", "at", "by", "be", "this",
    "are", "from", "not", "but", "have",
)


def bpe_tokens(col: Column | str) -> Column:
    """BPE-ish subword pieces via the regex pre-tokenizer (the
    whitespace tokenizer's counterpart for LLM token budgeting)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(BPE_PIECE_RE), 0)


def n_bpe_tokens(col: Column | str) -> Column:
    return F.size(bpe_tokens(col))


def stopword_ratio(col: Column | str) -> Column:
    """Fraction of whitespace tokens that are core English stopwords —
    the classic cheap quality signal (high ratio ≈ natural prose,
    near-zero ≈ code/tables/noise)."""
    t = tokens(col)
    sw = F.filter(t, lambda x: F.lower(x).isin(*STOPWORDS))
    return F.when(
        F.size(t) > 0, F.size(sw).cast("double") / F.size(t).cast("double")
    ).otherwise(F.lit(0.0))


def rolling_fingerprint(col: Column | str) -> Column:
    """Rabin-Karp polynomial rolling hash over the token stream
    (order-sensitive document fingerprint, unlike the order-normalized
    md5 ``fingerprint``). Engine-reproducible: per-token md5→int, fold
    (acc·1000003 + h) mod (2³¹−1); all arithmetic stays < 2⁶³."""
    t = tokens(col)

    def h(x):
        return F.conv(F.substring(F.md5(x), 1, 15), 16, 10).cast("bigint")

    return F.aggregate(
        t,
        F.lit(0).cast("bigint"),
        lambda acc, x: (acc * F.lit(1000003) + h(x)) % F.lit(2147483647),
    )


#: PII patterns kept to constructs with identical semantics in Java
#: regex (Spark) and RE2 (DuckDB): char classes, \d, \b, bounded reps.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_IN_TEXT_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def redact_pii(col: Column | str, *, email_token: str = "[EMAIL]", ip_token: str = "[IP]") -> Column:
    """Scrub emails then IPv4 literals from free text (training-data
    hygiene pass). Pure Catalyst ``regexp_replace`` — global replace,
    JVM-side; email first so an address's domain dots are gone before
    the IP pattern scans."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(
        F.regexp_replace(c, EMAIL_RE, email_token), IPV4_IN_TEXT_RE, ip_token
    )


#: Candidate payment-card spans: 13-19 digits, single space/dash
#: separators allowed (how cards are actually typed). A CANDIDATE is
#: not a match — only Luhn-valid spans redact, so order ids and
#: tracking numbers of the same shape survive.
CC_CANDIDATE_RE = r"\b\d(?:[ -]?\d){12,18}\b"


def luhn_valid(digits: Column | str) -> Column:
    """Luhn checksum over a digits-only string — pure Catalyst (an
    aggregate over the reversed digit positions; no UDF): from the
    right, every second digit doubles (minus 9 past 9) and the total
    must divide by 10. False for empty and single-digit input (a lone
    check digit has nothing to check — '0' would otherwise pass; the
    guard matters to direct callers, not :func:`redact_cc_numbers`,
    whose candidate grammar is already 13-19 digits — round-10
    advice)."""
    d = F.col(digits) if isinstance(digits, str) else digits
    rev = F.reverse(d)
    n = F.length(rev)
    total = F.aggregate(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
        F.lit(0),
        lambda acc, i: acc
        + F.when(
            (i - 1) % 2 == 1,
            F.when(
                F.substring(rev, i, F.lit(1)).cast("int") * 2 > 9,
                F.substring(rev, i, F.lit(1)).cast("int") * 2 - 9,
            ).otherwise(F.substring(rev, i, F.lit(1)).cast("int") * 2),
        ).otherwise(F.substring(rev, i, F.lit(1)).cast("int")),
    )
    return F.when(n >= 2, (total % 10) == 0).otherwise(F.lit(False))


def redact_cc_numbers(col: Column | str, *, token: str = "[CC]") -> Column:
    """Redact payment-card numbers with CHECKSUM validation — the PII
    upgrade over shape-only matching: every 13-19-digit candidate span
    (separators allowed) is Luhn-checked on its digits, and only valid
    ones replace with ``token`` — same-shaped order/tracking numbers
    pass through untouched. Pure Catalyst: extract candidates, filter
    by :func:`luhn_valid`, fold boundary-guarded replacements over the
    text. DELIBERATELY CONSERVATIVE: an occurrence of a valid card
    that sits digit- or separator-adjacent to MORE digits (inside
    ``...111-22``, or space-joined to another number) is left alone —
    it is indistinguishable from a longer non-card identifier, and a
    PII pass must never corrupt non-PII."""
    c = F.col(col) if isinstance(col, str) else col
    cands = F.regexp_extract_all(c, F.lit(CC_CANDIDATE_RE), 0)
    valid = F.filter(
        cands, lambda m: luhn_valid(F.regexp_replace(m, r"[^0-9]", ""))
    )
    # Boundary-guarded regex replace, NOT a literal replace-all: a
    # valid span can recur as a SUBSTRING of a longer candidate-grammar
    # run that Luhn rejected (an 18-digit '<card>-22' order id), and
    # both plain literal replace AND digit-only guards corrupted it
    # (round-10 review findings). The guards exclude digit neighbors
    # and separator-joined digit neighbors on both sides — the
    # candidate grammar's own continuations. Candidates contain only
    # digits/space/dash (no regex metachars); the token escapes Java's
    # replacement specials ('$', '\\') so any literal token is safe.
    safe_token = token.replace("\\", "\\\\").replace("$", "\\$")
    return F.aggregate(
        valid,
        c,
        lambda acc, m: F.regexp_replace(
            acc,
            F.concat(
                F.lit(r"(?<!\d)(?<!\d[ -])"), m, F.lit(r"(?![ -]?\d)")
            ),
            F.lit(safe_token),
        ),
    )


def count_pattern(col: Column | str, pattern: str) -> Column:
    """Occurrence count of ``pattern`` in ``col`` (0 for no match)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(pattern), 0))


# ---------------------------------------------------------------------------
# HTML → text extraction (crawl prep). The regex spec is deliberately
# limited to constructs with identical semantics in Java regex (Spark)
# and RE2 (DuckDB): inline (?is) flags, non-greedy .*?, char classes —
# no backreferences or lookaround. The SQL twin mirrors it step for
# step so the oracle can verify the chain on the same synthetic pages.
# ---------------------------------------------------------------------------

def _entity_pat(codepoint: int, named: tuple[str, ...] = ()) -> str:
    """One alternation matching every spelling of a character reference:
    the named forms plus the NUMERIC forms — decimal ``&#39;`` and hex
    ``&#x27;`` with optional leading zeros and case-free hex digits
    (``&#X27;``/``&#x027;`` are all valid HTML). Hex letters become
    explicit ``[cC]`` classes rather than an inline ``(?i)`` so the
    named alternatives keep HTML's case-sensitive entity names and the
    pattern stays identical under Java regex and RE2."""
    hx = "".join(
        f"[{c}{c.upper()}]" if c.isalpha() else c for c in format(codepoint, "x")
    )
    alts = list(named) + [f"#0*{codepoint}", f"#[xX]0*{hx}"]
    return "&(" + "|".join(alts) + ");"


#: Character references decoded by the extractor, NAMED + NUMERIC forms
#: per entry. The cutoff is deliberate and documented: the six classic
#: named entities plus the Latin-1/General-Punctuation codepoints that
#: dominate real crawled pages (curly quotes, dashes, ellipsis, bullet,
#: (c)/(r)/tm, e-acute, euro). References OUTSIDE the table pass
#: through verbatim — a bounded lookup chain is the price of keeping
#: the decode pure-regexp and engine-portable (no chr() in either
#: engine's regexp_replace). The ampersand entry is NOT here: it must
#: decode strictly LAST (see HTML_STRIP_STEPS).
_DECODED_ENTITIES: tuple[tuple[int, tuple[str, ...], str], ...] = (
    (60, ("lt",), "<"),
    (62, ("gt",), ">"),
    (34, ("quot",), "\""),
    (39, ("apos",), "'"),
    (160, ("nbsp",), " "),
    (8211, (), "–"),   # en dash
    (8212, (), "—"),   # em dash
    (8216, (), "‘"),   # left single quote
    (8217, (), "’"),   # right single quote / apostrophe
    (8220, (), "“"),   # left double quote
    (8221, (), "”"),   # right double quote
    (8226, (), "•"),   # bullet
    (8230, (), "…"),   # ellipsis
    (169, (), "©"),    # (c)
    (174, (), "®"),    # (r)
    (8482, (), "™"),   # tm
    (233, (), "é"),    # e-acute
    (8364, (), "€"),   # euro
)

#: (pattern, replacement) chain: comments first (they may contain tags),
#: then script/style blocks whole (their CONTENT is not text — a naive
#: tag-strip would leak "var x = 1" into the corpus), then remaining
#: tags. Entities decode afterwards — named AND numeric spellings in
#: one step per character — with every '&'-PRODUCING reference
#: (&amp;/&#38;/&#x26;) merged into the single LAST step so literal
#: "&amp;lt;" renders "&lt;" and "&#38;amp;" renders "&amp;"
#: (single-decode semantics: one left-to-right pass, replacements are
#: never rescanned).
HTML_STRIP_STEPS: tuple[tuple[str, str], ...] = (
    (r"(?s)<!--.*?-->", " "),
    (r"(?is)<script\b[^>]*>.*?</script\s*>", " "),
    (r"(?is)<style\b[^>]*>.*?</style\s*>", " "),
    (r"<[^>]*>", " "),
    *((_entity_pat(cp, named), rep) for cp, named, rep in _DECODED_ENTITIES),
    (_entity_pat(38, ("amp",)), "&"),
)


def html_to_text(col: Column | str) -> Column:
    """Plain text from an HTML page: strip comments, script/style
    blocks, tags; decode the six ubiquitous entities; collapse
    whitespace. Pure Catalyst ``regexp_replace`` chain — JVM-side,
    whole-stage-codegen friendly, no UDF in the hot path of a crawl.
    Boilerplate REMOVAL (nav/footer text) is a separate corpus-level
    pass (``dedup_lines_corpus`` — repeated lines across pages of a
    host ARE the boilerplate signal)."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, rep in HTML_STRIP_STEPS:
        c = F.regexp_replace(c, pat, rep)
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def html_to_text_sql(expr: str) -> str:
    """DuckDB twin of :func:`html_to_text` (RE2 accepts the same
    inline-flag patterns; 'g' makes each step a global replace).
    DuckDB's standard single-quoted strings pass backslashes through
    verbatim, so patterns embed as-is — only quotes need escaping."""
    out = expr
    for pat, rep in HTML_STRIP_STEPS:
        p = pat.replace("'", "''")
        r = rep.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{r}', 'g')"
    return rf"trim(regexp_replace({out}, '\s+', ' ', 'g'))"


# ---------------------------------------------------------------------------
# Unicode script profiling (multilingual corpus curation): how much of
# a text is written in which script. Codepoint-range character classes
# in the \x{....} spelling — the one form BOTH Java regex (Spark) and
# RE2 (DuckDB) accept, unlike the \p{script=...} names, which the two
# engines spell differently.
# ---------------------------------------------------------------------------

#: script -> portable codepoint-range class (core block per script;
#: deliberately the BASE blocks — extensions change identity rarely
#: enough for curation ratios, and a bounded documented range beats a
#: property name the engines disagree on).
SCRIPT_RANGES: dict[str, str] = {
    "latin": r"[A-Za-z\x{00C0}-\x{024F}]",
    "cyrillic": r"[\x{0400}-\x{04FF}]",
    "greek": r"[\x{0370}-\x{03FF}]",
    "arabic": r"[\x{0600}-\x{06FF}]",
    "devanagari": r"[\x{0900}-\x{097F}]",
    "cjk": r"[\x{4E00}-\x{9FFF}\x{3040}-\x{30FF}]",  # unified ideographs + kana
    "hangul": r"[\x{AC00}-\x{D7AF}\x{1100}-\x{11FF}]",
}


def script_count(col: Column | str, script: str) -> Column:
    """Count of ``script`` characters in the text (0 when absent).
    Pure Catalyst ``regexp_count`` over :data:`SCRIPT_RANGES`."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(SCRIPT_RANGES[script]))


def script_count_sql(expr: str, script: str) -> str:
    """DuckDB twin (RE2 accepts the same \\x{....} ranges; DuckDB's
    standard strings pass backslashes through verbatim)."""
    pat = SCRIPT_RANGES[script].replace("'", "''")
    return f"len(regexp_extract_all({expr}, '{pat}'))"


# ---------------------------------------------------------------------------
# Charset sniffing (crawl prep): WHATWG precedence — the transport
# header wins, then <meta charset>, then the legacy http-equiv form,
# else UTF-8. Same Java/RE2-portable construct set as html_to_text.
# ---------------------------------------------------------------------------

_CHARSET_HDR_RE = r"""(?i)charset=["']?([A-Za-z0-9_\-]+)"""
# [^>]*? before charset: attribute order in <meta> is unconstrained
# ('<meta id="x" charset="gbk">' is valid HTML), so requiring charset
# to be the FIRST attribute silently fell through to the utf-8 default
# (round-9 review finding). This laxer form also matches the
# http-equiv tag's content charset — harmless, the equiv arm would
# return the same value one precedence step later.
_CHARSET_META_RE = r"""(?i)<meta[^>]*?\scharset=["']?([A-Za-z0-9_\-]+)"""
_CHARSET_EQUIV_RE = r"""(?i)<meta[^>]*http-equiv[^>]*charset=([A-Za-z0-9_\-]+)"""


def sniff_charset(http_content_type: Column | str, html: Column | str) -> Column:
    """Effective charset of a fetched page (lowercased): HTTP
    Content-Type parameter > ``<meta charset>`` > legacy
    ``http-equiv`` content charset > ``utf-8``. Pure Catalyst."""
    ct = F.col(http_content_type) if isinstance(http_content_type, str) else http_content_type
    h = F.col(html) if isinstance(html, str) else html
    hdr = F.lower(F.regexp_extract(ct, _CHARSET_HDR_RE, 1))
    meta = F.lower(F.regexp_extract(h, _CHARSET_META_RE, 1))
    equiv = F.lower(F.regexp_extract(h, _CHARSET_EQUIV_RE, 1))
    return (
        F.when(hdr != "", hdr)
        .when(meta != "", meta)
        .when(equiv != "", equiv)
        .otherwise(F.lit("utf-8"))
    )


def sniff_charset_sql(ct: str, html: str) -> str:
    """DuckDB twin of :func:`sniff_charset` (backslashes embed verbatim
    in DuckDB standard strings; the patterns' single quotes double)."""
    p_hdr = _CHARSET_HDR_RE.replace("'", "''")
    p_meta = _CHARSET_META_RE.replace("'", "''")
    p_equiv = _CHARSET_EQUIV_RE.replace("'", "''")
    hdr = f"lower(regexp_extract({ct}, '{p_hdr}', 1))"
    meta = f"lower(regexp_extract({html}, '{p_meta}', 1))"
    equiv = f"lower(regexp_extract({html}, '{p_equiv}', 1))"
    return (
        f"CASE WHEN {hdr} <> '' THEN {hdr} "
        f"WHEN {meta} <> '' THEN {meta} "
        f"WHEN {equiv} <> '' THEN {equiv} ELSE 'utf-8' END"
    )


# ---------------------------------------------------------------------------
# In-page structural boilerplate (jusText / Boilerpipe family): a page
# splits into BLOCKS at block-level tag boundaries, each block gets the
# two classic shallow features — link density (share of its visible
# text that sits inside <a> anchors) and raw text length — and the
# published two-rule heuristic classifies nav bars, footers, and
# link-list sidebars as boilerplate. This is the PER-PAGE structural
# pass; the CORPUS-level pass (repeated lines across a host's pages)
# is dedup_lines_corpus — the two compose, they don't compete.
# Shallow-feature block classification is Kohlschütter et al. (WSDM
# 2010, "Boilerplate Detection Using Shallow Text Features") and
# Pomikálek's jusText (2011); both report link density + block length
# carry most of the signal, which is exactly what survives at crawl
# scale as a pure Catalyst expression chain (no DOM build, no UDF).
# ---------------------------------------------------------------------------

#: Block boundaries: closing block-level tags and <br>. Splitting on
#: CLOSERS (not openers) keeps each block's own markup — including its
#: anchors — inside the fragment, so per-block features see them.
#: Covers the classic and semantic-HTML5 block set; an anchor that
#: itself SPANS a block break (rare, e.g. <br> inside <a>) loses its
#: closer at the split, so its text counts as visible but not anchor
#: chars — a conservative, content-keeping failure mode.
BLOCK_BREAK_RE = (
    r"(?i)</p\s*>|</div\s*>|</h[1-6]\s*>|</li\s*>|</t[dhr]\s*>|<br\s*/?>"
    r"|</(?:ul|ol|table|nav|section|article|blockquote|pre|header|footer"
    r"|aside|main|form)\s*>"
)

#: Anchor inner text (group 1). `(?:\s[^>]*)?` — not `[^>]*` — so the
#: tag NAME must be exactly `a` (`<abbr>`/`<article>` don't match).
ANCHOR_TEXT_RE = r"(?is)<a(?:\s[^>]*)?>(.*?)</a\s*>"

#: jusText-family thresholds: a block whose visible text is majority
#: anchor text, or that is shorter than a sentence fragment, is
#: boilerplate. Published defaults vary 0.33-0.5 / 20-80 chars; these
#: sit at the permissive end (prefer keeping borderline content — the
#: corpus-level line dedup catches what slips through).
LINK_DENSITY_MAX = 0.5
MIN_BLOCK_CHARS = 20


def html_blocks(col: Column | str) -> Column:
    """``array<string>`` of block fragments (inline markup preserved),
    split at :data:`BLOCK_BREAK_RE` boundaries. Comments, script and
    style blocks are stripped BEFORE the split — their content is not
    text, and a block-break tag inside one (``document.write("</div>")``
    is everywhere) would otherwise truncate the construct and leak its
    payload into a visible block. Pure Catalyst."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, rep in HTML_STRIP_STEPS[:3]:  # comments, <script>, <style>
        c = F.regexp_replace(c, pat, rep)
    return F.split(c, BLOCK_BREAK_RE)


def anchor_text_chars(col: Column | str) -> Column:
    """Total VISIBLE characters of anchor inner text in the fragment
    (int, 0 when no anchors): the numerator of link density. Each
    captured inner text runs through the same normalization as the
    density's denominator (:func:`html_to_text` — nested tags
    stripped, entities decoded, whitespace collapsed, trimmed), so
    density compares like with like and cannot exceed 1 by counting
    raw markup. Catalyst ``regexp_extract_all`` + ``aggregate`` — no
    UDF."""
    c = F.col(col) if isinstance(col, str) else col
    return F.aggregate(
        F.regexp_extract_all(c, F.lit(ANCHOR_TEXT_RE), F.lit(1)),
        F.lit(0),
        lambda acc, x: acc + F.length(html_to_text(x)),
    )


def classify_block(block_text_len: Column, anchor_chars: Column) -> Column:
    """'boilerplate' | 'content' from the two shallow features (the
    jusText two-rule core): majority-anchor blocks and sub-sentence
    blocks are boilerplate, everything else is content. Both inputs
    are per-block ints; the division guards empty blocks."""
    density = anchor_chars.cast("double") / F.greatest(
        block_text_len, F.lit(1)
    ).cast("double")
    return F.when(
        (density > F.lit(float(LINK_DENSITY_MAX)))
        | (block_text_len < F.lit(MIN_BLOCK_CHARS)),
        F.lit("boilerplate"),
    ).otherwise(F.lit("content"))


# ---------------------------------------------------------------------------
# Encoding-artifact (mojibake) detection: the three tells that survive
# every hop of a broken decode chain, each a portable \x{....} class
# (the one spelling Java regex and RE2 share, per SCRIPT_RANGES):
#  - U+FFFD REPLACEMENT CHARACTER — a decoder already gave up;
#  - a UTF-8 lead byte's char FOLLOWED BY a continuation-range char
#    (Latin-1 mis-decode, "é" → "Ã©") or by cp1252's 0x80-0x9F
#    punctuation (cp1252 mis-decode, "'" → "â€™" — the dominant
#    real-world class);
#  - bare C1 controls U+0080-U+009F — valid in no textual encoding's
#    output; their presence means a cp1252/Latin-1 mixup upstream.
# ---------------------------------------------------------------------------

REPLACEMENT_CHAR_RE = r"[\x{FFFD}]"

#: UTF-8 bytes decoded as LATIN-1: any 2-byte lead (C2-DF) re-decoded
#: as a Latin-1 char, followed by a continuation byte's Latin-1 char.
DOUBLE_UTF8_RE = r"[\x{00C2}-\x{00DF}][\x{0080}-\x{00BF}]"

#: UTF-8 bytes decoded as CP1252 — the MOST COMMON real-world class
#: (curly quotes/dashes are 3-byte E2-lead sequences whose
#: continuation bytes land on cp1252's PRINTABLE punctuation, so the
#: Latin-1 tell above never fires): a lead-byte char (C2-EF) followed
#: by one of the 27 punctuation/letter chars cp1252 maps into
#: 0x80-0x9F ("â€™" for U+2019 is the canonical spelling).
CP1252_MOJIBAKE_RE = (
    r"[\x{00C2}-\x{00EF}]"
    r"[\x{20AC}\x{201A}\x{0192}\x{201E}\x{2026}\x{2020}\x{2021}\x{02C6}"
    r"\x{2030}\x{0160}\x{2039}\x{0152}\x{017D}\x{2018}\x{2019}\x{201C}"
    r"\x{201D}\x{2022}\x{2013}\x{2014}\x{02DC}\x{2122}\x{0161}\x{203A}"
    r"\x{0153}\x{017E}\x{0178}]"
)

C1_CONTROL_RE = r"[\x{0080}-\x{009F}]"


def has_replacement_char(col: Column | str) -> Column:
    """True when the text contains U+FFFD (a decoder substituted it
    for undecodable bytes upstream)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(REPLACEMENT_CHAR_RE)


def has_double_utf8(col: Column | str) -> Column:
    """True on either mis-decode signature: UTF-8-as-Latin-1 (a C2-DF
    lead char followed by a continuation-range char, 'Ã©') OR
    UTF-8-as-cp1252 (lead char followed by cp1252's 0x80-0x9F
    punctuation, 'â€™' — the curly-quote class that dominates real
    mojibake). A rare false positive on genuine lead-char-adjacent
    prose is the documented trade — CCNet-family pipelines accept it
    because the pattern is pure filter, no UDF."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(DOUBLE_UTF8_RE) | c.rlike(CP1252_MOJIBAKE_RE)


def has_c1_controls(col: Column | str) -> Column:
    """True when bare C1 control codepoints (U+0080-U+009F) appear —
    no correct decode emits them; cp1252-as-Latin-1 mixups do."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(C1_CONTROL_RE)
