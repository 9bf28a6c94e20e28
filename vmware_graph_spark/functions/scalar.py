"""Scalar shims pinning Cypher semantics onto Spark builtins.

Every function here exists because a naive Spark translation of the
corresponding Cypher construct is subtly wrong (SURVEY §2.8 "hard
parts"). All of them compile to JVM-side Catalyst expressions — no
Python UDFs — so they stay inside whole-stage codegen.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# The IPv4 literal the reference uses to classify NTP/DNS entries as
# ip-vs-fqdn (refresh-vmware.cypher:108,117,126,135). Cypher `=~` is a
# full match; stored here UNanchored, anchoring is rlike_full's job.
IPV4_RE = (
    r"(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\."
    r"(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\."
    r"(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\."
    r"(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)"
)


def split_literal(col: Column | str, delim: str) -> Column:
    """Cypher ``split(s, delim)`` — delimiter is a LITERAL string.

    ``F.split`` takes a Java regex, so metacharacters in the delimiter
    (e.g. ``'['`` in the datastore path parse, refresh-vmware.cypher:249)
    must be escaped. Cites SURVEY §2.8 split row.
    """
    return F.split(F.col(col) if isinstance(col, str) else col, re.escape(delim))


def rlike_full(col: Column | str, pattern: str) -> Column:
    """Cypher ``s =~ pattern`` — anchored FULL match.

    Spark ``rlike`` is find-anywhere; Cypher ``=~`` must match the whole
    string (refresh-vmware.cypher:110,119). Wrap in a non-capturing group
    so alternations don't escape the anchors.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(f"^(?:{pattern})$")


def try_int(col: Column | str) -> Column:
    """Cypher ``toInt(s)`` — integer or null on garbage
    (refresh-vmware.cypher:146,184-186). ``try_cast`` matches exactly."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("int")


def coalesce_default(col: Column | str, default: str) -> Column:
    """``coalesce(x, 'None Provided')`` pattern
    (refresh-vmware.cypher:93,95,159,167)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c, F.lit(default))


def concat_strict(*cols: Column | str) -> Column:
    """Cypher string ``+``: null if ANY operand is null.

    ``F.concat`` already propagates null-if-any-null (unlike
    ``concat_ws``), so this is a named alias that documents the
    semantics relied on at refresh-vmware.cypher:185 (`row.CPUs + ' vCPUs'`).
    """
    return F.concat(*[F.col(c) if isinstance(c, str) else c for c in cols])


def path_last(col: Column | str, delim: str = "/") -> Column:
    """Cypher ``last(split(path,'/'))`` (refresh-vmware.cypher:63,199)."""
    return F.element_at(split_literal(col, delim), -1)


def path_parent(col: Column | str, delim: str = "/") -> Column:
    """Parent path: everything before the final segment.

    The reference computes it as ``replace(path, '/'+name, '')``
    (refresh-vmware.cypher:64) which corrupts paths whose leaf repeats
    an interior segment; we compute it structurally instead (documented
    divergence — same result on all reference-shaped inputs).
    """
    c = F.col(col) if isinstance(col, str) else col
    parts = split_literal(c, delim)
    return F.array_join(F.slice(parts, 1, F.greatest(F.size(parts) - 1, F.lit(1))), delim)
