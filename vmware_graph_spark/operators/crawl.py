"""Crawl-frontier operators: robots.txt filtering.

The frontier side of crawl prep: given the canonical URL set and each
host's robots rules, decide fetchability. Semantics are the de-facto
standard (RFC 9309 / Googlebot): the matching rule with the LONGEST
path prefix wins; on a tie, Allow beats Disallow; a URL no rule
matches is allowed.

Scale shape: robots corpora are tiny relative to the frontier (a few
rules per host), so the per-host rule set is packed into ONE array row
and broadcast — the frontier never shuffles at all. Longest-match
resolution is a per-row Catalyst expression (filter → transform →
array_max over a (specificity, allow) struct), so the whole operator
is a broadcast hash join plus a codegen'd projection. The score struct
orders by ``(2*len(prefix) + allow)`` so longer prefixes dominate and
an Allow beats a Disallow of equal length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    *,
    host_col: str = "host",
    path_col: str = "path",
    rule_host_col: str = "host",
    prefix_col: str = "path_prefix",
    allow_col: str = "allow",
) -> DataFrame:
    """Append a boolean ``fetch_allowed`` to ``urls``.

    ``rules``: one row per (host, path_prefix, allow). Duplicate
    (host, prefix) pairs must not carry conflicting verdicts (robots
    files don't); everything else — overlapping prefixes, allow-inside-
    disallow carve-outs — resolves by longest-match. A URL whose host
    has no rules (or no matching prefix) is allowed.
    """
    per_host = (
        rules.groupBy(F.col(rule_host_col).alias("__r_host"))
        .agg(
            F.collect_list(
                F.struct(
                    F.col(prefix_col).alias("prefix"),
                    F.col(allow_col).cast("boolean").alias("allow"),
                )
            ).alias("__rules")
        )
    )
    joined = urls.join(
        F.broadcast(per_host),
        F.col(host_col) == F.col("__r_host"),
        "left",
    )
    matches = F.filter(
        F.coalesce("__rules", F.array().cast("array<struct<prefix:string,allow:boolean>>")),
        lambda r: F.col(path_col).startswith(r["prefix"]),
    )
    best = F.array_max(
        F.transform(
            matches,
            lambda r: F.struct(
                (F.length(r["prefix"]) * 2 + r["allow"].cast("int")).alias("score"),
                r["allow"].alias("allow"),
            ),
        )
    )
    return joined.select(
        *urls.columns,
        F.coalesce(best["allow"], F.lit(True)).alias("fetch_allowed"),
    )
