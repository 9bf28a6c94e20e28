"""Dictionary phrase tagging (gazetteer matching) over text columns.

The scale-out form of Aho-Corasick-style multi-pattern matching for
the common pipeline case: the pattern dictionary is SMALL (thousands
of phrases — entity gazetteers, blocklists, taxonomy terms) while the
corpus is huge. Grouping the dictionary by phrase token-length turns
matching into per-length positional n-gram generation plus an ``IN``
predicate (constant-folded by Catalyst — no join, no shuffle on the
dictionary side), so the whole scan is embarrassingly parallel and
whole-stage-codegen'd; the only shuffle is the final per-(doc, phrase)
count. No Python UDFs anywhere.
"""

from __future__ import annotations

from collections import defaultdict
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vmware_graph_spark.functions.text import word_shingles


def dictionary_tag_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    phrases: Sequence[str],
) -> DataFrame:
    """Count occurrences of each dictionary phrase per document.

    ``phrases`` are whitespace-tokenized multi-word strings matched
    against the document's own whitespace tokens (same tokenizer as
    the dedup/shingle stack, ``functions.text.tokens``). Returns
    ``(id, phrase, n_hits)`` — one row per document × matched phrase,
    with overlapping occurrences all counted (positional n-grams).

    Scale: one narrow scan per distinct phrase length (unioned —
    Spark runs them as one job over the same input), dictionary
    applied as an ``isin`` literal filter before the only shuffle.
    """
    if not phrases:
        raise ValueError("dictionary_tag_counts: empty phrase dictionary")
    by_len: dict[int, list[str]] = defaultdict(list)
    for p in phrases:
        n = len(p.split())
        if n == 0:
            raise ValueError(f"dictionary_tag_counts: blank phrase {p!r}")
        by_len[n].append(p)
    parts = []
    for n, ps in sorted(by_len.items()):
        grams = df.select(
            F.col(id_col).alias("id"),
            F.explode(word_shingles(text_col, n)).alias("phrase"),
        )
        parts.append(grams.filter(F.col("phrase").isin(ps)))
    hits = parts[0]
    for p in parts[1:]:
        hits = hits.unionByName(p)
    return hits.groupBy("id", "phrase").agg(F.count("*").alias("n_hits"))
