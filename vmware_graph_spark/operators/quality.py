"""Per-document repetition/quality statistics (Gopher-style filters).

The reference has no text analytics (it is a tabular→graph ingest,
refresh-vmware.cypher:34-277); these are north-star LLM-pipeline
operators (BASELINE.json): the repetition signals used by
Gopher/MassiveText-style corpus filtering — duplicate-token fraction
and most-frequent-n-gram fraction — computed fully JVM-side.

Shape: one explode per signal family feeding map-side-combined
aggregations keyed on (doc, gram) then (doc). Fan-out per row is the
document's token count, there are no joins between documents, and no
Python UDFs — the plan is a pair of hash aggregations that scales
linearly to a 100 TB corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vmware_graph_spark.functions.text import tokens, word_shingles


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_tok, dup_tok_ratio, top_bigram_frac) per document.

    - ``dup_tok_ratio``: 1 − distinct_tokens / total_tokens — the
      fraction of tokens that are repeats of an earlier token.
    - ``top_bigram_frac``: occurrences of the single most frequent word
      2-gram divided by total 2-grams (Gopher's "fraction of characters
      in the most common n-gram" family, token-count flavored). Docs
      with fewer than 2 tokens have no bigrams → 0.0.

    Both rounded to 6 places so the DuckDB oracle hash-matches.
    """
    tok = df.select(F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("tok"))
    tok_stats = tok.groupBy("id").agg(
        F.count("*").alias("n_tok"),
        F.countDistinct("tok").alias("n_distinct"),
    )

    big = df.select(
        F.col(id_col).alias("id"), F.explode(word_shingles(text_col, 2)).alias("gram")
    )
    big_counts = big.groupBy("id", "gram").agg(F.count("*").alias("c"))
    big_stats = big_counts.groupBy("id").agg(
        F.max("c").alias("top_c"), F.sum("c").alias("n_grams")
    )

    out = tok_stats.join(big_stats, "id", "left")
    return out.select(
        "id",
        F.col("n_tok").cast("int").alias("n_tok"),
        F.round(
            F.lit(1.0) - F.col("n_distinct").cast("double") / F.col("n_tok").cast("double"),
            6,
        ).alias("dup_tok_ratio"),
        F.coalesce(
            F.round(F.col("top_c").cast("double") / F.col("n_grams").cast("double"), 6),
            F.lit(0.0),
        ).alias("top_bigram_frac"),
    )
