"""Round-10 continuation: within-document repetition statistics — the
published quality signal (Gopher-style repetition filters) that is
DISTINCT from cross-document dedup: a document that repeats ITSELF
(looped boilerplate, stuck generation, scraped nav spam) is low
quality even when globally unique. Oracle-paired on the documents
table via the shared token/shingle twins.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vmware_graph_spark.functions.text import tokens, word_shingles
from vmware_graph_spark.queries import _shingles, _toks, query
from vmware_graph_spark.sources.tables import load_table


@query(
    "doc_repetition_stats",
    f"""
    WITH t AS (
      SELECT doc_id, unnest({_toks('text')}) AS tok FROM documents
    ),
    c AS (SELECT doc_id, tok, count(*) AS n FROM t GROUP BY doc_id, tok),
    tok_stats AS (
      SELECT doc_id,
             sum(n) AS n_toks,
             coalesce(sum(n) FILTER (WHERE n > 1), 0) AS rep_toks
      FROM c GROUP BY doc_id
    ),
    b AS (
      SELECT doc_id, unnest({_shingles('text', 2)}) AS bg FROM documents
    ),
    bc AS (SELECT doc_id, bg, count(*) AS n FROM b GROUP BY doc_id, bg),
    bg_stats AS (SELECT doc_id, max(n) AS top_bigram_n FROM bc GROUP BY doc_id)
    SELECT s.doc_id,
           CAST(s.n_toks AS BIGINT) AS n_toks,
           CAST(s.rep_toks AS BIGINT) AS rep_toks,
           CAST(coalesce(g.top_bigram_n, 0) AS BIGINT) AS top_bigram_n,
           round(CAST(s.rep_toks AS DOUBLE) / s.n_toks, 6) AS rep_tok_frac,
           round(2.0 * coalesce(g.top_bigram_n, 0) / s.n_toks, 6)
             AS top_bigram_frac
    FROM tok_stats s LEFT JOIN bg_stats g ON g.doc_id = s.doc_id
    """,
)
def doc_repetition_stats(spark, sf_dir):
    """WITHIN-document repetition profile (the Gopher-filter family):
    per document, the fraction of tokens that are repeats of another
    token in the SAME document (counted with multiplicity — a token
    appearing 3 times contributes 3 to the numerator) and the
    character weight of the single most-repeated bigram (2·max-count /
    n_tokens). High values flag looped boilerplate and stuck
    generations that cross-corpus dedup never sees. Engine: one
    explode + count per grain, partial-aggregated map-side; the oracle
    recomputes both from the shared token/shingle twins. Two narrow
    shuffles on (doc, gram)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    t = d.select("doc_id", F.explode(tokens("text")).alias("tok"))
    c = t.groupBy("doc_id", "tok").agg(F.count("*").alias("n"))
    tok_stats = c.groupBy("doc_id").agg(
        F.sum("n").cast("bigint").alias("n_toks"),
        F.coalesce(
            F.sum(F.when(F.col("n") > 1, F.col("n"))), F.lit(0)
        ).cast("bigint").alias("rep_toks"),
    )
    b = d.select("doc_id", F.explode(word_shingles("text", 2)).alias("bg"))
    bg_stats = (
        b.groupBy("doc_id", "bg")
        .agg(F.count("*").alias("n"))
        .groupBy("doc_id")
        .agg(F.max("n").alias("top_bigram_n"))
    )
    out = tok_stats.join(bg_stats, "doc_id", "left")
    top = F.coalesce("top_bigram_n", F.lit(0)).cast("bigint")
    return out.select(
        "doc_id",
        "n_toks",
        "rep_toks",
        top.alias("top_bigram_n"),
        F.round(F.col("rep_toks").cast("double") / F.col("n_toks"), 6).alias(
            "rep_tok_frac"
        ),
        F.round(2.0 * top / F.col("n_toks"), 6).alias("top_bigram_frac"),
    )
