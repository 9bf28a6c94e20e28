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

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
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

def shared_ngram_fraction(
    df: DataFrame, id_col: str, text_col: str, *, n: int = 3, min_docs: int = 2
) -> DataFrame:
    """(id, n_grams, n_shared, shared_frac) — cross-document boilerplate
    signal (Dolma's "duplicate n-gram fraction" family): per document,
    the fraction of its DISTINCT word n-grams that occur in at least
    ``min_docs`` documents corpus-wide. High values flag templated /
    near-duplicated content that per-document repetition stats miss.

    Shape: explode → per-doc distinct (one shuffle on the 64-bit gram
    hash), document-frequency agg (map-side combined), one hash join
    back on the gram hash, one agg on id. Grams are hashed to 60-bit
    ints (engine-portable md5 scheme, dedup._md5_hash64) BEFORE any
    shuffle so the exchanged rows carry 8-byte keys instead of ~n·word
    strings — the difference between a manageable and an explosive
    shuffle at 100 TB. Documents shorter than n tokens surface with
    n_grams=0, shared_frac=0.0 (kept, not dropped).
    """
    from vmware_graph_spark.operators.dedup import _md5_hash64

    sh = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(word_shingles(text_col, n)).alias("gram"),
        )
        .select("id", _md5_hash64(F.col("gram"), 0).alias("g"))
        .distinct()
    )
    freq = sh.groupBy("g").agg(F.count("*").alias("df"))
    stats = (
        sh.join(freq, "g")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.when(F.col("df") >= min_docs, 1).otherwise(0)).alias("n_shared"),
        )
    )
    ids = df.select(F.col(id_col).alias("id")).distinct()
    return ids.join(stats, "id", "left").select(
        "id",
        F.coalesce(F.col("n_grams"), F.lit(0)).cast("int").alias("n_grams"),
        F.coalesce(F.col("n_shared"), F.lit(0)).cast("int").alias("n_shared"),
        F.coalesce(
            F.round(
                F.col("n_shared").cast("double") / F.col("n_grams").cast("double"), 6
            ),
            F.lit(0.0),
        ).alias("shared_frac"),
    )


def unigram_logprob(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_tok, mean_logprob) — perplexity-proxy quality score.

    Scores each document by the mean natural-log probability of its
    tokens under the corpus's OWN unigram distribution — the cheap
    stand-in for the LM-perplexity filter in corpus-quality pipelines
    (CCNet/RedPajama family): documents of rare/garbage tokens score
    very negative, templated boilerplate scores near the top.

    Shape: one explode feeding (a) the global vocab count (map-side
    combined; vocab ≪ corpus, broadcast back) and (b) a per-doc
    aggregation — two hash aggs and one broadcast join, linear at
    100 TB. Determinism: per-token ln() is IEEE-identical across
    engines on the same double inputs; the per-doc mean accumulates
    round(·,6) decimals so partition order can't move low bits.
    """
    tok = df.select(F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("tok"))
    vocab = tok.groupBy("tok").agg(F.count("*").alias("tf"))
    total = vocab.agg(F.sum("tf").alias("n_total"))
    scored = (
        tok.join(F.broadcast(vocab), "tok")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "__lp",
            F.round(
                F.log(F.col("tf").cast("double") / F.col("n_total").cast("double")), 6
            ).cast("decimal(18,6)"),
        )
    )
    return scored.groupBy("id").agg(
        F.count("*").cast("int").alias("n_tok"),
        F.round(
            F.sum("__lp").cast("double") / F.count("*").cast("double"), 6
        ).alias("mean_logprob"),
    )


def profile_columns(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """(column, n_rows, n_null, n_distinct, min_value, max_value) — the
    per-column data census every ingest/quality pipeline runs first
    (schema drift, null explosions, cardinality surprises).

    One wide aggregation computes every column's stats in a single
    pass/shuffle (count + conditional-null count + distinct + min/max
    per column are all agg buffers in the same hash aggregate), then the
    1×(6·k) row is exploded into the long (column, stats) format on the
    driver side of the agg — no per-column scans, no collect. min/max
    are cast to string so mixed-type columns share one schema.
    """
    aggs: list = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.extend(
            [
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__null_{c}"),
                F.countDistinct(F.col(c)).alias(f"__nd_{c}"),
                F.min(F.col(c).cast("string")).alias(f"__min_{c}"),
                F.max(F.col(c).cast("string")).alias(f"__max_{c}"),
            ]
        )
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n_rows"),
                F.col(f"__null_{c}").alias("n_null"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_value"),
                F.col(f"__max_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(rows).alias("p")).select("p.*")


def chunk_documents(
    df: DataFrame, id_col: str, text_col: str, *, size: int = 64, stride: int = 48
) -> DataFrame:
    """(id, chunk_id, chunk_n_tok, chunk_text) — fixed-size token
    windows with overlap (``size - stride`` tokens), the
    context-length-fitting step of training/RAG corpus prep.

    One projection + one explode — no shuffle at all: chunking is
    embarrassingly parallel and stays wherever the scan partitioned the
    corpus. Chunk starts are ``0, stride, 2·stride, …`` up to the last
    index that begins a non-empty window; token-less documents yield no
    chunks. Guard: Spark's ``sequence(a, b)`` is DESCENDING when
    ``b < a`` (never empty), so the stop bound is clamped with
    ``greatest`` instead of relying on an empty sequence.
    """
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    if stride > size:
        # stride > size leaves every (stride-size)-token gap uncovered —
        # silent data loss for a training corpus; reject loudly.
        raise ValueError("stride must be <= size (gaps would drop tokens)")
    t = df.select(F.col(id_col).alias("id"), tokens(text_col).alias("__t")).withColumn(
        "__n", F.size("__t")
    )
    t = t.filter(F.col("__n") > 0)
    starts = F.sequence(
        F.lit(0),
        F.greatest(
            F.lit(0),
            (F.floor((F.col("__n") - 1) / stride) * stride).cast("int"),
        ),
        F.lit(stride),
    )
    ch = t.select(
        "id", "__t", F.posexplode(starts).alias("chunk_id", "__start")
    ).withColumn("__chunk", F.slice("__t", F.col("__start") + 1, size))
    return ch.select(
        "id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.size("__chunk").cast("int").alias("chunk_n_tok"),
        F.array_join("__chunk", " ").alias("chunk_text"),
    )


def dedup_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    line_tokens: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """(id, n_lines, n_kept, kept_text) — C4-style cross-corpus exact
    line deduplication: split each document into consecutive
    ``line_tokens``-token lines (non-overlapping, the fixture corpus has
    no newlines so token windows stand in for lines), drop every line
    whose exact text occurs in ≥ ``min_docs`` DISTINCT documents
    (boilerplate: navigation strings, license headers, templated
    sentences), and reassemble the survivors in original order.

    Shape: the line split is `chunk_documents` (projection + explode,
    no shuffle). Line document-frequency is ONE hash aggregation keyed
    on ``md5(line)`` — never the raw text, so the shuffle carries
    16-byte keys, not line bodies. The boilerplate set (lines with
    df ≥ min_docs) is typically tiny relative to the corpus and joins
    back by hash; reassembly is one groupBy(id) with an order-stable
    ``array_sort(collect_list(struct(line_id, text)))`` — `collect_list`
    alone is NOT order-stable under shuffle. Two shuffles total,
    both on compact keys; linear to a 100 TB corpus.
    """
    lines = chunk_documents(
        df, id_col, text_col, size=line_tokens, stride=line_tokens
    ).select(
        "id",
        F.col("chunk_id").alias("line_id"),
        F.col("chunk_text").alias("line_text"),
        F.md5("chunk_text").alias("__h"),
    )
    boiler = (
        lines.groupBy("__h")
        .agg(F.countDistinct("id").alias("__df"))
        .filter(F.col("__df") >= min_docs)
        .select("__h", F.lit(True).alias("__dup"))
    )
    flagged = lines.join(boiler, "__h", "left")
    kept_struct = F.when(
        F.col("__dup").isNull(), F.struct("line_id", "line_text")
    )  # collect_list skips nulls → only kept lines accumulate
    return flagged.groupBy("id").agg(
        F.count("*").cast("int").alias("n_lines"),
        F.sum(F.when(F.col("__dup").isNull(), 1).otherwise(0))
        .cast("int")
        .alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)), lambda s: s["line_text"]
            ),
            " ",
        ).alias("kept_text"),
    )


def feature_hash_embed(
    df: DataFrame, id_col: str, text_col: str, *, dims: int = 64
) -> DataFrame:
    """Hashing-trick text featurizer: (id, dim, w) — each token md5-maps
    to a dimension in [0, dims) with a hash-derived ±1 sign, and ``w``
    is the signed count. Model-free embeddings (Weinberger et al.'s
    feature hashing): unbiased inner products, no vocabulary table, no
    training pass — the deterministic on-ramp from raw text into the
    engine's whole vector stack (cosine/IVF/PQ/ANN).

    Long (id, dim, w) form rather than assembled arrays: it IS the
    layout the relational vector ops consume (centroids, dot products),
    and sparse docs stay sparse. One explode + one hash agg, md5 keys —
    shuffle carries (id, dim) pairs only."""
    tok = df.select(F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("t"))
    h = F.conv(F.substring(F.md5(F.col("t")), 1, 15), 16, 10).cast("bigint")
    sign = F.when((h % 2) == 0, F.lit(1)).otherwise(F.lit(-1))
    return (
        tok.select("id", (F.shiftright(h, 1) % dims).cast("int").alias("dim"), sign.alias("s"))
        .groupBy("id", "dim")
        .agg(F.sum("s").cast("bigint").alias("w"))
        .filter(F.col("w") != 0)
    )


def grouped_trimmed_stats(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    *,
    trim: float = 0.1,
) -> DataFrame:
    """(group…, n, n_used, trimmed_mean) via ``groupBy().applyInPandas``
    — the batch grouped-map Arrow path (each group's rows arrive as ONE
    pandas frame): drop the lowest and highest ``floor(trim·n)`` values,
    average the rest.

    Robust-mean screening for metric columns (the outlier-resistant
    sibling of the z-score screen). Determinism: the trimmed multiset
    is value-sorted so tie order can't change it, and the sum runs over
    10^4-scaled int64 — exact, order-independent, and equal to the
    oracle's DECIMAL(18,4) accumulation; the final division is the same
    single IEEE op in both engines. One shuffle (the groupBy); each
    group must fit a worker's memory — true for per-metric groups at
    any corpus size, NOT for a global group (use the window variant
    then)."""
    import math

    import numpy as np
    import pandas as pd

    gcols = list(group_cols)
    schema = ", ".join(
        [f"{c} {t}" for c, t in df.select(*gcols).dtypes]
        + ["n bigint", "n_used bigint", "trimmed_mean double"]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(pdf[value_col].to_numpy())
        n = len(v)
        k = int(math.floor(trim * n))
        used = v[k : n - k]
        ints = np.round(used * 10000.0).astype(np.int64)
        mean = (int(ints.sum()) / 10**4) / len(used) if len(used) else None
        out = {c: [pdf[c].iloc[0]] for c in gcols}
        out.update({"n": [n], "n_used": [len(used)], "trimmed_mean": [mean]})
        return pd.DataFrame(out)

    return df.select(*gcols, value_col).groupBy(*gcols).applyInPandas(kernel, schema)


def top_ngrams(df: DataFrame, text_col: str, *, n: int = 2, k: int = 50) -> DataFrame:
    """(gram, cnt, rnk) — the k most frequent word n-grams corpus-wide,
    ties broken lexicographically (vocabulary induction / BPE-merge prep
    and stopword-list discovery).

    Shape: explode → map-side-combined count, then ``orderBy().limit(k)``
    which Catalyst executes as TakeOrderedAndProject — each partition
    keeps its local top-k and only k rows per partition reach the
    driver-side merge, so no global sort materializes. The rank column
    is computed by a window AFTER the limit, over k rows only.
    """
    g = df.select(F.explode(word_shingles(text_col, n)).alias("gram"))
    counts = g.groupBy("gram").agg(F.count("*").alias("cnt"))
    topk = counts.orderBy(F.col("cnt").desc(), F.col("gram").asc()).limit(k)
    w = Window.orderBy(F.col("cnt").desc(), F.col("gram").asc())
    return topk.withColumn("rnk", F.row_number().over(w).cast("int"))


def clipped_ngram_overlap(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 2,
) -> DataFrame:
    """BLEU-style clipped n-gram matches for (candidate, reference)
    document pairs: for each pair, Σ_g min(count_cand(g), count_ref(g))
    over the candidate's distinct n-grams — the numerator of modified
    n-gram precision (the denominator is just the candidate's n-gram
    total, derivable from its token count). ``pairs`` carries columns
    ``(cand_id, ref_id)``.

    All-integer output so the metric hash-matches a SQL oracle.
    Scale: per-doc gram counts are one explode+count shuffle; the pair
    join touches only each pair's gram rows (equi-join on id then on
    gram) — never a corpus cross product.
    """
    return (
        clipped_ngram_overlap_multi(docs, pairs, id_col, text_col, ns=(n,))
        .withColumnRenamed(f"n{n}", "clipped_matches")
    )


def clipped_ngram_overlap_multi(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str,
    *,
    ns: tuple[int, ...] = (1, 2),
) -> DataFrame:
    """Clipped n-gram matches for SEVERAL n in one pass: the gram rows
    for every requested n ride one explode (tagged with their n), one
    per-doc count shuffle, and one pair-join pipeline, instead of a
    full explode+join per n — the 2× constant-factor the per-n calls
    paid for BLEU's (1, 2). Output: (cand_id, ref_id, n1, n2, …) with
    one ``n{k}`` column per requested k; pairs with no overlapping
    grams at some k carry 0 there (only pairs with at least one
    overlap at SOME k appear — same outer-join contract callers had
    per n, applied jointly)."""
    def _tagger(k: int):
        # single-arg lambda: a 2-arg transform lambda would receive
        # the ELEMENT INDEX as its second argument, not the default
        return lambda g: F.struct(F.lit(k).alias("n"), g.alias("g"))

    tagged = F.concat(
        *[F.transform(word_shingles(text_col, n), _tagger(n)) for n in ns]
    )
    grams = (
        docs.select(F.col(id_col).alias("gid"), F.explode(tagged).alias("t"))
        .groupBy("gid", F.col("t.n").alias("n"), F.col("t.g").alias("g"))
        .agg(F.count("*").alias("c"))
    )
    cand = grams.select(F.col("gid").alias("cand_id"), "n", "g", F.col("c").alias("cc"))
    ref = grams.select(F.col("gid").alias("ref_id"), "n", "g", F.col("c").alias("rc"))
    per_n = (
        pairs.select("cand_id", "ref_id")
        .join(cand, "cand_id")
        .join(ref, ["ref_id", "n", "g"])
        .groupBy("cand_id", "ref_id", "n")
        .agg(F.sum(F.least("cc", "rc")).alias("m"))
    )
    aggs = [
        F.sum(F.when(F.col("n") == k, F.col("m")).otherwise(0)).alias(f"n{k}")
        for k in ns
    ]
    return per_n.groupBy("cand_id", "ref_id").agg(*aggs)


def lm_bigram_neglogprob(
    docs: DataFrame,
    ref: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """CCNet-style n-gram LM quality score: train an add-one-smoothed
    bigram model on a REFERENCE corpus (the "clean" slice), score
    every document by its mean negative log bigram probability — low
    = reference-like, high = junk/outlier. The standard pre-filter a
    training-data pipeline runs before expensive dedup/embedding
    passes (CCNet uses KenLM perplexity; the relational equivalent is
    a counted bigram table).

    p(w2|w1) = (c_ref(w1 w2) + 1) / (c_ref(w1) + V), V = |ref vocab|.
    Per doc: ``n_bigrams``, ``avg_neglogp`` (mean of per-bigram
    −ln p, each rounded to 6dp and summed as DECIMAL so the aggregate
    hash-matches a SQL oracle — the BM25 float-determinism recipe),
    and ``oov_rate`` (fraction of bigram positions whose CONTEXT
    token is unseen in the reference). Docs with < 2 tokens emit no
    row (no bigram evidence either way).

    Scale: two reference aggregations (bigram + unigram counts — at
    100 TB the reference slice is a small fraction by construction,
    and the model tables are vocabulary-sized, broadcast-or-bucketed
    at the join), one corpus explode, one per-doc aggregate. No
    windows, no self-joins.
    """
    rt = ref.select(F.explode(tokens(text_col)).alias("tok"))
    c1 = rt.groupBy("tok").agg(F.count("*").alias("c1"))
    # |vocab| is just the unigram table's row count — a vocabulary-
    # sized aggregate, not a third corpus-sized explode (round-6
    # review: countDistinct over rt re-scanned the reference)
    vocab = c1.agg(F.count("*").alias("v"))
    c2 = (
        ref.select(F.explode(word_shingles(text_col, 2)).alias("g"))
        .groupBy("g")
        .agg(F.count("*").alias("c2"))
    )
    db = docs.select(
        F.col(id_col).alias("id"), F.explode(word_shingles(text_col, 2)).alias("g")
    ).withColumn("w1", F.element_at(F.split("g", " "), 1))
    scored = (
        db.join(c2, "g", "left")
        .join(c1.withColumnRenamed("tok", "w1"), "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "id",
            (F.col("c1").isNull()).alias("oov"),
            F.round(
                -F.log(
                    (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(1)).cast("double")
                    / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("v")).cast("double")
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("nlp"),
        )
    )
    return scored.groupBy("id").agg(
        F.count("*").cast("bigint").alias("n_bigrams"),
        F.round(
            F.sum("nlp").cast("double") / F.count("*"), 6
        ).alias("avg_neglogp"),
        F.round(
            F.sum(F.when(F.col("oov"), 1).otherwise(0)).cast("double") / F.count("*"),
            6,
        ).alias("oov_rate"),
    )
