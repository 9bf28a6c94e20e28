"""Round-5 extensions, batch 5: tokenizer vocabulary-coverage curves,
Merkle dataset manifests, partition-sizing plans, and 3-itemset
frequent-pattern mining.

Same registry/oracle discipline as ``queries.py``; see
``queries_ext3.py`` for the shared numeric-determinism rules.

Scale notes (100 TB):

- ``vocab_coverage_curve`` answers the tokenizer-design question "how
  much of the corpus does a top-K vocabulary cover?" from ONE rank
  window over the (already reduced) vocabulary histogram — the curve
  that decides vocab size before a BPE train run.
- ``merkle_manifest_documents`` produces the dataset's publishable
  fingerprint: per-source Merkle hashes over order-pinned doc hashes,
  folded into one root. Any single-byte change anywhere flips the
  root — the artifact that makes a 100 TB corpus release verifiable
  without re-reading it. Per-source agg is one shuffle; the root folds
  |sources| rows.
- ``partition_sizing_plan`` turns table stats into the knobs DEPLOY.md
  tells you to set: estimated bytes → recommended shuffle partitions
  (64 MB targets) and output file counts (128 MB targets), pure
  integer arithmetic over two aggregate rows.
- ``itemset3_support_parts`` lifts the market-basket family from pairs
  to triples: the candidate join is basket-bounded (size³/6 per
  order), with a min-support HAVING prune before the top-k.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from vmware_graph_spark.queries import query
from vmware_graph_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# Vocabulary coverage curve
# ---------------------------------------------------------------------------

_COV_KS = (100, 500, 1000, 5000)

_COV_SELECTS = ",\n           ".join(
    f"round(sum(CASE WHEN rn <= {k} THEN n_tok ELSE 0 END)::DOUBLE"
    f" / max(total), 6) AS cov_{k}"
    for k in _COV_KS
)

_VOCAB_COVERAGE_SQL = rf"""
    WITH t AS (
      SELECT list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
      FROM documents
    ), uni AS (
      SELECT tok, count(*) AS n_tok FROM t, UNNEST(toks) AS u(tok) GROUP BY tok
    ), ranked AS (
      SELECT n_tok,
             row_number() OVER (ORDER BY n_tok DESC, tok) AS rn,
             sum(n_tok) OVER () AS total
      FROM uni
    )
    SELECT CAST(count(*) AS BIGINT) AS n_vocab,
           CAST(max(total) AS BIGINT) AS n_tokens,
           {_COV_SELECTS}
    FROM ranked
"""


@query("vocab_coverage_curve", _VOCAB_COVERAGE_SQL)
def vocab_coverage_curve(spark, sf_dir):
    """Tokenizer vocabulary-coverage curve: corpus coverage of the
    top-K tokens by frequency for K in {100, 500, 1000, 5000} — the
    readout that sizes a vocabulary before committing to a BPE train.
    One explode + one hash shuffle builds the histogram; only the
    top max(K)=5000 rows are ever totally ordered — taken with
    ``TakeOrderedAndProject`` (parallel per-partition top-k + merge),
    so no |vocab|-sized single-task sort exists anywhere in the plan.
    Totals come from one plain aggregate over the histogram."""
    kmax = max(_COV_KS)
    t = load_table(spark, sf_dir, "documents").select(
        F.filter(F.split("text", r"\s+"), lambda x: x != "").alias("toks")
    )
    uni = (
        t.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n_tok"))
    )
    # (n_vocab, n_tokens) — one shuffle-free-after-histogram aggregate
    totals = uni.agg(
        F.count("*").cast("bigint").alias("n_vocab"),
        F.sum("n_tok").cast("bigint").alias("n_tokens"),
    )
    # Exact top-kmax under the same total order the oracle ranks by;
    # the window below runs over ≤ kmax rows, never |vocab|.
    top = uni.orderBy(F.desc("n_tok"), "tok").limit(kmax)
    ranked = top.select(
        "n_tok",
        F.row_number().over(Window.orderBy(F.desc("n_tok"), "tok")).alias("rn"),
    )
    cov_sums = ranked.agg(
        *[
            F.sum(
                F.when(F.col("rn") <= k, F.col("n_tok")).otherwise(0)
            ).alias(f"_s_{k}")
            for k in _COV_KS
        ]
    )
    out = totals.crossJoin(F.broadcast(cov_sums))
    return out.select(
        "n_vocab",
        "n_tokens",
        *[
            F.round(
                F.col(f"_s_{k}").cast("double") / F.col("n_tokens"), 6
            ).alias(f"cov_{k}")
            for k in _COV_KS
        ],
    )


# ---------------------------------------------------------------------------
# Merkle dataset manifest
# ---------------------------------------------------------------------------

_MERKLE_SQL = """
    WITH doc_h AS (
      SELECT source, doc_id, md5(text) AS h FROM documents
    ), src_h AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             md5(string_agg(h, '' ORDER BY doc_id)) AS source_hash
      FROM doc_h GROUP BY source
    ), root AS (
      SELECT md5(string_agg(source_hash, '' ORDER BY source)) AS root_hash
      FROM src_h
    )
    SELECT source, n_docs, source_hash, root_hash
    FROM src_h, root ORDER BY source
"""


@query("merkle_manifest_documents", _MERKLE_SQL)
def merkle_manifest_documents(spark, sf_dir):
    """Merkle manifest of the corpus: md5 per document, folded in
    doc_id order into a per-source hash, folded in source order into
    ONE root — the publishable fingerprint that lets a consumer verify
    a 100 TB release (or any shard of it) without trusting the
    producer. Per-source fold is one shuffle; the root folds |sources|
    rows. Order-pinned aggregation makes both engines byte-identical."""
    d = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", F.md5("text").alias("h")
    )
    src = d.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.md5(
            F.concat_ws(
                "",
                F.expr("transform(array_sort(collect_list(struct(doc_id, h))), x -> x.h)"),
            )
        ).alias("source_hash"),
    )
    root = src.agg(
        F.md5(
            F.concat_ws(
                "",
                F.expr(
                    "transform(array_sort(collect_list(struct(source, source_hash))),"
                    " x -> x.source_hash)"
                ),
            )
        ).alias("root_hash")
    )
    return (
        src.crossJoin(F.broadcast(root))
        .select("source", "n_docs", "source_hash", "root_hash")
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Partition sizing plan (table stats → cluster knobs)
# ---------------------------------------------------------------------------

_TARGET_SHUFFLE = 64 * 1024 * 1024  # bytes per shuffle partition
_TARGET_FILE = 128 * 1024 * 1024  # bytes per output file
_ROW_OVERHEAD = 64  # estimated per-row fixed cost (ids, offsets)
_LINEITEM_ROW = 120  # estimated bytes per lineitem row


def _sizing_block_sql(table: str, bytes_expr: str) -> str:
    return f"""
      SELECT '{table}' AS tbl, CAST(count(*) AS BIGINT) AS n_rows,
             CAST({bytes_expr} AS BIGINT) AS est_bytes,
             CAST(greatest(({bytes_expr} + {_TARGET_SHUFFLE} - 1)
                           // {_TARGET_SHUFFLE}, 1) AS BIGINT)
               AS rec_shuffle_partitions,
             CAST(greatest(({bytes_expr} + {_TARGET_FILE} - 1)
                           // {_TARGET_FILE}, 1) AS BIGINT) AS rec_files
      FROM {table}
    """


_SIZING_SQL = (
    _sizing_block_sql(
        "documents", f"(sum(n_chars) + count(*) * {_ROW_OVERHEAD})"
    )
    + " UNION ALL "
    + _sizing_block_sql("lineitem", f"(count(*) * {_LINEITEM_ROW})")
    + " ORDER BY tbl"
)


@query("partition_sizing_plan", _SIZING_SQL)
def partition_sizing_plan(spark, sf_dir):
    """Spill-aware sizing plan: estimated table bytes (content + fixed
    row overhead) turned into the cluster knobs DEPLOY.md documents —
    recommended shuffle partition count at 64 MB targets and output
    file count at 128 MB targets. Pure integer ceiling arithmetic over
    one aggregate row per table; at 100 TB this is the job that keeps
    ``spark.sql.shuffle.partitions`` honest as data grows."""

    def block(table, bytes_col):
        t = load_table(spark, sf_dir, table)
        agg = t.agg(
            F.count("*").cast("bigint").alias("n_rows"),
            bytes_col.cast("bigint").alias("est_bytes"),
        )
        return agg.select(
            F.lit(table).alias("tbl"),
            "n_rows",
            "est_bytes",
            F.greatest(
                F.expr(f"div(est_bytes + {_TARGET_SHUFFLE} - 1, {_TARGET_SHUFFLE})"),
                F.lit(1),
            )
            .cast("bigint")
            .alias("rec_shuffle_partitions"),
            F.greatest(
                F.expr(f"div(est_bytes + {_TARGET_FILE} - 1, {_TARGET_FILE})"),
                F.lit(1),
            )
            .cast("bigint")
            .alias("rec_files"),
        )

    docs = block(
        "documents", F.sum("n_chars") + F.count("*") * _ROW_OVERHEAD
    )
    li = block("lineitem", F.count("*") * _LINEITEM_ROW)
    return docs.unionByName(li).orderBy("tbl")


# ---------------------------------------------------------------------------
# Frequent 3-itemsets over order baskets
# ---------------------------------------------------------------------------

_I3_MIN_SUPPORT = 2

_ITEMSET3_SQL = f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS oid, l_partkey AS pid FROM lineitem
    ), triples AS (
      SELECT a.pid AS pa, b.pid AS pb, c.pid AS pc, count(*) AS support
      FROM items a
      JOIN items b ON a.oid = b.oid AND a.pid < b.pid
      JOIN items c ON b.oid = c.oid AND b.pid < c.pid
      GROUP BY a.pid, b.pid, c.pid
      HAVING count(*) >= {_I3_MIN_SUPPORT}
    )
    SELECT pa, pb, pc, support
    FROM triples ORDER BY support DESC, pa, pb, pc LIMIT 20
"""


@query("itemset3_support_parts", _ITEMSET3_SQL)
def itemset3_support_parts(spark, sf_dir):
    """Frequent 3-itemset mining over order baskets (the Apriori class
    one level above ``association_rules_part_pairs``): ordered triple
    generation is basket-bounded (|basket|³/6 per order — baskets are
    small and bounded by schema), followed by a min-support HAVING
    prune and a distributed top-k. The same shape scales to k-itemsets
    by joining the (k-1)-itemset lattice instead of raw items."""
    items = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("oid"), F.col("l_partkey").alias("pid"))
        .distinct()
    )
    a = items.select("oid", F.col("pid").alias("pa"))
    b = items.select(F.col("oid").alias("oidb"), F.col("pid").alias("pb"))
    c = items.select(F.col("oid").alias("oidc"), F.col("pid").alias("pc"))
    return (
        a.join(b, (a.oid == b.oidb) & (a.pa < b.pb))
        .join(c, (F.col("oidb") == c.oidc) & (F.col("pb") < c.pc))
        .groupBy("pa", "pb", "pc")
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= _I3_MIN_SUPPORT)
        .orderBy(F.desc("support"), "pa", "pb", "pc")
        .limit(20)
    )
