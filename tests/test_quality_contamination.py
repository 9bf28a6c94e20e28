"""Tests for repetition stats, n-gram contamination, and semantic dedup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vmware_graph_spark.operators.dedup import (
    ngram_contamination,
    semantic_dedup,
    semantic_dedup_pairs,
)
from vmware_graph_spark.operators.quality import repetition_stats


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "a b a b a b"),            # heavy bigram repetition
            (2, "w x y z"),                # all distinct
            (3, "solo"),                   # one token, no bigrams
        ],
        ["id", "text"],
    )


def test_repetition_stats_values(corpus):
    rows = {r.id: r for r in repetition_stats(corpus, "id", "text").collect()}
    # doc 1: 6 tokens, 2 distinct → dup ratio 4/6; bigrams: "a b" x3,
    # "b a" x2 → top fraction 3/5.
    assert rows[1].n_tok == 6
    assert rows[1].dup_tok_ratio == pytest.approx(1 - 2 / 6, abs=1e-6)
    assert rows[1].top_bigram_frac == pytest.approx(3 / 5, abs=1e-6)
    # doc 2: no repeats; 3 distinct bigrams → top fraction 1/3.
    assert rows[2].dup_tok_ratio == 0.0
    assert rows[2].top_bigram_frac == pytest.approx(1 / 3, abs=1e-6)
    # doc 3: no bigrams → 0.0, not null.
    assert rows[3].top_bigram_frac == 0.0


def test_ngram_contamination_rates(spark):
    train = spark.createDataFrame(
        [(10, "the quick brown fox jumps"), (11, "over the lazy dog today")],
        ["id", "text"],
    )
    test = spark.createDataFrame(
        [
            (1, "the quick brown fox sleeps"),  # shares "the quick brown" etc.
            (2, "completely novel material here"),
        ],
        ["id", "text"],
    )
    rows = {r.test_id: r for r in ngram_contamination(train, test, "id", "text", n=3).collect()}
    # doc 1: 3-grams = {the quick brown, quick brown fox, brown fox sleeps};
    # first two occur in train doc 10.
    assert rows[1].n_grams == 3 and rows[1].n_hit == 2
    assert rows[1].hit_rate == pytest.approx(2 / 3, abs=1e-6)
    assert rows[2].n_hit == 0 and rows[2].hit_rate == 0.0


@pytest.fixture(scope="module")
def clustered_vecs(spark):
    # cluster 0: v1 ≈ v2 (cos 1.0), v3 orthogonal; cluster 1: v4 alone
    # but identical to v1 — cross-cluster pairs must NOT be considered.
    return spark.createDataFrame(
        [
            (1, 0, [1.0, 0.0]),
            (2, 0, [2.0, 0.0]),
            (3, 0, [0.0, 1.0]),
            (4, 1, [1.0, 0.0]),
        ],
        ["id", "cl", "vec"],
    )


def test_semantic_dedup_pairs_cluster_blocked(clustered_vecs):
    pairs = semantic_dedup_pairs(
        clustered_vecs, "id", "vec", "cl", threshold=0.9
    ).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(1, 2)}


def test_semantic_dedup_min_id_survivor(clustered_vecs):
    out = semantic_dedup(clustered_vecs, "id", "vec", "cl", threshold=0.9)
    kept = {r.id: r.kept for r in out.collect()}
    assert kept == {1: True, 2: False, 3: True, 4: True}


def test_semantic_dedup_plan_has_no_cross_join(clustered_vecs):
    plan = semantic_dedup_pairs(
        clustered_vecs, "id", "vec", "cl", threshold=0.9
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan

def test_shared_ngram_fraction_values(spark):
    from vmware_graph_spark.operators.quality import shared_ngram_fraction

    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),      # trigrams: abc bcd cde
            (2, "a b c x y"),      # trigrams: abc bcx cxy — shares abc with doc 1
            (3, "p q r s"),        # trigrams: pqr qrs — unique
            (4, "hi"),             # < 3 tokens → no trigrams, must survive
        ],
        ["id", "text"],
    )
    rows = {r.id: r for r in shared_ngram_fraction(docs, "id", "text", n=3).collect()}
    assert rows[1].n_grams == 3 and rows[1].n_shared == 1
    assert rows[1].shared_frac == pytest.approx(1 / 3, abs=1e-6)
    assert rows[2].n_grams == 3 and rows[2].n_shared == 1
    assert rows[3].n_shared == 0 and rows[3].shared_frac == 0.0
    assert rows[4].n_grams == 0 and rows[4].shared_frac == 0.0


def test_shared_ngram_fraction_min_docs(spark):
    from vmware_graph_spark.operators.quality import shared_ngram_fraction

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "a b c")], ["id", "text"]
    )
    # "a b c" appears in 3 docs; min_docs=4 → nothing is shared.
    rows = shared_ngram_fraction(docs, "id", "text", n=3, min_docs=4).collect()
    assert all(r.n_shared == 0 for r in rows)


def test_top_ngrams_order_and_ties(spark):
    from vmware_graph_spark.operators.quality import top_ngrams

    docs = spark.createDataFrame(
        [(1, "x y x y"), (2, "a b x y"), (3, "a b")], ["id", "text"]
    )
    # bigram counts: "x y"=3 ("x y","y x"→ wait recount below), ties lexical.
    out = top_ngrams(docs, "text", n=2, k=3).collect()
    # counts: doc1 → "x y","y x","x y"; doc2 → "a b","b x","x y"; doc3 → "a b"
    # ⇒ "x y"=3, "a b"=2, then "b x"=1 < "y x"=1 lexically.
    assert [(r.gram, r.cnt, r.rnk) for r in out] == [
        ("x y", 3, 1),
        ("a b", 2, 2),
        ("b x", 1, 3),
    ]


def test_top_ngrams_plan_is_take_ordered(spark):
    from vmware_graph_spark.operators.quality import top_ngrams

    docs = spark.createDataFrame([(1, "a b c a b")], ["id", "text"])
    plan = (
        top_ngrams(docs, "text", n=2, k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_unigram_logprob_hand_computed(spark):
    import math

    from vmware_graph_spark.operators.quality import unigram_logprob

    # corpus: "a a b" + "b c" → tf: a=2, b=2, c=1; total=5
    d = spark.createDataFrame([(1, "a a b"), (2, "b c")], ["id", "text"])
    got = {r["id"]: (r["n_tok"], r["mean_logprob"]) for r in
           unigram_logprob(d, "id", "text").collect()}
    lp = {t: round(math.log(tf / 5), 6) for t, tf in {"a": 2, "b": 2, "c": 1}.items()}
    assert got[1][0] == 3
    assert got[1][1] == round((2 * lp["a"] + lp["b"]) / 3, 6)
    assert got[2] == (2, round((lp["b"] + lp["c"]) / 2, 6))


def test_unigram_logprob_rare_scores_below_common(spark):
    from vmware_graph_spark.operators.quality import unigram_logprob

    rows = [(i, "the common phrase repeats") for i in range(20)]
    rows.append((99, "zxqv wvut qqzz"))  # singleton garbage tokens
    d = spark.createDataFrame(rows, ["id", "text"])
    got = {r["id"]: r["mean_logprob"] for r in unigram_logprob(d, "id", "text").collect()}
    assert got[99] < got[0]


def test_chunk_documents_overlap_and_tail(spark):
    from vmware_graph_spark.operators.quality import chunk_documents

    toks = " ".join(str(i) for i in range(10))  # 10 tokens
    d = spark.createDataFrame([(1, toks), (2, "only three tokens"), (3, "")],
                              ["id", "text"])
    got = sorted(
        map(tuple, chunk_documents(d, "id", "text", size=4, stride=3).collect())
    )
    # doc 1: starts 0,3,6,9 → windows of 4,4,4 and tail of 1
    assert got == [
        (1, 0, 4, "0 1 2 3"),
        (1, 1, 4, "3 4 5 6"),
        (1, 2, 4, "6 7 8 9"),
        (1, 3, 1, "9"),
        (2, 0, 3, "only three tokens"),
    ]


def test_chunk_documents_no_shuffle(spark):
    from vmware_graph_spark.operators.quality import chunk_documents

    d = spark.createDataFrame([(1, "a b c")], ["id", "text"])
    plan = (
        chunk_documents(d, "id", "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan


def test_profile_columns_wide_single_pass(spark):
    from vmware_graph_spark.operators.quality import profile_columns

    d = spark.createDataFrame(
        [(1, "x"), (2, None), (2, "y")], ["k", "s"]
    )
    got = {r["col_name"]: r for r in profile_columns(d, ["k", "s"]).collect()}
    assert got["k"]["n_rows"] == 3 and got["k"]["n_null"] == 0
    assert got["k"]["n_distinct"] == 2
    assert got["k"]["min_value"] == "1" and got["k"]["max_value"] == "2"
    assert got["s"]["n_null"] == 1 and got["s"]["n_distinct"] == 2
    # single wide aggregate: exactly one Exchange pair (partial/final),
    # never one scan per column.
    plan = (
        profile_columns(d, ["k", "s"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan ExistingRDD") <= 1


def test_dedup_lines_removes_cross_doc_boilerplate(spark):
    # 2-token lines; "NAV BAR" opens both docs → boilerplate; the rest
    # is unique. Doc 3 is pure boilerplate → empty kept_text, not null.
    from vmware_graph_spark.operators.quality import dedup_lines

    df = spark.createDataFrame(
        [
            (1, "NAV BAR alpha beta gamma delta"),
            (2, "NAV BAR epsilon zeta"),
            (3, "NAV BAR"),
        ],
        ["id", "text"],
    )
    rows = {
        r.id: r
        for r in dedup_lines(df, "id", "text", line_tokens=2, min_docs=2).collect()
    }
    assert rows[1].n_lines == 3 and rows[1].n_kept == 2
    assert rows[1].kept_text == "alpha beta gamma delta"  # original order
    assert rows[2].n_kept == 1 and rows[2].kept_text == "epsilon zeta"
    assert rows[3].n_kept == 0 and rows[3].kept_text == ""


def test_dedup_lines_df_counts_distinct_docs_not_occurrences(spark):
    # "x y" twice within ONE doc is not cross-document boilerplate.
    from vmware_graph_spark.operators.quality import dedup_lines

    df = spark.createDataFrame([(1, "x y x y"), (2, "p q")], ["id", "text"])
    rows = {
        r.id: r
        for r in dedup_lines(df, "id", "text", line_tokens=2, min_docs=2).collect()
    }
    assert rows[1].n_kept == 2 and rows[1].kept_text == "x y x y"


def test_grouped_trimmed_stats_drops_tails(spark):
    from vmware_graph_spark.operators.quality import grouped_trimmed_stats

    # group a: 10 values 1..10 with trim=0.1 → drop 1 low + 1 high →
    # mean of 2..9 = 5.5; group b too small to trim (floor(0.1*3)=0).
    rows = [("a", float(v)) for v in range(1, 11)] + [("b", 2.0), ("b", 4.0), ("b", 9.0)]
    df = spark.createDataFrame(rows, ["g", "value"])
    out = {r.g: r for r in grouped_trimmed_stats(df, ["g"], "value", trim=0.1).collect()}
    assert out["a"].n == 10 and out["a"].n_used == 8
    assert out["a"].trimmed_mean == 5.5
    assert out["b"].n_used == 3 and out["b"].trimmed_mean == 5.0
