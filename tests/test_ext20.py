"""Unit tests for the round-4 continuation operators: language
mismatch audit, JSD mixture drift, cluster-size histogram, novelty."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_lang_mismatch_rates_consistent(spark):
    from vmware_graph_spark.queries_ext20 import lang_mismatch_audit_by_source

    out = lang_mismatch_audit_by_source(spark, SF).collect()
    assert out  # every source appears
    for r in out:
        assert 0 <= r.n_mismatch <= r.n_docs
        assert abs(r.mismatch_rate - round(r.n_mismatch / r.n_docs, 6)) < 1e-12


def test_jsd_extremes_disjoint_and_identical(spark, tmp_path):
    """Disjoint vocabularies → 1 bit; identical distributions → 0."""
    docs = spark.createDataFrame(
        [
            (1, "aa bb cc aa bb cc", "s1"),
            (2, "xx yy zz xx yy zz", "s2"),
        ],
        "doc_id bigint, text string, source string",
    )
    sf = str(tmp_path / "sf1")
    os.makedirs(sf)
    docs.write.parquet(f"{sf}/documents.parquet")
    from vmware_graph_spark.queries_ext20 import jsd_mixture_drift_by_source

    out = {r.source: r.jsd for r in jsd_mixture_drift_by_source(spark, sf).collect()}
    assert out == {"s1": 1.0, "s2": 1.0}

    same = spark.createDataFrame(
        [(1, "aa bb cc", "s1"), (2, "aa bb cc", "s2")],
        "doc_id bigint, text string, source string",
    )
    sf2 = str(tmp_path / "sf2")
    os.makedirs(sf2)
    same.write.parquet(f"{sf2}/documents.parquet")
    out2 = {r.source: r.jsd for r in jsd_mixture_drift_by_source(spark, sf2).collect()}
    assert out2 == {"s1": 0.0, "s2": 0.0}


def test_cluster_size_histogram_conserves_totals(spark):
    from vmware_graph_spark.analytics.algos import connected_components_star
    from vmware_graph_spark.operators.dedup import minhash_lsh_pairs
    from vmware_graph_spark.queries_ext20 import dedup_cluster_size_histogram
    from vmware_graph_spark.sources.tables import load_table

    out = dedup_cluster_size_histogram(spark, SF).collect()
    d = load_table(spark, SF, "documents")
    n_docs = d.count()
    pairs = minhash_lsh_pairs(
        d, "doc_id", "text", n=3, num_hashes=8, bands=4, verify_threshold=0.4
    )
    n_clusters = (
        connected_components_star(
            d.select(F.col("doc_id").alias("id")),
            pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
        )
        .select("component")
        .distinct()
        .count()
    )
    assert sum(r.n_docs for r in out) == n_docs
    assert sum(r.n_clusters for r in out) == n_clusters
    assert {r.size_bin for r in out} <= {1, 2, 4, 8, 16}


def test_novelty_first_doc_is_fully_novel_and_bounded(spark):
    from vmware_graph_spark.queries_ext20 import ngram_novelty_by_doc
    from vmware_graph_spark.sources.tables import load_table

    out = {r.doc_id: r for r in ngram_novelty_by_doc(spark, SF).collect()}
    first_id = min(out)
    assert out[first_id].novelty == 1.0  # nothing earlier to repeat
    d = load_table(spark, SF, "documents")
    # docs with >= 2 tokens have >= 1 trigram... (3+ tokens); coverage:
    for r in out.values():
        assert 1 <= r.n_novel or r.n_novel == 0
        assert 0.0 <= r.novelty <= 1.0
        assert r.n_novel <= r.n_grams
