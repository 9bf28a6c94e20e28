"""Unit tests for the round-3 continuation operators: streaming KMV
partials, dictionary tagging, modularity, clipped n-gram overlap."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F


def test_stream_kmv_partials_match_batch_sketch(spark):
    """Merged streaming KMV partials must equal the one-pass batch
    sketch exactly (min-k lattice property), regardless of how rows
    were split across micro-batches."""
    from vmware_graph_spark.functions.sketch import kmv_distinct
    from vmware_graph_spark.streaming.events import kmv_merge_estimate

    rows = [(f"g{i % 3}", i % 97) for i in range(1200)]
    df = spark.createDataFrame(rows, "g string, v int")
    batch = kmv_distinct(df, ["g"], "v", k=16, seed=0).withColumnRenamed("g", "__g")

    # simulate the foreachBatch partials directly: 3 arbitrary splits,
    # each reduced to its k smallest distinct hashes per group
    from pyspark.sql import Window

    from vmware_graph_spark.functions.sketch import uniform_hash60

    out = tempfile.mkdtemp(prefix="kmv_parts_") + "/sketch"
    w = Window.partitionBy("__g").orderBy("__h")
    for i in range(3):
        part = (
            df.filter(F.col("v") % 3 == i)
            .select(F.col("g").alias("__g"), uniform_hash60("v", 0).alias("__h"))
            .distinct()
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= 16)
            .drop("__rn")
        )
        part.write.mode("append").parquet(out)
    merged = kmv_merge_estimate(spark, out, k=16)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, batch.collect()))


def test_dictionary_tag_counts_positions_and_overlaps(spark):
    from vmware_graph_spark.operators.tagging import dictionary_tag_counts

    df = spark.createDataFrame(
        [
            (1, "big red fox saw a big red fox"),
            (2, "red fox red"),
            (3, "nothing here"),
        ],
        "id int, text string",
    )
    out = dictionary_tag_counts(df, "id", "text", ["big red fox", "red fox", "red"])
    got = {(r.id, r.phrase): r.n_hits for r in out.collect()}
    assert got == {
        (1, "big red fox"): 2,
        (1, "red fox"): 2,
        (1, "red"): 2,
        (2, "red fox"): 1,
        (2, "red"): 2,
    }


def test_dictionary_tag_counts_rejects_bad_dictionary(spark):
    from vmware_graph_spark.operators.tagging import dictionary_tag_counts

    df = spark.createDataFrame([(1, "a b")], "id int, text string")
    with pytest.raises(ValueError):
        dictionary_tag_counts(df, "id", "text", [])
    with pytest.raises(ValueError):
        dictionary_tag_counts(df, "id", "text", ["ok", "  "])


def test_modularity_two_triangles_bridge(spark):
    """Two triangles joined by one bridge edge, communities = the
    triangles: m=7, intra=6, d_c=7 each → Q = 6/7 - 2·(7/14)² = 5/14."""
    from vmware_graph_spark.analytics.algos import modularity

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"),
         ("d", "e"), ("e", "f"), ("d", "f"),
         ("c", "d")],
        "src string, dst string",
    )
    mem = spark.createDataFrame(
        [("a", 1), ("b", 1), ("c", 1), ("d", 2), ("e", 2), ("f", 2)],
        "id string, community int",
    )
    row = modularity(edges, mem).collect()[0]
    assert (row.m, row.intra_edges) == (7, 6)
    assert row.modularity == round(6 / 7 - 0.5, 9)


def test_modularity_single_community_is_zero(spark):
    from vmware_graph_spark.analytics.algos import modularity

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    mem = spark.createDataFrame(
        [("a", 0), ("b", 0), ("c", 0)], "id string, community int"
    )
    row = modularity(edges, mem).collect()[0]
    # intra/m = 1; sum d_c^2 = (2m)^2 → second term = 1 → Q = 0
    assert row.modularity == 0.0


def test_clipped_ngram_overlap_identical_and_disjoint(spark):
    from vmware_graph_spark.operators.quality import clipped_ngram_overlap

    docs = spark.createDataFrame(
        [(1, "a b a c"), (2, "a b a c"), (3, "x y z w")],
        "doc_id int, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3)], "cand_id int, ref_id int"
    )
    uni = {
        (r.cand_id, r.ref_id): r.clipped_matches
        for r in clipped_ngram_overlap(docs, pairs, "doc_id", "text", n=1).collect()
    }
    # identical docs: every token matches (4); disjoint: no row at all
    assert uni == {(1, 2): 4}
    bi = {
        (r.cand_id, r.ref_id): r.clipped_matches
        for r in clipped_ngram_overlap(docs, pairs, "doc_id", "text", n=2).collect()
    }
    assert bi == {(1, 2): 3}


def test_clipped_ngram_overlap_clipping(spark):
    """Candidate repeats a gram more often than the reference — the
    match count is clipped to the reference's count."""
    from vmware_graph_spark.operators.quality import clipped_ngram_overlap

    docs = spark.createDataFrame(
        [(1, "a a a a"), (2, "a b")], "doc_id int, text string"
    )
    pairs = spark.createDataFrame([(1, 2)], "cand_id int, ref_id int")
    out = clipped_ngram_overlap(docs, pairs, "doc_id", "text", n=1).collect()
    assert out[0].clipped_matches == 1
