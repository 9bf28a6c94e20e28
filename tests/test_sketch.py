"""Error-bound and determinism tests for approximate aggregates.

Covers the built-in engine sketches (``approx_count_distinct``,
``percentile_approx`` — the rows-only registry entries promise these
bounds) and the engine-portable deterministic sketches in
``functions/sketch.py`` (KMV distinct count, hash sampling, discrete
percentiles — the oracle-verified registry entries).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vmware_graph_spark.functions.sketch import (
    HASH_SPACE,
    disc_percentile,
    hash_sample,
    kmv_distinct,
)
from vmware_graph_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


def test_approx_count_distinct_error_bound(spark):
    e = load_table(spark, SF, "events")
    rows = (
        e.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id").alias("approx"),
            F.countDistinct("user_id").alias("exact"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r["approx"] - r["exact"]) <= 0.15 * r["exact"], r


def test_percentile_approx_error_bound(spark):
    e = load_table(spark, SF, "events")
    rows = (
        e.groupBy("event_type")
        .agg(
            F.percentile_approx("value", 0.5, 10000).alias("approx"),
            F.expr("percentile(value, 0.5)").alias("exact"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        spread = abs(r["exact"]) + 1e-9
        assert abs(r["approx"] - r["exact"]) <= 0.05 * spread, r


def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame(
        [("a", i % 7) for i in range(100)], ["g", "v"]
    )
    got = {r["g"]: r["est_distinct"] for r in kmv_distinct(df, ["g"], "v", k=64).collect()}
    assert got == {"a": 7}


def test_kmv_error_bound_at_scale(spark):
    e = load_table(spark, SF, "events").filter(F.col("user_id").isNotNull())
    est = kmv_distinct(e, ["event_type"], "user_id", k=256, seed=0)
    exact = e.groupBy("event_type").agg(F.countDistinct("user_id").alias("exact"))
    rows = est.join(exact, "event_type").collect()
    assert rows
    for r in rows:
        # RSE ~ 1/sqrt(k-2) ~ 6.3%; allow 4 sigma.
        assert abs(r["est_distinct"] - r["exact"]) <= 0.25 * r["exact"], r


def test_hash_sample_fraction_and_determinism(spark):
    e = load_table(spark, SF, "events")
    n = e.count()
    s1 = hash_sample(e, "event_id", 0.1, seed=1)
    k1 = s1.count()
    # Binomial(n, 0.1): 5-sigma band.
    sigma = (n * 0.1 * 0.9) ** 0.5
    assert abs(k1 - 0.1 * n) <= 5 * sigma
    # Deterministic: same ids kept on a re-read, regardless of partitioning.
    s2 = hash_sample(
        load_table(spark, SF, "events").repartition(7), "event_id", 0.1, seed=1
    )
    assert s1.select("event_id").subtract(s2.select("event_id")).count() == 0
    assert s2.select("event_id").subtract(s1.select("event_id")).count() == 0


def test_disc_percentile_type1_semantics(spark):
    df = spark.createDataFrame(
        [("a", float(v)) for v in range(1, 11)], ["g", "v"]
    )
    row = disc_percentile(df, ["g"], "v", [0.5, 0.9, 1.0], ["p50", "p90", "p100"]).collect()[0]
    # type-1 quantile: value at rank ceil(p*n) of n=10 sorted values.
    assert (row["p50"], row["p90"], row["p100"]) == (5.0, 9.0, 10.0)


def test_sampled_percentile_tracks_exact(spark):
    e = load_table(spark, SF, "events").filter(F.col("value").isNotNull())
    s = hash_sample(e, "event_id", 0.1, seed=1)
    approx = disc_percentile(s, ["event_type"], "value", [0.5], ["p50"])
    # The right accuracy metric for a sampled quantile is RANK error, not
    # value error: the sample median must land between the exact p40 and
    # p60 of the full data (rank error << 10 points for a 10% sample).
    exact = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.40)").alias("lo"),
        F.expr("percentile(value, 0.60)").alias("hi"),
    )
    rows = approx.join(exact, "event_type").collect()
    assert rows
    for r in rows:
        assert r["lo"] <= r["p50"] <= r["hi"], r


def test_hash_space_matches_hash_width(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], ["v"])
    from vmware_graph_spark.functions.sketch import uniform_hash60

    mx = df.select(F.max(uniform_hash60("v")).alias("m")).collect()[0]["m"]
    assert 0 < mx < HASH_SPACE


def test_stratified_sample_fractions(spark):
    from vmware_graph_spark.functions.sketch import stratified_hash_sample

    e = load_table(spark, SF, "events")
    s = stratified_hash_sample(
        e, "event_id", "event_type", {"click": 0.5, "view": 0.0}, default_fraction=1.0
    )
    got = {r.event_type: r.n for r in s.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    totals = {r.event_type: r.n for r in e.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    assert "view" not in got                       # fraction 0 drops all
    assert got["signup"] == totals["signup"]       # default 1.0 keeps all
    n, k = totals["click"], got["click"]
    sigma = (n * 0.25) ** 0.5
    assert abs(k - 0.5 * n) <= 5 * sigma           # ~50% of clicks kept


def test_weighted_sample_deterministic_and_weight_biased(spark):
    """Same input -> same sample; heavy keys are overrepresented
    relative to their population share (the point of the operator)."""
    from vmware_graph_spark.functions.sketch import weighted_sample
    from pyspark.sql import functions as F

    df = spark.range(2000).select(
        F.col("id"),
        # 10% of rows carry 50x the weight of the rest
        F.when(F.col("id") % 10 == 0, 500.0).otherwise(10.0).alias("w"),
    )
    s1 = weighted_sample(df, "id", "w", 100)
    s2 = weighted_sample(df, "id", "w", 100)
    ids1 = [r.id for r in s1.collect()]
    assert ids1 == [r.id for r in s2.collect()]
    assert len(ids1) == 100 and len(set(ids1)) == 100
    heavy = sum(1 for i in ids1 if i % 10 == 0)
    # heavy stratum is 10% of rows but 85% of total weight
    assert heavy > 50


def test_hash_split_stable_under_corpus_growth(spark):
    from vmware_graph_spark.functions.sketch import hash_split

    small = spark.range(100).withColumnRenamed("id", "k")
    big = spark.range(1000).withColumnRenamed("id", "k")
    s1 = {r.k: r.split for r in hash_split(small, "k").collect()}
    s2 = {r.k: r.split for r in hash_split(big, "k").collect()}
    # appending rows never flips an existing key's split
    assert all(s2[k] == v for k, v in s1.items())
    # all three bands populated, proportions roughly 80/10/10
    from collections import Counter

    c = Counter(s2.values())
    assert set(c) == {"train", "val", "test"}
    assert 700 < c["train"] < 900


def test_hash_split_validates_args(spark):
    import pytest as _pytest

    from vmware_graph_spark.functions.sketch import hash_split

    df = spark.range(5).withColumnRenamed("id", "k")
    with _pytest.raises(ValueError):
        hash_split(df, "k", weights=(0.5, 0.5), names=("only",))


def test_cms_never_underestimates_and_finds_heavy_hitters(spark):
    from vmware_graph_spark.functions.sketch import cms_heavy_hitters

    # 'hot' appears 60×, 'warm' 20×, 100 singletons force collisions
    # into a deliberately tiny 16-counter sketch.
    rows = (
        [("hot",)] * 60 + [("warm",)] * 20 + [(f"cold-{i}",) for i in range(100)]
    )
    df = spark.createDataFrame(rows, ["v"])
    est = {r.value: r.est for r in cms_heavy_hitters(df, "v", width=16, depth=4).collect()}
    true = {"hot": 60, "warm": 20, **{f"cold-{i}": 1 for i in range(100)}}
    # one-sided error: estimates never drop below the true count
    assert all(est[v] >= c for v, c in true.items())
    # heavy hitters clear a threshold the tail cannot reach by collisions alone
    heavy = {r.value for r in cms_heavy_hitters(df, "v", width=16, depth=4, min_count=50).collect()}
    assert "hot" in heavy and "warm" not in heavy
