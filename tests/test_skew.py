"""Skew-handling guardrails: AQE skew-join activation + salted-join
equivalence under extreme key skew."""

from __future__ import annotations

from pyspark.sql import functions as F

from vmware_graph_spark.operators.skew import salted_join


def _skewed_frames(spark, n=200_000):
    # 95% of rows share one key — the classic hot-key join shape.
    big = spark.range(n).select(
        F.when(F.col("id") % 20 != 0, "hot").otherwise(F.concat(F.lit("k"), F.col("id"))).alias("k"),
        F.col("id").alias("payload"),
    )
    small = big.select("k").distinct().withColumn("attr", F.length("k"))
    return big, small


def test_aqe_skew_join_is_enabled_and_plan_adaptive(spark):
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    big, small = _skewed_frames(spark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = big.join(small, "k")
        # AQE replans at runtime; the final plan must be adaptive and a
        # shuffle join (the shape AQE's skew splitting applies to).
        joined.write.format("noop").mode("overwrite").save()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "AdaptiveSparkPlan" in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_salted_join_rowset_identical_to_plain(spark):
    big, small = _skewed_frames(spark, n=50_000)
    plain = big.join(small, "k")
    salted = salted_join(big, small, ["k"], salts=8)
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).isEmpty()
    assert plain.exceptAll(salted).isEmpty()


def test_salted_join_spreads_hot_key(spark):
    big, small = _skewed_frames(spark, n=50_000)
    salted = big.withColumn("__salt", F.pmod(F.hash("payload"), F.lit(8)))
    per_salt = (
        salted.filter(F.col("k") == "hot").groupBy("__salt").count().collect()
    )
    # The hot key's rows land on all 8 salt values, roughly evenly.
    assert len(per_salt) == 8
    counts = [r["count"] for r in per_salt]
    assert max(counts) < 2 * min(counts)
