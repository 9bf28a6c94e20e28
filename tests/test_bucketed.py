"""Bucketed layout: correctness + the zero-Exchange co-located join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from vmware_graph_spark.sources.bucketed import (
    assert_no_exchange,
    bucketed_join,
    write_bucketed,
)
from vmware_graph_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("buckets")
    orders = load_table(spark, SF_SMALL, "orders")
    lineitem = load_table(spark, SF_SMALL, "lineitem")
    o = write_bucketed(
        orders, "t_orders_b", ["o_orderkey"], num_buckets=8, path=str(root / "o")
    )
    l = write_bucketed(
        lineitem, "t_lineitem_b", ["l_orderkey"], num_buckets=8, path=str(root / "l")
    )
    return o, l, orders, lineitem


def test_bucketed_join_no_exchange(spark, bucketed_pair):
    o, l, *_ = bucketed_pair
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(
            o.withColumnRenamed("o_orderkey", "l_orderkey"), l, ["l_orderkey"]
        )
        agg = j.groupBy("o_orderstatus").agg(F.count("*").alias("n"))
        # Join is Exchange-free; the only shuffle allowed is the final
        # aggregation's, so check the join subtree alone.
        assert_no_exchange(j)
        agg.collect()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_join_matches_plain_join(spark, bucketed_pair):
    o, l, orders, lineitem = bucketed_pair
    got = (
        bucketed_join(o.withColumnRenamed("o_orderkey", "l_orderkey"), l, ["l_orderkey"])
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").cast("long").alias("qty"))
    )
    want = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").cast("long").alias("qty"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
