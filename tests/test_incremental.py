"""Incremental MERGE INTO sink: upsert, sweep, tenant scoping, pruning."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from vmware_graph_spark.store.incremental import IncrementalTable


def _rows(df):
    return {tuple(r) for r in df.select("k", "v", "managedby").collect()}


@pytest.fixture()
def table(spark, tmp_path):
    return IncrementalTable(spark, str(tmp_path / "tbl"), keys=["k"])


def _seed(spark, table):
    base = spark.createDataFrame(
        [Row(k="a", v=1, managedby="vcA"), Row(k="b", v=2, managedby="vcA"),
         Row(k="x", v=9, managedby="vcB")]
    )
    table.merge(base)
    return base


def test_initial_load_and_upsert(spark, table):
    _seed(spark, table)
    assert _rows(table.read()) == {("a", 1, "vcA"), ("b", 2, "vcA"), ("x", 9, "vcB")}

    # MERGE…SET: matched key overwritten, new key inserted, vcB untouched.
    table.merge(spark.createDataFrame(
        [Row(k="a", v=10, managedby="vcA"), Row(k="c", v=3, managedby="vcA")]
    ))
    assert _rows(table.read()) == {
        ("a", 10, "vcA"), ("b", 2, "vcA"), ("c", 3, "vcA"), ("x", 9, "vcB")
    }


def test_sweep_deletes_only_touched_tenant(spark, table):
    _seed(spark, table)
    # Refresh vcA with only key "a": sweep drops vcA's "b", never vcB.
    table.merge(
        spark.createDataFrame([Row(k="a", v=11, managedby="vcA")]),
        delete_missing=True,
    )
    assert _rows(table.read()) == {("a", 11, "vcA"), ("x", 9, "vcB")}


def test_idempotent_refresh(spark, table):
    _seed(spark, table)
    batch = spark.createDataFrame(
        [Row(k="a", v=1, managedby="vcA"), Row(k="b", v=2, managedby="vcA")]
    )
    table.merge(batch, delete_missing=True)
    first = _rows(table.read())
    table.merge(batch, delete_missing=True)
    assert _rows(table.read()) == first


def test_on_create_only_preserves_existing(spark, table):
    _seed(spark, table)
    table.merge(
        spark.createDataFrame(
            [Row(k="a", v=99, managedby="vcA"), Row(k="new", v=7, managedby="vcA")]
        ),
        on_create_only=True,
    )
    rows = _rows(table.read())
    assert ("a", 1, "vcA") in rows  # existing wins
    assert ("new", 7, "vcA") in rows  # insert-only lands


def test_partition_pruned_read(spark, table):
    _seed(spark, table)
    plan = table.read(["vcA"])._jdf.queryExecution().executedPlan().toString()
    # Tenant filter must reach the scan as a partition filter, not a
    # post-scan row filter over all partitions.
    assert "PartitionFilters: [" in plan
    assert "vcA" in plan


def test_snapshot_changes_column_attribution(spark):
    from vmware_graph_spark.operators.snapshot import snapshot_changes

    prev = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, None, 30), (4, "d", 40)],
        ["k", "s", "v"],
    )
    curr = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 21), (3, "now-set", 30), (5, "e", 50)],
        ["k", "s", "v"],
    )
    rows = {r.k: r for r in snapshot_changes(prev, curr, ["k"]).collect()}
    assert 1 not in rows  # unchanged keys are not reported
    assert rows[2].change == "changed" and rows[2].changed_cols == ["s", "v"]
    # null → value counts as a change (null-safe comparison)
    assert rows[3].change == "changed" and rows[3].changed_cols == ["s"]
    assert rows[4].change == "removed" and rows[4].changed_cols == []
    assert rows[5].change == "added" and rows[5].changed_cols == []


def test_snapshot_changes_rejects_missing_compare_cols(spark):
    import pytest as _pytest

    from vmware_graph_spark.operators.snapshot import snapshot_changes

    prev = spark.createDataFrame([(1, "a")], ["k", "s"])
    curr = spark.createDataFrame([(1,)], ["k"])
    with _pytest.raises(ValueError, match="absent from curr"):
        snapshot_changes(prev, curr, ["k"], compare_cols=["s"])
