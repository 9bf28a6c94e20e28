"""Snapshot diff — the mark-and-sweep refresh protocol, Spark-native.

The reference flags every node of the refreshed vCenter `unverified`,
re-asserts what the new export contains, and DETACH-DELETEs the rest
(refresh-vmware.cypher:26-31,527-530). On Spark there are no mutable
flags: the new snapshot is built purely from this run's input, and the
orphan set is a tenant-scoped anti-join (SURVEY §2.9). This is
embarrassingly parallel and shuffle-light: one hash-partitioned
anti-join per table on the natural key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    prev: DataFrame,
    curr: DataFrame,
    keys: Sequence[str],
    *,
    tenant_col: str | None = "managedby",
    tenants: Sequence[str] | None = None,
) -> DataFrame:
    """Rows of ``prev`` absent from ``curr`` — the swept orphans (J7/D2).

    Scoped like the reference's sweep: only tenants present in this
    run's input are eligible (refresh-vmware.cypher:28,529 scope the
    mark/sweep to ``n.managedby = vc.uid``). Other tenants' rows are
    never reported, exactly as their nodes are never flagged.
    """
    scoped = prev
    if tenant_col and tenant_col in prev.columns:
        if tenants is not None:
            scoped = prev.filter(F.col(tenant_col).isin(list(tenants)))
        else:
            tenant_keys = curr.select(tenant_col).distinct()
            scoped = prev.join(F.broadcast(tenant_keys), on=tenant_col, how="left_semi")
    return scoped.join(curr.select(*keys).distinct(), on=list(keys), how="left_anti")


def sweep_edges(edges: DataFrame, orphan_ids: DataFrame) -> DataFrame:
    """Drop edges incident (either endpoint) to orphaned vertices (D1).

    ``orphan_ids`` must have columns (label, key). Two anti-joins — the
    Cypher ``OPTIONAL MATCH (n)-[r]-() DELETE r`` on marked nodes
    (refresh-vmware.cypher:30-31).
    """
    src_gone = orphan_ids.select(
        F.col("label").alias("src_label"), F.col("key").alias("src_key")
    )
    dst_gone = orphan_ids.select(
        F.col("label").alias("dst_label"), F.col("key").alias("dst_key")
    )
    return edges.join(src_gone, ["src_label", "src_key"], "left_anti").join(
        dst_gone, ["dst_label", "dst_key"], "left_anti"
    )
