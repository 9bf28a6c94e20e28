"""Round-3 extensions: snapshot-level graph-analytics integration.

Same registry/oracle discipline as ``queries.py``. These queries prove
the store → write → read → analytics_views → algos pipeline END TO END
under the mark-and-sweep refresh — round-2 VERDICT "Next round" #8:
the other graph queries build their vertex/edge frames in-query; here
the algorithms consume a snapshot that was REFRESHED (A → A′), WRITTEN
to parquet and REREAD, so persistence, sweep and the analytics surface
are all on the hook at once.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from vmware_graph_spark.queries import (
    _HOST_BASE_SQL,
    _vcluster_sheet,
    _vhost_sheet,
    query,
)


@query(
    "snapshot_cc_membership_after_refresh",
    f"""
    WITH h AS ({_HOST_BASE_SQL}),
    hosts AS (
      SELECT sk, cluster, uid FROM h WHERE sk % 10 <> 0 AND sk % 11 <> 0
    )
    SELECT cluster, uid AS vcenter, count(*) + 1 AS n_members
    FROM hosts GROUP BY cluster, uid
    """,
)
def snapshot_cc_membership_after_refresh(spark, sf_dir):
    """Connected components over a WRITTEN-AND-REREAD snapshot after an
    A→A′ refresh: build pass A (vCluster+vHost), refresh with the prime
    workbook (every 10th host dropped → swept, refresh-vmware.cypher:
    26-31,527-530), persist with ``GraphStore.write``, ``read`` it
    back, and run star-contraction CC over the ``analytics_views``
    MEMBER_OF_CLUSTER slice. Each cluster's component is labeled by the
    cluster vertex id (lexicographic minimum — 'Vcentercluster…' sorts
    below 'Vspherehost…'), so component sizes ARE cluster memberships:
    (cluster, vcenter, hosts+1). The oracle recomputes membership from
    the sheet fixtures' branch conditions (sk%10 sweep, sk%11 unknown-
    cluster drop). Proves sweep correctness *through* the persisted
    edge table, not just in-memory."""
    from vmware_graph_spark.analytics.algos import connected_components
    from vmware_graph_spark.ingest.refresh import refresh, run_ingest
    from vmware_graph_spark.store.graph import US, GraphStore

    sheets_a = {
        "vCluster": _vcluster_sheet(spark, sf_dir),
        "vHost": _vhost_sheet(spark, sf_dir),
    }
    sheets_prime = {
        "vCluster": _vcluster_sheet(spark, sf_dir),
        "vHost": _vhost_sheet(spark, sf_dir, prime=True),
    }
    prev = run_ingest(spark, sheets_a)
    final = refresh(spark, sheets_prime, prev=prev).store

    path = tempfile.mkdtemp(prefix="vgs_snap_cc_")
    final.write(path)
    back = GraphStore.read(spark, path)

    _, e = back.analytics_views()
    member = e.filter(F.col("rel_type") == "MEMBER_OF_CLUSTER").select("src", "dst")
    verts = (
        member.select(F.col("src").alias("id"))
        .unionByName(member.select(F.col("dst").alias("id")))
        .distinct()
    )
    cc = connected_components(verts, member)
    return (
        cc.groupBy("component")
        .agg(F.count("*").alias("n_members"))
        .select(
            F.split_part(F.col("component"), F.lit(US), F.lit(2)).alias("cluster"),
            F.split_part(F.col("component"), F.lit(US), F.lit(3)).alias("vcenter"),
            "n_members",
        )
    )
