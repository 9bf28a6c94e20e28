from vmware_graph_spark.operators.merge import (
    canonical_edges,
    merge_edges,
    merge_nodes,
    upsert_last_writer_wins,
)
from vmware_graph_spark.operators.snapshot import snapshot_diff

__all__ = [
    "canonical_edges",
    "merge_edges",
    "merge_nodes",
    "snapshot_diff",
    "upsert_last_writer_wins",
]
