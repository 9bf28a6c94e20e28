from vmware_graph_spark.operators.merge import (
    canonical_edges,
    merge_edges,
    merge_edges_with_props,
    merge_nodes,
    upsert_last_writer_wins,
)
from vmware_graph_spark.operators.rank import exact_global_rank, ntile_from_rank
from vmware_graph_spark.operators.snapshot import snapshot_diff

__all__ = [
    "canonical_edges",
    "exact_global_rank",
    "merge_edges",
    "merge_edges_with_props",
    "merge_nodes",
    "ntile_from_rank",
    "snapshot_diff",
    "upsert_last_writer_wins",
]
