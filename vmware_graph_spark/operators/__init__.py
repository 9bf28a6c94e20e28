from vmware_graph_spark.operators.dedup import (
    dedup_against,
    dedup_against_index,
    dedup_against_prepared,
    prepare_dedup_reference,
    release_dedup_reference,
    exact_dedup,
    extend_dedup_index,
    minhash_lsh_pairs,
    write_dedup_index,
)
from vmware_graph_spark.operators.merge import (
    canonical_edges,
    merge_edges,
    merge_edges_with_props,
    merge_nodes,
    upsert_last_writer_wins,
)
from vmware_graph_spark.operators.multimodal import (
    audio_rms_windows,
    decode_audio_stdlib,
    decode_image_stdlib,
    decode_images,
)
from vmware_graph_spark.operators.rank import (
    bucketed_carry,
    bucketed_prefix_sum,
    exact_global_rank,
    ntile_from_rank,
)
from vmware_graph_spark.operators.snapshot import snapshot_diff

__all__ = [
    "audio_rms_windows",
    "canonical_edges",
    "dedup_against",
    "dedup_against_index",
    "dedup_against_prepared",
    "prepare_dedup_reference",
    "release_dedup_reference",
    "decode_audio_stdlib",
    "decode_image_stdlib",
    "decode_images",
    "exact_dedup",
    "bucketed_carry",
    "bucketed_prefix_sum",
    "exact_global_rank",
    "extend_dedup_index",
    "merge_edges",
    "merge_edges_with_props",
    "merge_nodes",
    "minhash_lsh_pairs",
    "ntile_from_rank",
    "snapshot_diff",
    "upsert_last_writer_wins",
    "write_dedup_index",
]
