from vmware_graph_spark.functions.scalar import (
    IPV4_RE,
    coalesce_default,
    concat_strict,
    path_last,
    rlike_full,
    split_literal,
    try_int,
)

__all__ = [
    "IPV4_RE",
    "coalesce_default",
    "concat_strict",
    "path_last",
    "rlike_full",
    "split_literal",
    "try_int",
]
