from vmware_graph_spark.store.graph import LABEL_KEYS, UNDIRECTED_TYPES, GraphStore

__all__ = ["GraphStore", "LABEL_KEYS", "UNDIRECTED_TYPES"]
