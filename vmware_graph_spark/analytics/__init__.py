from vmware_graph_spark.analytics.algos import connected_components, degrees, pagerank

__all__ = ["connected_components", "degrees", "pagerank"]
