from vmware_graph_spark.ingest.refresh import RefreshResult, refresh, run_ingest

__all__ = ["refresh", "run_ingest", "RefreshResult"]
