"""CLI: run a full RVTools refresh end-to-end.

    python -m vmware_graph_spark refresh WORKBOOK_DIR SNAPSHOT_DIR
    python -m vmware_graph_spark refresh export.xlsx SNAPSHOT_DIR

WORKBOOK_DIR is one export as per-sheet parquet/CSV files, or a single
genuine RVTools ``.xlsx`` workbook (read via the dependency-free OOXML
parser in ``sources/workbook.py``); SNAPSHOT_DIR holds the graph
snapshot. If a
snapshot already exists there it is the *previous* graph: the run
executes the reference's mark-and-sweep against it (refresh-vmware
.cypher:26-31,527-530) and reports swept orphans; otherwise it is a
first full build. Prints one JSON line of progress counts (the S5
progress-sink analog of the reference's row-count returns).
"""

from __future__ import annotations

import json
import sys


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) != 3 or argv[0] != "refresh":
        print(__doc__, file=sys.stderr)
        return 2
    _, workbook_dir, snapshot_dir = argv

    import os

    from vmware_graph_spark.ingest.refresh import refresh
    from vmware_graph_spark.session import get_spark
    from vmware_graph_spark.sources.workbook import (
        read_workbook_dir,
        read_workbook_xlsx,
    )
    from vmware_graph_spark.store.graph import GraphStore

    spark = get_spark("vmware-graph-refresh")
    spark.sparkContext.setLogLevel("ERROR")

    if os.path.isfile(workbook_dir) and workbook_dir.lower().endswith(".xlsx"):
        sheets = read_workbook_xlsx(spark, workbook_dir)
    else:
        sheets = read_workbook_dir(spark, workbook_dir)
    prev = GraphStore.read(spark, snapshot_dir)
    res = refresh(spark, sheets, prev=prev if prev.labels() else None)
    # Count orphans BEFORE publish: their lineage reads the previous
    # snapshot, which publish() replaces.
    orphans_swept = res.orphans.count()
    res.store.publish(snapshot_dir)

    out = {"orphans_swept": orphans_swept}
    out.update(GraphStore.read(spark, snapshot_dir).counts())
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
