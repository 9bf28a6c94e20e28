"""vmware_graph_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of the reference `pdrangeid/vmware-graph`
(a Cypher ETL that ingests RVTools spreadsheets into a Neo4j property
graph; see /root/reference/refresh-vmware.cypher).

Architecture (Spark-first, not a translation):

- ``sources``   — parquet "workbook" readers (one directory = one RVTools
                  export, one parquet per sheet) + relational table loaders.
- ``functions`` — scalar shims that pin down Cypher semantics on Spark
                  (literal split, anchored regex match, try_cast int, ...),
                  plus text-analysis and vector helpers.
- ``operators`` — the engine's core algorithms: MERGE-style upsert
                  (last-writer-wins, deterministic), undirected-edge
                  canonicalization, snapshot diff + column-attributed
                  CDC changes, top-k (incl. incremental delta-merge),
                  dedup family (exact, Jaccard, MinHash/LSH, SimHash,
                  semantic, cross-corpus line dedup), similarity search
                  (brute-force JVM + Arrow paths, IVF sign/learned,
                  product quantization/ADC), temporal as-of/range joins
                  + SCD2 change intervals, skew salting, quality/robust
                  stats, multimodal column plumbing.
- ``store``     — the property-graph store: one vertex DataFrame per label
                  + one canonical edge DataFrame; snapshot writer.
- ``ingest``    — per-sheet ingest stages mirroring the reference's
                  statements (refresh-vmware.cypher:34-277), re-expressed
                  as declarative DataFrame pipelines, plus the refresh
                  protocol (mark → ingest → sweep) as a pure snapshot
                  rebuild + anti-join diff.
- ``analytics`` — bulk graph analytics (degrees, connected + strongly
                  connected components, PageRank + personalized PageRank,
                  BFS/shortest paths, transitive closure by doubling,
                  triangle counts, k-core, label propagation, HITS) over
                  the vertex/edge tables, plus ``motif_find`` — a
                  GraphFrames-``find()``-dialect pattern API with typed,
                  undirected, negated, and bounded variable-length terms.
- ``streaming`` — Structured Streaming ingest of event streams with
                  watermarks, windowed aggregation, stream-stream
                  interval joins, stateful sessionization, and CDC-style
                  foreachBatch MERGE INTO.
"""

__version__ = "0.1.0"
