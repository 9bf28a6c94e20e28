"""Incremental MERGE INTO sink over tenant-partitioned parquet.

The reference's refresh is a full mark→ingest→sweep pass per vCenter
(refresh-vmware.cypher:26-31,525-530): every node of the tenant is
flagged, re-asserted by the ingest MERGEs, and the leftovers DETACH
DELETEd. ``GraphStore.write`` re-expresses that as whole-snapshot
replacement; this module is the *incremental* variant SURVEY §2.9 calls
out: the exact semantics of

    MERGE INTO target USING updates ON keys
      WHEN MATCHED             THEN UPDATE SET *
      WHEN NOT MATCHED         THEN INSERT *
      WHEN NOT MATCHED BY SOURCE AND tenant IN (touched) THEN DELETE

implemented with the public DataFrame API on plain parquet (no Delta /
Iceberg dependency — on a real lakehouse you would swap ``_rewrite``
for a Delta ``MERGE INTO`` and keep the same planner-facing shape).

Scale design (100 TB):
- the table is hive-partitioned by the tenant column (``managedby`` —
  one vCenter's estate per partition). A refresh touches ONLY the
  tenant partitions present in the update batch: the read is
  partition-pruned to those values and the write uses *dynamic
  partition overwrite*, so untouched tenants' files are never read or
  rewritten. Cost per refresh is O(touched tenants), not O(table).
- within the touched partitions the merge is
  ``operators.merge.upsert_last_writer_wins`` — one shuffle on the
  natural key, per-column MERGE…SET semantics.
- the sweep (``delete_missing=True``) is the same anti-join that
  ``operators.snapshot.snapshot_diff`` uses — no mutable flags.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vmware_graph_spark.operators.merge import upsert_last_writer_wins


class IncrementalTable:
    """A tenant-partitioned parquet table with MERGE INTO semantics."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        keys: Sequence[str],
        *,
        tenant_col: str = "managedby",
    ):
        self.spark = spark
        self.path = path
        self.keys = list(keys)
        self.tenant_col = tenant_col
        if tenant_col in self.keys:
            raise ValueError("tenant_col partitions the table; keys are within-tenant")

    # -- read ---------------------------------------------------------------

    def exists(self) -> bool:
        return os.path.isdir(self.path) and any(
            not e.startswith(("_", ".")) for e in os.listdir(self.path)
        )

    def read(self, tenants: Sequence[str] | None = None) -> DataFrame:
        """Current table contents; ``tenants`` prunes to those partition
        directories (shows as ``PartitionFilters`` in the scan)."""
        df = self.spark.read.parquet(self.path)
        if tenants is not None:
            df = df.filter(F.col(self.tenant_col).isin(list(tenants)))
        return df

    # -- merge --------------------------------------------------------------

    def merge(
        self,
        updates: DataFrame,
        *,
        delete_missing: bool = False,
        on_create_only: bool = False,
    ) -> dict[str, int]:
        """MERGE ``updates`` into the table; returns per-phase row counts.

        ``delete_missing=True`` adds the reference's sweep: rows of a
        *touched* tenant whose key is absent from this batch are dropped
        (WHEN NOT MATCHED BY SOURCE … DELETE, scoped exactly like
        refresh-vmware.cypher:529's ``n.managedby=vc.uid`` guard —
        other tenants are never affected).
        """
        updates = updates.filter(F.col(self.tenant_col).isNotNull())
        if not self.exists():
            merged = upsert_last_writer_wins(None, updates, self.keys + [self.tenant_col])
            return self._rewrite(merged)

        # Partition-pruned read: only tenants present in the batch.
        tenants = [r[0] for r in updates.select(self.tenant_col).distinct().collect()]
        existing = self.read(tenants)
        if delete_missing:
            # Sweep within touched tenants: keep only re-asserted keys.
            existing = existing.join(
                updates.select(*self.keys, self.tenant_col).distinct(),
                on=self.keys + [self.tenant_col],
                how="left_semi",
            )
        merged = upsert_last_writer_wins(
            existing,
            updates,
            self.keys + [self.tenant_col],
            updates_win=not on_create_only,
        )
        return self._rewrite(merged)

    def _rewrite(self, merged: DataFrame) -> dict[str, int]:
        # Materialize before overwriting the path we just read
        # (parquet-on-path cannot overwrite its own input mid-plan; a
        # transactional table format replaces this with a commit).
        merged = merged.localCheckpoint(eager=True)
        n = merged.count()
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(self.tenant_col)
            .parquet(self.path)
        )
        return {"rows_written": n}
