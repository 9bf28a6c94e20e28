"""MERGE-family operators — the reference's defining primitive.

The reference issues ~247 Cypher MERGE clauses (node upsert by natural
key, SURVEY §2.4) and ~110 relationship MERGEs, many in the *undirected*
form ``(a)-[:T]-(b)`` which matches either direction. Re-expressed for
Spark's immutable, snapshot-oriented model:

- node MERGE  → deterministic last-writer-wins dedup on the key columns
  (window + row_number, never bare dropDuplicates — SURVEY "hard parts").
- MERGE…SET   → updates overwrite matched rows (new source wins).
- MERGE…ON CREATE SET → existing rows win; source only fills gaps.
- rel MERGE   → append + distinct on (src, rel_type, dst), with
  undirected types canonicalized by sorted endpoint pair so the same
  edge asserted in both directions dedups to one row.

Scale notes: all shapes are single-shuffle on the key columns; at 100 TB
the vertex tables are written bucketed by key so repeated refreshes
reuse the layout, and the window dedup becomes a per-bucket local sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Column ordering sentinel for "new beats old" priority.
_PRIORITY = "__merge_priority"
_PICK = "__merge_pick"


def _drop_null_keys(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Cypher MERGE on a null key property fails that row; we drop (not
    insert) null-keyed rows (SURVEY §7 hard parts)."""
    cond = None
    for k in keys:
        c = F.col(k).isNotNull()
        cond = c if cond is None else (cond & c)
    return df.filter(cond) if cond is not None else df


def upsert_last_writer_wins(
    existing: DataFrame | None,
    updates: DataFrame,
    keys: Sequence[str],
    *,
    updates_win: bool = True,
) -> DataFrame:
    """Core upsert: one row per key, deterministic winner.

    ``updates_win=True``  → MERGE … SET   (refresh-vmware.cypher:35,39-40)
    ``updates_win=False`` → MERGE … ON CREATE SET (refresh-vmware.cypher:284-287)

    Determinism: duplicates *within* ``updates`` are resolved by a total
    ordering over all non-key columns (matching "last writer wins" under
    any input order — the reference's row order is spreadsheet order,
    which Spark must not depend on).
    """
    updates = _drop_null_keys(updates, keys)
    if existing is None:
        both = updates.withColumn(_PRIORITY, F.lit(0))
    else:
        existing = _drop_null_keys(existing, keys)
        updates = updates.withColumn(_PRIORITY, F.lit(0 if updates_win else 1))
        existing = existing.withColumn(_PRIORITY, F.lit(1 if updates_win else 0))
        both = updates.unionByName(existing, allowMissingColumns=True)

    value_cols = [c for c in both.columns if c not in keys and c != _PRIORITY]
    # Total order: priority, then the row's own values — ties are
    # identical rows, so the pick is deterministic regardless of
    # partitioning or input order.
    order = [F.col(_PRIORITY).asc()] + [F.col(c).asc_nulls_last() for c in value_cols]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        both.withColumn(_PICK, F.row_number().over(w))
        .filter(F.col(_PICK) == 1)
        .drop(_PICK, _PRIORITY)
    )


def merge_nodes(
    existing: DataFrame | None,
    updates: DataFrame,
    keys: Sequence[str],
    *,
    on_create_only: bool = False,
) -> DataFrame:
    """Node MERGE (M1-M3, SURVEY §2.4)."""
    return upsert_last_writer_wins(existing, updates, keys, updates_win=not on_create_only)


# Relationship types the reference merges with the undirected pattern
# ``(a)-[:T]-(b)`` (refresh-vmware.cypher:41,76,173-174,248,251,257,259,276
# et al.). For these, (A)->(B) and (B)->(A) are the SAME edge.
EDGE_COLS = ["src_label", "src_key", "rel_type", "dst_label", "dst_key"]


def canonical_edges(edges: DataFrame, undirected_types: Sequence[str] = ()) -> DataFrame:
    """Canonicalize undirected-merged edges by sorted endpoint pair.

    For rel types in ``undirected_types``, swap endpoints when
    (dst_label, dst_key) < (src_label, src_key) so both assertions of the
    same undirected edge collapse under distinct. Directed types pass
    through untouched.
    """
    if not undirected_types:
        return edges
    is_und = F.col("rel_type").isin(list(undirected_types))
    swap = is_und & (
        F.struct("dst_label", "dst_key").cast("string")
        < F.struct("src_label", "src_key").cast("string")
    )
    out = edges
    for a, b in (("src_label", "dst_label"), ("src_key", "dst_key")):
        out = out.withColumn(f"__new_{a}", F.when(swap, F.col(b)).otherwise(F.col(a)))
        out = out.withColumn(f"__new_{b}", F.when(swap, F.col(a)).otherwise(F.col(b)))
    for c in ("src_label", "src_key", "dst_label", "dst_key"):
        out = out.withColumn(c, F.col(f"__new_{c}")).drop(f"__new_{c}")
    return out


def merge_edges(
    existing: DataFrame | None,
    updates: DataFrame,
    *,
    undirected_types: Sequence[str] = (),
    prop_cols: Sequence[str] = (),
) -> DataFrame:
    """Relationship MERGE (M4): distinct edge per (endpoints, type).

    Edge properties (only ``HW_VERSION.upgradestatus`` in the reference,
    refresh-vmware.cypher:187,212) ride along; when the same edge is
    asserted twice with different props, last-writer-wins applies.
    """
    updates = canonical_edges(updates, undirected_types)
    updates = _drop_null_keys(updates, ["src_key", "dst_key"])
    if existing is not None:
        existing = canonical_edges(existing, undirected_types)
    if not prop_cols:
        cur = updates.select(*EDGE_COLS).distinct()
        if existing is None:
            return cur
        return existing.select(*EDGE_COLS).unionByName(cur).distinct()
    return upsert_last_writer_wins(existing, updates, EDGE_COLS)
