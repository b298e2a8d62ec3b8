"""Multi-store federation: find dedup and MultiReader leaf merge.

The reference federates finds across stores (whisper + dataMine,
`L_DataGraphiteAPI.lua:340-390`) but left the multi-leaf merge TODO
(`:384-386  -- TODO: MultiReader not yet implemented`).  This implements the
documented intent — graphite-web's MultiReader semantics: when the same
path is a leaf in several stores, fetch all of them and merge the slot
grids point-by-point, the highest-priority store's non-null value winning
each slot.

Scale shape: one union + one hash aggregation keyed (path, slot) with
map-side combine; the per-store priority is a literal column, so the merge
is a single shuffle regardless of store count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def multireader_merge(stores: list[DataFrame]) -> DataFrame:
    """Merge priority-ordered (path, slot, value) stores: per (path, slot),
    the FIRST store (lowest index) holding a non-null value wins.

    Slots absent from every store are absent here too — dense-grid nil
    fill stays the fetch layer's job, exactly as each store's own fetch
    would apply it.
    """
    if not stores:
        raise ValueError("multireader_merge needs at least one store")
    tagged = None
    for i, store in enumerate(stores):
        part = store.select(
            "path", "slot", "value", F.lit(i).alias("prio")
        ).where(F.col("value").isNotNull())
        tagged = part if tagged is None else tagged.unionByName(part)
    return tagged.groupBy("path", "slot").agg(
        F.min_by("value", "prio").alias("value")
    )
