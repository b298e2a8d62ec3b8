"""Custom stateful streaming operator: per-series LOCF gap-fill.

The reference renders gaps with the `hold` null policy at query time
(`/root/reference/L_DataGraph.lua:226-231`); on a continuous stream the same
semantics become a STATEFUL operator: every series must remember its last
observed value and last emitted slot across micro-batches so that gaps are
filled the moment the next point arrives.

Spark-first shape: `applyInPandasWithState` — per-series GroupState holding
``(last_slot, last_value)``; each batch emits the dense quantized slots from
the state's last slot forward, LOCF-filling interior gaps.  State is two
scalars per series (bounded), batches arrive Arrow-encoded, and the group
key partitioning is the same (path) shuffle the downstream rollups need.

This is the pattern slot for any custom stateful operator the DataFrame API
can't express (session gaps, change-point flags, rate counters): swap the
per-group fold, keep the plumbing.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "path string, slot bigint, value double, filled boolean"
STATE_SCHEMA = "last_slot bigint, last_value double"


def locf_fill_stream(datapoints: DataFrame, step: int) -> DataFrame:
    """Streaming dense-grid LOCF: (path, slot, value, filled) rows.

    Input: a STREAMING DataFrame (path, ts_sec, value).  For each series,
    emits every `step`-quantized slot from its previous watermark slot to
    the newest observed slot; slots with no observation carry the last value
    (`filled = true`).  Slot values follow last-write-wins within a batch
    (max ts_sec wins; ties by arrival order within the Arrow batch).
    """
    import pandas as pd

    def fill(
        key: tuple[Any, ...],
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        (path,) = key
        rows: dict[int, float] = {}
        for pdf in pdfs:
            for t, v in zip(pdf["ts_sec"], pdf["value"]):
                rows[int(t) - int(t) % step] = float(v)
        last_slot, last_value = (
            state.get if state.exists else (None, None)
        )
        if last_slot is not None:
            # late/out-of-order guard: slots at or before the emitted cursor
            # were already produced (append mode must never re-emit), and a
            # batch of ONLY stale slots must not regress the cursor — drop
            # them and leave state untouched.  Callers bound the staleness
            # with an upstream watermark; within that bound this is the
            # hold-policy semantics (the late value is older than what the
            # fill already carried forward).
            rows = {s: v for s, v in rows.items() if s > last_slot}
        if not rows:
            return
        out_slot: list[int] = []
        out_value: list[float] = []
        out_filled: list[bool] = []
        start = min(rows) if last_slot is None else last_slot + step
        end = max(rows)
        carry = last_value
        for slot in range(start, end + step, step):
            if slot in rows:
                carry = rows[slot]
                out_filled.append(False)
            else:
                out_filled.append(True)
            out_slot.append(slot)
            out_value.append(carry)
        state.update((end, carry))
        yield pd.DataFrame(
            {
                "path": [path] * len(out_slot),
                "slot": out_slot,
                "value": out_value,
                "filled": out_filled,
            }
        )

    return datapoints.groupBy("path").applyInPandasWithState(
        fill,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
