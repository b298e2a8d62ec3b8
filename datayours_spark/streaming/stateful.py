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


HH_OUTPUT_SCHEMA = "shard int, token string, est_count bigint, max_err bigint"
HH_STATE_SCHEMA = (
    "tokens array<string>, counts array<bigint>, errs array<bigint>"
)


def heavy_hitters_stream(
    tokens: DataFrame, capacity: int = 16, shards: int = 8
) -> DataFrame:
    """Streaming heavy hitters: SHARDED space-saving sketch with bounded
    state — the continuous counterpart of the batch repetition/top-ngram
    screens (`q_top_ngrams`, `q_repetition_filter`).

    Input: a STREAMING DataFrame with a ``token`` string column (plus a
    ``shard`` int column if pre-sharded; otherwise add
    ``pmod(xxhash64(token), shards)``).  Each shard's GroupState holds at
    most ``capacity`` (token, count, err) triples (the Metwally et al.
    space-saving summary): a token not in the summary evicts the current
    minimum and inherits its count as error.  Guarantees per shard:
    est_count - max_err <= true_count <= est_count, and any token with
    true frequency > batch_total/capacity is IN the summary.

    Sharding by token hash keeps the guarantee intact — every token's
    counter lives in exactly one shard, so per-shard bounds are global
    bounds for that token — while the state per group stays
    ``capacity`` triples and updates parallelize across shards.  After
    each batch the shard's full summary re-emits (update semantics:
    downstream keeps the latest row per (shard, token)).
    """
    import pandas as pd

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        (shard,) = key
        if state.exists:
            toks, counts, errs = state.get
            summary = {
                t: [int(c), int(e)] for t, c, e in zip(toks, counts, errs)
            }
        else:
            summary = {}
        touched = False
        for pdf in pdfs:
            for tok in pdf["token"]:
                touched = True
                tok = str(tok)
                if tok in summary:
                    summary[tok][0] += 1
                elif len(summary) < capacity:
                    summary[tok] = [1, 0]
                else:
                    # evict the min (ties by token for determinism) and
                    # inherit its count as this token's error bound
                    evict = min(summary.items(), key=lambda kv: (kv[1][0], kv[0]))
                    mc = evict[1][0]
                    del summary[evict[0]]
                    summary[tok] = [mc + 1, mc]
        if not touched:
            return
        items = sorted(summary.items())
        state.update((
            [t for t, _ in items],
            [c for _, (c, _) in items],
            [e for _, (_, e) in items],
        ))
        yield pd.DataFrame(
            {
                "shard": [shard] * len(items),
                "token": [t for t, _ in items],
                "est_count": [c for _, (c, _) in items],
                "max_err": [e for _, (_, e) in items],
            }
        )

    return tokens.groupBy("shard").applyInPandasWithState(
        update,
        outputStructType=HH_OUTPUT_SCHEMA,
        stateStructType=HH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
