"""Pure-Python oracle re-implementing the reference's slot/rollup arithmetic.

~60 lines of the ring math from `/root/reference/L_DataWhisper.lua` (update
slot overwrite 346-354, propagate window aggregation 469-491, fetch grid
379-408), used to differential-test the Spark operators (SURVEY.md §5.4).

Batch-recompute interpretation: each rollup level derives from the previous
(gated) level's slots, which matches the reference's cascade when writes stay
in retention and arrive per-slot (the per-write abort subtlety only diverges
when an xff-failing intermediate level later recovers — covered separately by
unit tests, not the fuzz).
"""

from __future__ import annotations


def aggregate(method: str, known: list[tuple[int, float]]) -> float:
    """known = [(slot_ts, value)] in time order (L_DataWhisper.lua:205-215)."""
    values = [v for _, v in known]
    if method == "average":
        return sum(values) / len(values)
    if method == "sum":
        return sum(values)
    if method == "max":
        return max(values)
    if method == "min":
        return min(values)
    if method == "last":
        return known[-1][1]
    raise ValueError(method)


def lww(writes: list[tuple[int, float]], step: int) -> dict[int, float]:
    """Sequential slot overwrite: later writes win (L_DataWhisper.lua:346-354)."""
    slots: dict[int, float] = {}
    for ts, value in writes:
        slots[ts - ts % step] = value
    return slots


def rollup_level(
    higher: dict[int, float], higher_step: int, lower_step: int, method: str, xff: float
) -> dict[int, float]:
    """Aggregate higher slots into lower slots with the xFF gate
    (L_DataWhisper.lua:469-491)."""
    out: dict[int, float] = {}
    windows: dict[int, list[tuple[int, float]]] = {}
    for slot, value in sorted(higher.items()):
        windows.setdefault(slot - slot % lower_step, []).append((slot, value))
    total = lower_step // higher_step
    for lslot, known in windows.items():
        if len(known) / total >= xff:
            out[lslot] = aggregate(method, known)
    return out


def fetch(
    slots: dict[int, float], from_time: int, until_time: int, step: int
) -> dict[int, float | None]:
    """Dense grid with None holes, bounds quantized inclusive
    (L_DataWhisper.lua:379-408)."""
    lo = from_time - from_time % step
    hi = until_time - until_time % step
    return {t: slots.get(t) for t in range(lo, hi + step, step)}
