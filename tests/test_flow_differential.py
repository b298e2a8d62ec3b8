"""Flow-limit differential fuzz: random batch/cap sequences through the
real streaming pipeline vs a driver-side Python simulator of the T8
semantics (token bucket, 60-s create ledger, queue bound, pending cache).

The unit tests pin hand-picked scenarios; this sweeps randomized ones and
asserts the exact admitted set per wall-clock step plus conservation
(every arrived row is admitted, dropped-with-tally, or still pending).
"""

from __future__ import annotations

import random
import shutil
from pathlib import Path

import pytest

from datayours_spark.streaming.ingest import IngestPipeline
from tests.test_streaming_ingest import FakeClock

TMP = Path(__file__).resolve().parent / "_tmp" / "flowfuzz"
NOW = 1_704_672_000


def simulate(batches, caps):
    """Pure-Python replay of the admission semantics.

    batches: list of lists of (path, ts, value) arriving per step (1 s
    apart).  Returns (written rows set, tallies by metric, pending count).
    """
    upd, crm, quo, cache = caps
    tokens = float(upd) if upd is not None else None
    create_times: list[float] = []
    known: set[str] = set()
    pending: list[tuple] = []  # (path, ts, value)
    written: list[tuple] = []
    tallies = {"dropped_queue": 0, "deferred_creates": 0,
               "deferred_updates": 0, "dropped_cache": 0}
    for step, rows in enumerate(batches):
        now = float(step)
        rows = list(rows)
        # queue bound on this step's arrivals
        if quo is not None and len(rows) > quo:
            tallies["dropped_queue"] += len(rows) - quo
            rows = rows[:quo]
        work_p, work_n = list(pending), rows
        defer_p, defer_n = [], []
        # create gate over a sliding 60 s ledger
        if crm is not None:
            create_times = [t for t in create_times if now - t < 60.0]
            budget = max(0, crm - len(create_times))
            series = sorted(
                {p for p, *_ in work_p + work_n} - known
            )
            allowed, blocked = set(series[:budget]), set(series[budget:])
            if blocked:
                tallies["deferred_creates"] += sum(
                    1 for p, *_ in work_p + work_n if p in blocked
                )
                defer_p += [r for r in work_p if r[0] in blocked]
                defer_n += [r for r in work_n if r[0] in blocked]
                work_p = [r for r in work_p if r[0] not in blocked]
                work_n = [r for r in work_n if r[0] not in blocked]
            create_times += [now] * len(allowed)
        # update token bucket, pending first
        if tokens is not None:
            tokens = min(float(upd), tokens + upd * 1.0) if step else tokens
            budget = int(tokens)
            avail = len(work_p) + len(work_n)
            if budget < avail:
                tallies["deferred_updates"] += avail - budget
                take_p = min(budget, len(work_p))
                take_n = budget - take_p
                defer_p += work_p[take_p:]
                defer_n += work_n[take_n:]
                work_p, work_n = work_p[:take_p], work_n[:take_n]
                tokens -= budget
            else:
                tokens -= avail
        admitted = work_p + work_n
        written += admitted
        known |= {p for p, *_ in admitted}
        pending = defer_p + defer_n
        if cache is not None and len(pending) > cache:
            tallies["dropped_cache"] += len(pending) - cache
            pending = pending[:cache]
    return written, tallies, len(pending)


@pytest.mark.parametrize("seed", range(4))
def test_pipeline_matches_simulator(spark, seed):
    rng = random.Random(seed)
    caps = (
        rng.choice([None, 3, 5]),            # max_updates_per_second
        rng.choice([None, 1, 2]),            # max_creates_per_minute
        rng.choice([None, 6]),               # max_queue
        rng.choice([None, 4, 8]),            # max_cache
    )
    n_steps = rng.randint(2, 4)
    t0 = NOW - 600
    seq = 0
    batches = []
    for _ in range(n_steps):
        rows = []
        for _ in range(rng.randint(0, 8)):
            path = f"m.{rng.choice('abc')}"
            rows.append((path, t0 + seq, float(seq)))
            seq += 1
        batches.append(rows)

    shutil.rmtree(TMP, ignore_errors=True)
    (TMP / "in").mkdir(parents=True)
    clock = FakeClock()
    p = IngestPipeline(
        spark=spark,
        input_dir=str(TMP / "in"),
        output_dir=str(TMP / "out"),
        checkpoint_dir=str(TMP / "ckpt"),
        now_override=NOW,
        rollup_steps=(60,),
        clock=clock,
        max_updates_per_second=caps[0],
        max_creates_per_minute=caps[1],
        max_queue=caps[2],
        max_cache=caps[3],
    )
    q = p.start()
    for step, rows in enumerate(batches):
        if step:
            clock.advance(1.0)
        (TMP / "in" / f"b{step:03d}.txt").write_text(
            "".join(f"{path} {v!r} {ts}\n" for path, ts, v in rows)
        )
        q.processAllAvailable()
    q.stop()

    written, tallies, n_pending = simulate(batches, caps)
    got = {
        (r["path"], r["ts_sec"], r["value"])
        for r in p.datapoints().collect()
    }
    want = {(path, ts, v) for path, ts, v in written}
    assert got == want, f"seed={seed} caps={caps}"
    got_tallies = {"dropped_queue": 0, "deferred_creates": 0,
                   "deferred_updates": 0, "dropped_cache": 0}
    for r in p.flow_tally().collect():
        got_tallies[r["metric"]] += r["n"]
    assert got_tallies == tallies, f"seed={seed} caps={caps}"
    # conservation: arrived == written + queue-drops + cache-drops + pending
    arrived = sum(len(b) for b in batches)
    assert arrived == (
        len(written)
        + tallies["dropped_queue"]
        + tallies["dropped_cache"]
        + n_pending
    ), f"seed={seed} caps={caps}"
    shutil.rmtree(TMP, ignore_errors=True)
