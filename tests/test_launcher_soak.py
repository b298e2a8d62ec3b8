"""Multi-batch streaming soak through the launcher front door.

The one end-to-end path previously exercised only single-shot: UDP
datagrams → conf-booted ingest → per-batch INCREMENTAL rollup maintenance
→ retention expiry mid-stream → render.  After EVERY batch the maintained
rollup tables must equal a full recompute, and the served render must
reflect exactly the live datapoints — the invariant that makes incremental
maintenance trustworthy at scale.
"""

import shutil
import time
from pathlib import Path

from pyspark.sql import functions as F

from datayours_spark.launcher import start_from_conf

TMP = Path(__file__).resolve().parent / "_tmp" / "launcher_soak"

NOW = 1_704_672_000  # 2024-01-08 00:00 UTC
DAY = 86_400


def _setup_confs() -> Path:
    conf = TMP / "conf"
    conf.mkdir(parents=True)
    (conf / "storage-schemas.conf").write_text(
        "[soak]\npattern = ^soak\\.\nretentions = 1m:1d,1h:7d\n"
    )
    (conf / "storage-aggregation.conf").write_text(
        "[counts]\npattern = \\.count$\nxFilesFactor = 0\n"
        "aggregationMethod = sum\n"
        "[default]\npattern = .*\nxFilesFactor = 0.5\n"
        "aggregationMethod = average\n"
    )
    return conf


def _dates_of(ts_list):
    import datetime

    return sorted(
        {
            datetime.datetime.fromtimestamp(
                t, tz=datetime.timezone.utc
            ).strftime("%Y-%m-%d")
            for t in ts_list
        }
    )


class TestStreamingSoak:
    def test_soak_udp_ingest_refresh_expire_render(self, spark):
        from datayours_spark.io import expire_retention
        from datayours_spark.streaming.transport import (
            UdpLineReceiver,
            open_for_send,
        )

        shutil.rmtree(TMP, ignore_errors=True)
        conf = _setup_confs()
        work = TMP / "work"
        stack = start_from_conf(
            spark, str(conf), str(work), daemons="Cache",
            now_override=NOW, rollup_steps=(60, 3_600),
        )
        rx = UdpLineReceiver(str(work / "in"))

        def send_batch(lines: list[str]) -> None:
            tx = open_for_send(f"127.0.0.1:{rx.port}")
            for line in lines:
                tx.send(line.encode())
            tx.close()
            got = 0
            deadline = time.time() + 10
            while got < len(lines) and time.time() < deadline:
                got += rx.poll()
                time.sleep(0.01)
            assert got == len(lines)
            rx.flush()
            stack.process_available()

        def assert_incremental_equals_full(changed_ts: list[int]) -> None:
            """Incremental refresh over the touched dates, then a full
            recompute — the maintained tables must be identical."""
            stack.refresh_rollups(changed_dates=_dates_of(changed_ts))
            incr = {
                step: {
                    (r["path"], r["slot"]): r["value"]
                    for r in spark.read.parquet(
                        f"{stack.pipeline.output_dir}/rollup_{step}"
                    ).collect()
                }
                for step in (60, 3_600)
            }
            stack.refresh_rollups(None)  # full recompute, same tables
            full = {
                step: {
                    (r["path"], r["slot"]): r["value"]
                    for r in spark.read.parquet(
                        f"{stack.pipeline.output_dir}/rollup_{step}"
                    ).collect()
                }
                for step in (60, 3_600)
            }
            assert incr == full

        def rendered(frm: int, until: int) -> dict:
            from datayours_spark import api

            grid = api.render_grid(
                spark, stack.datapoints(), "soak.*.count",
                from_=frm, until_=until, step=3_600, now=NOW,
            )
            return {
                (r["path"], r["slot"]): r["value"]
                for r in grid.collect()
                if r["value"] is not None
            }

        try:
            # ---- batch 1: six-day-old history ---------------------------
            t1 = NOW - 6 * DAY
            send_batch(
                [f"soak.a.count {i} {t1 + 60 * i}" for i in range(5)]
                + [f"soak.b.gauge {10 + i} {t1 + 60 * i}" for i in range(5)]
            )
            assert_incremental_equals_full([t1, t1 + 240 * 60])
            slot1 = t1 - t1 % 3_600
            # the served render is slot-LWW (q_fetch_grid semantics): the
            # last value in the hour slot
            got = rendered(t1 - 3_600, t1 + 3_600)
            assert got[("soak.a.count", slot1)] == 4.0
            # the MAINTAINED 1h level applies the conf-assigned method:
            # .count rules aggregate by sum
            lvl = {
                (r["path"], r["slot"]): r["value"]
                for r in spark.read.parquet(
                    f"{stack.pipeline.output_dir}/rollup_3600"
                ).collect()
            }
            assert lvl[("soak.a.count", slot1)] == float(sum(range(5)))
            # b.gauge matched the default rule (average, xFilesFactor 0.5):
            # only 5 of 60 minute-slots are filled, so the xff gate holds
            # the hour slot back — exactly the whisper propagate contract
            assert ("soak.b.gauge", slot1) not in lvl

            # ---- batch 2: three-day-old + LWW overwrite -----------------
            t2 = NOW - 3 * DAY
            send_batch(
                [f"soak.a.count 7 {t2}", f"soak.a.count 9 {t2}"]  # LWW → 9
                + [f"soak.b.gauge 20 {t2 + 60}"]
            )
            assert_incremental_equals_full([t2])
            got = rendered(t2 - 3_600, t2 + 3_600)
            assert got[("soak.a.count", t2 - t2 % 3_600)] == 9.0  # LWW

            # ---- mid-stream retention expiry ----------------------------
            # simulate aging past a 4-day retention: the 6-day-old date
            # partition drops from datapoints AND every derived table
            out = stack.pipeline.output_dir
            dropped = expire_retention(f"{out}/datapoints", 4 * DAY, NOW)
            assert dropped, "expected the 6-day-old partition to drop"
            for step in (60, 3_600):
                expire_retention(f"{out}/rollup_{step}", 4 * DAY, NOW)
            assert rendered(t1 - 3_600, t1 + 3_600) == {}  # aged out
            # batch-2 data survives
            assert rendered(t2 - 3_600, t2 + 3_600) != {}

            # ---- batch 3: fresh data after expiry -----------------------
            t3 = NOW - 600
            send_batch(
                [f"soak.a.count 3 {t3}", f"soak.b.gauge 30 {t3}"]
            )
            assert_incremental_equals_full([t3])
            got = rendered(NOW - 3_600, NOW)
            assert got[("soak.a.count", t3 - t3 % 3_600)] == 3.0

            # the maintained 1m level holds exactly the surviving seconds
            lvl60 = {
                (r["path"], r["slot"])
                for r in spark.read.parquet(f"{out}/rollup_60").collect()
            }
            assert ("soak.a.count", t1 - t1 % 60) not in lvl60  # expired
            assert ("soak.a.count", t3 - t3 % 60) in lvl60

            # heartbeat rides the same ingest path and lands as a series;
            # its value is the stats-table metric count (soak.a.count and
            # soak.b.gauge — expiry drops data, not the series' existence)
            stack.heartbeat()
            stack.process_available()
            hb = (
                stack.datapoints()
                .where(F.col("path") == "dy.heartbeat.metrics")
                .collect()
            )
            assert len(hb) == 1 and hb[0]["value"] == 2.0
        finally:
            rx.close()
            stack.stop()
            shutil.rmtree(TMP, ignore_errors=True)
