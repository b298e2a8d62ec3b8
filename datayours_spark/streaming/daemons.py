"""Polling sources and fan-out sinks: the DataWatcher/DataDaemon acquisition
surface, Spark-first.

Reproduces:

- **S4 polling sources** (`/root/reference/L_DataWatcher.lua:103-142`): the
  reference self-reschedules scrapers (/proc/meminfo every 120 s, live
  energy every 60 s) that emit metric records.  Spark shape: a `rate`
  stream ticks on the trigger cadence; each tick fans out through a scrape
  hook into 0..N `(path, ts_sec, value)` records (Arrow-batched
  mapInPandas — the scrape runs ON the executor, like `getSysinfo` ran in
  the daemon process).
- **F15 derivation math** (`L_DataWatcher.lua:108-110, 136-137`):
  MemUsed = MemTotal − MemFree, MemAvail = Cached + MemFree, kWh = W/60000.
- **S5 fan-out sink** (`L_DataDaemon.lua:327-357`; DESTINATIONS in
  `carbon.conf.example:192`): every record relayed to N destinations —
  `foreachBatch` writing the SAME batch to each sink table (the exactly-once
  upgrade of the UDP datagram fan-out).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ScrapeFn = Callable[[int], Iterable[tuple[str, float]]]

POLL_SCHEMA = "path string, ts_sec bigint, value double"


def scrape_meminfo(prefix: str = "sys.memory") -> ScrapeFn:
    """The reference's /proc/meminfo scraper with its derived metrics
    (`L_DataWatcher.lua:103-121`); returns [] where /proc is unavailable."""

    def scrape(ts: int) -> list[tuple[str, float]]:
        try:
            with open("/proc/meminfo") as f:
                raw = dict(
                    (k, float(v.split()[0]))
                    for k, v in (line.split(":", 1) for line in f if ":" in line)
                )
        except OSError:
            return []
        out = []
        for key in ("MemTotal", "MemFree", "Cached"):
            if key in raw:
                out.append((f"{prefix}.{key}", raw[key]))
        if "MemTotal" in raw and "MemFree" in raw:
            out.append((f"{prefix}.MemUsed", raw["MemTotal"] - raw["MemFree"]))
        if "Cached" in raw and "MemFree" in raw:
            out.append((f"{prefix}.MemAvail", raw["Cached"] + raw["MemFree"]))
        return out

    return scrape


def watts_to_kwh_per_min(watts: float) -> float:
    """F15: the reference's kWh-per-minute conversion (W / 60000,
    `L_DataWatcher.lua:136-137`)."""
    return watts / 60_000.0


def polling_source(
    spark: SparkSession,
    scrape: ScrapeFn,
    interval_sec: int = 60,
) -> DataFrame:
    """STREAMING (path, ts_sec, value) records from a periodic scraper.

    One rate-source tick per interval; the scrape hook runs executor-side
    per tick and may emit 0..N records (the flatMap contract shared with
    the user hook, P1).
    """
    import pandas as pd

    # rate source ticks once per second (its slowest integral rate); keep
    # every interval-th tick — the 1 Hz poll loop with a modulo gate, exactly
    # the daemon's `pollrate`/reschedule shape (`L_DataDaemon.lua:220`)
    ticks = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 1)
        .load()
        .where(F.unix_timestamp("timestamp") % interval_sec == 0)
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            paths: list[str] = []
            ts_out: list[int] = []
            values: list[float] = []
            for ts in pdf["timestamp"]:
                epoch = int(ts.timestamp())
                for path, value in scrape(epoch):
                    paths.append(path)
                    ts_out.append(epoch)
                    values.append(float(value))
            yield pd.DataFrame({"path": paths, "ts_sec": ts_out, "value": values})

    return ticks.select("timestamp").mapInPandas(run, schema=POLL_SCHEMA)


def fanout_sink(records: DataFrame, destinations: list[str], checkpoint_dir: str):
    """S5: relay every record to N destination tables (parquet dirs).

    The reference fire-and-forgets UDP datagrams per destination; here one
    `foreachBatch` appends the SAME deterministic batch to each destination,
    inheriting the stream's exactly-once checkpointing.
    """

    def write(batch: DataFrame, _batch_id: int) -> None:
        for dest in destinations:
            batch.write.mode("append").parquet(dest)

    return (
        records.writeStream.foreachBatch(write)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
