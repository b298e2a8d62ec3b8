"""Structured Streaming ingest: the Carbon cache daemon, Spark-first.

Reproduces the real-time path (SURVEY.md §2.9, §3.1): continuous plaintext
ingest (S1/S2) → user-hook flatMap (P1) → rewrite rules (P3) → admission
control (T3/T6: reject future and beyond-retention points) → event-time
watermark (T2) → per-batch slot last-write-wins (T4) → datapoints table +
incremental rollups (T5).

Upgrades vs the reference (documented superset): exactly-once via
checkpointing instead of UDP at-most-once; the datapoints table is
date-partitioned parquet, append-only, with LWW applied on read (and by the
rollup maintenance job) — the Delta-MERGE shape without requiring Delta.

Scale notes: the stream is stateless apart from the watermark — per-batch
dedup + append keeps executor state bounded; rollup refresh touches only the
windows present in the batch (dynamic partition overwrite).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datayours_spark.kernel.rules import RewriteRule
from datayours_spark.sources.plaintext import parse_plaintext_lines


def rewrite_column(rules: list[RewriteRule]) -> F.Column:
    """Compile first-match-wins rewrite rules (P3) into a when/otherwise
    cascade — the rule table is tiny and driver-side, the evaluation is
    JVM-side per record."""
    col = None
    for rule in rules:
        branch = F.regexp_replace("path", rule.pattern, rule.replacement)
        cond = F.col("path").rlike(rule.pattern)
        col = F.when(cond, branch) if col is None else col.when(cond, branch)
    return F.col("path") if col is None else col.otherwise(F.col("path"))


@dataclass
class IngestPipeline:
    """File-drop plaintext → datapoints parquet with incremental rollups."""

    spark: SparkSession
    input_dir: str
    output_dir: str
    checkpoint_dir: str
    max_retention: int = 7 * 86_400
    watermark_delay: str = "1 hour"
    rewrites: list[RewriteRule] = field(default_factory=list)
    rollup_steps: tuple[int, ...] = (60, 600)
    #: whisper propagation settings for levels beyond the finest
    #: (`L_DataWhisper.lua:469-491`): the finest level is the LWW slot table,
    #: coarser levels aggregate the previous level with method + xFF gate
    rollup_method: str = "average"
    rollup_xff: float = 0.5
    #: storage-aggregation rule engine: when set, every cascade hop
    #: dispatches method/xff PER SERIES, rule-assigned from the conf exactly
    #: like the reference's propagate (`L_DataWhisper.lua:493-523`,
    #: `L_DataCache.lua:146-160`); rollup_method/xff become the defaults
    rule_engine: object | None = None
    now_override: int | None = None  # fixed "now" for deterministic tests
    user_hook: object | None = None  # P1: user.run flatMap, §3.1 step 2
    #: P6 watch-list predicate (`L_DataWatcher.lua:148-157`): when set, only
    #: these series pass the relay.  Accepts a plain list OR a
    #: `streaming.watchlist.WatchList` (the mutable watch/nowatch control
    #: plane, §2.11): a WatchList is re-read at every (re)start — the moment
    #: the reference re-registers its variable watches from the conf file
    watched: object | None = None
    #: T8 flow limits — the carbon.conf knobs as ENFORCEABLE admission
    #: control (`carbon.conf.example:41-57,196-197`), applied per
    #: micro-batch (the daemon's 1 Hz poll-loop quantum), each with a tally
    #: row in `{output_dir}/flow_tally`:
    #: - max_queue (MAX_QUEUE_SIZE): receive-queue bound — rows past the
    #:   cap are DROPPED in arrival order (carbon's queue-full drop).
    #: - max_creates_per_minute (MAX_CREATES_PER_MINUTE): soft cap on NEW
    #:   series per batch-minute, judged against the ingest-maintained
    #:   stats catalog; rows of over-cap new series are DROPPED until a
    #:   later batch has creation headroom (carbon drops points for files
    #:   it hasn't created yet).
    #: - max_updates_per_second (MAX_UPDATES_PER_SECOND): disk-write
    #:   throttle — rows past the cap are DEFERRED, not dropped: re-spilled
    #:   to the input stream (dotfile+rename) and re-admitted next trigger,
    #:   the Spark shape of carbon's cache backpressure.  Deferred lines
    #:   re-run the rewrite/hook cascade, exactly like a carbon point
    #:   re-entering via relay.
    max_updates_per_second: int | None = None
    max_creates_per_minute: int | None = None
    max_queue: int | None = None
    #: per-batch persisted admission frames, released at batch end
    _flow_persisted: list = field(default_factory=list)
    #: driver-cached known-series set for the creates gate: read from the
    #: stats table ONCE, then maintained in memory per batch — without
    #: this every batch re-reads every stats increment (O(batches) per
    #: batch over the stream's life; review finding, round 4)
    _known_cache: "set | None" = None

    def _watched_paths(self) -> list[str] | None:
        if self.watched is None:
            return None
        paths = getattr(self.watched, "paths", None)
        return paths() if callable(paths) else list(self.watched)

    #: provenance columns threaded from the file source for deterministic
    #: in-batch arrival ordering (see `_write_batch`)
    _CARRY = ("src_mtime", "src_file")

    def transform(self, lines: DataFrame) -> DataFrame:
        """The record pipeline, shared by batch backfill and the stream."""
        carry = [c for c in self._CARRY if c in lines.columns]
        parsed = parse_plaintext_lines(lines, now=self.now_override, carry=carry)
        watched_paths = self._watched_paths()
        if watched_paths is not None:
            parsed = parsed.where(F.col("path").isin(watched_paths))
        if self.user_hook is not None:
            # user.run runs BEFORE the rewrite rules, like the relay hop
            # (`L_DataWatcher.lua:206-213, 80-85`); the hook's flatMap schema
            # is (path, ts_sec, value) only, so provenance does not survive it
            from datayours_spark.functions.userhook import apply_user_hook

            parsed = apply_user_hook(parsed, self.user_hook)
            carry = []
        renamed = parsed.select(
            rewrite_column(self.rewrites).alias("path"), "ts_sec", "value",
            *carry,
        )
        now_col = (
            F.lit(self.now_override)
            if self.now_override is not None
            else F.unix_timestamp(F.current_timestamp())
        )
        diff = now_col - F.col("ts_sec")
        admitted = renamed.where((diff >= 0) & (diff < self.max_retention))
        return admitted.withColumn(
            "ts", F.timestamp_seconds(F.col("ts_sec"))
        ).withColumn("date", F.to_date("ts"))

    def _known_paths(self) -> set[str]:
        """Catalog of already-created series: the stats table read once
        (the whisper-directory listing analogue; KB-scale), then a
        driver-side set maintained per batch."""
        if self._known_cache is None:
            import os

            stats_dir = f"{self.output_dir}/series_stats"
            if not os.path.isdir(stats_dir):
                self._known_cache = set()
            else:
                self._known_cache = {
                    r["path"]
                    for r in self.spark.read.parquet(stats_dir)
                    .select("path")
                    .distinct()
                    .collect()
                }
        return self._known_cache

    def _tally(self, batch_id: int, metric: str, n: int) -> None:
        """Append one flow-control tally row (like the T3/T6 reject tally)."""
        self.spark.createDataFrame(
            [(int(batch_id), metric, int(n))], "batch_id bigint, metric string, n bigint"
        ).coalesce(1).write.mode("append").parquet(f"{self.output_dir}/flow_tally")

    def flow_tally(self) -> DataFrame:
        """(batch_id, metric, n) flow-control tallies; empty if no limit
        ever fired."""
        import os

        d = f"{self.output_dir}/flow_tally"
        if not os.path.isdir(d):
            return self.spark.createDataFrame(
                [], "batch_id bigint, metric string, n bigint"
            )
        return self.spark.read.parquet(d)

    def _respill(self, rows: list, batch_id: int) -> None:
        """Re-spill deferred rows to the input stream (dotfile+rename, the
        UdpLineReceiver.flush protocol) so the next trigger re-admits them."""
        import os
        import uuid

        lines = "".join(
            f"{r['path']} {r['value']!r} {int(r['ts_sec'])}\n" for r in rows
        )
        fname = os.path.join(
            self.input_dir, f"deferred-{batch_id}-{uuid.uuid4().hex[:8]}.txt"
        )
        tmp = os.path.join(self.input_dir, "." + os.path.basename(fname))
        with open(tmp, "w") as f:
            f.write(lines)
        os.rename(tmp, fname)

    def _admit_flow(self, batch: DataFrame, batch_id: int) -> DataFrame:
        """Apply the T8 flow limits (queue bound → create cap → update
        throttle) to one micro-batch; returns the admitted rows.

        Driver-side arithmetic is counts and KB-scale path sets only; row
        selection is takeOrdered by the in-batch arrival key (`seq` order,
        same total order the LWW dedup uses), never a single-partition
        window.
        """
        if (
            self.max_queue is None
            and self.max_creates_per_minute is None
            and self.max_updates_per_second is None
        ):
            return batch
        order_cols = [c for c in self._CARRY if c in batch.columns]
        seq = F.struct(
            *[F.col(c) for c in order_cols],
            F.monotonically_increasing_id().alias("mono"),
        )
        df = batch.withColumn("fseq", seq).persist()
        self._flow_persisted.append(df)
        n_in = df.count()

        def _first_n(frame: DataFrame, cap: int) -> DataFrame:
            # the cap-th smallest arrival key is the admission threshold —
            # a distributed takeOrdered, not a global window.  The
            # threshold re-enters the plan as a typed literal struct
            # (exact column dtypes, so the struct<=struct compare resolves).
            cut = frame.select("fseq").orderBy("fseq").limit(cap).collect()[-1][
                "fseq"
            ]
            stype = frame.schema["fseq"].dataType
            lit_cut = F.struct(
                *[
                    F.lit(cut[f.name]).cast(f.dataType).alias(f.name)
                    for f in stype.fields
                ]
            )
            return frame.where(F.col("fseq") <= lit_cut)

        if self.max_queue is not None and n_in > self.max_queue:
            # receive-queue overflow: excess arrivals DROP (queue-full)
            df2 = _first_n(df, self.max_queue).persist()
            self._flow_persisted.append(df2)
            self._tally(batch_id, "dropped_queue", n_in - self.max_queue)
            df, n_in = df2, self.max_queue

        if self.max_creates_per_minute is not None:
            batch_paths = {
                r["path"] for r in df.select("path").distinct().collect()
            }
            new_paths = sorted(batch_paths - self._known_paths())
            blocked = new_paths[self.max_creates_per_minute :]
            if blocked:
                n_blocked = df.where(F.col("path").isin(blocked)).count()
                df2 = df.where(~F.col("path").isin(blocked)).persist()
                self._flow_persisted.append(df2)
                self._tally(batch_id, "rejected_creates", n_blocked)
                df, n_in = df2, n_in - n_blocked

        if (
            self.max_updates_per_second is not None
            and n_in > self.max_updates_per_second
        ):
            # write throttle: excess rows DEFER to the next trigger via the
            # input stream (carbon cache backpressure); deferred rows are
            # bounded by batch size, so the driver hop is the batch's own
            # memory scale
            admitted = _first_n(df, self.max_updates_per_second).persist()
            self._flow_persisted.append(admitted)
            deferred = df.join(
                admitted.select("fseq"), "fseq", "left_anti"
            ).select("path", "ts_sec", "value")
            rows = deferred.collect()
            self._respill(rows, batch_id)
            self._tally(batch_id, "deferred_updates", len(rows))
            df = admitted
        return df.drop("fseq")

    def _release_flow_cache(self) -> None:
        for f in self._flow_persisted:
            f.unpersist()
        self._flow_persisted.clear()

    def _write_batch(self, batch: DataFrame, batch_id: int) -> None:
        batch = self._admit_flow(batch, batch_id)
        # per-batch slot LWW dedup (T4): one row per (path, second) survives,
        # the latest-arriving one (the wire protocol carries no sequence;
        # reference semantics are arrival-order overwrite,
        # L_DataWhisper.lua:346-354).  In-batch arrival key: source-file
        # modification time, then file name, then within-file line order
        # (monotonically_increasing_id — assigned here because it is not
        # allowed on streaming frames; split/partition order for a file
        # source follows file offset, so the struct is a deterministic total
        # order for a given input set, not a partition-layout accident).
        order_cols = [c for c in self._CARRY if c in batch.columns]
        seq = F.struct(
            *[F.col(c) for c in order_cols],
            F.monotonically_increasing_id().alias("mono"),
        )
        deduped = (
            batch.withColumn("seq", seq)
            .groupBy("path", "ts_sec", "date")
            .agg(F.max_by("value", "seq").alias("value"))
            # cross-batch arrival order lives in its OWN column: batch_id is
            # the checkpoint's monotone epoch, unwrapped — read-side LWW
            # within a (path, second) orders by it directly, so it never
            # saturates (BIGINT overflow needs ~9e18 batches).
            .withColumn("batch_seq", F.lit(batch_id))
            # ts_us stays the ACROSS-seconds event-time order key for slot
            # consumers (lww_slots max_by spans seconds within a slot), so
            # the arrival addend is capped below one second's worth: an
            # unwrapped addend would, past batch 1e6 (~12 days at 1 batch/s),
            # let a late write to an older second outrank newer seconds.
            # Same-second arrival ties beyond the cap are broken by
            # batch_seq in `datapoints()` / `compact_datapoints`.
            .withColumn(
                "ts_us",
                F.col("ts_sec") * 1_000_000
                + F.lit(min(batch_id, 999_999)),
            )
        )
        out = deduped.select(
            "path", "ts_sec", "ts_us", "batch_seq", "value", "date"
        ).persist()  # two consumers below; avoid recomputing the dedup agg
        try:
            (
                out.write.mode("append")
                .partitionBy("date")
                .parquet(f"{self.output_dir}/datapoints")
            )
            # maintain per-series stats alongside the data (the
            # Whisper-header analogue): a KB-scale increment per batch so
            # "now" anchors, metric counts, and routing arithmetic never
            # need a full-table aggregation job (round-3 advisory).
            from datayours_spark.stats import append_series_stats

            stats_dir = f"{self.output_dir}/series_stats"
            append_series_stats(out, stats_dir)
            if self._known_cache is not None:
                # keep the creates-gate catalog current (out is persisted,
                # so this distinct is batch-scale)
                self._known_cache.update(
                    r["path"] for r in out.select("path").distinct().collect()
                )
            if batch_id % 64 == 63:
                # fold the one-file-per-batch stats increments periodically.
                # SAFE against the live stream precisely because it runs
                # INSIDE the batch callback: foreachBatch serializes with
                # the only appender (this method), so no increment can land
                # mid-swap — which is also why ad-hoc compact_series_stats
                # calls require a quiescent stream.
                from datayours_spark.stats import compact_series_stats

                compact_series_stats(self.spark, stats_dir)
        finally:
            out.unpersist()
            self._release_flow_cache()

    def start(self):
        """Start the continuous query (micro-batch trigger — the Spark
        equivalent of the daemon's 1 Hz poll loop, `L_DataDaemon.lua:220`)."""
        lines = (
            self.spark.readStream.format("text")
            .option("maxFilesPerTrigger", 16)  # T8 flow limit analogue
            .load(self.input_dir)
            .select(
                F.col("value").alias("line"),
                # file provenance → deterministic in-batch arrival order
                F.col("_metadata.file_modification_time").alias("src_mtime"),
                F.col("_metadata.file_name").alias("src_file"),
            )
        )
        out = self.transform(lines).withWatermark("ts", self.watermark_delay)
        return (
            out.writeStream.foreachBatch(self._write_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .start()
        )

    def datapoints(self, dates: list[str] | None = None) -> DataFrame:
        """Read-side view with cross-batch LWW per (path, second).

        `dates` restricts the scan to those date partitions (pruned at the
        parquet source) — the incremental-maintenance entry point.
        """
        # mergeSchema: whether batch_seq appears in the inferred schema must
        # not depend on WHICH footer Spark samples on a table mixing
        # pre-batch_seq files with streaming-written ones.  Footer merging
        # is metadata-scale (parallel over file footers, not data); a
        # compaction pass homogenizes the files, after which it is free.
        df = self.spark.read.option("mergeSchema", "true").parquet(
            f"{self.output_dir}/datapoints"
        )
        if dates is not None:
            df = df.where(F.col("date").isin(dates))
        # within one (path, second) the uncapped batch_seq defines "last";
        # the surviving ts_us (capped addend) remains safe to compare
        # across seconds in downstream slot LWW.  Legacy files written
        # before batch_seq existed read as NULL in a mixed table (and
        # whether the column appears at all depends on which footer Spark
        # samples) — coalesce to -1 so legacy rows order BELOW any real
        # batch and max_by never returns a NULL-keyed row; ts_us breaks
        # ties among legacy rows themselves.
        if "batch_seq" in df.columns:
            order = F.struct(
                F.coalesce(F.col("batch_seq"), F.lit(-1)).alias("b"),
                F.col("ts_us").alias("u"),
            )
        else:
            order = F.col("ts_us")
        return df.groupBy("path", "ts_sec").agg(
            F.max_by("value", order).alias("value"),
            F.max("ts_us").alias("ts_us"),
        )

    def series_stats(self) -> DataFrame:
        """Merged per-series stats (path, min_ts, max_ts, n) maintained by
        `_write_batch` — the metadata answer to catalog questions."""
        from datayours_spark.stats import read_series_stats

        return read_series_stats(self.spark, f"{self.output_dir}/series_stats")

    def data_now(self) -> int | None:
        """The table's "now" anchor: now_override when set, else the max
        ingested second from the STATS table (KB-scale), never a
        datapoints scan.  None before the first batch."""
        if self.now_override is not None:
            return self.now_override
        import os

        from datayours_spark.stats import corpus_now

        stats_dir = f"{self.output_dir}/series_stats"
        if not os.path.isdir(stats_dir):
            return None
        return corpus_now(self.spark, stats_dir)

    def refresh_rollups(
        self, changed_dates: list[str] | None = None
    ) -> dict[int, DataFrame]:
        """Rollup maintenance job (T5).

        Full refresh when `changed_dates` is None; otherwise INCREMENTAL:
        only the touched date partitions are recomputed (source scan pruned
        to those dates) and dynamically overwritten in the date-partitioned
        rollup tables — untouched partitions' files are never rewritten.
        This is how write-time propagation scales: the maintenance cost
        follows the batch, not the table.
        """
        from datayours_spark.operators.fetch import lww_slots

        self.spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode", "dynamic"
        )
        if changed_dates is not None:
            for step in self.rollup_steps:
                if 86_400 % step != 0:
                    raise ValueError(
                        f"incremental refresh needs day-aligned steps; {step}s"
                        " slots can span a date boundary — run a full refresh"
                    )
        from datayours_spark.operators.rollup import rollup, rollup_all_methods

        dp = self.datapoints(dates=changed_dates)
        meta: DataFrame | None = None
        if self.rule_engine is not None:
            # rule-assigned per-series meta over the CURRENT catalog: newly
            # seen series pick up their conf row on the next refresh, the
            # Spark shape of creation-time assignment (`L_DataCache.lua:142-162`)
            from datayours_spark.operators.meta import assign_series_meta

            meta = assign_series_meta(
                dp.select("path").distinct(), self.rule_engine
            ).select("path", "method", "xff")
        steps = sorted(self.rollup_steps)
        levels: dict[int, DataFrame] = {}
        prev_step: int | None = None
        prev_level: DataFrame | None = None
        for step in steps:
            if prev_level is None:
                # finest level: the LWW slot table itself
                level = lww_slots(dp, step)
            elif meta is not None:
                # whisper propagation with PER-SERIES method/xff dispatch
                # (`L_DataWhisper.lua:493-523`): one aggregation pass computes
                # all five methods, the broadcast meta picks per path
                level = rollup_all_methods(
                    prev_level, prev_step, step, meta,
                    default_method=self.rollup_method,
                    default_xff=self.rollup_xff,
                ).select("path", "slot", "value")
            else:
                # whisper propagation: aggregate the PREVIOUS level with the
                # configured method, gated by xFilesFactor
                # (`L_DataWhisper.lua:469-491`)
                level = rollup(
                    prev_level, prev_step, step,
                    method=self.rollup_method, xff=self.rollup_xff,
                ).select("path", "slot", "value")
            out = level.withColumn(
                "date", F.to_date(F.timestamp_seconds("slot"))
            )
            (
                out.repartition("date")
                .write.mode("overwrite")
                .partitionBy("date")
                .parquet(f"{self.output_dir}/rollup_{step}")
            )
            levels[step] = self.spark.read.parquet(f"{self.output_dir}/rollup_{step}")
            prev_step, prev_level = step, level
        return levels
