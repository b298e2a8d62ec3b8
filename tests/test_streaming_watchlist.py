"""watch/nowatch control plane (L_DataWatcher.lua:160-203 semantics)."""

import shutil
from pathlib import Path

from datayours_spark.streaming.ingest import IngestPipeline
from datayours_spark.streaming.watchlist import WatchList

TMP = Path(__file__).resolve().parent / "_tmp" / "watchlist"
NOW = 1_704_672_000


class TestWatchListUnit:
    def setup_method(self):
        shutil.rmtree(TMP, ignore_errors=True)
        TMP.mkdir(parents=True)

    def test_watch_nowatch_roundtrip_persists(self):
        conf = str(TMP / "DataWatcher.conf")
        wl = WatchList.load(conf)
        assert wl.paths() == []
        assert wl.watch("m.a") == ["watch=m.a"]
        wl.watch("m.b")
        # reload from disk: the set survived
        wl2 = WatchList.load(conf)
        assert wl2.paths() == ["m.a", "m.b"]
        assert wl2.nowatch("m.a") == ["nowatch=m.a"]
        assert WatchList.load(conf).paths() == ["m.b"]

    def test_conf_file_format(self):
        conf = str(TMP / "DataWatcher.conf")
        wl = WatchList.load(conf)
        wl.watch("m.b")
        wl.watch("m.a")
        text = Path(conf).read_text()
        lines = text.splitlines()
        # [DataWatcher] header + comment block + SORTED watch= lines
        # (`L_DataWatcher.lua:160-172`)
        assert lines[0] == "[DataWatcher]"
        assert lines[1] == "#" and lines[3] == "#"
        assert lines[4:] == ["watch=m.a", "watch=m.b"]

    def test_wildcard_expands_against_catalog(self):
        conf = str(TMP / "DataWatcher.conf")
        wl = WatchList.load(conf)
        catalog = ["m.temp.1", "m.temp.2", "m.energy.1"]
        changed = wl.watch("m.temp.*", catalog=catalog)
        assert changed == ["watch=m.temp.1", "watch=m.temp.2"]
        assert wl.paths() == ["m.temp.1", "m.temp.2"]
        # wildcard nowatch defaults its catalog to the watched set itself
        assert wl.nowatch("m.temp.*") == [
            "nowatch=m.temp.1", "nowatch=m.temp.2"
        ]
        assert wl.paths() == []

    def test_idempotent_and_tally(self):
        wl = WatchList.load(str(TMP / "c.conf"))
        wl.watch("m.a")
        wl.tally("m.a")
        wl.tally("m.a")
        assert wl.watched["m.a"] == 2
        wl.watch("m.a")  # re-watch never resets the tally
        assert wl.watched["m.a"] == 2
        wl.tally("m.unwatched")  # ignored, like the reference's callback
        assert "m.unwatched" not in wl.watched


class TestWatchListInPipeline:
    def test_watch_set_applies_and_survives_restart(self, spark):
        base = TMP / "pipeline"
        shutil.rmtree(base, ignore_errors=True)
        (base / "in").mkdir(parents=True)
        conf = str(base / "DataWatcher.conf")

        wl = WatchList.load(conf)
        wl.watch("m.keep")
        p = IngestPipeline(
            spark=spark,
            input_dir=str(base / "in"),
            output_dir=str(base / "out"),
            checkpoint_dir=str(base / "ckpt"),
            now_override=NOW,
            watched=wl,
            rollup_steps=(60,),
        )
        t = NOW - 120
        (base / "in" / "one.txt").write_text(
            f"m.keep 1 {t}\nm.drop 2 {t}\n"
        )
        q = p.start()
        q.processAllAvailable()
        q.stop()
        assert {r["path"] for r in p.datapoints().collect()} == {"m.keep"}

        # control-plane mutation + restart: a NEW pipeline loads the
        # persisted set (watch added, old one removed) — the reference's
        # conf round-trip across daemon restarts
        wl.watch("m.drop")
        wl.nowatch("m.keep")
        p2 = IngestPipeline(
            spark=spark,
            input_dir=str(base / "in"),
            output_dir=str(base / "out"),
            checkpoint_dir=str(base / "ckpt"),
            now_override=NOW,
            watched=WatchList.load(conf),
            rollup_steps=(60,),
        )
        (base / "in" / "two.txt").write_text(
            f"m.keep 3 {t + 60}\nm.drop 4 {t + 60}\n"
        )
        q = p2.start()
        q.processAllAvailable()
        q.stop()
        got = {(r["path"], r["ts_sec"]) for r in p2.datapoints().collect()}
        assert ("m.drop", t + 60) in got      # newly watched
        assert ("m.keep", t + 60) not in got  # nowatched before restart
        shutil.rmtree(base, ignore_errors=True)
