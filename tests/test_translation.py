"""P2 symbolic translation: DataTranslation.conf parsed and applied at the
capture point of the ingest parse (`L_DataWatcher.lua:152-155`,
`DataTranslation.conf:16-19`)."""

import shutil
from pathlib import Path

from datayours_spark.kernel.rules import parse_translation_conf
from datayours_spark.sources.plaintext import parse_plaintext_lines

TMP = Path(__file__).resolve().parent / "_tmp" / "translation"
REF_CONF = Path("/root/reference/Configuration")

NOW = 1_704_672_000

HVAC = "urn:micasaverde-com:serviceId:HVAC_OperatingState1.ModeState"


class TestParseTranslationConf:
    def test_reference_shipped_conf(self):
        text = (REF_CONF / "DataTranslation.conf").read_text()
        trans = parse_translation_conf(text)
        assert trans == {
            f"*.{HVAC}": {"Cooling": "-1", "Idle": "0", "Heating": "1"}
        }

    def test_empty_and_comment_only(self):
        assert parse_translation_conf("") == {}
        assert parse_translation_conf("# just a comment\n") == {}


class TestTranslationAtParse:
    TRANS = {f"*.{HVAC}": {"Cooling": "-1", "Idle": "0", "Heating": "1"}}

    def _parse(self, spark, lines):
        df = spark.createDataFrame([(ln,) for ln in lines], "line string")
        return {
            (r["path"], r["ts_sec"]): r["value"]
            for r in parse_plaintext_lines(
                df, now=NOW, translations=self.TRANS
            ).collect()
        }

    def test_symbol_translates_with_device_wildcard(self, spark):
        # the capture tag carries a specific device number; lookup happens
        # on the '*'-wildcarded tag (tag:gsub("^%d+", "*"))
        got = self._parse(
            spark,
            [
                f"12.{HVAC} Heating {NOW - 60}",
                f"7.{HVAC} Cooling {NOW - 60}",
                f"12.{HVAC} Idle {NOW - 30}",
            ],
        )
        assert got == {
            (f"12.{HVAC}", NOW - 60): 1.0,
            (f"7.{HVAC}", NOW - 60): -1.0,
            (f"12.{HVAC}", NOW - 30): 0.0,
        }

    def test_in_section_miss_becomes_unknown_and_drops(self, spark):
        # 'FanOnly' has no mapping: the reference relays the literal
        # 'unknown', which the cache's numeric coercion then drops — and
        # crucially a NUMERIC value for a translated series is also
        # forced through the map (reference: translate[...] or 'unknown')
        got = self._parse(
            spark,
            [
                f"12.{HVAC} FanOnly {NOW - 60}",
                f"12.{HVAC} 42.5 {NOW - 50}",
                f"12.{HVAC} Heating {NOW - 40}",
            ],
        )
        assert got == {(f"12.{HVAC}", NOW - 40): 1.0}

    def test_paths_without_section_pass_through(self, spark):
        got = self._parse(
            spark,
            [
                f"house.room:Temperature 20.5 {NOW - 60}",
                f"house.room:Mode Heating {NOW - 60}",  # symbolic, no map
            ],
        )
        assert got == {("house.room:Temperature", NOW - 60): 20.5}

    def test_no_translations_is_identity(self, spark):
        df = spark.createDataFrame(
            [(f"a.b 1.5 {NOW - 9}",)], "line string"
        )
        rows = parse_plaintext_lines(df, now=NOW, translations=None).collect()
        assert [(r["path"], r["value"]) for r in rows] == [("a.b", 1.5)]


class TestTranslationFromLauncherConf:
    def test_conf_wired_end_to_end(self, spark):
        from datayours_spark.launcher import start_from_conf

        shutil.rmtree(TMP, ignore_errors=True)
        conf = TMP / "conf"
        conf.mkdir(parents=True)
        shutil.copy(REF_CONF / "storage-schemas.conf", conf)
        shutil.copy(REF_CONF / "DataTranslation.conf", conf)  # verbatim
        work = TMP / "work"
        stack = start_from_conf(
            spark, str(conf), str(work), daemons="Cache", now_override=NOW,
            start=False,
        )
        try:
            assert stack.pipeline.translations == {
                f"*.{HVAC}": {"Cooling": "-1", "Idle": "0", "Heating": "1"}
            }
            stack.start()
            t = NOW - 600
            (work / "in" / "drop1.txt").write_text(
                f"99.{HVAC} Heating {t}\n"
                f"99.{HVAC} Vent {t + 60}\n"      # unmapped -> dropped
                f"house.plain 3.25 {t}\n"          # untouched path
            )
            stack.process_available()
            dp = {
                (r["path"], r["ts_sec"]): r["value"]
                for r in stack.datapoints().collect()
            }
            assert dp == {
                (f"99.{HVAC}", t): 1.0,
                ("house.plain", t): 3.25,
            }
        finally:
            stack.stop()
            shutil.rmtree(TMP, ignore_errors=True)


class TestTranslationBeforeRewrites:
    def test_translation_sees_the_capture_path(self, spark):
        """The watcher translates at CAPTURE (wildcarded capture tag);
        rewrite rules rename later in the cache hop — so a pre-rewrite
        that renames the path must not break the translation lookup."""
        from datayours_spark.kernel.rules import RewriteRule
        from datayours_spark.streaming.ingest import IngestPipeline

        trans = {f"*.{HVAC}": {"Heating": "1"}}
        pipe = IngestPipeline(
            spark=spark,
            input_dir=str(TMP / "in"),
            output_dir=str(TMP / "out"),
            checkpoint_dir=str(TMP / "ckpt"),
            now_override=NOW,
            translations=trans,
            rewrites=[RewriteRule(pattern=r"^12\.", replacement="dev12.")],
        )
        lines = spark.createDataFrame(
            [(f"12.{HVAC} Heating {NOW - 60}",)], "line string"
        )
        rows = {
            (r["path"], r["value"]) for r in pipe.transform(lines).collect()
        }
        # translated (capture tag matched) AND rewritten (afterwards)
        assert rows == {(f"dev12.{HVAC}", 1.0)}

    def test_specific_device_section_is_ignored_like_reference(self, spark):
        """Reference quirk (`L_DataWatcher.lua:152-155`): the watch
        callback looks up ONLY the '*'-wildcarded tag — a section written
        for a specific device number (which DataTranslation.conf's header
        says is allowed) never matches, so its symbols fall through as
        untranslated raw tokens."""
        df = spark.createDataFrame(
            [(f"12.{HVAC} Heating {NOW - 60}",)], "line string"
        )
        rows = parse_plaintext_lines(
            df, now=NOW,
            translations={f"12.{HVAC}": {"Heating": "1"}},  # specific: dead
        ).collect()
        assert rows == []  # 'Heating' stays symbolic -> coercion drops it


class TestEmptySectionSemantics:
    """ADVICE r5: the reference tests section EXISTENCE (`if
    translate[wildtag]`), so a present-but-empty [*.tag] section maps
    every value to 'unknown' (dropped by coercion) rather than passing
    values through."""

    def test_parse_keeps_empty_sections(self):
        trans = parse_translation_conf("[*.urn:svc:Sensor1.Current]\n")
        assert trans == {"*.urn:svc:Sensor1.Current": {}}

    def test_empty_section_drops_all_values(self, spark):
        trans = parse_translation_conf(
            "[*.urn:svc:Sensor1.Current]\n"
            "[*.urn:svc:Hvac1.ModeStatus]\nIdle = 0\n"
        )
        df = spark.createDataFrame(
            [
                ("12.urn:svc:Sensor1.Current 3.5 1000",),   # empty section: drop
                ("12.urn:svc:Hvac1.ModeStatus Idle 1000",), # mapped: keep
                ("12.urn:svc:Other.Var 7 1000",),           # no section: keep
            ],
            "line string",
        )
        got = {
            r["path"]: r["value"]
            for r in parse_plaintext_lines(df, now=999, translations=trans).collect()
        }
        assert got == {
            "12.urn:svc:Hvac1.ModeStatus": 0.0,
            "12.urn:svc:Other.Var": 7.0,
        }
