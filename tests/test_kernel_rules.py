"""Rule engines (SURVEY.md §1.7, §2.2 P3; L_DataCache.lua:70-160)."""

from datayours_spark.kernel.rules import (
    RewriteRule,
    RuleEngine,
    load_conf_sections,
    read_daemon_conf,
    rule_engine_from_confs,
)

SCHEMAS_CONF = """
# comment
[temperature]
pattern = :Temperature
retentions = 10m:7d,1h:30d,3h:1y,1d:10y

[energy]
pattern = \\.Watts$
retentions = 1m:1d,10m:7d,1h:90d,6h:1y

[default]
pattern = .*
retentions = 1h:7d
"""

AGG_CONF = """
[min]
pattern = \\.min$
xFilesFactor = 0.1
aggregationMethod = min

[sum]
pattern = \\.count$
xFilesFactor = 0
aggregationMethod = sum
"""

REWRITE_CONF = """
[pre]
^foo\\. = bar.
_tmp = _

[post]
\\.slow$ = .fast
"""


class TestConfParse:
    def test_sections(self):
        s = load_conf_sections(SCHEMAS_CONF)
        assert set(s) == {"temperature", "energy", "default"}
        assert s["temperature"]["retentions"].startswith("10m:7d")


class TestFirstMatch:
    def test_schema_first_match_wins(self):
        e = rule_engine_from_confs(schemas_conf=SCHEMAS_CONF)
        r = e.match_schema("d.urn:upnp-org:serviceId:TemperatureSensor1.CurrentTemperature")
        assert r.name == "temperature"
        assert e.match_schema("d.svc.Watts").name == "energy"
        assert e.match_schema("anything.else").name == "default"

    def test_schema_default_when_no_match(self):
        e = RuleEngine()
        assert e.match_schema("x.y").retentions == "1h:7d"

    def test_aggregation_defaults(self):
        e = rule_engine_from_confs(aggregation_conf=AGG_CONF)
        assert e.match_aggregation("a.b.min").aggregation_method == "min"
        assert e.match_aggregation("a.b.count").x_files_factor == 0
        d = e.match_aggregation("a.b.c")
        assert d.aggregation_method == "average" and d.x_files_factor == 0.5


class TestRewrite:
    def test_first_match_single_substitution(self):
        e = rule_engine_from_confs(rewrite_conf=REWRITE_CONF)
        # first rule matches → applied once, second rule NOT applied
        assert e.rewrite_pre("foo._tmp.x") == "bar._tmp.x"
        # first rule doesn't match → second applies (once only)
        assert e.rewrite_pre("a_tmp.b_tmp") == "a_.b_tmp"
        assert e.rewrite_post("query.slow") == "query.fast"

    def test_no_match_identity(self):
        e = RuleEngine(pre_rewrites=[RewriteRule("zzz", "yyy")])
        assert e.rewrite_pre("a.b.c") == "a.b.c"


DAEMON_CONF = """
orphan = before any section
# a comment line
  [carbon]
LOCAL_DATA_DIR = /data/whisper
ENABLE_UDP_LISTENER = True
udp_receiver_port = 2003
MAX_CACHE_SIZE = inf
DESTINATIONS = 127.0.0.1:2004
DESTINATIONS = 127.0.0.1:2005
; not a comment to this parser
[relay]
42 = answer
RELAY_METHOD (3) = rules
pattern = \\.Watts$
threshold = 1.5
[relay]
RELAY_METHOD = consistent-hashing
"""


class TestDaemonConf:
    """Full-fidelity conf reader (L_DataDaemon.lua:106-149)."""

    def test_ordered_items_and_anon_section(self):
        items, index = read_daemon_conf(DAEMON_CONF)
        assert [i["name"] for i in items] == ["_anon_", "carbon", "relay", "relay"]
        assert items[0]["orphan"] == "before any section"
        # duplicate section names: both kept in order, index keeps the LAST
        assert index["relay"] is items[3]
        assert index["relay"]["RELAY_METHOD"] == "consistent-hashing"

    def test_value_coercion(self):
        _, index = read_daemon_conf(DAEMON_CONF)
        carbon = index["carbon"]
        assert carbon["ENABLE_UDP_LISTENER"] is True
        assert carbon["udp_receiver_port"] == 2003
        assert carbon["MAX_CACHE_SIZE"] == float("inf")  # tonumber("inf")
        assert index["relay"] is not None
        relay = [i for i in read_daemon_conf(DAEMON_CONF)[0] if i["name"] == "relay"][0]
        assert relay["threshold"] == 1.5
        # all-digit parameter names become ints
        assert relay[42] == "answer"
        # the "(3)" numeric tag is stripped from the name and discarded
        assert relay["RELAY_METHOD"] == "rules"

    def test_repeated_param_becomes_list(self):
        _, index = read_daemon_conf(DAEMON_CONF)
        assert index["carbon"]["DESTINATIONS"] == ["127.0.0.1:2004", "127.0.0.1:2005"]

    def test_semicolon_is_not_a_comment(self):
        items, _ = read_daemon_conf(DAEMON_CONF)
        relay1 = items[2]
        # "; not a comment..." has no '=' so it is simply ignored as a non-param
        assert "not" not in relay1
        # pattern values are verbatim (no Lua %-escape rewrite; see _coerce_value)
        assert relay1["pattern"] == "\\.Watts$"

    def test_control_chars_stripped(self):
        _, index = read_daemon_conf("[s]\nk = a\x01b\x1fc\n")
        assert index["s"]["k"] == "abc"


class TestAggregationMethodValidation:
    def test_conf_typo_fails_at_parse_with_rule_name(self):
        import pytest

        from datayours_spark.kernel.rules import rule_engine_from_confs

        with pytest.raises(ValueError, match=r"\[power\].*'avg'"):
            rule_engine_from_confs(
                aggregation_conf=(
                    "[power]\npattern = kwh$\naggregationMethod = avg\n"
                )
            )

    def test_valid_methods_accepted(self):
        from datayours_spark.kernel.rules import rule_engine_from_confs

        eng = rule_engine_from_confs(
            aggregation_conf=(
                "[a]\npattern = x\naggregationMethod = last\n"
                "[b]\npattern = y\naggregationMethod = sum\n"
            )
        )
        assert eng.methods_used() == ("average", "last", "sum")
