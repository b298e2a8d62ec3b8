"""carbon aggregation-rules.conf parsing + application (A9)."""

from datayours_spark.kernel.rules import parse_aggregation_rules
from datayours_spark.operators.rollup import carbon_aggregate

#: the reference's own documented example (aggregation-rules.conf.example:17-18)
REF_EXAMPLE = """
# comment
<env>.applications.<app>.all.requests (60) = sum <env>.applications.<app>.*.requests
<env>.applications.<app>.all.latency (60) = avg <env>.applications.<app>.*.latency
"""


class TestParse:
    def test_reference_example(self):
        rules = parse_aggregation_rules(REF_EXAMPLE)
        assert [(r.method, r.frequency) for r in rules] == [("sum", 60), ("avg", 60)]

    def test_compile_substitutes_captures(self):
        rule = parse_aggregation_rules(REF_EXAMPLE)[0]
        regex, repl = rule.compile()
        assert regex == r"^([^.]+)\.applications\.([^.]+)\.[^.]+\.requests$"
        assert repl == "$1.applications.$2.all.requests"


class TestApply:
    def test_buckets_and_renames(self, spark, make_datapoints):
        dp = make_datapoints(
            [
                ("prod.applications.apache.www01.requests", 10, 1.0),
                ("prod.applications.apache.www02.requests", 20, 2.0),
                ("prod.applications.apache.www01.latency", 15, 8.0),
                ("prod.applications.apache.www02.latency", 15, 4.0),
                ("prod.other.path", 10, 99.0),  # matches no rule
            ]
        )
        out = carbon_aggregate(dp, parse_aggregation_rules(REF_EXAMPLE))
        got = {(r["path"], r["slot"]): (r["value"], r["n"]) for r in out.collect()}
        assert got == {
            ("prod.applications.apache.all.requests", 0): (3.0, 2),
            ("prod.applications.apache.all.latency", 0): (6.0, 2),
        }
