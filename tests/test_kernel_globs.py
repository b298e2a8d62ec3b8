"""Glob/brace translation (SURVEY.md §2.7 F5-F6; L_DataFinders.lua:185-189)."""

import re

from datayours_spark.kernel.globs import (
    expand_braces,
    glob_path_to_regex,
    glob_to_regex,
)


class TestBraces:
    def test_single(self):
        assert expand_braces("a{b,c}d") == ["abd", "acd"]

    def test_cross_product(self):
        assert expand_braces("a{b,c}d{x,y}") == ["abdx", "abdy", "acdx", "acdy"]

    def test_no_braces(self):
        assert expand_braces("plain.path") == ["plain.path"]

    def test_reference_order(self):
        # reference recursion expands leftmost brace outermost
        assert expand_braces("{1,2}{a,b}") == ["1a", "1b", "2a", "2b"]


class TestGlobSegment:
    def test_star(self):
        r = glob_to_regex("Current*")
        assert re.match(r, "CurrentTemperature")
        assert not re.match(r, "OldTemperature")

    def test_question(self):
        r = glob_to_regex("dev?")
        assert re.match(r, "dev1")
        assert not re.match(r, "dev12")

    def test_literal_dash_and_dot(self):
        r = glob_to_regex("Vera-123.x")
        assert re.match(r, "Vera-123.x")
        assert not re.match(r, "Vera-123Qx")  # dot is literal

    def test_anchored(self):
        r = glob_to_regex("abc")
        assert not re.match(r, "abcd") or not re.fullmatch("abc", "abcd")
        assert re.match(r, "abc").group(0) == "abc"


class TestGlobPath:
    PATHS = [
        "events.click.u1",
        "events.click.u2",
        "events.view.u1",
        "system.cpu.load",
    ]

    def match(self, pattern):
        regexes = glob_path_to_regex(pattern)
        return sorted(p for p in self.PATHS if any(re.match(r, p) for r in regexes))

    def test_star_per_level(self):
        assert self.match("events.*.u1") == ["events.click.u1", "events.view.u1"]

    def test_star_does_not_cross_levels(self):
        assert self.match("events.*") == []  # all example paths have 3 levels

    def test_braces(self):
        assert self.match("events.click.u{1,2}") == [
            "events.click.u1",
            "events.click.u2",
        ]

    def test_question(self):
        assert self.match("events.?iew.u1") == ["events.view.u1"]
