"""First-match-wins ordered rule engines.

Reproduces the reference's three conf-driven rule systems
(`/root/reference/L_DataCache.lua:70-75, 94-129, 142-160`):

- **storage-schemas.conf**: ordered ``[name] pattern= retentions=`` sections;
  the first rule whose regex matches the metric path supplies the retention
  spec for a newly-seen series.  Default: ``1h:7d``.
- **storage-aggregation.conf**: same shape, supplying ``xFilesFactor`` and
  ``aggregationMethod``.  Defaults: xff 0.5, method "average".
- **rewrite-rules.conf**: ``[pre]``/``[post]`` sections of
  ``regex = replacement`` lines; the FIRST matching rule rewrites the path
  ONCE (single substitution), then processing stops
  (`L_DataCache.lua:123-129`).

All rule tables are tiny and evaluated driver-side; the resulting decisions
(retention spec per series, rewritten paths) are either broadcast or compiled
into `when`/`otherwise` column expressions.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class SchemaRule:
    name: str
    pattern: str  # regex matched against the metric path (search, not anchored)
    retentions: str = "1h:7d"


#: whisper's aggregation-method set (`L_DataWhisper.lua:469-491`) — the
#: canonical list; `operators.rollup.AGG_METHODS` aliases it
_KNOWN_AGG_METHODS = ("average", "sum", "last", "max", "min")


@dataclass
class AggregationRule:
    name: str
    pattern: str
    x_files_factor: float = 0.5
    aggregation_method: str = "average"


@dataclass
class RewriteRule:
    pattern: str
    replacement: str


DEFAULT_SCHEMA = SchemaRule(name="[default]", pattern="", retentions="1h:7d")
DEFAULT_AGGREGATION = AggregationRule(
    name="[default]", pattern="", x_files_factor=0.5, aggregation_method="average"
)


@dataclass
class RuleEngine:
    """Ordered first-match rule evaluation (`L_DataCache.lua:70-75`)."""

    schemas: list[SchemaRule] = field(default_factory=list)
    aggregations: list[AggregationRule] = field(default_factory=list)
    pre_rewrites: list[RewriteRule] = field(default_factory=list)
    post_rewrites: list[RewriteRule] = field(default_factory=list)

    def match_schema(self, path: str) -> SchemaRule:
        for rule in self.schemas:
            if rule.pattern and re.search(rule.pattern, path):
                return rule
        return DEFAULT_SCHEMA

    def match_aggregation(self, path: str) -> AggregationRule:
        for rule in self.aggregations:
            if rule.pattern and re.search(rule.pattern, path):
                return rule
        return DEFAULT_AGGREGATION

    @staticmethod
    def apply_rewrites(path: str, rules: list[RewriteRule]) -> str:
        """First matching rule substitutes once, then stop (`L_DataCache.lua:123-129`)."""
        for rule in rules:
            new, n = re.subn(rule.pattern, rule.replacement, path, count=1)
            if n > 0:
                return new
        return path

    def methods_used(self) -> tuple[str, ...]:
        """Distinct aggregation methods this conf can assign (rules plus
        the default) — driver-side knowledge that lets the rollup cascade
        prune unused aggregate buffers without running any pre-job."""
        seen = {r.aggregation_method for r in self.aggregations}
        seen.add(DEFAULT_AGGREGATION.aggregation_method)
        return tuple(sorted(seen))

    def rewrite_pre(self, path: str) -> str:
        return self.apply_rewrites(path, self.pre_rewrites)

    def rewrite_post(self, path: str) -> str:
        return self.apply_rewrites(path, self.post_rewrites)


def load_conf_sections(text: str) -> dict[str, dict[str, str]]:
    """Parse Graphite-format conf text: ``[section]`` + ``key = value`` lines.

    Mirrors `L_DataDaemon.lua:106-149` minimally: comments (# ;) ignored,
    values keep their raw string form; repeated keys keep the last value
    (the daemon's list behavior isn't needed for schema files).
    """
    sections: dict[str, dict[str, str]] = {}
    current: dict[str, str] | None = None
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#") or line.startswith(";"):
            continue
        m = re.match(r"^\[(.+)\]$", line)
        if m:
            current = sections.setdefault(m.group(1), {})
            continue
        m = re.match(r"^([^=\s]+)\s*=\s*(.*)$", line)
        if m and current is not None:
            current[m.group(1)] = m.group(2).strip()
    return sections


_CTRL_CHARS = re.compile(r"[\x01-\x1f]")
_SECTION_LINE = re.compile(r"^\s*\[([^\]]+)\]")
# param name excludes '=', '(' and whitespace; an optional "(n)" numeric tag
# after the name is parsed and discarded, exactly as the reference does
_PARAM_LINE = re.compile(r"^\s*([^=(\s]+)\s*(?:\(\s*\d*\s*\))?\s*=\s*(.*?)\s*$")


def _coerce_value(param: str, value: str):
    """Reference value coercion (`L_DataDaemon.lua:121-128`).

    ``pattern`` values are kept VERBATIM: the reference rewrites ``\\`` to
    ``%`` only because its match engine speaks Lua patterns
    (`L_DataDaemon.lua:126` — "both their own escapes!"); our rule engines
    feed Python/Spark regex where ``\\d`` etc. is already the native escape,
    so the faithful translation of that line is the identity.
    """
    if param == "pattern":
        return value
    if value.upper() == "TRUE":
        return True
    if value.upper() == "FALSE":
        return False
    try:
        return int(value)
    except ValueError:
        try:
            return float(value)
        except ValueError:
            return value


def read_daemon_conf(text: str) -> tuple[list[dict], dict[str, dict]]:
    """Full-fidelity port of the daemon conf reader (`L_DataDaemon.lua:106-149`).

    Returns ``(items, index)`` like the reference's ``read_conf_file``:
    ``items`` is the ORDERED list of ``{"name": section, param: value, ...}``
    dicts (duplicate section names each get their own item), ``index`` maps
    section name → item (last section of a name wins).  Quirks reproduced:

    - only ``#`` starts a comment (``;`` is NOT a comment to this parser);
    - parameters before any ``[section]`` land in a ``[_anon_]`` item;
    - an optional numeric tag ``param (3) = v`` is stripped from the name;
    - control characters are removed from values;
    - all-digit parameter names become ints;
    - values coerce TRUE/FALSE → bool, numeric strings → numbers,
      else stay strings (``pattern`` exempt — see `_coerce_value`);
    - a repeated parameter within a section becomes a list of values.
    """
    items: list[dict] = []
    index: dict[str, dict] = {}
    current: dict | None = None

    def open_section(name: str) -> dict:
        item: dict = {"name": name}
        items.append(item)
        index[name] = item
        return item

    for raw in text.splitlines():
        if re.match(r"^\s*#", raw):
            continue
        m = _SECTION_LINE.match(raw)
        if m:
            current = open_section(m.group(1))
            continue
        m = _PARAM_LINE.match(raw)
        if m:
            param, value = m.group(1), _CTRL_CHARS.sub("", m.group(2))
            key = int(param) if param.isdigit() else param
            coerced = _coerce_value(param, value)
            if current is None:
                current = open_section("_anon_")
            if key in current:
                existing = current[key]
                if not isinstance(existing, list):
                    existing = [existing]
                existing.append(coerced)
                coerced = existing
            current[key] = coerced
    return items, index


def parse_translation_conf(text: str) -> dict[str, dict[str, str]]:
    """DataTranslation.conf → {wildtag: {symbol: value-string}}.

    One section per ``device.serviceId.variable`` lookup tag (device
    specific or ``'*'``), each mapping symbolic capture values to numeric
    strings (reference `DataTranslation.conf:16-19`).  The capture path is
    matched against the section name with its leading device number
    wildcarded — ``tag:gsub("^%d+", "*")``, `L_DataWatcher.lua:152-155` —
    and an in-section miss translates to the literal ``'unknown'``, which
    the numeric-coercion filter then drops (`L_DataCache.lua:178-180`).
    Values stay raw strings; the plaintext parser coerces them exactly
    like wire values.

    A present-but-EMPTY section is kept as an empty dict (ADVICE r5): the
    reference's watch callback tests section existence (``if
    translate[wildtag]``), so an empty ``[*.tag]`` section maps EVERY
    value to 'unknown' and drops it — dropping the section here would
    instead pass values through untranslated.
    """
    return {name: dict(kv) for name, kv in load_conf_sections(text).items()}


def rule_engine_from_confs(
    schemas_conf: str = "", aggregation_conf: str = "", rewrite_conf: str = ""
) -> RuleEngine:
    """Build a RuleEngine from Graphite conf file contents."""
    engine = RuleEngine()
    for name, kv in load_conf_sections(schemas_conf).items():
        engine.schemas.append(
            SchemaRule(
                name=name,
                pattern=kv.get("pattern", ""),
                retentions=kv.get("retentions", "1h:7d"),
            )
        )
    for name, kv in load_conf_sections(aggregation_conf).items():
        method = kv.get("aggregationMethod", "average")
        if method not in _KNOWN_AGG_METHODS:
            # fail at PARSE time with the rule named — whisper's own
            # create() rejects unknown methods; deferring would instead
            # crash the first rollup refresh far from the typo (the
            # methods_used() pruning makes the cascade strict)
            raise ValueError(
                f"storage-aggregation rule [{name}]: unrecognized "
                f"aggregationMethod '{method}' "
                f"(expected one of {sorted(_KNOWN_AGG_METHODS)})"
            )
        engine.aggregations.append(
            AggregationRule(
                name=name,
                pattern=kv.get("pattern", ""),
                x_files_factor=float(kv.get("xFilesFactor", 0.5)),
                aggregation_method=method,
            )
        )
    # rewrite-rules.conf: [pre]/[post] sections of  pattern = replacement
    section = None
    for raw in rewrite_conf.splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        m = re.match(r"^\[(\w+)\]$", line)
        if m:
            section = m.group(1)
            continue
        m = re.match(r"^(\S+)\s*=\s*(\S*)$", line)
        if m and section in ("pre", "post"):
            rule = RewriteRule(pattern=m.group(1), replacement=m.group(2))
            (engine.pre_rewrites if section == "pre" else engine.post_rewrites).append(rule)
    return engine


# ---------------------------------------------------------------------------
# carbon aggregation-rules.conf: cross-series aggregation rules
# (`/root/reference/Configuration/aggregation-rules.conf.example:1-29`;
# documented-but-unimplemented in the reference, `L_DataCache.lua:121` —
# SURVEY §2.3 A9 includes it as a capability)


@dataclass
class CarbonAggregationRule:
    """``output_template (frequency) = method input_pattern``.

    `input_pattern` segments: ``<name>`` captures one path level, ``*``
    matches one level uncaptured; `output_template` substitutes the captured
    fields.  method is ``sum`` or ``avg``.
    """

    output_template: str
    frequency: int
    method: str
    input_pattern: str

    def compile(self) -> tuple[str, str]:
        """→ (anchored_regex, replacement) usable by any regexp_replace
        engine ($1-style backreferences)."""
        group_no: dict[str, int] = {}
        parts: list[str] = []
        n = 0
        for seg in self.input_pattern.split("."):
            if seg.startswith("<") and seg.endswith(">"):
                n += 1
                group_no[seg[1:-1]] = n
                parts.append("([^.]+)")
            else:
                escaped = "".join(
                    "[^.]+" if ch == "*" else ("\\" + ch if ch in r"\^$.|?+()[]{}" else ch)
                    for ch in seg
                )
                parts.append(escaped)
        regex = "^" + "\\.".join(parts) + "$"
        out: list[str] = []
        for seg in self.output_template.split("."):
            if seg.startswith("<") and seg.endswith(">"):
                out.append(f"${group_no[seg[1:-1]]}")
            else:
                out.append(seg)
        return regex, ".".join(out)


_AGG_RULE_RE = re.compile(r"^(\S+)\s*\((\d+)\)\s*=\s*(\w+)\s+(\S+)$")


def parse_aggregation_rules(conf_text: str) -> list[CarbonAggregationRule]:
    """Parse aggregation-rules.conf lines (comments/# and blanks skipped)."""
    rules = []
    for raw in conf_text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        m = _AGG_RULE_RE.match(line)
        if m:
            rules.append(
                CarbonAggregationRule(
                    output_template=m.group(1),
                    frequency=int(m.group(2)),
                    method=m.group(3),
                    input_pattern=m.group(4),
                )
            )
    return rules
