"""Graphite render-API time parsing with the reference's quirks.

Reproduces (`/root/reference/L_DataGraph.lua:62-98`; duplicated at
`graphite_cgi.lua:58-90` and `L_DataMineServer.lua:106-136`):

- Relative times ``-Nunit`` with units s/min/h/d/w/mon/y (mon = 30 d,
  y = 365 d); N defaults to 1; the result is ``now − N·unit·0.998`` — a
  deliberate 0.2 % shrink so that e.g. a week-long archive still fits in a
  ``-1w`` query window.
- ISO-8601-ish absolute times ``YYYY[-MM[-DD]][THH[:MM[:SS]]]`` with partial
  fields defaulted (month→1, day→1, hour→12, minute→0, second→0) and the
  ordinal-date form ``YYYY-DDD`` (2-digit month field + 1 more digit and no
  day separator re-interpreted as a day-of-year number).
- Plain integers pass through as epoch seconds.

All functions work in epoch seconds (UTC) — the reference uses the server's
local clock via os.time; we standardize on UTC for determinism.
"""

from __future__ import annotations

import calendar
import re
import time as _time
from datetime import datetime, timedelta, timezone

RELATIVE_UNITS = {
    "s": 1,
    "min": 60,
    "h": 3600,
    "d": 86400,
    "w": 86400 * 7,
    "mon": 86400 * 30,
    "y": 86400 * 365,
}

#: The reference's deliberate 0.2% shrink factor (`L_DataGraph.lua:96`).
RELATIVE_SHRINK = 0.998

_REL_RE = re.compile(r"^-(\d*)(\w+)")
_ISO_RE = re.compile(
    r"^(\d{4})-?(\d{0,2})(-?)(\d{0,2})T?(\d{0,2}):?(\d{0,2}):?(\d{0,2})"
)


def parse_relative_time(text: str, now: int | None = None) -> int | None:
    """``-2d`` → now − 2·86400·0.998.  Returns None if not relative syntax."""
    m = _REL_RE.match(text)
    if not m:
        return None
    number, unit = m.groups()
    if unit not in RELATIVE_UNITS:
        return None
    n = int(number) if number else 1
    now = int(_time.time()) if now is None else now
    return int(now - n * RELATIVE_UNITS[unit] * RELATIVE_SHRINK)


def parse_iso8601(text: str) -> int | None:
    """ISO-8601 extended format with partial-field defaults and ordinal dates.

    Defaults: month=1, day=1, hour=12 (noon, the reference's quirk), min=0,
    sec=0 (`L_DataGraph.lua:66-87`).
    """
    m = _ISO_RE.match(text)
    if not m:
        return None
    year_s, month_s, md_sep, day_s, hour_s, min_s, sec_s = m.groups()
    year = int(year_s)
    # ordinal date YYYY-DDD: two digits captured as "month", no separator,
    # one digit captured as "day"  (`L_DataGraph.lua:71-78`)
    if len(month_s) == 2 and md_sep == "" and len(day_s) == 1:
        day_of_year = int(month_s + day_s)
        d = datetime(year, 1, 1, tzinfo=timezone.utc) + timedelta(days=day_of_year - 1)
        month, day = d.month, d.day
    else:
        month = int(month_s) if month_s else 1
        day = int(day_s) if day_s else 1
    hour = int(hour_s) if hour_s else 12
    minute = int(min_s) if min_s else 0
    second = int(sec_s) if sec_s else 0
    return calendar.timegm((year, month, day, hour, minute, second, 0, 0, 0))


def parse_time(text: str | int | float, now: int | None = None) -> int | None:
    """Full time-parse cascade: int passthrough → relative → ISO."""
    if isinstance(text, (int, float)):
        return int(text)
    text = text.strip()
    if re.fullmatch(r"\d+", text):
        return int(text)
    rel = parse_relative_time(text, now)
    if rel is not None:
        return rel
    return parse_iso8601(text)


def default_render_range(now: int | None = None) -> tuple[int, int]:
    """Render default window: last 24 h (`graphite_cgi.lua:386-388`)."""
    now = int(_time.time()) if now is None else now
    return parse_relative_time("-1d", now), now
