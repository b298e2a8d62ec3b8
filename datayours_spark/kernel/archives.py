"""Whisper archive (retention) specifications.

Reproduces the reference's archiveSpec semantics
(`/root/reference/L_DataWhisper.lua:229-311`):

- A retention definition is ``<resolution><unit>?:<retention><unit>?`` where
  units are (s)econd, (m)inute, (h)our, (d)ay, (y)ear — no months or weeks
  (`L_DataWhisper.lua:183-192`).
- If the retention part has NO unit it is a raw point count; with a unit it is
  a duration and points = floor(duration / precision)
  (`L_DataWhisper.lua:295-311`).
- Validation invariants (`L_DataWhisper.lua:229-275`):
    1. at least one archive
    2. no duplicate precisions (list is sorted by precision first)
    3. higher-precision archive precision must evenly divide all lower ones
    4. lower-precision archives must cover strictly larger time intervals
    5. each archive must hold at least enough points to consolidate one
       point of the next archive
- String formatting picks, for each of (precision, total retention seconds),
  the LARGEST unit that divides it evenly (`L_DataWhisper.lua:277-293`).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

UNIT_SECONDS = {"s": 1, "m": 60, "h": 3600, "d": 86400, "y": 86400 * 365, "": 1}

# ordered small→large for formatting; the reference overwrites the result on
# every unit that divides evenly, so the largest one wins.
_FORMAT_UNITS = [("s", 1), ("m", 60), ("h", 3600), ("d", 86400), ("y", 86400 * 365)]

_PAIR_RE = re.compile(r"^(\d+)([smhdy]?):(\d+)([smhdy]?)$")


class ArchiveSpecError(ValueError):
    """Invalid archive specification (reference: WhisperException)."""


@dataclass(frozen=True, order=True)
class Archive:
    """One resolution level: seconds_per_point × points = retention seconds."""

    seconds_per_point: int
    points: int

    @property
    def retention(self) -> int:
        return self.seconds_per_point * self.points

    def quantize(self, ts: int) -> int:
        """Truncate a timestamp to this archive's grid (`L_DataWhisper.lua:331`)."""
        return ts - (ts % self.seconds_per_point)

    def oldest(self, now: int) -> int:
        """Oldest timestamp retained at time `now` (`L_DataWhisper.lua:332`)."""
        return self.quantize(now) - self.retention + self.seconds_per_point


def parse_retention_def(pair: str) -> Archive:
    """Parse one ``res[unit]:ret[unit]`` pair (`L_DataWhisper.lua:299-307`)."""
    m = _PAIR_RE.match(pair.strip())
    if not m:
        raise ArchiveSpecError(f"InvalidConfiguration '{pair}'")
    res_n, res_u, ret_n, ret_u = m.groups()
    precision = int(res_n) * UNIT_SECONDS[res_u]
    points = int(ret_n) * UNIT_SECONDS[ret_u]
    if ret_u != "":
        points = points // precision
    return Archive(precision, points)


def parse_retention_str(spec: str) -> list[Archive]:
    """Parse a comma-separated retention spec and validate it."""
    pairs = [p for p in (s.strip() for s in spec.split(",")) if p]
    if not pairs:
        raise ArchiveSpecError("You must specify at least one archive configuration!")
    archives = [parse_retention_def(p) for p in pairs]
    return validate_archives(archives)


def validate_archives(archives: list[Archive]) -> list[Archive]:
    """Apply the five invariants; returns the list sorted by precision."""
    if not archives:
        raise ArchiveSpecError("You must specify at least one archive configuration!")
    archives = sorted(archives, key=lambda a: a.seconds_per_point)
    for i in range(len(archives) - 1):
        a, b = archives[i], archives[i + 1]
        if not a.seconds_per_point < b.seconds_per_point:
            raise ArchiveSpecError(
                "A Whisper database may not be configured having two archives "
                f"with the same precision ({a.seconds_per_point}, {b.seconds_per_point})"
            )
        if b.seconds_per_point % a.seconds_per_point != 0:
            raise ArchiveSpecError(
                "Higher precision archives' precision must evenly divide all "
                f"lower precision archives' precision ({a.seconds_per_point}, "
                f"{b.seconds_per_point})"
            )
        if not b.retention > a.retention:
            raise ArchiveSpecError(
                "Lower precision archives must cover larger time intervals "
                f"than higher precision archives ({a.retention}s, {b.retention}s)"
            )
        points_per_consolidation = b.seconds_per_point // a.seconds_per_point
        if not a.points >= points_per_consolidation:
            raise ArchiveSpecError(
                "Each archive must have at least enough points to consolidate "
                f"to the next archive (needs {points_per_consolidation}, has {a.points})"
            )
    return archives


def _format_seconds(x: int) -> str:
    """Format seconds with the largest evenly-dividing unit (`L_DataWhisper.lua:280-287`)."""
    result = str(x)
    for unit, secs in _FORMAT_UNITS:
        if x % secs == 0:
            result = f"{x // secs}{unit}"
    return result


def format_archives(archives: list[Archive]) -> str:
    """Format an archive list back to spec text (`L_DataWhisper.lua:277-293`)."""
    return ",".join(
        f"{_format_seconds(a.seconds_per_point)}:{_format_seconds(a.retention)}"
        for a in archives
    )


def max_retention(archives: list[Archive]) -> int:
    return max(a.retention for a in archives)


def select_write_archive(archives: list[Archive], diff: int) -> tuple[int, Archive]:
    """Finest archive whose retention covers ``now - ts`` (`L_DataWhisper.lua:504-511`).

    Returns (index, archive). Falls through to the coarsest archive like the
    reference loop does.
    """
    archives = sorted(archives, key=lambda a: a.seconds_per_point)
    for i, a in enumerate(archives):
        if a.retention >= diff:
            return i, a
    return len(archives) - 1, archives[-1]


def select_read_archive(archives: list[Archive], from_time: int, now: int) -> Archive:
    """Finest archive whose oldest() covers from_time (`L_DataWhisper.lua:544-549`).

    Falls through to the coarsest archive when none covers from_time.
    """
    archives = sorted(archives, key=lambda a: a.seconds_per_point)
    for a in archives:
        if a.oldest(now) <= from_time:
            return a
    return archives[-1]
