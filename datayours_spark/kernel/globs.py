"""Metric-path glob and brace expansion.

Reproduces (`/root/reference/L_DataFinders.lua:185-189`,
`L_DataGraphiteAPI.lua:92-105`, `L_DataGraph.lua:104-117`):

- Per-path-segment glob translation: ``*`` → ``.*``, ``?`` → ``.``, ``-``
  quoted literally; the pattern is anchored ``^...$``.
- Brace expansion ``a{b,c}d{x,y}`` → cross product of alternatives, expanded
  left-to-right (the reference uses a recursive coroutine; we return a list
  in the same order).

These run driver-side (patterns are tiny); the resulting regexes are pushed
into DataFrame ``rlike`` filters.
"""

from __future__ import annotations

import re

_BRACES_RE = re.compile(r"^(.*?)(\{[^{}]*\})(.*)$", re.S)


def expand_braces(text: str) -> list[str]:
    """Expand ``pre{A,B}post`` into the full cross product, reference order."""
    out: list[str] = []

    def expand(x: str, z: str = "") -> None:
        m = _BRACES_RE.match(x)
        if m:
            pre, braces, post = m.groups()
            for y in re.findall(r"[^{},]+", braces):
                expand(post, z + pre + y)
        else:
            out.append(z + x)

    expand(text)
    return out


def glob_to_regex(segment: str) -> str:
    """Translate one glob segment to an anchored regex (`L_DataFinders.lua:185-189`)."""
    escaped = []
    for ch in segment:
        if ch == "*":
            escaped.append(".*")
        elif ch == "?":
            escaped.append(".")
        elif ch in r"\^$.|+()[]{}":
            escaped.append("\\" + ch)
        else:
            escaped.append(ch)
    return "^" + "".join(escaped) + "$"


def glob_path_to_regex(pattern: str) -> list[str]:
    """Translate a full dotted glob (with braces) to whole-path regexes.

    Returns one anchored regex per brace expansion; a path matches the query
    iff it matches any of them. Each dot-separated level is translated
    independently (the reference matches level-by-level during tree descent;
    matching the joined regex against the full path is equivalent because
    ``.`` separators are escaped and ``*``/``?`` cannot cross them — we use
    ``[^.]*`` / ``[^.]`` to preserve the per-level containment).
    """
    regexes = []
    for expanded in expand_braces(pattern):
        level_regexes = [_segment_regex(part) for part in expanded.split(".")]
        regexes.append("^" + "\\.".join(level_regexes) + "$")
    return regexes


def _segment_regex(segment: str) -> str:
    """Glob segment → regex where wildcards cannot cross a ``.`` level."""
    out = []
    for ch in segment:
        if ch == "*":
            out.append("[^.]*")
        elif ch == "?":
            out.append("[^.]")
        elif ch in r"\^$.|+()[]{}":
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "".join(out)
