"""watch/nowatch control plane: the mutable, persisted watched-series set.

Reproduces `L_DataWatcher.lua:160-203`:

- ``updateWatch("watch"|"nowatch", pattern)`` mutates the watched set —
  idempotent adds/removes, a ``*`` wildcard applies the action across the
  known catalog (the reference loops ``luup.devices`` for a wildcard device
  number), and the call returns the sorted ``action=tag`` change list (the
  reference's HTML response body).
- ``save_conf_file`` persists the set as a DataWatcher conf section —
  ``[DataWatcher]`` header, comment lines, then sorted ``watch=<tag>``
  lines (`L_DataWatcher.lua:160-172`) — and startup re-reads it, so the
  watched set survives a daemon restart.
- per-tag relay tallies (`watched[tag] = watched[tag] + 1`,
  `L_DataWatcher.lua:148-150`) live in memory only, like the reference.

Spark-first shape: the set is tiny control-plane state (a conf file), the
ENFORCEMENT is the distributed ``isin`` predicate in
:class:`~datayours_spark.streaming.ingest.IngestPipeline` (P6) — pass a
WatchList as its ``watched`` and the pipeline reads the current set at
(re)start, exactly when the reference re-registers its variable watches.
"""

from __future__ import annotations

import fnmatch
import os
import time
from dataclasses import dataclass, field


@dataclass
class WatchList:
    """Mutable watched-series set with conf-file persistence."""

    conf_file: str
    #: tag -> relay tally (in-memory only, like the reference's `watched`)
    watched: dict[str, int] = field(default_factory=dict)

    @classmethod
    def load(cls, conf_file: str) -> "WatchList":
        """Read the persisted set; a missing file is an empty set (first
        boot — `L_DataWatcher.lua` startup behavior)."""
        watched: dict[str, int] = {}
        if os.path.exists(conf_file):
            with open(conf_file) as f:
                for line in f:
                    line = line.strip()
                    if line.startswith("watch="):
                        watched[line.split("=", 1)[1]] = 0
        return cls(conf_file, watched)

    def save(self) -> None:
        """Persist as a DataWatcher conf section (`L_DataWatcher.lua:160-172`):
        header + comments + sorted watch= lines."""
        lines = [
            "[DataWatcher]",
            "#",
            "#" + time.strftime(" configuration file auto update: %c"),
            "#",
            "",
        ]
        lines[-1:] = [f"watch={tag}" for tag in sorted(self.watched)] + [""]
        os.makedirs(os.path.dirname(self.conf_file) or ".", exist_ok=True)
        with open(self.conf_file, "w") as f:
            f.write("\n".join(lines))

    def _expand(self, pattern: str, catalog: list[str] | None) -> list[str]:
        if "*" in pattern or "?" in pattern or "[" in pattern:
            return [p for p in (catalog or []) if fnmatch.fnmatchcase(p, pattern)]
        return [pattern]

    def watch(self, pattern: str, catalog: list[str] | None = None) -> list[str]:
        """Add series; wildcard patterns expand against `catalog`.  Returns
        the sorted ``watch=<tag>`` change list (idempotent — already-watched
        tags still appear, mirroring `updateWatch`'s response)."""
        changed = []
        for tag in self._expand(pattern, catalog):
            if tag not in self.watched:
                self.watched[tag] = 0
            changed.append(f"watch={tag}")
        self.save()
        return sorted(changed)

    def nowatch(self, pattern: str, catalog: list[str] | None = None) -> list[str]:
        """Remove series; returns the sorted ``nowatch=<tag>`` change list."""
        changed = []
        for tag in self._expand(pattern, catalog or list(self.watched)):
            if tag in self.watched:
                del self.watched[tag]
            changed.append(f"nowatch={tag}")
        self.save()
        return sorted(changed)

    def tally(self, tag: str) -> None:
        """Count a relayed update for a watched tag (`:148-150`)."""
        if tag in self.watched:
            self.watched[tag] += 1

    def paths(self) -> list[str]:
        """The current watched set, sorted — the ingest predicate input."""
        return sorted(self.watched)
