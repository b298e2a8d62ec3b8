"""Data acquisition: Carbon plaintext parsing and the events-table adapter."""

from datayours_spark.sources.events import datapoints_from_events  # noqa: F401
from datayours_spark.sources.plaintext import parse_plaintext_lines  # noqa: F401
