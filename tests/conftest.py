"""Shared Spark fixtures for operator-level tests."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


@pytest.fixture(scope="session")
def spark():
    from datayours_spark.session import get_spark

    s = get_spark("datayours-tests", cpus=4)
    s.conf.set("spark.sql.shuffle.partitions", "4")
    yield s
    s.stop()


@pytest.fixture()
def make_datapoints(spark):
    """Build a (path, ts_sec, ts_us, value) DataFrame from python tuples
    (path, ts_sec, value); ts_us derives from ts_sec with insertion order as
    the microsecond component so later tuples win LWW ties."""

    def _make(rows):
        data = [
            (p, int(t), int(t) * 1_000_000 + i, float(v) if v is not None else None)
            for i, (p, t, v) in enumerate(rows)
        ]
        return spark.createDataFrame(
            data, "path string, ts_sec bigint, ts_us bigint, value double"
        )

    return _make
