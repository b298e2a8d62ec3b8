"""DataFrame-level operators reproducing the reference's query semantics."""

from datayours_spark.operators.fetch import fetch_grid, lww_slots, time_grid  # noqa: F401
from datayours_spark.operators.rollup import rollup, rollup_all_methods  # noqa: F401
from datayours_spark.operators.align import (  # noqa: F401
    apply_null_policy,
    asof_resample,
    pivot_align,
    staircase,
)
