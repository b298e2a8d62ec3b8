"""Session index caches: a cache hit must be bit-identical to a fresh
recompute (DATAYOURS_NO_INDEX_CACHE=1 builds the full lineage)."""

import os

import pytest

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.001"

# one per cache family: span detection, minhash signatures, simhash
# fingerprints, ANN codes/assignments (+ the coarse model), semdedup
REPRESENTATIVES = [
    "q_span_mask",
    "q_dedup_minhash",
    "q_simhash_neardup",
    "q_ann_ivfpq",
    "q_semdedup",
]


@pytest.mark.parametrize("qname", REPRESENTATIVES)
def test_cache_bypass_identical(spark, qname):
    fn = E.queries()[qname]
    cached = sorted(map(tuple, fn(spark, SF_DIR).collect()))
    os.environ["DATAYOURS_NO_INDEX_CACHE"] = "1"
    try:
        fresh = sorted(map(tuple, fn(spark, SF_DIR).collect()))
    finally:
        os.environ.pop("DATAYOURS_NO_INDEX_CACHE", None)
    assert cached == fresh
    assert len(cached) > 0
