"""Session index caches: a cache hit must be bit-identical to a fresh
recompute (DATAYOURS_NO_INDEX_CACHE=1 bypasses the caches on READ and
write, building the full lineage).

ADVICE r4 flagged the original bypass test as vacuous: the helpers
consulted the cache before checking the env var, so the "fresh" run
returned the already-cached DataFrames and the equality could never
fail.  The helpers now gate the cache READ on `_df_cache_enabled()`;
`test_bypass_ignores_poisoned_cache` proves it by planting a wrong
DataFrame in the cache and checking the bypass run doesn't serve it.
"""

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


def test_bypass_ignores_poisoned_cache(spark):
    """With the bypass env set, a helper must not READ its cache: plant a
    deliberately wrong spans table under the exact cache key and check the
    bypass run recomputes (while a normal run would serve the poison)."""
    fn = E.queries()["q_span_mask"]
    truth = sorted(map(tuple, fn(spark, SF_DIR).collect()))
    app_id = spark.sparkContext.applicationId
    key = (app_id, SF_DIR, E.SPAN_K, E.SPAN_MIN_TOKENS)
    real = E._SPAN_CACHE.get(key)
    assert real is not None, "q_span_mask should have populated the cache"
    poison = real.where("doc_id < 0")  # empty spans => all-zero masks
    E._SPAN_CACHE[key] = poison
    try:
        poisoned = sorted(map(tuple, fn(spark, SF_DIR).collect()))
        assert poisoned != truth, (
            "poison did not take — the cache key changed and this test "
            "needs updating"
        )
        os.environ["DATAYOURS_NO_INDEX_CACHE"] = "1"
        try:
            fresh = sorted(map(tuple, fn(spark, SF_DIR).collect()))
        finally:
            os.environ.pop("DATAYOURS_NO_INDEX_CACHE", None)
        assert fresh == truth
    finally:
        E._SPAN_CACHE[key] = real
