"""Contract tests for the driver-facing `__spark_entry__` surface.

The driver oracle-checks only the first 50 dict entries of `queries()`
per round, so the ORDER of the dict is part of the correctness contract:
a slot spent on an entry without an `oracle_sql()` can never earn a green
row.  These tests pin the invariants the round-5 reorder established
without pinning the exact rotation (future rounds may rotate again).
"""

from __future__ import annotations

import glob
import json
import os

import __spark_entry__ as entrymod

DRIVER_WINDOW = 50
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# SURVEY §2 operator families → the oracle-backed queries that exercise
# them.  The staleness test below pins that every family keeps at least
# one driver-green CORRECTNESS row that is at most MAX_STALENESS rounds
# old, counting current window membership as prospectively fresh (the
# driver will check the first-50 window this round).  This makes it
# impossible for a future window rotation to silently retire a family
# from driver coverage forever (round-5 verdict task #7).
MAX_STALENESS = 2

FAMILIES = {
    "ingest_parse": ["q_ingest_parse", "q_ingest_reject"],
    "fetch_grid": ["q_fetch_grid", "q_resolution_route"],
    "rollup": [
        "q_rollup_avg", "q_rollup_sum", "q_rollup_max", "q_rollup_min",
        "q_rollup_last", "q_rollup_xff", "q_rollup_routed",
        "q_streaming_rollup", "q_carbon_aggregator",
    ],
    "meta_catalog": [
        "q_series_meta", "q_rollup_meta", "q_catalog_find",
        "q_metrics_find", "q_metrics_index", "q_metrics_expand",
        "q_brace_find",
    ],
    "align_join": [
        "q_align_pivot", "q_asof_resample", "q_store_federation",
        "q_multireader", "q_join_enrich", "q_interval_algebra",
    ],
    "null_policy_window": [
        "q_null_policy_zero", "q_null_policy_hold",
        "q_null_policy_connected", "q_staircase", "q_locf_chunked",
        "q_sessionize",
    ],
    "per_record": [
        "q_user_hook", "q_translation", "q_rewrite_rules",
        "q_clamp_filter",
    ],
    "render": [
        "q_render_csv", "q_render_json", "q_render_api",
        "q_render_mixed", "q_maxpoints", "q_time_range",
    ],
    "datamine": [
        "q_datamine_asof", "q_dash_report", "q_dm_timeline",
        "q_treemap_rollup", "q_tally_minmax",
    ],
    "tpch": ["q_tpch_q1", "q_tpch_q2", "q_tpch_q3", "q_tpch_q4",
             "q_tpch_q5", "q_tpch_q6", "q_tpch_q7", "q_tpch_q8",
             "q_tpch_q9", "q_tpch_q10", "q_tpch_q11", "q_tpch_q12",
             "q_tpch_q13", "q_tpch_q14", "q_tpch_q15", "q_tpch_q16",
             "q_tpch_q17", "q_tpch_q18", "q_tpch_q19", "q_tpch_q20",
             "q_tpch_q21", "q_tpch_q22"],
    "dedup_exact_lsh": [
        "q_dedup_exact", "q_dedup_tokenset", "q_dedup_minhash",
        "q_dedup_simhash", "q_dup_clusters", "q_dedup_incremental",
        "q_minhash_guarded", "q_simhash_guarded", "q_simhash_neardup",
        "q_ngram_jaccard", "q_dedup_report", "q_neardup_verified",
        "q_winnow_fingerprints", "q_winnow_neardup", "q_source_overlap",
        "q_winnow_matches", "q_winnow_incremental", "q_winnow_spans",
        "q_winnow_dedup", "q_novelty", "q_index_summary",
    ],
    "span_dedup": [
        "q_span_mask", "q_span_removed", "q_span_incremental",
        "q_span_dedup",
    ],
    "embedding_similarity": [
        "q_dedup_embed", "q_dedup_embed_incremental", "q_semdedup",
        "q_cluster_topics", "q_ann_cosine", "q_ann_lsh",
        "q_embed_centroid", "q_multimodal_neardup", "q_hybrid_rrf",
        "q_knn_label", "q_knn_label_routed", "q_embed_project",
        "q_rp_recall", "q_prototype_prune",
    ],
    "ann_index": [
        "q_ann_ivf", "q_ann_ivf_probe2", "q_ann_ivfpq",
        "q_ann_ivfpq_probe2", "q_ann_ivfpq_res", "q_ann_ivfpq_rerank",
        "q_ann_recall", "q_ann_sq", "q_ann_ivfsq",
    ],
    "contamination": ["q_contamination", "q_fuzzy_contamination",
                      "q_leakage_split"],
    "sampling_shards": [
        "q_sample_stratified", "q_sample_temperature",
        "q_sample_uniform_k", "q_token_budget", "q_quota_topk",
        "q_shard_balance", "q_shard_manifest", "q_pack_sequences",
        "q_pack_ids", "q_mix_weights", "q_chunk_shuffle",
    ],
    "text_analysis": [
        "q_text_stats", "q_lang_quality", "q_text_profile",
        "q_tfidf_terms", "q_top_ngrams", "q_repetition_filter",
        "q_token_histogram", "q_unigram_logprob", "q_bigram_logprob",
        "q_corpus_clean", "q_adaptive_quality", "q_quantile_profile",
        "q_daily_active", "q_sliding_rate", "q_oov_rate", "q_chunk_docs",
        "q_dup_ngrams", "q_gopher_rules", "q_bm25", "q_bm25_chunks",
        "q_ppl_buckets", "q_source_quality", "q_tokenize_ids",
        "q_drop_reasons", "q_lang_confusion", "q_bpe_merges",
        "q_bpe_segment", "q_bpe_ids", "q_quality_classifier",
    ],
    "pii_url": ["q_pii_scrub", "q_url_stats"],
    "pipeline_compose": ["q_ingest_pipeline", "q_pipeline_payload"],
    "multimodal": ["q_multimodal_features", "q_frame_sample",
                   "q_resize_plan", "q_audio_segments"],
}


def _green_rounds():
    """name -> most recent round with a hash-green driver CORRECTNESS row."""
    greens: dict[str, int] = {}
    latest = 0
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
        latest = max(latest, rnd)
        with open(path) as fh:
            rows = json.load(fh)
        for name, row in rows.items():
            if isinstance(row, dict) and row.get("hash_match"):
                greens[name] = max(greens.get(name, 0), rnd)
    return greens, latest


def test_queries_oracles_align():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    orphans = [n for n in o if n not in q]
    assert orphans == [], f"oracle_sql entries without a query: {orphans}"


def test_driver_window_fully_oracled():
    """Every entry inside the driver's first-50 check window must have an
    oracle — otherwise the slot is structurally un-greenable."""
    q = list(entrymod.queries())
    o = entrymod.oracle_sql()
    missing = [n for n in q[:DRIVER_WINDOW] if n not in o]
    assert missing == [], f"in-window queries without oracle: {missing}"


def test_no_oracle_queries_sit_past_window():
    q = list(entrymod.queries())
    o = entrymod.oracle_sql()
    for n in q:
        if n not in o:
            assert q.index(n) >= DRIVER_WINDOW, (
                f"{n} has no oracle but occupies window slot {q.index(n)}"
            )


def test_family_queries_exist():
    q = entrymod.queries()
    ghosts = [n for qs in FAMILIES.values() for n in qs if n not in q]
    assert ghosts == [], f"FAMILIES references unknown queries: {ghosts}"


def test_family_driver_coverage_staleness_bound():
    """Every operator family must keep a driver-green row at most
    MAX_STALENESS rounds old, counting current-window membership as
    fresh (the driver checks the first-50 window this round)."""
    greens, latest = _green_rounds()
    if latest == 0:  # no driver rounds recorded yet (fresh clone)
        return
    current = latest + 1
    window = set(list(entrymod.queries())[:DRIVER_WINDOW])
    stale = {}
    for fam, names in FAMILIES.items():
        if any(n in window for n in names):
            continue  # prospectively fresh this round
        age = min(
            (current - greens[n] for n in names if n in greens),
            default=None,
        )
        if age is None or age > MAX_STALENESS:
            stale[fam] = age
    assert not stale, (
        f"families past the {MAX_STALENESS}-round staleness bound "
        f"(rotate one of their queries into the first-{DRIVER_WINDOW} "
        f"window): {stale}"
    )


def test_no_duplicate_query_names():
    # a dict can't literally hold dupes, but a copy-paste slip would
    # silently shrink the surface — pin the expected count floor instead
    q = entrymod.queries()
    assert len(q) >= 106, f"queries() shrank to {len(q)} entries"
