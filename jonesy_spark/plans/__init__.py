"""Named query builders + matching DuckDB oracle SQL.

Each submodule exposes ``QUERIES`` (name -> (spark, sf_dir) -> DataFrame)
and ``ORACLE`` (name -> ANSI SQL over the driver-registered DuckDB views
``region nation customer supplier part orders lineitem events documents
embeddings``). The driver hash-compares the two at sf0.01
(order-insensitive), so every computed column is aliased identically on
both sides and floating-point results are made deterministic (decimal
sums cast back to double; cosines rounded).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import reference_queries


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        merged.update(mod.QUERIES)
    return merged


def all_oracle_sql() -> dict[str, str]:
    merged: dict[str, str] = {}
    for mod in _modules():
        merged.update(mod.ORACLE)
    return merged


# The driver checks at most 50 queries() entries (round 1 checked exactly
# the first 50 of 52, silently dropping the tail), so the driver-facing
# dict is a curated subset of the full registry. Excluded names stay in
# all_queries() for bench/tests; each exclusion is a strict semantic
# subset of a retained row (documented in PARITY.md).
DRIVER_QUERY_CAP = 50
DRIVER_EXCLUDED = {
    # ---- REGISTRY-ONLY by design (pytest pins more than a driver
    # slot could; see PYTEST_ONLY_BY_DESIGN) ---------------------------
    # int8-scan + exact-float-rerank ANN: the round(x/scale) int8
    # boundary is where engine ulp drift could flip a candidate;
    # pytest equalities (rerank == float scores; recall >= 0.9) pin it.
    "ann_quantized_topk",
    # IVF-PQ tier next to it: per-subspace k-means codebooks are
    # iterative, so correctness is pytest-pinned (ADC rerank
    # exact-equality, recall floor, code determinism).
    "ann_pq_topk",
    # iterative BPE merge induction is not SQL-expressible; pytest
    # pins naive-reference equality, trainer equivalence, replay
    # encode, concat round-trip.
    "bpe_token_stats",
    # unigram-LM twin (Kudo 2018): EM over the segmentation lattice;
    # pytest pins Viterbi == exhaustive argmax, EM monotonicity,
    # singles retention, exact concat round-trip.
    "unigram_token_stats",
    # rows-only training row whose FOLD is oracle-checked as
    # tokenizer_family_fold (kept on the r13 roster); training keeps
    # its pytest differentials (merge replay, Viterbi == exhaustive,
    # concat round-trips).
    "tokenizer_family_compare",
    # ---- r13 ROSTER (VERDICT r12 #5): the whole >=4-round REVIEW
    # cohort (25 rows, r06-r09 greens) is re-admitted — draining the
    # staleness queue to ZERO — plus the two NEW rows ngram_novelty
    # (word-5-gram novelty vs an md5 train split) and
    # temperature_mixture (tau-rebalanced mix rates, the first driver
    # witness for operators.corpus.temperature_rates). Seats come from
    # rotating out 27 of the r12-green r5/r6 cohort; the keepers are
    # the 18 family-cover hubs + the two r12-new rows
    # (crawl_gate_composed, link_authority_converged) + the three
    # strongest cohort hubs (mixture_upsample, pack_sequences,
    # dedup_survivors_quality). Every row below holds a FRESH r12
    # driver green and keeps its full pytest DuckDB differential; per
    # the cadence each is due back by r15. ---------------------------
    "pivot_event_counts",
    "quantile_stats",
    "text_quality_score",
    "top_tokens_per_lang",
    "ann_bucketed_topk",
    "asof_join_last_click",
    "assemble_sequences",
    "cdc_upsert",
    "cube_agg",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "doc_logprob",
    "funnel_steps",
    "lang_id_heuristic",
    "leakage_safe_split",
    "line_dedup",
    "local_supplier_volume",
    "near_dup_contamination",
    "ngram_containment",
    "pricing_summary_agg",
    "repeated_span_removal",
    "repetition_stats",
    "resample_gapfill",
    "snapshot_cdc",
    "tfidf_top_terms",
    "train_order",
    "url_dedup",
    # r13 (late): the rotation floor hands BOTH new oracle-ready rows
    # (bitext_mining_margin, excess_loss_select) first-witness seats
    # immediately (never-witnessed = oldest), so two keepers whose
    # families stay witnessed rotate out: dedup_survivors_quality
    # (CC-survivor family -> dedup_minhash_lsh + quality_filter) and
    # mixture_upsample (the mixture family's witness is now the
    # on-roster temperature_mixture, whose draw IS mixture_upsample's).
    "dedup_survivors_quality",
    "mixture_upsample",
    # ---- r12 rotations (r11-green; within their cover cadence) -----
    "ann_cosine_topk",
    "basic_attributes",
    "c4_line_filter",
    "corpus_split",
    "dedup_clusters",
    "distinct_counts",
    "diversity_sample",
    "doc_chunking",
    "doc_fingerprints",
    "dsir_select",
    "embedding_near_dup",
    "events_session_native",
    "events_tumbling_window",
    "gopher_quality_gate",
    "hash_embeddings",
    "html_extract",
    "incremental_classifier",
    "link_authority",
    "mixture_sample",
    "omit_drops_withdrawals",
    "perplexity_buckets",
    "phrase_search",
    "prefix_jaccard_join",
    "quota_sample",
    "rollup_agg",
    "semantic_dedup",
    "semi_anti_joins",
    "skew_salted_join",
    "term_enrollments",
    "token_budget_prune",
    "token_counts",
    "unpivot_event_counts",
    # ---- standing exclusions (r10-r11 rotations still within their
    # cover cadence; each keeps its full pytest DuckDB differential
    # and its family witness named in EXCLUSION_COVERS) --------------
    "composite_key_join",
    "latest_event_version",
    "watermark_incremental",
    "pagination_window",
    "set_operations",
    "corpus_card",
    "timestamp_formats",
    "priority_ordered_extract",
    "audio_near_dup",
    "video_near_dup",
    "events_sliding_window",
    "anomaly_flags",
    "quality_psi",
    "bm25_index_probe",
    "events_key_skew",
    "retention_cohorts",
    "image_near_dup",
    "kmv_distinct_users",
    "pii_stats",
}

#: Excluded rows whose correctness is pinned by pytest ALONE, by
#: design (iterative training / engine-ulp boundaries — documented on
#: each row above); the staleness rule's cover check does not apply.
PYTEST_ONLY_BY_DESIGN = {
    "ann_quantized_topk",
    "ann_pq_topk",
    "bpe_token_stats",
    "unigram_token_stats",
}

#: The machine-readable half of each DRIVER_EXCLUDED justification
#: (r9 verdict #8): for every excluded row, the retained rows whose
#: driver greens keep its plan family witnessed. The staleness test
#: (tests/test_rotation.py) asserts each excluded row has at least one
#: cover that is on the CURRENT roster or driver-green within the
#: two-round cadence — so a justification silently invalidated by a
#: later rotation fails a test instead of aging into prose.
EXCLUSION_COVERS: dict[str, tuple[str, ...]] = {
    "mixture_upsample": ("temperature_mixture", "leakage_safe_split"),
    "dedup_survivors_quality": ("dedup_minhash_lsh", "quality_filter"),
    # r13 rotations out (every row here is r12-green; covers name the
    # kept hubs / re-admitted rows now back on the roster)
    "pivot_event_counts": ("events_rollup", "cube_agg"),
    "quantile_stats": ("sketch_dashboard", "trailing_range_stats"),
    "text_quality_score": ("quality_filter", "quality_classifier"),
    "top_tokens_per_lang": ("tfidf_top_terms", "bm25_search"),
    "ann_bucketed_topk": ("incremental_near_dup", "media_index_probe"),
    "asof_join_last_click": ("range_join_calendar", "events_sessionization"),
    "assemble_sequences": ("pack_sequences", "bm25_search"),
    "cdc_upsert": ("snapshot_cdc", "latest_order_per_customer"),
    "cube_agg": ("rollup_agg", "pivot_event_counts"),
    "dedup_ngram_jaccard": ("dedup_minhash_lsh", "ngram_containment"),
    "dedup_simhash": ("dedup_exact", "dedup_minhash_lsh"),
    "doc_logprob": ("quality_classifier", "bigram_logprob"),
    "funnel_steps": ("events_sessionization", "event_transitions"),
    "lang_id_heuristic": ("text_quality_score", "quality_filter"),
    "leakage_safe_split": ("mixture_upsample", "train_order"),
    "line_dedup": ("repeated_span_removal", "dedup_exact"),
    "local_supplier_volume": ("pricing_summary_agg", "term_courses"),
    "near_dup_contamination": ("contamination", "incremental_near_dup"),
    "ngram_containment": ("dedup_ngram_jaccard", "dedup_minhash_lsh"),
    "pricing_summary_agg": ("local_supplier_volume", "cube_agg"),
    "repeated_span_removal": ("line_dedup", "dedup_exact"),
    "repetition_stats": ("text_quality_score", "quality_filter"),
    "resample_gapfill": ("trailing_range_stats", "resample_interpolate"),
    "snapshot_cdc": ("cdc_upsert", "sketch_dashboard"),
    "tfidf_top_terms": ("bm25_search", "top_tokens_per_lang"),
    "train_order": ("mixture_upsample", "pack_sequences"),
    "url_dedup": ("dedup_exact", "scalar_functions_suite"),
    # r12 rotations out (every row here is r11-green; covers name the
    # kept hubs / re-admitted supersets)
    "ann_cosine_topk": ("ann_bucketed_topk", "embedding_near_dup"),
    "basic_attributes": ("recent_instructor_updates", "term_courses"),
    "c4_line_filter": ("crawl_gate_composed",),
    "corpus_split": ("leakage_safe_split", "quota_sample"),
    "dedup_clusters": ("dedup_survivors_quality", "dedup_minhash_lsh"),
    "distinct_counts": ("cube_agg", "term_enrollments"),
    "diversity_sample": ("mixture_upsample", "train_order"),
    "doc_chunking": ("assemble_sequences", "pack_sequences"),
    "doc_fingerprints": ("dedup_exact", "dedup_simhash"),
    "dsir_select": ("train_order", "mixture_upsample"),
    "embedding_near_dup": ("ann_bucketed_topk", "incremental_near_dup"),
    "events_session_native": ("events_sessionization",),
    "events_tumbling_window": ("events_sessionization", "trailing_range_stats"),
    "gopher_quality_gate": ("crawl_gate_composed",),
    "hash_embeddings": ("bm25_search", "ann_bucketed_topk"),
    "html_extract": ("crawl_gate_composed",),
    "incremental_classifier": ("quality_classifier",),
    "link_authority": ("link_authority_converged",),
    "mixture_sample": ("mixture_upsample", "quota_sample"),
    "omit_drops_withdrawals": ("term_courses", "recent_instructor_updates"),
    "perplexity_buckets": ("doc_logprob", "quality_classifier"),
    "phrase_search": ("assemble_sequences", "bm25_search"),
    "prefix_jaccard_join": ("dedup_ngram_jaccard", "dedup_minhash_lsh"),
    "quota_sample": ("mixture_upsample", "leakage_safe_split"),
    "rollup_agg": ("cube_agg",),
    "semantic_dedup": ("ann_bucketed_topk", "dedup_survivors_quality"),
    "semi_anti_joins": ("contamination", "funnel_steps"),
    "skew_salted_join": ("local_supplier_volume", "mg_heavy_hitters"),
    "term_enrollments": ("term_courses",),
    "token_budget_prune": ("pack_sequences", "token_counts"),
    "token_counts": ("bm25_search", "tfidf_top_terms"),
    "unpivot_event_counts": ("pivot_event_counts",),
    # registry-only / superseded rows
    "tokenizer_family_compare": ("tokenizer_family_fold",),
    # standing r7-r11 rotations
    "composite_key_join": ("term_courses", "range_join_calendar"),
    "latest_event_version": ("latest_order_per_customer",),
    "watermark_incremental": ("recent_instructor_updates",),
    "pagination_window": ("current_terms_topk",),
    "set_operations": ("rollup_agg", "distinct_counts"),
    "corpus_card": ("token_budget_prune", "sketch_dashboard"),
    "timestamp_formats": ("scalar_functions_suite",),
    "priority_ordered_extract": ("basic_attributes", "recent_instructor_updates"),
    "audio_near_dup": ("image_near_dup", "multimodal_real_codec"),
    "video_near_dup": ("image_near_dup", "multimodal_real_codec"),
    "events_sliding_window": ("trailing_range_stats", "sketch_dashboard"),
    "anomaly_flags": ("trailing_range_stats",),
    "quality_psi": ("quality_filter", "quality_classifier"),
    "bm25_index_probe": ("bm25_search", "incremental_near_dup"),
    "events_key_skew": ("skew_salted_join", "mg_heavy_hitters"),
    "retention_cohorts": ("events_sessionization", "trailing_range_stats"),
    "image_near_dup": ("multimodal_real_codec", "incremental_near_dup"),
    "kmv_distinct_users": ("sketch_dashboard",),
    "pii_stats": ("scalar_functions_suite", "html_extract"),
}


def driver_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out = {k: v for k, v in all_queries().items() if k not in DRIVER_EXCLUDED}
    assert len(out) <= DRIVER_QUERY_CAP, (
        f"{len(out)} driver-facing queries exceed the driver's "
        f"{DRIVER_QUERY_CAP}-query cap; merge or exclude before adding more"
    )
    return out


def driver_oracle_sql() -> dict[str, str]:
    names = driver_queries()
    return {k: v for k, v in all_oracle_sql().items() if k in names}


def _modules():
    mods = [reference_queries]
    for name in ("extension_queries", "llm_queries"):
        try:
            mods.append(__import__(f"{__name__}.{name}", fromlist=[name]))
        except ImportError:
            pass
    return mods
