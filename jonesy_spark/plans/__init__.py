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
    # tokenizer_family_fold (kept on the r12 roster); training keeps
    # its pytest differentials (merge replay, Viterbi == exhaustive,
    # concat round-trips).
    "tokenizer_family_compare",
    # metadata-projection stand-in superseded r7 by
    # multimodal_real_codec (kept on the r12 roster), which decodes
    # REAL pixel bytes against a closed-form oracle — a strict
    # upgrade; this row keeps its pytest differential.
    "multimodal_features",
    # ---- r12 ROSTER (VERDICT r11 #2): the REVIEW backlog is drained
    # below 20 by re-admitting the ENTIRE r5/r6 cohort — 30 rows
    # (pivot_event_counts, quantile_stats, text_quality_score,
    # top_tokens_per_lang; ann_bucketed_topk, asof_join_last_click,
    # assemble_sequences, cdc_upsert, cube_agg, dedup_ngram_jaccard,
    # dedup_simhash, dedup_survivors_quality, doc_logprob,
    # funnel_steps, lang_id_heuristic, leakage_safe_split, line_dedup,
    # local_supplier_volume, mixture_upsample, near_dup_contamination,
    # ngram_containment, pack_sequences, pricing_summary_agg,
    # repeated_span_removal, repetition_stats, resample_gapfill,
    # snapshot_cdc, tfidf_top_terms, train_order, url_dedup — all 12
    # verdict-named cohort leaders included) — plus the two NEW rows
    # crawl_gate_composed (r11 #6) and link_authority_converged
    # (r11 #5), with FLOOR_K raised 12 -> 16. The 18 keepers are the
    # family-cover hubs (latest_order_per_customer flagship,
    # term_courses, recent_instructor_updates, scalar_functions_suite,
    # quality_filter, dedup_minhash_lsh, contamination, bm25_search,
    # events_sessionization, trailing_range_stats, sketch_dashboard,
    # current_terms_topk, multimodal_real_codec, incremental_near_dup,
    # dedup_exact, quality_classifier, range_join_calendar,
    # tokenizer_family_fold). Every row rotated out below holds a
    # FRESH r11 driver green and keeps its full pytest DuckDB
    # differential; per the cadence each is due back by r14. --------
    #
    # brute-force cosine top-k: the exact-rank baseline family stays
    # via the re-admitted ann_bucketed_topk (IVF probe + exact
    # rerank, a strict superset plan) and embedding_near_dup (r11).
    "ann_cosine_topk",
    # P1/P5/O1 projection+ordering: family stays via
    # recent_instructor_updates + term_courses (both kept).
    "basic_attributes",
    # C4 line gate (posexplode form): the rules are driver-checked
    # INSIDE the new crawl_gate_composed row (map-only array-filter
    # twin, same schedules, composed with strip_html + Gopher).
    "c4_line_filter",
    # md5-threshold corpus split: family stays via the re-admitted
    # leakage_safe_split (cluster-keyed split, strict superset) and
    # quota_sample (r11).
    "corpus_split",
    # connected-components clusters: family stays via the re-admitted
    # dedup_survivors_quality (builds the same components, then the
    # survivor window) and dedup_minhash_lsh (kept).
    "dedup_clusters",
    # DISTINCT-counting aggregate: family stays via the re-admitted
    # cube_agg (grouping-set Expand superset) and term_enrollments
    # (r11).
    "distinct_counts",
    # md5 unit-draw stratified sample: family stays via the
    # re-admitted mixture_upsample + train_order (same draw/ordering
    # expressions).
    "diversity_sample",
    # ordered chunk slicing: family stays via the re-admitted
    # assemble_sequences + pack_sequences (same ordered
    # collect/slice assembly).
    "doc_chunking",
    # rolling-hash fingerprints: the hashing family stays via
    # dedup_exact (kept) and the re-admitted dedup_simhash.
    "doc_fingerprints",
    # DSIR importance selection: the Gumbel-key/draw family stays via
    # the re-admitted train_order + mixture_upsample.
    "dsir_select",
    # IVF probe + exact verify: family stays via the re-admitted
    # ann_bucketed_topk (same cell-restricted exact-rank plan) and
    # incremental_near_dup (kept).
    "embedding_near_dup",
    # session_window native form: the sessionization family stays via
    # events_sessionization (kept — the gaps-and-islands twin).
    "events_session_native",
    # tumbling windows: family stays via events_sessionization +
    # trailing_range_stats (both kept).
    "events_tumbling_window",
    # Gopher document gate: the rules are driver-checked INSIDE the
    # new crawl_gate_composed row (same operators.hygiene gate over
    # the composed text).
    "gopher_quality_gate",
    # feature-hashed embeddings: the token machinery stays via
    # bm25_search (kept) and the embedding consumers via the
    # re-admitted ann_bucketed_topk.
    "hash_embeddings",
    # HTML extraction: strip_html is driver-checked INSIDE the new
    # crawl_gate_composed row (same skeleton, same strip chain, same
    # oracle CTEs, composed with both gates).
    "html_extract",
    # incremental classifier fold: family stays via
    # quality_classifier (kept — same log-odds scoring).
    "incremental_classifier",
    # fixed-iteration PageRank: the operator is driver-checked by the
    # NEW link_authority_converged row (same operators.graph.pagerank,
    # the tol>0 branch, closed-form stationary oracle).
    "link_authority",
    # mixture proportion sample: family stays via the re-admitted
    # mixture_upsample (same md5 fractional-copy draw) and
    # quota_sample (r11).
    "mixture_sample",
    # CASE-dispatched correlated lookup: the SIS family stays via
    # term_courses + recent_instructor_updates (both kept); the NULL
    # property test keeps pytest.
    "omit_drops_withdrawals",
    # CCNet perplexity terciles: the LM-scoring family stays via the
    # re-admitted doc_logprob and quality_classifier (kept).
    "perplexity_buckets",
    # position-ordered adjacency assembly: family stays via the
    # re-admitted assemble_sequences and bm25_search (kept).
    "phrase_search",
    # posting-list prefix join: family stays via the re-admitted
    # dedup_ngram_jaccard (same banded verify) and dedup_minhash_lsh
    # (kept).
    "prefix_jaccard_join",
    # quota-capped sample: family stays via the re-admitted
    # mixture_upsample + leakage_safe_split (same md5 thresholds).
    "quota_sample",
    # ROLLUP grouping sets: family stays via the re-admitted cube_agg
    # (the strict grouping-set superset).
    "rollup_agg",
    # SemDeDup-style pruning: the embedding-cluster family stays via
    # the re-admitted ann_bucketed_topk + dedup_survivors_quality
    # (same survivor-choice window).
    "semantic_dedup",
    # LEFT SEMI / ANTI joins: family stays via contamination (kept —
    # the broadcast anti-gate) and the re-admitted funnel_steps.
    "semi_anti_joins",
    # salted skew join: witnessed r11; the skew machinery stays via
    # the re-admitted local_supplier_volume (multi-join agg) and
    # mg_heavy_hitters (r9, within cadence); the diagnosis twin
    # events_key_skew keeps its pytest differential.
    "skew_salted_join",
    # wide renamed projection: family stays via term_courses (kept —
    # the computed wide projection superset).
    "term_enrollments",
    # running-sum token budget: family stays via the re-admitted
    # pack_sequences (same budget-fill window) and token_counts
    # (r11).
    "token_budget_prune",
    # whitespace/BPE-ish token counts: family stays via bm25_search
    # (kept) and the re-admitted tfidf_top_terms.
    "token_counts",
    # melt/stack unpivot: family stays via the re-admitted
    # pivot_event_counts (the pivot twin over the same events
    # fixture).
    "unpivot_event_counts",
    # ---- standing exclusions (r7-r11 rotations still within their
    # cover cadence; each keeps its full pytest DuckDB differential
    # and its family witness named in EXCLUSION_COVERS) --------------
    "json_props_extract",
    "variant_props_extract",
    "running_total",
    "topk_per_group_price",
    "catalog_number_parsing",
    "active_day_codes",
    "multimodal_audio_codec",
    "multimodal_video_codec",
    "warc_ingest_roundtrip",
    "scalar_subquery_filter",
    "profile_table",
    "bigram_logprob",
    "hybrid_search",
    "event_transitions",
    "resample_interpolate",
    "lsh_recall",
    "classifier_eval",
    "bloom_membership",
    "events_rollup",
    "media_index_probe",
    "kmv_overlap_users",
    "sampled_quantiles",
    "cms_frequencies",
    "mg_heavy_hitters",
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
    "multimodal_features": ("multimodal_real_codec",),
    # standing r7-r11 rotations
    "json_props_extract": ("scalar_functions_suite",),
    "variant_props_extract": ("scalar_functions_suite",),
    "running_total": ("trailing_range_stats", "events_sessionization"),
    "topk_per_group_price": ("current_terms_topk",),
    "catalog_number_parsing": ("scalar_functions_suite", "timestamp_formats"),
    "active_day_codes": ("scalar_functions_suite", "timestamp_formats"),
    "multimodal_audio_codec": ("audio_near_dup",),
    "multimodal_video_codec": ("video_near_dup",),
    "warc_ingest_roundtrip": ("dedup_exact",),
    "scalar_subquery_filter": ("omit_drops_withdrawals", "current_terms_topk"),
    "profile_table": ("term_enrollments", "dedup_exact"),
    "bigram_logprob": ("quality_classifier",),
    "hybrid_search": ("bm25_search", "hash_embeddings"),
    "event_transitions": ("events_sessionization", "retention_cohorts"),
    "resample_interpolate": ("trailing_range_stats",),
    "lsh_recall": ("dedup_minhash_lsh", "prefix_jaccard_join"),
    "classifier_eval": ("quality_classifier", "incremental_classifier"),
    "bloom_membership": ("kmv_distinct_users", "sketch_dashboard"),
    "events_rollup": ("sketch_dashboard",),
    "media_index_probe": ("incremental_near_dup", "image_near_dup"),
    "kmv_overlap_users": ("kmv_distinct_users", "sketch_dashboard"),
    "sampled_quantiles": ("trailing_range_stats", "quality_filter"),
    "cms_frequencies": ("sketch_dashboard",),
    "mg_heavy_hitters": ("current_terms_topk", "sketch_dashboard"),
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
