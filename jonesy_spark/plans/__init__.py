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
    # ---- standing exclusions (strict semantic subsets of retained rows,
    # or registry-only by design) -------------------------------------
    # (events_session_native, unpivot_event_counts, rollup_agg,
    # semi_anti_joins, doc_fingerprints, token_counts, distinct_counts,
    # corpus_split, ann_cosine_topk, doc_chunking, events_tumbling_window
    # and mixture_sample re-admitted r11: the rotation-floor rule
    # (VERDICT r10 #1, mechanized in coverage_ledger.floor_due +
    # tests/test_rotation.py) puts the FLOOR_K oldest-witnessed
    # oracle-ready rows back on the roster every round — this batch is
    # the r1/r3/r4/r5 cohort, all pre-verified via driver_sim at sf0.01
    # and sf0.1 before the swap.)
    # (timestamp_formats re-admitted r9 per the two-round §2 cadence —
    # F3/F18/F19's own row was r3-stale, the oldest witness in the
    # registry; rotated out again r11 after fresh r9+r10 greens.)
    # (active_day_codes re-admitted r8 per the two-round §2 cadence —
    # r4-stale; see the r8 section at the bottom for this round's
    # rotations out.)
    # composite recomputed expression-for-expression inside the retained
    # quality_filter row (and now hashed as integer micro-units there).
    "text_quality_score",
    # explode + group-count + rank-window family driver-checked via
    # bm25_search (token explode + per-doc aggregation + rank cut).
    "top_tokens_per_lang",
    # (catalog_number_parsing and running_total re-admitted r8 per the
    # two-round §2 cadence — r4/r5-stale.)
    # REGISTRY-ONLY by design: int8-scan + exact-float-rerank ANN. No
    # DuckDB oracle on purpose — the round(x/scale) int8 boundary is
    # where engine ulp drift could flip a candidate; pytest equalities
    # (rerank == float scores; recall >= 0.9) pin it. Benched.
    "ann_quantized_topk",
    # REGISTRY-ONLY by design, the IVF-PQ tier next to it: per-subspace
    # k-means codebooks are iterative, so correctness is pytest-pinned
    # (ADC rerank exact-equality, recall floor, code determinism).
    # Benched for the 32x scan-compression story.
    "ann_pq_topk",
    # (priority_ordered_extract re-admitted r9 per the two-round §2
    # cadence — O4's own row was r5-stale.)
    # REGISTRY-ONLY by design: iterative BPE merge induction is not
    # SQL-expressible; pytest pins far more than a rows-only driver slot
    # would (naive-reference equality, trainer equivalence, replay
    # encode, concat round-trip). Benched for the encode-cost story.
    "bpe_token_stats",
    # REGISTRY-ONLY by design, its r9 unigram-LM twin (Kudo 2018):
    # EM over the segmentation lattice is not SQL-expressible; pytest
    # pins Viterbi == exhaustive-enumeration argmax, EM monotonicity,
    # singles retention, and the exact concat round-trip.
    "unigram_token_stats",
    # (corpus_card admitted r10 per VERDICT r9 #1 — the last
    # oracle-ready row without a driver green takes its first slot;
    # never-witnessed stays at zero.)
    # (topk_per_group_price re-admitted r8 per the two-round §2
    # cadence — r5-stale.)
    # percentile-aggregate family via quality_filter's percentile gate;
    # exact-interpolation members keep their pytest differential
    # (micro-unit outputs since r7).
    "quantile_stats",
    # pivot lowers to conditional-count hash aggregate — family kept
    # via profile_table; pivot/melt twins keep pytest differentials.
    "pivot_event_counts",
    # ---- rotated out r7 to burn the ENTIRE 21-row oracle-ready queue
    # (VERDICT r6 #2: every never-witnessed family gets its first
    # driver slot) and re-admit the five stale §2 ids (VERDICT r6 #5:
    # watermark_incremental, latest_event_version, composite_key_join,
    # set_operations, pagination_window). Every row below keeps its
    # full pytest DuckDB differential; only the driver slot moves. ----
    #
    # snapshot reverse-CDC diff: latest-version-wins family stays via
    # the re-admitted latest_event_version; the diff's full-outer-join
    # status CASE keeps pytest.
    "snapshot_cdc",
    # step-wise min-epoch funnel: the ordered-event families stay via
    # events_sessionization (retained) + event_transitions +
    # retention_cohorts (both admitted r7, the same per-key event-time
    # machinery).
    "funnel_steps",
    # row-multiplication explode: the md5 fractional-copy draw stays
    # via quota_sample / diversity_sample (admitted r7); explode-by-
    # sequence stays via dsir_select's corpus-wide scoring chain.
    "mixture_upsample",
    # epoch shuffle-key expression family (md5 unit draw + ordering)
    # stays via diversity_sample's draw + dsir_select's Gumbel key.
    "train_order",
    # running-sum budget fill stays via events_sessionization's running
    # window; boundary arithmetic keeps pytest.
    "pack_sequences",
    # ordered collect/slice assembly stays via phrase_search's
    # position-ordered adjacency assembly; exact round-trip pytest kept.
    "assemble_sequences",
    # unigram LM scoring: bigram_logprob (admitted r7) is the strict
    # conditional superset (same vocab cut, same smoothing, same
    # micro-unit outputs, plus the lag-pair model).
    "doc_logprob",
    # sketch-level est_jaccard decontamination: the agreement-estimate
    # + banding family stays via incremental_near_dup (retained); the
    # benchmark-broadcast shape via contamination (retained).
    "near_dup_contamination",
    # CASE-dispatch marker counting stays via scalar_functions_suite +
    # quality_filter's occurrence ratios; 6 straight green witnesses.
    "lang_id_heuristic",
    # URL normalize + min-id survivor: the md5-group-min family stays
    # via dedup_exact (retained); regexp members via
    # scalar_functions_suite.
    "url_dedup",
    # explode + per-doc top-gram counts: family stays via bm25_search
    # (token explode + per-doc tf) and the retained quality_filter
    # composite; Gopher-gate thresholds keep pytest.
    "repetition_stats",
    # line-level df-cap boilerplate removal: the df-cap complement
    # family stays via the retained contamination row's broadcast gram
    # gate; reassembly keeps its injected-banner pytest oracle.
    "line_dedup",
    # span-level exact dedup: gram keys + keeper-choice + coverage
    # reassembly keep pytest; the hot-gram df-cap family stays via
    # contamination (retained).
    "repeated_span_removal",
    # TPC-H Q5 join chain: the multi-join decimal-agg family stays via
    # range_join_calendar (retained) + composite_key_join (re-admitted).
    "local_supplier_volume",
    # TPC-H Q1 multi-aggregate: decimal-sum determinism is now pinned
    # by the micro-unit rule everywhere; family stays via
    # range_join_calendar + composite_key_join aggregates.
    "pricing_summary_agg",
    # grouping-set Expand: stays via set_operations (re-admitted;
    # INTERSECT/EXCEPT lower to the same aggregate shapes) +
    # profile_table.
    "cube_agg",
    # upsert merge (union + row_number latest-wins): stays via the
    # re-admitted latest_event_version (conditional window max over the
    # same events fixture).
    "cdc_upsert",
    # as-of last-before join: the conditional-window-max-before-cutoff
    # family stays via latest_event_version (re-admitted); the
    # applyInPandas twin keeps its equality pytest.
    "asof_join_last_click",
    # 3-gram jaccard banding: the banded-cap verify family stays via
    # dedup_minhash_lsh + prefix_jaccard_join (both retained).
    "dedup_ngram_jaccard",
    # directional containment: the posting-list join + df-cap exclusion
    # family stays via prefix_jaccard_join (posting-list prefix join,
    # retained) and contamination (broadcast gram gate, retained).
    "ngram_containment",
    # simhash pigeonhole bands: the hot-bucket-cap banded equi-join is
    # the same plan family as the retained dedup_minhash_lsh; hamming
    # verification keeps its pytest differential. 6 straight greens.
    "dedup_simhash",
    # quality-argmax survivor window: component construction stays via
    # dedup_clusters (retained), the quality composite via
    # quality_filter (retained); first_value window keeps pytest.
    "dedup_survivors_quality",
    # cluster-keyed split: the cluster coalesce stays via dedup_clusters
    # (retained); the md5 split thresholds via quota_sample (admitted).
    "leakage_safe_split",
    # IVF-bucketed top-k: the cell-restricted exact-rank family stays
    # via embedding_near_dup (retained IVF probe + exact verify);
    # per-query rank window via hybrid_search's channels.
    "ann_bucketed_topk",
    # tf*N/df salience ranking: the token tf/df machinery stays via
    # bm25_search (admitted r7 — idf smoothing, tf saturation, rank
    # cut: the strict retrieval superset of rational TF-IDF).
    "tfidf_top_terms",
    # forward-fill gapfill: resample_interpolate (admitted r7) is the
    # same grid + anchor-window plan with interpolation on top;
    # carry-forward member keeps pytest.
    "resample_gapfill",
    # (multimodal_audio_codec, multimodal_video_codec and
    # warc_ingest_roundtrip admitted r8 — the never-witnessed queue
    # goes to zero; their loudness/frame arrays are flattened to
    # scalar rows per the r7 verdict's scalar-only roster rule.)
    # metadata-projection stand-in superseded r7 by
    # multimodal_real_codec: the new row decodes REAL pixel bytes
    # through the vendored PPM codec against a closed-form oracle
    # (feature micro-units + dHash), a strict upgrade over hashing the
    # byte_len/md5 projection; this row keeps its pytest differential.
    "multimodal_features",
    # (The entire r8 never-witnessed queue — video_near_dup,
    # image_near_dup, audio_near_dup, events_rollup, media_index_probe,
    # kmv_distinct_users, sampled_quantiles, events_sliding_window,
    # cms_frequencies, mg_heavy_hitters, kmv_overlap_users,
    # bloom_membership — admitted r9 per VERDICT r8 #1: 12 first-time
    # driver slots, all pre-verified via driver_sim at sf0.01 and
    # sf0.1 before the swap.)
    # ---- rotated out r8: the five §2 ids re-admitted r7 took their
    # fresh driver greens (all green in CORRECTNESS_r07) and rotate
    # out again per PARITY.md's two-round cadence — each keeps its
    # full pytest DuckDB differential; their §2 witnesses stay no
    # older than two rounds and the r8 re-admission batch
    # (running_total, topk_per_group_price, catalog_number_parsing,
    # active_day_codes — r4/r5-stale) takes their slots. ------------
    #
    # (composite_key_join J2, watermark_incremental P9,
    # pagination_window S3/O6, set_operations §2.7 and
    # latest_event_version J10 re-admitted r10 per VERDICT r9 #2 —
    # their r7 witnesses aged out of the two-round §2 cadence.)
    # get_json_object chain: witness r7; twin of variant_props_extract
    # — both keep their pytest differentials; the JSON-path family's
    # scalar members stay via scalar_functions_suite (retained).
    "json_props_extract",
    # variant/open-schema twin of the above: witness r7; same family
    # note, pytest kept.
    "variant_props_extract",
    # ---- rotated out r9: 14 slots freed for the 12-row
    # never-witnessed queue (VERDICT r8 #1) plus the two stale §2-own
    # re-admissions timestamp_formats / priority_ordered_extract
    # (VERDICT r8 #2). Every row below holds a FRESH r8 driver green
    # and keeps its full pytest DuckDB differential; per PARITY.md's
    # cadence each is due for re-admission by r10/r11. --------------
    #
    # §2.5 cumsum+lag+lead+ntile own row: witness r8 (re-admitted r8
    # after r5 staleness); the window family stays driver-checked via
    # trailing_range_stats + events_sessionization (both retained).
    "running_total",
    # rank-cut per-group top-k: witness r8; rank-cut family stays via
    # current_terms_topk (retained) + the incoming media_index_probe /
    # kmv_overlap_users rank windows.
    "topk_per_group_price",
    # F-tier regexp capture/split: witness r8; the scalar-function
    # family stays via scalar_functions_suite (retained) + the
    # re-admitted timestamp_formats.
    "catalog_number_parsing",
    # F-tier date/dayofweek codes: witness r8; same family note —
    # scalar_functions_suite + timestamp_formats cover it.
    "active_day_codes",
    # first witness r8; the vendored-WAV decode boundary stays driver-
    # checked via the incoming audio_near_dup (same codec, decoded
    # waveform dHash vs brute-force oracle — a strict superset of the
    # loudness-feature projection).
    "multimodal_audio_codec",
    # first witness r8; the vendored frame-container decode stays via
    # the incoming video_near_dup (same codec, per-frame dHash
    # alignment vs all-shifts oracle).
    "multimodal_video_codec",
    # first witness r8 (identity oracle); the WARC mapInPandas reader
    # keeps its record-level pytest goldens + the registered job test;
    # the shared documents contract stays via dedup_exact (retained).
    "warc_ingest_roundtrip",
    # P7/A-tier scalar subquery: 8 straight greens r1-r8; the 1-row
    # broadcast scalar-subquery family stays via omit_drops_withdrawals
    # + current_terms_topk (both retained).
    "scalar_subquery_filter",
    # A7 row-count/profile: 8 straight greens r1-r8; distinct/count
    # aggregate family stays via term_enrollments + dedup_exact
    # (retained); due back r10 to keep A7's own witness fresh.
    "profile_table",
    # conditional bigram LM: witnesses r7+r8; strict superset of
    # doc_logprob, and the vocab-cut + smoothing family stays via
    # quality_classifier (retained log-odds scoring).
    "bigram_logprob",
    # BM25+embedding fusion: witnesses r7+r8; a pure composition of
    # bm25_search + hash_embeddings (both retained).
    "hybrid_search",
    # per-key ordered transition pairs: witnesses r7+r8; the lag-over-
    # event-time family stays via events_sessionization +
    # retention_cohorts (both retained).
    "event_transitions",
    # grid resample + linear interpolation: witnesses r7+r8; the
    # time-bucket anchor-window family stays via trailing_range_stats
    # (retained) + the incoming events_sliding_window hop windows.
    "resample_interpolate",
    # LSH recall report: witnesses r7+r8; the banded-join recall
    # machinery stays via dedup_minhash_lsh + prefix_jaccard_join
    # (both retained, the truth-pair budget guard keeps its pytest).
    "lsh_recall",
    # precision/recall/F1 confusion report: witnesses r7+r8; the
    # trainable-classifier family stays via quality_classifier +
    # incremental_classifier (both retained) — freed the 50th slot
    # for the new cross-ledger sketch_dashboard row (VERDICT r8 #8).
    "classifier_eval",
    # ---- rotated out r10: seven slots freed for the corpus_card
    # first witness, the five r7-stale §2 re-admissions (VERDICT r9
    # #1/#2) and the new tokenizer_family_compare row (VERDICT r9 #7).
    # Every row below took its FIRST driver green in r9 and keeps its
    # full pytest DuckDB differential (plus, for the sketch tier,
    # the hypothesis bit-identity merge properties); per PARITY.md's
    # cadence each is due for re-admission by r11/r12. --------------
    #
    # Bloom membership sketch: witness r9; the hash-sketch fold family
    # stays driver-checked via kmv_distinct_users (retained) and the
    # cross-ledger sketch_dashboard (retained); exact-below-capacity
    # and merge bit-identity keep hypothesis pytest.
    "bloom_membership",
    # hour→day hierarchical rollup: witness r9; the re-fold is
    # driver-checked INSIDE the retained sketch_dashboard row (its
    # day panel is this rollup's fold); fold bit-identity keeps
    # hypothesis pytest.
    "events_rollup",
    # phash index probe: witness r9; the banded hamming probe family
    # stays via incremental_near_dup (retained, same band-bucket
    # pruning) and image/audio/video_near_dup (retained, same
    # decoded-dHash machinery); crash-safe compaction keeps pytest.
    "media_index_probe",
    # KMV set-overlap estimate: witness r9; the KMV machinery stays
    # driver-checked via kmv_distinct_users (retained — same sketch,
    # same estimator) and sketch_dashboard's KMV panel; the overlap
    # combinator keeps its exact-below-k pytest differential.
    "kmv_overlap_users",
    # bottom-k quantile sample: witness r9; the order-statistic family
    # stays via trailing_range_stats (retained percentile windows) and
    # quality_filter's percentile gate; sample determinism keeps
    # pytest.
    "sampled_quantiles",
    # count-min frequencies: witness r9; the hashed-counter fold
    # family stays via mg-style heavy hitters' pytest + the retained
    # sketch_dashboard; point-query overestimate bound + merge
    # bit-identity keep hypothesis pytest.
    "cms_frequencies",
    # Misra-Gries heavy hitters: witness r9; the salted pre-reduced
    # top-k window family stays via current_terms_topk (retained
    # rank-cut) and the sketch tier's dashboard; the ±n/k error bound
    # and merge fold keep their pytest differentials.
    "mg_heavy_hitters",
    # ---- rotated out r11: 14 slots freed for the rotation-floor batch
    # (the 12 oldest-witnessed rows, VERDICT r10 #1) plus the two new
    # rows tokenizer_family_fold (oracle-backed fold companion, VERDICT
    # r10 #6) and skew_salted_join (salted skew-join witness, VERDICT
    # r10 #7). Every row below holds a FRESH r10 driver green (the five
    # §2 re-admissions took the greens the r9 verdict ordered) and
    # keeps its full pytest DuckDB differential; per the cadence each
    # is due back by r13. ------------------------------------------
    #
    # rows-only training row: its FOLD is now oracle-checked on the
    # roster as tokenizer_family_fold (same aggregate over the pinned
    # stats fixture); training keeps its pytest differentials (merge
    # replay, Viterbi == exhaustive, concat round-trips), so the
    # driver-checkable surface strictly grew.
    "tokenizer_family_compare",
    # J2 5-key composite inner join: witness r10; the composite-key
    # equi-join family stays via term_courses (retained — the J7/J8
    # 5-key composite left-outer chain) + range_join_calendar.
    "composite_key_join",
    # J10 latest-version epoch sentinel: witness r10; the
    # latest-wins-window family stays via latest_order_per_customer
    # (retained flagship greatest-n-per-group).
    "latest_event_version",
    # P9 watermark incremental: witness r10; the watermark predicate
    # family stays via recent_instructor_updates (retained — the same
    # last-N-days incremental shape over the SIS fixtures); streaming
    # twin keeps batch-parity tests.
    "watermark_incremental",
    # S3/O6 ROWNUM offset+limit window: witness r10; the rank/limit
    # window family stays via current_terms_topk (retained rank cut).
    "pagination_window",
    # §2.7 UNION/INTERSECT/EXCEPT: witness r10; the set-op lowering
    # (Expand/aggregate dedup shapes) stays via the re-admitted
    # rollup_agg + distinct_counts Expand-family rows.
    "set_operations",
    # corpus card: first witness r10; the one-scan doc-stats hash-agg
    # stays via token_budget_prune (retained whitespace/token counts)
    # and the ledger twin via sketch_dashboard (retained).
    "corpus_card",
    # F18/F19 ts formats: witnesses r9+r10; the scalar timestamp family
    # stays via scalar_functions_suite (retained).
    "timestamp_formats",
    # O4 CASE priority ordering: witnesses r9+r10; ordering family
    # stays via basic_attributes + recent_instructor_updates (both
    # retained, O1-O5 witnesses).
    "priority_ordered_extract",
    # vendored-WAV decoded near-dup: witnesses r9+r10; the decoded
    # media dHash machinery stays via image_near_dup +
    # multimodal_real_codec (both retained).
    "audio_near_dup",
    # frame-container decoded near-dup: witnesses r9+r10; same family
    # note — image_near_dup + multimodal_real_codec retained.
    "video_near_dup",
    # hopping-window agg: witness r10; the hop/range window family
    # stays via trailing_range_stats (retained range frames) and
    # sketch_dashboard's windowed panels; streaming twin keeps
    # batch-parity tests.
    "events_sliding_window",
    # rolling z-score flags: witnesses r9+r10; the per-key rolling
    # mean/std range-window family stays via trailing_range_stats
    # (retained — the same RANGE BETWEEN frames).
    "anomaly_flags",
    # population-stability index: witness r10; the binned-share compare
    # family stays via quality_filter + quality_classifier (both
    # retained; the classifier row carries the same score-binning).
    "quality_psi",
    # persisted BM25 index probe: witnesses r9+r10; its slot goes to
    # the NEW semantic_dedup row (never-witnessed rows outrank fresh
    # greens under the floor). The probe==batch theorem's batch side
    # stays driver-checked via bm25_search (retained), and the
    # persisted-index probe family via incremental_near_dup (retained).
    "bm25_index_probe",
    # skew DIAGNOSIS report: witnesses r9+r10; its slot goes to the NEW
    # link_authority row (never-witnessed rows outrank fresh greens
    # under the floor). The skew family's end-to-end superset —
    # joining THROUGH the planted hot key via the salted path —
    # stays on the roster as skew_salted_join (r10 verdict #7), and
    # the heavy-key top-N machinery via mg_heavy_hitters (r9 green,
    # within cadence); the report keeps its pytest DuckDB differential.
    "events_key_skew",
    # per-cohort retention matrix: witnesses r9+r10; its slot goes to
    # the NEW html_extract row (same floor rule). The per-key
    # event-time machinery stays on the roster via events_sessionization
    # and the range-frame windows via trailing_range_stats; the cohort
    # pivot keeps its pytest DuckDB differential.
    "retention_cohorts",
    # decoded-pixel near-dup: witnesses r9+r10; its slot goes to the
    # NEW c4_line_filter row (same floor rule). The vendored-codec
    # decode + dHash machinery stays on the roster via
    # multimodal_real_codec (same PPM decode, same feature/dHash
    # extraction against a closed-form oracle) and the banded hamming
    # probe via incremental_near_dup; the pair trio keeps its
    # brute-force-oracle pytest differentials.
    "image_near_dup",
    # ---- rotated out r11 (late): one slot freed for the NEW
    # perplexity_buckets row (never-witnessed rows outrank fresh greens
    # under the floor rule). ----------------------------------------
    #
    # KMV distinct-count row: witnesses r9+r10; the bottom-k estimator
    # family stays driver-checked via sketch_dashboard (retained —
    # its KMV panel runs the same sketch and estimator), and the
    # estimator's design-error depth check keeps its r10 pytest
    # (k=64/256/1024 within ~2 sigma); the row keeps its full DuckDB
    # differential.
    "kmv_distinct_users",
    # PII scan/redaction stats: witnesses r9+r10; its slot goes to the
    # NEW gopher_quality_gate row (never-witnessed rows outrank fresh
    # greens under the floor rule). The chained-regexp scalar family
    # stays driver-checked via scalar_functions_suite + html_extract
    # (both retained — the same map-only regexp-projection shape), and
    # the redaction goldens keep their pytest DuckDB differential.
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
    "text_quality_score": ("quality_filter",),
    "top_tokens_per_lang": ("bm25_search",),
    "quantile_stats": ("quality_filter",),
    "pivot_event_counts": ("profile_table", "rollup_agg"),
    "snapshot_cdc": ("latest_event_version",),
    "funnel_steps": ("events_sessionization", "retention_cohorts"),
    "mixture_upsample": ("quota_sample", "diversity_sample", "dsir_select"),
    "train_order": ("diversity_sample", "dsir_select"),
    "pack_sequences": ("events_sessionization",),
    "assemble_sequences": ("phrase_search",),
    "doc_logprob": ("bigram_logprob", "quality_classifier"),
    "near_dup_contamination": ("incremental_near_dup", "contamination"),
    "lang_id_heuristic": ("scalar_functions_suite", "quality_filter"),
    "url_dedup": ("dedup_exact", "scalar_functions_suite"),
    "repetition_stats": ("bm25_search", "quality_filter"),
    "line_dedup": ("contamination",),
    "repeated_span_removal": ("contamination",),
    "local_supplier_volume": ("range_join_calendar", "composite_key_join"),
    "pricing_summary_agg": ("range_join_calendar", "composite_key_join"),
    "cube_agg": ("set_operations", "profile_table"),
    "cdc_upsert": ("latest_event_version",),
    "asof_join_last_click": ("latest_event_version",),
    "dedup_ngram_jaccard": ("dedup_minhash_lsh", "prefix_jaccard_join"),
    "ngram_containment": ("prefix_jaccard_join", "contamination"),
    "dedup_simhash": ("dedup_minhash_lsh",),
    "dedup_survivors_quality": ("dedup_clusters", "quality_filter"),
    "leakage_safe_split": ("dedup_clusters", "quota_sample"),
    "ann_bucketed_topk": ("embedding_near_dup", "hybrid_search"),
    "tfidf_top_terms": ("bm25_search",),
    "resample_gapfill": ("resample_interpolate", "trailing_range_stats"),
    "multimodal_features": ("multimodal_real_codec",),
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
    "json_props_extract": ("scalar_functions_suite",),
    "variant_props_extract": ("scalar_functions_suite",),
    "bloom_membership": ("kmv_distinct_users", "sketch_dashboard"),
    "events_rollup": ("sketch_dashboard",),
    "media_index_probe": ("incremental_near_dup", "image_near_dup"),
    "kmv_overlap_users": ("kmv_distinct_users", "sketch_dashboard"),
    "sampled_quantiles": ("trailing_range_stats", "quality_filter"),
    "cms_frequencies": ("sketch_dashboard",),
    "mg_heavy_hitters": ("current_terms_topk", "sketch_dashboard"),
    "tokenizer_family_compare": ("tokenizer_family_fold",),
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
