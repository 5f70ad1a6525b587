"""Differential tests: every registered query vs its DuckDB oracle at
sf0.001 — the same check the driver runs at sf0.01."""

from __future__ import annotations

import pytest

from jonesy_spark.plans import all_oracle_sql, all_queries

from conftest import SF_DIR, assert_matches_oracle

QUERIES = all_queries()
ORACLE = all_oracle_sql()


def test_every_query_has_oracle_or_is_flagged():
    missing = set(QUERIES) - set(ORACLE)
    # Non-SQL-expressible ops are allowed to omit an oracle, but must be
    # deliberate: list them here when added.
    allowed_missing: set[str] = {
        # int8 rounding boundary is engine-ulp-sensitive; pinned by
        # pytest equalities instead (see plans/llm_queries.py)
        "ann_quantized_topk",
        # iterative per-subspace k-means codebooks (the same class);
        # pinned by ADC rerank exact-equality + recall floor + code
        # determinism (test_operators.py)
        "ann_pq_topk",
        # iterative BPE merge induction is not SQL-expressible; pinned
        # by the test_tokenize differentials (naive reference, trainer
        # equivalence, sequential-replay encode, concat round-trip)
        "bpe_token_stats",
        # unigram-LM lattice EM is the same class; pinned by the
        # exhaustive-enumeration Viterbi oracle, EM monotonicity,
        # singles retention, and the concat round-trip (test_tokenize)
        "unigram_token_stats",
        # trains BOTH families above on one frame, so it inherits their
        # non-SQL-expressibility; the fold is pinned equal to
        # independently aggregating the two pinned per-family stats
        # frames (test_tokenize) AND oracle-checked on the roster as
        # tokenizer_family_fold over the pinned stats fixture (r10
        # verdict #6) — since r11 the roster carries zero rows-only
        # rows (test_rotation pins that list empty)
        "tokenizer_family_compare",
    }
    assert missing <= allowed_missing, f"queries without oracle: {missing}"


def test_oracles_reference_known_queries():
    assert set(ORACLE) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(spark, duck, name):
    df = QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(df, duck, ORACLE[name])


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert len(df.schema) > 0
