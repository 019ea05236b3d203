"""Re-run every staged-query oracle-parity test at the DRIVER'S
certification scale factor (sf0.01) before round-6 registration.

The staged tests prove engine==DuckDB at sf0.001 in normal CI; the
driver certifies at sf0.01, where bigger data can surface ties,
overflows, or boundary-type drift the small fixture never hits. This
wrapper re-executes exactly the parity subset with the fixture dir
overridden (tests/conftest.py reads SPARK_GRAFT_SMOKE_DIR).

Usage: python scripts/check_staged.py [pytest args...]
"""
from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# one parity test per staged round-6 registration (registry.py tail)
PARITY_TESTS = [
    "tests/test_pq_oracle_parity.py",                 # pq trio
    "tests/test_timeseries.py::test_ewma_matches_duckdb_recursive_cte",
    "tests/test_countmin.py::test_countmin_duckdb_parity",
    "tests/test_robust_stats.py::test_mad_outliers_duckdb_parity",
    "tests/test_containment.py::test_containment_duckdb_parity",
    "tests/test_semantic_dedup.py::test_semantic_dedup_duckdb_parity",
    "tests/test_domain_affinity.py::test_domain_affinity_duckdb_parity",
    "tests/test_bpe.py::test_bpe_merge_step_duckdb_parity",
    "tests/test_collocations.py::test_collocation_lift_duckdb_parity",
    "tests/test_label_propagation.py::"
    "test_label_propagation_duckdb_parity",
    "tests/test_linalg.py::test_gram_matrix_duckdb_parity",
    "tests/test_simhash_eval.py::test_simhash_eval_duckdb_parity",
    "tests/test_distribution_drift.py::"
    "test_distribution_drift_duckdb_parity",
    "tests/test_corpus_manifest.py::test_corpus_manifest_duckdb_parity",
    "tests/test_blocking_profile.py::"
    "test_blocking_profile_duckdb_parity",
    "tests/test_kth_value.py::test_duckdb_offset_parity",
    "tests/test_rolling_distinct.py::test_rolling_users_daily_duckdb_parity",
    "tests/test_staged_compositions.py",
    "tests/test_theil_sen.py::test_theil_sen_duckdb_parity",
    "tests/test_readability.py::test_readability_duckdb_parity",
    "tests/test_novelty.py::test_novelty_duckdb_parity",
    "tests/test_kcore.py::test_kcore_duckdb_parity",
    "tests/test_weighted_median.py::test_weighted_median_duckdb_parity",
    "tests/test_benford.py::test_benford_duckdb_parity",
    "tests/test_cusum.py::test_cusum_duckdb_parity",
    "tests/test_rolling_slope.py::test_rolling_slope_duckdb_parity",
    "tests/test_dup_spans.py::test_dup_spans_duckdb_parity",
    "tests/test_dup_removal.py::test_dup_removal_duckdb_parity",
    "tests/test_copurchase.py::test_copurchase_duckdb_parity",
    "tests/test_exact_mode.py::test_exact_mode_duckdb_parity",
    "tests/test_neighbor_jaccard.py::test_neighbor_jaccard_duckdb_parity",
    "tests/test_rake.py::test_rake_duckdb_parity",
    "tests/test_group_quantiles.py::test_group_quantiles_duckdb_parity",
    "tests/test_seasonal_baseline.py::"
    "test_seasonal_baseline_duckdb_parity",
    "tests/test_winsorize.py::test_winsorize_duckdb_parity",
    "tests/test_hashed_features.py::test_hashed_features_duckdb_parity",
    "tests/test_rfm.py::test_rfm_duckdb_parity",
    "tests/test_cohort_ltv.py::test_cohort_ltv_duckdb_parity",
    "tests/test_top_paths.py::test_top_paths_duckdb_parity",
    "tests/test_dwell_time.py::test_dwell_duckdb_parity",
    "tests/test_lang_confusion.py::test_lang_confusion_duckdb_parity",
    # rows-only staged entry: batch-parity chain, not a SQL oracle
    "tests/test_stream_ewma.py::test_stream_matches_batch_bit_for_bit",
]


def main() -> int:
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.01")
    print(f"staged parity sweep at {env['SPARK_GRAFT_SMOKE_DIR']} "
          f"({len(PARITY_TESTS)} test targets)")
    return subprocess.call(
        [sys.executable, "-m", "pytest", "-q", *PARITY_TESTS,
         *sys.argv[1:]],
        cwd=REPO, env=env)


if __name__ == "__main__":
    sys.exit(main())
