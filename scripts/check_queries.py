"""Ad-hoc oracle check for a subset of registered queries (dev tool).

Usage: python scripts/check_queries.py [query ...]   (default: changed set)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

from tests.oracle_compare import compare, duck_connect  # noqa: E402
from yougile_etl_pipeline_spark.registry import ORACLES, QUERIES  # noqa: E402
from yougile_etl_pipeline_spark.session import get_spark  # noqa: E402

DEFAULT = [
    "set_except", "set_except_dup_left",
    "dedup_shingle_jaccard", "dedup_shingle_capped",
    "dedup_simhash", "dedup_simhash_pairs",
    "dedup_clusters", "dedup_canonical_docs",
    "sim_cosine_topk", "sim_ann_lsh_bucket", "sim_ann_lsh_sized",
    "sim_ivf_topk", "sim_ivf_multiprobe", "ivf_kmeans_step",
    "dedup_embedding_cosine", "dedup_embedding_cosine_w6",
    "text_repetition_stats", "doc_chunks", "train_pack_sequences",
    "sample_source_mix", "events_asof_join",
    "sketch_approx_distinct", "sketch_approx_quantiles",
    "emb_quantize_int8", "sim_topk_int8",
    "text_vocab_topv", "text_oov_rate", "layout_zorder_profile",
    # round-3 session-2 additions
    "dedup_incremental_bloom", "agg_incremental_merge", "text_lm_quality",
    "link_fuzzy_titles", "dim_scd2_orders", "quality_expectations",
    "events_retention_cohorts", "r_unpivot_metrics", "agg_grouping_sets",
    "win_dist_functions", "p_na_fill_drop", "sketch_incremental_merge",
    "events_interval_merge", "events_resample_ffill", "quality_pseudonymize",
]


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    spark = get_spark(app_name="check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connect(SF)
    failed = []
    for name in names:
        t0 = time.perf_counter()
        df = QUERIES[name](spark, SF)
        if name not in ORACLES:
            n = df.count()
            print(f"{name}: rows-only, {n} rows "
                  f"({time.perf_counter() - t0:.1f}s)")
            continue
        issues = compare(df, con, ORACLES[name])
        status = "OK" if not issues else f"FAIL {issues}"
        print(f"{name}: {status} ({time.perf_counter() - t0:.1f}s)")
        if issues:
            failed.append(name)
    if failed:
        sys.exit(f"FAILED: {failed}")
    print("all green")


if __name__ == "__main__":
    main()
