"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Each query is materialized through the `noop` sink — full execution of
the physical plan (nothing optimized away by a count()-style shortcut),
no driver-collect overhead polluting the measurement.

Usage: python bench.py  [env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: the flagship mart + the scale-sensitive operators (wide
# joins, keyed dedup, window funcs, text/minhash/ANN extensions, event
# analytics). Chosen to exercise every shuffle pattern the engine uses.
HEADLINE = [
    "mart_flagship",
    "agg_pricing_summary",
    "agg_topk_revenue",
    "win_rank_topn",
    "a1_dedup_by_key",
    "j2_left_fact_child",
    "dedup_exact",
    "dedup_minhash_lsh",
    "text_token_stats",
    "sim_cosine_topk",
    "sim_ann_lsh_bucket",
    "sim_ivf_topk",
    "mm_frame_sample",
    "events_hourly_snapshot",
    "events_sessionize",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from yougile_etl_pipeline_spark.registry import QUERIES
    from yougile_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/codegen once so per-query numbers measure the engine,
    # not first-call JIT.
    QUERIES["a2_counts"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # Median of three timed runs per query (per VERDICT r04 #4: this VM
    # shows ±25% run-to-run noise, so a single number can't separate a
    # real regression from scheduler jitter). The first, untimed run
    # pays codegen/IO warmup that a long-running cluster job would
    # amortize; the three timed runs then bound the noise — per-query
    # median goes in `queries`, the per-run totals and per-query spread
    # (max−min) ride alongside so drift analysis needs no re-run.
    # (r01–r04 recorded min-of-2; medians of warmed runs sit within the
    # same band — see the r04 drift audit: runs settle at ~1.2 s after
    # two warmups for agg_pricing_summary.)
    RUNS = 3
    runs: dict[str, list[float]] = {}
    for name in HEADLINE:
        QUERIES[name](spark, sf_dir).write.format("noop") \
            .mode("overwrite").save()  # warmup, untimed
        ts = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        runs[name] = ts
    timings = {n: round(sorted(ts)[len(ts) // 2], 3)
               for n, ts in runs.items()}

    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    out = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "runs": RUNS,
        "run_totals": [round(sum(ts[i] for ts in runs.values()), 3)
                       for i in range(RUNS)],
        "spread": {n: round(max(ts) - min(ts), 3)
                   for n, ts in runs.items()},
        # plan-shape fingerprint per query (shuffles/broadcasts/pushed
        # scans, plan-only — no execution): ties the wall-clock numbers
        # to the physical plans, so a cross-round time delta can be
        # immediately classified as plan change vs VM noise. The same
        # counters are budget-asserted in tests/test_plan_audits.py.
        "plans": _plan_fingerprints(spark, sf_dir),
        "sf": sf_val,
        # ANN quality at bench scale: recall@5 of each approximate
        # variant against the exact brute-force top-5 (sim_cosine_topk).
        # Wall time without a recall number is half a benchmark — a fast
        # ANN that misses its neighbors is just a fast wrong answer.
        "recall": _ann_recall(spark, sf_dir),
    }
    # staged-for-next-round operators (registry.py tail plan): single
    # warmed run each + a plan fingerprint, so the round that
    # registers them inherits perf AND plan baselines instead of a
    # first measurement.
    out["staged"], out["staged_plans"] = _staged_timings(spark, sf_dir)
    print(json.dumps(out))


def _staged_timings(
        spark, sf_dir: str) -> tuple[dict[str, float], dict[str, str]]:
    import math

    from pyspark.sql import functions as F

    from yougile_etl_pipeline_spark.operators.bpe import (
        apply_merge, best_pair, char_symbols, pair_counts)
    from yougile_etl_pipeline_spark.operators.dedup import (
        shingle_blocking_profile, shingle_containment_pairs)
    from yougile_etl_pipeline_spark.operators.frequency import (
        copurchase_lift, count_min_build, count_min_estimate)
    from yougile_etl_pipeline_spark.operators.graph import (
        label_propagation, neighbor_jaccard)
    from yougile_etl_pipeline_spark.operators.layout import corpus_manifest
    from yougile_etl_pipeline_spark.operators.linalg import gram_matrix
    from yougile_etl_pipeline_spark.operators.pq import (
        pq_adc_topk, pq_encode, pq_train)
    from yougile_etl_pipeline_spark.operators.quality import (
        benford_profile, distribution_drift, exact_group_quantiles,
        exact_kth_value, exact_mode, mad_outliers, rfm_scores,
        weighted_group_median, winsorize_by_group)
    from yougile_etl_pipeline_spark.operators.similarity import semantic_dedup
    from yougile_etl_pipeline_spark.operators.text import (
        collocation_lift, domain_affinity, dup_span_coverage,
        dup_span_removal, hashed_term_features, rake_keyphrases)
    from yougile_etl_pipeline_spark.operators.timeseries import (
        cusum_fixed_point, ewma_fixed_point, rolling_slope,
        seasonal_baseline, theil_sen_slope)
    from pyspark.sql.window import Window

    from yougile_etl_pipeline_spark.sources.tables import load_table

    # load_table, not raw spark.read.parquet: it normalizes events.ts
    # (nanos fallback + session-TZ TIMESTAMP, not NTZ) exactly like the
    # registered queries these baselines will become.
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    ev = load_table(spark, sf_dir, "events")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cents = emb.filter(
        F.col("vec_id") < int(round(math.sqrt(emb.count()))))
    cut = F.to_timestamp(F.lit("2024-01-16 00:00:00"))
    words = (docs.select(F.explode(F.split("text", " ")).alias("word"))
             .filter(F.col("word") != "")
             .groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
             .withColumn("syms", char_symbols("word")))

    def _bpe():
        win = best_pair(pair_counts(words, weight_col="cnt"))
        return apply_merge(words, win[0], win[1]).select(
            "word", "cnt", F.array_join("syms", " ").alias("merged"))

    def _pq():
        books = pq_train(emb, iters=1)
        q = emb.filter("vec_id < 8").withColumnRenamed("vec_id",
                                                       "query_id")
        return pq_adc_topk(pq_encode(emb, books), q, books, k=5)

    cases = {
        "sketch_countmin": lambda: count_min_estimate(
            count_min_build(li, "l_suppkey", width=1024, depth=4),
            li.select("l_suppkey"), "l_suppkey", width=1024, depth=4),
        "events_mad_outliers": lambda: mad_outliers(
            ev, "event_type", "value").filter("is_outlier"),
        "quality_distribution_drift": lambda: distribution_drift(
            ev.filter(F.col("ts") < cut), ev.filter(F.col("ts") >= cut),
            "event_type"),
        "dedup_shingle_containment": lambda: shingle_containment_pairs(
            docs, "doc_id", "text", threshold=0.4, block_cols=["lang"]),
        "dedup_blocking_profile": lambda: shingle_blocking_profile(
            docs, "doc_id", "text", block_cols=["lang"]),
        "dedup_semantic": lambda: semantic_dedup(
            emb, cents, threshold=0.25),
        "text_domain_affinity": lambda: domain_affinity(
            docs, docs.filter("lang = 'en'")),
        "text_collocations": lambda: collocation_lift(
            docs, min_pair_count=5),
        "graph_label_propagation": lambda: label_propagation(
            docs.select((F.col("doc_id") % 40).alias("src"),
                        ((F.col("doc_id") * 7 + 3) % 40).alias("dst")),
            iterations=3),
        "emb_gram_matrix": lambda: gram_matrix(emb),
        "corpus_shard_manifest": lambda: corpus_manifest(
            docs, "doc_id", ["text", "lang"]),
        "text_bpe_merge_step": _bpe,
        "events_ewma": lambda: ewma_fixed_point(
            ev, "user_id", ["ts", "event_id"], "value"),
        "ivfpq_adc": _pq,
        "events_theil_sen": lambda: theil_sen_slope(
            ev, "user_id", "ts", "value", max_rows_per_key=20000),
        "events_rolling_users_daily": lambda: (
            ev.select("event_type", F.to_date("ts").alias("day"),
                      "user_id").distinct()
              .select("event_type", "user_id",
                      F.explode(F.sequence(F.lit(0), F.lit(6)))
                       .alias("off"), F.col("day"))
              .select("event_type", "user_id",
                      F.date_add("day", F.col("off"))
                       .alias("window_day"))
              .groupBy("event_type", "window_day")
              .agg(F.count_distinct("user_id").alias("n_users_7d"))),
        "sample_stratified_exact": lambda: docs.withColumn(
            "pick_rank", F.row_number().over(
                Window.partitionBy("lang").orderBy(
                    F.md5(F.col("doc_id").cast("string")),
                    F.col("doc_id"))).cast("long"))
            .filter(F.col("pick_rank") <= 20)
            .select("doc_id", "lang", "pick_rank"),
        "agg_weighted_median": lambda: weighted_group_median(
            li, "l_returnflag", "l_extendedprice", "l_quantity"),
        "quality_benford": lambda: benford_profile(
            orders, "o_totalprice"),
        "events_cusum_alarms": lambda: cusum_fixed_point(
            ev, "user_id", ["ts", "event_id"], "value",
            drift=60.0, threshold=300.0),
        "events_rolling_slope": lambda: rolling_slope(
            ev, "user_id", ["ts", "event_id"], "value", window_n=10),
        "text_dup_span_coverage": lambda: dup_span_coverage(
            docs, n=5),
        "text_dup_span_removal": lambda: dup_span_removal(docs, n=5),
        "freq_copurchase_lift": lambda: copurchase_lift(
            li, "l_orderkey", "l_partkey", min_pair_count=2),
        "events_mode_type": lambda: exact_mode(
            ev, "user_id", "event_type"),
        "graph_link_jaccard": lambda: neighbor_jaccard(
            docs.select((F.col("doc_id") % 40).alias("src"),
                        ((F.col("doc_id") * 7 + 3) % 40).alias("dst"))),
        "text_rake_keyphrases": lambda: rake_keyphrases(docs),
        "agg_exact_quantiles": lambda: exact_group_quantiles(
            li, "l_returnflag", "l_extendedprice",
            q_ppm=[250_000, 500_000, 950_000]),
        "events_seasonal_baseline": lambda: seasonal_baseline(
            ev.select("event_id", "event_type", "ts", "value"),
            "ts", "value", group_cols=["event_type"]),
        "quality_winsorize": lambda: winsorize_by_group(
            li.select("l_orderkey", "l_linenumber", "l_returnflag",
                      "l_extendedprice"),
            "l_returnflag", "l_extendedprice"),
        "text_hashed_features": lambda: hashed_term_features(
            docs, dims=64),
        "mart_rfm_scores": lambda: rfm_scores(
            orders, "o_custkey", "o_orderdate", "o_totalprice"),
        "mart_cohort_ltv": lambda: (lambda o, first: (
            o.join(first, "o_custkey")
             .withColumn("age_months", F.months_between(
                 F.trunc(F.col("o_orderdate").cast("timestamp")
                          .cast("date"), "month"),
                 F.col("cohort_month")).cast("bigint"))
             .groupBy("cohort_month", "age_months")
             .agg(F.sum(F.col("o_totalprice").cast("decimal(24,6)"))
                   .alias("__rev"),
                  F.count(F.lit(1)).alias("n_orders"))
             .select(F.col("cohort_month").cast("string")
                      .alias("cohort_month"),
                     "age_months", "n_orders",
                     F.sum("__rev").over(
                         Window.partitionBy("cohort_month")
                               .orderBy("age_months")
                               .rowsBetween(Window.unboundedPreceding,
                                            Window.currentRow))
                      .cast("double").alias("cum_revenue"))))(
            orders.filter(F.col("o_orderdate").isNotNull()),
            orders.filter(F.col("o_orderdate").isNotNull())
                  .groupBy("o_custkey")
                  .agg(F.min(F.trunc(
                      F.col("o_orderdate").cast("timestamp")
                       .cast("date"), "month")).alias("cohort_month"))),
        "events_dwell_time": lambda: (
            ev.withColumn("__gap_us",
                          F.unix_micros(F.lead("ts", 1).over(
                              Window.partitionBy("user_id")
                                    .orderBy("ts", "event_id")))
                          - F.unix_micros(F.col("ts")))
              .groupBy("user_id", "event_type")
              .agg(F.sum("__gap_us").alias("dwell_us"),
                   F.count("__gap_us").alias("n_intervals"))),
        "events_top_paths": lambda: (
            ev.select("user_id",
                      F.col("event_type").alias("e1"),
                      F.lead("event_type", 1).over(
                          Window.partitionBy("user_id")
                                .orderBy("ts", "event_id")).alias("e2"),
                      F.lead("event_type", 2).over(
                          Window.partitionBy("user_id")
                                .orderBy("ts", "event_id")).alias("e3"))
              .filter(F.col("e1").isNotNull() & F.col("e2").isNotNull()
                      & F.col("e3").isNotNull())
              .select(F.concat_ws(">", "e1", "e2", "e3").alias("path"))
              .groupBy("path").agg(F.count(F.lit(1)).alias("n"))
              .orderBy(F.col("n").desc(), F.col("path")).limit(25)),
    }
    from yougile_etl_pipeline_spark.operators.diagnostics import (
        plan_profile,
    )

    timings: dict[str, float] = {}
    plans: dict[str, str] = {}
    for name, fn in cases.items():
        # build the DataFrame ONCE per case: a per-use fn() would
        # re-run any construction-time work three times (and some
        # cases legitimately pay a collect at build, e.g. the kmeans
        # centroid count)
        df = fn()
        df.write.format("noop").mode("overwrite").save()  # warmup
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        # same shuffles/broadcasts/pushed-scans fingerprint as the
        # headline `plans` block, so the round that registers these
        # inherits a PLAN baseline too, not just a wall time
        p = plan_profile(df)
        plans[name] = (f"{p['shuffle_exchanges']}"
                       f"/{p['broadcast_exchanges']}"
                       f"/{p['scans_with_pushed_filters']}")
    return timings, plans


def _plan_fingerprints(spark, sf_dir: str) -> dict[str, str]:
    """Compact `shuffles/broadcasts/pushed-scans` triple per headline
    query, e.g. ``"2/5/6"``."""
    from yougile_etl_pipeline_spark.operators.diagnostics import (
        plan_profile,
    )
    from yougile_etl_pipeline_spark.registry import QUERIES

    out = {}
    for name in HEADLINE:
        p = plan_profile(QUERIES[name](spark, sf_dir))
        out[name] = (f"{p['shuffle_exchanges']}/{p['broadcast_exchanges']}"
                     f"/{p['scans_with_pushed_filters']}")
    return out


def _ann_recall(spark, sf_dir: str) -> dict[str, float]:
    """recall@5 vs exact ground truth, macro-averaged over queries.

    The collected sets are tiny by construction (|Q|=8 queries x k=5
    pairs per variant) — driver-side set arithmetic on ~40 rows, not a
    distributed op."""
    from yougile_etl_pipeline_spark.registry import QUERIES

    def pairs(name: str) -> dict[int, set[int]]:
        by_q: dict[int, set[int]] = {}
        for r in QUERIES[name](spark, sf_dir) \
                .select("query_id", "match_id").collect():
            by_q.setdefault(r[0], set()).add(r[1])
        return by_q

    truth = pairs("sim_cosine_topk")
    out = {}
    for name in ("sim_ann_lsh_bucket", "sim_ivf_topk",
                 "sim_ivf_multiprobe"):
        got = pairs(name)
        per_q = [len(got.get(q, set()) & t) / len(t)
                 for q, t in truth.items() if t]
        out[name] = round(sum(per_q) / len(per_q), 4) if per_q else 0.0
    return out


if __name__ == "__main__":
    main()
