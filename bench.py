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
    # r06 graduates (VERDICT r05 #3): the most expensive queries that
    # entered the certified surface at the r06 rotation — promoted from
    # the staged block to full median-of-3 + plan budgets
    # (tests/test_plan_audits.py::_HEADLINE_PLAN_BUDGETS).
    "text_dup_span_removal",
    "text_dup_span_coverage",
    "text_collocations",
    "sketch_countmin_suppliers",
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
    # The r01–r05 headline set, BEFORE the four r06 graduates joined:
    # BASELINE.md's 20.562 s and every BENCH_r{N} "value" through r05
    # measure THESE 15 queries, so the like-for-like series continues
    # in `value_15q_baseline_comparable` while `value` grows with the
    # headline set (4 heavy r06 graduates ≈ +14 s that would otherwise
    # read as a 2.5× regression).
    R01_SET = HEADLINE[:15]
    out = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "value_15q_baseline_comparable": round(
            sum(timings[n] for n in R01_SET), 3),
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
    # round-6 registrations beyond HEADLINE: single warmed run each +
    # a plan fingerprint — the full newly-certified surface keeps a
    # per-round perf/plan record.
    out["r06"], out["r06_plans"] = _r06_timings(spark, sf_dir)
    # round-7 registrations (the registry_r07 bank, live since the r07
    # rotation): same treatment.
    out["r07"], out["r07_plans"] = _r07_timings(spark, sf_dir)
    # round-8 registrations (registry_r08, wired live at the r08
    # rotation, populated mid-round): same treatment.
    out["r08"], out["r08_plans"] = _r08_timings(spark, sf_dir)
    # round-9 registrations (registry_r09, wired live at r09 start,
    # populated mid-round): same treatment.
    out["r09"], out["r09_plans"] = _r09_timings(spark, sf_dir)
    # round-10 registrations (the registry_r10 bank, live since the
    # r10 rotation, plus mid-round direct additions): same treatment.
    out["r10"], out["r10_plans"] = _r10_timings(spark, sf_dir)
    # round-11 registrations (the registry_r11 bank, live since the
    # r11 rotation, plus mid-round direct additions): same treatment.
    out["r11"], out["r11_plans"] = _r11_timings(spark, sf_dir)
    # round-12 registrations (the registry_r12 bank, live since the
    # r12 rotation, plus mid-round direct additions): same treatment.
    out["r12"], out["r12_plans"] = _r12_timings(spark, sf_dir)
    # round-13 registrations (the registry_r13 bank, live since the
    # r13 rotation, plus mid-round direct additions): same treatment.
    out["r13"], out["r13_plans"] = _r13_timings(spark, sf_dir)
    # round-14 registrations (the registry_r14 bank, live since the
    # r14 rotation, plus mid-round direct additions): same treatment.
    out["r14"], out["r14_plans"] = _r14_timings(spark, sf_dir)
    # round-15 registrations (the registry_r15 bank, live since the
    # r15 rotation, plus mid-round direct additions): same treatment.
    out["r15"], out["r15_plans"] = _r15_timings(spark, sf_dir)
    # round-16 registrations (the registry_r16 bank, live since the
    # r16 rotation, plus mid-round direct additions): same treatment.
    out["r16"], out["r16_plans"] = _r16_timings(spark, sf_dir)
    # r17 staging bank: same single-warmed-run + fingerprint treatment,
    # so nothing registers untimed at the next rotation (the staging
    # contract's own lesson — the 22.7 s rolling-distinct catch).
    out["staged"], out["staged_plans"] = _staged_timings(spark, sf_dir)
    # sf1 scaling evidence (VERDICT r07 #5), gated on
    # SPARK_GRAFT_SF1_DIR so routine per-round runs stay cheap: a
    # single warmed run of every headline query at the synthetic
    # 10x-sf0.1 dataset plus the time slope vs this run's sf0.1
    # medians — sub-linear-in-data slopes (< 10) are the 100x design
    # claim made measurable. The dataset regenerates via
    # scripts/make_sf1.py if evicted from /tmp.
    sf1_dir = os.environ.get("SPARK_GRAFT_SF1_DIR")
    if sf1_dir:
        out["sf1"] = _sf1_block(spark, sf1_dir, timings)
    # Self-contained sidecar FIRST (VERDICT r15 #2): the driver's
    # BENCH_r{N}.json capture keeps only the stdout TAIL, which
    # truncated away the per-round blocks in r15 (the idf/sweep
    # reconciliation walls survived only in prose). bench.py controls
    # what it writes, so the FULL structured output is persisted to a
    # committed BENCH_FULL_r{N}.json the builder adds to the round's
    # artifacts — diffable next round regardless of what the driver's
    # capture keeps. Round number: SPARK_GRAFT_ROUND env if set, else
    # 1 + the newest committed CORRECTNESS_r{N}.json (bench runs in
    # round N after round N−1's correctness artifact landed).
    _write_full_sidecar(out)
    # FULL dump next (one line, for humans / ROUNDLOG), then a COMPACT
    # summary as the FINAL stdout line: the driver's BENCH_r{N}.json
    # capture keeps only a ~2,000-char tail, and the full dump outgrew
    # it in r05 (BENCH_r05–r07 all record `parsed: null`). The last
    # line stays well under the cap so the headline number is always
    # machine-readable (VERDICT r07 "What's missing" #1).
    print(json.dumps(out))
    compact = {
        "metric": out["metric"],
        "value": out["value"],
        "value_15q_baseline_comparable":
            out["value_15q_baseline_comparable"],
        "unit": out["unit"],
        "queries": out["queries"],
        "run_totals": out["run_totals"],
        "recall": out["recall"],
        "sf": out["sf"],
    }
    print(json.dumps(compact))


def _infer_round() -> int:
    """Current round number for the BENCH_FULL sidecar name."""
    env = os.environ.get("SPARK_GRAFT_ROUND")
    if env:
        return int(env)
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    rounds = [int(m.group(1))
              for f in glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))
              if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", f))]
    return (max(rounds) + 1) if rounds else 1


def _write_full_sidecar(out: dict) -> None:
    here = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(here, f"BENCH_FULL_r{_infer_round()}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"full bench output -> {path}", file=sys.stderr)


# Streaming entries manage their own execution (the availableNow drain
# runs at DataFrame-build time); a noop-sink write of the returned
# memory-table scan does not measure them faithfully, so every timing
# block skips them (ADVICE r06: the r06 block's skip set must apply to
# the bank blocks too).
_STREAMING_SKIP = {"stream_ewma_values", "stream_tumbling_counts",
                   "stream_dedup_keys", "stream_click_attribution",
                   "stream_topk_state", "stream_segment_rollup",
                   "stream_sessions_final", "stream_dedup_static_store",
                   "stream_hopping_counts", "stream_interarrival_bands",
                   "stream_burst_flags", "stream_cumulative_users",
                   "stream_error_rate_daily", "stream_bigram_transitions",
                   "stream_max_drawdown", "stream_gap_burstiness"}


def _manifest_timings(
        spark, sf_dir: str, names,
        skip=frozenset()) -> tuple[dict[str, float], dict[str, str]]:
    """Single warmed run + plan fingerprint for each named registered
    query — QUERIES is the single source of truth, so transcription
    drift between bench and registry is impossible."""
    from yougile_etl_pipeline_spark.operators.diagnostics import (
        plan_profile,
    )
    from yougile_etl_pipeline_spark.registry import QUERIES

    timings: dict[str, float] = {}
    plans: dict[str, str] = {}
    for name in names:
        if name in skip or name in _STREAMING_SKIP:
            continue
        # build ONCE per case: some queries legitimately pay bounded
        # construction-time work (e.g. a centroid-count probe)
        df = QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warmup
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        p = plan_profile(df)
        plans[name] = (f"{p['shuffle_exchanges']}"
                       f"/{p['broadcast_exchanges']}"
                       f"/{p['scans_with_pushed_filters']}")
    return timings, plans


def _r07_timings(
        spark, sf_dir: str) -> tuple[dict[str, float], dict[str, str]]:
    """Per-round perf/plan record for the round-7 registrations (live
    in the registry since the r07 rotation)."""
    from yougile_etl_pipeline_spark.registry_r07 import R07_ENTRIES

    return _manifest_timings(spark, sf_dir, R07_ENTRIES,
                             skip=set(HEADLINE))


def _r08_timings(
        spark, sf_dir: str) -> tuple[dict[str, float], dict[str, str]]:
    """Per-round perf/plan record for the round-8 registrations (live
    in the registry since the r08 rotation)."""
    from yougile_etl_pipeline_spark.registry_r08 import R08_ENTRIES

    return _manifest_timings(spark, sf_dir, R08_ENTRIES,
                             skip=set(HEADLINE))


def _r09_timings(
        spark, sf_dir: str) -> tuple[dict[str, float], dict[str, str]]:
    """Per-round perf/plan record for the round-9 registrations (live
    in the registry since the r09 wiring)."""
    from yougile_etl_pipeline_spark.registry_r09 import R09_ENTRIES

    return _manifest_timings(spark, sf_dir, R09_ENTRIES,
                             skip=set(HEADLINE))


def _r10_timings(
        spark, sf_dir: str) -> tuple[dict[str, float], dict[str, str]]:
    """Per-round perf/plan record for the round-10 registrations (live
    in the registry since the r10 rotation)."""
    from yougile_etl_pipeline_spark.registry_r10 import R10_ENTRIES

    return _manifest_timings(spark, sf_dir, R10_ENTRIES,
                             skip=set(HEADLINE))


def _r11_timings(
        spark, sf_dir: str) -> tuple[dict[str, float], dict[str, str]]:
    """Per-round perf/plan record for the round-11 registrations (the
    registry_r11 bank, live since the r11 rotation, plus mid-round
    direct additions)."""
    from yougile_etl_pipeline_spark.registry_r11 import R11_ENTRIES

    return _manifest_timings(spark, sf_dir, R11_ENTRIES,
                             skip=set(HEADLINE))


def _r12_timings(
        spark, sf_dir: str) -> tuple[dict[str, float], dict[str, str]]:
    """Per-round perf/plan record for the round-12 registrations (the
    registry_r12 bank, live since the r12 rotation, plus mid-round
    direct additions)."""
    from yougile_etl_pipeline_spark.registry_r12 import R12_ENTRIES

    return _manifest_timings(spark, sf_dir, R12_ENTRIES,
                             skip=set(HEADLINE))


def _r13_timings(
        spark, sf_dir: str) -> tuple[dict[str, float], dict[str, str]]:
    """Per-round perf/plan record for the round-13 registrations (the
    registry_r13 bank, live since the r13 rotation, plus mid-round
    direct additions)."""
    from yougile_etl_pipeline_spark.registry_r13 import R13_ENTRIES

    return _manifest_timings(spark, sf_dir, R13_ENTRIES,
                             skip=set(HEADLINE))


def _r14_timings(
        spark, sf_dir: str) -> tuple[dict[str, float], dict[str, str]]:
    """Per-round perf/plan record for the round-14 registrations (the
    registry_r14 bank, live since the r14 rotation, plus mid-round
    direct additions)."""
    from yougile_etl_pipeline_spark.registry_r14 import R14_ENTRIES

    return _manifest_timings(spark, sf_dir, R14_ENTRIES,
                             skip=set(HEADLINE))


def _r15_timings(
        spark, sf_dir: str) -> tuple[dict[str, float], dict[str, str]]:
    """Per-round perf/plan record for the round-15 registrations (the
    registry_r15 bank, live since the r15 rotation, plus mid-round
    direct additions)."""
    from yougile_etl_pipeline_spark.registry_r15 import R15_ENTRIES

    return _manifest_timings(spark, sf_dir, R15_ENTRIES,
                             skip=set(HEADLINE))


def _r16_timings(
        spark, sf_dir: str) -> tuple[dict[str, float], dict[str, str]]:
    """Per-round perf/plan record for the round-16 registrations (the
    registry_r16 bank, live since the r16 rotation, plus mid-round
    direct additions)."""
    from yougile_etl_pipeline_spark.registry_r16 import R16_ENTRIES

    return _manifest_timings(spark, sf_dir, R16_ENTRIES,
                             skip=set(HEADLINE))


def _staged_timings(
        spark, sf_dir: str) -> tuple[dict[str, float], dict[str, str]]:
    """Wall time + plan fingerprint for every round-17 BANK entry,
    driven off registry_r17's own registrations. Importing the bank
    module registers its entries IN THIS PROCESS ONLY — they append
    past the already-rotated stable block and the module's tail guard
    re-rotates (registry_r17.py bottom — real since ADVICE r15 #1;
    rotation is idempotent), so the certified window SET bench
    measures is untouched (the driver's correctness process never
    imports the bank; tests/test_registry_r17_staged.py proves
    non-import on the canonical path)."""
    from yougile_etl_pipeline_spark import registry_r17

    return _manifest_timings(spark, sf_dir, registry_r17.R17_ENTRIES)


def _sf1_block(spark, sf1_dir: str,
               sf01_timings: dict[str, float]) -> dict:
    """Median-of-N warmed runs of every headline query at the sf1
    synthetic dataset + slope vs the sf0.1 medians just measured. The
    dataset is 10x sf0.1 (scripts/make_sf1.py: K=10 key-offset
    copies), so a slope near 10 is linear-in-data and anything
    materially below is sub-linear; a slope far ABOVE 10 flags a scale
    cliff (quadratic candidate set, single-task sort, spill) that
    sf0.1 hides. N defaults to 3 (SPARK_GRAFT_SF1_RUNS): two rounds
    running, a SINGLE warmed sf1 run produced false slope alarms
    (r09's oscillation; r10's 15.4 flagship that re-measured at ~3.5)
    — medians retire the per-round cold-cache caveat (VERDICT r10
    #4)."""
    import statistics
    import subprocess

    if not os.path.isdir(sf1_dir):
        here = os.path.dirname(os.path.abspath(__file__))
        subprocess.run(
            [sys.executable, os.path.join(here, "scripts", "make_sf1.py"),
             sf1_dir],
            check=True, cwd=here)
    sf1_runs = int(os.environ.get("SPARK_GRAFT_SF1_RUNS", "3"))
    per_run: list[dict[str, float]] = []
    for _ in range(max(1, sf1_runs)):
        t, _plans = _manifest_timings(spark, sf1_dir, HEADLINE)
        per_run.append(t)
    timings = {n: round(statistics.median(r[n] for r in per_run), 3)
               for n in per_run[0]}
    slopes = {n: round(t / sf01_timings[n], 2)
              for n, t in timings.items()
              if sf01_timings.get(n, 0) > 0.05}  # sub-50ms bases: noise
    return {
        "dir": sf1_dir,
        "runs": len(per_run),
        "queries": timings,
        "spread": {n: round(max(r[n] for r in per_run)
                            - min(r[n] for r in per_run), 3)
                   for n in per_run[0]},
        "total": round(sum(timings.values()), 3),
        "slopes_vs_sf01": slopes,
        "worst_slope": max(slopes.values()) if slopes else None,
    }


def _r06_timings(
        spark, sf_dir: str) -> tuple[dict[str, float], dict[str, str]]:
    """Single warmed run + plan fingerprint for every round-6
    registration not already in HEADLINE, driven straight off the
    registry (the r05 staged block hand-built each case; now that the
    entries are registered, QUERIES is the single source of truth —
    transcription drift between bench and registry is impossible).
    Streaming rows-only entries are skipped: they manage their own
    execution and a noop-sink write does not measure them faithfully.
    Covers VERDICT r05 #5: every r06 registration gets a recorded
    sf-dir wall time each round, not just the ones someone hand-added.
    """
    from yougile_etl_pipeline_spark.registry_r06 import R06_ENTRIES

    return _manifest_timings(spark, sf_dir, R06_ENTRIES,
                             skip=set(HEADLINE))


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
