"""Capture `.explain("formatted")` for the bench headline queries (plus
any extra names given on argv) into plans/r16/<query>_<tag>.txt — the
before/after plan evidence for the round-16 optimization pass.

Usage: python scripts/dump_r16_plans.py <tag> [query ...]
  tag: "before" | "after"; default query set = bench.HEADLINE.
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1 — the bench scale).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "plans", "r16")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    from bench import HEADLINE
    from yougile_etl_pipeline_spark.operators.diagnostics import (
        formatted_plan,
        plan_profile,
    )
    from yougile_etl_pipeline_spark.registry import QUERIES
    from yougile_etl_pipeline_spark.session import get_spark

    names = sys.argv[2:] or list(HEADLINE)
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark(app_name=f"dump-r16-plans-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name](spark, SF)
        plan = formatted_plan(df)
        p = plan_profile(df)
        header = (f"-- {name} @ {SF} ({tag})\n"
                  f"-- plan_profile: shuffles={p['shuffle_exchanges']} "
                  f"broadcasts={p['broadcast_exchanges']} "
                  f"pushed_scans={p['scans_with_pushed_filters']}\n")
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(header + plan.rstrip() + "\n")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
