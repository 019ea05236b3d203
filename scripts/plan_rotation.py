"""Certification-window rotation planner (dev tool).

Reads the newest CORRECTNESS_r*.json plus the registry's rotation lists
and prints exactly what the next round's rotation edit should be:

* which window queries went hash-green (or rows-only-by-design) and can
  move into ``_STABLE_CERTIFIED``;
* which window queries FAILED and must stay in the window;
* the resulting next window (first 50 after rotation) and how many
  deferred entries it absorbs.

Read-only — it prints the plan; the registry edit stays a reviewed,
human-committed change (the lists are load-bearing for the driver
contract, not something to mutate from a script).

Usage: python scripts/plan_rotation.py [path/to/CORRECTNESS_rNN.json]
"""
from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW = 50
# No rows-only entries remain since r11: stream_click_attribution
# (the last one) gained a hash-exact deterministic-projection oracle —
# the INNER stream-stream join's availableNow emission set is exactly
# the batch events_interval_join row-set (matches emit on arrival,
# never on watermark advance). Every streaming entry now carries a
# hash-exact oracle.
ROWS_ONLY_BY_DESIGN: set[str] = set()


def main() -> None:
    from yougile_etl_pipeline_spark.registry import (
        _DEFERRED_TO_NEXT_WINDOW,
        _STABLE_CERTIFIED,
        QUERIES,
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if len(sys.argv) > 1:
        path = sys.argv[1]
    else:
        files = sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))
        if not files:
            sys.exit("no CORRECTNESS_r*.json found")
        path = files[-1]
    rows = json.load(open(path))
    print(f"# rotation plan from {os.path.basename(path)}\n")

    window = list(QUERIES)[:WINDOW]
    certified = [q for q in window if q in rows
                 and (rows[q].get("hash_match")
                      or (q in ROWS_ONLY_BY_DESIGN
                          and rows[q].get("err") in (None, "no_oracle")
                          and (rows[q].get("spark_rows") or 0) > 0))]
    failed = [q for q in window if q in rows and q not in certified]
    unseen = [q for q in window if q not in rows]

    print(f"promote to _STABLE_CERTIFIED ({len(certified)}):")
    for q in certified:
        tag = " (rows-only by design)" if q in ROWS_ONLY_BY_DESIGN else ""
        print(f'    "{q}",{tag}')
    if failed:
        print(f"\nKEEP IN WINDOW — failed/red ({len(failed)}):")
        for q in failed:
            err = " | ".join(str(rows[q].get("err")).splitlines())[:100]
            print(f"    {q}: {err}")
    if unseen:
        print(f"\nWARNING — in window but absent from driver file "
              f"({len(unseen)}): {unseen}")

    n_freed = len(certified)
    promoted = _DEFERRED_TO_NEXT_WINDOW[:n_freed]
    leftover = _DEFERRED_TO_NEXT_WINDOW[n_freed:]
    print(f"\nnext window absorbs {min(len(promoted), WINDOW)} deferred "
          f"entries (of {len(_DEFERRED_TO_NEXT_WINDOW)}):")
    for q in promoted:
        print(f"    {q}")
    if leftover:
        print(f"\nstill deferred after rotation ({len(leftover)}): "
              f"{leftover}")
    print(f"\nstable size after rotation: "
          f"{len(_STABLE_CERTIFIED) + len(certified)}")


if __name__ == "__main__":
    main()
