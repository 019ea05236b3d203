"""Re-run every R17-BANK staged-operator oracle-parity test at the
DRIVER'S certification scale factor (sf0.01) before registration.

History: in round 5 this swept the 46 registry_r06 staged entries; in
round 6 the 12 registry_r07 bank entries; in round 9 the 8 registry_r10
bank entries; in round 10 the 10 registry_r11 bank entries; in round
11 the 10 registry_r12 bank entries; in round 12 the 10 registry_r13
bank entries; in round 13 the 14 registry_r14 bank entries; in round
14 the 16 registry_r15 bank entries; in round 15 the 18 registry_r16
bank entries. Those
banks registered at their rotations and are now covered by
scripts/check_queries.py (the live certification window).
MID-ROUND DIRECT REGISTRATIONS (the registry_r08-style in-window
additions) are NOT swept here — they enter the live window
immediately, so scripts/check_queries.py covers them at sf0.01 the
moment they register; their sf0.001 parity tests ride normal CI. This
wrapper exists for the NEXT round's bank only: operators built and
oracle-proven ahead of slots freeing at the r17 rotation. Same
contract as before: parity at sf0.001 rides normal CI, this wrapper
re-executes the exact parity subset with the fixture dir overridden
to the driver's scale (tests/conftest.py reads SPARK_GRAFT_SMOKE_DIR).

Usage: python scripts/check_staged.py [pytest args...]
"""
from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# One target per staged round-17 bank sweep
# (yougile_etl_pipeline_spark/registry_r17.py) — the bank's
# subprocess smoke executes EVERY R17_ENTRIES member's REGISTRY copy
# against its oracle at SPARK_GRAFT_SMOKE_DIR (this wrapper sets
# sf0.01), so a single target covers the whole manifest; keep it in
# sync if the bank ever splits across test files (ADVICE r09 #4: name
# the manifest, not a subset of entries).
PARITY_TESTS: list[str] = [
    "tests/test_registry_r17_staged.py::"
    "test_r17_module_registers_and_runs_in_subprocess",
]


def main() -> int:
    if not PARITY_TESTS:
        print("staged parity sweep: r17 bank is empty — nothing to run")
        return 0
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
