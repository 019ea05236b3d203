"""Re-run every R07-BANK staged-operator oracle-parity test at the
DRIVER'S certification scale factor (sf0.01) before registration.

History: in round 5 this swept the 46 registry_r06 staged entries;
those registered at the r06 rotation and are now covered by
scripts/check_queries.py (the live certification window). The list
below is the ROUND-7 staging bank — operators built and oracle-proven
ahead of slots freeing at the r07 rotation. Same contract as before:
parity at sf0.001 rides normal CI, this wrapper re-executes the exact
parity subset with the fixture dir overridden to the driver's scale
(tests/conftest.py reads SPARK_GRAFT_SMOKE_DIR).

Usage: python scripts/check_staged.py [pytest args...]
"""
from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# one parity test per staged round-6 registration (registry.py tail)
PARITY_TESTS = [
    # mart_abc_parts registered mid-round-6 after its rework; its test
    # stays in the sweep as the cheapest full-depth regression of the
    # bucket-stitch pattern the bank entries reuse.
    "tests/test_abc_analysis.py::test_abc_duckdb_parity",
    "tests/test_media_codec.py::test_wav_stats_duckdb_parity",
    "tests/test_media_codec.py::test_bmp_stats_duckdb_parity",
    "tests/test_gini_ks.py::test_gini_duckdb_parity",
    "tests/test_gini_ks.py::test_ks_duckdb_parity",
    "tests/test_code_fertility.py::test_code_profile_duckdb_parity",
    "tests/test_code_fertility.py::test_fertility_duckdb_parity",
    "tests/test_bfs_layers.py::test_bfs_duckdb_parity",
    "tests/test_stream_dedup.py::test_stream_dedup_duckdb_parity",
    "tests/test_media_codec.py::test_decode_media_mixed_duckdb_parity",
    "tests/test_map_functions.py::test_map_functions_duckdb_parity",
    "tests/test_seasonal_anomalies.py::test_seasonal_anomalies_duckdb_parity",
    "tests/test_pareto_coverage.py::test_pareto_coverage_duckdb_parity",
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
