"""Guards for the pre-wired round-16 registration bank.

Same contract the r06–r15 banks ran under while staged: (1) round 15
must NOT import registry_r16 — the r15 window is exactly full, and an
accidental import would strand never-certified registrations at the
round boundary; (2) the module must actually work when wired —
verified in a SUBPROCESS so this test session's registry stays
untouched, with every entry oracle-executed from its REGISTRY copy at
sf0.001 (or SPARK_GRAFT_SMOKE_DIR — the scripts/check_staged.py
sf0.01 re-proof path)."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_EXPECTED = 18

_SUBPROC = """
import os, sys
sys.path.insert(0, %r)
from yougile_etl_pipeline_spark.registry import ORACLES, QUERIES
before = set(QUERIES)
import yougile_etl_pipeline_spark.registry_r16 as r16
new = [k for k in QUERIES if k not in before]
assert len(new) == %d, f"expected %d new entries, got {len(new)}: {new}"
assert set(new) == set(r16.R16_ENTRIES), (new, r16.R16_ENTRIES)
missing = [k for k in new if k not in ORACLES]
assert not missing, f"entries without oracles: {missing}"
if new:
    from yougile_etl_pipeline_spark.session import get_spark
    from tests.oracle_compare import compare, duck_connect
    spark = get_spark(app_name="r16-smoke", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")
    con = duck_connect(sf)
    for name in new:
        issues = compare(QUERIES[name](spark, sf), con, ORACLES[name])
        assert not issues, f"{name}: {issues}"
print("R16-SMOKE-OK")
"""


def test_round15_does_not_import_r16():
    # Checked in a SUBPROCESS so the guard tests the CANONICAL import
    # path deterministically: other test files legitimately import
    # registry_r16 in-process (semantics/property tests), and suite
    # order must not decide whether this guard sees their side effect.
    out = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, %r); "
         "import yougile_etl_pipeline_spark.registry; "
         "assert 'yougile_etl_pipeline_spark.registry_r16' "
         "not in sys.modules, 'registry_r16 reachable from the "
         "canonical import path'" % REPO],
        cwd=REPO, capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr[-2000:]


def test_r16_module_registers_and_runs_in_subprocess():
    out = subprocess.run(
        [sys.executable, "-c", _SUBPROC % (REPO, _EXPECTED, _EXPECTED)],
        cwd=REPO, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "R16-SMOKE-OK" in out.stdout
