"""Guards for the pre-wired round-7 registration module.

Same contract the r06 bank ran under in round 5 (see that file's
round-5 version in git history): (1) round 6 must NOT import
registry_r07 — the r06 window is exactly full, and an accidental
import would strand never-certified registrations at the round
boundary; (2) the module must actually work when wired — verified in
a SUBPROCESS so this test session's registry stays untouched, with
every entry oracle-executed at sf0.001 from its REGISTRY copy."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_EXPECTED = 12

_SUBPROC = """
import sys
sys.path.insert(0, %r)
from yougile_etl_pipeline_spark.registry import ORACLES, QUERIES
before = set(QUERIES)
import yougile_etl_pipeline_spark.registry_r07 as r07
new = [k for k in QUERIES if k not in before]
assert len(new) == %d, f"expected %d new entries, got {len(new)}: {new}"
assert set(new) == set(r07.R07_ENTRIES), (new, r07.R07_ENTRIES)
missing = [k for k in new if k not in ORACLES]
assert not missing, f"entries without oracles: {missing}"
from yougile_etl_pipeline_spark.session import get_spark
from tests.oracle_compare import compare, duck_connect
spark = get_spark(app_name="r07-smoke", master="local[4]")
spark.sparkContext.setLogLevel("ERROR")
con = duck_connect("/root/testdata/sf0.001")
for name in new:
    issues = compare(QUERIES[name](spark, "/root/testdata/sf0.001"),
                     con, ORACLES[name])
    assert not issues, f"{name}: {issues}"
print("R07-SMOKE-OK")
"""


def test_round6_does_not_import_r07():
    import yougile_etl_pipeline_spark.registry  # noqa: F401
    assert "yougile_etl_pipeline_spark.registry_r07" not in sys.modules


def test_r07_module_registers_and_runs_in_subprocess():
    out = subprocess.run(
        [sys.executable, "-c", _SUBPROC % (REPO, _EXPECTED, _EXPECTED)],
        cwd=REPO, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "R07-SMOKE-OK" in out.stdout
