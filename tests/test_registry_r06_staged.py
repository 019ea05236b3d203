"""Guards for the pre-wired round-6 registration module.

Two invariants: (1) round 5 must NOT import registry_r06 (the window
is exactly full — an accidental import would strand never-certified
registrations at the round boundary); (2) the module must actually
work when wired — verified in a SUBPROCESS so this test session's
registry stays untouched."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_EXPECTED = 46

_SUBPROC = """
import sys
sys.path.insert(0, %r)
from yougile_etl_pipeline_spark.registry import ORACLES, QUERIES
before = set(QUERIES)
import yougile_etl_pipeline_spark.registry_r06  # noqa: F401
new = [k for k in QUERIES if k not in before]
assert len(new) == %d, f"expected %d new entries, got {len(new)}: {new}"
# declared rows-only entries (streaming machinery — no SQL-expressible
# oracle BY DESIGN; each carries a documented batch-parity proof chain)
ROWS_ONLY = {"stream_ewma_values"}
missing = [k for k in new if k not in ORACLES and k not in ROWS_ONLY]
assert not missing, f"entries without oracles: {missing}"
from yougile_etl_pipeline_spark.session import get_spark
from tests.oracle_compare import compare, duck_connect
spark = get_spark(app_name="r06-smoke", master="local[4]")
spark.sparkContext.setLogLevel("ERROR")
con = duck_connect("/root/testdata/sf0.001")
# two operator-backed entries as registry-wiring smoke + EVERY entry
# whose engine side is INLINED in registry_r06 (the parity tests
# prove their own local copies, so the registry copies must be
# oracle-executed here or transcription drift would ship uncaught)
for name in ("corpus_shard_manifest", "quality_distribution_drift",
             "mart_cohort_ltv", "events_top_paths",
             "events_dwell_time", "text_lang_confusion"):
    issues = compare(QUERIES[name](spark, "/root/testdata/sf0.001"),
                     con, ORACLES[name])
    assert not issues, f"{name}: {issues}"
print("R06-SMOKE-OK")
"""


def test_round5_does_not_import_r06():
    # the import chain must not pull registry_r06 until round 6 wires it
    import yougile_etl_pipeline_spark.registry  # noqa: F401
    assert "yougile_etl_pipeline_spark.registry_r06" not in sys.modules


def test_r06_module_registers_and_runs_in_subprocess():
    out = subprocess.run(
        [sys.executable, "-c", _SUBPROC % (REPO, _EXPECTED, _EXPECTED)],
        cwd=REPO, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "R06-SMOKE-OK" in out.stdout
