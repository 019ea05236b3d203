"""Round-14 query registrations — STAGING BANK, NOT YET WIRED.

Do NOT import this module in round 13: the r13 certification window is
exactly full (the ten registry_r13 bank entries, the three ADVICE-r12
planned-change holds, and the held-out r05/r06-era recertification
fillers, with mid-round registrations swapping fillers back
one-for-one), and registering past the driver's 50-slot window would
leave never-certified queries at the round boundary
(tests/test_certification_window.py enforces the accounting). At
ROUND-14 START, wire it with one line at the bottom of
registry_ext.py next to the registry_r06–r13 imports.

Same staging contract as the previous banks: every entry lands here
only with its DuckDB oracle proven bit-identical at sf0.001 AND
sf0.01 (scripts/check_staged.py) and a recorded sf0.1 wall time
(bench.py's `staged` block is manifest-driven off R14_ENTRIES —
automatic once the entry and its parity test exist).

tests/test_registry_r14_staged.py smoke-imports this module in a
SUBPROCESS (so the round-13 window stays untouched) and verifies every
entry registers with an oracle and runs green at sf0.001.

BEFORE designing any new entry, grep the registry for the name AND
the feature — @register silently overwrites an existing name in
place (the r12 near-miss: agg_grouping_sets / win_dist_functions
already existed from r05).
"""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401  (first entry will use it)

from yougile_etl_pipeline_spark.registry import register  # noqa: F401
from yougile_etl_pipeline_spark.sources.tables import load_table  # noqa: F401

# Order-independence guard (same as the other registry_* modules): if
# this module was the process's entry point into the engine, re-run
# the rotation so the certification-window SET is import-order
# -independent.
from yougile_etl_pipeline_spark import registry as _registry_mod  # noqa: E402

if hasattr(_registry_mod, "_rotate_certification_window"):
    _registry_mod._rotate_certification_window()


# Accumulates through round 13; every name must be oracle-proven at
# BOTH certification scales before it lands here (the r06–r13 staging
# discipline). Pinned by tests/test_registry_r14_staged.py and
# consumed by bench.py's `staged` block so every bank entry carries a
# wall time + plan fingerprint before it ever certifies.
R14_ENTRIES: list[str] = []
