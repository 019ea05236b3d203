"""Round-17 query registrations — STAGING BANK, NOT YET WIRED.

Do NOT import this module in round 16: the r16 certification window is
exactly full (the eighteen registry_r16 bank entries plus the
sim_lsh_recall_sweep planned-change hold plus the 31 held-out
recertification fillers picked by last-driver-green age, with
mid-round registrations swapping fillers back one-for-one), and
registering past the driver's 50-slot window would leave
never-certified queries at the round boundary
(tests/test_certification_window.py enforces the accounting). At
ROUND-17 START, wire it with one line at the bottom of
registry_ext.py next to the registry_r06–r16 imports.

Same staging contract as the previous banks: every entry lands here
only with its DuckDB oracle proven bit-identical at sf0.001 AND
sf0.01 (scripts/check_staged.py) and a recorded sf0.1 wall time
(bench.py's `staged` block is manifest-driven off R17_ENTRIES —
automatic once the entry and its parity test exist). Every >0.5 s
entry additionally needs an sf1 slope row in SCALE.md's r17-gate
table BEFORE it lands (the standing VERDICT-r14 #4 staging gate).

NO media entries in this bank (the media completion boundary declared
in COVERAGE.md §E4 holds; the new-entry budget goes to LLM-pipeline
depth — VERDICT r15 #4 asks this bank to lead with the end-to-end
training-mix capstone that chains canonicalization → decontamination
→ quality gates → largest-remainder apportionment → packed output in
ONE lineage).

tests/test_registry_r17_staged.py smoke-imports this module in a
SUBPROCESS (so the round-16 window stays untouched) and verifies every
entry registers with an oracle and runs green at sf0.001. Tests that
need an r17 entry in-process must snapshot/restore QUERIES/ORACLES or
run in a subprocess (ADVICE r15 #2 — an in-process import permanently
appends to the global registry for the rest of the pytest session).

BEFORE designing any new entry, grep the registry for the name AND
the feature — @register silently overwrites an existing name in
place (the r12 near-miss: agg_grouping_sets / win_dist_functions
already existed from r05).
"""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401 — first entry uses it

from yougile_etl_pipeline_spark.registry import register  # noqa: F401
from yougile_etl_pipeline_spark.sources.tables import load_table  # noqa: F401,E501


# Staged-entry manifest, in registration order (kept in sync by the
# bank's subprocess smoke: every name registered by importing this
# module must appear here, and vice versa). Also consumed by
# bench.py's `staged` block so every bank entry carries a wall time +
# plan fingerprint before it ever certifies.
R17_ENTRIES: list[str] = []


# Order-independence guard (the registry_r14 tail precedent, made real
# for r15/r16/r17 by ADVICE r15 #1): re-rotating converges any import
# order to the same certification-window SET; rotation is idempotent.
from yougile_etl_pipeline_spark import registry as _registry_mod  # noqa: E402

if hasattr(_registry_mod, "_rotate_certification_window"):
    _registry_mod._rotate_certification_window()
