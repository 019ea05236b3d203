"""Round-15 query registrations — STAGING BANK, NOT YET WIRED.

Do NOT import this module in round 14: the r14 certification window is
exactly full (the fourteen registry_r14 bank entries plus the 36
held-out recertification fillers picked by last-driver-green age,
with mid-round registrations swapping fillers back one-for-one), and
registering past the driver's 50-slot window would leave
never-certified queries at the round boundary
(tests/test_certification_window.py enforces the accounting). At
ROUND-15 START, wire it with one line at the bottom of
registry_ext.py next to the registry_r06–r14 imports.

Same staging contract as the previous banks: every entry lands here
only with its DuckDB oracle proven bit-identical at sf0.001 AND
sf0.01 (scripts/check_staged.py) and a recorded sf0.1 wall time
(bench.py's `staged` block is manifest-driven off R15_ENTRIES —
automatic once the entry and its parity test exist).

tests/test_registry_r15_staged.py smoke-imports this module in a
SUBPROCESS (so the round-14 window stays untouched) and verifies every
entry registers with an oracle and runs green at sf0.001.

BEFORE designing any new entry, grep the registry for the name AND
the feature — @register silently overwrites an existing name in
place (the r12 near-miss: agg_grouping_sets / win_dist_functions
already existed from r05).
"""

from __future__ import annotations

# Staged-entry manifest, in registration order (kept in sync by the
# bank's subprocess smoke: every name registered by importing this
# module must appear here, and vice versa). Also consumed by
# bench.py's `staged` block so every bank entry carries a wall time +
# plan fingerprint before it ever certifies.
R15_ENTRIES: list[str] = []
