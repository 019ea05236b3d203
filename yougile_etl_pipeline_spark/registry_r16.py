"""Round-16 query registrations — STAGING BANK, NOT YET WIRED.

Do NOT import this module in round 15: the r15 certification window is
exactly full (the sixteen registry_r15 bank entries plus the 5
planned-change gram-cache holds plus the 29 held-out recertification
fillers picked by last-driver-green age, with mid-round registrations
swapping fillers back one-for-one), and registering past the driver's
50-slot window would leave never-certified queries at the round
boundary (tests/test_certification_window.py enforces the
accounting). At ROUND-16 START, wire it with one line at the bottom
of registry_ext.py next to the registry_r06–r15 imports.

Same staging contract as the previous banks: every entry lands here
only with its DuckDB oracle proven bit-identical at sf0.001 AND
sf0.01 (scripts/check_staged.py) and a recorded sf0.1 wall time
(bench.py's `staged` block is manifest-driven off R16_ENTRIES —
automatic once the entry and its parity test exist).

NO media entries in this bank (VERDICT r14 #7: the media completion
boundary declared in COVERAGE.md §E4 holds; the new-entry budget goes
to LLM-pipeline depth).

tests/test_registry_r16_staged.py smoke-imports this module in a
SUBPROCESS (so the round-15 window stays untouched) and verifies every
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
R16_ENTRIES: list[str] = []
