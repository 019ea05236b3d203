"""Round-13 query registrations — STAGING BANK, NOT YET WIRED.

Do NOT import this module in round 12: the r12 certification window is
exactly full (the ten registry_r12 bank entries, the three
planned-change holds, and the held-out r05-era recertification
fillers, with mid-round registrations swapping fillers back
one-for-one), and registering past the driver's 50-slot window would
leave never-certified queries at the round boundary
(tests/test_certification_window.py enforces the accounting). At
ROUND-13 START, wire it with one line at the bottom of
registry_ext.py next to the registry_r06–r12 imports.

Same staging contract as the previous banks: every entry lands here
only with its DuckDB oracle proven bit-identical at sf0.001 AND
sf0.01 (scripts/check_staged.py) and a recorded sf0.1 wall time
(bench.py's `staged` block is manifest-driven off R13_ENTRIES —
automatic once the entry and its parity test exist).

tests/test_registry_r13_staged.py smoke-imports this module in a
SUBPROCESS (so the round-12 window stays untouched) and verifies every
entry registers with an oracle and runs green at sf0.001.
"""

from __future__ import annotations

# Accumulates through round 12; every name must be oracle-proven at
# BOTH certification scales before it lands here (the r06–r12 staging
# discipline). Pinned by tests/test_registry_r13_staged.py and
# consumed by bench.py's `staged` block so every bank entry carries a
# wall time + plan fingerprint before it ever certifies.
R13_ENTRIES: list[str] = []
