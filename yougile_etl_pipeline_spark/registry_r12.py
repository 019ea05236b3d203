"""Round-12 query registrations — STAGING BANK, NOT YET WIRED.

Do NOT import this module in round 11: the r11 certification window is
exactly full (the ten registry_r11 bank entries, the two
planned-change holds, and the held-out recertification fillers, with
mid-round registrations swapping fillers back one-for-one), and
registering past the driver's 50-slot window would leave
never-certified queries at the round boundary
(tests/test_certification_window.py enforces the accounting). At
ROUND-12 START, wire it with one line at the bottom of
registry_ext.py next to the registry_r06–r11 imports.

NOTE: genuinely new operators built in round 11 should PREFER direct
registration in registry_r11.py (swapping a held-out filler back into
_STABLE_CERTIFIED one-for-one) so they certify THIS round — this bank
is for overflow beyond the swappable slots. Same staging contract as
the previous banks: every entry lands here only with its DuckDB
oracle proven bit-identical at sf0.001 AND sf0.01
(scripts/check_staged.py) and a recorded sf0.1 wall time (bench.py's
`staged` block is manifest-driven off R12_ENTRIES — automatic once
the entry and its parity test exist).

tests/test_registry_r12_staged.py smoke-imports this module in a
SUBPROCESS (so the round-11 window stays untouched) and verifies every
entry registers with an oracle and runs green at sf0.001.
"""

from __future__ import annotations


# Order-independence guard (same as the other registry_* modules): if
# this module was the process's entry point into the engine, re-run
# the rotation so the certification-window SET is import-order
# -independent.
from yougile_etl_pipeline_spark import registry as _registry_mod  # noqa: E402

if hasattr(_registry_mod, "_rotate_certification_window"):
    _registry_mod._rotate_certification_window()


# Manifest of this module's registrations — pinned by
# tests/test_registry_r12_staged.py and consumed by bench.py's
# `staged` block so every bank entry carries a wall time + plan
# fingerprint before it ever certifies.
R12_ENTRIES: list[str] = []
