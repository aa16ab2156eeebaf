"""Driver-window coverage guard (VERDICT r6 task #1, third recurrence).

The driver records CORRECTNESS rows for the FIRST 50 entries of
``__spark_entry__.queries()`` insertion order. Three rounds in a row a
query was registered after the window froze and shipped with local-only
evidence. This test makes the suite fail whenever any registered query
has NEITHER a driver-recorded row in any ``CORRECTNESS_r*.json`` NOR a
slot in the current window — i.e. the state the r5/r6 verdicts flagged
can no longer pass CI silently.

No SparkSession needed: this is pure registry + ledger introspection.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entry  # noqa: E402

WINDOW_SIZE = 50


def _ledger_rows() -> dict[str, bool]:
    """query -> True if any round recorded a hash-match (or, for
    rows-only queries, a rows-match) for it."""
    seen: dict[str, bool] = {}
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        for name, row in json.loads(f.read_text()).items():
            if not isinstance(row, dict):
                continue
            green = bool(row.get("hash_match")) or (
                row.get("err") == "no_oracle" and bool(row.get("rows_match"))
            )
            seen[name] = seen.get(name, False) or green
    return seen


def test_every_query_has_driver_row_or_window_slot():
    names = list(entry.queries().keys())
    window = set(names[:WINDOW_SIZE])
    ledger = _ledger_rows()
    orphans = [
        n for n in names if n not in window and not ledger.get(n, False)
    ]
    assert not orphans, (
        "Registered queries with neither a green driver row in any "
        f"CORRECTNESS_r*.json nor a slot in the first {WINDOW_SIZE} of "
        f"queries(): {orphans}. Rotate _PRIORITY_WINDOW in "
        "__spark_entry__.py so each gets a driver row this round."
    )


def test_window_is_well_formed():
    names = list(entry.queries().keys())
    window = names[:WINDOW_SIZE]
    assert len(set(window)) == WINDOW_SIZE, "window has duplicates/gaps"
    # every window entry must resolve to a registered callable
    allq = entry.queries()
    for n in window:
        assert callable(allq[n]), n


def test_priority_window_names_are_registered():
    """A typo'd window entry silently shrinks the window (the name is
    skipped at collect time) — catch it here instead."""
    allq = entry.queries()
    missing = [n for n in entry._PRIORITY_WINDOW if n not in allq]
    assert not missing, f"_PRIORITY_WINDOW names not registered: {missing}"


def test_priority_window_fits_driver_slots():
    """ADVICE r7: the driver records only the first WINDOW_SIZE entries —
    names beyond slot 50 silently fall outside the window while the
    rotation comment implies they get re-verified. Forbid overflow."""
    n = len(entry._PRIORITY_WINDOW)
    assert n <= WINDOW_SIZE, (
        f"_PRIORITY_WINDOW has {n} entries but the driver records only "
        f"the first {WINDOW_SIZE}; trim the list"
    )
