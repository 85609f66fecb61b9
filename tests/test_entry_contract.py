"""Driver-contract invariants for __spark_entry__.

The round-2 verdict's top finding: the driver verifies only the FIRST
50 entries of queries() in iteration order, so registration order IS
verification coverage.  These tests pin the properties that keep every
query verifiable over rounds:

- queries() and oracle_sql() iterate in the same explicit priority
  order (a mismatch would pair query N with the wrong oracle window);
- every name in _DRIVER_PRIORITY is a registered query (typo guard);
- the first 50 slots contain every query that has never had a
  driver-green correctness row (per CORRECTNESS_r01/r02 artifacts),
  with cdc_streaming_apply (the only ever-FAILed query) first.
"""

from __future__ import annotations

import json
import os

import __spark_entry__ as entrymod

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_rows() -> set[str]:
    seen: set[str] = set()
    for fname in os.listdir(_REPO):
        if fname.startswith("CORRECTNESS_r") and fname.endswith(".json"):
            with open(os.path.join(_REPO, fname)) as fh:
                seen.update(json.load(fh).keys())
    return seen


def test_queries_and_oracles_same_order():
    qnames = list(entrymod.queries())
    onames = list(entrymod.oracle_sql())
    # every oracle belongs to a query, and shared names appear in the
    # same relative order
    assert set(onames) <= set(qnames)
    filtered = [n for n in qnames if n in set(onames)]
    assert filtered == onames


def test_priority_names_all_registered():
    qnames = set(entrymod.queries())
    unknown = [n for n in entrymod._DRIVER_PRIORITY if n not in qnames]
    assert not unknown, unknown


def test_never_verified_queries_inside_driver_window():
    qnames = list(entrymod.queries())
    window = set(qnames[:50])
    verified = _driver_rows()
    unverified = [n for n in qnames if n not in verified]
    outside = [n for n in unverified if n not in window]
    assert not outside, (
        f"queries without any driver correctness row sit outside the "
        f"driver's 50-slot window: {outside}"
    )
    assert qnames[0] == "cdc_streaming_apply"
