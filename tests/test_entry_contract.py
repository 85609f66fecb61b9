"""Driver-contract invariants for __spark_entry__.

The round-2 verdict's top finding: the driver verifies only the FIRST
50 entries of queries() in iteration order, so registration order IS
verification coverage.  Round 3 added a second failure class: queries
that pass a lenient local checker but crash or hash-mismatch the
driver's pandas-based canonicalizer (array-typed output columns,
uncast DuckDB HUGEINT aggregates).  These tests pin both:

- queries() and oracle_sql() iterate in the same explicit priority
  order (a mismatch would pair query N with the wrong oracle window);
- every name in _DRIVER_PRIORITY is a registered query (typo guard);
- the 50-slot window contains every query that NEEDS a fresh driver
  row: never verified, latest row red, or latest row from a stale
  (non-latest) round;
- every oracle BINDS in DuckDB to driver-canonicalizable output types:
  no LIST/STRUCT/MAP columns (pandas sort_values crashes on them) and
  no HUGEINT/UHUGEINT (renders as float64 via .df(), hash-mismatching
  Spark's long) — the exact r3 failure classes.
"""

from __future__ import annotations

import json
import os
import re

import __spark_entry__ as entrymod

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def _rounds() -> list[tuple[int, dict]]:
    out = []
    for fname in os.listdir(_REPO):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", fname)
        if m:
            with open(os.path.join(_REPO, fname)) as fh:
                out.append((int(m.group(1)), json.load(fh)))
    return sorted(out)


def _latest_verdicts() -> dict[str, tuple[int, bool]]:
    """query -> (round of latest driver row, was it green)."""
    latest: dict[str, tuple[int, bool]] = {}
    for rnd, rows in _rounds():
        for name, row in rows.items():
            green = bool(
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            )
            latest[name] = (rnd, green)
    return latest


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


def test_queries_needing_fresh_rows_inside_driver_window():
    """Never-verified, latest-row-red, and stale-round queries must all
    sit inside the driver's 50-slot window (when they fit; if ever more
    than 50 need rows, the window must contain nothing BUT them)."""
    qnames = list(entrymod.queries())
    window = set(qnames[:WINDOW])
    rounds = _rounds()
    if not rounds:
        return
    newest = rounds[-1][0]
    latest = _latest_verdicts()
    changed = getattr(entrymod, "_CHANGED_SINCE_VERIFIED", {})
    needs = [
        n
        for n in qnames
        if n not in latest  # never verified
        or not latest[n][1]  # latest row red
        or latest[n][0] < newest  # stale round
        # shape changed after the last green row: green proves nothing
        or latest[n][0] < changed.get(n, -1)
    ]
    if len(needs) <= WINDOW:
        outside = [n for n in needs if n not in window]
        assert not outside, (
            f"queries needing a fresh driver row sit outside the "
            f"{WINDOW}-slot window: {outside}"
        )
    else:
        extras = [n for n in qnames[:WINDOW] if n not in set(needs)]
        assert not extras, (
            f"window wastes slots on already-fresh queries while "
            f"{len(needs)} need rows: {extras}"
        )


def test_oracles_bind_to_canonicalizable_types():
    """R3 failure classes, caught at bind time (no query execution):
    an oracle whose output schema contains LIST/STRUCT/MAP crashes the
    driver canonicalizer's sort; HUGEINT (bare sum() over BIGINT)
    round-trips through pandas as float64 and hash-mismatches Spark's
    long. DuckDB resolves both from the SQL alone."""
    import duckdb

    sf_dir = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    bad: list[str] = []
    for name, sql in entrymod.oracle_sql().items():
        rel = con.sql(sql)
        for col, typ in zip(rel.columns, rel.types):
            t = str(typ).upper()
            if any(k in t for k in ("LIST", "STRUCT", "MAP", "[]")):
                bad.append(f"{name}.{col}: {t} (unsortable by driver)")
            if "HUGEINT" in t:
                bad.append(f"{name}.{col}: {t} (cast the aggregate)")
    assert not bad, bad
