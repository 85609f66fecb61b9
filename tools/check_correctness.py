"""Local mimic of the driver's correctness gate.

Runs each __spark_entry__.queries() entry on Spark and its oracle_sql()
on DuckDB at sf0.01, then compares row count, column-name set, and an
order-insensitive value hash.

Canonicalization deliberately MIRRORS the driver (round-3 lesson: the
old checker normalized lists and Python ints itself, so it passed three
queries the driver failed):

- both sides go through pandas (Spark ``toPandas()``, DuckDB ``.df()``)
  so dtype coercions the driver sees (e.g. DuckDB HUGEINT -> float64)
  are reproduced, not papered over;
- ``_canon`` sorts columns by name then ``sort_values`` over ALL
  columns — an array/map/struct column raises ``TypeError: unhashable
  type`` here exactly as it does in the driver;
- cell rendering happens AFTER pandas coercion, so an int64 column on
  one side and a float64 column on the other hash differently even when
  the values are numerically equal.

Usage: python tools/check_correctness.py [query_name ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-shaped canonicalization: columns sorted by name, rows
    sorted by every column.  No tolerance for unhashable cell types —
    if the driver would crash on this frame, so do we."""
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def _cell(v) -> str:
    """Render one pandas cell.  Runs after pandas dtype coercion: an
    integer that arrived as float64 (DuckDB HUGEINT, nullable BIGINT)
    renders with a trailing ``.0`` and will not match an int64 column."""
    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, (bool,)) or str(type(v)).endswith("bool_'>"):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(round(v, 9))
    import datetime
    import decimal

    import numpy as np

    if isinstance(v, np.floating):
        f = float(v)
        if math.isnan(f):
            return "NULL"
        return repr(round(f, 9))
    if isinstance(v, np.integer):
        return str(int(v))
    if isinstance(v, int):
        return str(v)
    if isinstance(v, decimal.Decimal):
        return repr(round(float(v), 9))
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple, dict, set)) or str(
        type(v)
    ).startswith("<class 'numpy.ndarray"):
        raise TypeError(
            f"unhashable type: {type(v).__name__} — the driver "
            f"canonicalizer cannot sort array/map/struct columns"
        )
    return str(v)


def _lines(df: pd.DataFrame) -> list[str]:
    return [
        "\x1f".join(_cell(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    ]


def value_hash(df: pd.DataFrame) -> str:
    h = hashlib.md5()
    for line in _lines(df):
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    from omniparser_spark.session import get_spark

    spark = get_spark(app_name="correctness_check", master="local[8]",
                      shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = set(sys.argv[1:])
    n_pass = n_fail = n_weak = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            spdf = _canon(sdf.toPandas())
        except Exception as e:
            print(f"FAIL  {name:28} spark/canon error: {str(e)[:300]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"WEAK  {name:28} rows={len(spdf)} (no oracle)")
            n_weak += 1
            continue
        try:
            opdf = _canon(con.sql(oracles[name]).df())
        except Exception as e:
            print(f"FAIL  {name:28} duckdb/canon error: {str(e)[:300]}")
            n_fail += 1
            continue
        dt = time.time() - t0
        problems = []
        if len(spdf) != len(opdf):
            problems.append(f"rowcount {len(spdf)} vs {len(opdf)}")
        scols = [c.lower() for c in spdf.columns]
        ocols = [c.lower() for c in opdf.columns]
        if scols != ocols:
            problems.append(f"schema {scols} vs {ocols}")
        if not problems:
            try:
                hs = value_hash(spdf)
                ho = value_hash(opdf)
            except TypeError as e:
                problems.append(f"canon error: {e}")
                hs = ho = None
            if hs is not None and hs != ho:
                problems.append("value-hash mismatch")
                ls, lo = _lines(spdf), _lines(opdf)
                diffs = [(a, b) for a, b in zip(ls, lo) if a != b][:3]
                for a, b in diffs:
                    print(f"        spark: {a[:160]}")
                    print(f"        duck : {b[:160]}")
        if problems:
            print(f"FAIL  {name:28} {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"PASS  {name:28} rows={len(spdf)} ({dt:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} weak (rows-only)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
