"""Local mimic of the driver's correctness gate.

Runs each __spark_entry__.queries() entry on Spark and its oracle_sql()
on DuckDB at sf0.01, then compares row count, column-name set, and an
order-insensitive value hash (columns sorted by name, rows sorted).

Usage: python tools/check_correctness.py [query_name ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_val(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_val(x) for x in v) + "]"
    import datetime
    import decimal

    if isinstance(v, decimal.Decimal):
        return repr(round(float(v), 9))
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    return str(v)


def value_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "\x1f".join(norm_val(r[i]) for i in order) for r in rows
    )
    h = hashlib.md5()
    for line in lines:
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
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name:28} spark error: {str(e)[:300]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"WEAK  {name:28} rows={len(srows)} (no oracle)")
            n_weak += 1
            continue
        try:
            ores = con.sql(oracles[name])
            ocols = ores.columns
            orows = ores.fetchall()
        except Exception as e:
            print(f"FAIL  {name:28} duckdb error: {str(e)[:300]}")
            n_fail += 1
            continue
        dt = time.time() - t0
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} vs {len(orows)}")
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in ocols):
            problems.append(f"schema {sorted(scols)} vs {sorted(ocols)}")
        if not problems:
            hs = value_hash(srows, scols)
            ho = value_hash(orows, ocols)
            if hs != ho:
                problems.append("value-hash mismatch")
                # show a few differing lines for debugging
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                ls = sorted(
                    "\x1f".join(norm_val(r[i]) for i in order_s) for r in srows
                )
                lo = sorted(
                    "\x1f".join(norm_val(r[i]) for i in order_o) for r in orows
                )
                diffs = [
                    (a, b) for a, b in zip(ls, lo) if a != b
                ][:3]
                for a, b in diffs:
                    print(f"        spark: {a[:160]}")
                    print(f"        duck : {b[:160]}")
        if problems:
            print(f"FAIL  {name:28} {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"PASS  {name:28} rows={len(srows)} ({dt:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} weak (rows-only)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
