"""Built-in scalar functions (reference parity set C1-C6, C12).

Each is a pure column-expression builder — JVM-side, codegen'd, no
Python in the executor path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.lit(x)


def coalesce_nonempty(*cols) -> Column:
    """First non-empty string; '' and NULL both skip, blank (spaces)
    does not (reference `coalesce`, customfuncs/customFuncs.go:45-55 —
    note this differs from SQL COALESCE, which is null-only)."""
    guarded = [F.nullif(_c(c), F.lit("")) for c in cols]
    return F.coalesce(*guarded, F.lit(""))


def concat(*cols) -> Column:
    """Variadic string concat, NULL treated as ''
    (reference `concat`, customfuncs/customFuncs.go:57-64)."""
    return F.concat_ws("", *[F.coalesce(_c(c), F.lit("")) for c in cols])


def lower(col) -> Column:
    return F.lower(_c(col))


def upper(col) -> Column:
    return F.upper(_c(col))


def uuidv3(col) -> Column:
    """RFC-4122 version-3 (MD5, namespace = nil UUID) of a string —
    byte-compatible with the reference's `uuidv3`
    (customfuncs/customFuncs.go:76-79: uuid.NewMD5(uuid.Nil, s)).

    Namespace nil = 16 zero bytes prepended to the name before MD5;
    then version nibble -> 3 and variant bits -> 10xx, formatted
    8-4-4-4-12. Pure column expression (md5 + hex surgery).
    """
    c = _c(col)
    # md5 over 16 zero bytes || name
    h = F.md5(F.concat(F.lit(bytearray(16)), F.encode(c, "UTF-8")))
    time_hi = F.concat(
        F.lit("3"), F.substring(h, 14, 3)
    )  # set version nibble to 3
    # variant: top 2 bits of byte 8 -> 10 : v = (x & 0x3f) | 0x80
    clock_seq = F.lpad(
        F.hex(
            F.conv(F.substring(h, 17, 2), 16, 10).cast("long")
            .bitwiseAND(F.lit(0x3F))
            .bitwiseOR(F.lit(0x80))
        ),
        2,
        "0",
    )
    return F.lower(
        F.concat_ws(
            "-",
            F.substring(h, 1, 8),
            F.substring(h, 9, 4),
            time_hi,
            F.concat(clock_seq, F.substring(h, 19, 2)),
            F.substring(h, 21, 12),
        )
    )


def copy_raw(col) -> Column:
    """`copy` (extensions/omniv21/customfuncs/customfuncs.go:17-20):
    carry the raw ingested value through — for struct payload columns
    this is the column itself; for audit output use to_json."""
    return _c(col)


def checksum(*cols) -> Column:
    """Stable content checksum of a record (reference
    RawRecord.Checksum(), extensions/omniv21/ingester.go:25-28 —
    uuidv3 of the canonical JSON). Here: uuidv3 of a 0x1f-joined
    canonical field encoding (deterministic, engine-independent)."""
    joined = F.concat_ws(
        "\x1f", *[F.coalesce(_c(c).cast("string"), F.lit("")) for c in cols]
    )
    return uuidv3(joined)
