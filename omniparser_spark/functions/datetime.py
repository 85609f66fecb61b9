"""Datetime functions (reference parity C7-C10: customfuncs/datetime.go).

The reference "smart-parses" datetimes by probing a trie of known
layouts (datetime.go:32-89, times.SmartParse). The columnar equivalent
is an ordered ``coalesce(try_to_timestamp(fmt1), try_to_timestamp(fmt2),
...)`` over the same layout inventory — still one codegen'd expression,
no Python.

All functions return RFC3339 strings / epoch values to match the
reference's string-out contract; callers wanting typed timestamps use
the *_ts variants.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ordered layout probe — mirrors the spirit of times.SmartParse's
# layout inventory (most-specific first)
SMART_LAYOUTS = [
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    "yyyy-MM-dd'T'HH:mm:ssXXX",
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss.SSSSSS",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy/MM/dd HH:mm:ss",
    "MM/dd/yyyy HH:mm:ss",
    "MM/dd/yyyy hh:mm:ss a",
    "yyyy-MM-dd",
    "yyyy/MM/dd",
    "MM/dd/yyyy",
]

RFC3339_OUT = "yyyy-MM-dd'T'HH:mm:ssXXX"


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.col(x)


def smart_to_timestamp(col, layouts: list[str] | None = None) -> Column:
    """Layout-probing parse -> timestamp (null if nothing matches)."""
    c = _c(col)
    probes = [
        F.try_to_timestamp(c, F.lit(fmt)) for fmt in (layouts or SMART_LAYOUTS)
    ]
    return F.coalesce(*probes)


def datetime_to_rfc3339(col, from_tz: str | None = None, to_tz: str | None = None) -> Column:
    """dateTimeToRFC3339 (datetime.go:32-89): smart-parse; if the input
    has no TZ, `from_tz` names the zone it is in; `to_tz` converts."""
    ts = smart_to_timestamp(col)
    if from_tz:
        ts = F.to_utc_timestamp(ts, from_tz)
    out_tz = to_tz or "UTC"
    local = F.from_utc_timestamp(ts, out_tz) if out_tz != "UTC" else ts
    return F.date_format(local, RFC3339_OUT)


def datetime_layout_to_rfc3339(col, layout: str, from_tz: str | None = None,
                               to_tz: str | None = None) -> Column:
    """dateTimeLayoutToRFC3339 (datetime.go:91-114) with an explicit
    Java-format layout instead of Go reference layouts."""
    ts = F.try_to_timestamp(_c(col), F.lit(layout))
    if from_tz:
        ts = F.to_utc_timestamp(ts, from_tz)
    out_tz = to_tz or "UTC"
    local = F.from_utc_timestamp(ts, out_tz) if out_tz != "UTC" else ts
    return F.date_format(local, RFC3339_OUT)


def datetime_to_epoch(col, unit: str = "seconds") -> Column:
    """dateTimeToEpoch (datetime.go:116-141): -> epoch seconds/millis."""
    ts = smart_to_timestamp(col)
    if unit == "seconds":
        return F.unix_seconds(ts)
    if unit == "milliseconds":
        return F.unix_millis(ts)
    raise ValueError(f"unsupported unit {unit}")


def epoch_to_rfc3339(col, unit: str = "seconds", tz: str | None = None) -> Column:
    """epochToDateTimeRFC3339 (datetime.go:143-174)."""
    c = _c(col).cast("long")
    if unit == "seconds":
        ts = F.timestamp_seconds(c)
    elif unit == "milliseconds":
        ts = F.timestamp_millis(c)
    else:
        raise ValueError(f"unsupported unit {unit}")
    out_tz = tz or "UTC"
    local = F.from_utc_timestamp(ts, out_tz) if out_tz != "UTC" else ts
    return F.date_format(local, RFC3339_OUT)


def now_rfc3339() -> Column:
    """`now` (datetime.go:176-179). Stamped once per batch plan by
    Catalyst (current_timestamp is a batch-constant), which is the
    deterministic behavior a distributed engine needs."""
    return F.date_format(F.current_timestamp(), RFC3339_OUT)
