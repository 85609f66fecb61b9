"""Last-writer-wins dedup of change events per primary key.

The reference has no dedup operator (it is a single-stream parser); LWW
comes from the north rule: among all change events for one
``(conv_id, turn_idx)``, the winner is the max by the total order
``(ts, offset)`` — ``offset`` is globally unique, so ties are
impossible and the result is deterministic.

Scale design — three strategies, one semantics:

1. ``lww_dedup`` (default): ``groupBy(keys).agg(max_by(struct(...),
   struct(ts, offset)))``. LWW is an *algebraic* aggregate, so Spark
   performs **map-side partial aggregation**: a hot conversation with
   10^7 events collapses to one candidate row per input partition
   before the shuffle. This is the primary skew mitigation — the
   shuffle moves at most ``n_partitions × n_distinct_keys_touched``
   rows regardless of key skew.

2. ``lww_dedup_salted``: explicit two-phase salt → local winner →
   de-salt → global winner. Equivalent result; useful when the input
   arrives pre-aggregated per key (no combine left to do) yet still
   skewed, or as a demonstration that window-skew is handled without
   relying on AQE (AQE does not rebalance window/agg partition skew).

3. ``lww_dedup_window``: ``row_number() over (partition by keys order
   by ts desc, offset desc) = 1``. Exact same winner; full
   shuffle+sort per key, no partial agg — kept as the oracle-parity
   implementation (matches the SQL the DuckDB oracle runs) and for
   when all event columns must survive without being packed in a
   struct.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_KEYS = ("conv_id", "turn_idx")
DEFAULT_ORDER = ("ts", "offset")


def _pack(df: DataFrame, keys: Sequence[str]) -> tuple[list[str], list[str]]:
    value_cols = [c for c in df.columns if c not in keys]
    return list(keys), value_cols


def lww_dedup(
    df: DataFrame,
    keys: Sequence[str] = DEFAULT_KEYS,
    order: Sequence[str] = DEFAULT_ORDER,
) -> DataFrame:
    """One row per key: the max-by-(order) event. Map-side combinable."""
    key_cols, value_cols = _pack(df, keys)
    winner = F.max_by(
        F.struct(*[F.col(c) for c in value_cols]),
        F.struct(*[F.col(c) for c in order]),
    ).alias("_w")
    out = df.groupBy(*key_cols).agg(winner)
    return out.select(
        *key_cols, *[F.col(f"_w.{c}").alias(c) for c in value_cols]
    )


def lww_dedup_salted(
    df: DataFrame,
    keys: Sequence[str] = DEFAULT_KEYS,
    order: Sequence[str] = DEFAULT_ORDER,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted LWW: local winner per (key, salt), then global.

    Phase 1 shuffles on ``hash(keys, salt)`` — a key receiving X% of
    the stream spreads over ``n_salts`` reducers; phase 2 sees at most
    ``n_salts`` candidate rows per key.
    """
    key_cols, value_cols = _pack(df, keys)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in order]), F.lit(n_salts)).alias(
        "_salt"
    )
    winner = F.max_by(
        F.struct(*[F.col(c) for c in value_cols]),
        F.struct(*[F.col(c) for c in order]),
    ).alias("_w")
    local = df.withColumn("_salt", salt).groupBy(*key_cols, "_salt").agg(winner)
    unpacked = local.select(
        *key_cols, *[F.col(f"_w.{c}").alias(c) for c in value_cols]
    )
    return lww_dedup(unpacked, keys, order)


def lww_dedup_window(
    df: DataFrame,
    keys: Sequence[str] = DEFAULT_KEYS,
    order: Sequence[str] = DEFAULT_ORDER,
) -> DataFrame:
    """row_number()==1 variant — oracle-parity implementation."""
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc() for c in order]
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
