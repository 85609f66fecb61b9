"""Deterministic distinct-count sketches (HyperLogLog over md5).

``approx_count_distinct`` exists in both Spark and DuckDB, but each
uses its own sketch — the results are neither cross-engine comparable
nor contractually reproducible. This module implements HyperLogLog
from first principles over the md5 of the value, with every
order-sensitive step made exact, so the estimate is a pure function
of the VALUE SET:

- register index = first 8 hash bits (m = 256 registers), rho = count
  of leading zeros in the next 60 bits + 1 — derived with integer
  string ops (``61 - length(bin(w))``), no floats;
- per-register max(rho) — a max is order-invariant;
- the harmonic-mean denominator ``sum(2^-M_j)`` is scaled by 2^61 so
  every term ``2^(61 - M_j)`` is an EXACT power of two, summed as
  DECIMAL(38,0): no float-addition order sensitivity anywhere in the
  aggregation;
- the single float division + the small-range linear-counting branch
  happen once per GROUP on exact integer inputs, identically in any
  engine.

Accuracy is standard HLL: ~1.04/sqrt(256) ≈ 6.5% relative error.

Scale shape: one hash aggregate to (group, register) — at most
256 rows per group survive the map-side combine — then one group
rollup: distinct counting over 10^10 rows costs two bounded shuffles
and O(groups x 256) state, never a distinct shuffle of the values.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_M = 256  # registers (p = 8 bits)
# explicit double casts: bare decimal literals parse as DECIMAL in
# Spark SQL (decimal arithmetic), as the oracle engines may differ —
# force the identical IEEE-double op sequence everywhere
_ALPHA_EXPR = (
    "(cast(0.7213 as double) / "
    f"(1 + cast(1.079 as double) / {_M}))"
)


def hll_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Per-group HLL distinct estimate of `value_col` (NULLs ignored,
    like COUNT(DISTINCT)). Returns group cols + ``out_col`` (double,
    rounded to 6) + ``hll_zero_registers`` (the linear-counting
    signal, 256 = empty group ... 0 = saturated sketch)."""
    g = list(group_cols)
    h = F.md5(F.col(value_col).cast("string"))
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    w = F.conv(F.substring(h, 3, 15), 16, 10).cast("long")
    rho = F.when(w == 0, F.lit(61)).otherwise(
        F.lit(61) - F.length(F.bin(w))
    )
    regs = (
        df.filter(F.col(value_col).isNotNull())
        .select(*g, bucket.alias("_b"), rho.alias("_rho"))
        .groupBy(*g, "_b")
        .agg(F.max("_rho").alias("_m"))
    )
    per_group = regs.groupBy(*g).agg(
        F.count(F.lit(1)).cast("int").alias("_hit"),
        F.sum(
            F.expr("cast(pow(2, 61 - _m) as decimal(38,0))")
        ).alias("_s_hit"),
    )
    # empty registers contribute 2^-0 = 1 -> 2^61 each (exact decimal)
    s = F.expr(
        f"_s_hit + cast({_M} - _hit as decimal(38,0))"
        " * cast(pow(2, 61) as decimal(38,0))"
    )
    v_zero = F.lit(_M) - F.col("_hit")
    raw = F.expr(
        f"{_ALPHA_EXPR} * {_M} * {_M} * pow(2, 61) / cast(_s as double)"
    )
    est = F.when(
        (F.col("_raw") <= 2.5 * _M) & (v_zero > 0),
        F.lit(float(_M)) * F.log(F.lit(float(_M)) / v_zero),
    ).otherwise(F.col("_raw"))
    return (
        per_group.withColumn("_s", s)
        .withColumn("_raw", raw)
        .select(
            *g,
            F.round(est, 6).alias(out_col),
            v_zero.cast("int").alias("hll_zero_registers"),
        )
    )


def hll_regs_array(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
) -> DataFrame:
    """Per-group DENSE register array — the MERGEABLE form of the
    sketch: ``(group cols..., regs: array<int>[256])`` where
    ``regs[b]`` is the max rho seen for register ``b`` (0 = empty).
    Two sketches over disjoint (or overlapping — duplicates are free)
    value sets combine by element-wise ``greatest``, which is what
    makes an HLL-backed incremental view pure-delta: state merges
    never need the original values.

    Same hash/rho derivation as :func:`hll_distinct`, so
    :func:`hll_estimate_cols` over this array is bit-identical to the
    one-pass estimate."""
    g = list(group_cols)
    h = F.md5(F.col(value_col).cast("string"))
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    w = F.conv(F.substring(h, 3, 15), 16, 10).cast("long")
    rho = F.when(w == 0, F.lit(61)).otherwise(
        F.lit(61) - F.length(F.bin(w))
    )
    regs = (
        df.filter(F.col(value_col).isNotNull())
        .select(*g, bucket.alias("_b"), rho.alias("_rho"))
        .groupBy(*g, "_b")
        .agg(F.max("_rho").cast("int").alias("_m"))
    )
    reg_map = F.map_from_entries(
        F.collect_list(F.struct(F.col("_b"), F.col("_m")))
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(_M - 1)),
        lambda i: F.coalesce(F.element_at(F.col("_map"), i), F.lit(0)),
    )
    return (
        regs.groupBy(*g)
        .agg(reg_map.alias("_map"))
        .select(*g, dense.alias("regs"))
    )


def hll_estimate_cols(regs_col: str = "regs"):
    """(estimate, zero_registers) Columns from a dense register array —
    the identical alpha/harmonic-sum/linear-counting arithmetic as
    :func:`hll_distinct` (DECIMAL-exact sum of 2^(61-m), one float
    division per group), so array-state estimates hash-match the
    one-pass ones."""
    hit = F.size(F.filter(F.col(regs_col), lambda m: m > 0))
    s = F.expr(
        f"aggregate(filter({regs_col}, m -> m > 0), "
        "cast(0 as decimal(38,0)), "
        "(acc, m) -> acc + cast(pow(2, 61 - m) as decimal(38,0)))"
        f" + cast({_M} - size(filter({regs_col}, m -> m > 0))"
        " as decimal(38,0)) * cast(pow(2, 61) as decimal(38,0))"
    )
    v_zero = F.lit(_M) - hit
    raw = (
        F.expr(f"{_ALPHA_EXPR} * {_M} * {_M} * pow(2, 61)")
        / s.cast("double")
    )
    est = F.when(
        (raw <= 2.5 * _M) & (v_zero > 0),
        F.lit(float(_M)) * F.log(F.lit(float(_M)) / v_zero),
    ).otherwise(raw)
    return F.round(est, 6), v_zero.cast("int")
