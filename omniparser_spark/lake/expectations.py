"""Declarative data-quality expectations for write-audit-publish.

The WAP machinery (``commit(stage=True)`` / ``publish`` /
``abandon_stage``) gives the MECHANISM; this module supplies the
POLICY — the audit step as data, not bespoke code (Delta Live Tables
``EXPECT`` / Great-Expectations-style suites):

- **row rules**: named boolean Column expressions every staged row
  should satisfy, each with a violation budget (``max_frac``, default
  0 = hard gate). All rules evaluate in ONE aggregate pass over the
  staged snapshot (sum-of-violations per rule + row count — map-side
  combinable, no shuffle beyond the final scalar).
- **table rules**: merge-key uniqueness (one groupBy probe) and
  row-count drift vs the published head (``max_growth`` /
  ``max_shrink`` factors) — the fat-finger guards: an empty or
  double-applied batch fails the audit, not the readers.

``audit_and_publish`` wires policy to mechanism: pass -> atomic
``publish``; fail -> ``abandon_stage`` (the staged snapshot's data is
collected by the next expiry) and a report that says exactly which
rule broke and by how much. Either way the decision is auditable —
the report is returned, JSON-serializable.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from omniparser_spark.lake.table import LakeTable


@dataclass
class RowRule:
    """`expr` builds the PASS condition from the staged frame."""

    expr: Callable[[DataFrame], Column]
    max_frac: float = 0.0


@dataclass
class AuditReport:
    ok: bool
    rows: int
    row_rules: dict[str, dict[str, Any]] = field(default_factory=dict)
    table_rules: dict[str, dict[str, Any]] = field(default_factory=dict)

    def to_dict(self) -> dict[str, Any]:
        return {
            "ok": self.ok,
            "rows": self.rows,
            "row_rules": self.row_rules,
            "table_rules": self.table_rules,
        }


def audit(
    table: LakeTable,
    version: int,
    row_rules: dict[str, RowRule] | None = None,
    check_unique_keys: bool = True,
    max_growth: float | None = None,
    max_shrink: float | None = None,
) -> AuditReport:
    """Evaluate the expectation suite against STAGED snapshot
    `version` without publishing or mutating anything."""
    staged = table.read(version=version)
    aggs = [F.count(F.lit(1)).alias("_n")]
    rules = row_rules or {}
    for name, rule in rules.items():
        aggs.append(
            F.sum(
                F.when(~F.coalesce(rule.expr(staged), F.lit(False)), 1)
                .otherwise(0)
            ).alias(f"_viol_{name}")
        )
    row = staged.agg(*aggs).collect()[0]
    n = int(row["_n"])

    report = AuditReport(ok=True, rows=n)
    for name, rule in rules.items():
        viol = int(row[f"_viol_{name}"] or 0)
        frac = (viol / n) if n else 0.0
        passed = frac <= rule.max_frac
        report.row_rules[name] = {
            "violations": viol,
            "frac": round(frac, 6),
            "max_frac": rule.max_frac,
            "ok": passed,
        }
        report.ok = report.ok and passed

    if check_unique_keys:
        keys = list(table.summary().get("merge_keys") or ())
        dups = (
            staged.groupBy(*keys)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .count()
        ) if keys else 0
        report.table_rules["unique_merge_keys"] = {
            "ok": dups == 0,
            "duplicate_groups_found": int(dups),
        }
        report.ok = report.ok and dups == 0

    if max_growth is not None or max_shrink is not None:
        prev_n = table.read().count()  # published head
        ok = True
        if prev_n > 0:
            if max_growth is not None and n > prev_n * max_growth:
                ok = False
            if max_shrink is not None and n < prev_n * max_shrink:
                ok = False
        report.table_rules["row_count_drift"] = {
            "ok": ok,
            "head_rows": int(prev_n),
            "staged_rows": n,
            "max_growth": max_growth,
            "max_shrink": max_shrink,
        }
        report.ok = report.ok and ok

    return report


def audit_and_publish(
    table: LakeTable,
    version: int,
    row_rules: dict[str, RowRule] | None = None,
    **audit_kwargs: Any,
) -> tuple[bool, AuditReport]:
    """The WAP gate: audit the staged snapshot, publish on pass,
    abandon on fail. Returns (published, report). A batch re-delivery
    after an abandon re-stages and re-audits — exactly-once composes
    because the batch fence reads the PUBLISHED head."""
    report = audit(table, version, row_rules=row_rules, **audit_kwargs)
    if report.ok:
        table.publish(version)
        return True, report
    table.abandon_stage(version)
    return False, report
