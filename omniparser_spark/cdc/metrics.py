"""Per-micro-batch metrics.

Counters are computed with one aggregate pass over the cached
normalized batch (not N separate count() actions) and emitted into the
checkpoint record; `MetricsLog` also keeps them in memory for tests and
for the bench harness.
"""

from __future__ import annotations

from typing import Any


class MetricsLog:
    def __init__(self) -> None:
        self.batches: list[dict[str, Any]] = []

    def record(self, m: dict[str, Any]) -> None:
        self.batches.append(m)

    def totals(self) -> dict[str, int]:
        keys = ("events_in", "quarantined", "rows_written", "tombstones")
        return {
            k: sum(int(b.get(k) or 0) for b in self.batches) for k in keys
        }
