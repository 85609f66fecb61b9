"""Resumable offset checkpoints + per-partition lineage manifests.

One JSON document per committed micro-batch, plus an atomically-swapped
``latest.json`` pointer (same ``os.replace`` protocol as the table
metadata — a checkpoint is only visible once fully written).

A checkpoint records exactly what the north rule asks lineage to carry:
the source offset range, per-source-partition offset ranges and row
counts, rows applied, and the table snapshot version the commit
produced — enough to (a) resume the feed from ``offset_end + 1`` and
(b) audit any table snapshot back to the exact slice of the feed that
produced it.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any

LATEST = "latest.json"


class CheckpointStore:
    def __init__(self, path: str):
        self.path = os.path.abspath(path)
        os.makedirs(self.path, exist_ok=True)

    def latest(self) -> dict[str, Any] | None:
        p = os.path.join(self.path, LATEST)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def next_batch_id(self) -> int:
        cp = self.latest()
        return 0 if cp is None else int(cp["batch_id"]) + 1

    def next_offset(self) -> int:
        cp = self.latest()
        return 0 if cp is None else int(cp["offset_end"]) + 1

    def commit(self, record: dict[str, Any]) -> None:
        bid = int(record["batch_id"])
        with open(os.path.join(self.path, f"batch-{bid:010d}.json"), "w") as f:
            json.dump(record, f, indent=1, sort_keys=True)
        fd, tmp = tempfile.mkstemp(dir=self.path)
        with os.fdopen(fd, "w") as f:
            json.dump(record, f, indent=1, sort_keys=True)
        os.replace(tmp, os.path.join(self.path, LATEST))

    def all(self) -> list[dict[str, Any]]:
        out = []
        for name in sorted(os.listdir(self.path)):
            if name.startswith("batch-"):
                with open(os.path.join(self.path, name)) as f:
                    out.append(json.load(f))
        return out
