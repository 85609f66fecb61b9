"""Single-threaded pure-Python reference replay (the golden oracle).

Independent of the engine: payload decoding here uses the stdlib
(json / csv / ElementTree / str slicing), NOT the engine's Spark
decoders — mirroring the reference's golden-snapshot test pattern
(``extensions/omniv21/samples/testCommon.go:19-60``) where expected
output is produced by a second, independent path.

Replay semantics (FIXTURES.md §4): for every key (conv_id, turn_idx)
the winner is the event with max (ts, offset); the final table contains
the winner's row unless the winner is a delete.
"""

from __future__ import annotations

import csv as _csv
import io
import json
import xml.etree.ElementTree as ET
from datetime import datetime

FIXED_LAYOUT = [
    ("conv_id", 1, 12),
    ("turn_idx", 13, 5),
    ("role", 18, 10),
    ("text", 28, 60),
    ("tool", 88, 10),
    ("ts", 98, 24),
]


def _parse_ts(s: str) -> datetime:
    return datetime.fromisoformat(s.replace("Z", "+00:00"))


def decode(fmt: str, payload: str) -> dict:
    if fmt == "json":
        d = json.loads(payload)
        return {
            "conv_id": d["conv_id"],
            "turn_idx": int(d["turn_idx"]),
            "role": d.get("role"),
            "text": d.get("text", ""),
            "tool": d.get("tool"),
            "ts": _parse_ts(d["ts"]),
        }
    if fmt == "csv":
        row = next(
            _csv.reader(
                io.StringIO(payload), delimiter="|", quotechar='"', doublequote=True
            )
        )
        conv_id, turn_idx, role, text, tool, ts = row
        return {
            "conv_id": conv_id,
            "turn_idx": int(turn_idx),
            "role": role,
            "text": text,
            "tool": tool or None,
            "ts": _parse_ts(ts),
        }
    if fmt == "xmlish":
        el = ET.fromstring(payload)
        tool_el = el.find("tool")
        text_el = el.find("text")
        return {
            "conv_id": el.attrib["conv_id"],
            "turn_idx": int(el.attrib["idx"]),
            "role": el.findtext("role"),
            "text": (text_el.text or "") if text_el is not None else "",
            "tool": tool_el.text if tool_el is not None else None,
            "ts": _parse_ts(el.findtext("ts")),
        }
    if fmt == "fixed":
        out = {}
        for name, start, length in FIXED_LAYOUT:
            out[name] = payload[start - 1 : start - 1 + length].rstrip()
        return {
            "conv_id": out["conv_id"],
            "turn_idx": int(out["turn_idx"]),
            "role": out["role"],
            "text": out["text"],
            "tool": out["tool"] or None,
            "ts": _parse_ts(out["ts"]),
        }
    raise ValueError(f"unknown format {fmt}")


def replay(events: list[dict]) -> dict[tuple, dict]:
    """events: rows with offset/op/format/payload. Returns final state
    keyed by (conv_id, turn_idx)."""
    winners: dict[tuple, dict] = {}
    for ev in events:
        rec = decode(ev["format"], ev["payload"])
        key = (rec["conv_id"], rec["turn_idx"])
        cand = {
            **rec,
            "op": ev["op"],
            "offset": ev["offset"],
        }
        prev = winners.get(key)
        if prev is None or (cand["ts"], cand["offset"]) > (prev["ts"], prev["offset"]):
            winners[key] = cand
    return {
        k: v for k, v in winners.items() if v["op"] != "D"
    }


def final_rows(events: list[dict], with_tool: bool = True) -> list[tuple]:
    state = replay(events)
    rows = []
    for (conv_id, turn_idx), v in sorted(state.items()):
        row = (conv_id, turn_idx, v["role"], v["text"])
        if with_tool:
            row += (v["tool"],)
        row += (v["ts"],)
        rows.append(row)
    return rows
