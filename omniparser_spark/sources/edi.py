"""EDI segment decoding: 4-level delimiters + release (escape) char.

Reference semantics (``extensions/omniv21/fileformat/edi/reader2.go:109-253``):
an EDI stream is split by a *segment* delimiter into segments, each
segment by an *element* delimiter into elements, each element by a
*repetition* delimiter into repeats, each repeat by a *component*
delimiter into components — and a *release* character makes the
following delimiter (or release char) literal data instead of a
separator (X12/EDIFACT ``?`` escapes, e.g. the UPS 210 sample).

Spark-first re-expression — the sentinel trick, pure column
expressions end to end (whole-stage codegen, zero UDFs, zero shuffles):

1. **mask**: one literal-replace pass per escapable char swaps each
   released sequence (``??``, ``?*``, ``?:``, ``?^``, ``?~``) for a
   private-use sentinel that cannot appear in transport data;
2. **split**: plain ``F.split`` on the raw delimiters — now
   unambiguous, since every literal occurrence is masked;
3. **restore**: sentinels swap back to their literal characters at the
   leaves only.

A naive regex split with lookbehind cannot express this (an escaped
escape before a delimiter flips the meaning again: ``??*`` is a
literal ``?`` followed by a real element break); the sentinel pass
handles it because masking consumes left-to-right like the reference's
scanner.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Private-use sentinels (never legal in EDI transport charsets).
_S_REL = "\x01"
_S_SEG = "\x02"
_S_ELEM = "\x03"
_S_REP = "\x04"
_S_COMP = "\x05"


def _lit_replace(col: Column, old: str, new: str) -> Column:
    return F.replace(col, F.lit(old), F.lit(new))


def mask_released(
    payload: Column,
    seg: str = "~",
    elem: str = "*",
    comp: str = ":",
    rep: str = "^",
    release: str = "?",
) -> Column:
    """Swap released (escaped) sequences for sentinels. The released
    release char MUST be masked first — exactly the scanner's
    consume-order (reader2.go release handling)."""
    c = _lit_replace(payload, release + release, _S_REL)
    c = _lit_replace(c, release + seg, _S_SEG)
    c = _lit_replace(c, release + elem, _S_ELEM)
    c = _lit_replace(c, release + rep, _S_REP)
    c = _lit_replace(c, release + comp, _S_COMP)
    return c


def restore_released(
    col: Column,
    seg: str = "~",
    elem: str = "*",
    comp: str = ":",
    rep: str = "^",
    release: str = "?",
) -> Column:
    """Swap sentinels back to the literal characters they protect."""
    c = _lit_replace(col, _S_SEG, seg)
    c = _lit_replace(c, _S_ELEM, elem)
    c = _lit_replace(c, _S_REP, rep)
    c = _lit_replace(c, _S_COMP, comp)
    c = _lit_replace(c, _S_REL, release)
    return c


def edi_tree(
    payload: Column,
    seg: str = "~",
    elem: str = "*",
    comp: str = ":",
    rep: str = "^",
    release: str = "?",
) -> Column:
    """Full parse: array<struct<seg_name, elements>> where elements is
    array<array<array<string>>> indexed [element][repeat][component],
    all release sequences resolved to literal data.

    Mirrors the reference's rawSeg -> IDR element/component shape
    (``fileformat/edi/seg.go:32-105`` addressing by (index,
    component_index); repetition per ``reader2.go`` repetition
    delimiter handling).
    """
    masked = mask_released(payload, seg, elem, comp, rep, release)
    segs = F.filter(
        F.split(masked, re.escape(seg)), lambda s: F.length(s) > 0
    )

    def parse_seg(s: Column) -> Column:
        parts = F.split(s, re.escape(elem))
        name = restore_released(
            parts.getItem(0), seg, elem, comp, rep, release
        )
        rest = F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0)))
        elements = F.transform(
            rest,
            lambda e: F.transform(
                F.split(e, re.escape(rep)),
                lambda r: F.transform(
                    F.split(r, re.escape(comp)),
                    lambda c: restore_released(
                        c, seg, elem, comp, rep, release
                    ),
                ),
            ),
        )
        return F.struct(name.alias("seg_name"), elements.alias("elements"))

    return F.transform(segs, parse_seg)


def edi_element(
    tree: Column,
    seg_name: str,
    elem_idx: int,
    rep_idx: int = 0,
    comp_idx: int = 0,
) -> Column:
    """Address one component: first segment named `seg_name`, element
    `elem_idx` (1-based, EDI convention), repeat/component 0-based.
    Missing segment/element/repeat/component yields NULL (the
    reference's default-for-missing behavior, seg.go defaults)."""
    s = F.try_element_at(
        F.filter(tree, lambda x: x.getField("seg_name") == seg_name), F.lit(1)
    )
    # F.get is NULL-safe on out-of-range ordinals (ANSI mode errors on
    # getItem/element_at) — missing addresses must yield NULL, not fail
    e = F.get(s.getField("elements"), elem_idx - 1)
    return F.get(F.get(e, rep_idx), comp_idx)
