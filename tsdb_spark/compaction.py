"""Leveled compaction planning (LeveledCompactor.plan, compact.go:190-329).

Pure metadata logic — no Spark. The DB calls `plan()` over its bucket
directory listing and hands the selected group to `DB.compact_selected`,
which runs ONE Spark job over just those partitions. At 100 TB this is the
difference between a full-store rewrite per maintenance cycle and an
incremental rewrite of a handful of adjacent buckets.

Semantics mirrored from the reference:
- exponential level widths (ExponentialBlockRanges, compact.go:41-50)
- overlapping blocks compact first (selectOverlappingDirs, compact.go:264-286)
- the freshest block (max mint) is never planned — it may still receive
  out-of-order data (compact.go:199-202)
- a parent-range group is selected only when it spans its full range or a
  newer block proves no sibling can still appear (selectDirs,
  compact.go:227-262)
- large blocks with >5% tombstones are rewritten (compact.go:211-220)
"""

from __future__ import annotations

from dataclasses import dataclass


def exponential_ranges(min_size: int, steps: int = 3, step_size: int = 3) -> list[int]:
    """[min, min*s, min*s^2, ...] — ExponentialBlockRanges (compact.go:41-50)."""
    out, cur = [], min_size
    for _ in range(steps):
        out.append(cur)
        cur *= step_size
    return out


@dataclass(frozen=True)
class BlockMeta:
    """What the planner knows about one t_bucket partition (the analog of
    the reference's per-block meta.json, block.go:152-200)."""

    mint: int
    maxt: int  # exclusive
    dir: str = ""
    num_series: int = 0
    num_tombstones: int = 0
    failed: bool = False
    # our store's vertical-overlap marker: the bucket received a second
    # append into an already-populated range and needs read-time dedup
    # (the single-dir-per-bucket rendering of two overlapping blocks)
    dirty: bool = False


def split_by_range(blocks: list[BlockMeta], tr: int) -> list[list[BlockMeta]]:
    """Group consecutive blocks into aligned [t0, t0+tr] windows; blocks
    that cross a window boundary are skipped (splitByRange,
    compact.go:292-329 — including the negative-mint alignment rule)."""
    groups: list[list[BlockMeta]] = []
    i = 0
    while i < len(blocks):
        m = blocks[i]
        if m.mint >= 0:
            t0 = tr * (m.mint // tr)
        else:
            # (mint - tr + 1) / tr with truncation toward zero, as in the
            # reference (Go division); a = mint-tr+1 < 0 here
            a = m.mint - tr + 1
            t0 = tr * -((-a) // tr)
        if m.maxt > t0 + tr:
            i += 1
            continue
        group = []
        while i < len(blocks) and blocks[i].maxt <= t0 + tr:
            group.append(blocks[i])
            i += 1
        if group:
            groups.append(group)
    return groups


def select_overlapping(blocks: list[BlockMeta]) -> list[BlockMeta]:
    """First cluster of time-overlapping blocks, in input order
    (selectOverlappingDirs, compact.go:264-286). Input sorted by mint."""
    if len(blocks) < 2:
        return []
    out: list[BlockMeta] = []
    global_maxt = blocks[0].maxt
    for i, b in enumerate(blocks[1:]):
        if b.mint < global_maxt:
            if not out:
                out.append(blocks[i])
            out.append(b)
        elif out:
            break
        if b.maxt > global_maxt:
            global_maxt = b.maxt
    return out


def overlapping_blocks(blocks: list[BlockMeta]) -> dict[tuple[int, int], list[BlockMeta]]:
    """Sweep-line overlap detection (OverlappingBlocks, db.go:977-1042):
    returns {(mint, maxt): [blocks]} — every maximal time range where two
    or more blocks overlap, with the blocks covering it.

    Pure metadata (one event per block boundary); at 100 TB this runs on
    the driver over the partition listing, never touching data."""
    if len(blocks) < 2:
        return {}
    bounds = sorted({b.mint for b in blocks} | {b.maxt for b in blocks})
    # elementary intervals between consecutive boundaries: the active set
    # is constant inside each; emit those covered by >= 2 blocks, merging
    # adjacent intervals whose active sets are identical
    out: dict[tuple[int, int], list[BlockMeta]] = {}
    prev_key: tuple[int, int] | None = None
    prev_set: list[BlockMeta] = []
    for t0, t1 in zip(bounds, bounds[1:]):
        active = sorted(
            (b for b in blocks if b.mint <= t0 and b.maxt >= t1),
            key=lambda m: (m.mint, m.maxt, m.dir),
        )
        if len(active) < 2:
            prev_key = None
            continue
        if prev_key is not None and prev_key[1] == t0 and active == prev_set:
            out.pop(prev_key)
            prev_key = (prev_key[0], t1)
        else:
            prev_key = (t0, t1)
        out[prev_key] = active
        prev_set = active
    return out


def select_dirs(blocks: list[BlockMeta], ranges: list[int]) -> list[BlockMeta]:
    """First parent-range group eligible for merge (selectDirs,
    compact.go:227-262). `blocks` sorted by mint, fresh block removed."""
    if len(ranges) < 2 or not blocks:
        return []
    high_time = blocks[-1].mint
    for iv in ranges[1:]:
        for p in split_by_range(blocks, iv):
            if any(b.failed for b in p):
                continue
            mint, maxt = p[0].mint, p[-1].maxt
            # full range spanned (gaps allowed), or a newer block exists →
            # no sibling of this size can still appear in the window
            if (maxt - mint == iv or maxt <= high_time) and len(p) > 1:
                return p
    return []


def plan(blocks: list[BlockMeta], ranges: list[int]) -> list[BlockMeta]:
    """One planning round (plan, compact.go:190-223): overlap first, then
    leveled merge, then tombstone-heavy rewrites. Returns [] when there is
    nothing worth doing — callers loop until that."""
    blocks = sorted(blocks, key=lambda b: b.mint)
    ov = select_overlapping(blocks)
    if ov:
        return ov
    # our vertical-overlap rendering: dirty buckets are "overlapping
    # blocks" collapsed into one dir — rewrite the first contiguous run
    dirty = [b for b in blocks if b.dirty]
    if dirty:
        run = [dirty[0]]
        for b in dirty[1:]:
            if b.mint == run[-1].maxt:
                run.append(b)
            else:
                break
        return run
    if not blocks:
        return []
    # never plan the freshest block — it may still take late data
    dms = blocks[:-1]
    sel = select_dirs(dms, ranges)
    if sel:
        return sel
    for b in reversed(dms):
        if b.maxt - b.mint < ranges[len(ranges) // 2]:
            break
        if b.num_tombstones / (b.num_series + 1) > 0.05:
            return [b]
    return []
