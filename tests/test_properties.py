"""Property-based tests (hypothesis) for the pure-Python planning layers:
the set-regex rewrite must agree with Java/RE2 alternation semantics on
EVERY input it claims to decompose, and the compaction planner must
never propose an unsound rewrite, whatever the store layout.

Driver-side only — no SparkSession, so thousands of examples run in
seconds.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from tsdb_spark.compaction import (
    BlockMeta,
    exponential_ranges,
    overlapping_blocks,
    plan,
    split_by_range,
)
from tsdb_spark.labels import find_set_matches

# ---------------------------------------------------------------- set-regex

# literal alternatives: printable chars, with metachars reachable only
# through escapes (the grammar find_set_matches accepts)
_META = set(r".+*?()[]{}^$|\\")
_plain = st.text(
    st.characters(
        min_codepoint=32, max_codepoint=126, blacklist_characters="".join(_META)
    ),
    max_size=6,
)


def _render(lit: str) -> str:
    """Render a literal as pattern text, escaping regex metachars."""
    return re.escape(lit)


@given(st.lists(_plain, min_size=1, max_size=5))
@settings(max_examples=300, deadline=None)
def test_plain_alternation_roundtrip(lits):
    pattern = "|".join(lits)
    out = find_set_matches(pattern)
    assert out == lits


@given(st.lists(st.text(st.characters(min_codepoint=32, max_codepoint=126), max_size=5),
                min_size=1, max_size=4))
@settings(max_examples=300, deadline=None)
def test_escaped_alternation_agrees_with_re(lits):
    """With every literal escaped, the rewrite either declines (None —
    re.escape may introduce \\<alnum> forms it treats as classes) or
    returns a set that matches Python re fullmatch semantics exactly."""
    pattern = "|".join(_render(l) for l in lits)
    out = find_set_matches(pattern)
    if out is None:
        return
    probe = set(lits) | {"", "x", "zz", "|", "\\"}
    rx = re.compile(f"(?:{pattern})")
    for s in probe:
        assert (s in out) == bool(rx.fullmatch(s)), (pattern, s, out)


@given(st.text(st.characters(min_codepoint=32, max_codepoint=126), max_size=12))
@settings(max_examples=500, deadline=None)
def test_arbitrary_pattern_never_lies(pattern):
    """For ARBITRARY pattern text: whenever the rewrite claims a literal
    set, membership must equal regex fullmatch for every claimed literal
    and for strings near it."""
    out = find_set_matches(pattern)
    if out is None:
        return
    try:
        rx = re.compile(f"(?:{pattern})")
    except re.error:
        assert False, f"claimed literals for uncompilable pattern {pattern!r}"
    probe = set(out) | {l + "x" for l in out} | {"", "q"}
    for s in probe:
        assert (s in out) == bool(rx.fullmatch(s)), (pattern, s, out)


# ---------------------------------------------------------------- planner

_W = 100  # base bucket width


@st.composite
def stores(draw):
    """A plausible store layout: sorted, non-overlapping-or-overlapping
    buckets with mixed widths (levels), dirt, failures, tombstones."""
    n = draw(st.integers(1, 10))
    blocks, lo = [], 0
    for i in range(n):
        gap = draw(st.integers(0, 2)) * _W
        width = _W * draw(st.sampled_from([1, 1, 1, 3, 9]))
        lo = lo + gap
        blocks.append(
            BlockMeta(
                mint=lo,
                maxt=lo + width,
                dir=f"b{i}",
                num_series=draw(st.integers(0, 100)),
                num_tombstones=draw(st.integers(0, 20)),
                failed=draw(st.booleans()) and draw(st.booleans()),
                dirty=draw(st.booleans()) and draw(st.booleans()),
            )
        )
        lo += width
    return blocks


@given(stores())
@settings(max_examples=300, deadline=None)
def test_plan_is_sound(blocks):
    ranges = exponential_ranges(_W, 3, 3)
    sel = plan(blocks, ranges)
    # selection is a subset of the store, in sorted order, and contiguous
    # in the sorted listing (rewriting a non-contiguous slice could
    # interleave with unselected data)
    srt = sorted(blocks, key=lambda b: b.mint)
    assert all(b in srt for b in sel)
    if sel:
        idx = [srt.index(b) for b in sel]
        assert idx == list(range(idx[0], idx[0] + len(sel)))
    # the LEVELED merge path never groups failed blocks (selectDirs skips
    # failed groups, compact.go:245); the overlap/dirty repair paths may
    # include them — vertical compaction is how a failed overlap heals
    overlapping_sel = any(
        a.maxt > b.mint and b.maxt > a.mint
        for i, a in enumerate(sel)
        for b in sel[i + 1 :]
    )
    if len(sel) > 1 and not overlapping_sel and not any(b.dirty for b in sel):
        assert not any(b.failed for b in sel)
    # the freshest block is untouched unless it overlaps/dirty
    if sel and not any(b.dirty for b in sel):
        fresh = srt[-1]
        overlapped = any(
            a.maxt > b.mint and b.maxt > a.mint
            for a in srt
            for b in srt
            if a is not b
        )
        if not overlapped:
            assert fresh not in sel


@given(stores())
@settings(max_examples=300, deadline=None)
def test_plan_terminates(blocks):
    """Repeatedly applying plan() and merging the selection must reach
    [] — the maintenance loop terminates on every layout."""
    ranges = exponential_ranges(_W, 3, 3)
    cur = sorted(blocks, key=lambda b: b.mint)
    for _ in range(40):
        sel = plan(cur, ranges)
        if not sel:
            return
        merged = BlockMeta(
            mint=min(b.mint for b in sel),
            maxt=max(b.maxt for b in sel),
            dir="+".join(b.dir for b in sel),
            num_series=max(b.num_series for b in sel),
            num_tombstones=0,
            failed=False,
            dirty=False,
        )
        cur = sorted(
            [b for b in cur if b not in sel] + [merged], key=lambda b: b.mint
        )
    assert False, "planner did not terminate in 40 rounds"


@given(stores())
@settings(max_examples=200, deadline=None)
def test_split_by_range_windows_are_aligned(blocks):
    tr = _W * 3
    for group in split_by_range(sorted(blocks, key=lambda b: b.mint), tr):
        t0 = tr * (group[0].mint // tr)
        assert all(t0 <= b.mint and b.maxt <= t0 + tr for b in group)


@given(stores())
@settings(max_examples=200, deadline=None)
def test_overlapping_blocks_report_is_correct(blocks):
    rep = overlapping_blocks(blocks)
    for (lo, hi), group in rep.items():
        assert len(group) >= 2
        for b in group:
            assert b.mint <= lo and b.maxt >= hi
    # completeness: any pairwise overlap midpoint appears in some range
    for i, a in enumerate(blocks):
        for b in blocks[i + 1 :]:
            lo, hi = max(a.mint, b.mint), min(a.maxt, b.maxt)
            if lo < hi:
                assert any(rlo <= lo and hi <= rhi for (rlo, rhi) in rep), (
                    a,
                    b,
                    rep,
                )


# ---------------------------------------------------------------- selector

from tsdb_spark.labels import Matcher, parse_selector  # noqa: E402

_lname = st.from_regex(r"[a-zA-Z_][a-zA-Z0-9_.]{0,8}", fullmatch=True)
_lvalue = st.text(
    st.characters(min_codepoint=32, max_codepoint=0x2FFF), max_size=12
)
# regex-typed matchers draw from the RE2-compatible subset only — the
# constructors (and parse_selector) now refuse Java-only constructs
# like possessive quantifiers, which arbitrary text can spell
_re2_safe_value = st.text(
    st.characters(
        min_codepoint=32, max_codepoint=0x2FFF, exclude_characters="+*?{}()<>=!\\"
    ),
    max_size=12,
)
_matcher = st.one_of(
    st.builds(Matcher, st.sampled_from(["=", "!="]), _lname, _lvalue),
    st.builds(Matcher, st.sampled_from(["=~", "!~"]), _lname, _re2_safe_value),
)


def _render_selector(ms: list[Matcher]) -> str:
    def esc(v: str) -> str:
        return v.replace("\\", "\\\\").replace('"', '\\"')

    return "{" + ",".join(f'{m.name}{m.type}"{esc(m.value)}"' for m in ms) + "}"


@given(st.lists(_matcher, min_size=1, max_size=5))
@settings(max_examples=300, deadline=None)
def test_selector_parse_render_roundtrip(ms):
    assert parse_selector(_render_selector(ms)) == ms


# ---------------------------------------------------- wire codecs (r8)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=1 << 42),  # positive gaps
            st.integers(min_value=0, max_value=(1 << 64) - 1),  # raw bits
        ),
        min_size=0,
        max_size=150,
    ),
    st.integers(min_value=-(1 << 40), max_value=1 << 40),  # first t
)
def test_xor_chunk_roundtrip_property(gaps_bits, t0):
    """Any time-sorted series of arbitrary float64 bit patterns (NaN
    payloads, infinities, denormals included) roundtrips the Gorilla
    chunk codec bit-exactly."""
    import struct as _struct

    from tsdb_spark.sources.xorchunks import decode_xor_chunk, encode_xor_chunk

    t = t0
    samples = []
    for gap, bits in gaps_bits:
        samples.append((t, _struct.unpack("<d", _struct.pack("<Q", bits))[0]))
        t += gap
    out = decode_xor_chunk(encode_xor_chunk(samples))
    assert len(out) == len(samples)
    for (ta, va), (tb, vb) in zip(samples, out):
        assert ta == tb
        assert _struct.pack("<d", va) == _struct.pack("<d", vb)


_label_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=1, max_size=12
)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.dictionaries(_label_text, _label_text, min_size=1, max_size=4),
            st.lists(
                st.tuples(
                    st.integers(min_value=-(1 << 50), max_value=1 << 50),
                    st.floats(allow_nan=False, width=64),
                ),
                min_size=1,
                max_size=8,
            ),
        ),
        min_size=0,
        max_size=6,
    )
)
def test_rw2_roundtrip_property(series):
    """Random unicode label sets + samples roundtrip the Remote-Write
    2.0 interned-symbol codec exactly (modulo the spec's empty-value
    strip, which the generator avoids)."""
    from tsdb_spark.sources.remotewrite import (
        decode_write_request_v2,
        encode_write_request_v2,
    )

    entries = [{"labels": lab, "samples": samps} for lab, samps in series]
    out = decode_write_request_v2(encode_write_request_v2(entries))
    assert len(out) == len(entries)
    for e, o in zip(entries, out):
        assert o["labels"] == e["labels"]
        assert o["samples"] == [(t, float(v)) for t, v in e["samples"]]


@settings(max_examples=150, deadline=None)
@given(
    st.integers(min_value=-4, max_value=8),  # schema
    st.lists(
        st.tuples(
            st.integers(min_value=-200, max_value=200),
            st.floats(min_value=0.001, max_value=1e6, allow_nan=False),
        ),
        min_size=0,
        max_size=20,
        unique_by=lambda p: p[0],
    ),
    st.floats(min_value=0, max_value=1e9, allow_nan=False),
    st.floats(allow_nan=False, width=64),
    st.floats(min_value=0, max_value=1e9, allow_nan=False),
)
def test_rw2_native_histogram_roundtrip_property(schema, buckets, count, hsum, zero):
    """Sparse native-histogram bucket sets roundtrip the float-form
    span/count encoding exactly — spans rebuilt from arbitrary gap
    structure, counts bit-exact."""
    from tsdb_spark.sources.remotewrite import (
        decode_write_request_v2,
        encode_write_request_v2,
    )

    h = {
        "count": count,
        "sum": hsum,
        "zero_count": zero,
        "schema": schema,
        "buckets": sorted(buckets),
    }
    body = encode_write_request_v2(
        [{"labels": {"__name__": "h"}, "histograms": [(1234, h)]}]
    )
    [out] = decode_write_request_v2(body)
    [(t, got)] = out["histograms"]
    assert t == 1234
    assert got["schema"] == schema
    assert got["buckets"] == sorted(buckets)
    import struct as _struct

    for k in ("count", "sum", "zero_count"):
        assert _struct.pack("<d", got[k]) == _struct.pack("<d", h[k])
