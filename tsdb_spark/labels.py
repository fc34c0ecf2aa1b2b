"""Label model + matcher→Column compiler.

This is the semantic heart of the engine (SURVEY.md §4.3 item 1): the
reference's matcher planning (`querier.go:326-489 PostingsForMatchers`)
reduced to native Spark Column expressions over a
``labels MAP<STRING,STRING>`` column.

Load-bearing semantics replicated here:

- **missing label == empty string**: matchers evaluate against ``Get(name)``
  which returns ``""`` for absent labels (labels/labels.go:73-82,
  labels/selector.go:25-32). Every compiled condition wraps the lookup in
  ``coalesce(labels[name], '')``.
- **fully anchored regexes**: callers anchor patterns as ``^(?:p)$``
  (querier.go:402, labels/selector.go:72 via NewRegexpMatcher callers).
- **set-regex rewrite**: anchored literal alternations ``a|b|c`` decompose
  to an IN-list (querier.go:270-324 findSetMatches) — regains Parquet
  dictionary/stats pushdown that a generic rlike would forfeit.
- **empty-value labels are stripped at ingest** (head.go:832-833,
  labels/labels.go:106-121 WithoutEmpty) so ``l=""`` selects series
  *without* the label (querier.go:353-363).

No Python UDFs anywhere: everything compiles to Catalyst expressions that
stay inside whole-stage codegen and push down to Parquet scans.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

MatchType = str  # one of '=', '!=', '=~', '!~'

_VALID_TYPES = ("=", "!=", "=~", "!~")

# characters that make a regex alternative non-literal (conservative superset
# of the reference's scan in querier.go:270-324)
_REGEX_META = set(r".+*?()[]{}^$|\\")


@dataclass(frozen=True)
class Matcher:
    """One label matcher, e.g. ``job="api"`` or ``instance=~"web-.*"``.

    Mirrors labels.Matcher (labels/selector.go:34-42) + NotMatcher
    (labels/selector.go:98-109): types '=', '!=', '=~', '!~'.
    """

    type: MatchType
    name: str
    value: str

    def __post_init__(self) -> None:
        if self.type not in _VALID_TYPES:
            raise ValueError(f"bad matcher type {self.type!r}; want one of {_VALID_TYPES}")

    def __str__(self) -> str:  # promql-ish rendering for debugging
        return f'{self.name}{self.type}"{self.value}"'

    def matches_empty(self) -> bool:
        """Whether this matcher accepts a missing label (value "").

        The reference classifies matchers by Matches("") to decide
        intersect-vs-subtract planning (querier.go:344-353). We reuse it to
        decide whether a matcher can be served by a postings semi-join or
        needs the complement (operators/postings.py).
        """
        import re as _re

        if self.type == "=":
            return self.value == ""
        if self.type == "!=":
            return self.value != ""
        anchored = _re.compile(f"^(?:{self.value})$")
        hit = anchored.match("") is not None
        return hit if self.type == "=~" else not hit


def eq(name: str, value: str) -> Matcher:
    return Matcher("=", name, value)


def neq(name: str, value: str) -> Matcher:
    return Matcher("!=", name, value)


def _check_re2_subset(pattern: str) -> None:
    """Reject regex constructs Java supports but RE2 (the reference's
    dialect, labels/selector.go via regexp) does NOT: lookarounds,
    backreferences, possessive quantifiers, and conditionals. The
    reference would refuse to compile these, so silently giving them
    Java semantics would diverge; raising keeps the documented contract
    honest. Patterns on the shared anchored subset compile identically
    in both dialects (pinned by tests/test_regex_parity.py against
    DuckDB's RE2)."""
    i, n, in_class = 0, len(pattern), False
    while i < n:
        c = pattern[i]
        if c == "\\":
            nxt = pattern[i + 1] if i + 1 < n else ""
            if not in_class and nxt.isdigit() and nxt != "0":
                raise ValueError(
                    f"backreference \\{nxt} in {pattern!r}: not RE2-compatible"
                )
            i += 2
            continue
        if in_class:
            if c == "]":
                in_class = False
            i += 1
            continue
        if c == "[":
            in_class = True
            i += 1
            continue
        if c == "(" and pattern[i + 1 :].startswith(("?=", "?!", "?<=", "?<!")):
            raise ValueError(f"lookaround in {pattern!r}: not RE2-compatible")
        if c in "*+?}" and i + 1 < n and pattern[i + 1] == "+":
            raise ValueError(
                f"possessive quantifier at {i} in {pattern!r}: not RE2-compatible"
            )
        i += 1


def re_match(name: str, value: str) -> Matcher:
    _check_re2_subset(value)
    return Matcher("=~", name, value)


def re_not_match(name: str, value: str) -> Matcher:
    _check_re2_subset(value)
    return Matcher("!~", name, value)


def find_set_matches(pattern: str) -> list[str] | None:
    """Decompose a literal alternation pattern into its literals.

    Port of the *semantics* of querier.go:270-324 findSetMatches: returns
    ``['a','b','c']`` for ``a|b|c`` (possibly with backslash-escaped
    literal chars), or None if any alternative contains regex syntax.
    Empty alternatives are allowed — ``a|`` matches ``""`` i.e. a missing
    label — matching RE2/Java alternation semantics.
    """
    literals: list[str] = []
    cur: list[str] = []
    i, n = 0, len(pattern)
    while i < n:
        c = pattern[i]
        if c == "\\":
            if i + 1 >= n:
                return None
            nxt = pattern[i + 1]
            # escaped metachar is a literal char; escaped alnum is a regex
            # class (\d, \w, ...) → not a literal set
            if nxt.isalnum():
                return None
            cur.append(nxt)
            i += 2
            continue
        if c == "|":
            literals.append("".join(cur))
            cur = []
            i += 1
            continue
        if c in _REGEX_META:
            return None
        cur.append(c)
        i += 1
    literals.append("".join(cur))
    return literals


def label_value(name: str, labels_col: str | Column = "labels") -> Column:
    """``labels[name]`` with the missing→"" rule applied."""
    col = F.col(labels_col) if isinstance(labels_col, str) else labels_col
    return F.coalesce(col.getItem(name), F.lit(""))


def matcher_condition(m: Matcher, labels_col: str | Column = "labels") -> Column:
    """Compile one matcher to a boolean Column.

    '=' / '!=' → (in)equality on the coalesced lookup (labels/selector.go:44-64).
    '=~' / '!~' → anchored rlike, with the set-regex fast path rewritten to
    isin (querier.go:398-489). Note rlike is Java regex, the reference is
    RE2 — the constructors reject Java-only constructs RE2 lacks
    (_check_re2_subset), and on the remaining shared subset the dialects
    are pinned to agree by tests/test_regex_parity.py (Java rlike vs
    DuckDB RE2 over adversarial corner patterns).
    """
    v = label_value(m.name, labels_col)
    if m.type == "=":
        return v == F.lit(m.value)
    if m.type == "!=":
        return v != F.lit(m.value)
    lits = find_set_matches(m.value)
    if lits is not None:
        cond = v.isin(*lits) if len(lits) > 1 else (v == F.lit(lits[0]))
    else:
        cond = v.rlike(f"^(?:{m.value})$")
    return cond if m.type == "=~" else ~cond


def compile_matchers(matchers: list[Matcher], labels_col: str | Column = "labels") -> Column:
    """AND of all matcher conditions (labels/selector.go:21-32 Selector).

    The reference's intersect/subtract postings planning
    (querier.go:326-396) is an index-access strategy; over a labels map the
    same semantics are exactly this conjunction, which Catalyst then
    simplifies (BooleanSimplification) and pushes down.
    """
    if not matchers:
        return F.lit(True)
    cond = matcher_condition(matchers[0], labels_col)
    for m in matchers[1:]:
        cond = cond & matcher_condition(m, labels_col)
    return cond


def strip_empty_labels(labels_col: str | Column = "labels") -> Column:
    """Drop labels with empty values at ingest (head.go:832-833)."""
    col = F.col(labels_col) if isinstance(labels_col, str) else labels_col
    return F.map_filter(col, lambda k, v: v != F.lit(""))


def _escaped(c: Column) -> Column:
    """Backslash-escape ``\\`` and ``"`` — the injectivity guard.

    The reference renders values with strconv.Quote (labels/labels.go:43-58)
    and hashes name/value with \\xff separators (labels/labels.go:60-71)
    precisely so distinct label sets can never collide. Without escaping,
    {a='b",c="d'} and {a='b', c='d'} render identically and their
    xxhash64-derived series_ids collide, silently merging series.
    """
    # literal replace(), not regexp_replace: same output, no regex engine
    # in the per-row ingest hot path
    return F.replace(
        F.replace(c, F.lit("\\"), F.lit("\\\\")), F.lit('"'), F.lit('\\"')
    )


def labels_str_expr(labels_col: str | Column = "labels") -> Column:
    """Canonical label-set string ``{a="b",c="d"}``, keys byte-sorted,
    quote/backslash-escaped (so the rendering is injective).

    The analog of labels.Labels.String (labels/labels.go:43-58) — the
    stable sort key for label-ordered output (labels are stored sorted,
    labels/labels.go:125-162). Display/ordering only; series IDENTITY
    hashes the entries directly (`series_id_expr`) and never pays this
    per-sample render.
    """
    col = F.col(labels_col) if isinstance(labels_col, str) else labels_col
    entries = F.array_sort(F.map_entries(col))  # struct sort = by key then value
    rendered = F.transform(
        entries,
        lambda e: F.concat(
            _escaped(e.getField("key")), F.lit('="'), _escaped(e.getField("value")), F.lit('"')
        ),
    )
    return F.concat(F.lit("{"), F.array_join(rendered, ","), F.lit("}"))


def labels_str_from_entries(entries_col: str | Column) -> Column:
    """labels_str_expr over an ALREADY key-sorted entry array — the same
    canonical render without re-deriving/re-sorting the entries. Used
    where a plan carries the sorted entries as its grouping key (the
    PromQL window chain) and renders the string only on output rows."""
    entries = (
        F.col(entries_col) if isinstance(entries_col, str) else entries_col
    )
    rendered = F.transform(
        entries,
        lambda e: F.concat(
            _escaped(e.getField("key")), F.lit('="'), _escaped(e.getField("value")), F.lit('"')
        ),
    )
    return F.concat(F.lit("{"), F.array_join(rendered, ","), F.lit("}"))


def series_entries_expr(labels_col: str | Column = "labels") -> Column:
    """Canonical identity basis: key-sorted (key, value) entry array with
    empty-valued labels dropped (head.go:832-833). One array pass — no
    map rebuild, no string render — so it is the ingest-hot-path shape.
    """
    col = F.col(labels_col) if isinstance(labels_col, str) else labels_col
    return F.array_sort(
        F.filter(F.map_entries(col), lambda e: e.getField("value") != F.lit(""))
    )


def series_id_expr(labels_col: str | Column = "labels") -> Column:
    """Stable series identity = xxhash64 over the canonical sorted
    entries of the label MAP (empty-valued labels dropped first, so the
    id is strip-invariant).

    The reference hashes the label components too (labels/labels.go:60-71,
    xxhash64 over a name\\xffvalue\\xff stream), NOT a quoted render;
    Spark's structural xxhash64 chains the seed through each entry's key
    and value, giving the same concatenation-ambiguity protection the
    \\xff separators do. Hashing entries instead of the labels_str render
    measured 2.3x faster per row at 15M rows — the render (sort +
    4 escapes + concat per entry, interpreted lambda) now runs only on
    the deduped series dim, never per sample."""
    return F.xxhash64(series_entries_expr(labels_col))


# ---------------------------------------------------------------- parsing

_SELECTOR_RE = __import__("re").compile(
    r'\s*([a-zA-Z_][a-zA-Z0-9_.]*|"(?:[^"\\]|\\.)*")'
    r'\s*(=~|!~|!=|=)\s*"((?:[^"\\]|\\.)*)"\s*(,|\})'
)

# Prometheus 3.x UTF-8 names: a bare quoted string inside the braces is
# the metric name ({"my.metric", "l w s"="v"} ≡ __name__="my.metric");
# quoted strings on the matcher's left are arbitrary UTF-8 label names
# (model/labels + promql/parser 3.x quoted-name grammar)
_QUOTED_NAME_RE = __import__("re").compile(
    r'\s*"((?:[^"\\]|\\.)*)"\s*(,|\})'
)

# PromQL metric-name grammar (colons included: recording-rule names)
_METRIC_NAME_RE = __import__("re").compile(r"[a-zA-Z_:][a-zA-Z0-9_:]*")


def parse_selector(s: str) -> list[Matcher]:
    """Parse a PromQL-style series selector into matchers.

    Accepts ``metric{a="b",c!="d",e=~"x.*",f!~"y"}``, a bare ``{...}``
    block, or a bare metric name; a leading metric name desugars to
    ``__name__="metric"`` (the PromQL convention). Values are
    double-quoted with backslash escapes (\\" \\\\ \\n \\t).

    This is the user-facing string form of the `Matcher` constructors —
    the reference keeps parsing in the PromQL layer above the library
    (matchers arrive pre-built, labels/selector.go:34-42); the engine
    ships a parser so CLI/API callers can express selectors without
    Python constructors.
    """
    s = s.strip()
    out: list[Matcher] = []
    brace = s.find("{")
    if brace == -1:
        if not s:
            raise ValueError("empty selector")
        if _METRIC_NAME_RE.fullmatch(s) is None:
            raise ValueError(f"invalid metric name: {s!r}")
        return [eq("__name__", s)]
    name = s[:brace].strip()
    if name:
        if _METRIC_NAME_RE.fullmatch(name) is None:
            raise ValueError(f"invalid metric name: {name!r}")
        out.append(eq("__name__", name))
    body = s[brace + 1 :]
    if not s.endswith("}"):
        raise ValueError(f"selector must end with '}}': {s!r}")
    if body.strip() == "}":
        if not out:
            raise ValueError("empty selector")
        return out
    ops = {"=": eq, "!=": neq, "=~": re_match, "!~": re_not_match}

    def _unescape(raw: str) -> str:
        # single-pass unescape: sequential str.replace would mis-handle
        # runs like \\n (escaped backslash followed by a literal n)
        return __import__("re").sub(
            r"\\(.)",
            lambda e: {"n": "\n", "t": "\t"}.get(e.group(1), e.group(1)),
            raw,
        )

    pos = 0
    while True:
        m = _SELECTOR_RE.match(body, pos)
        if m is None:
            # Prometheus 3.x quoted metric name: {"my.metric", ...}
            qm = _QUOTED_NAME_RE.match(body, pos)
            if qm is not None:
                if any(x.name == "__name__" for x in out):
                    raise ValueError("metric name must not be set twice")
                out.append(eq("__name__", _unescape(qm.group(1))))
                pos = qm.end()
                if qm.group(2) == "}":
                    if body[pos:].strip():
                        raise ValueError(
                            f"trailing input after '}}': {body[pos:]!r}"
                        )
                    return out
                continue
            # PromQL allows one trailing comma before '}'
            if out and body[pos:].strip() == "}":
                return out
            raise ValueError(f"bad selector syntax at {body[pos:]!r}")
        lname, op, raw, delim = m.groups()
        if lname.startswith('"'):
            # 3.x quoted (UTF-8) label name
            lname = _unescape(lname[1:-1])
            if not lname:
                raise ValueError("empty label name in selector")
        out.append(ops[op](lname, _unescape(raw)))
        pos = m.end()
        if delim == "}":
            if body[pos:].strip():
                raise ValueError(f"trailing input after '}}': {body[pos:]!r}")
            return out
