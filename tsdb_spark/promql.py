"""Mini-PromQL range-query evaluator compiled to DataFrame plans.

The reference library is the storage engine UNDER Prometheus's PromQL
evaluator (promql/engine.go evaluates expressions by pulling raw series
through exactly the Querier.Select surface this engine re-implements,
with a 5m lookback for instant selectors and (T-R, T] windows for range
selectors). A user switching storage still runs PromQL on top — so the
engine ships the common range-query subset as a first-class relational
compiler:

    expr      := unary (op (number | unary))*      -- scalar or vector RHS
    unary     := aggregate | function | selector | number op unary
    aggregate := (sum|avg|min|max|count) [by|without (l,...)] (expr)
               | (topk|bottomk|quantile) [by|without (l,...)] (number, expr)
    function  := fn '(' matrix ')'
    fn        := rate increase delta irate idelta resets changes
                 avg_over_time min_over_time max_over_time sum_over_time
                 count_over_time last_over_time
    matrix    := selector '[' duration ']' ['offset' duration]
    selector  := metric{label op "value", ...} ['offset' duration]

Vector-vector arithmetic uses PromQL's default one-to-one matching
(identical label sets minus __name__, which the result drops).

Evaluation model (the scale-shape insight): a range query at
(start, end, step) needs, for every grid point T, an aggregate over the
window (T-R, T] per series. Instead of evaluating the grid pointwise
(Prometheus's in-process loop — a driver-side anti-pattern here), every
sample is EXPLODED to the grid points whose window it falls into
(`sequence()` fan-out, bounded by R/step + 1 cells per sample — a
constant chosen by the query, never data-dependent), then ONE combinable
groupBy((series, T)) computes the window aggregate. Two shuffles
end-to-end for a full `sum by (l) (rate(m[R]))`: samples→(series,T)
cells, then (series,T)→(group,T). Both keys are fine-grained (series ×
grid), so no hot key exists at any corpus size; counter-reset
corrections ride a per-series lag computed once before the fan-out.

All window math runs on integer centi-units (round(v*100), the same
canonicalization the query-function suite uses) so sums are
order-independent; the only doubles are final deterministic scalar
expressions — the PromQL extrapolation formula reproduced from
promql/functions.go extrapolatedRate.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tsdb_spark import labels as L

#: PromQL default lookback window for instant selectors (staleness).
DEFAULT_LOOKBACK_MS = 300_000

_DUR_RE = re.compile(r"(\d+)(ms|s|m|h|d|w|y)")
_DUR_MS = {
    "ms": 1,
    "s": 1000,
    "m": 60_000,
    "h": 3_600_000,
    "d": 86_400_000,
    "w": 7 * 86_400_000,
    "y": 365 * 86_400_000,
}

AGG_OPS = ("sum", "avg", "min", "max", "count")
#: aggregations taking a leading scalar parameter: topk(3, e), quantile(0.9, e)
PARAM_AGGS = ("topk", "bottomk", "quantile")
RANGE_FNS = (
    "rate",
    "increase",
    "delta",
    "irate",
    "idelta",
    "resets",
    "changes",
    "avg_over_time",
    "min_over_time",
    "max_over_time",
    "sum_over_time",
    "count_over_time",
    "last_over_time",
)


def parse_duration(s: str) -> int:
    """'5m' / '1h30m' / '250ms' → milliseconds."""
    pos, total = 0, 0
    while pos < len(s):
        m = _DUR_RE.match(s, pos)
        if m is None:
            raise ValueError(f"invalid duration: {s!r}")
        total += int(m.group(1)) * _DUR_MS[m.group(2)]
        pos = m.end()
    if total <= 0:
        raise ValueError(f"empty duration: {s!r}")
    return total


# ---------------------------------------------------------------- AST


@dataclass
class Selector:
    matchers: list  # list[L.Matcher]
    range_ms: int | None = None  # set for matrix selectors
    offset_ms: int = 0  # `offset 5m` time shift


@dataclass
class FuncCall:
    fn: str
    arg: Selector  # matrix selector


@dataclass
class Aggregate:
    op: str
    child: object
    by: list[str] | None = None
    without: list[str] | None = None
    param: float | None = None  # topk/bottomk k, quantile φ


@dataclass
class BinScalar:
    op: str  # + - * /
    child: object
    scalar: float
    scalar_left: bool = False


@dataclass
class BinVector:
    """Vector-vector arithmetic with PromQL's DEFAULT one-to-one label
    matching: entries pair when their full label sets minus __name__
    are identical; __name__ is dropped from the result. (on/ignoring/
    group_* modifiers are out of scope for this subset.)"""

    op: str  # + - * /
    left: object
    right: object


@dataclass
class _Tok:
    kind: str
    val: str


_TOKEN_RE = re.compile(
    r"\s*(?:(?P<off>offset\s+[0-9][0-9a-zA-Z]*)"
    r"|(?P<num>\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)"
    r"|(?P<name>[a-zA-Z_:][a-zA-Z0-9_:]*)"
    r"|(?P<brace>\{(?:[^\"{}]|\"(?:[^\"\\]|\\.)*\")*\})"
    r"|(?P<dur>\[[0-9a-z]+\])"
    r"|(?P<op>[()+\-*/,]))"
)


def _tokenize(s: str) -> list[_Tok]:
    toks, pos = [], 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if m is None or m.end() == pos:
            if s[pos:].strip() == "":
                break
            raise ValueError(f"parse error at {s[pos:pos+20]!r}")
        for kind in ("off", "num", "name", "brace", "dur", "op"):
            v = m.group(kind)
            if v is not None:
                toks.append(_Tok(kind, v))
                break
        pos = m.end()
    return toks


class _Parser:
    def __init__(self, toks: list[_Tok]):
        self.toks, self.i = toks, 0

    def peek(self) -> _Tok | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> _Tok:
        t = self.peek()
        if t is None:
            raise ValueError("unexpected end of expression")
        self.i += 1
        return t

    def expect(self, val: str) -> None:
        t = self.next()
        if t.val != val:
            raise ValueError(f"expected {val!r}, got {t.val!r}")

    def parse_expr(self):
        node = self.parse_unary()
        # trailing arithmetic: scalar RHS → BinScalar, vector RHS →
        # BinVector (left-assoc chain, no precedence — parenthesize)
        while (t := self.peek()) is not None and t.val in "+-*/":
            op = self.next().val
            rhs = self.peek()
            if rhs is not None and rhs.kind == "num":
                self.next()
                node = BinScalar(op, node, float(rhs.val))
            else:
                node = BinVector(op, node, self.parse_unary())
        return node

    def parse_unary(self):
        t = self.peek()
        if t is None:
            raise ValueError("empty expression")
        if t.kind == "num":  # number op expr (scalar on the left)
            self.next()
            op = self.next().val
            if op not in "+-*/":
                raise ValueError(f"expected operator after scalar, got {op!r}")
            child = self.parse_unary()
            return BinScalar(op, child, float(t.val), scalar_left=True)
        if t.kind == "name" and t.val in AGG_OPS + PARAM_AGGS:
            return self.parse_aggregate()
        if t.kind == "name" and t.val in RANGE_FNS:
            return self.parse_function()
        return self.parse_selector_expr()

    def _parse_grouping(self) -> tuple[str, list[str]]:
        mode = self.next().val  # by | without
        self.expect("(")
        names: list[str] = []
        while True:
            t = self.next()
            if t.val == ")":
                break
            if t.val == ",":
                continue
            if t.kind != "name":
                raise ValueError(f"bad grouping label {t.val!r}")
            names.append(t.val)
        return mode, names

    def parse_aggregate(self):
        op = self.next().val
        by = without = None
        t = self.peek()
        if t is not None and t.kind == "name" and t.val in ("by", "without"):
            mode, names = self._parse_grouping()
            if mode == "by":
                by = names
            else:
                without = names
        self.expect("(")
        param = None
        if op in PARAM_AGGS:
            num = self.next()
            if num.kind != "num":
                raise ValueError(f"{op} needs a scalar parameter, got {num.val!r}")
            param = float(num.val)
            self.expect(",")
        child = self.parse_expr()
        self.expect(")")
        t = self.peek()
        if t is not None and t.kind == "name" and t.val in ("by", "without"):
            if by is not None or without is not None:
                raise ValueError("duplicate grouping clause")
            mode, names = self._parse_grouping()
            if mode == "by":
                by = names
            else:
                without = names
        return Aggregate(op, child, by=by, without=without, param=param)

    def parse_function(self):
        fn = self.next().val
        self.expect("(")
        sel = self.parse_selector_expr(require_range=True)
        self.expect(")")
        return FuncCall(fn, sel)

    def parse_selector_expr(self, require_range: bool = False) -> Selector:
        t = self.peek()
        text = ""
        if t is not None and t.kind == "name":
            text = self.next().val
        t = self.peek()
        if t is not None and t.kind == "brace":
            text += self.next().val
        if not text:
            raise ValueError("expected a series selector")
        matchers = L.parse_selector(text)
        range_ms = None
        t = self.peek()
        if t is not None and t.kind == "dur":
            range_ms = parse_duration(self.next().val[1:-1])
        if require_range and range_ms is None:
            raise ValueError("range function needs a [duration] selector")
        if not require_range and range_ms is not None:
            raise ValueError("matrix selector outside a range function")
        offset_ms = 0
        t = self.peek()
        if t is not None and t.kind == "off":
            offset_ms = parse_duration(self.next().val[len("offset"):].strip())
        return Selector(matchers, range_ms, offset_ms=offset_ms)


def parse_expr(s: str):
    """Parse a PromQL-subset expression string into the AST."""
    p = _Parser(_tokenize(s))
    node = p.parse_expr()
    if p.peek() is not None:
        raise ValueError(f"trailing input: {p.peek().val!r}")
    return node


# ---------------------------------------------------------------- eval

_G = "_pq_t"  # grid-time column name during evaluation


def _fdiv(a: Column, b: int) -> Column:
    """Floor division by a positive int (Spark `div` truncates to zero).
    Exact: a - pmod(a,b) is a multiple of b and the magnitudes here stay
    far under 2^53."""
    return ((a - F.pmod(a, F.lit(b))) / F.lit(b)).cast("long")


def _grid_explode(
    df: DataFrame, start: int, end: int, step: int, reach: int
) -> DataFrame:
    """Fan each sample out to the grid points whose window it serves.

    A sample at t belongs to grid point T iff T - reach < t <= T, i.e.
    T ∈ [t, t + reach). Grid points are start + k*step for
    k ∈ [0, (end-start)//step]. Fan-out per sample ≤ reach/step + 1 —
    set by the query, independent of data volume."""
    kmax = (end - start) // step
    k_lo = F.greatest(F.lit(0).cast("long"), _fdiv(F.col("t") - start + step - 1, step))
    k_hi = F.least(F.lit(kmax).cast("long"), _fdiv(F.col("t") + reach - 1 - start, step))
    # a sample whose reach touches no grid point yields k_lo > k_hi —
    # guard with NULL (explode drops it); a bare sequence would count DOWN
    seq = F.when(k_lo <= k_hi, F.sequence(k_lo, k_hi))
    return (
        df.withColumn("_k", F.explode(seq))
        .withColumn(_G, (F.lit(start) + F.col("_k") * step).cast("long"))
        .drop("_k")
    )


def _with_lag(df: DataFrame) -> DataFrame:
    """Per-series arrival-ordered lag columns for reset/change logic.

    One shuffle on labels_str; computed BEFORE the grid fan-out so each
    adjacent-pair fact is derived once, not once per covering window."""
    from pyspark.sql import Window

    w = Window.partitionBy("labels_str").orderBy("t")
    return df.select(
        "labels_str",
        "labels",
        "t",
        "vc",
        F.lag("vc").over(w).alias("pvc"),
        F.lag("t").over(w).alias("pt"),
    )


# window-aggregate builders: (series, T) group → centi-unit columns
def _window_agg(fn: str, range_ms: int):
    base = [
        F.count("*").alias("n"),
        F.min("t").alias("first_t"),
        F.max("t").alias("last_t"),
        F.min_by("vc", "t").alias("first_c"),
        F.max_by("vc", "t").alias("last_c"),
    ]
    if fn in ("rate", "increase", "irate", "resets"):
        # counter semantics: per-pair drop facts, first-pair fact excluded
        # when its left neighbor precedes the window
        base += [
            F.sum(
                F.when((F.col("pvc").isNotNull()) & (F.col("vc") < F.col("pvc")), F.col("pvc"))
                .otherwise(F.lit(0))
            ).alias("drop_sum"),
            F.sum(
                F.when((F.col("pvc").isNotNull()) & (F.col("vc") < F.col("pvc")), 1)
                .otherwise(F.lit(0))
            ).alias("reset_n"),
            F.min_by(
                F.when(
                    (F.col("pvc").isNotNull()) & (F.col("vc") < F.col("pvc")), F.col("pvc")
                ).otherwise(F.lit(0)),
                "t",
            ).alias("first_drop"),
            F.min_by(
                F.when(
                    (F.col("pvc").isNotNull()) & (F.col("vc") < F.col("pvc")), 1
                ).otherwise(F.lit(0)),
                "t",
            ).alias("first_reset"),
        ]
    if fn == "changes":
        base += [
            F.sum(
                F.when((F.col("pvc").isNotNull()) & (F.col("vc") != F.col("pvc")), 1)
                .otherwise(F.lit(0))
            ).alias("chg_sum"),
            F.min_by(
                F.when(
                    (F.col("pvc").isNotNull()) & (F.col("vc") != F.col("pvc")), 1
                ).otherwise(F.lit(0)),
                "t",
            ).alias("first_chg"),
        ]
    if fn in ("irate", "idelta"):
        base += [
            F.max_by("pvc", "t").alias("last_pvc"),
            F.max_by("pt", "t").alias("last_pt"),
        ]
    if fn == "sum_over_time":
        base.append(F.sum("vc").alias("sum_c"))
    if fn == "avg_over_time":
        base.append(F.sum("vc").alias("sum_c"))
    if fn == "min_over_time":
        base.append(F.min("vc").alias("min_c"))
    if fn == "max_over_time":
        base.append(F.max("vc").alias("max_c"))
    return base


def _window_value(fn: str, range_ms: int, grid_t: Column) -> Column:
    """Final per-(series, T) double value from the window aggregates —
    deterministic scalar math over order-independent integer columns."""
    n = F.col("n")
    first_t, last_t = F.col("first_t"), F.col("last_t")
    first_c, last_c = F.col("first_c"), F.col("last_c")
    if fn == "count_over_time":
        return n.cast("double")
    if fn == "last_over_time":
        return last_c / 100.0
    if fn == "sum_over_time":
        return F.col("sum_c") / 100.0
    if fn == "avg_over_time":
        return F.col("sum_c") / n / 100.0
    if fn == "min_over_time":
        return F.col("min_c") / 100.0
    if fn == "max_over_time":
        return F.col("max_c") / 100.0
    if fn == "resets":
        return (F.col("reset_n") - F.col("first_reset")).cast("double")
    if fn == "changes":
        return (F.col("chg_sum") - F.col("first_chg")).cast("double")
    if fn == "idelta":
        return F.when(
            F.col("last_pt").isNotNull() & (F.col("last_pt") > grid_t - range_ms),
            (last_c - F.col("last_pvc")) / 100.0,
        )
    if fn == "irate":
        return F.when(
            F.col("last_pt").isNotNull() & (F.col("last_pt") > grid_t - range_ms),
            F.when(last_c >= F.col("last_pvc"), last_c - F.col("last_pvc"))
            .otherwise(last_c)
            / 100.0
            / ((last_t - F.col("last_pt")) / 1000.0),
        )
    # rate / increase / delta share the extrapolation skeleton
    # (promql/functions.go extrapolatedRate): needs >= 2 samples
    counter = fn in ("rate", "increase")
    delta_c = (
        (last_c - first_c + F.col("drop_sum") - F.col("first_drop"))
        if counter
        else (last_c - first_c)
    )
    sampled = (last_t - first_t).cast("double")
    dstart = (first_t - (grid_t - range_ms)).cast("double")
    dend = (grid_t - last_t).cast("double")
    avg_dur = sampled / (n - 1).cast("double")
    first_d = first_c.cast("double")
    # counters cannot extrapolate below their projected zero crossing
    zero_cross = sampled * (first_d / delta_c.cast("double"))
    dstart2 = (
        F.when(
            (delta_c > 0) & (first_d >= 0) & (zero_cross < dstart), zero_cross
        ).otherwise(dstart)
        if counter
        else dstart
    )
    factor = (
        sampled
        + F.when(dstart2 < avg_dur * 1.1, dstart2).otherwise(avg_dur / 2)
        + F.when(dend < avg_dur * 1.1, dend).otherwise(avg_dur / 2)
    ) / sampled
    ext = delta_c.cast("double") * factor / 100.0
    if fn == "rate":
        ext = ext / (range_ms / 1000.0)
    return F.when(n >= 2, ext)


class RangeQuery:
    """Compiles one parsed expression against a samples frame.

    `frame` needs (labels MAP, labels_str, t LONG, v DOUBLE) — the shape
    `DB.querier(...).select([], with_labels=True)` and
    `sources.events.events_samples` both produce."""

    def __init__(
        self,
        frame: DataFrame,
        start: int,
        end: int,
        step: int,
        lookback_ms: int = DEFAULT_LOOKBACK_MS,
    ):
        if step <= 0 or end < start:
            raise ValueError("need end >= start and step > 0")
        self.frame = frame
        self.start, self.end, self.step = start, end, step
        self.lookback_ms = lookback_ms

    # each node evaluates to a DataFrame with:
    #   grouping columns (labels_str, labels | by-columns), _pq_t, value
    def eval(self, node) -> DataFrame:
        if isinstance(node, BinScalar):
            child = self.eval(node.child)
            v, s = F.col("value"), F.lit(node.scalar)
            a, b = (s, v) if node.scalar_left else (v, s)
            ops = {"+": a + b, "-": a - b, "*": a * b, "/": a / b}
            return child.withColumn("value", ops[node.op])
        if isinstance(node, BinVector):
            return self._eval_binvec(node)
        if isinstance(node, Aggregate):
            return self._eval_agg(node)
        if isinstance(node, FuncCall):
            return self._eval_func(node)
        if isinstance(node, Selector):
            return self._eval_instant(node)
        raise TypeError(f"unknown node {node!r}")

    def _eval_binvec(self, node: BinVector) -> DataFrame:
        left, right = self.eval(node.left), self.eval(node.right)
        if "labels" in left.columns and "labels" in right.columns:
            # default one-to-one matching: full label set minus __name__;
            # result labels drop the metric name (PromQL binop rule)
            def keyed(df):
                m = F.map_filter(F.col("labels"), lambda k, _: k != F.lit("__name__"))
                return df.select(
                    L.labels_str_expr(m).alias("labels_str"),
                    m.alias("labels"),
                    F.col(_G),
                    "value",
                )

            keys = ["labels_str", _G]
            l, r = keyed(left), keyed(right)
            joined = l.alias("l").join(r.alias("r"), keys).select(
                "labels_str",
                F.col("l.labels").alias("labels"),
                F.col(_G),
                F.col("l.value").alias("_lv"),
                F.col("r.value").alias("_rv"),
            )
        else:
            # both sides are grouped aggregates: match on their common
            # grouping columns (must agree — PromQL would error too)
            lg = [c for c in left.columns if c not in (_G, "value", "labels")]
            rg = [c for c in right.columns if c not in (_G, "value", "labels")]
            if sorted(lg) != sorted(rg):
                raise ValueError(
                    f"vector-matching groups differ: {sorted(lg)} vs {sorted(rg)}"
                )
            keys = [*lg, _G]
            joined = left.join(
                right.withColumnRenamed("value", "_rv"), keys
            ).withColumnRenamed("value", "_lv")
        a, b = F.col("_lv"), F.col("_rv")
        ops = {"+": a + b, "-": a - b, "*": a * b, "/": a / b}
        return joined.withColumn("value", ops[node.op]).drop("_lv", "_rv")

    def _base(self, matchers, reach: int, offset_ms: int = 0) -> DataFrame:
        # canonicalize to one centi-unit value per (series, t) — PromQL
        # storage is unique per (series, t); raw relations (e.g. an
        # events mapping) may not be, and the lag/argmax logic needs the
        # uniqueness. min(vc) is the engine's standard deterministic
        # amend rule; the combinable groupBy also shrinks the frame
        # before the grid fan-out.
        # `offset` shifts every sample forward by offset_ms, so the
        # unchanged downstream window (T-R, T] reads the
        # (T-offset-R, T-offset] real-time window — the PromQL modifier
        # as a pure time translation.
        lo = self.start - reach + 1 - offset_ms
        return (
            self.frame.filter(L.compile_matchers(matchers))
            .filter((F.col("t") >= lo) & (F.col("t") <= self.end - offset_ms))
            .groupBy("labels_str", (F.col("t") + offset_ms).alias("t"))
            .agg(
                F.first("labels").alias("labels"),
                F.min(F.round(F.col("v") * 100).cast("long")).alias("vc"),
            )
        )

    def _eval_instant(self, node: Selector) -> DataFrame:
        reach = self.lookback_ms
        cells = _grid_explode(
            self._base(node.matchers, reach, node.offset_ms),
            self.start,
            self.end,
            self.step,
            reach,
        )
        return cells.groupBy("labels_str", _G).agg(
            F.first("labels").alias("labels"),
            (F.max_by("vc", "t") / 100.0).alias("value"),
        )

    def _eval_func(self, node: FuncCall) -> DataFrame:
        rng = node.arg.range_ms
        base = self._base(node.arg.matchers, rng, node.arg.offset_ms)
        need_lag = node.fn in (
            "rate",
            "increase",
            "irate",
            "idelta",
            "resets",
            "changes",
        )
        if need_lag:
            base = _with_lag(base)
        cells = _grid_explode(base, self.start, self.end, self.step, rng)
        agg = cells.groupBy("labels_str", _G).agg(
            F.first("labels").alias("labels"), *_window_agg(node.fn, rng)
        )
        out = agg.withColumn("value", _window_value(node.fn, rng, F.col(_G)))
        return out.filter(F.col("value").isNotNull()).select(
            "labels_str", "labels", _G, "value"
        )

    def _eval_agg(self, node: Aggregate) -> DataFrame:
        child = self.eval(node.child)
        has_labels = "labels" in child.columns

        def _key_col(k: str) -> Column:
            # a grouped child exposes its keys as plain columns; a
            # selector/function child carries the labels map
            if has_labels:
                return F.coalesce(F.col("labels").getItem(k), F.lit(""))
            return F.col(k)

        if node.op in ("topk", "bottomk"):
            # not a fold: keep the k extreme SERIES per (group, T) with
            # their input labels (PromQL topk/bottomk semantics). One
            # window over (group keys, T); ties broken deterministically
            # by the series identity so the result is reproducible.
            from pyspark.sql import Window

            part = [F.col(_G)]
            if node.by is not None:
                part += [_key_col(k) for k in node.by]
            elif node.without is not None:
                drop = F.array(*[F.lit(k) for k in [*node.without, "__name__"]])
                part.append(
                    L.labels_str_expr(
                        F.map_filter(
                            F.col("labels"), lambda k, _: ~F.array_contains(drop, k)
                        )
                    )
                )
            tie = (
                F.col("labels_str")
                if "labels_str" in child.columns
                else F.lit(0)
            )
            val = F.col("value").desc() if node.op == "topk" else F.col("value").asc()
            w = Window.partitionBy(*part).orderBy(val, tie)
            k = int(node.param if node.param is not None else 1)
            return (
                child.withColumn("_rk", F.row_number().over(w))
                .filter(F.col("_rk") <= k)
                .drop("_rk")
            )
        if node.by is not None:
            keys = [_key_col(k).alias(k) for k in node.by]
            out_keys = list(node.by)
        elif node.without is not None:
            # PromQL `without` also drops the metric name from the result
            drop = F.array(*[F.lit(k) for k in [*node.without, "__name__"]])
            keys = [
                L.labels_str_expr(
                    F.map_filter(
                        F.col("labels"), lambda k, _: ~F.array_contains(drop, k)
                    )
                ).alias("group_str")
            ]
            out_keys = ["group_str"]
        else:
            keys, out_keys = [], []
        ops = {
            "sum": F.sum("value"),
            "avg": F.avg("value"),
            "min": F.min("value"),
            "max": F.max("value"),
            "count": F.count("value").cast("double"),
            # exact percentile with PromQL's rank = φ(n-1) linear
            # interpolation (matches DuckDB quantile_cont); group sizes
            # are series-per-group, never sample counts
            "quantile": F.expr(
                f"percentile(value, {node.param if node.param is not None else 0.5})"
            ),
        }
        return child.groupBy(*keys, _G).agg(ops[node.op].alias("value")).select(
            *out_keys, _G, "value"
        )

    def run(self, node_or_text) -> DataFrame:
        node = (
            parse_expr(node_or_text) if isinstance(node_or_text, str) else node_or_text
        )
        return self.eval(node).withColumnRenamed(_G, "t").orderBy("t")


def eval_range(
    frame: DataFrame,
    expr: str,
    start: int,
    end: int,
    step: int,
    lookback_ms: int = DEFAULT_LOOKBACK_MS,
) -> DataFrame:
    """One-shot helper: evaluate `expr` over [start, end] at `step`."""
    return RangeQuery(frame, start, end, step, lookback_ms).run(expr)


def required_reach(node, lookback_ms: int = DEFAULT_LOOKBACK_MS) -> int:
    """How far before `start` the expression can read — callers bound
    their storage scan to [start - reach + 1, end] so the querier's
    partition pruning still applies under the evaluator."""
    if isinstance(node, str):
        node = parse_expr(node)
    if isinstance(node, Selector):
        base = node.range_ms if node.range_ms is not None else lookback_ms
        return base + node.offset_ms
    if isinstance(node, FuncCall):
        return required_reach(node.arg, lookback_ms)
    if isinstance(node, (Aggregate, BinScalar)):
        return required_reach(node.child, lookback_ms)
    if isinstance(node, BinVector):
        return max(
            required_reach(node.left, lookback_ms),
            required_reach(node.right, lookback_ms),
        )
    raise TypeError(f"unknown node {node!r}")


def eval_range_db(
    db,
    expr: str,
    start: int,
    end: int,
    step: int,
    lookback_ms: int = DEFAULT_LOOKBACK_MS,
) -> DataFrame:
    """Evaluate against a DB store: one pruned querier select feeds the
    grid evaluator (the promql/engine.go arrangement — the evaluator
    sits directly on Querier.Select)."""
    node = parse_expr(expr)
    reach = required_reach(node, lookback_ms)
    frame = db.querier(start - reach + 1, end).select([], with_labels=True)
    return RangeQuery(frame, start, end, step, lookback_ms).run(node)
