"""Distributed as-of join: attach to each left row the nearest right row
at-or-before (backward) or at-or-after (forward) its timestamp, per key.

The reference engine has no as-of operator (its querier serves raw
iterators and PromQL's evaluator does the lookback in-process,
promql/engine.go instant-vector semantics); a Spark-first engine wants
it as a first-class relational operator — it is THE serving primitive
for "value of each series as of time T" (instant vectors, point-in-time
feature joins, last-observation-carried-forward).

Strategy — union + one ordered window, never a range join:
  1. tag left rows side=1 and right rows side=0, union them on the key
     columns and a common event-time column;
  2. ONE shuffle on the key (the window partition), sort by
     (t, side) — a right row at exactly the left timestamp sorts first,
     making the match inclusive;
  3. per partition, `last(payload_struct, ignorenulls=True)` over rows
     UNBOUNDED PRECEDING..CURRENT carries the latest right payload
     forward; left rows read it off. The payload rides as ONE struct —
     non-null for every right row even when individual fields are null —
     so the match is row-atomic: a right row with a null column can
     never stitch that column from an older right row;
  4. a tolerance horizon nulls matches older than the window.

Cost: shuffle(left + right) once + a linear scan — no candidate
explosion, no per-left-row probe. This beats the naive
`left JOIN right ON key AND rt <= lt` + argmax (quadratic per key) at
any scale, and is exactly how hot keys stay bounded: a key's cost is
(its left rows + its right rows) log-sorted, never their product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_AT, _SIDE, _PAY = "_asof_at", "_asof_side", "_asof_pay"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_t: str = "t",
    right_t: str = "t",
    tolerance: int | None = None,
    direction: str = "backward",
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join. Returns every left row with the matched right
    payload columns appended (suffixed on name collision; the matched
    right event time is always present, as `right_t` or
    `right_t + suffix`). Unmatched / out-of-tolerance rows keep the left
    columns with null payload — filter on the matched time for an inner
    flavor.

    `right` should be unique per (on, right_t); duplicate timestamps
    resolve to an arbitrary one of the tied rows (pre-aggregate to make
    the choice explicit — the engine's samples relations already are).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    lcols = list(left.columns)
    rpay = [c for c in right.columns if c not in keys]
    if right_t not in rpay:
        raise ValueError(f"right frame has no event-time column {right_t!r}")
    ren = {c: (c + suffix if c in lcols else c) for c in rpay}
    r = right.select(*keys, *[F.col(c).alias(ren[c]) for c in rpay])
    rp = [ren[c] for c in rpay]

    def _null(df: DataFrame, c: str) -> Column:
        return F.lit(None).cast(df.schema[c].dataType).alias(c)

    # all right payload columns travel as ONE struct: null marks "no
    # right row here" (left rows), while a right row with null FIELDS is
    # still a non-null struct — last(ignorenulls) then matches whole
    # rows, never a column-wise mix of different right rows
    pay_t = r.select(F.struct(*rp).alias(_PAY)).schema[_PAY].dataType
    lside = left.select(
        *lcols,
        F.col(left_t).alias(_AT),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(pay_t).alias(_PAY),
    )
    rside = r.select(
        *[_null(left, c) for c in lcols if c not in keys],
        *keys,
        F.col(ren[right_t]).alias(_AT),
        F.lit(0).alias(_SIDE),
        F.struct(*rp).alias(_PAY),
    )
    order = [F.asc(_AT)] if direction == "backward" else [F.desc(_AT)]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order, F.asc(_SIDE))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = lside.unionByName(rside).select(
        *lcols,
        _AT,
        _SIDE,
        F.last(_PAY, ignorenulls=True).over(w).alias(_PAY),
    )
    out = carried.filter(F.col(_SIDE) == 1).select(
        *lcols,
        _AT,
        _SIDE,
        *[F.col(f"{_PAY}.{c}").alias(c) for c in rp],
    )
    if tolerance is not None:
        rt = ren[right_t]
        gap = (
            (F.col(_AT) - F.col(rt))
            if direction == "backward"
            else (F.col(rt) - F.col(_AT))
        )
        keep = F.col(rt).isNotNull() & (gap <= F.lit(tolerance))
        out = out.select(
            *lcols,
            _AT,
            _SIDE,
            *[F.when(keep, F.col(c)).alias(c) for c in rp],
        )
    return out.drop(_AT, _SIDE)
