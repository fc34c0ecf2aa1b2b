"""Driver-checkable registry entries for the PromQL range evaluator.

Each entry evaluates a PromQL expression string through
`tsdb_spark.promql.eval_range` against the events mapping and pairs it
with a DuckDB oracle that reproduces the Prometheus evaluation rules
(grid join + identical window/extrapolation formulas on integer
centi-units; doubles appear only in final deterministic scalar
expressions, rounded to 9 decimals on both engines — the same
discipline as tsdb_rate_extrapolated).

Scale note: the oracle uses a quadratic-ish grid range-join for
clarity; the ENGINE path is the bounded `sequence()` fan-out + one
combinable groupBy per stage (see promql.py docstring) — asserted by
tests/test_promql.py's plan-shape guard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tsdb_spark.promql import eval_range
from tsdb_spark.queries import DAY, T0, _with_prelude, register
from tsdb_spark.sources.events import events_samples

_H3 = 3 * 3_600_000
_H6 = 6 * 3_600_000


def _canon_cte(where: str) -> str:
    """(labels_str, t, vc) canonicalized exactly like promql._base."""
    return f"""d AS (SELECT labels_str, t, CAST(round(min(v) * 100) AS BIGINT) AS vc
        FROM samples WHERE {where} GROUP BY 1, 2)"""


def _grid_cte(start: int, end: int, step: int) -> str:
    return f"g AS (SELECT unnest(generate_series({start}, {end}, {step})) AS gt)"


_RATE_START, _RATE_END = T0 + DAY, T0 + 8 * DAY

_RATE_TAIL = f"""
l AS (SELECT *, lag(vc) OVER (PARTITION BY labels_str ORDER BY t) AS pvc FROM d),
w AS (SELECT l.labels_str, g.gt, l.t, l.vc, l.pvc
      FROM l JOIN g ON l.t > g.gt - {_H6} AND l.t <= g.gt),
a AS (SELECT labels_str, gt, CAST(count(*) AS BIGINT) AS n,
        min(t) AS first_t, max(t) AS last_t,
        min_by(vc, t) AS first_c, max_by(vc, t) AS last_c,
        CAST(sum(CASE WHEN pvc IS NOT NULL AND vc < pvc THEN pvc ELSE 0 END) AS BIGINT) AS drop_sum,
        min_by(CASE WHEN pvc IS NOT NULL AND vc < pvc THEN pvc ELSE 0 END, t) AS first_drop
      FROM w GROUP BY 1, 2),
e AS (SELECT *, last_c - first_c + drop_sum - first_drop AS delta_c,
        CAST(last_t - first_t AS DOUBLE) AS sampled,
        CAST(first_t - (gt - {_H6}) AS DOUBLE) AS dstart,
        CAST(gt - last_t AS DOUBLE) AS dend
      FROM a WHERE n >= 2),
x AS (SELECT *, sampled / CAST(n - 1 AS DOUBLE) AS avg_dur,
        CASE WHEN delta_c > 0 AND first_c >= 0
              AND sampled * (CAST(first_c AS DOUBLE) / CAST(delta_c AS DOUBLE)) < dstart
             THEN sampled * (CAST(first_c AS DOUBLE) / CAST(delta_c AS DOUBLE))
             ELSE dstart END AS dstart2
      FROM x_pre),
rate AS (SELECT labels_str, gt AS t,
  CAST(delta_c AS DOUBLE)
    * ((sampled
        + (CASE WHEN dstart2 < avg_dur * 1.1 THEN dstart2 ELSE avg_dur / 2 END)
        + (CASE WHEN dend < avg_dur * 1.1 THEN dend ELSE avg_dur / 2 END))
       / sampled) / 100.0 / {_H6 // 1000}.0 AS value
FROM x)
""".strip().replace(
    "FROM x_pre", "FROM e"
)


@register(
    "promql_rate_grid",
    _with_prelude(
        f"""
, {_canon_cte("event_type = 'click'")},
{_grid_cte(_RATE_START, _RATE_END, _H3)},
{_RATE_TAIL}
SELECT labels_str, t, round(value, 9) AS value FROM rate"""
    ),
    "PromQL range query `rate(click[6h])` at a 3h step: per grid point "
    "T, the counter rate over (T-6h, T] with Prometheus's boundary "
    "extrapolation and reset correction (promql/functions.go "
    "extrapolatedRate; the evaluator sits above Querier.Select exactly "
    "where promql/engine.go does). Engine plan: per-series lag + "
    "bounded sequence() fan-out to covering grid points + ONE "
    "combinable groupBy — never a grid x samples join",
)
def promql_rate_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = eval_range(
        events_samples(spark, sf_dir),
        "rate(click[6h])",
        _RATE_START,
        _RATE_END,
        _H3,
    )
    return out.select("labels_str", "t", F.round("value", 9).alias("value"))


@register(
    "promql_sum_by_rate",
    _with_prelude(
        f"""
, {_canon_cte("event_type = 'click'")},
{_grid_cte(_RATE_START, _RATE_END, _H6)},
{_RATE_TAIL},
j AS (SELECT rate.*, s2.user_lbl AS user FROM rate
      JOIN (SELECT DISTINCT labels_str, user_lbl FROM samples) s2 USING (labels_str))
SELECT user, t, round(sum(value), 9) AS value FROM j GROUP BY 1, 2"""
    ),
    "PromQL aggregation `sum by (user) (rate(click[6h]))` at a 6h "
    "step — the label-grouped second shuffle over the windowed rate. "
    "Per-(user, T) groups here hold <= 2 series (addition of two "
    "doubles is commutative, so the cross-engine hash is exact); the "
    "general N-way float-sum ordering caveat is documented in "
    "promql_queries.py",
)
def promql_sum_by_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = eval_range(
        events_samples(spark, sf_dir),
        "sum by (user) (rate(click[6h]))",
        _RATE_START,
        _RATE_END,
        _H6,
    )
    return out.select("user", "t", F.round("value", 9).alias("value"))


@register(
    "promql_instant_grid",
    _with_prelude(
        f"""
, {_canon_cte("event_type IN ('click', 'view')")},
{_grid_cte(T0 + DAY, T0 + 31 * DAY, DAY)},
w AS (SELECT d.labels_str, g.gt, d.t, d.vc
      FROM d JOIN g ON d.t > g.gt - {DAY} AND d.t <= g.gt)
SELECT labels_str, gt AS t, max_by(vc, t) / 100.0 AS value
FROM w GROUP BY 1, 2"""
    ),
    "PromQL instant-vector grid: selector `{__name__=~'click|view'}` "
    "evaluated daily with a 1d lookback — value at T = the most recent "
    "sample in (T-lookback, T] per series (promql/engine.go "
    "vectorSelectorSingle staleness rule). Exact integer comparison, "
    "no float path",
)
def promql_instant_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = eval_range(
        events_samples(spark, sf_dir),
        '{__name__=~"click|view"}',
        T0 + DAY,
        T0 + 31 * DAY,
        DAY,
        lookback_ms=DAY,
    )
    return out.select("labels_str", "t", "value")


@register(
    "promql_avg_over_time",
    _with_prelude(
        f"""
, {_canon_cte("event_type = 'view'")},
{_grid_cte(T0 + DAY, T0 + 31 * DAY, DAY)},
w AS (SELECT d.labels_str, g.gt, d.t, d.vc
      FROM d JOIN g ON d.t > g.gt - {2 * DAY} AND d.t <= g.gt)
SELECT labels_str, gt AS t,
  CAST(sum(vc) AS DOUBLE) / count(*) / 100.0 AS value
FROM w GROUP BY 1, 2"""
    ),
    "PromQL `avg_over_time(view[2d])` daily: sliding-window mean per "
    "series. The mean is an integer centi-unit sum (order-independent) "
    "over the window divided once — bit-exact across engines",
)
def promql_avg_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = eval_range(
        events_samples(spark, sf_dir),
        "avg_over_time(view[2d])",
        T0 + DAY,
        T0 + 31 * DAY,
        DAY,
    )
    return out.select("labels_str", "t", "value")


@register(
    "promql_changes_resets",
    _with_prelude(
        f"""
, {_canon_cte("event_type = 'click'")},
l AS (SELECT *, lag(vc) OVER (PARTITION BY labels_str ORDER BY t) AS pvc FROM d),
{_grid_cte(T0 + 7 * DAY, T0 + 21 * DAY, DAY)},
w AS (SELECT l.labels_str, g.gt, l.t, l.vc, l.pvc
      FROM l JOIN g ON l.t > g.gt - {3 * DAY} AND l.t <= g.gt),
a AS (SELECT labels_str, gt AS t,
        CAST(sum(CASE WHEN pvc IS NOT NULL AND vc != pvc THEN 1 ELSE 0 END)
          - min_by(CASE WHEN pvc IS NOT NULL AND vc != pvc THEN 1 ELSE 0 END, t)
          AS DOUBLE) AS changes,
        CAST(sum(CASE WHEN pvc IS NOT NULL AND vc < pvc THEN 1 ELSE 0 END)
          - min_by(CASE WHEN pvc IS NOT NULL AND vc < pvc THEN 1 ELSE 0 END, t)
          AS DOUBLE) AS resets
      FROM w GROUP BY 1, 2)
SELECT labels_str, t, changes, resets FROM a""",
    ),
    "PromQL `changes(click[3d])` and `resets(click[3d])` daily — "
    "adjacent-pair events counted inside each sliding window by summing "
    "per-sample lag facts and excluding the window's first sample's "
    "fact (whose pair partner precedes the window). Exact integers",
)
def promql_changes_resets(spark: SparkSession, sf_dir: str) -> DataFrame:
    frame = events_samples(spark, sf_dir)
    ch = eval_range(frame, "changes(click[3d])", T0 + 7 * DAY, T0 + 21 * DAY, DAY)
    rs = eval_range(frame, "resets(click[3d])", T0 + 7 * DAY, T0 + 21 * DAY, DAY)
    return (
        ch.select("labels_str", "t", F.col("value").alias("changes"))
        .join(
            rs.select("labels_str", "t", F.col("value").alias("resets")),
            ["labels_str", "t"],
        )
    )


@register(
    "promql_topk_ratio",
    _with_prelude(
        f"""
, {_canon_cte("event_type = 'click'")},
{_grid_cte(T0 + DAY, T0 + 31 * DAY, DAY)},
w AS (SELECT d.labels_str, g.gt, d.t, d.vc
      FROM d JOIN g ON d.t > g.gt - {2 * DAY} AND d.t <= g.gt),
v AS (SELECT labels_str, gt AS t,
        (CAST(sum(vc) AS DOUBLE) / 100.0) / count(*) AS value
      FROM w GROUP BY 1, 2),
-- binop drops __name__ from the matched labels (both sides share the
-- label set here, so the key is the user/k_bucket remainder)
m AS (SELECT regexp_replace(labels_str, '__name__="[^"]*",', '') AS labels_str,
             t, value
      FROM v),
r AS (SELECT *, row_number() OVER (PARTITION BY t
                                   ORDER BY value DESC, labels_str) AS rk
      FROM m)
SELECT labels_str, t, value FROM r WHERE rk <= 2"""
    ),
    "PromQL composition `topk(2, sum_over_time(click[2d]) / "
    "count_over_time(click[2d]))` daily — vector-vector arithmetic with "
    "default label matching (metric name dropped) under a topk window. "
    "The ratio is an integer-sum divided once (bit-exact); topk ties "
    "break on the canonical label string so the result is reproducible",
)
def promql_topk_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = eval_range(
        events_samples(spark, sf_dir),
        "topk(2, sum_over_time(click[2d]) / count_over_time(click[2d]))",
        T0 + DAY,
        T0 + 31 * DAY,
        DAY,
    )
    return out.select("labels_str", "t", "value")
