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

from tsdb_spark.promql import RangeQuery, eval_range
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


#: upstream drops the metric name from range-function and scalar-
#: arithmetic outputs (promql/functions.go shouldDropMetricName), and
#: the engine follows; every series in this dataset carries more labels
#: than __name__ (user is always present), so the oracle strip is a
#: plain leading-pair removal from the canonical labels_str
_NONAME = """regexp_replace(labels_str, '__name__="[^"]*",', '')"""


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
SELECT {_NONAME} AS labels_str, t, round(value, 9) AS value FROM rate"""
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
SELECT {_NONAME} AS labels_str, gt AS t,
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
SELECT {_NONAME} AS labels_str, t, changes, resets FROM a""",
    ),
    "PromQL `changes(click[3d])` and `resets(click[3d])` daily — "
    "adjacent-pair events counted inside each sliding window by summing "
    "per-sample lag facts and excluding the window's first sample's "
    "fact (whose pair partner precedes the window). Exact integers",
)
def promql_changes_resets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # both window fns over the identical selector: ONE fused chain
    # (r10 eval_windows) instead of two chains + a signature join —
    # same rows, proven by the unchanged oracle
    frame = events_samples(spark, sf_dir)
    q = RangeQuery(frame, T0 + 7 * DAY, T0 + 21 * DAY, DAY)
    return q.eval_windows(
        ("changes", "changes(click[3d])"),
        ("resets", "resets(click[3d])"),
    ).select("labels_str", "t", "changes", "resets")


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


# ---------------------------------------------------------- r5 wave 2

_W6 = 6 * 3_600_000
_D2 = 2 * DAY


@register(
    "promql_deriv_predict",
    _with_prelude(
        f"""
, {_canon_cte("event_type = 'click'")},
{_grid_cte(T0 + 2 * DAY, T0 + 16 * DAY, DAY)},
w AS (SELECT d.labels_str, g.gt, d.t - g.gt AS x, d.vc
      FROM d JOIN g ON d.t > g.gt - {_D2} AND d.t <= g.gt),
a AS (SELECT labels_str, gt, CAST(count(*) AS BIGINT) AS n,
        sum(x) AS sx, sum(vc) AS sy,
        sum(CAST(x AS HUGEINT) * vc) AS sxy,
        sum(CAST(x AS HUGEINT) * x) AS sxx
      FROM w GROUP BY 1, 2),
s AS (SELECT labels_str, gt, n, sx, sy,
        CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE) AS num,
        CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS den
      FROM a WHERE n >= 2)
SELECT {_NONAME} AS labels_str, gt AS t,
  round(num / den * 1000.0 / 100.0, 9) AS deriv,
  round(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) / 100.0
        + num / den / 100.0 * (86400000.0 - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)), 9)
    AS predicted
FROM s WHERE den != 0.0"""
    ),
    "PromQL `deriv(click[2d])` and `predict_linear(click[2d], 86400)` "
    "daily: least-squares slope per sliding window, computed from EXACT "
    "integer/decimal sums over x = t - T (centering on the grid point "
    "bounds |x| by the range, making x² overflow-proof and the slope "
    "bit-stable across engines — promql/functions.go linearRegression "
    "is the float-accumulating original). Engine plan: the same bounded "
    "fan-out + one combinable groupBy as every window fn — the four "
    "regression sums are just four more combinable aggregates",
)
def promql_deriv_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    # deriv and predict_linear share the exact regression aggregates:
    # ONE fused chain (r10 eval_windows) computes both values, where
    # two chains + a join each re-derived the same sums
    frame = events_samples(spark, sf_dir)
    q = RangeQuery(frame, T0 + 2 * DAY, T0 + 16 * DAY, DAY)
    out = q.eval_windows(
        ("deriv", "deriv(click[2d])"),
        ("predicted", "predict_linear(click[2d], 86400)"),
    )
    return out.select(
        "labels_str",
        "t",
        F.round("deriv", 9).alias("deriv"),
        F.round("predicted", 9).alias("predicted"),
    )


@register(
    "promql_stat_windows",
    _with_prelude(
        f"""
, {_canon_cte("event_type = 'view'")},
{_grid_cte(T0 + 2 * DAY, T0 + 16 * DAY, DAY)},
w AS (SELECT d.labels_str, g.gt, d.vc
      FROM d JOIN g ON d.t > g.gt - {_D2} AND d.t <= g.gt),
a AS (SELECT labels_str, gt, CAST(count(*) AS BIGINT) AS n,
        sum(vc) AS s, sum(vc * vc) AS ss,
        quantile_cont(vc, 0.9) AS q
      FROM w GROUP BY 1, 2)
SELECT {_NONAME} AS labels_str, gt AS t,
  round(CAST(n * ss - s * s AS DOUBLE) / CAST(n AS DOUBLE) / CAST(n AS DOUBLE)
        / 10000.0, 9) AS stdvar,
  round(sqrt(CAST(n * ss - s * s AS DOUBLE) / CAST(n AS DOUBLE)
             / CAST(n AS DOUBLE) / 10000.0), 9) AS stddev,
  round(q / 100.0, 9) AS p90
FROM a"""
    ),
    "PromQL `stdvar_over_time` / `stddev_over_time` / "
    "`quantile_over_time(0.9, ...)` over view[2d] daily: population "
    "variance from exact integer sums (n·Σc² − (Σc)²)/n², and the exact "
    "φ(n-1) interpolated percentile over integer centi-units (Spark "
    "`percentile` ≡ DuckDB `quantile_cont`) — all three deterministic, "
    "rounded to 9 decimals to absorb last-bit interpolation ordering",
)
def promql_stat_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    # three window fns over the identical selector: ONE fused chain
    # (r10 eval_windows) instead of three chains + two signature joins
    frame = events_samples(spark, sf_dir)
    q = RangeQuery(frame, T0 + 2 * DAY, T0 + 16 * DAY, DAY)
    out = q.eval_windows(
        ("stdvar", "stdvar_over_time(view[2d])"),
        ("stddev", "stddev_over_time(view[2d])"),
        ("p90", "quantile_over_time(0.9, view[2d])"),
    )
    return out.select(
        "labels_str",
        "t",
        F.round("stdvar", 9).alias("stdvar"),
        F.round("stddev", 9).alias("stddev"),
        F.round("p90", 9).alias("p90"),
    )


@register(
    "promql_cmp_unless",
    _with_prelude(
        f"""
, {_grid_cte(T0 + 2 * DAY, T0 + 16 * DAY, DAY)},
cc AS (SELECT labels_str, t, CAST(round(min(v) * 100) AS BIGINT) AS vc
       FROM samples WHERE event_type = 'click' GROUP BY 1, 2),
cv AS (SELECT labels_str, t, CAST(round(min(v) * 100) AS BIGINT) AS vc
       FROM samples WHERE event_type = 'view' GROUP BY 1, 2),
um AS (SELECT DISTINCT labels_str, user_lbl FROM samples),
lw AS (SELECT cc.labels_str, g.gt, sum(cc.vc) AS s
       FROM cc JOIN g ON cc.t > g.gt - {_D2} AND cc.t <= g.gt GROUP BY 1, 2),
lhs AS (SELECT labels_str, gt, CAST(s AS DOUBLE) / 100.0 AS value
        FROM lw WHERE CAST(s AS DOUBLE) / 100.0 > 60.0),
rw AS (SELECT cv.labels_str, g.gt, max(cv.vc) AS m
       FROM cv JOIN g ON cv.t > g.gt - {_D2} AND cv.t <= g.gt GROUP BY 1, 2),
ru AS (SELECT DISTINCT um.user_lbl, rw.gt
       FROM rw JOIN um USING (labels_str)
       WHERE CAST(rw.m AS DOUBLE) / 100.0 > 200.0)
SELECT regexp_replace(lhs.labels_str, '__name__="[^"]*",', '') AS labels_str,
  lhs.gt AS t, round(lhs.value, 9) AS value
FROM lhs JOIN um USING (labels_str)
WHERE NOT EXISTS (SELECT 1 FROM ru
                  WHERE ru.user_lbl = um.user_lbl AND ru.gt = lhs.gt)"""
    ),
    "PromQL comparison filters + set algebra: "
    "`sum_over_time(click[2d]) > 60 unless on (user) "
    "(max_over_time(view[2d]) > 200)` daily — the > filters keep LHS "
    "elements untouched (the window fn already dropped the metric "
    "name, as upstream does), then `unless on (user)` "
    "anti-joins away every series whose user had a high view spike at "
    "that instant. Engine plan: two window aggregates + one "
    "signature-keyed anti join; all values exact centi-unit sums",
)
def promql_cmp_unless(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = eval_range(
        events_samples(spark, sf_dir),
        "sum_over_time(click[2d]) > 60 unless on (user) "
        "(max_over_time(view[2d]) > 200)",
        T0 + 2 * DAY,
        T0 + 16 * DAY,
        DAY,
    )
    return out.select("labels_str", "t", F.round("value", 9).alias("value"))


_HQ_LES = (10.0, 25.0, 50.0, 100.0, 250.0)


@register(
    "promql_hist_tiers",
    _with_prelude(
        f"""
, b AS (SELECT CASE WHEN k_bucket = 'high' THEN 'high' ELSE 'low' END AS tier,
          (t - t % {_W6}) + {_W6} AS w_end,
          CAST(count(*) AS BIGINT) AS n,
          {", ".join(f"CAST(count(*) FILTER (WHERE v <= {le}) AS BIGINT) AS c{i+1}" for i, le in enumerate(_HQ_LES))}
        FROM samples WHERE t >= {T0} AND t < {T0} + 7 * {DAY}
        GROUP BY 1, 2)
SELECT tier, w_end AS t,
  round(CASE WHEN 0.9 * n <= c1 THEN 0.0 + (10.0 - 0.0) * (0.9 * n - 0.0) / (c1 - 0.0)
             WHEN 0.9 * n <= c2 THEN 10.0 + (25.0 - 10.0) * (0.9 * n - c1) / (c2 - c1)
             WHEN 0.9 * n <= c3 THEN 25.0 + (50.0 - 25.0) * (0.9 * n - c2) / (c3 - c2)
             WHEN 0.9 * n <= c4 THEN 50.0 + (100.0 - 50.0) * (0.9 * n - c3) / (c4 - c3)
             WHEN 0.9 * n <= c5 THEN 100.0 + (250.0 - 100.0) * (0.9 * n - c4) / (c5 - c4)
             ELSE 250.0 END, 9) AS value
FROM b"""
    ),
    "PromQL `histogram_quantile(0.9, lat_bucket)` through the GENERIC "
    "bucket-interpolation fold (promql/quantile.go bucketQuantile): the "
    "engine first derives a cumulative le-bucket counter frame per "
    "(tier, 6h window) — one map-side-combinable aggregate with 6 "
    "conditional counts, fanned to bucket series rows — then the "
    "evaluator's array fold walks ascending buckets exactly like the "
    "oracle's fixed CASE chain. Demonstrates the fold and the CASE "
    "compute bit-identical doubles over exact integer counts",
)
def promql_hist_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tsdb_spark import labels as L

    s = events_samples(spark, sf_dir).filter(
        (F.col("t") >= T0) & (F.col("t") < T0 + 7 * DAY)
    )
    g = s.groupBy(
        F.when(F.col("labels").getItem("k_bucket") == "high", "high")
        .otherwise("low")
        .alias("tier"),
        (F.col("t") - F.pmod(F.col("t"), F.lit(_W6)) + _W6).alias("w_end"),
    ).agg(
        F.count("*").alias("n"),
        *[
            F.count_if(F.col("v") <= F.lit(le)).alias(f"c{i+1}")
            for i, le in enumerate(_HQ_LES)
        ],
    )
    stack_args = ", ".join(
        [f"'{le}', c{i+1}" for i, le in enumerate(_HQ_LES)] + ["'+Inf', n"]
    )
    rows = g.select(
        "tier",
        "w_end",
        F.expr(f"stack({len(_HQ_LES) + 1}, {stack_args}) AS (le, cnt)"),
    )
    lab = F.create_map(
        F.lit("__name__"), F.lit("lat_bucket"),
        F.lit("tier"), F.col("tier"),
        F.lit("le"), F.col("le"),
    )
    frame = rows.select(
        lab.alias("labels"),
        L.labels_str_expr(lab).alias("labels_str"),
        F.col("w_end").alias("t"),
        F.col("cnt").cast("double").alias("v"),
    )
    out = eval_range(
        frame,
        "histogram_quantile(0.9, lat_bucket)",
        T0 + _W6,
        T0 + 7 * DAY,
        _W6,
        lookback_ms=1,
    )
    return out.select(
        F.col("labels").getItem("tier").alias("tier"),
        "t",
        F.round("value", 9).alias("value"),
    )


@register(
    "promql_value_pipeline",
    _with_prelude(
        f"""
, {_canon_cte("event_type = 'view'")},
{_grid_cte(T0 + 2 * DAY, T0 + 16 * DAY, DAY)},
w AS (SELECT d.labels_str, g.gt, d.vc
      FROM d JOIN g ON d.t > g.gt - {_D2} AND d.t <= g.gt),
a AS (SELECT labels_str, gt,
        CAST(sum(vc) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 100.0 AS avgv
      FROM w GROUP BY 1, 2),
r AS (SELECT labels_str, gt,
        least(60.0, greatest(40.0, floor(avgv / 0.5 + 0.5) * 0.5)) AS value
      FROM a)
SELECT regexp_replace(labels_str, '__name__="[^"]*",', '') AS labels_str,
       gt AS t, round(value, 9) AS value
FROM r"""
    ),
    "PromQL value-transform chain `clamp(round(avg_over_time(view[2d]), "
    "0.5), 40, 60)` daily — elementwise functions compose on the vector "
    "with the metric name dropped (PromQL rule). round(v, to) is "
    "floor(v/to + 0.5)·to on both engines (the documented "
    "cross-engine-stable form); clamp is least/greatest. Map-only on "
    "top of the window aggregate — no extra shuffle",
)
def promql_value_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = eval_range(
        events_samples(spark, sf_dir),
        "clamp(round(avg_over_time(view[2d]), 0.5), 40, 60)",
        T0 + 2 * DAY,
        T0 + 16 * DAY,
        DAY,
    )
    return out.select("labels_str", "t", F.round("value", 9).alias("value"))


@register(
    "promql_subquery",
    _with_prelude(
        f"""
, {_canon_cte("event_type = 'click'")},
ig AS (SELECT unnest(generate_series(
        ({T0} + 2 * {DAY} - 7 * {DAY}) - ({T0} + 2 * {DAY} - 7 * {DAY}) % {DAY},
        {T0} + 16 * {DAY}, {DAY})) AS it),
iw AS (SELECT d.labels_str, ig.it, sum(d.vc) AS s
       FROM d JOIN ig ON d.t > ig.it - {2 * DAY} AND d.t <= ig.it
       GROUP BY 1, 2),
iv AS (SELECT labels_str, it,
         CAST(round((CAST(s AS DOUBLE) / 100.0) * 100) AS BIGINT) AS ivc
       FROM iw),
{_grid_cte(T0 + 2 * DAY, T0 + 16 * DAY, DAY)},
ow AS (SELECT iv.labels_str, g.gt, iv.ivc
       FROM iv JOIN g ON iv.it > g.gt - {7 * DAY} AND iv.it <= g.gt)
SELECT {_NONAME} AS labels_str, gt AS t, max(ivc) / 100.0 AS value
FROM ow GROUP BY 1, 2"""
    ),
    "PromQL subquery `max_over_time(sum_over_time(click[2d])[7d:1d])` "
    "daily: the inner expression runs on its own absolute-1d-aligned "
    "grid, its output points are re-canonicalized to centi-units and "
    "fed to the outer window exactly like samples "
    "(promql/engine.go evalSubquery). Engine plan: plan COMPOSITION — "
    "the inner bounded fan-out feeds the outer bounded fan-out, a "
    "fixed number of shuffles regardless of data volume, never a "
    "driver-side inner-evaluation loop",
)
def promql_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = eval_range(
        events_samples(spark, sf_dir),
        "max_over_time(sum_over_time(click[2d])[7d:1d])",
        T0 + 2 * DAY,
        T0 + 16 * DAY,
        DAY,
    )
    return out.select("labels_str", "t", "value")


@register(
    "promql_label_pipeline",
    _with_prelude(
        f"""
, {_canon_cte("event_type = 'click'")},
{_grid_cte(T0 + DAY, T0 + 31 * DAY, DAY)},
w AS (SELECT d.labels_str, g.gt, d.t, d.vc
      FROM d JOIN g ON d.t > g.gt - {DAY} AND d.t <= g.gt),
lv AS (SELECT labels_str, gt, max_by(vc, t) / 100.0 AS value
       FROM w GROUP BY 1, 2),
um AS (SELECT DISTINCT labels_str, user_lbl FROM samples)
SELECT 'u' || um.user_lbl AS uid, lv.gt AS t,
       round(sum(lv.value), 9) AS value
FROM lv JOIN um USING (labels_str)
GROUP BY 1, 2"""
    ),
    "PromQL label-rewrite pipeline `sum by (uid) (label_replace("
    "last_over_time(click[1d]), \\\"uid\\\", \\\"u$1\\\", \\\"user\\\", "
    "\\\"(.*)\\\"))` daily — label_replace runs as a pure map rewrite "
    "(promql/functions.go funcLabelReplace; $1 backrefs behave "
    "identically in RE2 and Java), then the aggregation groups on the "
    "SYNTHESIZED label. Per-(uid, T) groups hold <= 2 series (the "
    "k_bucket split), so the float sum is order-independent",
)
def promql_label_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = eval_range(
        events_samples(spark, sf_dir),
        'sum by (uid) (label_replace(last_over_time(click[1d]), '
        '"uid", "u$1", "user", "(.*)"))',
        T0 + DAY,
        T0 + 31 * DAY,
        DAY,
    )
    return out.select("uid", "t", F.round("value", 9).alias("value"))


@register(
    "promql_recording_rule",
    _with_prelude(
        f"""
, {_canon_cte("event_type = 'click'")},
{_grid_cte(T0 + DAY, T0 + 15 * DAY, DAY)},
w AS (SELECT d.labels_str, g.gt, sum(d.vc) AS s
      FROM d JOIN g ON d.t > g.gt - {DAY} AND d.t <= g.gt GROUP BY 1, 2),
um AS (SELECT DISTINCT labels_str, user_lbl FROM samples),
r1 AS (SELECT um.user_lbl AS u, w.gt,
         sum(CAST(w.s AS DOUBLE) / 100.0) AS v,
         CAST(sum(w.s) AS BIGINT) AS sc
       FROM w JOIN um USING (labels_str) GROUP BY 1, 2),
rule1 AS (SELECT '{{{{__name__="job:click:sum1d",rule_group="daily",user="'
                 || u || '"}}}}' AS labels_str,
                 gt AS t, v FROM r1),
rk AS (SELECT *, row_number() OVER (
         PARTITION BY gt
         ORDER BY CAST(sc AS DOUBLE) / 100.0 DESC,
           '{{{{__name__="job:click:sum1d",rule_group="daily",user="' || u || '"}}}}'
       ) AS rnk FROM r1),
rule2 AS (SELECT '{{{{__name__="job:click:sum1d:top",rule_group="daily",user="'
                 || u || '"}}}}' AS labels_str,
                 gt AS t, CAST(sc AS DOUBLE) / 100.0 AS v
          FROM rk WHERE rnk <= 3)
SELECT labels_str, t, round(v, 9) AS v FROM rule1
UNION ALL
SELECT labels_str, t, round(v, 9) AS v FROM rule2"""
    ),
    "recording rules (rules/recording.go Eval semantics on DB.append): "
    "rule 1 `job:click:sum1d = sum by (user) (sum_over_time(click[1d]))` "
    "with a static rule_group label, rule 2 "
    "`topk(3, job:click:sum1d)` LAYERED on rule 1's recorded output "
    "(sequential group eval) — both materialized back into the store "
    "with one batch append each and read back through the normal "
    "matcher path. Rule 2's values pass through the instant-vector "
    "centi canonicalization, so its oracle is the exact integer sum "
    "while rule 1's is the float-addition original — both deterministic",
)
def promql_recording_rule(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tsdb_spark import labels as L
    from tsdb_spark.queries import _store

    db = _store(spark, sf_dir, "rules")
    return (
        db.querier(T0, T0 + 16 * DAY)
        .select([L.re_match("__name__", "job:click:sum1d.*")])
        .select("labels_str", "t", F.round("v", 9).alias("v"))
    )


@register(
    "store_rules_backfill",
    _with_prelude(
        f"""
, {_canon_cte("event_type = 'click'")},
{_grid_cte(T0 + DAY, T0 + 15 * DAY, DAY)},
w AS (SELECT d.labels_str, g.gt, sum(d.vc) AS s
      FROM d JOIN g ON d.t > g.gt - {DAY} AND d.t <= g.gt GROUP BY 1, 2),
um AS (SELECT DISTINCT labels_str, user_lbl FROM samples),
r1 AS (SELECT um.user_lbl AS u, w.gt,
         sum(CAST(w.s AS DOUBLE) / 100.0) AS v,
         CAST(sum(w.s) AS BIGINT) AS sc
       FROM w JOIN um USING (labels_str) GROUP BY 1, 2),
rule1 AS (SELECT '{{{{__name__="bf:click:sum1d",user="' || u || '"}}}}'
                 AS labels_str, gt AS t, v FROM r1),
rule2 AS (SELECT '{{{{__name__="bf:click:sum1d:double",user="' || u || '"}}}}'
                 AS labels_str, gt AS t,
                 CAST(sc AS DOUBLE) / 100.0 * 2 AS v FROM r1)
SELECT labels_str, t, round(v, 9) AS v FROM rule1
UNION ALL
SELECT labels_str, t, round(v, 9) AS v FROM rule2"""
    ),
    "`promtool tsdb create-blocks-from rules` (cmd/promtool/tsdb.go + "
    "rules.go ruleImporter → promtool.backfill_rules): a rules FILE "
    "(model/rulefmt YAML) evaluates over the historical range at the "
    "group interval and appends into the store — rule 1 "
    "`bf:click:sum1d = sum by (user)(sum_over_time(click[1d]))`, rule 2 "
    "`bf:click:sum1d * 2` LAYERED on rule 1's backfilled output "
    "(sequential group eval against the same store), and an alerting "
    "rule in the file is skipped like upstream's importer. Rule 2's "
    "values pass through the instant-vector centi canonicalization, so "
    "its oracle is the exact integer sum — same discipline as "
    "promql_recording_rule",
)
def store_rules_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from tsdb_spark import labels as L
    from tsdb_spark.db import DB
    from tsdb_spark.promtool import backfill_rules
    from tsdb_spark.queries import _STORES, _store

    key = ("rules_backfill", id(spark), sf_dir)
    if key not in _STORES:
        root = tempfile.mkdtemp(prefix="tsdb_q_rbf_")
        _store(spark, sf_dir, "base").snapshot(f"{root}/db")
        yml = f"{root}/rules.yml"
        with open(yml, "w") as f:
            f.write(
                """groups:
- name: backfill
  interval: 1d
  rules:
  - record: bf:click:sum1d
    expr: sum by (user) (sum_over_time(click[1d]))
  - record: bf:click:sum1d:double
    expr: bf:click:sum1d * 2
  - alert: ClickAstronomical
    expr: bf:click:sum1d > 1e18
"""
            )
        rep = backfill_rules(
            spark, yml, f"{root}/db", None, T0 + DAY, T0 + 15 * DAY
        )
        if rep["skipped_alerts"] != 1 or rep["rules"] != 2:
            raise AssertionError(f"unexpected backfill report: {rep}")
        _STORES[key] = DB.open(spark, f"{root}/db")
    return (
        _STORES[key]
        .querier(T0, T0 + 16 * DAY)
        .select([L.re_match("__name__", "bf:click:sum1d.*")])
        .select("labels_str", "t", F.round("v", 9).alias("v"))
    )


@register(
    "promql_alert_rule",
    _with_prelude(
        f"""
, {_canon_cte("event_type = 'click'")},
{_grid_cte(T0 + DAY, T0 + 15 * DAY, DAY)},
w AS (SELECT d.labels_str, g.gt, sum(d.vc) AS s
      FROM d JOIN g ON d.t > g.gt - {DAY} AND d.t <= g.gt GROUP BY 1, 2),
act AS (SELECT labels_str, gt FROM w WHERE CAST(s AS DOUBLE) / 100.0 > 60.0),
cnt AS (SELECT a.labels_str, a.gt, CAST(count(*) AS BIGINT) AS n
        FROM act a JOIN act p ON p.labels_str = a.labels_str
                   AND p.gt BETWEEN a.gt - {2 * DAY} AND a.gt
        GROUP BY 1, 2),
um AS (SELECT DISTINCT labels_str, user_lbl, k_bucket FROM samples)
SELECT '{{{{__name__="ALERTS",alertname="hi_click",alertstate="'
       || CASE WHEN n >= 3 THEN 'firing' ELSE 'pending' END || '"'
       || CASE WHEN k_bucket = 'high' THEN ',k_bucket="high"' ELSE '' END
       || ',user="' || user_lbl || '"}}}}' AS labels_str,
       gt AS t, CAST(1.0 AS DOUBLE) AS v
FROM cnt JOIN um USING (labels_str)"""
    ),
    "alerting rules (rules/alerting.go Eval state machine at grid "
    "resolution): `hi_click = sum_over_time(click[1d]) > 60 for 2d` — "
    "active points fan out to the `for` windows they support, ONE "
    "combinable count per (series, T) decides pending vs firing, and "
    "the upstream ALERTS{{alertname, alertstate}} synthetic series is "
    "emitted with value 1. Expr labels ride along minus the metric "
    "name; exact integer window sums make the comparison deterministic",
)
def promql_alert_rule(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tsdb_spark import labels as L
    from tsdb_spark.queries import _store
    from tsdb_spark.rules import AlertRule, alerts_frame

    db = _store(spark, sf_dir, "base")
    frame = alerts_frame(
        db,
        AlertRule("hi_click", "sum_over_time(click[1d]) > 60", for_ms=2 * DAY),
        T0 + DAY,
        T0 + 15 * DAY,
        DAY,
    )
    return frame.select(
        L.labels_str_expr("labels").alias("labels_str"), "t", "v"
    )


@register(
    "promql_info_join",
    _with_prelude(
        f"""
, {_canon_cte("event_type = 'click'")},
{_grid_cte(T0 + DAY, T0 + 8 * DAY, DAY)},
w AS (SELECT d.labels_str, g.gt, max_by(d.vc, d.t) AS vc
      FROM d JOIN g ON d.t > g.gt - {DAY} AND d.t <= g.gt GROUP BY 1, 2),
um AS (SELECT DISTINCT labels_str, user_lbl, k_bucket FROM samples)
SELECT '{{{{__name__="click",job="' || user_lbl || '"'
       || CASE WHEN k_bucket = 'high' THEN ',k_bucket="high"' ELSE '' END
       || ',tier="'
       || CASE WHEN CAST(user_lbl AS INT) % 2 = 0 THEN 'even' ELSE 'odd' END
       || '",user="' || user_lbl || '"}}}}' AS labels_str,
       gt AS t, vc / 100.0 AS value
FROM w JOIN um USING (labels_str)"""
    ),
    "PromQL 3.x info() (promql/info.go, promql-experimental-functions): "
    "`info(label_replace(click, 'job', '$1', 'user', '(.+)'))` enriches "
    "each sample with the data labels of the `target_info` series "
    "sharing its identifying labels (job here; target_info synthesized "
    "per user with a parity `tier` label). Engine plan: ONE equi-join "
    "on (identifying labels, T) against the BROADCAST info instant "
    "vector — info metrics are dim-scale, the main vector never "
    "reshuffles",
)
def promql_info_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tsdb_spark import labels as L
    from tsdb_spark.promql import RangeQuery

    s = events_samples(spark, sf_dir)
    users = s.select(F.col("labels").getItem("user").alias("u")).distinct()
    days = spark.range(16).select(
        (F.lit(T0) + F.col("id") * DAY).cast("long").alias("t")
    )
    tier = F.when(F.col("u").cast("int") % 2 == 0, F.lit("even")).otherwise(
        F.lit("odd")
    )
    info = users.crossJoin(F.broadcast(days)).select(
        F.create_map(
            F.lit("__name__"), F.lit("target_info"),
            F.lit("job"), F.col("u"),
            F.lit("tier"), tier,
        ).alias("labels"),
        "t",
        F.lit(1.0).alias("v"),
    )
    frame = s.select("labels", "labels_str", "t", "v").unionByName(
        info.withColumn("labels_str", L.labels_str_expr("labels"))
    )
    q = RangeQuery(frame, T0 + DAY, T0 + 8 * DAY, DAY, lookback_ms=DAY)
    out = q.run(
        'info(label_replace({__name__="click"}, "job", "$1", "user", "(.+)"))'
    )
    return out.select("labels_str", "t", "value")


def _native_hist_result(q) -> DataFrame:
    """quantile/count/sum over an h-carrying frame, joined per
    (series, T) — shared by the frame-level and store-level entries."""
    a = q.run("histogram_quantile(0.9, click)").select(
        "labels_str", "t", F.round("value", 9).alias("q90")
    )
    b = q.run("histogram_count(click)").select(
        "labels_str", "t", F.col("value").alias("cnt")
    )
    c = q.run("histogram_sum(click)").select(
        "labels_str",
        "t",
        F.round(F.col("value") / 100.0, 9).alias("sm"),
    )
    return a.join(b, ["labels_str", "t"]).join(c, ["labels_str", "t"])



@register(
    "promql_native_hist",
    _with_prelude(
        f"""
, c AS (SELECT labels_str, t, round(v * 100) AS cv FROM samples
        WHERE event_type = 'click'),
hb AS (SELECT labels_str, t - (t % {DAY}) + {DAY} AS th, cv,
         CASE WHEN cv > 0 THEN (CASE WHEN CAST(cv AS BIGINT) <= 1 THEN 0
              ELSE CAST(length(bin(CAST(cv AS BIGINT) - 1)) AS INT) END)
         END AS idx
       FROM c),
bk AS (SELECT labels_str, th, idx, CAST(count(*) AS DOUBLE) AS cnt,
         sum(cv) AS sv
       FROM hb GROUP BY 1, 2, 3),
h AS (SELECT labels_str, th, sum(cnt) AS hcount, sum(sv) AS hsum,
        sum(CASE WHEN idx IS NULL THEN cnt ELSE 0.0 END) AS zero
      FROM bk GROUP BY 1, 2),
cm AS (SELECT labels_str, th, idx, cnt,
        sum(cnt) OVER (PARTITION BY labels_str, th ORDER BY idx
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumc
       FROM bk WHERE idx IS NOT NULL),
j AS (SELECT cm.*, h.hcount, h.zero, 0.9 * h.hcount AS rnk
      FROM cm JOIN h USING (labels_str, th)),
pk AS (SELECT labels_str, th, min(idx) AS pidx
       FROM j WHERE zero + cumc >= rnk GROUP BY 1, 2),
iq AS (SELECT j.labels_str, j.th,
         pow(2.0, j.idx - 1) + (pow(2.0, j.idx) - pow(2.0, j.idx - 1))
           * (j.rnk - (j.zero + j.cumc - j.cnt)) / j.cnt AS qi
       FROM j JOIN pk ON pk.labels_str = j.labels_str AND pk.th = j.th
                     AND j.idx = pk.pidx),
qv AS (SELECT h.labels_str, h.th,
         CASE WHEN h.zero > 0 AND 0.9 * h.hcount <= h.zero THEN 0.0
              ELSE iq.qi END AS q90,
         h.hcount AS cnt, h.hsum / 100.0 AS sm
       FROM h LEFT JOIN iq ON iq.labels_str = h.labels_str
                          AND iq.th = h.th),
um AS (SELECT DISTINCT labels_str, user_lbl, k_bucket FROM samples)
SELECT '{{{{' || CASE WHEN k_bucket = 'high' THEN 'k_bucket="high",' ELSE '' END
       || 'user="' || user_lbl || '"}}}}' AS labels_str,
       th AS t, round(q90, 9) AS q90, cnt, round(sm, 9) AS sm
FROM qv JOIN um USING (labels_str)
WHERE th BETWEEN {T0 + DAY} AND {T0 + 15 * DAY}"""
    ),
    "native (exponential-bucket) histograms — the prometheus 3.x sample "
    "type the reference's float64-only chunks lack (chunkenc/chunk.go:"
    "59-64; histograms live in chunkenc/histogram.go upstream): daily "
    "schema-0 histograms built from click centi-values (two combinable "
    "groupBys, nativehist.build_histograms), then histogram_quantile(0.9)"
    " / histogram_count / histogram_sum evaluated on the daily grid "
    "(promql/quantile.go histogramQuantile rank walk + linear bucket "
    "interpolation as a codegen'd aggregate fold — no UDF). Bucket "
    "indices use exact integer bit-length math so Spark and the oracle "
    "bucket identically; sums stay on integer-valued doubles (exact)",
)
def promql_native_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tsdb_spark import labels as L
    from tsdb_spark.nativehist import build_histograms, int_bucket_idx
    from tsdb_spark.promql import RangeQuery

    s = (
        events_samples(spark, sf_dir)
        .filter(L.compile_matchers([L.eq("__name__", "click")]))
        .withColumn("v", F.round(F.col("v") * 100))
    )
    hf = build_histograms(s, DAY, idx_expr=int_bucket_idx(F.col("v")))
    q = RangeQuery(hf, T0 + DAY, T0 + 15 * DAY, DAY, lookback_ms=DAY)
    return _native_hist_result(q)


@register(
    "store_native_hist",
    None,  # oracle assigned below — identical to promql_native_hist
    "native histograms THROUGH THE STORE: the same daily click "
    "histograms appended to the store's `histograms` table "
    "(DB.append_histograms — bucketed, range-partitioned sorted files, "
    "shared series dim) and read back through the pruned hist_frame "
    "path, then the same quantile/count/sum evaluation. The persisted "
    "round trip must answer exactly like the in-memory build",
)
def store_native_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tsdb_spark.promql import RangeQuery
    from tsdb_spark.queries import _store

    db = _store(spark, sf_dir, "hist")
    frame = db.hist_frame(T0, T0 + 16 * DAY)
    q = RangeQuery(frame, T0 + DAY, T0 + 15 * DAY, DAY, lookback_ms=DAY)
    return _native_hist_result(q)


from tsdb_spark.queries import QUERIES as _QQ  # noqa: E402

_QQ["store_native_hist"].oracle = _QQ["promql_native_hist"].oracle


@register(
    "promql_native_hist_binop",
    _with_prelude(
        f"""
, c AS (SELECT labels_str, t, round(v * 100) AS cv FROM samples
        WHERE event_type = 'click'),
hb AS (SELECT labels_str, t - (t % {DAY}) + {DAY} AS th, cv,
         CASE WHEN cv > 0 THEN (CASE WHEN CAST(cv AS BIGINT) <= 1 THEN 0
              ELSE CAST(length(bin(CAST(cv AS BIGINT) - 1)) AS INT) END)
         END AS idx
       FROM c),
bk AS (SELECT labels_str, th, idx, CAST(count(*) AS DOUBLE) AS cnt,
         sum(cv) AS sv
       FROM hb GROUP BY 1, 2, 3),
h AS (SELECT labels_str, th, sum(cnt) AS hcount, sum(sv) AS hsum,
        sum(CASE WHEN idx IS NULL THEN cnt ELSE 0.0 END) AS zero
      FROM bk GROUP BY 1, 2),
cm AS (SELECT labels_str, th, idx, cnt,
        sum(cnt) OVER (PARTITION BY labels_str, th ORDER BY idx
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumc
       FROM bk WHERE idx IS NOT NULL),
-- h+h doubles every component; rank = 0.9 * 2N walks cum 2c, which
-- interpolates exactly where the single histogram does
j AS (SELECT cm.*, h.hcount, h.zero, 0.9 * h.hcount AS rnk
      FROM cm JOIN h USING (labels_str, th)),
pk AS (SELECT labels_str, th, min(idx) AS pidx
       FROM j WHERE zero + cumc >= rnk GROUP BY 1, 2),
iq AS (SELECT j.labels_str, j.th,
         pow(2.0, j.idx - 1) + (pow(2.0, j.idx) - pow(2.0, j.idx - 1))
           * (j.rnk - (j.zero + j.cumc - j.cnt)) / j.cnt AS qi
       FROM j JOIN pk ON pk.labels_str = j.labels_str AND pk.th = j.th
                     AND j.idx = pk.pidx),
qv AS (SELECT h.labels_str, h.th,
         CASE WHEN h.zero > 0 AND 0.9 * h.hcount <= h.zero THEN 0.0
              ELSE iq.qi END AS q90b,
         2.0 * h.hcount AS cnt2, (h.hsum * 1.5) / 100.0 AS smx
       FROM h LEFT JOIN iq ON iq.labels_str = h.labels_str
                          AND iq.th = h.th),
um AS (SELECT DISTINCT labels_str, user_lbl, k_bucket FROM samples)
SELECT '{{{{' || CASE WHEN k_bucket = 'high' THEN 'k_bucket="high",' ELSE '' END
       || 'user="' || user_lbl || '"}}}}' AS labels_str,
       th AS t, round(q90b, 9) AS q90b, cnt2, round(smx, 9) AS smx
FROM qv JOIN um USING (labels_str)
WHERE th BETWEEN {T0 + DAY} AND {T0 + 15 * DAY}"""
    ),
    "native-histogram BINARY OPERATORS (prometheus 3.x engine.go "
    "histogram-valued VectorBinop — beyond the reference, which has no "
    "histogram samples at all): `click + click` matched one-to-one on "
    "the binop signature combines bucket-wise (nativehist.hist_binop: "
    "map_zip_with union merge with mismatched-schema downscale, all "
    "codegen), `(click * 3) / 2` scales components (hist_scale). "
    "histogram_quantile(0.9, h+h) must equal the single-histogram "
    "quantile (rank and buckets double together) while count doubles "
    "and the scaled sum is exactly 1.5x — three independent algebraic "
    "invariants the oracle pins. Plan: two combinable groupBys per "
    "side + ONE signature equi-join, no UDFs",
)
def promql_native_hist_binop(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tsdb_spark import labels as L
    from tsdb_spark.nativehist import build_histograms, int_bucket_idx
    from tsdb_spark.promql import RangeQuery

    s = (
        events_samples(spark, sf_dir)
        .filter(L.compile_matchers([L.eq("__name__", "click")]))
        .withColumn("v", F.round(F.col("v") * 100))
    )
    hf = build_histograms(s, DAY, idx_expr=int_bucket_idx(F.col("v")))
    q = RangeQuery(hf, T0 + DAY, T0 + 15 * DAY, DAY, lookback_ms=DAY)
    a = q.run("histogram_quantile(0.9, click + click)").select(
        "labels_str", "t", F.round("value", 9).alias("q90b")
    )
    b = q.run("histogram_count(click + click)").select(
        "labels_str", "t", F.col("value").alias("cnt2")
    )
    c = q.run("histogram_sum((click * 3) / 2)").select(
        "labels_str",
        "t",
        F.round(F.col("value") / 100.0, 9).alias("smx"),
    )
    return a.join(b, ["labels_str", "t"]).join(c, ["labels_str", "t"])


@register(
    "store_nhcb_quantile",
    _with_prelude(
        f"""
, c AS (SELECT labels_str, t, v FROM samples WHERE event_type = 'click'),
hb AS (SELECT labels_str, t - (t % {DAY}) + {DAY} AS th,
         CASE WHEN v <= 40 THEN 0 WHEN v <= 80 THEN 1
              WHEN v <= 120 THEN 2 ELSE 3 END AS idx
       FROM c),
bk AS (SELECT labels_str, th, idx, CAST(count(*) AS DOUBLE) AS cnt
       FROM hb GROUP BY 1, 2, 3),
h AS (SELECT labels_str, th, sum(cnt) AS hcount FROM bk GROUP BY 1, 2),
cm AS (SELECT labels_str, th, idx, cnt,
         sum(cnt) OVER (PARTITION BY labels_str, th ORDER BY idx
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cumc
       FROM bk),
j AS (SELECT cm.*, h.hcount, p.phi, p.phi * h.hcount AS rnk
      FROM cm JOIN h USING (labels_str, th)
      CROSS JOIN (SELECT 0.5 AS phi UNION ALL SELECT 0.9) p),
pk AS (SELECT labels_str, th, phi, min(idx) AS pidx
       FROM j WHERE cumc >= rnk GROUP BY 1, 2, 3),
iq AS (SELECT j.labels_str, j.th, j.phi,
         CASE WHEN j.idx = 3 THEN 120.0
              ELSE (CASE j.idx WHEN 0 THEN 0.0 WHEN 1 THEN 40.0
                               WHEN 2 THEN 80.0 END)
                   + ((CASE j.idx WHEN 0 THEN 40.0 WHEN 1 THEN 80.0
                                  WHEN 2 THEN 120.0 END)
                      - (CASE j.idx WHEN 0 THEN 0.0 WHEN 1 THEN 40.0
                                    WHEN 2 THEN 80.0 END))
                     * (j.rnk - (j.cumc - j.cnt)) / j.cnt
         END AS qi
       FROM j JOIN pk ON pk.labels_str = j.labels_str AND pk.th = j.th
                     AND pk.phi = j.phi AND j.idx = pk.pidx),
qv AS (SELECT iq.labels_str, iq.th,
         max(CASE WHEN iq.phi = 0.5 THEN iq.qi END) AS q50,
         max(CASE WHEN iq.phi = 0.9 THEN iq.qi END) AS q90
       FROM iq GROUP BY 1, 2),
um AS (SELECT DISTINCT labels_str, user_lbl, k_bucket FROM samples)
SELECT '{{{{' || CASE WHEN k_bucket = 'high' THEN 'k_bucket="high",' ELSE '' END
       || 'user="' || user_lbl || '"}}}}' AS labels_str,
       th AS t, round(q50, 9) AS q50, round(q90, 9) AS q90,
       h.hcount AS cnt
FROM qv JOIN h USING (labels_str, th) JOIN um USING (labels_str)
WHERE th BETWEEN {T0 + DAY} AND {T0 + 15 * DAY}"""
    ),
    "NHCB custom-bucket native histograms (prometheus 3.x schema -53, "
    "model/histogram CustomBucketsSchema) THROUGH THE STORE: daily "
    "histograms of raw click values over classic le bounds "
    "[40, 80, 120] (nativehist.build_custom_histograms — upper-"
    "inclusive buckets, +Inf overflow at idx len(bounds), bounds "
    "persisted in the h struct's custom_values), appended via "
    "DB.append_histograms and read back through the pruned hist_frame "
    "path; histogram_quantile(0.5/0.9) then interpolates on the CUSTOM "
    "grid per classic bucketQuantile (promql/quantile.go): first "
    "bucket from 0, overflow answers the last finite bound. The oracle "
    "replays the same bucketing + interpolation in SQL",
)
def store_nhcb_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tsdb_spark.promql import RangeQuery
    from tsdb_spark.queries import _store

    db = _store(spark, sf_dir, "nhcb")
    frame = db.hist_frame(T0, T0 + 16 * DAY)
    q = RangeQuery(frame, T0 + DAY, T0 + 15 * DAY, DAY, lookback_ms=DAY)
    a = q.run("histogram_quantile(0.5, click)").select(
        "labels_str", "t", F.round("value", 9).alias("q50")
    )
    b = q.run("histogram_quantile(0.9, click)").select(
        "labels_str", "t", F.round("value", 9).alias("q90")
    )
    c = q.run("histogram_count(click)").select(
        "labels_str", "t", F.col("value").alias("cnt")
    )
    return a.join(b, ["labels_str", "t"]).join(c, ["labels_str", "t"])


@register(
    "promql_classic_nhcb_convert",
    None,  # oracle assigned below — identical to store_nhcb_quantile
    "classic→NHCB conversion (the convert_classic_histograms_to_nhcb "
    "scrape-flag analog, scrape/scrape.go + model/histogram): classic "
    "cumulative `click_bucket{le=40/80/120/+Inf}` float series are "
    "synthesized from the click samples (one groupBy + explode — the "
    "exposition a classic scrape would deliver), converted to NHCB "
    "samples by nativehist.classic_to_nhcb (bounds → custom_values, "
    "cumulative→non-cumulative buckets, +Inf remainder → overflow "
    "bucket, _sum joined in), and quantiled on the custom grid. MUST "
    "answer exactly what store_nhcb_quantile answers from "
    "build_custom_histograms through the store — same data, same "
    "bounds, same interpolation — so it shares that oracle verbatim",
)
def promql_classic_nhcb_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tsdb_spark import labels as L
    from tsdb_spark.nativehist import classic_to_nhcb
    from tsdb_spark.promql import RangeQuery
    from tsdb_spark.queries import NHCB_BOUNDS

    s = events_samples(spark, sf_dir).filter(
        L.compile_matchers([L.eq("__name__", "click")])
    )
    th = (F.col("t") - F.pmod(F.col("t"), F.lit(DAY)) + DAY).alias("th")
    agg = s.groupBy("labels_str", th).agg(
        F.first("labels").alias("labels"),
        F.count("*").cast("double").alias("n"),
        *[
            F.count_if(F.col("v") <= F.lit(b)).cast("double").alias(f"c{i}")
            for i, b in enumerate(NHCB_BOUNDS)
        ],
    )
    base = F.map_filter(
        F.col("labels"), lambda k, _: k != F.lit("__name__")
    )
    le_structs = [
        F.struct(
            F.lit(str(int(b)) if float(b) == int(b) else repr(float(b)))
            .alias("le"),
            F.col(f"c{i}").alias("cum"),
        )
        for i, b in enumerate(NHCB_BOUNDS)
    ] + [F.struct(F.lit("+Inf").alias("le"), F.col("n").alias("cum"))]
    buckets = agg.select(
        base.alias("_b"), F.col("th").alias("t"),
        F.explode(F.array(*le_structs)).alias("e"),
    ).select(
        F.map_concat(
            F.col("_b"),
            F.create_map(
                F.lit("__name__"), F.lit("click_bucket"),
                F.lit("le"), F.col("e.le"),
            ),
        ).alias("labels"),
        "t",
        F.col("e.cum").alias("v"),
    )
    classic = buckets
    nh = classic_to_nhcb(classic)
    q = RangeQuery(nh, T0 + DAY, T0 + 15 * DAY, DAY, lookback_ms=DAY)
    a = q.run("histogram_quantile(0.5, click)").select(
        "labels_str", "t", F.round("value", 9).alias("q50")
    )
    b = q.run("histogram_quantile(0.9, click)").select(
        "labels_str", "t", F.round("value", 9).alias("q90")
    )
    c = q.run("histogram_count(click)").select(
        "labels_str", "t", F.col("value").alias("cnt")
    )
    return a.join(b, ["labels_str", "t"]).join(c, ["labels_str", "t"])


_QQ["promql_classic_nhcb_convert"].oracle = _QQ["store_nhcb_quantile"].oracle


@register(
    "promql_native_hist_fraction",
    _with_prelude(
        f"""
, c AS (SELECT labels_str, t, round(v * 100) AS cv FROM samples
        WHERE event_type = 'click'),
hb AS (SELECT labels_str, t - (t % {DAY}) + {DAY} AS th,
         CASE WHEN cv > 0 THEN (CASE WHEN CAST(cv AS BIGINT) <= 1 THEN 0
              ELSE CAST(length(bin(CAST(cv AS BIGINT) - 1)) AS INT) END)
         END AS idx
       FROM c),
h AS (SELECT labels_str, th, CAST(count(*) AS DOUBLE) AS cnt,
        CAST(sum(CASE WHEN idx BETWEEN 10 AND 13 THEN 1 ELSE 0 END)
          AS DOUBLE) AS inside
      FROM hb GROUP BY 1, 2),
um AS (SELECT DISTINCT labels_str, user_lbl, k_bucket FROM samples)
SELECT '{{{{' || CASE WHEN k_bucket = 'high' THEN 'k_bucket="high",' ELSE '' END
       || 'user="' || user_lbl || '"}}}}' AS labels_str,
       th AS t, round(inside / cnt, 9) AS frac, cnt
FROM h JOIN um USING (labels_str)
WHERE th BETWEEN {T0 + DAY} AND {T0 + 15 * DAY}"""
    ),
    "histogram_fraction(512, 8192, click) over daily native histograms "
    "(promql/quantile.go histogramFraction): the estimated share of "
    "observations in [512, 8192]. The bounds are powers of two aligned "
    "with the schema-0 bucket boundaries, so every bucket's "
    "interpolated overlap is exactly 0 or 1 (buckets idx 10..13 wholly "
    "inside) — the engine's per-bucket linear-overlap fold and the "
    "oracle's integer count agree bit-for-bit, one final division",
)
def promql_native_hist_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tsdb_spark import labels as L
    from tsdb_spark.nativehist import build_histograms, int_bucket_idx
    from tsdb_spark.promql import RangeQuery

    s = (
        events_samples(spark, sf_dir)
        .filter(L.compile_matchers([L.eq("__name__", "click")]))
        .withColumn("v", F.round(F.col("v") * 100))
    )
    hf = build_histograms(s, DAY, idx_expr=int_bucket_idx(F.col("v")))
    q = RangeQuery(hf, T0 + DAY, T0 + 15 * DAY, DAY, lookback_ms=DAY)
    a = q.run("histogram_fraction(512, 8192, click)").select(
        "labels_str", "t", F.round("value", 9).alias("frac")
    )
    b = q.run("histogram_count(click)").select(
        "labels_str", "t", F.col("value").alias("cnt")
    )
    return a.join(b, ["labels_str", "t"])


def _cum_click_hist(spark: SparkSession, sf_dir: str):
    from tsdb_spark import labels as L
    from tsdb_spark.nativehist import build_histograms, int_bucket_idx

    s = (
        events_samples(spark, sf_dir)
        .filter(L.compile_matchers([L.eq("__name__", "click")]))
        .withColumn("v", F.round(F.col("v") * 100))
    )
    return build_histograms(
        s, DAY, idx_expr=int_bucket_idx(F.col("v")), cumulative=True
    )



@register(
    "promql_native_hist_rate",
    _with_prelude(
        f"""
, c AS (SELECT labels_str, t, round(v * 100) AS cv FROM samples
        WHERE event_type = 'click'),
hb AS (SELECT labels_str, t - (t % {DAY}) + {DAY} AS th,
         CASE WHEN cv > 0 THEN (CASE WHEN CAST(cv AS BIGINT) <= 1 THEN 0
              ELSE CAST(length(bin(CAST(cv AS BIGINT) - 1)) AS INT) END)
              ELSE -9999 END AS ik
       FROM c),
ths AS (SELECT DISTINCT labels_str, th FROM hb),
cum AS (SELECT t1.labels_str, t1.th, h.ik, CAST(count(*) AS DOUBLE) AS c
        FROM ths t1 JOIN hb h
          ON h.labels_str = t1.labels_str AND h.th <= t1.th
        GROUP BY 1, 2, 3),
{_grid_cte(T0 + 2 * DAY, T0 + 15 * DAY, DAY)},
bounds AS (SELECT t.labels_str, g.gt, min(t.th) AS th1, max(t.th) AS th2,
             count(*) AS n
           FROM ths t JOIN g ON t.th > g.gt - {2 * DAY} AND t.th <= g.gt
           GROUP BY 1, 2
           HAVING count(*) >= 2),
-- the float path's boundary extrapolation (extrapolatedRate), now
-- applied to histograms too (histograms skip only the float-specific
-- zero-crossing cap). With day-aligned stamps and a 2d left-open
-- window every surviving window has n=2 samples a day apart, so f is
-- EXACTLY 2.0 and all scaled counts stay exact doubles
fb AS (SELECT labels_str, gt,
         (CAST(th2 - th1 AS DOUBLE)
          + CASE WHEN CAST(th1 - (gt - 172800000) AS DOUBLE)
                      < CAST(th2 - th1 AS DOUBLE) / (n - 1) * 1.1
                 THEN CAST(th1 - (gt - 172800000) AS DOUBLE)
                 ELSE CAST(th2 - th1 AS DOUBLE) / (n - 1) / 2 END
          + CASE WHEN CAST(gt - th2 AS DOUBLE)
                      < CAST(th2 - th1 AS DOUBLE) / (n - 1) * 1.1
                 THEN CAST(gt - th2 AS DOUBLE)
                 ELSE CAST(th2 - th1 AS DOUBLE) / (n - 1) / 2 END)
         / CAST(th2 - th1 AS DOUBLE) AS f
       FROM bounds),
d2 AS (SELECT b.labels_str, b.gt, c.ik, c.c
       FROM bounds b JOIN cum c
         ON c.labels_str = b.labels_str AND c.th = b.th2),
d1 AS (SELECT b.labels_str, b.gt, c.ik, c.c
       FROM bounds b JOIN cum c
         ON c.labels_str = b.labels_str AND c.th = b.th1),
diff AS (SELECT d2.labels_str, d2.gt, d2.ik,
           (d2.c - coalesce(d1.c, 0.0)) * fb.f AS dc
         FROM d2 LEFT JOIN d1
           ON d1.labels_str = d2.labels_str AND d1.gt = d2.gt
          AND d1.ik = d2.ik
         JOIN fb ON fb.labels_str = d2.labels_str AND fb.gt = d2.gt),
tot AS (SELECT labels_str, gt, sum(dc) AS cnt,
          sum(CASE WHEN ik = -9999 THEN dc ELSE 0.0 END) AS zero
        FROM diff GROUP BY 1, 2),
cw AS (SELECT labels_str, gt, ik, dc,
         sum(dc) OVER (PARTITION BY labels_str, gt ORDER BY ik
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cumc
       FROM diff WHERE ik != -9999 AND dc > 0),
j AS (SELECT cw.*, t.cnt, t.zero, 0.9 * t.cnt AS rnk
      FROM cw JOIN tot t USING (labels_str, gt)),
pk AS (SELECT labels_str, gt, min(ik) AS pidx
       FROM j WHERE zero + cumc >= rnk GROUP BY 1, 2),
iq AS (SELECT j.labels_str, j.gt,
         pow(2.0, j.ik - 1) + (pow(2.0, j.ik) - pow(2.0, j.ik - 1))
           * (j.rnk - (j.zero + j.cumc - j.dc)) / j.dc AS qi
       FROM j JOIN pk ON pk.labels_str = j.labels_str AND pk.gt = j.gt
                     AND j.ik = pk.pidx),
qv AS (SELECT t.labels_str, t.gt,
         CASE WHEN t.zero > 0 AND 0.9 * t.cnt <= t.zero THEN 0.0
              ELSE iq.qi END AS q90,
         t.cnt
       FROM tot t LEFT JOIN iq
         ON iq.labels_str = t.labels_str AND iq.gt = t.gt),
um AS (SELECT DISTINCT labels_str, user_lbl, k_bucket FROM samples)
SELECT '{{{{' || CASE WHEN k_bucket = 'high' THEN 'k_bucket="high",' ELSE '' END
       || 'user="' || user_lbl || '"}}}}' AS labels_str,
       gt AS t, round(q90, 9) AS q90, cnt
FROM qv JOIN um USING (labels_str)"""
    ),
    "the canonical native-histogram query: `histogram_quantile(0.9, "
    "increase(click[2d]))` over CUMULATIVE (counter) histograms — the "
    "upstream scrape semantics (promql/functions.go histogramRate + "
    "extrapolatedRate): the window's first/last histograms subtracted "
    "component-wise (map_zip_with over the sparse bucket union, "
    "codegen'd) and scaled by the float path's boundary-extrapolation "
    "factor (histograms skip only the float-only zero-crossing cap), "
    "then the quantile rank walk on the difference histogram. The "
    "day-aligned geometry makes the factor exactly 2.0, keeping every "
    "scaled count an exact double; the cumulative build is a densified "
    "per-(series, bucket) running sum, never a re-scan of earlier "
    "samples",
)
def promql_native_hist_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tsdb_spark.promql import RangeQuery

    hf = _cum_click_hist(spark, sf_dir)
    q = RangeQuery(hf, T0 + 2 * DAY, T0 + 15 * DAY, DAY)
    a = q.run("histogram_quantile(0.9, increase(click[2d]))").select(
        "labels_str", "t", F.round("value", 9).alias("q90")
    )
    b = q.run("histogram_count(increase(click[2d]))").select(
        "labels_str", "t", F.col("value").alias("cnt")
    )
    return a.join(b, ["labels_str", "t"])


@register(
    "promql_native_hist_sum",
    _with_prelude(
        f"""
, c AS (SELECT labels_str, t, round(v * 100) AS cv FROM samples
        WHERE event_type = 'click'),
hb AS (SELECT labels_str, t - (t % {DAY}) + {DAY} AS th,
         CASE WHEN cv > 0 THEN (CASE WHEN CAST(cv AS BIGINT) <= 1 THEN 0
              ELSE CAST(length(bin(CAST(cv AS BIGINT) - 1)) AS INT) END)
              ELSE -9999 END AS ik
       FROM c),
ths AS (SELECT DISTINCT labels_str, th FROM hb),
cum AS (SELECT t1.labels_str, t1.th, h.ik, CAST(count(*) AS DOUBLE) AS c
        FROM ths t1 JOIN hb h
          ON h.labels_str = t1.labels_str AND h.th <= t1.th
        GROUP BY 1, 2, 3),
{_grid_cte(T0 + 2 * DAY, T0 + 15 * DAY, DAY)},
bounds AS (SELECT t.labels_str, g.gt, min(t.th) AS th1, max(t.th) AS th2,
             count(*) AS n
           FROM ths t JOIN g ON t.th > g.gt - {2 * DAY} AND t.th <= g.gt
           GROUP BY 1, 2
           HAVING count(*) >= 2),
-- the float path's boundary extrapolation (extrapolatedRate), now
-- applied to histograms too (histograms skip only the float-specific
-- zero-crossing cap). With day-aligned stamps and a 2d left-open
-- window every surviving window has n=2 samples a day apart, so f is
-- EXACTLY 2.0 and all scaled counts stay exact doubles
fb AS (SELECT labels_str, gt,
         (CAST(th2 - th1 AS DOUBLE)
          + CASE WHEN CAST(th1 - (gt - 172800000) AS DOUBLE)
                      < CAST(th2 - th1 AS DOUBLE) / (n - 1) * 1.1
                 THEN CAST(th1 - (gt - 172800000) AS DOUBLE)
                 ELSE CAST(th2 - th1 AS DOUBLE) / (n - 1) / 2 END
          + CASE WHEN CAST(gt - th2 AS DOUBLE)
                      < CAST(th2 - th1 AS DOUBLE) / (n - 1) * 1.1
                 THEN CAST(gt - th2 AS DOUBLE)
                 ELSE CAST(th2 - th1 AS DOUBLE) / (n - 1) / 2 END)
         / CAST(th2 - th1 AS DOUBLE) AS f
       FROM bounds),
d2 AS (SELECT b.labels_str, b.gt, c.ik, c.c
       FROM bounds b JOIN cum c
         ON c.labels_str = b.labels_str AND c.th = b.th2),
d1 AS (SELECT b.labels_str, b.gt, c.ik, c.c
       FROM bounds b JOIN cum c
         ON c.labels_str = b.labels_str AND c.th = b.th1),
diff AS (SELECT d2.labels_str, d2.gt, d2.ik,
           (d2.c - coalesce(d1.c, 0.0)) * fb.f AS dc
         FROM d2 LEFT JOIN d1
           ON d1.labels_str = d2.labels_str AND d1.gt = d2.gt
          AND d1.ik = d2.ik
         JOIN fb ON fb.labels_str = d2.labels_str AND fb.gt = d2.gt),
um AS (SELECT DISTINCT labels_str, user_lbl FROM samples),
dg AS (SELECT um.user_lbl AS u, d.gt, d.ik, sum(d.dc) AS dc
       FROM diff d JOIN um ON um.labels_str = d.labels_str
       GROUP BY 1, 2, 3),
tot AS (SELECT u, gt, sum(dc) AS cnt,
          sum(CASE WHEN ik = -9999 THEN dc ELSE 0.0 END) AS zero
        FROM dg GROUP BY 1, 2),
cw AS (SELECT u, gt, ik, dc,
         sum(dc) OVER (PARTITION BY u, gt ORDER BY ik
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cumc
       FROM dg WHERE ik != -9999 AND dc > 0),
j AS (SELECT cw.*, t.cnt, t.zero, 0.9 * t.cnt AS rnk
      FROM cw JOIN tot t ON t.u = cw.u AND t.gt = cw.gt),
pk AS (SELECT u, gt, min(ik) AS pidx
       FROM j WHERE zero + cumc >= rnk GROUP BY 1, 2),
iq AS (SELECT j.u, j.gt,
         pow(2.0, j.ik - 1) + (pow(2.0, j.ik) - pow(2.0, j.ik - 1))
           * (j.rnk - (j.zero + j.cumc - j.dc)) / j.dc AS qi
       FROM j JOIN pk ON pk.u = j.u AND pk.gt = j.gt AND j.ik = pk.pidx)
SELECT '{{{{user="' || t.u || '"}}}}' AS labels_str, t.gt AS t,
       round(CASE WHEN t.zero > 0 AND 0.9 * t.cnt <= t.zero THEN 0.0
                  ELSE iq.qi END, 9) AS q90,
       t.cnt
FROM tot t LEFT JOIN iq ON iq.u = t.u AND iq.gt = t.gt"""
    ),
    "the grouped fleet-wide form: `histogram_quantile(0.9, sum by "
    "(user) (increase(click[2d])))` — per-series boundary-difference "
    "histograms, each scaled by its window's extrapolation factor "
    "(exactly 2.0 in this geometry), summed component-wise per user "
    "(two combinable groupBys: component sums + sparse bucket "
    "union-sum), then the quantile walk on the group histogram. Exact "
    "cross-engine",
)
def promql_native_hist_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tsdb_spark.promql import RangeQuery

    hf = _cum_click_hist(spark, sf_dir)
    q = RangeQuery(hf, T0 + 2 * DAY, T0 + 15 * DAY, DAY)
    a = q.run(
        "histogram_quantile(0.9, sum by (user) (increase(click[2d])))"
    ).select("labels_str", "t", F.round("value", 9).alias("q90"))
    b = q.run(
        "histogram_count(sum by (user) (increase(click[2d])))"
    ).select("labels_str", "t", F.col("value").alias("cnt"))
    return a.join(b, ["labels_str", "t"])


@register(
    "promql_alert_keep_firing",
    _with_prelude(
        f"""
, {_canon_cte("event_type = 'click'")},
{_grid_cte(T0 + DAY, T0 + 15 * DAY, DAY)},
w AS (SELECT d.labels_str, g.gt, sum(d.vc) AS s
      FROM d JOIN g ON d.t > g.gt - {DAY} AND d.t <= g.gt GROUP BY 1, 2),
act AS (SELECT labels_str, gt FROM w WHERE CAST(s AS DOUBLE) / 100.0 > 60.0),
cnt AS (SELECT a.labels_str, a.gt, CAST(count(*) AS BIGINT) AS n
        FROM act a JOIN act p ON p.labels_str = a.labels_str
                   AND p.gt BETWEEN a.gt - {DAY} AND a.gt
        GROUP BY 1, 2),
lat AS (SELECT s.labels_str, g.gt
        FROM (SELECT DISTINCT labels_str FROM act) s CROSS JOIN g),
dn AS (SELECT l.labels_str, l.gt, c.n
       FROM lat l LEFT JOIN cnt c
         ON c.labels_str = l.labels_str AND c.gt = l.gt),
st AS (SELECT labels_str, gt, n IS NOT NULL AS is_active,
         (n IS NOT NULL AND n >= 2) AS is_base,
         max(CASE WHEN n IS NOT NULL THEN gt END)
           OVER (PARTITION BY labels_str ORDER BY gt
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS la
       FROM dn),
mk AS (SELECT labels_str, gt, is_active,
         max(CASE WHEN is_base THEN gt END)
           OVER (PARTITION BY labels_str ORDER BY gt
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lb,
         max(CASE WHEN (NOT is_active) AND gt - la - {DAY} >= {2 * DAY}
                  THEN gt END)
           OVER (PARTITION BY labels_str ORDER BY gt
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lr
       FROM st),
fs AS (SELECT labels_str, gt,
         (lb IS NOT NULL AND (lr IS NULL OR lb > lr)) AS firing, is_active
       FROM mk
       WHERE (lb IS NOT NULL AND (lr IS NULL OR lb > lr)) OR is_active),
um AS (SELECT DISTINCT labels_str, user_lbl, k_bucket FROM samples)
SELECT '{{{{__name__="ALERTS",alertname="hi_click_keep",alertstate="'
       || CASE WHEN firing THEN 'firing' ELSE 'pending' END || '"'
       || CASE WHEN k_bucket = 'high' THEN ',k_bucket="high"' ELSE '' END
       || ',user="' || user_lbl || '"}}}}' AS labels_str,
       gt AS t, CAST(1.0 AS DOUBLE) AS v
FROM fs JOIN um USING (labels_str)"""
    ),
    "alerting keep_firing_for (rules/alerting.go KeepFiringFor): same "
    "rule as promql_alert_rule plus for=1d / keep_firing_for=2d — once firing, "
    "the alert stays firing through condition gaps, resolving only "
    "after 2d of continuous inactivity; pending alerts still resolve "
    "immediately; reactivation inside the keep window resumes firing "
    "without re-satisfying `for`. Closed form over the dense grid "
    "(firing ⇔ last base promotion > last resolution point), ONE "
    "ordered window per signature — the sequential state machine "
    "without a sequential scan; the oracle replays the identical "
    "window algebra",
)
def promql_alert_keep_firing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tsdb_spark import labels as L
    from tsdb_spark.queries import _store
    from tsdb_spark.rules import AlertRule, alerts_frame

    db = _store(spark, sf_dir, "base")
    frame = alerts_frame(
        db,
        AlertRule(
            "hi_click_keep",
            "sum_over_time(click[1d]) > 60",
            for_ms=DAY,
            keep_firing_ms=2 * DAY,
        ),
        T0 + DAY,
        T0 + 15 * DAY,
        DAY,
    )
    return frame.select(
        L.labels_str_expr("labels").alias("labels_str"), "t", "v"
    )


_AT_END = T0 + 8 * DAY


@register(
    "promql_at_pin",
    _with_prelude(
        f"""
, {_canon_cte("event_type = 'click'")},
{_grid_cte(T0 + DAY, _AT_END, DAY)},
c AS (SELECT labels_str, CAST(count(*) AS DOUBLE) AS value FROM d
      WHERE t > {_AT_END - DAY} AND t <= {_AT_END} GROUP BY 1)
SELECT regexp_replace(c.labels_str, '__name__="[^"]*",', '') AS labels_str,
  g.gt AS t, c.value FROM c CROSS JOIN g"""
    ),
    "PromQL `@` modifier: `count_over_time(click[1d] @ end())` — the "
    "window is pinned to the query end (promql/parser StartOrEnd "
    "resolved against the outermost bounds), so every grid point "
    "carries the same per-series constant. Engine plan: ONE one-point "
    "evaluation broadcast-cross-joined to the (tiny) grid frame — the "
    "step-invariant-expression optimization, never a per-step re-eval",
)
def promql_at_pin(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = eval_range(
        events_samples(spark, sf_dir),
        "count_over_time(click[1d] @ end())",
        T0 + DAY,
        _AT_END,
        DAY,
    )
    return out.select("labels_str", "t", "value")


@register(
    "promql_count_values",
    _with_prelude(
        f"""
, {_canon_cte("event_type IN ('click', 'view')")},
{_grid_cte(T0 + DAY, T0 + 31 * DAY, DAY)},
w AS (SELECT d.labels_str, g.gt, max_by(d.vc, d.t) AS vc
      FROM d JOIN g ON d.t > g.gt - {DAY} AND d.t <= g.gt GROUP BY 1, 2),
r AS (SELECT gt, CAST(CAST(floor(vc / 100.0 + 0.5) AS BIGINT) AS VARCHAR) AS lvl
      FROM w)
SELECT lvl, gt AS t, CAST(count(*) AS DOUBLE) AS value
FROM r GROUP BY 1, 2"""
    ),
    "PromQL `count_values(\"lvl\", round({__name__=~'click|view'}))`: "
    "series count per distinct (rounded) value, the value itself "
    "becoming the `lvl` label (promql/engine.go aggregation "
    "countValues). The instant grid + round run on the exact "
    "centi-unit/floor path shared with the oracle; counting is one "
    "combinable groupBy whose group space is the distinct-value space",
)
def promql_count_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = eval_range(
        events_samples(spark, sf_dir),
        'count_values("lvl", round({__name__=~"click|view"}))',
        T0 + DAY,
        T0 + 31 * DAY,
        DAY,
        lookback_ms=DAY,
    )
    return out.select("lvl", "t", "value")


@register(
    "promql_holt_grid",
    _with_prelude(
        f"""
, {_canon_cte("event_type = 'view'")},
{_grid_cte(T0 + DAY, T0 + 8 * DAY, DAY)},
w AS (SELECT d.labels_str, g.gt, list(d.vc / 100.0 ORDER BY d.t) AS vs
      FROM d JOIN g ON d.t > g.gt - {DAY} AND d.t <= g.gt GROUP BY 1, 2),
f AS (SELECT labels_str, gt, len(vs) AS n,
        list_reduce(
          list_prepend([vs[1], vs[2] - vs[1]],
                       list_transform(vs[2:len(vs)], x -> [x, CAST(0 AS DOUBLE)])),
          (a, x) -> [0.3 * x[1] + 0.7 * (a[1] + a[2]),
                     0.6 * ((0.3 * x[1] + 0.7 * (a[1] + a[2])) - a[1]) + 0.4 * a[2]]
        ) AS sb
      FROM w WHERE len(vs) >= 2)
SELECT {_NONAME} AS labels_str, gt AS t, round(sb[1], 9) AS value FROM f""",
    ),
    "PromQL `holt_winters(view[1d], 0.3, 0.6)` on a daily grid: the "
    "double-exponential-smoothing recurrence as an ORDERED F.aggregate "
    "fold over each (series, T) window's time-sorted samples — "
    "per-group state is the window's points, and the identical "
    "expression tree runs as DuckDB list_reduce so the doubles agree "
    "bit-for-bit (same discipline as tsdb_holt_winters)",
)
def promql_holt_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = eval_range(
        events_samples(spark, sf_dir),
        "holt_winters(view[1d], 0.3, 0.6)",
        T0 + DAY,
        T0 + 8 * DAY,
        DAY,
    )
    return out.select("labels_str", "t", F.round("value", 9).alias("value"))


@register(
    "promql_time_fns",
    _with_prelude(
        f"""
, {_grid_cte(T0 + DAY, T0 + 15 * DAY, 9 * 3_600_000)},
c AS (SELECT gt, make_timestamp(gt * 1000) AS ts FROM g)
SELECT '{{{{}}}}' AS labels_str, gt AS t,
  CAST(hour(ts) + 100 * (dayofweek(ts) % 7) + 10000 * day(ts) AS DOUBLE) AS value
FROM c""",
    ),
    "PromQL calendar functions on the grid: `hour() + 100 * "
    "day_of_week() + 10000 * day_of_month()` at a 9h step (UTC, "
    "upstream funcHour/funcDayOfWeek/funcDayOfMonth over "
    "vector(time())). Engine plan: expressions over the generated grid "
    "frame joined one-to-one on the empty label set — no storage scan "
    "at all; exact integer arithmetic",
)
def promql_time_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = eval_range(
        events_samples(spark, sf_dir),
        "hour() + 100 * day_of_week() + 10000 * day_of_month()",
        T0 + DAY,
        T0 + 15 * DAY,
        9 * 3_600_000,
    )
    return out.select("labels_str", "t", "value")


@register(
    "promql_scalar_ratio",
    _with_prelude(
        f"""
, {_canon_cte("event_type IN ('click', 'view')")},
{_grid_cte(T0 + DAY, T0 + 15 * DAY, DAY)},
w AS (SELECT d.labels_str, g.gt, max_by(d.vc, d.t) AS vc
      FROM d JOIN g ON d.t > g.gt - {DAY} AND d.t <= g.gt GROUP BY 1, 2),
n AS (SELECT gt, CAST(count(*) AS DOUBLE) AS nn FROM w GROUP BY gt),
c AS (SELECT labels_str, gt, vc FROM w
      WHERE labels_str LIKE '%__name__="click"%')
SELECT regexp_replace(c.labels_str, '__name__="[^"]*",', '') AS labels_str,
  c.gt AS t,
  round((c.vc / 100.0) / n.nn, 9) AS value
FROM c JOIN n USING (gt)""",
    ),
    "PromQL dynamic scalar: `click / scalar(count({{__name__=~"
    "'click|view'}}))` at a 1d step — each series divided by the "
    "per-step matching-series count (promql/functions.go funcScalar; "
    "cardinality != 1 would read NaN). Engine plan: the scalar frame "
    "is ONE row per grid step, broadcast into the vector side — never "
    "a shuffle keyed on anything but the grid time. count() keeps the "
    "scalar integer-valued so the single float division is "
    "order-independent across engines",
)
def promql_scalar_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = eval_range(
        events_samples(spark, sf_dir),
        'click / scalar(count({__name__=~"click|view"}))',
        T0 + DAY,
        T0 + 15 * DAY,
        DAY,
        lookback_ms=DAY,
    )
    return out.select("labels_str", "t", F.round("value", 9).alias("value"))


@register(
    "promql_limitk",
    _with_prelude(
        f"""
, {_canon_cte("event_type = 'click'")},
{_grid_cte(T0 + DAY, T0 + 15 * DAY, DAY)},
w AS (SELECT d.labels_str, g.gt, max_by(d.vc, d.t) / 100.0 AS value
      FROM d JOIN g ON d.t > g.gt - {DAY} AND d.t <= g.gt GROUP BY 1, 2),
r AS (SELECT *, row_number() OVER (PARTITION BY gt ORDER BY
        CAST(concat('0x', substr(md5(concat('limitk:', labels_str)), 1, 15)) AS BIGINT),
        labels_str) AS rk
      FROM w)
SELECT labels_str, gt AS t, value FROM r WHERE rk <= 3""",
    ),
    "PromQL `limitk(3, click)` at a 1d step (promql 3.x sampling "
    "aggregation): 3 arbitrary-but-DETERMINISTIC series per step, "
    "selected by the engine's md5-derived identity hash so the SQL "
    "oracle reproduces the exact pick. Engine plan: the same one-window "
    "ranking as topk, ordered by the hash instead of the value",
)
def promql_limitk(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = eval_range(
        events_samples(spark, sf_dir),
        "limitk(3, click)",
        T0 + DAY,
        T0 + 15 * DAY,
        DAY,
        lookback_ms=DAY,
    )
    return out.select("labels_str", "t", "value")


@register(
    "promql_mad_grid",
    _with_prelude(
        f"""
, {_canon_cte("event_type = 'click'")},
{_grid_cte(T0 + DAY, T0 + 15 * DAY, DAY)},
w AS (SELECT d.labels_str, g.gt, d.vc
      FROM d JOIN g ON d.t > g.gt - {DAY} AND d.t <= g.gt),
m AS (SELECT labels_str, gt, quantile_cont(vc, 0.5) AS med
      FROM w GROUP BY 1, 2)
SELECT regexp_replace(w.labels_str, '__name__="[^"]*",', '') AS labels_str,
  w.gt AS t,
  quantile_cont(abs(w.vc - m.med), 0.5) / 100.0 AS value
FROM w JOIN m USING (labels_str, gt)
GROUP BY w.labels_str, w.gt, m.med""",
    ),
    "PromQL `mad_over_time(click[1d])` daily: median absolute "
    "deviation per window. Median and deviation-median both run on "
    "exact centi-unit integers/halves (magnitudes « 2^53, so the "
    "rank-interpolation arithmetic is EXACT and op-order-independent "
    "across engines — no rounding needed). Engine: one combinable "
    "percentile + one sorted deviation array per (series, T)",
)
def promql_mad_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = eval_range(
        events_samples(spark, sf_dir),
        "mad_over_time(click[1d])",
        T0 + DAY,
        T0 + 15 * DAY,
        DAY,
    )
    return out.select("labels_str", "t", "value")


@register(
    "promql_ts_of_max",
    _with_prelude(
        f"""
, {_canon_cte("event_type = 'click'")},
{_grid_cte(T0 + DAY, T0 + 15 * DAY, DAY)},
w AS (SELECT d.labels_str, g.gt, d.t, d.vc
      FROM d JOIN g ON d.t > g.gt - {DAY} AND d.t <= g.gt),
mx AS (SELECT labels_str, gt, max(vc) AS m FROM w GROUP BY 1, 2)
SELECT regexp_replace(w.labels_str, '__name__="[^"]*",', '') AS labels_str,
  w.gt AS t, max(w.t) / 1000.0 AS value
FROM w JOIN mx ON w.labels_str = mx.labels_str AND w.gt = mx.gt
              AND w.vc = mx.m
GROUP BY 1, 2""",
    ),
    "PromQL `ts_of_max_over_time(click[1d])` daily: the unix-seconds "
    "timestamp of each window's maximum sample, ties to the LATEST "
    "timestamp (engine: one max_by over a (vc, t) struct — "
    "deterministic; oracle: max then latest-t join-back). Exact "
    "integer comparisons end to end",
)
def promql_ts_of_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = eval_range(
        events_samples(spark, sf_dir),
        "ts_of_max_over_time(click[1d])",
        T0 + DAY,
        T0 + 15 * DAY,
        DAY,
    )
    return out.select("labels_str", "t", "value")


@register(
    "promql_group_left_include",
    _with_prelude(
        f"""
, {_grid_cte(T0 + DAY, T0 + 15 * DAY, DAY)},
cc AS (SELECT user_lbl, k_bucket, t, CAST(round(min(v) * 100) AS BIGINT) AS vc
       FROM samples WHERE event_type = 'click' GROUP BY 1, 2, 3),
vv AS (SELECT labels_str, user_lbl, t, CAST(round(min(v) * 100) AS BIGINT) AS vc
       FROM samples WHERE event_type = 'view' GROUP BY 1, 2, 3),
lw AS (SELECT cc.user_lbl, cc.k_bucket, g.gt, max_by(cc.vc, cc.t) AS c
       FROM cc JOIN g ON cc.t > g.gt - {DAY} AND cc.t <= g.gt
       GROUP BY 1, 2, 3),
-- instant value per view SERIES, then max by (user) across the user's
-- (possibly two: k_bucket split) series — the grouped one side
iv AS (SELECT vv.labels_str, vv.user_lbl, g.gt, max_by(vv.vc, vv.t) AS v
       FROM vv JOIN g ON vv.t > g.gt - {DAY} AND vv.t <= g.gt
       GROUP BY 1, 2, 3),
rw AS (SELECT user_lbl, gt, max(v) AS v FROM iv GROUP BY 1, 2)
SELECT '{{{{' || CASE WHEN lw.k_bucket = 'high' THEN 'k_bucket="high",' ELSE '' END
       || 'src="viewside",user="' || lw.user_lbl || '"}}}}' AS labels_str,
  lw.gt AS t,
  round((CAST(lw.c AS DOUBLE) / 100.0) + (CAST(rw.v AS DOUBLE) / 100.0), 9)
    AS value
FROM lw JOIN rw ON rw.user_lbl = lw.user_lbl AND rw.gt = lw.gt"""
    ),
    "PromQL many-to-one vector matching with INCLUDE labels: `click + "
    "on(user) group_left(src) label_replace(max by (user) (view), "
    "\"src\", \"viewside\", \"\", \"\")` at a 1d step — the many side "
    "keeps its label set minus __name__ and the listed `src` label is "
    "COPIED from the one side (promql/engine.go resultMetric include "
    "handling); the one side aggregates per user first (a user's view "
    "series can split on k_bucket, which on(user) alone would reject "
    "as many-to-many, as upstream does). Engine plan: one signature equi-join per step with a "
    "uniqueness window guard on the one side — never a cartesian; the "
    "include labels ride the join as one map column. Values are "
    "centi-unit doubles added once, bit-exact across engines",
)
def promql_group_left_include(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = eval_range(
        events_samples(spark, sf_dir),
        'click + on(user) group_left(src) '
        'label_replace(max by (user) (view), "src", "viewside", "", "")',
        T0 + DAY,
        T0 + 15 * DAY,
        DAY,
        lookback_ms=DAY,
    )
    return out.select("labels_str", "t", F.round("value", 9).alias("value"))
