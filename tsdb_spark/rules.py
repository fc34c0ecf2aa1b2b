"""Recording rules: named PromQL expressions materialized back into a
store as first-class series — the rules engine of the Prometheus
ecosystem built directly on the range evaluator, closing the
storage → evaluator → storage loop.

Reference anchor: recording rules live ABOVE this library in
prometheus/prometheus (rules/manager.go, rules/recording.go), where the
manager evaluates each rule as an instant query every interval and
appends the result vector through the same Appender interface this
engine's `DB.append` re-implements (db.go:93-112). Here a rule
evaluates as ONE bounded-fan-out range query over [start, end] and
lands with ONE batch append — the whole backfill is two shuffles plus
the append, never a per-step evaluation loop.

Semantics matched to rules/recording.go Eval:
- the result series get `__name__` = the rule name;
- static rule labels are attached and OVERRIDE result labels of the
  same name;
- the recorded series are immediately selectable through the normal
  matcher path, and further rules (or queries) can read them back —
  `job:x:rate5m`-style layering works exactly like upstream.

Re-recording an already-recorded window lands on the store's amend
policy (first-wins with order_col, else deterministic min) — record
disjoint windows, or use a step-aligned `start` to make the operation
idempotent (identical values amend to themselves harmlessly).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tsdb_spark import labels as L
from tsdb_spark.promql import DEFAULT_LOOKBACK_MS, _grid_explode, eval_range_db


@dataclass(frozen=True)
class Rule:
    """One recording rule: `name: expr` plus optional static labels."""

    name: str
    expr: str
    labels: tuple[tuple[str, str], ...] = ()


def rule_frame(
    db,
    rule: Rule,
    start: int,
    end: int,
    step: int,
    lookback_ms: int = DEFAULT_LOOKBACK_MS,
) -> DataFrame:
    """Evaluate one rule over [start, end] at `step` and shape the
    result as append-ready rows(labels MAP, t LONG, v DOUBLE).

    Works for both evaluator output shapes: label-carrying vectors
    (selector/function results — `__name__` replaced by the rule name)
    and grouped aggregates (`sum by (k)` — the key columns become the
    label set)."""
    out = eval_range_db(db, rule.expr, start, end, step, lookback_ms)
    if "labels" in out.columns:
        m = F.map_filter(F.col("labels"), lambda k, _: k != F.lit("__name__"))
    else:
        keys = [c for c in out.columns if c not in ("t", "value", "labels_str")]
        kv = [x for k in keys for x in (F.lit(k), F.col(k).cast("string"))]
        m = (
            F.create_map(*kv)
            if kv
            else F.create_map().cast("map<string,string>")
        )
    override = F.array(
        F.lit("__name__"), *[F.lit(k) for k, _ in rule.labels]
    )
    statics = [x for k, v in rule.labels for x in (F.lit(k), F.lit(v))]
    lab = F.map_concat(
        F.map_filter(m, lambda k, _: ~F.array_contains(override, k)),
        F.create_map(F.lit("__name__"), F.lit(rule.name), *statics),
    )
    return out.select(
        lab.alias("labels"), F.col("t"), F.col("value").alias("v")
    ).filter(F.col("v").isNotNull())


@dataclass(frozen=True)
class AlertRule:
    """One alerting rule: fire when `expr` has results, with the
    upstream pending→firing state machine (`for_ms` of continuous
    activity promotes pending to firing; `keep_firing_ms` keeps a
    firing alert in firing state through condition gaps shorter than
    the window — rules/alerting.go KeepFiringFor)."""

    name: str
    expr: str
    for_ms: int = 0
    keep_firing_ms: int = 0
    labels: tuple[tuple[str, str], ...] = ()
    #: static annotation strings (rules/alerting.go Annotations). Plain
    #: values only — upstream's Go template rendering ({{ $labels.x }})
    #: is out of scope; templates pass through verbatim.
    annotations: tuple[tuple[str, str], ...] = ()


def alerts_frame(
    db,
    rule: AlertRule,
    start: int,
    end: int,
    step: int,
    lookback_ms: int = DEFAULT_LOOKBACK_MS,
) -> DataFrame:
    """Evaluate one alert rule over the grid and emit the upstream
    `ALERTS{alertname, alertstate, ...}` synthetic series (value 1 at
    every active point — rules/alerting.go Eval + sample()).

    States at grid point T (active ⇔ the expr returned a result at T):
    FIRING when the expr was active at every grid point of [T-for, T]
    (for_ms // step + 1 consecutive points — the grid-resolution
    reading of upstream's continuous `for` clock), else PENDING.
    Alert labels = the expr's result labels minus __name__, plus the
    static rule labels (overriding), plus alertname/alertstate.

    Plan shape: the expr's own bounded fan-out, then each active point
    fans out to the ≤ for/step + 1 later grid points whose `for` window
    it supports, and ONE combinable groupBy((series, T)) counts them —
    the same two-shuffle skeleton as every window function."""
    out = eval_range_db(db, rule.expr, start, end, step, lookback_ms)
    if "labels" in out.columns:
        m = F.map_filter(F.col("labels"), lambda k, _: k != F.lit("__name__"))
    else:
        keys = [c for c in out.columns if c not in ("t", "value", "labels_str")]
        kv = [x for k in keys for x in (F.lit(k), F.col(k).cast("string"))]
        m = (
            F.create_map(*kv)
            if kv
            else F.create_map().cast("map<string,string>")
        )
    pts = out.select(
        L.labels_str_expr(m).alias("labels_str"), m.alias("labels"), "t"
    )
    # fan each active point p to the alert evaluations T ∈ [p, p+for]
    # it supports (reach for_ms + 1 ⇒ half-open [p, p+for+1) — equal on
    # the grid); count == the full window ⇒ the activity was continuous
    need = rule.for_ms // step + 1
    cells = _grid_explode(pts, start, end, step, rule.for_ms + 1)
    agg = cells.groupBy("labels_str", "_pq_t").agg(
        F.first("labels").alias("labels"),
        F.count("*").alias("n"),
        F.max("t").alias("last_active"),
    )
    # an alert exists at T only if the expr is active AT T
    active = agg.filter(F.col("last_active") == F.col("_pq_t"))
    state = F.when(F.col("n") >= need, "firing").otherwise("pending")
    if rule.keep_firing_ms > 0:
        active, state = _apply_keep_firing(
            active, rule, start, end, step, need
        )
    reserved = F.array(
        F.lit("alertname"),
        F.lit("alertstate"),
        *[F.lit(k) for k, _ in rule.labels],
    )
    statics = [x for k, v in rule.labels for x in (F.lit(k), F.lit(v))]
    lab = F.map_concat(
        F.map_filter(
            F.col("labels"), lambda k, _: ~F.array_contains(reserved, k)
        ),
        F.create_map(
            F.lit("__name__"), F.lit("ALERTS"),
            F.lit("alertname"), F.lit(rule.name),
            F.lit("alertstate"), state,
            *statics,
        ),
    )
    return active.select(
        lab.alias("labels"),
        F.col("_pq_t").alias("t"),
        F.lit(1.0).alias("v"),
    )


def _apply_keep_firing(
    active: DataFrame, rule: AlertRule, start: int, end: int, step: int, need: int
):
    """keep_firing_for (rules/alerting.go KeepFiringFor): once FIRING,
    the alert stays firing through condition gaps, resolving only when
    keep_firing_ms has elapsed since the first missing evaluation;
    pending alerts still resolve immediately; a reactivation inside the
    keep window resumes firing without re-satisfying `for`.

    Closed form over the dense per-signature grid (ordered window per
    signature — series x grid rows, one shuffle):
      base(T)   = active(T) AND n(T) >= need       (normal promotion)
      res(T)    = inactive(T) AND T - last_active(T) - step >= keep
                  (first missing eval is last_active + step — the
                  keepFiringSince clock)
      firing(T) = last_base(T) exists AND last_base(T) > last_res(T)
    which reproduces the sequential state machine: firing persists
    until a resolution point, and only a fresh base re-arms it after.

    Returns (rows, state_col): rows carries every grid point where an
    alert exists (active → pending/firing; inactive-but-kept → firing).
    """
    from pyspark.sql import Window

    spark = active.sparkSession
    npts = (end - start) // step
    grid = spark.range(int(npts) + 1).select(
        (F.lit(start) + F.col("id") * step).cast("long").alias("_pq_t")
    )
    sigs = active.groupBy("labels_str").agg(F.first("labels").alias("labels"))
    # list-form join: merges the key columns, immune to the shared-
    # lineage attribute ambiguity (sigs and acts both derive from
    # `active`, so dataframe-qualified refs can resolve to one attribute)
    acts = active.select("labels_str", "_pq_t", F.col("n").alias("_n"))
    dense = sigs.crossJoin(F.broadcast(grid)).join(
        acts, ["labels_str", "_pq_t"], "left"
    )
    w = (
        Window.partitionBy("labels_str")
        .orderBy("_pq_t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_active = F.col("_n").isNotNull()
    gt = F.col("_pq_t")
    # two window stages (a window result may not feed another window fn
    # in the same projection); both run on the SAME (labels_str, _pq_t)
    # partitioning+ordering, so Catalyst plans one shuffle+sort
    staged = dense.select(
        "labels_str",
        "labels",
        "_pq_t",
        is_active.alias("_is_active"),
        (is_active & (F.col("_n") >= need)).alias("_base"),
        F.max(F.when(is_active, gt)).over(w).alias("_last_active"),
    )
    res = (~F.col("_is_active")) & (
        gt - F.col("_last_active") - step >= F.lit(rule.keep_firing_ms)
    )
    marked = staged.select(
        "labels_str",
        "labels",
        "_pq_t",
        "_is_active",
        F.max(F.when(F.col("_base"), gt)).over(w).alias("_last_base"),
        F.max(F.when(res, gt)).over(w).alias("_last_res"),
    )
    firing = F.col("_last_base").isNotNull() & (
        F.col("_last_res").isNull()
        | (F.col("_last_base") > F.col("_last_res"))
    )
    rows = marked.filter(firing | F.col("_is_active")).withColumn(
        "_firing", firing
    )
    state = F.when(F.col("_firing"), "firing").otherwise("pending")
    return rows, state


def record(
    db,
    rules: list[Rule],
    start: int,
    end: int,
    step: int,
    dst=None,
    lookback_ms: int = DEFAULT_LOOKBACK_MS,
    report: bool = False,
) -> dict[str, "object"]:
    """Evaluate every rule against `db` and append the results to `dst`
    (default: back into `db` itself, the upstream arrangement).

    Rules are recorded in list order, so a later rule may read an
    earlier rule's output — upstream evaluates a rule group
    sequentially for the same reason (rules/manager.go group eval).
    Returns {rule name: AppendReport}; `report=True` pays one count job
    per rule to fill AppendReport.appended (backfill accounting)."""
    dst = dst if dst is not None else db
    reports: dict[str, object] = {}
    for rule in rules:
        frame = rule_frame(db, rule, start, end, step, lookback_ms)
        reports[rule.name] = dst.append(frame, report=report)
    return reports


def record_alerts(
    db,
    rules: list[AlertRule],
    start: int,
    end: int,
    step: int,
    dst=None,
    lookback_ms: int = DEFAULT_LOOKBACK_MS,
    append_from: int | None = None,
) -> dict[str, "object"]:
    """Evaluate every alert rule and append its ALERTS series to `dst`
    (default: back into `db`, where it is selectable like any series —
    the upstream arrangement for alert state history).

    `append_from` keeps only grid points >= it in the APPENDED frame:
    the state machine needs for+keep_firing of grid history BEFORE the
    first new tick to compute its state correctly, but those earlier
    points were already committed by previous ticks — re-appending
    them every tick would bloat the store with duplicate rows (the
    Manager's steady-state incremental evaluation).

    All rules land in ONE append: alert frames share a schema, every
    rule's ALERTS series is distinct (alertname label), and alert
    rules don't chain off each other's same-tick output — unlike
    recording rules, which stay sequential in `record` for the
    chained-rule pattern. Upstream commits per rule too, but its
    appends are in-memory head inserts; here each commit is a Spark
    job, so a 50-alert group must cost one commit per tick, not 50.
    Returns the shared AppendReport under every rule name."""
    dst = dst if dst is not None else db
    frames = []
    for rule in rules:
        frame = alerts_frame(db, rule, start, end, step, lookback_ms)
        if append_from is not None:
            frame = frame.filter(F.col("t") >= append_from)
        frames.append(frame)
    if not frames:
        return {}
    u = frames[0]
    for f in frames[1:]:
        u = u.unionByName(f)
    rep = dst.append(u)
    return {rule.name: rep for rule in rules}
