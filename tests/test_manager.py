"""Manager (manager.py — rules/manager.go as a deterministic tick):
aligned-interval scheduling, catch-up over missed grid points, and
recorded/ALERTS series landing in the store via the production
operators."""

from pyspark.sql import functions as F

from tsdb_spark import labels as L
from tsdb_spark.db import DB
from tsdb_spark.manager import Manager
from tsdb_spark.rules import AlertRule, Rule

WIDTH = 3_600_000
MIN = 60_000


def _mkstore(spark, tmp_path):
    rows = [({"__name__": "req", "job": "api"}, i * MIN, float(10 * i))
            for i in range(11)]
    db = DB.create(spark, str(tmp_path / "mgr_db"), block_width_ms=WIDTH)
    db.append(spark.createDataFrame(
        rows, "labels MAP<STRING,STRING>, t LONG, v DOUBLE"))
    return db


def _groups():
    return [{
        "name": "g",
        "interval_ms": MIN,
        "rules": [
            Rule("job:req:sum5m", "sum by (job) (sum_over_time(req[5m]))"),
            AlertRule("HighReq", "req > 45", for_ms=2 * MIN,
                      labels=(("sev", "p1"),)),
        ],
    }]


def test_ticks_align_and_dedupe(spark, tmp_path):
    db = _mkstore(spark, tmp_path)
    mgr = Manager(db, _groups())
    # two calls inside the same interval: second is a no-op
    assert mgr.run_pending(5 * MIN + 7) == {"g": 5 * MIN}
    assert mgr.run_pending(5 * MIN + 900) == {}
    rec = {
        r["t"]: r["v"]
        for r in db.querier(0, 10**9)
        .select([L.eq("__name__", "job:req:sum5m")]).collect()
    }
    # first run evaluates its own tick only; the closed [t-5m, t]
    # window at 5m holds v=0..50 -> 150
    assert rec == {5 * MIN: 150.0}


def test_catchup_covers_missed_grid_points(spark, tmp_path):
    db = _mkstore(spark, tmp_path)
    mgr = Manager(db, _groups())
    mgr.run_pending(5 * MIN)
    # jump 3 intervals: ticks 6,7,8 all land in one range evaluation
    assert mgr.run_pending(8 * MIN + 10) == {"g": 8 * MIN}
    rec = sorted(
        r["t"] // MIN
        for r in db.querier(0, 10**9)
        .select([L.eq("__name__", "job:req:sum5m")]).collect()
    )
    assert rec == [5, 6, 7, 8]


def test_alert_state_machine_lands(spark, tmp_path):
    db = _mkstore(spark, tmp_path)
    mgr = Manager(db, _groups())
    mgr.run_pending(10 * MIN)
    alerts = {
        (r["labels"]["alertstate"], r["t"] // MIN)
        for r in db.querier(0, 10**9)
        .select([L.eq("__name__", "ALERTS"), L.eq("alertname", "HighReq")])
        .collect()
    }
    # req > 45 active from t=5m (v=50); for=2m ⇒ firing from 7m
    assert ("pending", 5) in alerts and ("pending", 6) in alerts
    assert ("firing", 7) in alerts and ("firing", 10) in alerts
    assert ("firing", 6) not in alerts
    # alert labels carry the static rule label
    (row,) = db.querier(7 * MIN, 7 * MIN).select(
        [L.eq("__name__", "ALERTS"), L.eq("alertstate", "firing")]
    ).collect()
    assert row["labels"]["sev"] == "p1" and row["labels"]["job"] == "api"


def test_reticks_are_idempotent(spark, tmp_path):
    db = _mkstore(spark, tmp_path)
    mgr = Manager(db, _groups())
    mgr.run_pending(6 * MIN)
    n1 = db.querier(0, 10**9).select([L.eq("__name__", "ALERTS")]).count()
    # a NEW manager (restart) re-runs overlapping history; identical
    # rows collapse under the store's read-time dedup
    mgr2 = Manager(db, _groups())
    mgr2.run_pending(6 * MIN)
    n2 = db.querier(0, 10**9).select([L.eq("__name__", "ALERTS")]).count()
    assert n1 == n2


def test_steady_state_ticks_evaluate_incrementally(spark, tmp_path):
    """After the first tick's history backfill, each tick evaluates
    only [last+interval - (for+keep_firing), tick] and APPENDS only the
    new grid points — the serve-mode soak (SCALE.md r10) showed the
    pre-r10 full-history re-evaluation dominating tick latency and the
    store append lock. State across the window edge must stay correct:
    an alert firing before the tick keeps firing through it."""
    db = _mkstore(spark, tmp_path)
    mgr = Manager(db, _groups())
    mgr.run_pending(9 * MIN)

    def alerts_rows():
        return [
            (r["labels"]["alertstate"], r["t"] // MIN)
            for r in db.querier(0, 10**9)
            .select([L.eq("__name__", "ALERTS"),
                     L.eq("alertname", "HighReq")])
            .collect()
        ]

    before = alerts_rows()
    assert ("firing", 9) in before
    # steady-state tick: one new grid point, state machine window
    # reaches back across the edge (activity 5m.. + for=2m ⇒ firing)
    mgr.run_pending(10 * MIN)
    after = alerts_rows()
    assert ("firing", 10) in after
    # no duplicate re-appends of already-committed points: exactly one
    # new row landed
    assert len(after) == len(before) + 1
    assert sorted(after) == sorted(before + [("firing", 10)])
