"""The manager layer: scheduled rule evaluation + scrape passes over a
live store — rules/manager.go and the scrape manager, the last piece
that turns `serve` into a self-contained Prometheus-shaped process
(scrape → store → rules → query API on one store).

Design: `Manager.run_pending(now_ms)` is a DETERMINISTIC tick — it
evaluates whatever is due at `now_ms` and returns what it did, so tests
drive it with a synthetic clock and the CLI drives it with the wall
clock from a background thread. Each due rule group evaluates as ONE
bounded range query over the grid points missed since its last tick
(catch-up included, upstream's missed-evaluation semantics collapse to
the same batch), recording rules land via `rules.record` (one append)
and alert rules via `rules.record_alerts` (the ALERTS state-machine
series), exactly the production operators — the manager is only a
scheduler.
"""

from __future__ import annotations

import threading
import time as _time
from dataclasses import dataclass, field

from tsdb_spark.rules import AlertRule, Rule, record, record_alerts


@dataclass
class Manager:
    """Evaluates rule groups on their intervals against one DB.

    groups: the api.rules_payload shape — {"name", "interval_ms",
    "rules": [Rule | AlertRule]} (promtool.load_rule_file output).
    Alert evaluation needs a grid HISTORY for the for/keep_firing state
    machine, so each tick evaluates the alert over
    [tick - history_ms, tick] and appends only the rows newer than the
    last committed tick (idempotent under the store's amend policy).
    """

    db: "object"
    groups: list[dict]
    history_ms: int = 24 * 3600 * 1000
    #: optional notifier.Notifier — after a tick evaluates alert rules,
    #: the group's FIRING set at that tick reconciles through it
    #: (firing → Alertmanager api/v2, disappeared → resolved)
    notifier: "object" = None
    _last_tick: dict[str, int] = field(default_factory=dict)

    def due(self, now_ms: int) -> list[dict]:
        out = []
        for g in self.groups:
            interval = g.get("interval_ms", 60_000)
            tick = (now_ms // interval) * interval
            if self._last_tick.get(g.get("name", "")) != tick:
                out.append(g)
        return out

    def run_pending(self, now_ms: int) -> dict[str, int]:
        """Evaluate every due group at its aligned tick. Returns
        {group_name: tick_ms} for the groups that ran."""
        ran: dict[str, int] = {}
        for g in self.due(now_ms):
            name = g.get("name", "")
            interval = g.get("interval_ms", 60_000)
            tick = (now_ms // interval) * interval
            last = self._last_tick.get(name)
            # catch up every missed grid point since the last tick (or
            # just this tick on the first run) as ONE range evaluation
            start = tick if last is None else min(last + interval, tick)
            recs = [r for r in g.get("rules", []) if isinstance(r, Rule)]
            alerts = [r for r in g.get("rules", []) if isinstance(r, AlertRule)]
            if recs:
                record(self.db, recs, start, tick, interval)
            if alerts:
                if last is None:
                    # first tick: back-fill the alert state history so
                    # /api/v1/alerts and ALERTS selects have a past
                    record_alerts(
                        self.db, alerts,
                        max(0, start - self.history_ms), tick, interval,
                    )
                else:
                    # steady state: the for/keep_firing state machine
                    # at `start` reaches back exactly for+keep_firing,
                    # so the grid EVALUATES from start - reach but only
                    # the new ticks APPEND — re-running the full
                    # history_ms every tick (the pre-r10 behavior) made
                    # a 2s-interval group re-evaluate a 24h grid per
                    # tick, the dominant latency AND append-lock holder
                    # in the serve-mode soak (SCALE.md r10)
                    reach = max(
                        (r.for_ms + r.keep_firing_ms for r in alerts),
                        default=0,
                    )
                    reach = -(-reach // interval) * interval  # grid-align
                    record_alerts(
                        self.db, alerts,
                        max(0, start - min(self.history_ms, reach)),
                        tick, interval, append_from=start,
                    )
                if self.notifier is not None:
                    self._notify(g, tick, interval)
            self._last_tick[name] = tick
            ran[name] = tick
        return ran

    def _notify(self, group: dict, tick: int, interval: int) -> None:
        """Send the group's firing alerts at `tick` through the
        notifier (notifier.go sendAlerts: firing + newly-resolved)."""
        from tsdb_spark.api import alerts_payload

        payload = alerts_payload(self.db, [group], tick)
        firing = [
            {"labels": a["labels"], "annotations": a["annotations"]}
            for a in payload["data"]["alerts"]
            if a["state"] == "firing"
        ]
        self.notifier.notify(firing, tick, interval)

    def loop(self, stop: threading.Event, poll_s: float = 1.0) -> None:
        """Wall-clock loop for the CLI: run pending ticks until `stop`
        is set. Poll granularity only bounds tick LATENCY — evaluation
        times come from the aligned grid, so a slow poll never skips or
        shifts a tick, it just lands it late (and catch-up covers any
        missed points)."""
        while not stop.is_set():
            self.run_pending(int(_time.time() * 1000))
            stop.wait(poll_s)
