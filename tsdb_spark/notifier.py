"""Alertmanager notification sending (upstream notifier/notifier.go +
the Alertmanager api/v2 JSON schema — both public): the piece that
turns evaluated alert state into pages.

`Notifier` keeps the active-alert registry (alert identity = its full
label set) and POSTs the api/v2 payload to every configured
Alertmanager:

    [{"labels": {...}, "annotations": {...},
      "startsAt": RFC3339, "endsAt": RFC3339, "generatorURL": ...}]

Semantics per upstream:
- a FIRING alert sends startsAt = when this notifier first saw it
  firing and endsAt = now + 4 × the evaluation interval (the
  ResendDelay-derived validity window — if the rule stops being
  evaluated, the alert expires at the Alertmanager rather than firing
  forever);
- an alert that STOPS firing sends one RESOLVED notification
  (endsAt = now) and leaves the registry;
- delivery is best-effort per Alertmanager (one failing AM doesn't
  block the others — upstream fans out the same way); failures are
  counted, not raised.

Driver-side by nature (alert sets are human-scale; the EVALUATION that
feeds this is the distributed part)."""

from __future__ import annotations

import json
import urllib.request
from datetime import datetime, timezone

__all__ = ["Notifier"]


def _rfc3339(ms: int) -> str:
    return (
        datetime.fromtimestamp(ms / 1000.0, tz=timezone.utc)
        .isoformat()
        .replace("+00:00", "Z")
    )


class Notifier:
    def __init__(
        self,
        urls: list[str],
        timeout_s: float = 10.0,
        generator_url: str = "",
        external_labels: dict[str, str] | None = None,
        alert_relabel: list | None = None,
        spark=None,
        http_configs: dict | None = None,
    ) -> None:
        self.urls = [u.rstrip("/") for u in urls]
        #: per-Alertmanager-URL httpauth.HTTPClientConfig (the
        #: alertmanagers block's basic_auth / authorization /
        #: tls_config — notifier.go builds one HTTP client per AM set)
        self.http_configs = dict(http_configs or {})
        self.timeout_s = timeout_s
        self.generator_url = generator_url
        self.external_labels = dict(external_labels or {})
        #: alerting.alert_relabel_configs (notifier.go relabelAlerts):
        #: applied AFTER external_labels attach; a dropped label set
        #: silences the alert. Needs `spark` (the rule chain runs on
        #: the same Column engine as metric relabeling).
        self.alert_relabel = list(alert_relabel or [])
        self.spark = spark
        #: label-set key → {"starts": first-seen-firing ms,
        #: "annotations": last-seen annotations} — annotations ride
        #: along so the RESOLVED notification carries them too
        #: (upstream keeps the whole alert in memory and sends its
        #: annotations on resolve, notifier.go Alert)
        self.active: dict[tuple, dict] = {}
        self.send_errors = 0

    # ---------------- state machine ----------------

    def notify(
        self, firing: list[dict], now_ms: int, interval_ms: int = 60_000
    ) -> int:
        """Reconcile the currently-firing alert list (each item:
        {"labels": {...}, "annotations": {...}}) against the active
        registry and send the resulting notifications. Returns the
        number of alert payload entries sent."""
        batch = []
        seen: set[tuple] = set()
        labelsets = [
            {**self.external_labels, **a["labels"]} for a in firing
        ]
        if self.alert_relabel and labelsets:
            from tsdb_spark.relabel import relabel_labelsets

            relabeled = relabel_labelsets(
                self.spark, labelsets, self.alert_relabel
            )
            firing = [
                a for a, lab in zip(firing, relabeled) if lab is not None
            ]
            labelsets = [lab for lab in relabeled if lab is not None]
        for a, labels in zip(firing, labelsets):
            key = tuple(sorted(labels.items()))
            seen.add(key)
            annotations = dict(a.get("annotations", {}))
            entry = self.active.setdefault(
                key, {"starts": now_ms, "annotations": annotations}
            )
            entry["annotations"] = annotations  # keep last-seen fresh
            batch.append(
                {
                    "labels": labels,
                    "annotations": annotations,
                    "startsAt": _rfc3339(entry["starts"]),
                    # validity window: 4 evaluation intervals, like
                    # upstream's ResendDelay-based EndsAt
                    "endsAt": _rfc3339(now_ms + 4 * interval_ms),
                    "generatorURL": self.generator_url,
                }
            )
        for key in list(self.active):
            if key not in seen:
                entry = self.active.pop(key)
                batch.append(
                    {
                        "labels": dict(key),
                        # upstream sends the alert's annotations on
                        # resolve too (the Alertmanager templates them
                        # into the resolved page)
                        "annotations": dict(entry["annotations"]),
                        "startsAt": _rfc3339(entry["starts"]),
                        "endsAt": _rfc3339(now_ms),  # resolved
                        "generatorURL": self.generator_url,
                    }
                )
        if batch:
            self._post(batch)
        return len(batch)

    # ---------------- transport ----------------

    def _post(self, batch: list[dict]) -> None:
        body = json.dumps(batch).encode()
        for url in self.urls:
            hc = self.http_configs.get(url)
            req = urllib.request.Request(
                f"{url}/api/v2/alerts",
                data=body,
                headers={"Content-Type": "application/json",
                         **(hc.headers() if hc else {})},
            )
            try:
                with urllib.request.urlopen(
                    req, timeout=self.timeout_s,
                    context=hc.ssl_context() if hc else None,
                ) as r:
                    if not 200 <= r.status < 300:
                        self.send_errors += 1
            except OSError:
                self.send_errors += 1
