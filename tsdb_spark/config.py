"""The full prometheus.yml configuration surface (config/config.go) —
the one file a real deployment writes, wiring all five top-level
blocks into this engine's single-process mode:

    global:           scrape_interval / evaluation_interval /
                      external_labels
    scrape_configs:   scrape.scrape_jobs_from (static + file SD,
                      relabeling)
    rule_files:       globs, relative to the config file, loaded via
                      promtool.load_rule_file; groups without their own
                      interval inherit evaluation_interval
    alerting:         alertmanagers static_configs → notifier URLs
    remote_write:     forwarding endpoints (v1 WriteRequest or rw2 by
                      protobuf_message), drained by RemoteWriteForwarder

`serve --config prometheus.yml` uses load_config + the two loops here
(scrape_scheduler_loop, RemoteWriteForwarder) so no other flags are
needed; external_labels flow into /federate (api.federate) and into
outgoing alert notifications (notifier.Notifier), like upstream.

Scale notes: config parsing and scheduling are driver-side by nature
(human-scale objects); every data movement they trigger — scrape
appends, rule evaluations, forwarded batches — runs through the same
distributed operators the CLI commands use. The forwarder tails the
store by `ingest_seq` (the engine's WAL-position analog), so forwarded
data is everything APPENDED since the last push — including backfills
into old time ranges, which a time-watermark tail would silently skip.
"""

from __future__ import annotations

import os
import threading
import time
from dataclasses import dataclass, field

from tsdb_spark.scrape import ScrapeJob, scrape_jobs_from

__all__ = [
    "PrometheusConfig",
    "RemoteWriteConfig",
    "load_config",
    "scrape_scheduler_loop",
    "RemoteWriteForwarder",
]

#: upstream config defaults (config.go DefaultGlobalConfig)
DEFAULT_SCRAPE_INTERVAL_MS = 60_000
DEFAULT_EVAL_INTERVAL_MS = 60_000

RW2_MESSAGE = "io.prometheus.write.v2.Request"


@dataclass(frozen=True)
class RemoteWriteConfig:
    """One `remote_write:` entry (the subset this engine forwards):
    url + protobuf_message selecting the wire version (config.go
    RemoteWriteConfig; "prometheus.WriteRequest" = v1, the default —
    "io.prometheus.write.v2.Request" = rw2 with native histograms,
    exemplars and metadata) + write_relabel_configs applied to EVERY
    outgoing series — floats, histograms, exemplars — after
    external_labels attach, like upstream's queueManager."""

    url: str
    protobuf_message: str = "prometheus.WriteRequest"
    write_relabel: tuple = ()
    #: httpauth.HTTPClientConfig for the POSTs (basic_auth /
    #: authorization / tls_config on the remote_write block)
    http_config: object = None

    @property
    def v2(self) -> bool:
        return self.protobuf_message == RW2_MESSAGE


@dataclass
class PrometheusConfig:
    scrape_interval_ms: int = DEFAULT_SCRAPE_INTERVAL_MS
    evaluation_interval_ms: int = DEFAULT_EVAL_INTERVAL_MS
    external_labels: dict[str, str] = field(default_factory=dict)
    scrape_jobs: list[ScrapeJob] = field(default_factory=list)
    rule_files: list[str] = field(default_factory=list)
    rule_groups: list[dict] = field(default_factory=list)
    alertmanager_urls: list[str] = field(default_factory=list)
    #: alerting.alert_relabel_configs — applied to every outgoing alert
    #: AFTER external_labels attach (notifier.go relabelAlerts)
    alert_relabel: list = field(default_factory=list)
    #: per-Alertmanager-URL httpauth.HTTPClientConfig (alertmanagers
    #: blocks may each carry their own basic_auth / authorization)
    alertmanager_http: dict = field(default_factory=dict)
    remote_writes: list[RemoteWriteConfig] = field(default_factory=list)
    #: remote_read: endpoints — queries fan out to these and merge
    #: local-wins (remoteread.ReadThroughDB; config.go RemoteReadConfig)
    remote_reads: list = field(default_factory=list)
    #: otlp.convert_histograms_to_nhcb — explicit-bounds OTLP
    #: histograms ingest as NHCB native samples instead of classic
    #: _bucket series
    otlp_nhcb: bool = False
    #: the raw file text, served verbatim at /api/v1/status/config
    raw_yaml: str = ""
    path: str = ""


def _duration_ms(v, default_ms: int) -> int:
    from tsdb_spark.promql import parse_duration

    if v is None:
        return default_ms
    return parse_duration(v) if isinstance(v, str) else int(v)


def load_config(spark, path: str) -> PrometheusConfig:
    """Parse a full prometheus.yml. Relative rule_files globs and
    file-SD patterns resolve against the config file's directory
    (config.go JoinDir)."""
    import glob as _glob

    import yaml

    from tsdb_spark.promtool import load_rule_file

    with open(path) as f:
        raw_text = f.read()
    raw = yaml.safe_load(raw_text) or {}
    base = os.path.dirname(os.path.abspath(path))

    g = raw.get("global", {}) or {}
    scrape_ms = _duration_ms(
        g.get("scrape_interval"), DEFAULT_SCRAPE_INTERVAL_MS
    )
    eval_ms = _duration_ms(
        g.get("evaluation_interval"), DEFAULT_EVAL_INTERVAL_MS
    )
    external = {
        str(k): str(v) for k, v in (g.get("external_labels") or {}).items()
    }

    jobs = scrape_jobs_from(
        spark, raw, default_interval_ms=scrape_ms, base_dir=base
    )

    rule_files: list[str] = []
    for pat in raw.get("rule_files", []) or []:
        full = pat if os.path.isabs(pat) else os.path.join(base, pat)
        rule_files.extend(sorted(_glob.glob(full)))
    groups: list[dict] = []
    for rf in rule_files:
        groups.extend(load_rule_file(rf, default_interval_ms=eval_ms))

    from tsdb_spark.scrape import _relabel_rules

    from tsdb_spark.httpauth import http_client_config_from

    am_urls: list[str] = []
    am_http: dict = {}
    alerting = raw.get("alerting", {}) or {}
    alert_relabel = _relabel_rules(alerting, "alert_relabel_configs")
    for am in alerting.get("alertmanagers", []) or []:
        scheme = am.get("scheme", "http")
        prefix = (am.get("path_prefix", "") or "").rstrip("/")
        hc = http_client_config_from(am, base_dir=base)
        for grp in am.get("static_configs", []) or []:
            for t in grp.get("targets", []) or []:
                base_url = t if "://" in t else f"{scheme}://{t}"
                full = f"{base_url}{prefix}"
                am_urls.append(full)
                if hc is not None:
                    am_http[full.rstrip("/")] = hc

    remote_writes = [
        RemoteWriteConfig(
            url=rw["url"],
            protobuf_message=rw.get(
                "protobuf_message", "prometheus.WriteRequest"
            ),
            write_relabel=tuple(_relabel_rules(rw, "write_relabel_configs")),
            http_config=http_client_config_from(rw, base_dir=base),
        )
        for rw in raw.get("remote_write", []) or []
    ]

    from tsdb_spark.remoteread import RemoteReadConfig

    remote_reads = [
        RemoteReadConfig(
            url=rr["url"],
            name=str(rr.get("name", "")),
            required_matchers=tuple(
                sorted(
                    (str(k), str(v))
                    for k, v in (rr.get("required_matchers") or {}).items()
                )
            ),
            read_recent=bool(rr.get("read_recent", False)),
            remote_timeout_s=_duration_ms(rr.get("remote_timeout"), 60_000)
            / 1000.0,
            http_config=http_client_config_from(rr, base_dir=base),
        )
        for rr in raw.get("remote_read", []) or []
    ]

    otlp_nhcb = bool(
        (raw.get("otlp") or {}).get("convert_histograms_to_nhcb", False)
    )

    return PrometheusConfig(
        scrape_interval_ms=scrape_ms,
        evaluation_interval_ms=eval_ms,
        external_labels=external,
        scrape_jobs=jobs,
        rule_files=rule_files,
        rule_groups=groups,
        alertmanager_urls=am_urls,
        alert_relabel=alert_relabel,
        alertmanager_http=am_http,
        otlp_nhcb=otlp_nhcb,
        remote_writes=remote_writes,
        remote_reads=remote_reads,
        raw_yaml=raw_text,
        path=os.path.abspath(path),
    )


def scrape_scheduler_loop(
    spark,
    db,
    jobs: list[ScrapeJob],
    stop: threading.Event,
    status: dict | None = None,
    metadata: dict | None = None,
    poll_s: float = 0.5,
) -> None:
    """Per-job interval scheduler (the scrape manager's role): each job
    scrapes on ITS cadence — a 5s job doesn't wait for a 1m job's tick.
    Poll granularity bounds tick latency only, like manager.Manager."""
    from tsdb_spark.scrape import scrape_pass

    last_run: dict[str, float] = {}
    prev_urls: dict[str, set] = {}
    while not stop.is_set():
        now = time.time()
        # snapshot: /-/reload swaps the list in place from the HTTP
        # thread; iterating a moving list could skip/duplicate a job
        for job in list(jobs):
            if now - last_run.get(job.name, -1e18) < job.interval_ms / 1000.0:
                continue
            last_run[job.name] = now
            try:
                targets = job.resolve_targets(spark, int(now * 1000))
                urls = {t.url for t in targets}
                if status is not None:
                    # a target this job discovered before but no longer
                    # does (file-SD removal) leaves /api/v1/targets
                    for gone in prev_urls.get(job.name, set()) - urls:
                        status.pop(gone, None)
                prev_urls[job.name] = urls
                if targets:
                    scrape_pass(
                        spark, db, targets,
                        honor_labels=job.honor_labels,
                        status=status,
                        relabel_configs=job.metric_relabel or None,
                        metadata=metadata,
                        timeout_s=job.timeout_s,
                        convert_nhcb=job.convert_nhcb,
                        http_config=job.http_config,
                    )
            except Exception as e:  # noqa: BLE001 — keep serving
                print(f"scrape pass failed for job {job.name}: {e}")
        stop.wait(poll_s)


class RemoteWriteForwarder:
    """Drain everything newly appended to a store into `remote_write:`
    endpoints — the queueManager/WAL-watcher role (storage/remote).
    Tails by `ingest_seq`: each pass reads samples with ingest_seq
    above the per-URL watermark (so restarts of the LOOP never re-send,
    and a backfill into old time ranges still forwards), joins labels,
    and POSTs v1 or rw2 bodies per the endpoint's protobuf_message.

    The read is one pruned scan + join per pass; the collect is the
    HTTP client boundary, bounded by what arrived since the last pass
    (steady-state: one flush window of data)."""

    def __init__(self, db, configs: list[RemoteWriteConfig],
                 batch_series: int = 500, timeout_s: float = 30.0,
                 external_labels: dict[str, str] | None = None,
                 metadata: dict | None = None) -> None:
        self.db = db
        self.configs = list(configs)
        self.batch_series = batch_series
        self.timeout_s = timeout_s
        #: the scrape-cache metadata registry (metric → type/help/unit);
        #: rw2 endpoints attach it per outgoing series like upstream's
        #: queueManager metadata watcher (storage/remote/metadata_watcher)
        self.metadata = metadata if metadata is not None else {}
        #: global external_labels attach to every outgoing series where
        #: the series doesn't already carry the name (storage/remote
        #: does the same before write relabeling)
        self.external_labels = dict(external_labels or {})
        # start at the store's current head: a fresh forwarder ships
        # new data, not history (upstream starts at the WAL tail too;
        # history moves via the explicit `remote-write` CLI).
        # durable_head, not next_ingest_seq: with staged appends a
        # reserved-but-unpublished batch below next_ingest_seq-1 will
        # publish later, and a watermark past it would skip it forever
        head = db.durable_head()
        self.watermarks: dict[str, int] = {c.url: head for c in self.configs}
        self.sent: dict[str, int] = {c.url: 0 for c in self.configs}
        self.errors = 0

    def _attach_external(self, df):
        """external_labels where the series lacks the name — one map
        projection, applied BEFORE write relabeling like upstream."""
        from pyspark.sql import functions as F

        if not self.external_labels:
            return df
        ext = F.create_map(*[
            F.lit(x)
            for kv in sorted(self.external_labels.items())
            for x in kv
        ])
        merged = F.map_concat(
            F.map_filter(
                ext, lambda k, _: ~F.map_contains_key(F.col("labels"), k)
            ),
            F.col("labels"),
        )
        return df.withColumn("labels", merged)

    def _tail(self, df, seq: int, head: int):
        """ingest_seq ∈ (seq, head]: the upper bound pins the sent set
        to the watermark advance — without it, rows appended by the
        scrape/rule threads DURING the pass would ship now AND again on
        the next pass (a duplicate-rejecting receiver would then stall
        the watermark on the re-send)."""
        from pyspark.sql import functions as F

        return df.filter(
            (F.col("ingest_seq") > seq) & (F.col("ingest_seq") <= head)
        )

    def _with_labels(self, df, cols, write_relabel=()):
        """series join + external_labels + the endpoint's
        write_relabel_configs — the shared outgoing-series pipeline,
        applied identically to floats, histograms, and exemplars
        (upstream relabels EVERY outgoing series; a drop rule must
        drop the series' histogram and exemplar rows too)."""
        ser = self.db.series().select("series_id", "labels")
        df = self._attach_external(df.join(ser, "series_id").select(*cols))
        if write_relabel:
            from tsdb_spark.relabel import apply_relabel

            df = apply_relabel(df, list(write_relabel))
        return df.select(*cols).collect()

    def _float_rows_since(self, seq: int, head: int, write_relabel=()):
        smp = self._tail(self.db.samples(), seq, head)
        return self._with_labels(smp, ["labels", "t", "v"], write_relabel)

    def _hist_rows_since(self, seq: int, head: int, write_relabel=()):
        """Native-histogram rows appended after `seq` (rw2 endpoints
        carry them; v1 cannot). Reads the histogram table directly —
        hist_frame serves reads by time, this tail needs ingest_seq."""
        from tsdb_spark.nativehist import HIST_TYPE

        ddl = (
            f"series_id LONG, t LONG, h {HIST_TYPE}, "
            "ingest_seq LONG, t_bucket LONG"
        )
        h = self._tail(
            self.db._read_or_empty(self.db._hist_path, ddl), seq, head
        )
        return self._with_labels(h, ["labels", "t", "h"], write_relabel)

    def _exemplar_rows_since(self, seq: int, head: int, write_relabel=()):
        """Exemplar rows appended after `seq` — rw2 TimeSeries field 4
        (upstream's queueManager sends exemplars when enabled). Write
        relabeling applies to the SERIES labels; the exemplar's own
        labels (trace_id …) ride through untouched."""
        ddl = (
            "series_id LONG, t LONG, v DOUBLE, "
            "exemplar MAP<STRING,STRING>, _ex_str STRING, "
            "ingest_seq LONG, t_bucket LONG"
        )
        ex = self._tail(
            self.db._read_or_empty(self.db._exemplar_path, ddl), seq, head
        )
        return self._with_labels(
            ex, ["labels", "t", "v", "exemplar"], write_relabel
        )

    def run_once(self) -> int:
        """One forwarding pass over every endpoint. Returns sample +
        histogram entries sent (summed over endpoints)."""
        from tsdb_spark.sources.remotewrite import (
            _post_series_batches,
            _post_series_batches_v2,
        )

        # bound every pass at the PUBLISHED head: seqs reserved by
        # in-flight staged appends stay above the watermark until they
        # land, so a concurrent appender never loses samples to the tail
        head = self.db.durable_head()
        total = 0
        # one read per distinct (watermark, relabel-chain, table) —
        # steady state with unrelabeled endpoints: one read shared by
        # every endpoint. The relabel chain is part of the key so a
        # drop/rename rule never leaks another endpoint's cached rows
        # (histograms and exemplars included, like the float path).
        fcache: dict[tuple, list] = {}
        hcache: dict[tuple, list] = {}
        ecache: dict[tuple, list] = {}
        for cfg in self.configs:
            mark = self.watermarks[cfg.url]
            if head <= mark:
                continue
            key = (mark, cfg.write_relabel)
            if key not in fcache:
                fcache[key] = self._float_rows_since(
                    mark, head, cfg.write_relabel
                )
            rows = fcache[key]
            if cfg.v2 and key not in hcache:
                hcache[key] = self._hist_rows_since(
                    mark, head, cfg.write_relabel
                )
                ecache[key] = self._exemplar_rows_since(
                    mark, head, cfg.write_relabel
                )
            hrows = hcache.get(key, [])
            erows = ecache.get(key, [])
            if not rows and not (cfg.v2 and (hrows or erows)):
                self.watermarks[cfg.url] = head
                continue
            try:
                if cfg.v2:
                    def _entry(by, lab):
                        return by.setdefault(
                            tuple(sorted(lab.items())),
                            {"labels": lab, "samples": [],
                             "histograms": [], "exemplars": []},
                        )

                    by: dict[tuple, dict] = {}
                    for r in rows:
                        e = _entry(by, dict(r["labels"]))
                        e["samples"].append((r["t"], r["v"]))
                    for r in erows:
                        e = _entry(by, dict(r["labels"]))
                        e["exemplars"].append(
                            (dict(r["exemplar"]), r["t"], r["v"])
                        )
                    for r in hrows:
                        lab = dict(r["labels"])
                        h = r["h"]
                        e = _entry(by, lab)
                        e["histograms"].append((
                            r["t"],
                            {
                                "count": h["count"], "sum": h["sum"],
                                "zero_count": h["zero_count"],
                                "schema": h["schema"],
                                "buckets": [
                                    (b["idx"], b["c"]) for b in h["buckets"]
                                ],
                                "custom_values": (
                                    list(h["custom_values"])
                                    if h["custom_values"] is not None
                                    else None
                                ),
                            },
                        ))
                    series2 = []
                    for k in sorted(by):
                        e = by[k]
                        e["samples"].sort()
                        e["histograms"].sort(key=lambda x: x[0])
                        e["exemplars"].sort(key=lambda x: x[1])
                        md = self.metadata.get(
                            e["labels"].get("__name__", "")
                        )
                        if md:
                            # rw2 TimeSeries field 5: the scrape-cache
                            # entry for the series' metric family
                            e["metadata"] = {
                                k2: md[k2]
                                for k2 in ("type", "help", "unit")
                                if k2 in md
                            }
                        series2.append(e)
                    n = _post_series_batches_v2(
                        cfg.url, series2, self.batch_series,
                        self.timeout_s, http_config=cfg.http_config,
                    )
                else:
                    by1: dict[tuple, list] = {}
                    for r in rows:
                        by1.setdefault(
                            tuple(sorted(dict(r["labels"]).items())), []
                        ).append((r["t"], r["v"]))
                    series1 = [
                        (dict(k), sorted(v)) for k, v in sorted(by1.items())
                    ]
                    n = _post_series_batches(
                        cfg.url, series1, self.batch_series,
                        self.timeout_s, http_config=cfg.http_config,
                    )
            except OSError:
                self.errors += 1  # endpoint down: retry same mark next pass
                continue
            self.watermarks[cfg.url] = head
            self.sent[cfg.url] += n
            total += n
        return total

    def loop(self, stop: threading.Event, interval_s: float = 5.0) -> None:
        while not stop.is_set():
            try:
                self.run_once()
            except Exception:  # noqa: BLE001 — keep forwarding
                self.errors += 1
            stop.wait(interval_s)


def check_config(path: str) -> list[str]:
    """`promtool check config` (cmd/promtool/main.go CheckConfig): static
    validation of a prometheus.yml and every rule file it references —
    an offline lint, no SparkSession and no store. Returns
    human-readable problem strings ([] = valid).

    Checks mirrored from upstream: the file parses as a mapping; only
    known top-level blocks; global durations parse; every scrape job
    has a unique job_name; relabel rule lists compile; file-SD patterns
    that match nothing are reported (upstream logs the same warning);
    alertmanager/remote_write/remote_read entries carry their required
    fields; each referenced rule file passes `check rules`."""
    import glob as _glob2

    import yaml

    from tsdb_spark.promtool import check_rules
    from tsdb_spark.scrape import _relabel_rules

    errs: list[str] = []
    try:
        with open(path) as f:
            raw = yaml.safe_load(f.read())
    except FileNotFoundError:
        return [f"{path}: no such file"]
    except yaml.YAMLError as e:
        return [f"{path}: YAML parse error: {e}"]
    if raw is None:
        raw = {}
    if not isinstance(raw, dict):
        return [f"{path}: config is not a mapping"]
    base = os.path.dirname(os.path.abspath(path))

    known = {
        "global", "scrape_configs", "rule_files", "alerting",
        "remote_write", "remote_read", "otlp", "storage", "tracing",
    }
    for k in raw:
        if k not in known:
            errs.append(f"unknown top-level field {k!r}")

    g = raw.get("global") or {}
    for fld in ("scrape_interval", "evaluation_interval", "scrape_timeout"):
        if fld in g:
            try:
                _duration_ms(g[fld], 0)
            except Exception:
                errs.append(f"global.{fld}: bad duration {g[fld]!r}")

    seen_jobs: set[str] = set()
    for i, job in enumerate(raw.get("scrape_configs") or []):
        where = f"scrape_configs[{i}]"
        name = job.get("job_name")
        if not name:
            errs.append(f"{where}: job_name is required")
        elif name in seen_jobs:
            errs.append(f"{where}: duplicate job_name {name!r}")
        else:
            seen_jobs.add(name)
        for fld in ("scrape_interval", "scrape_timeout"):
            if fld in job:
                try:
                    _duration_ms(job[fld], 0)
                except Exception:
                    errs.append(f"{where}.{fld}: bad duration {job[fld]!r}")
        for section in ("relabel_configs", "metric_relabel_configs"):
            try:
                _relabel_rules(job, section)
            except Exception as e:
                errs.append(f"{where}.{section}: {e}")
        for sd in job.get("file_sd_configs") or []:
            for pat in sd.get("files") or []:
                full = pat if os.path.isabs(pat) else os.path.join(base, pat)
                if not _glob2.glob(full):
                    errs.append(
                        f"{where}: file_sd pattern {pat!r} matches no files"
                    )
        for grp in job.get("static_configs") or []:
            if not isinstance(grp.get("targets", []), list):
                errs.append(f"{where}: static_configs targets must be a list")

    alerting = raw.get("alerting") or {}
    try:
        _relabel_rules(alerting, "alert_relabel_configs")
    except Exception as e:
        errs.append(f"alerting.alert_relabel_configs: {e}")

    for i, rw in enumerate(raw.get("remote_write") or []):
        if not rw.get("url"):
            errs.append(f"remote_write[{i}]: url is required")
        pm = rw.get("protobuf_message", "prometheus.WriteRequest")
        if pm not in ("prometheus.WriteRequest", RW2_MESSAGE):
            errs.append(
                f"remote_write[{i}]: unknown protobuf_message {pm!r}"
            )
        try:
            _relabel_rules(rw, "write_relabel_configs")
        except Exception as e:
            errs.append(f"remote_write[{i}].write_relabel_configs: {e}")

    for i, rr in enumerate(raw.get("remote_read") or []):
        if not rr.get("url"):
            errs.append(f"remote_read[{i}]: url is required")
        if "remote_timeout" in rr:
            try:
                _duration_ms(rr["remote_timeout"], 0)
            except Exception:
                errs.append(
                    f"remote_read[{i}].remote_timeout: bad duration "
                    f"{rr['remote_timeout']!r}"
                )

    n_rules = 0
    for pat in raw.get("rule_files") or []:
        full = pat if os.path.isabs(pat) else os.path.join(base, pat)
        matched = sorted(_glob2.glob(full))
        if not matched:
            errs.append(f"rule_files pattern {pat!r} matches no files")
        for rf in matched:
            sub_errs = check_rules(rf)
            errs.extend(f"{rf}: {e}" for e in sub_errs)
            n_rules += 1
    return errs
