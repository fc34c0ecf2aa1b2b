"""Scrape loop: pull exposition text from HTTP targets into the store.

Prometheus's acquisition path (scrape/scrape.go: the scrapeLoop GETs a
target's /metrics, parses, stamps un-timestamped samples with the scrape
time, attaches target labels, appends) — the layer above the reference
library, same footing as PromQL/rules/API here. Combined with this
engine's own /federate endpoint (api.py), two stores FEDERATE: instance
B scrapes instance A's /federate and serves the same answers.

Spark split: the HTTP GETs are driver-side but CONCURRENT (a thread
pool over the sockets — upstream runs one goroutine per target; a pass
costs ~max(target latency), never the sum), while parsing and ingest
are the distributed openmetrics path; a pass over many targets
parallelizes as one union-of-lines DataFrame feeding ONE transactional
append, so a 10k-target pass is one Spark job, not 10k.

Label rules (scrape.go mutateSampleLabels): every sample gets the
target's `instance`/`job` (+ any extra static labels); with
honor_labels=True a label already on the sample wins, otherwise the
sample's conflicting label is renamed `exported_<name>` and the
target's value takes the slot.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tsdb_spark.sources.openmetrics import parse_openmetrics


@dataclass(frozen=True)
class Target:
    """One scrape target (scrape.go Target): where to GET and which
    labels to attach. `timestamps` is the stamp unit the endpoint emits
    ("ms" for this engine's /federate and classic exposition;
    "openmetrics" for OpenMetrics endpoints)."""

    url: str
    job: str
    instance: str = ""
    labels: tuple[tuple[str, str], ...] = field(default_factory=tuple)
    timestamps: str = "ms"

    def target_labels(self) -> dict[str, str]:
        out = {"job": self.job, "instance": self.instance or self.url}
        out.update(dict(self.labels))
        return out


def fetch_text(url: str, timeout_s: float = 10.0, http_config=None) -> str:
    """Driver-side GET of one target's exposition body. `http_config`
    (httpauth.HTTPClientConfig) attaches basic_auth / authorization
    headers and the tls_config SSL context — most production targets
    are secured, and upstream's scrape client honors the same block
    (config.go HTTPClientConfig)."""
    import urllib.request

    req = urllib.request.Request(
        url, headers=http_config.headers() if http_config else {}
    )
    ctx = http_config.ssl_context() if http_config else None
    with urllib.request.urlopen(req, timeout=timeout_s, context=ctx) as r:
        return r.read().decode()


def parse_metadata(text: str) -> dict[str, dict[str, str]]:
    """Extract per-metric HELP/TYPE/UNIT from an exposition body's
    comment lines (the metadata upstream's scrape cache keeps and
    /api/v1/metadata serves; samples themselves never carry it).
    Driver-side string scan over one (small) scrape body."""
    out: dict[str, dict[str, str]] = {}
    for line in text.splitlines():
        if not line.startswith("#"):
            continue
        parts = line.split(None, 3)
        if len(parts) < 3 or parts[1] not in ("HELP", "TYPE", "UNIT"):
            continue
        metric = parts[2]
        entry = out.setdefault(metric, {})
        if parts[1] == "HELP":
            entry["help"] = parts[3] if len(parts) > 3 else ""
        elif parts[1] == "TYPE":
            entry["type"] = parts[3].strip() if len(parts) > 3 else "unknown"
        else:
            entry["unit"] = parts[3].strip() if len(parts) > 3 else ""
    return out


def _apply_target_labels(
    df: DataFrame, tgt_labels: dict[str, str], honor_labels: bool
) -> DataFrame:
    """scrape.go mutateSampleLabels as one map expression. Target labels
    are a handful of literals, so this stays a pure projection."""
    tgt = F.create_map(
        *[F.lit(x) for kv in sorted(tgt_labels.items()) for x in kv]
    )
    if honor_labels:
        # sample labels win; target fills only the absent keys
        merged = F.map_concat(
            F.map_filter(tgt, lambda k, _: ~F.array_contains(F.map_keys("labels"), k)),
            F.col("labels"),
        )
    else:
        # target wins; conflicting sample labels move to exported_<name>
        conflict_renamed = F.transform_keys(
            F.col("labels"),
            lambda k, _: F.when(
                F.array_contains(F.map_keys(tgt), k), F.concat(F.lit("exported_"), k)
            ).otherwise(k),
        )
        merged = F.map_concat(conflict_renamed, tgt)
    return df.withColumn("labels", merged)


def scrape_pass(
    spark: SparkSession,
    db,
    targets: list[Target],
    scrape_time_ms: int | None = None,
    honor_labels: bool = False,
    status: dict | None = None,
    max_workers: int = 32,
    relabel_configs=None,
    metadata: dict | None = None,
    timeout_s: float = 10.0,
    convert_nhcb: bool = False,
    http_config=None,
) -> int:
    """One scrape pass over every target: GET every body CONCURRENTLY
    (driver-side thread pool — upstream scrapes each target from its own
    goroutine, scrape/scrape.go scrapeLoop; acquisition wall time is
    ~max(target latency), never the sum), then parse + label + append as
    ONE distributed job. Returns the number of targets successfully
    fetched; a down target is skipped (scrape.go records `up 0` —
    mirrored here by appending an `up` sample per target, 1/0, at the
    scrape time).

    `relabel_configs` (list[relabel.RelabelConfig]) applies upstream
    `metric_relabel_configs` semantics: the rule chain rewrites/filters
    every scraped sample AFTER target labels attach (scrape.go runs
    metric relabeling on the final label set), as one extra projection
    on the same distributed parse — `up` synthetics are exempt, like
    upstream's reportSample path.

    `convert_nhcb` is the scrape_config `convert_classic_histograms_to
    _nhcb` option (prometheus 3.x): scraped classic histogram families
    (X_bucket{le=}/X_sum/X_count) land as NHCB native samples in the
    histograms table instead of float series — the classic series are
    consumed by the conversion, everything else appends as floats."""
    from concurrent.futures import ThreadPoolExecutor
    from functools import reduce

    now = int(time.time() * 1000) if scrape_time_ms is None else int(scrape_time_ms)

    def _get(tgt: Target):
        try:
            return fetch_text(
                tgt.url, timeout_s=timeout_s, http_config=http_config
            ), None
        except OSError as e:
            return None, e

    with ThreadPoolExecutor(max_workers=min(max_workers, max(len(targets), 1))) as ex:
        fetched = list(ex.map(_get, targets))  # input order preserved

    frames: list[DataFrame] = []
    ok = 0
    up_rows: list[tuple] = []
    for tgt, (text, err) in zip(targets, fetched):
        tl = tgt.target_labels()
        if err is not None:
            e = err
            up_rows.append(({"__name__": "up", **tl}, now, 0.0))
            if status is not None:
                status[tgt.url] = {
                    "health": "down", "lastScrapeMs": now, "lastError": str(e),
                    "job": tgt.job, "labels": tl,
                }
            continue
        ok += 1
        up_rows.append(({"__name__": "up", **tl}, now, 1.0))
        if metadata is not None:
            metadata.update(parse_metadata(text))
        if status is not None:
            status[tgt.url] = {
                "health": "up", "lastScrapeMs": now, "lastError": "",
                "job": tgt.job, "labels": tl,
            }
        lines = spark.createDataFrame(
            [(ln,) for ln in text.splitlines()] or [("",)], "line string"
        )
        parsed = parse_openmetrics(
            spark, lines=lines, timestamps=tgt.timestamps, default_time_ms=now
        )
        labeled = _apply_target_labels(parsed, tl, honor_labels)
        if relabel_configs:
            from tsdb_spark.relabel import apply_relabel

            labeled = apply_relabel(labeled, relabel_configs)
        frames.append(labeled)
    up = spark.createDataFrame(
        up_rows, "labels MAP<STRING,STRING>, t LONG, v DOUBLE"
    )
    batch = reduce(DataFrame.unionByName, frames, up)
    if convert_nhcb:
        from tsdb_spark.nativehist import classic_to_nhcb

        name = F.element_at("labels", F.lit("__name__"))
        le = F.element_at("labels", F.lit("le"))
        # classic families = base names that have _bucket{le=} series
        # in THIS pass; their _bucket/_sum/_count rows are consumed by
        # the conversion, every other row stays a float sample
        bases = (
            batch.filter(name.endswith("_bucket") & le.isNotNull())
            .select(
                F.regexp_replace(name, "_bucket$", "").alias("_base")
            )
            .distinct()
        )
        suffixed = batch.select(
            "labels", "t", "v",
            F.regexp_replace(
                name, "_(bucket|sum|count)$", ""
            ).alias("_maybe"),
            name.rlike("_(bucket|sum|count)$").alias("_sfx"),
        )
        joined = suffixed.join(
            F.broadcast(bases),
            (F.col("_maybe") == F.col("_base")) & F.col("_sfx"),
            "left",
        )
        classic = joined.filter(F.col("_base").isNotNull()).select(
            "labels", "t", "v"
        )
        rest = joined.filter(F.col("_base").isNull()).select(
            "labels", "t", "v"
        )
        hists = classic_to_nhcb(classic)
        if hists.take(1):
            db.append_histograms(hists.select("labels", "t", "h"))
        db.append(rest)
    else:
        db.append(batch)
    return ok


def scrape_loop(
    spark: SparkSession,
    db,
    targets: list[Target],
    interval_ms: int = 15_000,
    passes: int | None = None,
    honor_labels: bool = False,
) -> None:
    """Fixed-interval scrape loop (scrape.go scrapeLoop.run): aligned
    ticks, one pass per tick. `passes` bounds the loop for CLI/test use
    (upstream runs forever)."""
    n = 0
    while passes is None or n < passes:
        t0 = time.time()
        scrape_pass(spark, db, targets, honor_labels=honor_labels)
        n += 1
        if passes is not None and n >= passes:
            break
        sleep = interval_ms / 1000.0 - (time.time() - t0)
        if sleep > 0:
            time.sleep(sleep)


# ------------------------------------------------- scrape_configs YAML


@dataclass
class FileSD:
    """One `file_sd_configs` entry (discovery/file/file.go): target
    groups live in JSON/YAML files the operator edits (or another
    system writes); the scraper re-reads them so targets come and go
    WITHOUT a restart. Re-read triggers: `refresh_interval` elapsed
    (upstream's timer, default 5m) or any file's mtime changed
    (upstream's fsnotify analog — a stat per pass, so an edit lands in
    the NEXT scrape pass)."""

    files: tuple[str, ...]
    refresh_ms: int = 300_000
    # runtime cache (not config)
    _groups: list = field(default_factory=list, compare=False)
    _mtimes: dict = field(default_factory=dict, compare=False)
    _last_read_ms: int = field(default=-1, compare=False)

    def _paths(self) -> list[str]:
        import glob as _glob

        out: list[str] = []
        for pat in self.files:
            out.extend(sorted(_glob.glob(pat)))
        return out

    def groups(self, now_ms: int) -> list[dict]:
        """Current target groups ({"targets": [...], "labels": {...}}),
        re-reading files when stale. Unreadable/unparseable files keep
        the previous groups (upstream keeps serving the last good
        read)."""
        import os as _os

        import yaml

        paths = self._paths()
        mtimes = {}
        for p in paths:
            try:
                mtimes[p] = _os.stat(p).st_mtime_ns
            except OSError:
                pass
        fresh = (
            self._last_read_ms >= 0
            and now_ms - self._last_read_ms < self.refresh_ms
            and mtimes == self._mtimes
        )
        if fresh:
            return self._groups
        groups: list[dict] = []
        ok = True
        for p in paths:
            try:
                with open(p) as f:
                    doc = yaml.safe_load(f)  # JSON is a YAML subset
            except (OSError, yaml.YAMLError):
                ok = False
                continue
            for g in doc or []:
                groups.append({
                    "targets": list(g.get("targets", [])),
                    "labels": dict(g.get("labels") or {}),
                })
        if ok or not self._groups:
            self._groups = groups
        self._mtimes = mtimes
        self._last_read_ms = now_ms
        return self._groups


@dataclass
class HTTPSD:
    """One `http_sd_configs` entry (discovery/http/http.go): GET the
    upstream JSON target-group list [{"targets": [...], "labels":
    {...}}] from a URL every `refresh_interval` (upstream default 60s).
    A failed or unparseable GET keeps the last good groups, like file
    SD. The GET carries the block's own HTTPClientConfig auth
    (discovery/http embeds one per config)."""

    url: str
    refresh_ms: int = 60_000
    timeout_s: float = 10.0
    http_config: object = None
    # runtime cache (not config)
    _groups: list = field(default_factory=list, compare=False)
    _last_read_ms: int = field(default=-1, compare=False)

    def groups(self, now_ms: int) -> list[dict]:
        import json as _json

        if (
            self._last_read_ms >= 0
            and now_ms - self._last_read_ms < self.refresh_ms
        ):
            return self._groups
        try:
            doc = _json.loads(fetch_text(
                self.url, timeout_s=self.timeout_s,
                http_config=self.http_config,
            ))
            self._groups = [
                {
                    "targets": list(g.get("targets", [])),
                    "labels": dict(g.get("labels") or {}),
                }
                for g in doc or []
            ]
        except (OSError, ValueError, AttributeError, TypeError):
            pass  # keep serving the last good response
        self._last_read_ms = now_ms
        return self._groups


@dataclass
class DNSSD:
    """One `dns_sd_configs` entry (discovery/dns/dns.go) — the A/AAAA
    subset, resolved with the system resolver (stdlib getaddrinfo)
    every `refresh_interval` (upstream default 30s): one target per
    returned address at the configured `port`, carrying
    __meta_dns_name so relabel rules can route on the queried name
    (upstream sets the same meta label). SRV/MX/NS record types need a
    raw DNS client the stdlib doesn't provide; a name that fails to
    resolve keeps its last good answer, like file/http SD."""

    names: list
    port: int = 0
    record_type: str = "A"
    refresh_ms: int = 30_000
    # runtime cache (not config)
    _groups: list = field(default_factory=list, compare=False)
    _last_read_ms: int = field(default=-1, compare=False)

    def groups(self, now_ms: int) -> list[dict]:
        import socket as _socket

        if (
            self._last_read_ms >= 0
            and now_ms - self._last_read_ms < self.refresh_ms
        ):
            return self._groups
        fam = (
            _socket.AF_INET6 if self.record_type.upper() == "AAAA"
            else _socket.AF_INET
        )
        # last-good is kept PER NAME: one dead name must not drop the
        # other names' targets (upstream keeps the failing name's
        # previous target group too)
        prev = {g["labels"].get("__meta_dns_name"): g for g in self._groups}
        groups: list[dict] = []
        for name in self.names:
            try:
                infos = _socket.getaddrinfo(
                    name, None, family=fam, type=_socket.SOCK_STREAM
                )
                addrs = sorted({i[4][0] for i in infos})
                groups.append({
                    "targets": [
                        (
                            f"[{a}]:{self.port}" if ":" in a
                            else f"{a}:{self.port}"
                        )
                        for a in addrs
                    ],
                    "labels": {"__meta_dns_name": name},
                })
            except OSError:
                if name in prev:
                    groups.append(prev[name])
        self._groups = groups
        self._last_read_ms = now_ms
        return self._groups


def _static_targets(
    groups: list[dict],
    job: str,
    scheme: str = "http",
    metrics_path: str = "/metrics",
    params: dict | None = None,
) -> list[Target]:
    """static_configs-shaped groups → Targets. A bare "host:port"
    target becomes {scheme}://host:port{metrics_path}[?params]
    (the job's __scheme__/__metrics_path__/__param_* defaults,
    scrape/target.go URL assembly); full URLs pass through."""
    qs = ""
    if params:
        from urllib.parse import urlencode

        qs = "?" + urlencode(
            [(k, v) for k, vs in sorted(params.items())
             for v in (vs if isinstance(vs, list) else [vs])]
        )
    targets: list[Target] = []
    for group in groups:
        extra = tuple(sorted((group.get("labels") or {}).items()))
        for t in group.get("targets", []):
            url = t if "://" in t else f"{scheme}://{t}{metrics_path}{qs}"
            targets.append(Target(url=url, job=job, instance=t, labels=extra))
    return targets


@dataclass
class ScrapeJob:
    """One resolved scrape_configs entry: static targets already
    through SD-time relabeling, file-SD sources resolved per pass
    (resolve_targets), with the job's cadence and metric rule chain."""

    name: str
    targets: list[Target]
    interval_ms: int = 15_000
    honor_labels: bool = False
    metric_relabel: list = field(default_factory=list)
    #: SD-time relabel_configs, kept so dynamically-discovered targets
    #: go through the same chain the statics did at load
    target_relabel: list = field(default_factory=list)
    file_sd: list[FileSD] = field(default_factory=list)
    #: http_sd_configs sources, resolved per pass like file SD
    http_sd: list[HTTPSD] = field(default_factory=list)
    #: dns_sd_configs sources (A/AAAA), resolved per pass like file SD
    dns_sd: list[DNSSD] = field(default_factory=list)
    #: URL assembly defaults for bare host:port targets (scrape config
    #: scheme / metrics_path / params — scrape/target.go)
    scheme: str = "http"
    metrics_path: str = "/metrics"
    params: dict = field(default_factory=dict)
    #: per-target GET deadline (scrape_timeout; upstream default 10s)
    timeout_s: float = 10.0
    #: convert_classic_histograms_to_nhcb (prometheus 3.x)
    convert_nhcb: bool = False
    #: basic_auth / authorization / tls_config for the scrape GETs
    #: (httpauth.HTTPClientConfig; None = unauthenticated)
    http_config: object = None

    def resolve_targets(self, spark, now_ms: int | None = None) -> list[Target]:
        """The job's CURRENT target list: pre-relabeled statics plus
        file-SD targets (re-read when stale, relabeled now)."""
        if not self.file_sd and not self.http_sd and not self.dns_sd:
            return self.targets
        if now_ms is None:
            now_ms = int(time.time() * 1000)
        groups: list[dict] = []
        for sd in self.file_sd + self.http_sd + self.dns_sd:
            groups.extend(sd.groups(now_ms))
        dyn = _static_targets(
            groups, self.name,
            scheme=self.scheme, metrics_path=self.metrics_path,
            params=self.params,
        )
        if dyn and self.target_relabel:
            from tsdb_spark.relabel import relabel_targets

            dyn = relabel_targets(spark, dyn, self.target_relabel)
        return self.targets + dyn


def _relabel_rules(sc: dict, key: str) -> list:
    from tsdb_spark.relabel import RelabelConfig

    out = []
    for r in sc.get(key, []) or []:
        kw = dict(r)
        if "source_labels" in kw:
            kw["source_labels"] = tuple(kw["source_labels"])
        out.append(RelabelConfig(**kw))
    return out


def _duration_ms(v, default_ms: int) -> int:
    from tsdb_spark.promql import parse_duration

    if v is None:
        return default_ms
    return parse_duration(v) if isinstance(v, str) else int(v)


def scrape_jobs_from(
    spark, raw: dict, default_interval_ms: int = 15_000,
    base_dir: str = ".",
) -> list[ScrapeJob]:
    """`scrape_configs:` blocks of an already-parsed prometheus.yml →
    ScrapeJobs (job_name, scrape_interval falling back to the global
    default, honor_labels, static_configs with per-group labels,
    file_sd_configs with refresh, relabel_configs applied to statics at
    load and to file-SD targets at resolve time,
    metric_relabel_configs carried for scrape time). Relative file-SD
    patterns resolve against the config file's directory, like
    upstream."""
    import os as _os

    from tsdb_spark.relabel import relabel_targets

    jobs: list[ScrapeJob] = []
    for sc in raw.get("scrape_configs", []):
        name = sc.get("job_name", "scrape")
        interval_ms = _duration_ms(
            sc.get("scrape_interval"), default_interval_ms
        )
        scheme = sc.get("scheme", "http")
        metrics_path = sc.get("metrics_path", "/metrics")
        params = dict(sc.get("params") or {})
        timeout_s = _duration_ms(sc.get("scrape_timeout"), 10_000) / 1000.0
        convert_nhcb = bool(
            sc.get("convert_classic_histograms_to_nhcb", False)
        )
        from tsdb_spark.httpauth import http_client_config_from

        http_config = http_client_config_from(sc, base_dir=base_dir)
        targets = _static_targets(
            sc.get("static_configs", []), name,
            scheme=scheme, metrics_path=metrics_path, params=params,
        )
        target_rules = _relabel_rules(sc, "relabel_configs")
        if targets and target_rules:
            targets = relabel_targets(spark, targets, target_rules)
        file_sd = [
            FileSD(
                files=tuple(
                    f if _os.path.isabs(f) else _os.path.join(base_dir, f)
                    for f in fsd.get("files", [])
                ),
                refresh_ms=_duration_ms(
                    fsd.get("refresh_interval"), 300_000
                ),
            )
            for fsd in sc.get("file_sd_configs", []) or []
        ]
        http_sd = [
            HTTPSD(
                url=hsd["url"],
                refresh_ms=_duration_ms(
                    hsd.get("refresh_interval"), 60_000
                ),
                http_config=http_client_config_from(hsd, base_dir=base_dir),
            )
            for hsd in sc.get("http_sd_configs", []) or []
        ]
        dns_sd = [
            DNSSD(
                names=list(dsd.get("names") or []),
                port=int(dsd.get("port", 0)),
                record_type=str(dsd.get("type", "A")),
                refresh_ms=_duration_ms(
                    dsd.get("refresh_interval"), 30_000
                ),
            )
            for dsd in sc.get("dns_sd_configs", []) or []
        ]
        jobs.append(
            ScrapeJob(
                name=name,
                targets=targets,
                interval_ms=interval_ms,
                honor_labels=bool(sc.get("honor_labels", False)),
                metric_relabel=_relabel_rules(sc, "metric_relabel_configs"),
                target_relabel=target_rules,
                file_sd=file_sd,
                http_sd=http_sd,
                dns_sd=dns_sd,
                scheme=scheme,
                metrics_path=metrics_path,
                params=params,
                timeout_s=timeout_s,
                convert_nhcb=convert_nhcb,
                http_config=http_config,
            )
        )
    return jobs


def load_scrape_config(spark, path: str) -> list[ScrapeJob]:
    """Parse an upstream-style `scrape_configs:` YAML file. (The FULL
    prometheus.yml surface — global/rule_files/alerting/remote_write —
    is config.load_config; this entry point keeps the scrape-only
    contract.)"""
    import os as _os

    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    return scrape_jobs_from(
        spark, raw, base_dir=_os.path.dirname(_os.path.abspath(path))
    )


def scrape_config_pass(
    spark: SparkSession,
    db,
    jobs: list[ScrapeJob],
    scrape_time_ms: int | None = None,
    status: dict | None = None,
    metadata: dict | None = None,
) -> int:
    """One pass over every job of a loaded scrape config (each job has
    its own honor_labels / metric rule chain, so each runs its own
    scrape_pass — still one distributed append per job). File-SD jobs
    re-resolve their target lists first, so /api/v1/targets (`status`)
    reflects targets added/removed by a file edit: stale entries for
    URLs no longer discovered are pruned."""
    ok = 0
    current_urls: set[str] = set()
    for job in jobs:
        targets = job.resolve_targets(spark, scrape_time_ms)
        current_urls.update(t.url for t in targets)
        if not targets:
            continue
        ok += scrape_pass(
            spark,
            db,
            targets,
            scrape_time_ms=scrape_time_ms,
            honor_labels=job.honor_labels,
            status=status,
            relabel_configs=job.metric_relabel or None,
            metadata=metadata,
            timeout_s=job.timeout_s,
            convert_nhcb=job.convert_nhcb,
            http_config=job.http_config,
        )
    if status is not None:
        for url in list(status):
            if url not in current_urls:
                del status[url]
    return ok
