"""Remote-read CLIENT + read-through storage — the `remote_read:` block
of prometheus.yml.

Upstream, a query never talks to the local TSDB directly: it goes
through a fanout storage (storage/fanout.go) whose primary is the local
DB and whose secondaries are one remote-read querier per configured
endpoint (storage/remote/read.go sampleAndChunkQueryableClient,
storage/remote/client.go Client.Read). This module is that layer
re-expressed for the Spark engine:

- `RemoteReadClient` posts a snappy protobuf ReadRequest (prompb) and
  decodes the SAMPLED ReadResponse — the wire codec is shared with the
  server side (sources/remotewrite.py encode_read_request /
  decode_read_response; the /api/v1/read handler in api.py is the
  mirror image).
- `ReadThroughDB` wraps a local DB: `querier()` returns a querier whose
  select() unions the remote series into the local plan and resolves
  (series, t) collisions LOCAL-WINS (fanout.go prefers the primary);
  everything else — appends, maintenance, label lookups — delegates to
  the local store untouched. The remote rows enter Spark via one
  driver-side createDataFrame per query: the SAMPLED protocol fully
  materializes the response on the wire anyway (read.go buffers it the
  same way), and remote-read windows are operator-bounded by design.

Upstream semantics honored:

- `required_matchers` (read.go requiredMatchersFilter): the endpoint is
  consulted only when the query carries those equality matchers.
- `read_recent: false` (the default; read.go preferLocalStorageFilter):
  the remote window is clamped to end BEFORE the local storage's oldest
  sample — remote reads serve the history the local store doesn't
  have, and recent data never pays the network hop. Our localStartTime
  analog is the lowest live t_bucket lo (bucket-granular, conservative
  by at most one partition width).
"""

from __future__ import annotations

import urllib.request
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tsdb_spark import labels as L
from tsdb_spark.operators.merge import dedup_vertical


@dataclass(frozen=True)
class RemoteReadConfig:
    """One `remote_read:` entry (config.go RemoteReadConfig subset)."""

    url: str
    name: str = ""
    #: {label: value} — all must appear as equality matchers in the
    #: query for this endpoint to be consulted
    required_matchers: tuple = ()
    read_recent: bool = False
    remote_timeout_s: float = 60.0
    #: httpauth.HTTPClientConfig (basic_auth / authorization / tls)
    http_config: object = None


class RemoteReadClient:
    """POST prompb.ReadRequest to one endpoint (client.go Client.Read)."""

    def __init__(self, cfg: RemoteReadConfig):
        self.cfg = cfg
        self.reads = 0
        self.errors = 0

    def wants(self, matchers: list) -> bool:
        """required_matchers gate: every configured (name, value) must be
        present as an equality matcher (read.go requiredMatchersFilter)."""
        have = {(m.name, m.value) for m in matchers or [] if m.type == "="}
        return all(pair in have for pair in self.cfg.required_matchers)

    def read(self, mint: int, maxt: int, matchers: list) -> list:
        """[(labels dict, [(t, v), ...]), ...] for one query window.
        A matcher-less query (PromQL's full-frame select) forwards as
        the match-all regex, the convention remote responders accept."""
        from tsdb_spark.sources.remotewrite import (
            decode_read_response,
            encode_read_request,
        )

        wire = [(m.type, m.name, m.value) for m in matchers or []]
        if not wire:
            wire = [("=~", "__name__", ".*")]
        body = encode_read_request(
            [{"start": mint, "end": maxt, "matchers": wire}]
        )
        hc = self.cfg.http_config
        req = urllib.request.Request(
            self.cfg.url,
            data=body,
            headers={
                "Content-Type": "application/x-protobuf",
                "Content-Encoding": "snappy",
                "Accept-Encoding": "snappy",
                "X-Prometheus-Remote-Read-Version": "0.1.0",
                **(hc.headers() if hc else {}),
            },
            method="POST",
        )
        self.reads += 1
        try:
            with urllib.request.urlopen(
                req,
                timeout=self.cfg.remote_timeout_s,
                context=hc.ssl_context() if hc else None,
            ) as resp:
                raw = resp.read()
        except Exception:
            self.errors += 1
            raise
        results = decode_read_response(raw)
        return results[0] if results else []

    def read_full(self, mint: int, maxt: int, matchers: list) -> list:
        """read() + native histograms: [(labels, samples, histograms)]
        decoded from prompb TimeSeries field 4 (the server includes
        them in SAMPLED responses, codec.go ToQueryResult parity)."""
        from tsdb_spark.sources.remotewrite import (
            decode_read_response_full,
            encode_read_request,
        )

        wire = [(m.type, m.name, m.value) for m in matchers or []]
        if not wire:
            wire = [("=~", "__name__", ".*")]
        body = encode_read_request(
            [{"start": mint, "end": maxt, "matchers": wire}]
        )
        hc = self.cfg.http_config
        req = urllib.request.Request(
            self.cfg.url,
            data=body,
            headers={
                "Content-Type": "application/x-protobuf",
                "Content-Encoding": "snappy",
                "Accept-Encoding": "snappy",
                "X-Prometheus-Remote-Read-Version": "0.1.0",
                **(hc.headers() if hc else {}),
            },
            method="POST",
        )
        self.reads += 1
        try:
            with urllib.request.urlopen(
                req,
                timeout=self.cfg.remote_timeout_s,
                context=hc.ssl_context() if hc else None,
            ) as resp:
                raw = resp.read()
        except Exception:
            self.errors += 1
            raise
        results = decode_read_response_full(raw)
        return results[0] if results else []


@dataclass
class ReadThroughDB:
    """A DB whose read path fans out to remote_read endpoints.

    Only `querier()` changes; every other attribute — append*, compact,
    label_names/values, meta, series() — delegates to the wrapped local
    store, so the wrapper drops into every consumer that takes a DB
    (the PromQL evaluator, the rule manager, the HTTP handler)."""

    local: "object"
    clients: list = field(default_factory=list)

    def __getattr__(self, name):
        return getattr(self.local, name)

    def querier(self, mint: int, maxt: int) -> "ReadThroughQuerier":
        return ReadThroughQuerier(self, mint, maxt)

    def _local_start(self) -> int | None:
        """Oldest timestamp the local store can hold (bucket-granular
        lower bound) — the localStartTime analog read_recent clamps to."""
        dirs = self.local._bucket_dirs()
        if not dirs:
            return None
        return min(int(d.split("=")[1]) for d in dirs)

    def _remote_window(self, cfg: RemoteReadConfig, mint: int, maxt: int):
        if cfg.read_recent:
            return mint, maxt
        start = self._local_start()
        if start is None:
            return mint, maxt
        return mint, min(maxt, start - 1)

    def hist_frame(self, mint: int, maxt: int, matchers: list | None = None):
        """Native-histogram fan-in: the local hist_frame ∪ remote
        histogram series from the SAMPLED remote-read response, merged
        local-wins like the float path (histograms ride prompb
        TimeSeries field 4 since upstream 2.40)."""
        from tsdb_spark.nativehist import HIST_TYPE

        local = self.local.hist_frame(mint, maxt, matchers)
        rows = []
        for c in self.clients:
            if not c.wants(matchers or []):
                continue
            lo, hi = self._remote_window(c.cfg, mint, maxt)
            if lo > hi:
                continue
            for entry in c.read_full(lo, hi, matchers or []):
                lbls, hists = entry[0], entry[2] if len(entry) > 2 else ()
                rows.extend(
                    (
                        lbls,
                        t,
                        (
                            h["count"], h["sum"], h["zero_count"],
                            h["schema"],
                            [(int(i), float(cnt)) for i, cnt in h["buckets"]],
                            h.get("custom_values"),
                        ),
                    )
                    for t, h in hists
                )
        if not rows:
            return local
        spark = self.local.spark
        remote = spark.createDataFrame(
            rows, f"labels MAP<STRING,STRING>, t LONG, h {HIST_TYPE}"
        )
        stripped = L.strip_empty_labels("labels")
        remote = remote.select(
            L.labels_str_expr(stripped).alias("labels_str"),
            stripped.alias("labels"),
            F.col("t"),
            F.col("h"),
        )
        u = local.withColumn("_src", F.lit(1)).unionByName(
            remote.withColumn("_src", F.lit(0))
        )
        return dedup_vertical(
            u, precedence_col="_src", value_col="h",
            key_cols=("labels_str", "t"),
        ).drop("_src").select("labels_str", "labels", "t", "h")


@dataclass
class ReadThroughQuerier:
    """Querier-shaped fan-in: local plan ∪ remote rows, local wins."""

    db: ReadThroughDB
    mint: int
    maxt: int

    def select(
        self,
        matchers: list,
        with_labels: bool = True,
        apply_tombstones: bool = True,
        via_postings: bool = False,
    ) -> DataFrame:
        local = self.db.local.querier(self.mint, self.maxt).select(
            matchers,
            with_labels=True,
            apply_tombstones=apply_tombstones,
            via_postings=via_postings,
        )
        rows = []
        for c in self.db.clients:
            if not c.wants(matchers):
                continue
            lo, hi = self.db._remote_window(c.cfg, self.mint, self.maxt)
            if lo > hi:
                continue
            for lbls, samples in c.read(lo, hi, matchers):
                rows.extend((lbls, t, v) for t, v in samples)
        if not rows:
            # no remote contribution: the clean local plan unchanged —
            # zero added shuffles when every endpoint filters out
            return local if with_labels else local.drop("labels")
        spark = self.db.local.spark
        remote = spark.createDataFrame(
            rows, "labels MAP<STRING,STRING>, t LONG, v DOUBLE"
        )
        stripped = L.strip_empty_labels("labels")
        remote = remote.select(
            L.labels_str_expr(stripped).alias("labels_str"),
            L.series_id_expr("labels").alias("series_id"),
            F.col("t"),
            F.col("v"),
            stripped.alias("labels"),
        )
        # local wins on a (series, t) collision — fanout.go's primary
        # preference, rendered through the same vertical-dedup operator
        # the store uses for overlapping appends (J6)
        u = local.withColumn("_src", F.lit(1)).unionByName(
            remote.withColumn("_src", F.lit(0))
        )
        out = dedup_vertical(u, precedence_col="_src").drop("_src")
        out = out.select("labels_str", "series_id", "t", "v", "labels")
        return out if with_labels else out.drop("labels")

    def select_sorted(self, matchers: list) -> DataFrame:
        return self.select(matchers).orderBy("labels_str", "t")


def clients_from(configs: list[RemoteReadConfig]) -> list[RemoteReadClient]:
    return [RemoteReadClient(c) for c in configs]
