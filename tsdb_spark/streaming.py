"""Streaming ingest: the reference's Head + WAL re-expressed as
Structured Streaming `foreachBatch` over the partitioned store.

Mapping (SURVEY.md §2.9):

- **WAL + replay (S8/S9/T5)**: the reference logs every append to a WAL
  (wal/wal.go:549-652) and replays it after a crash (head.go:61-85). In
  Spark the source offsets + streaming checkpoint ARE the WAL: a
  restarted query re-delivers every batch not yet committed to the
  sink. Idempotence is ours to provide — the store records the last
  committed epoch id in `_meta.json`, and a replayed batch (epoch ≤
  recorded) is skipped, the same exactly-once contract the reference
  gets from WAL segment truncation after checkpoint
  (checkpoint.go:102-261).
- **bounded lateness (T1)**: the head rejects samples older than
  `minValidTime = maxTime - chunkRange/2` (head.go:773-783). Here the
  high-water mark of ingested event time is tracked in meta and each
  batch is appended with `min_valid_time = hwm - lateness_ms`.
- **head→block auto-flush (T3)**: the reference compacts the head into a
  block once it spans 1.5× the chunk range (db.go:701-759). Here every
  `compact_every` batches the leveled planner (`DB.auto_compact`)
  promotes filled parent ranges — the streaming analog of cutting a
  block behind the ingest frontier.
- **out-of-order / amend policy (T2)**: enforced by `DB.append`
  unchanged — batch rules apply per micro-batch.

The wrapped store stays a plain `DB`: batch appends, selects, deletes,
retention and compaction work concurrently with the stream.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tsdb_spark.db import DB


RATE_OUT_SCHEMA = "labels_str STRING, t LONG, v DOUBLE, rate_bp LONG"
RATE_STATE_SCHEMA = "last_t LONG, last_v DOUBLE"


def series_rate(stream: DataFrame, out_dir: str, checkpoint_dir: str):
    """Per-series instantaneous rate as a CUSTOM STATEFUL streaming
    operator (applyInPandasWithState): for each (labels_str, t, v) emit
    rate = increase / (t - t_prev) in basis points per second, carrying
    (last_t, last_v) per series in checkpointed state across
    micro-batches AND restarts.

    Counter-reset rule (the Prometheus rate() convention): v < v_prev
    means the counter restarted, so the increase is v, not v - v_prev.
    The first sample of a series has no predecessor → rate_bp NULL.

    This is the operator shape batch window functions cannot give a
    stream: a LAG needs the whole partition, while this keeps O(1)
    state per key over unbounded input — the reference's memSeries
    incremental append state (head.go:1669-1720) re-expressed. On a
    finite, time-ordered input the output equals the batch LAG, which
    is exactly what the oracle checks."""
    import pandas as pd

    def fn(key, pdfs, state):
        last_t, last_v = state.get if state.exists else (None, None)
        # a key's batch arrives as multiple Arrow chunks in arbitrary
        # order (arrow.maxRecordsPerBatch splits big groups); the fold
        # needs ONE global time order, so concat before sorting — never
        # sort chunks independently
        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values("t")
        rates = []
        for t, v in zip(pdf["t"], pdf["v"]):
            if last_t is None or t == last_t:
                rates.append(None)
            else:
                inc = v if v < last_v else v - last_v
                rates.append(int(inc * 10000 * 1000 // (t - last_t)))
            last_t, last_v = int(t), float(v)
        if last_t is not None:
            state.update((last_t, last_v))
        yield pdf.assign(rate_bp=pd.array(rates, dtype="Int64"))[
            ["labels_str", "t", "v", "rate_bp"]
        ]

    out = stream.groupBy("labels_str").applyInPandasWithState(
        fn, RATE_OUT_SCHEMA, RATE_STATE_SCHEMA, "append", "NoTimeout"
    )
    return (
        out.writeStream.queryName("tsdb-rate")
        .outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


LAST_OUT_SCHEMA = "labels_str STRING, n_seen LONG, last_t LONG, last_v DOUBLE"
LAST_STATE_SCHEMA = "n_seen LONG, last_t LONG, last_v DOUBLE"


def last_value_stream(stream: DataFrame, out_dir: str, checkpoint_dir: str):
    """Per-series LAST-VALUE serving state — the streaming analog of the
    instant-vector lookback: every micro-batch updates each touched
    series' (last_t, last_v) and a cumulative sample counter, emitting
    the refreshed serving row. State is O(1) per key over unbounded
    input, checkpointed across restarts (the counter is the proof: after
    a restart it keeps counting from the pre-restart total — replay
    would double it, cold state would reset it).

    Update rule, deterministic under arbitrary intra-batch arrival
    order: keep the sample with the highest t; at an exact t tie keep
    the minimum v (the engine's batch amend policy). On a finite input
    the final serving row per series therefore equals the batch
    arg-max — which is exactly what the oracle checks."""
    import pandas as pd

    def fn(key, pdfs, state):
        n, last_t, last_v = state.get if state.exists else (0, None, None)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        n += len(pdf)
        cand = pdf.sort_values(["t", "v"], ascending=[False, True]).iloc[0]
        ct, cv = int(cand["t"]), float(cand["v"])
        if last_t is None or ct > last_t or (ct == last_t and cv < last_v):
            last_t, last_v = ct, cv
        state.update((n, last_t, last_v))
        yield pd.DataFrame(
            {
                "labels_str": [key[0]],
                "n_seen": [n],
                "last_t": [last_t],
                "last_v": [last_v],
            }
        )

    out = stream.groupBy("labels_str").applyInPandasWithState(
        fn, LAST_OUT_SCHEMA, LAST_STATE_SCHEMA, "append", "NoTimeout"
    )
    return (
        # file sinks only support append; each batch APPENDS the
        # refreshed serving row per touched key (a versioned upsert log
        # — readers take the max-n_seen row per key)
        out.writeStream.queryName("tsdb-last-value")
        .outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


STRICT_OUT_SCHEMA = "labels_str STRING, t LONG, v DOUBLE"
STRICT_STATE_SCHEMA = "last_t LONG, last_v DOUBLE"


def strict_append_stream(stream: DataFrame, out_dir: str, checkpoint_dir: str):
    """Strict per-series monotonic ingest — the reference's EXACT head
    append contract (head.go:1681-1699) as a custom stateful streaming
    operator, closing SURVEY §2.9 T2's documented batch/stream gap:

    - t >  last_t            → accepted, state advances
    - t == last_t, v == last_v → duplicate re-append: silent no-op (the
      sink already holds the row; the reference returns the existing ref)
    - t == last_t, v != last_v → ErrAmendSample: REJECTED
    - t <  last_t            → ErrOutOfOrderSample: REJECTED

    Input is (labels_str, t, v, ord) where `ord` is the arrival order
    within the batch (the WAL append order); per-series (last_t, last_v)
    state lives in the checkpointed state store, so rejections hold
    across micro-batches AND restarts — a redelivered amend after a
    crash is still refused, which watermark-scoped dedup
    (`exact_dedup_stream`) cannot promise for a value-changing replay.

    Returns the started StreamingQuery; `out_dir` reads back as parquet
    (labels_str, t, v) holding exactly the accepted appends."""
    import pandas as pd

    def fn(key, pdfs, state):
        last_t, last_v = state.get if state.exists else (None, None)
        # one global arrival order per key — concat every Arrow chunk
        # before sorting (chunks arrive split and unordered)
        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values("ord")
        pdf = pdf.reset_index(drop=True)
        keep = []
        for t, v in zip(pdf["t"], pdf["v"]):
            t, v = int(t), float(v)
            if last_t is None or t > last_t:
                keep.append(True)
                last_t, last_v = t, v
            else:
                # out-of-order, amend, or duplicate no-op: never emitted
                keep.append(False)
        if last_t is not None:
            state.update((last_t, last_v))
        yield pdf.loc[pd.Series(keep, index=pdf.index), ["labels_str", "t", "v"]]

    out = stream.groupBy("labels_str").applyInPandasWithState(
        fn, STRICT_OUT_SCHEMA, STRICT_STATE_SCHEMA, "append", "NoTimeout"
    )
    return (
        out.writeStream.queryName("tsdb-strict-append")
        .outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_rollup(
    stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    window_ms: int = 3600_000,
    delay_ms: int = 7200_000,
):
    """Watermarked tumbling-window rollup of a (labels, t, v) stream into
    an append-mode parquet sink — the reference's 'range query over a
    live head' shape as a first-class streaming aggregation.

    - event time = t (ms) cast to timestamp; watermark = `delay_ms`
      behind the observed maximum (T1's bounded lateness as a true
      Structured Streaming watermark rather than a batch filter);
    - tumbling `window_ms` windows × metric name, count + sum state kept
      in the checkpoint (crash/restart-safe: S8/S9's WAL+replay);
    - append output: a window row is written exactly once, when the
      watermark passes its end — rows later than the watermark are
      DROPPED by the engine, never aggregated.

    Returns the started StreamingQuery; drain with availableNow and read
    `out_dir` back as a plain parquet table of
    (w_start LONG ms, name STRING, n LONG, sum_v DOUBLE)."""
    sec = lambda ms: f"{ms // 1000} seconds"
    agg = (
        stream.select(
            F.timestamp_millis(F.col("t")).alias("ts"),
            F.col("labels")["__name__"].alias("name"),
            "v",
        )
        .withWatermark("ts", sec(delay_ms))
        .groupBy(F.window("ts", sec(window_ms)), "name")
        .agg(F.count("*").alias("n"), F.sum("v").alias("sum_v"))
        .select(
            (F.unix_timestamp(F.col("window.start")) * 1000).alias("w_start"),
            "name",
            "n",
            "sum_v",
        )
    )
    return (
        agg.writeStream.queryName("tsdb-rollup")
        .outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def hist_ingest_stream(
    db: DB,
    stream: DataFrame,
    checkpoint_dir: str,
    width_ms: int = 60_000,
    delay_ms: int = 120_000,
    idx_expr=None,
    trigger: dict | None = None,
):
    """STREAMING native-histogram ingest — closes the batch-only gap
    documented on DB.append_histograms: raw float samples (labels MAP,
    t LONG, v DOUBLE) aggregate into exponential-bucket histogram
    windows as a true watermarked Structured Streaming aggregation, and
    each COMPLETE window lands in the store's histograms table.

    Shape: ONE streaming groupBy((series, window, bucket_idx)) keeps
    per-bucket count/sum state in the checkpoint; APPEND output mode
    means a window's bucket rows emit exactly once, when the watermark
    (`delay_ms` behind max event time) passes window end — so the
    foreachBatch body always sees complete windows and only assembles
    structs (bounded, emitted-rows-sized) before one transactional
    `append_histograms`. Samples later than the watermark are dropped
    by the engine (T1's bounded lateness), partial windows can never
    land, and a replayed batch re-appends identical histograms that
    hist_frame's later-ingest-wins dedup collapses (J6) — the same
    crash-window story as StreamIngestor.process_batch. An epoch guard
    in store meta (`last_hist_epoch`) skips already-committed batches
    on restart (T5)."""
    from tsdb_spark.nativehist import bucket_idx

    sec = lambda ms: f"{ms // 1000} seconds"  # noqa: E731
    idx = F.when(
        F.col("v") > 0,
        idx_expr if idx_expr is not None else bucket_idx(F.col("v"), 0),
    )
    agg = (
        stream.withColumn("labels_str", _labels_str())
        .select(
            "labels_str",
            "labels",
            F.timestamp_millis(F.col("t")).alias("ts"),
            idx.alias("_idx"),
            "v",
        )
        .withWatermark("ts", sec(delay_ms))
        .groupBy(F.window("ts", sec(width_ms)), "labels_str", "_idx")
        .agg(
            F.first("labels").alias("labels"),
            F.count("*").cast("double").alias("_c"),
            F.sum("v").alias("_s"),
        )
        .select(
            "labels_str",
            "labels",
            (F.unix_timestamp(F.col("window.end")) * 1000).alias("t"),
            "_idx",
            "_c",
            "_s",
        )
    )

    def land(batch: DataFrame, epoch_id: int) -> None:
        if epoch_id <= db.meta.get("last_hist_epoch", -1):
            return  # replayed batch after restart — already committed
        if not batch.head(1):
            return  # no window finalized this trigger — nothing to land
        hists = (
            batch.groupBy("labels_str", "t")
            .agg(
                F.first("labels").alias("labels"),
                F.sum("_c").alias("_count"),
                F.sum("_s").alias("_sum"),
                F.sum(
                    F.when(F.col("_idx").isNull(), F.col("_c")).otherwise(0.0)
                ).alias("_zero"),
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("_idx").isNotNull(),
                            F.struct(
                                F.col("_idx").alias("idx"),
                                F.col("_c").alias("c"),
                            ),
                        )
                    )
                ).alias("_buckets"),
            )
            .select(
                "labels",
                "t",
                F.struct(
                    F.col("_count").alias("count"),
                    F.col("_sum").alias("sum"),
                    F.col("_zero").alias("zero_count"),
                    F.lit(0).alias("schema"),
                    F.col("_buckets").alias("buckets"),
                    F.lit(None).cast("array<double>").alias("custom_values"),
                ).alias("h"),
            )
        )
        db.append_histograms(hists)
        db.meta["last_hist_epoch"] = epoch_id
        db._write_meta()

    writer = (
        agg.writeStream.queryName("tsdb-hist-ingest")
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(land)
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def _labels_str():
    from tsdb_spark import labels as L

    return L.labels_str_expr("labels")


def exact_dedup_stream(
    stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    delay_ms: int = 2 * 86_400_000,
):
    """Streaming exact deduplication over an at-least-once source:
    `dropDuplicatesWithinWatermark` on (labels_str, t, v) with the
    dedup-key state bounded by an event-time watermark.

    The state problem plain `dropDuplicates` has on an unbounded stream
    (one key kept forever per distinct row) is exactly the reference's
    WAL-replay dedup problem: after a crash, the source re-delivers
    records the sink already committed. Bounding the key state to the
    watermark window is the streaming analog of truncating the WAL
    behind the checkpoint (checkpoint.go:102-261) — a duplicate can only
    arrive within the redelivery horizon, so only that horizon's keys
    are kept. Re-delivered rows older than the watermark are dropped as
    late by the engine — also correct, since a re-delivery is by
    definition a duplicate.

    Returns the started StreamingQuery; `out_dir` reads back as parquet
    (labels_str STRING, t LONG, v DOUBLE) with exactly one row per
    distinct input row, across micro-batches AND restarts."""
    sec = delay_ms // 1000
    deduped = (
        stream.withColumn("ts", F.timestamp_millis(F.col("t")))
        .withWatermark("ts", f"{sec} seconds")
        .dropDuplicatesWithinWatermark(["labels_str", "t", "v"])
        .select("labels_str", "t", "v")
    )
    return (
        deduped.writeStream.queryName("tsdb-stream-dedup")
        .outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


@dataclass
class StreamIngestor:
    """Drives a streaming DataFrame of (labels MAP<STRING,STRING>,
    t LONG, v DOUBLE) into a DB via foreachBatch.

    lateness_ms: samples older than (high-water-mark - lateness_ms) are
        rejected, mirroring head.go:773-783. None disables the bound.
    compact_every: run `DB.auto_compact()` after every N committed
        batches (0 disables auto-flush).
    vacuum_every: run `DB.vacuum()` after every N committed batches
        (0 disables) — every micro-batch adds a file per touched
        bucket, so a long-running stream needs periodic small-file
        defragmentation even when no compaction is due.
    """

    db: DB
    lateness_ms: int | None = None
    compact_every: int = 0
    vacuum_every: int = 0
    _batches_done: int = 0

    # -- foreachBatch body (public so tests can drive it directly) --

    def process_batch(self, batch: DataFrame, epoch_id: int) -> None:
        last = self.db.meta.get("last_stream_epoch", -1)
        if epoch_id <= last:
            # replayed batch after restart — already committed (T5)
            return
        min_valid = None
        hwm = self.db.meta.get("stream_high_water_ms")
        if self.lateness_ms is not None and hwm is not None:
            min_valid = hwm - self.lateness_ms
        # one metadata-sized job for the batch's event-time frontier
        mx = batch.agg(F.max("t").alias("m")).collect()[0]["m"]
        # warm_index=False: per-micro-batch dim warm-up would tax ingest
        # latency; the dim cache refreshes lazily on first read instead
        self.db.append(batch, min_valid_time=min_valid, warm_index=False)
        if mx is not None:
            self.db.meta["stream_high_water_ms"] = max(hwm or mx, mx)
        # epoch id commits with the same atomic meta write as the
        # ingest-seq bump. Crash window (samples committed, epoch not):
        # the batch replays and appends AGAIN — but the re-touched
        # buckets are flagged overlapping, and vertical dedup collapses
        # the identical (series, t, v) copies at read, so replays stay
        # invisible to queries (the reference gets the same effect from
        # WAL replay into the dedup'ing head, head.go:1694-1696)
        self.db.meta["last_stream_epoch"] = epoch_id
        self.db._write_meta()
        self._batches_done += 1
        if self.compact_every and self._batches_done % self.compact_every == 0:
            self.db.auto_compact()
        if self.vacuum_every and self._batches_done % self.vacuum_every == 0:
            self.db.vacuum()

    def start(
        self,
        stream: DataFrame,
        checkpoint_dir: str,
        trigger: dict | None = None,
        query_name: str = "tsdb-ingest",
    ):
        """Attach to a streaming DataFrame and start the query.

        trigger: kwargs for DataStreamWriter.trigger, e.g.
        {"availableNow": True} (drain-and-stop, the test/backfill mode)
        or {"processingTime": "10 seconds"}.
        """
        w = (
            stream.writeStream.queryName(query_name)
            .foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("update")
        )
        if trigger:
            w = w.trigger(**trigger)
        return w.start()

from contextlib import contextmanager


@contextmanager
def stream_shuffle_partitions(spark, n: int = 8):
    """Scope a smaller shuffle-partition count over a streaming query's
    start+drain.

    A stateful streaming query materializes one state store (files,
    snapshots, maintenance threads) PER shuffle partition PER micro-
    batch; the batch session's 32 partitions are pure fixed cost at
    gate scale. The value is captured into the query's checkpoint at
    first start, so it must wrap the whole start→awaitTermination span
    (the conf is read asynchronously at first-batch planning). At
    cluster scale, size it to the key cardinality instead."""
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    spark.conf.set(key, str(n))
    try:
        yield
    finally:
        spark.conf.set(key, old)
