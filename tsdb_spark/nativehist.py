"""Native (exponential-bucket) histograms — the prometheus 3.x sample
type the reference's float64-only chunk model cannot hold
(chunkenc/chunk.go:59-64 knows only (t, float64); native histograms
live in chunkenc/histogram.go upstream). Here a histogram sample is an
optional STRUCT column `h` beside the float `v`:

    h: STRUCT<count DOUBLE, sum DOUBLE, zero_count DOUBLE,
              schema INT, buckets ARRAY<STRUCT<idx INT, c DOUBLE>>>

with the upstream standard exponential mapping: at `schema` s, bucket
`idx` covers (base^(idx-1), base^idx] where base = 2^(2^-s)
(model/histogram/generic.go getBound). Simplifications vs upstream,
documented as the supported subset:

- positive buckets only; samples <= 0 land in the zero bucket with
  zero_threshold == 0 (so rank-in-zero-bucket quantiles return 0);
- no counter-reset hints / no float-vs-int distinction (counts are
  DOUBLE, as upstream's float histograms);
- no span encoding: buckets are a sorted sparse (idx, count) array —
  the columnar analog of upstream's span+delta layout, which exists to
  compress the WIRE format; Parquet already delta/dict-encodes arrays.

NHCB — custom-bucket native histograms (prometheus 3.x schema -53,
model/histogram CustomBucketsSchema): `custom_values` carries the
sorted upper bounds of a CLASSIC histogram converted to the native
representation (the convert_classic_histograms_to_nhcb scrape flag /
rw2 interop). Bucket `idx` is 0-based into custom_values — bucket i
covers (custom_values[i-1], custom_values[i]] with the first bucket
open below, and idx == len(custom_values) is the +Inf overflow bucket
(upstream stores no +Inf bound). zero bucket unused (zero_count 0).
For exponential histograms custom_values is NULL.

Everything below is pure Column algebra (no UDFs): construction is two
map-side-combinable groupBys; the quantile is one `aggregate` fold over
the (short) bucket array inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HIST_TYPE = (
    "STRUCT<count: DOUBLE, sum: DOUBLE, zero_count: DOUBLE, "
    "schema: INT, buckets: ARRAY<STRUCT<idx: INT, c: DOUBLE>>, "
    "custom_values: ARRAY<DOUBLE>>"
)

#: model/histogram CustomBucketsSchema — the sentinel schema marking a
#: custom-bucket (NHCB) histogram
CUSTOM_BUCKETS_SCHEMA = -53

def no_custom_values() -> Column:
    """The custom_values expression producers append for exponential
    histograms (NULL — only NHCB carries bounds)."""
    return F.lit(None).cast("array<double>")


def bucket_idx(v: Column, schema: int = 0) -> Column:
    """Exponential bucket index of a positive value: the smallest idx
    with v <= base^idx, i.e. ceil(log2(v) * 2^schema)
    (model/histogram/generic.go mapToIndex)."""
    return F.ceil(F.log2(v) * F.lit(float(2 ** schema))).cast("int")


def bucket_upper(idx: Column, schema: int = 0) -> Column:
    """Upper bound base^idx = 2^(idx / 2^schema)."""
    return F.pow(F.lit(2.0), idx.cast("double") / F.lit(float(2 ** schema)))


def int_bucket_idx(v: Column) -> Column:
    """Schema-0 bucket index for POSITIVE INTEGER-VALUED samples via
    exact integer arithmetic: ceil(log2(c)) == len(bin(c-1)) for c > 1.
    Float log2 is correctly-rounded-ish but engine-specific at exact
    powers of two (ulp flips change the bucket); oracle-paired entries
    use this instead so Spark and the SQL oracle bucket identically."""
    c = v.cast("long")
    return F.when(c <= 1, F.lit(0)).otherwise(
        F.length(F.bin(c - 1)).cast("int")
    )


def build_histograms(
    samples: DataFrame,
    width_ms: int,
    schema: int = 0,
    idx_expr=None,
    cumulative: bool = False,
) -> DataFrame:
    """Aggregate raw float samples (labels_str, labels, t, v) into one
    native-histogram sample per (series, window): the window
    [W, W+width) is stamped at its END boundary t = W+width (the
    scrape-at-window-close reading). Two combinable groupBys: values →
    per-bucket counts → per-histogram struct; nothing leaves the JVM.
    `idx_expr` overrides the bucket-index expression (e.g.
    int_bucket_idx for exact cross-engine bucketing of integer values).

    `cumulative=True` emits COUNTER histograms — each window's struct
    carries the running totals since the series' first window, the
    upstream scrape semantics that make rate/increase boundary
    differences correct. Implemented as a densified per-bucket running
    sum: (series windows × series buckets) lattice, one ordered window
    per (series, bucket) — rows ∝ histograms × buckets-per-series,
    never a re-scan of earlier samples."""
    idx = F.when(
        F.col("v") > 0,
        idx_expr if idx_expr is not None else bucket_idx(F.col("v"), schema),
    )
    per_bucket = (
        samples.withColumn(
            "_th",
            (F.col("t") - F.pmod(F.col("t"), F.lit(width_ms)) + width_ms).cast(
                "long"
            ),
        )
        .withColumn("_idx", idx)
        .groupBy("labels_str", "_th", "_idx")
        .agg(
            F.first("labels").alias("labels"),
            F.count("*").cast("double").alias("_c"),
            F.sum("v").alias("_s"),
        )
    )
    if cumulative:
        from pyspark.sql import Window

        # the zero bucket's NULL idx never matches a join key — ride a
        # sentinel through the lattice and decode after
        sent = -(2**31)
        pb = per_bucket.withColumn(
            "_ik", F.coalesce(F.col("_idx"), F.lit(sent))
        )
        wins = pb.select("labels_str", "_th").distinct()
        bkts = pb.select("labels_str", "_ik").distinct()
        lab = pb.groupBy("labels_str").agg(F.first("labels").alias("labels"))
        dense = (
            wins.join(bkts, "labels_str")
            .join(
                pb.select("labels_str", "_th", "_ik", "_c", "_s"),
                ["labels_str", "_th", "_ik"],
                "left",
            )
            .join(lab, "labels_str")
        )
        w = (
            Window.partitionBy("labels_str", "_ik")
            .orderBy("_th")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        per_bucket = dense.select(
            "labels_str",
            "_th",
            F.nullif(F.col("_ik"), F.lit(sent)).alias("_idx"),
            "labels",
            F.sum(F.coalesce(F.col("_c"), F.lit(0.0))).over(w).alias("_c"),
            F.sum(F.coalesce(F.col("_s"), F.lit(0.0))).over(w).alias("_s"),
        ).filter(F.col("_c") > 0)
    return (
        per_bucket.groupBy("labels_str", "_th")
        .agg(
            F.first("labels").alias("labels"),
            F.sum("_c").alias("_count"),
            F.sum("_s").alias("_sum"),
            F.sum(F.when(F.col("_idx").isNull(), F.col("_c")).otherwise(0.0)).alias(
                "_zero"
            ),
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("_idx").isNotNull(),
                        F.struct(
                            F.col("_idx").alias("idx"), F.col("_c").alias("c")
                        ),
                    )
                )
            ).alias("_buckets"),
        )
        .select(
            "labels_str",
            "labels",
            F.col("_th").alias("t"),
            F.struct(
                F.col("_count").alias("count"),
                F.col("_sum").alias("sum"),
                F.col("_zero").alias("zero_count"),
                F.lit(schema).alias("schema"),
                F.col("_buckets").alias("buckets"),
                no_custom_values().alias("custom_values"),
            ).cast(HIST_TYPE).alias("h"),
        )
    )


def custom_bucket_idx(v: Column, bounds: list[float]) -> Column:
    """NHCB bucket index of a value over classic `le` upper bounds:
    the number of bounds strictly below v — v <= bounds[0] → 0,
    v > bounds[-1] → len(bounds) (the +Inf overflow bucket). Upper-
    inclusive like classic le buckets."""
    arr = F.array(*[F.lit(float(b)) for b in bounds])
    return F.size(F.filter(arr, lambda b: b < v)).cast("int")


def build_custom_histograms(
    samples: DataFrame, width_ms: int, bounds: list[float]
) -> DataFrame:
    """Aggregate raw float samples into NHCB histograms (schema -53)
    over explicit classic bounds — the engine-side analog of upstream's
    classic→NHCB conversion. Same two-groupBy shape as
    build_histograms; every value (zero/negative included) lands in a
    custom bucket, so the zero bucket stays 0 like upstream NHCB."""
    bounds = sorted(float(b) for b in bounds)
    per_bucket = (
        samples.withColumn(
            "_th",
            (F.col("t") - F.pmod(F.col("t"), F.lit(width_ms)) + width_ms).cast(
                "long"
            ),
        )
        .withColumn("_idx", custom_bucket_idx(F.col("v"), bounds))
        .groupBy("labels_str", "_th", "_idx")
        .agg(
            F.first("labels").alias("labels"),
            F.count("*").cast("double").alias("_c"),
            F.sum("v").alias("_s"),
        )
    )
    cv = F.array(*[F.lit(b) for b in bounds])
    return (
        per_bucket.groupBy("labels_str", "_th")
        .agg(
            F.first("labels").alias("labels"),
            F.sum("_c").alias("_count"),
            F.sum("_s").alias("_sum"),
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("_idx").alias("idx"), F.col("_c").alias("c")
                    )
                )
            ).alias("_buckets"),
        )
        .select(
            "labels_str",
            "labels",
            F.col("_th").alias("t"),
            F.struct(
                F.col("_count").alias("count"),
                F.col("_sum").alias("sum"),
                F.lit(0.0).alias("zero_count"),
                F.lit(CUSTOM_BUCKETS_SCHEMA).alias("schema"),
                F.col("_buckets").alias("buckets"),
                cv.alias("custom_values"),
            ).cast(HIST_TYPE).alias("h"),
        )
    )


def classic_to_nhcb(frame: DataFrame) -> DataFrame:
    """Convert CLASSIC histogram series to NHCB samples — the
    `convert_classic_histograms_to_nhcb` scrape-flag analog
    (scrape/scrape.go + model/histogram NHCB): input is a float frame
    (labels, t, v) carrying `X_bucket{le=...}` cumulative series and
    optionally `X_sum`; output is one (labels_str, labels, t, h) NHCB
    row per (X, base labels, t) with custom_values = the sorted finite
    le bounds, buckets = the NON-cumulative per-bucket counts (overflow
    idx len(bounds) for the +Inf remainder), count from the +Inf
    cumulative, sum from X_sum where present (0 otherwise, like a
    sum-less classic scrape).

    Pure Column algebra: a name/le projection, one groupBy per
    (series, t) collecting (le, cum) pairs, and an index-walk transform
    that differences adjacent cumulative counts — no UDFs, map-side
    combinable, the same shape at 10^2 or 10^9 series."""
    from tsdb_spark import labels as L

    name = F.element_at("labels", F.lit("__name__"))
    base = F.regexp_replace(name, "_bucket$", "")
    stripped = F.map_filter(
        F.col("labels"),
        lambda k, _: (k != F.lit("le")) & (k != F.lit("__name__")),
    )
    le_s = F.element_at("labels", F.lit("le"))
    le_v = (
        F.when(le_s == "+Inf", F.lit(float("inf")))
        .otherwise(le_s.cast("double"))
    )
    b = (
        frame.filter(name.endswith("_bucket") & le_s.isNotNull())
        .select(
            base.alias("_m"), stripped.alias("_lab"), "t",
            le_v.alias("_le"), F.col("v").alias("_cum"),
        )
        .filter(F.col("_le").isNotNull())
        .groupBy(L.labels_str_expr("_lab").alias("_k"), "_m", "t")
        .agg(
            F.first("_lab").alias("_lab"),
            F.array_sort(
                F.collect_list(F.struct(F.col("_le"), F.col("_cum")))
            ).alias("_pairs"),
        )
    )
    inf = F.lit(float("inf"))
    pairs = F.col("_pairs")
    finite = F.filter(pairs, lambda p: p.getField("_le") != inf)
    total = F.coalesce(
        F.element_at(pairs, F.size(pairs)).getField("_cum"), F.lit(0.0)
    )
    idxs = F.sequence(F.lit(0), F.size(finite) - 1)
    noncum = F.transform(
        idxs,
        lambda i: F.struct(
            i.cast("int").alias("idx"),
            (
                F.element_at(finite, i + 1).getField("_cum")
                - F.when(
                    i > 0, F.element_at(finite, i).getField("_cum")
                ).otherwise(0.0)
            ).alias("c"),
        ),
    )
    overflow = total - F.coalesce(
        F.element_at(finite, F.size(finite)).getField("_cum"), F.lit(0.0)
    )
    buckets = F.filter(
        F.concat(
            noncum,
            F.array(
                F.struct(
                    F.size(finite).cast("int").alias("idx"),
                    overflow.alias("c"),
                )
            ),
        ),
        lambda s: s.getField("c") != 0.0,
    )
    cv = F.transform(finite, lambda p: p.getField("_le"))
    sums = (
        frame.filter(name.endswith("_sum"))
        .select(
            F.regexp_replace(name, "_sum$", "").alias("_m"),
            F.map_filter(
                F.col("labels"), lambda k, _: k != F.lit("__name__")
            ).alias("_slab"),
            "t",
            F.col("v").alias("_sum"),
        )
        .select(
            L.labels_str_expr("_slab").alias("_k"), "_m", "t", "_sum"
        )
    )
    out_labels = F.map_concat(
        F.col("_lab"), F.create_map(F.lit("__name__"), F.col("_m"))
    )
    return (
        b.join(sums, ["_k", "_m", "t"], "left")
        .select(
            out_labels.alias("labels"),
            "t",
            F.struct(
                total.alias("count"),
                F.coalesce(F.col("_sum"), F.lit(0.0)).alias("sum"),
                F.lit(0.0).alias("zero_count"),
                F.lit(CUSTOM_BUCKETS_SCHEMA).alias("schema"),
                buckets.alias("buckets"),
                cv.alias("custom_values"),
            ).cast(HIST_TYPE).alias("h"),
        )
        .withColumn("labels_str", L.labels_str_expr("labels"))
        .select("labels_str", "labels", "t", "h")
    )


def hist_count(h: Column) -> Column:
    """histogram_count(v) — promql/functions.go funcHistogramCount."""
    return h.getField("count")


def hist_sum(h: Column) -> Column:
    """histogram_sum(v) — funcHistogramSum."""
    return h.getField("sum")


def hist_avg(h: Column) -> Column:
    """histogram_avg(v) = sum/count — funcHistogramAvg."""
    return h.getField("sum") / h.getField("count")


def hist_quantile(phi: float, h: Column) -> Column:
    """Native histogram_quantile(phi, v) — promql/quantile.go
    histogramQuantile: rank = phi * count walks the cumulative buckets
    (zero bucket first), then linear interpolation between the found
    bucket's bounds. phi < 0 → -Inf, phi > 1 → +Inf (upstream edge
    rules); rank inside the zero bucket → 0 (zero_threshold == 0 in
    this engine's subset). One `aggregate` fold over the sorted sparse
    bucket array — short, data-independent, codegen'd.

    NHCB (schema -53): bucket bounds come from `custom_values` instead
    of the exponential mapping, with the classic bucketQuantile rules
    (promql/quantile.go): rank in the +Inf overflow bucket returns the
    last finite bound; rank in the first bucket interpolates from 0
    (unless its upper bound is <= 0, which returns the bound)."""
    if phi < 0:
        return F.lit(float("-inf"))
    if phi > 1:
        return F.lit(float("inf"))
    count = h.getField("count")
    zero = h.getField("zero_count")
    sch = h.getField("schema")
    cv = h.getField("custom_values")
    is_custom = sch == F.lit(CUSTOM_BUCKETS_SCHEMA)
    rank = F.lit(float(phi)) * count
    two_pow_schema = F.pow(F.lit(2.0), sch.cast("double"))

    def upper(idx):
        exp = F.pow(F.lit(2.0), idx.cast("double") / two_pow_schema)
        return F.when(
            is_custom,
            F.when(idx < F.size(cv), F.element_at(cv, idx + 1)).otherwise(
                F.lit(float("inf"))
            ),
        ).otherwise(exp)

    def lower(idx):
        exp = F.pow(F.lit(2.0), (idx - 1).cast("double") / two_pow_schema)
        return F.when(
            is_custom,
            F.when(idx <= 0, F.lit(0.0)).otherwise(F.element_at(cv, idx)),
        ).otherwise(exp)

    init = F.struct(
        zero.alias("cum"),
        F.when((zero > 0) & (rank <= zero), 0.0).alias("q"),
    )

    def step(acc, b):
        cum2 = acc.getField("cum") + b.getField("c")
        idx = b.getField("idx")
        lo = lower(idx)
        hi = upper(idx)
        interp = lo + (hi - lo) * (rank - acc.getField("cum")) / b.getField("c")
        # NHCB edge rules (classic bucketQuantile): the +Inf overflow
        # bucket answers the last finite bound; a first bucket whose
        # upper bound is <= 0 answers the bound itself
        interp = (
            F.when(
                is_custom & (idx >= F.size(cv)),
                F.element_at(cv, F.size(cv)),
            )
            .when(is_custom & (idx == 0) & (hi <= 0), hi)
            .otherwise(interp)
        )
        return F.when(acc.getField("q").isNotNull(), acc).otherwise(
            F.struct(
                cum2.alias("cum"),
                F.when(cum2 >= rank, interp).alias("q"),
            )
        )

    folded = F.aggregate(h.getField("buckets"), init, step)
    # phi == 0 with an empty zero bucket: upstream returns the lower
    # bound of the lowest populated bucket; the fold lands there with
    # rank 0 → interp == lo, so only the all-empty histogram needs the
    # NaN fallback
    return F.when(count > 0, folded.getField("q")).otherwise(
        F.lit(float("nan"))
    )


def hist_sub(last: Column, first: Column, factor) -> Column:
    """The component-wise histogram difference (last − first) · factor —
    the native-histogram rate/increase/delta kernel (promql/functions.go
    histogramRate). The caller supplies the boundary-extrapolation
    factor (the float path's extrapolatedRate rule; histograms skip the
    float-only zero-crossing cap, as upstream does). No counter-reset
    rewind — documented subset.
    Bucket subtraction is a map_zip_with over the UNION of bucket
    indices (sparse arrays → maps → zip − → sorted sparse array), all
    inside codegen."""
    fac = F.lit(float(factor)) if not isinstance(factor, Column) else factor

    def as_map(h):
        return F.map_from_entries(
            F.transform(
                h.getField("buckets"),
                lambda b: F.struct(
                    b.getField("idx").alias("idx"), b.getField("c").alias("c")
                ),
            )
        )

    diff = F.map_zip_with(
        as_map(last),
        as_map(first),
        lambda _, c2, c1: (
            F.coalesce(c2, F.lit(0.0)) - F.coalesce(c1, F.lit(0.0))
        )
        * fac,
    )
    buckets = F.array_sort(
        F.filter(
            F.transform(
                F.map_entries(diff),
                lambda e: F.struct(
                    e.getField("key").alias("idx"),
                    e.getField("value").alias("c"),
                ),
            ),
            lambda b: b.getField("c") != 0.0,
        )
    )
    return F.struct(
        ((last.getField("count") - first.getField("count")) * fac).alias(
            "count"
        ),
        ((last.getField("sum") - first.getField("sum")) * fac).alias("sum"),
        (
            (last.getField("zero_count") - first.getField("zero_count"))
            * fac
        ).alias("zero_count"),
        last.getField("schema").alias("schema"),
        buckets.alias("buckets"),
        # custom bounds are series-constant; the difference keeps them
        last.getField("custom_values").alias("custom_values"),
    )


def _bounds_exprs(h: Column):
    """(lower(idx), upper(idx)) Column factories covering BOTH bucket
    geometries: exponential (base^(idx-1), base^idx] and, when schema
    is -53, NHCB custom bounds (cv[idx-1], cv[idx]] with the first
    bucket open from 0 and the overflow bucket's upper at +Inf."""
    sch = h.getField("schema")
    cv = h.getField("custom_values")
    is_custom = sch == F.lit(CUSTOM_BUCKETS_SCHEMA)
    two_pow_schema = F.pow(F.lit(2.0), sch.cast("double"))

    def upper(idx):
        exp = F.pow(F.lit(2.0), idx.cast("double") / two_pow_schema)
        return F.when(
            is_custom,
            F.when(idx < F.size(cv), F.element_at(cv, idx + 1)).otherwise(
                F.lit(float("inf"))
            ),
        ).otherwise(exp)

    def lower(idx):
        exp = F.pow(F.lit(2.0), (idx - 1).cast("double") / two_pow_schema)
        return F.when(
            is_custom,
            F.when(idx <= 0, F.lit(0.0)).otherwise(F.element_at(cv, idx)),
        ).otherwise(exp)

    return lower, upper


def hist_stdvar(h: Column) -> Column:
    """histogram_stdvar(v) — promql/functions.go funcHistogramStdDev/
    StdVar: the estimated variance of the observations, each bucket's
    mass placed at its ARITHMETIC bucket midpoint (upstream uses the
    geometric mean for wide buckets post-3.0-beta; the stable released
    rule is (lower+upper)/2, used here), the zero bucket at 0. One
    aggregate fold: Σ c·(mid − mean)² / count with mean = sum/count.
    NHCB (schema -53): midpoints come from the custom bounds; the
    infinite-upper overflow bucket sits at its lower bound (the
    upstream rule for unbounded buckets)."""
    count = h.getField("count")
    mean = h.getField("sum") / count
    lower, upper = _bounds_exprs(h)

    def step(acc, b):
        lo = lower(b.getField("idx"))
        hi = upper(b.getField("idx"))
        mid = F.when(hi == F.lit(float("inf")), lo).otherwise((lo + hi) / 2.0)
        return acc + b.getField("c") * (mid - mean) * (mid - mean)

    dev = F.aggregate(h.getField("buckets"), F.lit(0.0), step)
    dev = dev + h.getField("zero_count") * mean * mean  # zero bucket at 0
    return F.when(count > 0, dev / count).otherwise(F.lit(float("nan")))


def hist_stddev(h: Column) -> Column:
    """histogram_stddev(v) = sqrt(histogram_stdvar(v))."""
    return F.sqrt(hist_stdvar(h))


def hist_fraction(lo: float, hi: float, h: Column) -> Column:
    """histogram_fraction(lo, hi, v) — the estimated fraction of
    observations in [lo, hi] (promql/quantile.go histogramFraction),
    positive-bucket subset: per bucket, the linearly-interpolated
    overlap of [lo, hi] with the bucket's bounds, plus the zero bucket
    when lo <= 0. NHCB (schema -53): bounds come from custom_values;
    the infinite-width overflow bucket counts fully when [lo, hi]
    contains it (hi = +Inf and lo at-or-below its lower bound) and
    contributes nothing to a finite query range — interpolating a
    finite slice of an unbounded bucket has no defined density."""
    count = h.getField("count")
    zero = h.getField("zero_count")
    lower, upper = _bounds_exprs(h)

    lo_c, hi_c = F.lit(float(lo)), F.lit(float(hi))
    inf = F.lit(float("inf"))

    def step(acc, b):
        bl = lower(b.getField("idx"))
        bh = upper(b.getField("idx"))
        ov_lo = F.greatest(bl, lo_c)
        ov_hi = F.least(bh, hi_c)
        frac = F.when(
            bh == inf,
            F.when((hi_c == inf) & (lo_c <= bl), F.lit(1.0)).otherwise(0.0),
        ).otherwise(
            F.greatest(F.lit(0.0), (ov_hi - ov_lo) / (bh - bl))
        )
        return acc + b.getField("c") * F.least(F.lit(1.0), frac)

    inside = F.aggregate(h.getField("buckets"), F.lit(0.0), step)
    inside = inside + F.when((lo_c <= 0) & (hi_c >= 0), zero).otherwise(0.0)
    return F.when(count > 0, inside / count).otherwise(F.lit(float("nan")))


def _bucket_map(h: Column, shift: Column) -> Column:
    """buckets → MAP<idx', count> with an exponential downscale applied:
    idx' = ceil(idx / 2^shift) merges 2^shift neighboring buckets into
    the coarser grid (histogram.go ReduceResolution's index rule);
    shift 0 is the identity. NHCB indices are positional and never
    rescaled — callers guarantee shift 0 for schema -53."""

    def nidx(i: Column) -> Column:
        return F.ceil(
            i.cast("double") / F.pow(F.lit(2.0), shift.cast("double"))
        ).cast("int")

    return F.aggregate(
        h.getField("buckets"),
        F.create_map().cast("map<int,double>"),
        lambda acc, b: F.map_concat(
            F.map_filter(acc, lambda k, _: k != nidx(b.getField("idx"))),
            F.create_map(
                nidx(b.getField("idx")),
                F.coalesce(
                    F.element_at(acc, nidx(b.getField("idx"))), F.lit(0.0)
                )
                + b.getField("c"),
            ),
        ),
    )


def hist_binop(a: Column, b: Column, op: str) -> Column:
    """h + h / h − h component-wise (promql/engine.go histogram-valued
    VectorBinop; histogram.go Add/Sub): mismatched exponential schemas
    downscale BOTH sides to the coarser (lesser) schema before the
    bucket-wise union merge — the same resolution rule rate/sum apply
    at decode (ReduceResolution) — and count/sum/zero_count add or
    subtract directly. Zero-count result buckets drop, keeping the
    sparse representation canonical. Callers drop incompatible pairs
    (mixed NHCB/exponential, differing custom bounds) BEFORE this
    expression — upstream skips those samples with a warning
    annotation. All codegen-side: maps + zips, no UDFs."""
    if op not in ("+", "-"):
        raise ValueError(f"histogram {op} histogram is not defined")
    sign = F.lit(1.0 if op == "+" else -1.0)
    target = F.least(a.getField("schema"), b.getField("schema"))
    merged = F.map_zip_with(
        _bucket_map(a, a.getField("schema") - target),
        _bucket_map(b, b.getField("schema") - target),
        lambda _, ca, cb: F.coalesce(ca, F.lit(0.0))
        + sign * F.coalesce(cb, F.lit(0.0)),
    )
    buckets = F.array_sort(
        F.filter(
            F.transform(
                F.map_entries(merged),
                lambda e: F.struct(
                    e.getField("key").alias("idx"),
                    e.getField("value").alias("c"),
                ),
            ),
            lambda x: x.getField("c") != 0.0,
        )
    )
    return F.struct(
        (a.getField("count") + sign * b.getField("count")).alias("count"),
        (a.getField("sum") + sign * b.getField("sum")).alias("sum"),
        (
            a.getField("zero_count") + sign * b.getField("zero_count")
        ).alias("zero_count"),
        target.alias("schema"),
        buckets.alias("buckets"),
        a.getField("custom_values").alias("custom_values"),
    )


def hist_compatible(a: Column, b: Column) -> Column:
    """True where two histogram samples may combine: both NHCB with
    identical custom bounds, or both exponential. Upstream's
    histogram.Add errors on custom-bucket mismatch and the engine
    skips the sample pair — this predicate is that skip as a filter."""
    nhcb_a = a.getField("schema") == F.lit(-53)
    nhcb_b = b.getField("schema") == F.lit(-53)
    same_cv = (
        a.getField("custom_values").eqNullSafe(b.getField("custom_values"))
    )
    return (~nhcb_a & ~nhcb_b) | (nhcb_a & nhcb_b & same_cv)


def hist_scale(h: Column, factor) -> Column:
    """h * scalar (and h / scalar as multiplication by the inverse) —
    engine.go VectorBinop's histogram-scalar arithmetic: every
    component scales; schema and custom bounds are untouched."""
    fac = F.lit(float(factor)) if not isinstance(factor, Column) else factor
    return F.struct(
        (h.getField("count") * fac).alias("count"),
        (h.getField("sum") * fac).alias("sum"),
        (h.getField("zero_count") * fac).alias("zero_count"),
        h.getField("schema").alias("schema"),
        F.transform(
            h.getField("buckets"),
            lambda b: F.struct(
                b.getField("idx").alias("idx"),
                (b.getField("c") * fac).alias("c"),
            ),
        ).alias("buckets"),
        h.getField("custom_values").alias("custom_values"),
    )
