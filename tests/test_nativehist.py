"""Native (exponential-bucket) histograms: construction, the
histogram_count/sum/avg/quantile/fraction functions vs a direct Python
model of promql/quantile.go, and the evaluator integration."""

import math

import pytest
from pyspark.sql import functions as F

from tsdb_spark import labels as L
from tsdb_spark import promql as P
from tsdb_spark.nativehist import build_histograms

STEP = 10_000


@pytest.fixture(scope="module")
def hist_frame(spark):
    # two series, values spread over exponential buckets; window 10s
    rows = []
    vals = {
        "a": [0.7, 1.5, 3.0, 3.5, 9.9, 0.0, 2.0, 4.0],
        "b": [16.0, 20.0, 31.9, 64.0],
    }
    for s, vs in vals.items():
        for i, v in enumerate(vs):
            rows.append(({"__name__": "lat", "s": s}, 1_000 + i * 1_000, v))
    df = spark.createDataFrame(
        rows, "labels MAP<STRING,STRING>, t LONG, v DOUBLE"
    ).withColumn("labels_str", L.labels_str_expr("labels"))
    return build_histograms(df, STEP)


def model_hist(vs, schema=0):
    buckets = {}
    zero = 0
    for v in vs:
        if v <= 0:
            zero += 1
        else:
            idx = math.ceil(math.log2(v) * 2 ** schema)
            buckets[idx] = buckets.get(idx, 0) + 1
    return zero, dict(sorted(buckets.items()))


def model_quantile(phi, zero, buckets, schema=0):
    total = zero + sum(buckets.values())
    if total == 0:
        return float("nan")
    rank = phi * total
    if zero > 0 and rank <= zero:
        return 0.0
    cum = zero
    for idx, c in sorted(buckets.items()):
        if cum + c >= rank:
            lo = 2.0 ** ((idx - 1) / 2 ** schema)
            hi = 2.0 ** (idx / 2 ** schema)
            return lo + (hi - lo) * (rank - cum) / c
        cum += c
    return float("nan")


def test_build_histograms(hist_frame):
    rows = {dict(r["labels"])["s"]: r for r in hist_frame.collect()}
    assert set(rows) == {"a", "b"}
    ha = rows["a"]["h"]
    assert ha["count"] == 8.0 and ha["zero_count"] == 1.0
    assert abs(ha["sum"] - sum([0.7, 1.5, 3.0, 3.5, 9.9, 0.0, 2.0, 4.0])) < 1e-9
    got = {b["idx"]: b["c"] for b in ha["buckets"]}
    zero, want = model_hist([0.7, 1.5, 3.0, 3.5, 9.9, 0.0, 2.0, 4.0])
    assert got == want and zero == 1
    # histogram stamped at the window END boundary
    assert rows["a"]["t"] == 10_000


@pytest.mark.parametrize("phi", [0.0, 0.1, 0.5, 0.9, 0.99, 1.0])
def test_native_quantile_matches_model(spark, hist_frame, phi):
    q = P.RangeQuery(hist_frame.withColumn("v", F.lit(0.0)),
                     10_000, 10_000, STEP)
    got = {
        dict(r["labels"])["s"]: r["value"]
        for r in q.run(f"histogram_quantile({phi}, lat)").collect()
    }
    vals = {
        "a": [0.7, 1.5, 3.0, 3.5, 9.9, 0.0, 2.0, 4.0],
        "b": [16.0, 20.0, 31.9, 64.0],
    }
    for s, vs in vals.items():
        zero, buckets = model_hist(vs)
        want = model_quantile(phi, zero, buckets)
        assert math.isclose(got[s], want, rel_tol=1e-12), (s, got[s], want)


def test_native_count_sum_avg_fraction(spark, hist_frame):
    frame = hist_frame.withColumn("v", F.lit(0.0))
    q = P.RangeQuery(frame, 10_000, 10_000, STEP)

    def one(expr):
        return {
            dict(r["labels"])["s"]: r["value"] for r in q.run(expr).collect()
        }

    cnt = one("histogram_count(lat)")
    assert cnt == {"a": 8.0, "b": 4.0}
    sm = one("histogram_sum(lat)")
    assert abs(sm["b"] - (16.0 + 20.0 + 31.9 + 64.0)) < 1e-9
    avg = one("histogram_avg(lat)")
    assert math.isclose(avg["b"], sm["b"] / 4.0, rel_tol=1e-12)
    # fraction in [16, 32]: bucket (16,32] wholly inside except the
    # point 16 itself sits in bucket (8,16] — interpolated overlap 0
    fr = one("histogram_fraction(16, 32, lat)")
    # b buckets: (8,16]:1, (16,32]:2, (32,64]:1 → inside = 2 (the
    # (16,32] bucket) + 0 from (8,16] (zero-width overlap at 16)
    assert math.isclose(fr["b"], 2.0 / 4.0, rel_tol=1e-12)
    # the result labels drop __name__ (value-transform rule)
    rows = q.run("histogram_count(lat)").collect()
    assert all("__name__" not in dict(r["labels"]) for r in rows)


def test_native_quantile_edges(spark, hist_frame):
    frame = hist_frame.withColumn("v", F.lit(0.0))
    q = P.RangeQuery(frame, 10_000, 10_000, STEP)
    hi = q.run("histogram_quantile(1.5, lat)").collect()
    assert all(math.isinf(r["value"]) and r["value"] > 0 for r in hi)
    lo = q.run("histogram_quantile(-0.5, lat)").collect()
    assert all(math.isinf(r["value"]) and r["value"] < 0 for r in lo)


def test_parse_and_errors(spark, hist_frame):
    n = P.parse_expr("histogram_fraction(0.5, 2, lat)")
    assert isinstance(n, P.HistFn) and n.lo == 0.5 and n.hi == 2.0
    n = P.parse_expr("histogram_count(lat)")
    assert isinstance(n, P.HistFn) and n.fn == "histogram_count"
    assert P.required_reach("histogram_count(lat offset 5m)", 60_000) == 360_000
    # a float-only frame must reject native functions
    frame = hist_frame.select("labels_str", "labels", "t").withColumn(
        "v", F.lit(1.0)
    )
    q = P.RangeQuery(frame, 10_000, 10_000, STEP)
    with pytest.raises(ValueError, match="native-histogram frame"):
        q.run("histogram_count(lat)")
    with pytest.raises(ValueError, match="instant selector"):
        # only selector / rate-family / sum() children are native —
        # avg() is not
        P.RangeQuery(
            frame.withColumn("h", F.lit(None).cast("int")), 10_000, 10_000, STEP
        ).run("histogram_count(avg(lat))")


def test_native_offset_and_at(spark, hist_frame):
    frame = hist_frame.withColumn("v", F.lit(0.0))
    # offset: evaluate 10s later with offset 10s == direct at 10s
    q2 = P.RangeQuery(frame, 20_000, 20_000, STEP)
    off = {
        dict(r["labels"])["s"]: r["value"]
        for r in q2.run("histogram_count(lat offset 10s)").collect()
    }
    assert off == {"a": 8.0, "b": 4.0}
    # @ pin to an absolute instant fans the constant across the grid
    q3 = P.RangeQuery(frame, 20_000, 40_000, STEP)
    rows = q3.run("histogram_count(lat @ 10)").collect()
    assert {r["t"] for r in rows} == {20_000, 30_000, 40_000}
    assert all(r["value"] in (8.0, 4.0) for r in rows)


def test_store_histograms_roundtrip(spark, tmp_path, hist_frame):
    from tsdb_spark import DB

    db = DB.create(spark, str(tmp_path / "hdb"), block_width_ms=60_000)
    db.append_histograms(hist_frame.select("labels", "t", "h"))
    back = db.hist_frame(0, 100_000)
    rows = {dict(r["labels"])["s"]: r for r in back.collect()}
    assert set(rows) == {"a", "b"}
    assert rows["a"]["h"]["count"] == 8.0
    # the histogram series landed in the shared dim
    names = {r[0] for r in db.label_values("__name__").collect()}
    assert "lat" in names
    # time pruning excludes out-of-range histograms
    assert db.hist_frame(50_000, 100_000).count() == 0
    # (series, t) collision keeps the max-(count, sum) histogram
    db2 = DB.create(spark, str(tmp_path / "hdb2"), block_width_ms=60_000)
    both = hist_frame.select("labels", "t", "h").unionByName(
        hist_frame.select(
            "labels", "t", F.col("h").withField("count", F.lit(99.0)).alias("h")
        )
    )
    db2.append_histograms(both)
    back2 = db2.hist_frame(0, 100_000)
    assert all(r["h"]["count"] == 99.0 for r in back2.collect())
    # native evaluation straight off the store frame
    q = P.RangeQuery(db.hist_frame(0, 100_000), 10_000, 10_000, STEP)
    got = {
        dict(r["labels"])["s"]: r["value"]
        for r in q.run("histogram_count(lat)").collect()
    }
    assert got == {"a": 8.0, "b": 4.0}


def test_native_stddev_stdvar(spark, hist_frame):
    frame = hist_frame.withColumn("v", F.lit(0.0))
    q = P.RangeQuery(frame, 10_000, 10_000, STEP)
    got_var = {
        dict(r["labels"])["s"]: r["value"]
        for r in q.run("histogram_stdvar(lat)").collect()
    }
    got_dev = {
        dict(r["labels"])["s"]: r["value"]
        for r in q.run("histogram_stddev(lat)").collect()
    }
    vals = {
        "a": [0.7, 1.5, 3.0, 3.5, 9.9, 0.0, 2.0, 4.0],
        "b": [16.0, 20.0, 31.9, 64.0],
    }
    for s, vs in vals.items():
        zero, buckets = model_hist(vs)
        count = zero + sum(buckets.values())
        mean = sum(vs) / count
        dev = zero * mean * mean
        for idx, c in buckets.items():
            mid = (2.0 ** (idx - 1) + 2.0 ** idx) / 2.0
            dev += c * (mid - mean) ** 2
        want = dev / count
        assert math.isclose(got_var[s], want, rel_tol=1e-12), (s,)
        assert math.isclose(got_dev[s], math.sqrt(want), rel_tol=1e-12)


def test_retention_drops_histogram_buckets(spark, tmp_path, hist_frame):
    from tsdb_spark import DB

    db = DB.create(spark, str(tmp_path / "hret"), block_width_ms=10_000)
    db.append_histograms(hist_frame.select("labels", "t", "h"))
    # also some float samples so retention has its normal work
    rows = [({"__name__": "f"}, t, 1.0) for t in (5_000, 15_000, 25_000)]
    db.append(spark.createDataFrame(
        rows, "labels MAP<STRING,STRING>, t LONG, v DOUBLE"))
    assert db.hist_frame(0, 100_000).count() == 2
    db.retain_after(20_000)
    # histograms at t=10_000 (bucket [10_000, 20_000)) are gone with
    # their bucket; the float samples below the cutoff went too
    assert db.hist_frame(0, 100_000).count() == 0
    assert db.samples().count() == 1


@pytest.fixture(scope="module")
def cum_frame(spark):
    # three 10s windows for one series: counter histograms accumulate
    pts = [(1_000, 1.5), (2_000, 3.0),           # w1 → th=10k
           (11_000, 1.5),                        # w2 → th=20k
           (21_000, 3.0), (22_000, 7.0), (23_000, 0.0)]  # w3 → th=30k
    rows = [({"__name__": "lat", "s": "x"}, t, v) for t, v in pts]
    df = spark.createDataFrame(
        rows, "labels MAP<STRING,STRING>, t LONG, v DOUBLE"
    ).withColumn("labels_str", L.labels_str_expr("labels"))
    return build_histograms(df, STEP, cumulative=True)


def test_cumulative_histograms(cum_frame):
    hs = {r["t"]: r["h"] for r in cum_frame.collect()}
    assert set(hs) == {10_000, 20_000, 30_000}
    assert hs[10_000]["count"] == 2.0 and hs[10_000]["zero_count"] == 0.0
    assert hs[20_000]["count"] == 3.0
    assert hs[30_000]["count"] == 6.0 and hs[30_000]["zero_count"] == 1.0
    assert abs(hs[30_000]["sum"] - 16.0) < 1e-9
    b3 = {b["idx"]: b["c"] for b in hs[30_000]["buckets"]}
    assert b3 == {1: 2.0, 2: 2.0, 3: 1.0}
    b2 = {b["idx"]: b["c"] for b in hs[20_000]["buckets"]}
    assert b2 == {1: 2.0, 2: 1.0}


def test_native_hist_rate(spark, cum_frame):
    q = P.RangeQuery(cum_frame, 30_000, 30_000, STEP)
    one = lambda e: q.run(e).collect()[0]["value"]  # noqa: E731
    # boundary difference over (5k, 30k] (last=30k hist, first=10k
    # hist) times the float path's extrapolation factor
    # (extrapolatedRate): samples at 10/20/30k, avg gap 10k, window
    # start 5k away (< 1.1*avg -> extend fully), end exact ->
    # factor = (20k + 5k + 0) / 20k = 1.25
    assert math.isclose(one("histogram_count(rate(lat[25s]))"),
                        (6.0 - 2.0) * 1.25 * 1000 / 25_000, rel_tol=1e-12)
    assert math.isclose(one("histogram_sum(rate(lat[25s]))"),
                        (16.0 - 4.5) * 1.25 * 0.04, rel_tol=1e-12)
    assert math.isclose(one("histogram_count(increase(lat[25s]))"), 5.0)
    assert math.isclose(one("histogram_count(delta(lat[25s]))"), 5.0)
    # quantile over the rate histogram: diff buckets idx 1,2,3 (bounds
    # (1,2], (2,4], (4,8]) with equal mass + the zero bucket; rank
    # 0.5*count lands exactly at bucket (1,2]'s cumulative upper edge →
    # interpolates to its upper bound 2.0
    assert math.isclose(one("histogram_quantile(0.5, rate(lat[25s]))"),
                        2.0, rel_tol=1e-12)
    # a one-histogram window yields no rate row (needs 2 boundaries)
    assert q.run("histogram_count(rate(lat[10s]))").count() == 0
    # offset composes with the matrix form
    q2 = P.RangeQuery(cum_frame, 40_000, 40_000, STEP)
    assert math.isclose(
        q2.run("histogram_count(rate(lat[25s] offset 10s))").collect()[0]["value"],
        0.2, rel_tol=1e-12)


def test_native_hist_sum_aggregation(spark, hist_frame):
    # sum() across series: components add, buckets union-sum
    frame = hist_frame.withColumn("v", F.lit(0.0))
    q = P.RangeQuery(frame, 10_000, 10_000, STEP)
    rows = q.run("histogram_count(sum(lat))").collect()
    assert len(rows) == 1 and rows[0]["value"] == 12.0
    assert dict(rows[0]["labels"]) == {}
    # grouped: per-s sums equal the per-series histograms
    got = {
        dict(r["labels"])["s"]: r["value"]
        for r in q.run("histogram_count(sum by (s) (lat))").collect()
    }
    assert got == {"a": 8.0, "b": 4.0}
    # quantile over the summed histogram vs a direct model
    v = q.run("histogram_quantile(0.9, sum(lat))").collect()[0]["value"]
    vals = [0.7, 1.5, 3.0, 3.5, 9.9, 0.0, 2.0, 4.0,
            16.0, 20.0, 31.9, 64.0]
    zero, buckets = model_hist(vals)
    want = model_quantile(0.9, zero, buckets)
    assert math.isclose(v, want, rel_tol=1e-12)
    # the full production pattern: quantile of a summed rate
    # (single-series here, so it must equal the ungrouped rate)
    n = P.parse_expr("histogram_quantile(0.9, sum by (s) (rate(lat[25s])))")
    assert isinstance(n, P.HistQuantile)


def test_native_hist_sum_rate(spark, cum_frame):
    q = P.RangeQuery(cum_frame, 30_000, 30_000, STEP)
    direct = q.run("histogram_count(increase(lat[25s]))").collect()[0]["value"]
    summed = q.run(
        "histogram_count(sum by (s) (increase(lat[25s])))"
    ).collect()[0]
    assert summed["value"] == direct == 5.0  # 4 observed x factor 1.25
    assert dict(summed["labels"]) == {"s": "x"}
    qd = q.run("histogram_quantile(0.9, increase(lat[25s]))").collect()[0]["value"]
    qs = q.run(
        "histogram_quantile(0.9, sum(increase(lat[25s])))"
    ).collect()[0]["value"]
    assert math.isclose(qs, qd, rel_tol=1e-12)


def test_fraction_and_stddev_over_rate(spark, cum_frame):
    # every histogram transform composes with the rate-family child
    q = P.RangeQuery(cum_frame, 30_000, 30_000, STEP)
    fr = q.run("histogram_fraction(1, 8, increase(lat[25s]))").collect()
    # diff buckets (1,2],(2,4],(4,8] each 1 + zero 1 → 3/4 inside [1,8]
    assert len(fr) == 1 and math.isclose(fr[0]["value"], 0.75, rel_tol=1e-12)
    sv = q.run("histogram_stdvar(increase(lat[25s]))").collect()
    assert len(sv) == 1 and sv[0]["value"] > 0


def test_eval_hist_range_db(spark, tmp_path, hist_frame):
    from tsdb_spark import DB
    from tsdb_spark.promql import eval_hist_range_db

    db = DB.create(spark, str(tmp_path / "ehdb"), block_width_ms=60_000)
    db.append_histograms(hist_frame.select("labels", "t", "h"))
    out = eval_hist_range_db(
        db, "histogram_count(lat)", 10_000, 10_000, STEP
    )
    got = {dict(r["labels"])["s"]: r["value"] for r in out.collect()}
    assert got == {"a": 8.0, "b": 4.0}
    # the scan is partition-pruned (t_bucket filter reaches the scan)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and any("t_bucket" in ln for ln in pf)


def test_cross_append_later_ingest_wins(spark, tmp_path, hist_frame):
    from tsdb_spark import DB

    db = DB.create(spark, str(tmp_path / "xad"), block_width_ms=60_000)
    db.append_histograms(hist_frame.select("labels", "t", "h"))
    # a SECOND append re-delivers the same (series, t) with amended
    # counts: the read must resolve later-ingest-wins (J6)
    db.append_histograms(hist_frame.select(
        "labels", "t",
        F.col("h").withField("count", F.lit(77.0)).alias("h")))
    back = db.hist_frame(0, 100_000).collect()
    assert len(back) == 2  # one histogram per series, no duplicates
    assert all(r["h"]["count"] == 77.0 for r in back)


# ---------------- NHCB: custom-bucket histograms (schema -53) --------


def test_build_custom_histograms_and_quantile(spark):
    """build_custom_histograms buckets by classic le bounds
    (upper-inclusive, overflow at len(bounds)); hist_quantile over
    schema -53 reproduces classic bucketQuantile: interpolation from 0
    in the first bucket, last finite bound for the +Inf bucket."""
    from tsdb_spark.nativehist import build_custom_histograms, hist_quantile

    vals = [0.05, 0.1, 0.3, 0.5, 0.9, 1.0, 2.5, 7.0]
    rows = [({"__name__": "rt"}, 1_000 + i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "labels MAP<STRING,STRING>, t LONG, v DOUBLE"
    ).withColumn("labels_str", L.labels_str_expr("labels"))
    out = build_custom_histograms(df, STEP, [0.1, 0.5, 1.0])
    [row] = out.collect()
    h = row["h"]
    assert h["schema"] == -53
    assert list(h["custom_values"]) == [0.1, 0.5, 1.0]
    # 0.05,0.1 <= 0.1 -> idx0; 0.3,0.5 -> idx1; 0.9,1.0 -> idx2;
    # 2.5,7.0 -> overflow idx3
    assert [(b["idx"], b["c"]) for b in h["buckets"]] == [
        (0, 2.0), (1, 2.0), (2, 2.0), (3, 2.0)
    ]
    assert h["count"] == 8.0 and h["zero_count"] == 0.0

    hq = out.select(
        hist_quantile(0.5, F.col("h")).alias("q50"),
        hist_quantile(0.25, F.col("h")).alias("q25"),
        hist_quantile(0.125, F.col("h")).alias("q125"),
        hist_quantile(1.0, F.col("h")).alias("q100"),
    ).collect()[0]
    # rank 4 of 8: cum 2 -> bucket (0.1,0.5]: 0.1 + 0.4*(4-2)/2 = 0.5
    assert math.isclose(hq["q50"], 0.5)
    # rank 2: exactly closes bucket 0 -> upper bound 0.1 (from 0)
    assert math.isclose(hq["q25"], 0.1)
    # rank 1: first bucket interpolates from 0 -> 0.05
    assert math.isclose(hq["q125"], 0.05)
    # rank 8 lands in the +Inf overflow bucket -> last finite bound
    assert math.isclose(hq["q100"], 1.0)


def test_nhcb_store_roundtrip_and_legacy_shim(spark, tmp_path):
    """NHCB bounds survive the store (append_histograms → hist_frame),
    and a pre-NHCB 5-field struct producer is normalized to the 6-field
    HIST_TYPE at append (custom_values NULL)."""
    from tsdb_spark import DB
    from tsdb_spark.nativehist import build_custom_histograms

    db = DB.create(spark, str(tmp_path / "db"), block_width_ms=60_000)
    rows = [({"__name__": "rt"}, 1_000 + i, float(v))
            for i, v in enumerate([1, 5, 20])]
    df = spark.createDataFrame(
        rows, "labels MAP<STRING,STRING>, t LONG, v DOUBLE"
    ).withColumn("labels_str", L.labels_str_expr("labels"))
    db.append_histograms(
        build_custom_histograms(df, STEP, [2.0, 10.0]).select(
            "labels", "t", "h"
        )
    )
    # legacy producer: Column struct WITHOUT custom_values
    legacy = spark.createDataFrame(
        [({"__name__": "old"}, 9_000)], "labels MAP<STRING,STRING>, t LONG"
    ).select(
        "labels", "t",
        F.struct(
            F.lit(3.0).alias("count"), F.lit(6.0).alias("sum"),
            F.lit(0.0).alias("zero_count"), F.lit(0).alias("schema"),
            F.expr(
                "array(named_struct('idx', 1, 'c', 3.0d))"
            ).alias("buckets"),
        ).alias("h"),
    )
    db.append_histograms(legacy)
    back = {r["labels"]["__name__"]: r["h"]
            for r in db.hist_frame(0, 100_000).collect()}
    assert list(back["rt"]["custom_values"]) == [2.0, 10.0]
    assert back["rt"]["schema"] == -53
    assert back["old"]["custom_values"] is None
    assert back["old"]["count"] == 3.0


def test_classic_to_nhcb_conversion_matches_classic_quantile(spark):
    """classic_to_nhcb (the convert_classic_histograms_to_nhcb analog):
    classic `X_bucket{le=...}`/`X_sum` series convert to NHCB samples
    whose count/sum/bounds reproduce the classic data, and
    histogram_quantile over the converted NHCB answers exactly what
    classic bucketQuantile answers on the same buckets (both
    interpolate linearly on the same grid)."""
    from tsdb_spark.nativehist import (
        classic_to_nhcb,
        hist_count,
        hist_quantile,
        hist_sum,
    )

    rows = []
    for inst, (c1, c2, c3, cinf, s) in (
        ("a", (10.0, 30.0, 50.0, 100.0, 60.0)),
        ("b", (0.0, 4.0, 4.0, 5.0, 7.5)),
    ):
        for le, cum in (("0.1", c1), ("0.5", c2), ("1", c3), ("+Inf", cinf)):
            rows.append((
                {"__name__": "rt_bucket", "le": le, "inst": inst}, 1_000, cum
            ))
        rows.append(({"__name__": "rt_sum", "inst": inst}, 1_000, s))
        rows.append(({"__name__": "rt_count", "inst": inst}, 1_000, cinf))
    frame = spark.createDataFrame(
        rows, "labels MAP<STRING,STRING>, t LONG, v DOUBLE"
    )
    out = classic_to_nhcb(frame)
    got = {r["labels"]["inst"]: r for r in out.collect()}
    assert set(got) == {"a", "b"}
    ha = got["a"]["h"]
    assert ha["schema"] == -53
    assert list(ha["custom_values"]) == [0.1, 0.5, 1.0]
    assert ha["count"] == 100.0 and ha["sum"] == 60.0
    # non-cumulative: 10, 20, 20, overflow 50
    assert [(b["idx"], b["c"]) for b in ha["buckets"]] == [
        (0, 10.0), (1, 20.0), (2, 20.0), (3, 50.0)
    ]
    assert got["a"]["labels"]["__name__"] == "rt"
    assert "le" not in got["a"]["labels"]
    hb = got["b"]["h"]
    # zero-count buckets dropped from the sparse array
    assert [(b["idx"], b["c"]) for b in hb["buckets"]] == [
        (1, 4.0), (3, 1.0)
    ]

    # quantile equivalence with the classic block's hand answers
    # (tests/promqltest/histograms.test): q50=1, q20=0.3, q90=1
    q = out.filter(F.col("labels")["inst"] == "a").select(
        hist_quantile(0.5, F.col("h")).alias("q50"),
        hist_quantile(0.2, F.col("h")).alias("q20"),
        hist_quantile(0.9, F.col("h")).alias("q90"),
        hist_count(F.col("h")).alias("cnt"),
        hist_sum(F.col("h")).alias("sm"),
    ).collect()[0]
    assert math.isclose(q["q50"], 1.0)
    assert math.isclose(q["q20"], 0.3)
    assert math.isclose(q["q90"], 1.0)
    assert q["cnt"] == 100.0 and q["sm"] == 60.0


def test_nhcb_fraction_and_stdvar_on_custom_bounds(spark):
    """histogram_fraction / histogram_stdvar over NHCB use the CUSTOM
    bounds: fraction interpolates overlap on the classic grid (the
    unbounded overflow bucket counts only under full containment);
    stdvar places bucket mass at custom midpoints, the overflow at its
    lower bound."""
    from tsdb_spark.nativehist import (
        build_custom_histograms,
        hist_fraction,
        hist_stdvar,
    )

    vals = [1.0, 2.0, 3.0, 4.0, 20.0]
    rows = [({"__name__": "m"}, 1_000 + i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "labels MAP<STRING,STRING>, t LONG, v DOUBLE"
    ).withColumn("labels_str", L.labels_str_expr("labels"))
    out = build_custom_histograms(df, STEP, [2.0, 4.0])
    r = out.select(
        hist_fraction(0.0, 2.0, F.col("h")).alias("f_low"),
        hist_fraction(2.0, 4.0, F.col("h")).alias("f_mid"),
        hist_fraction(0.0, float("inf"), F.col("h")).alias("f_all"),
        hist_fraction(0.0, 100.0, F.col("h")).alias("f_fin"),
        hist_stdvar(F.col("h")).alias("sv"),
    ).collect()[0]
    # buckets: (<=2]=2, (2,4]=2, overflow=1 of 5 total
    assert math.isclose(r["f_low"], 2 / 5)
    assert math.isclose(r["f_mid"], 2 / 5)
    assert math.isclose(r["f_all"], 1.0)
    # finite hi cannot cover the unbounded overflow bucket
    assert math.isclose(r["f_fin"], 4 / 5)
    # midpoints 1, 3; overflow at its lower bound 4; mean = 30/5 = 6
    expect = (2 * (1 - 6) ** 2 + 2 * (3 - 6) ** 2 + 1 * (4 - 6) ** 2) / 5
    assert math.isclose(r["sv"], expect)
