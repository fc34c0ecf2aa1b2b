"""Known-value semantics of the PromQL-family batch query functions
(histogram_quantile interpolation, predict_linear regression, label
relabeling) on hand-built events fixtures — the driver oracle checks
them statistically; these pin the arithmetic on human-checkable cases.
"""

import pytest
from pyspark.sql import functions as F

from tsdb_spark.queries import DAY, T0, QUERIES

NANO = 1_000_000


def _write_events(spark, path, rows):
    """rows: (t_ms, user_id, event_type, value) → driver-layout parquet
    (ts as int64 nanos, the nanosAsLong branch of the adapter)."""
    spark.createDataFrame(
        [
            (i, t * NANO, uid, et, v, '{"k": 10}')
            for i, (t, uid, et, v) in enumerate(rows)
        ],
        "event_id LONG, ts LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING",
    ).write.parquet(f"{path}/events.parquet")


def test_histogram_quantile_interpolation(spark, tmp_path):
    # one metric, one 6h window: 4 samples <= 10, 4 in (10, 25]
    rows = [(T0 + i * 1000, 1, "m", 5.0) for i in range(4)]
    rows += [(T0 + (10 + i) * 1000, 1, "m", 20.0) for i in range(4)]
    _write_events(spark, str(tmp_path), rows)
    out = QUERIES["tsdb_histogram_quantile"].spark_fn(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n"], r["c1"], r["c2"]) == (8, 4, 8)
    # p50: rank 4 falls exactly on c1 → upper bound of the first bucket
    assert r["p50"] == pytest.approx(10.0)
    # p90: rank 7.2 → 10 + 15*(7.2-4)/(8-4) = 22.0
    assert r["p90"] == pytest.approx(22.0)


def test_histogram_quantile_inf_bucket_clamps(spark, tmp_path):
    _write_events(spark, str(tmp_path), [(T0 + i * 1000, 1, "m", 400.0) for i in range(3)])
    r = QUERIES["tsdb_histogram_quantile"].spark_fn(spark, str(tmp_path)).collect()[0]
    assert r["p50"] == 250.0 and r["p90"] == 250.0  # all mass in +Inf


def test_predict_linear_exact_line(spark, tmp_path):
    # v = 1.0 + 0.01 * seconds — slope 0.01 v/s = 10_000 micro-v/s
    _write_events(
        spark,
        str(tmp_path),
        [(T0, 1, "m", 1.0), (T0 + 100_000, 1, "m", 2.0)],
    )
    r = QUERIES["tsdb_predict_linear"].spark_fn(spark, str(tmp_path)).collect()[0]
    assert r["n"] == 2
    assert r["slope_uvps"] == pytest.approx(10_000.0)
    # projection to the day boundary: 1.5 + 0.01*(86400 - 50) = 865.0
    assert r["predicted"] == pytest.approx(865.0)


def test_predict_linear_skips_degenerate_groups(spark, tmp_path):
    # a series with all samples at one timestamp has zero x-variance:
    # no regression row may be emitted (den == 0 → filtered, not NaN)
    _write_events(
        spark,
        str(tmp_path),
        [(T0, 1, "m", 1.0), (T0, 1, "m", 1.0), (T0 + 1000, 2, "m", 5.0)],
    )
    out = QUERIES["tsdb_predict_linear"].spark_fn(spark, str(tmp_path)).collect()
    assert all('user="1"' not in r["labels_str"] for r in out)


def test_label_replace_splices_sorted_keys(spark, tmp_path):
    _write_events(spark, str(tmp_path), [(T0, 7, "click", 60.0)])
    r = QUERIES["tsdb_label_replace"].spark_fn(spark, str(tmp_path)).collect()[0]
    assert r["user_tier"] == "t7"
    # canonical rendering keeps byte-sorted key order with the two new labels
    assert r["labels_str"] == (
        '{__name__="click",uid="click-7",user="7",user_tier="t7"}'
    )


def test_stddev_windows_known_variance(spark, tmp_path):
    # one series, one window: values 1.0 and 3.0 → population var 1.0
    _write_events(
        spark, str(tmp_path), [(T0, 1, "m", 1.0), (T0 + 1000, 1, "m", 3.0)]
    )
    r = QUERIES["tsdb_stddev_windows"].spark_fn(spark, str(tmp_path)).collect()[0]
    assert r["n"] == 2
    assert r["var_v"] == pytest.approx(1.0)
    assert r["stddev_v"] == pytest.approx(1.0)


def test_holt_winters_promql_recurrence(spark, tmp_path):
    # v = [1, 3]: s0=1, b0=2; one step over v[1]:
    #   s1 = 0.5*3 + 0.5*(1+2) = 3.0 ; b1 = 0.5*(3-1) + 0.5*2 = 2.0
    _write_events(
        spark, str(tmp_path), [(T0, 1, "m", 1.0), (T0 + 1000, 1, "m", 3.0)]
    )
    r = QUERIES["tsdb_holt_winters"].spark_fn(spark, str(tmp_path)).collect()[0]
    assert (r["n"], r["smoothed"], r["trend"]) == (2, 3.0, 2.0)
    # single-sample series emit nothing (the PromQL function needs >= 2)
    _write_events(
        spark, str(tmp_path / "one"), [(T0, 1, "m", 1.0)]
    )
    assert QUERIES["tsdb_holt_winters"].spark_fn(spark, str(tmp_path / "one")).count() == 0
