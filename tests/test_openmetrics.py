"""OpenMetrics / exposition backfill (sources/openmetrics.py — the
`promtool tsdb create-blocks-from openmetrics` layer,
prometheus/prometheus cmd/promtool/backfill.go).

Contract under test: parse(format(df)) == df exactly (escapes, ±Inf/NaN,
fractional-second stamps), hostile lines are handled like the upstream
textparse loop (comments/blanks dropped, values containing '}' and
spaces kept), and the CLI path lands samples in a readable store.
"""

import math

from pyspark.sql import functions as F

from tsdb_spark.sources.openmetrics import (
    create_blocks_from,
    format_openmetrics,
    parse_openmetrics,
)

T0 = 1_704_067_200_000


def _canon(df):
    out = []
    for r in df.select("labels", "t", "v").collect():
        v = r["v"]
        out.append(
            (
                tuple(sorted(r["labels"].items())),
                r["t"],
                "NaN" if (v is not None and math.isnan(v)) else repr(v),
            )
        )
    return sorted(out)


def _samples(spark):
    rows = [
        # escape-table coverage: quote, backslash, newline in one value
        ({"__name__": "click", "user": "1", "path": 'a"b\\c\nd'}, T0, 1.5),
        ({"__name__": "click", "user": "2"}, T0 + 123, float("inf")),
        ({"__name__": "err_total"}, T0 + 1000, float("-inf")),
        ({"__name__": "gauge"}, T0 + 1500, float("nan")),
        # '}' and spaces INSIDE a label value (the greedy-brace case)
        ({"__name__": "m", "x": "with,comma and }brace"}, T0 + 2500, -1e-4),
        # shortest-roundtrip double rendering
        ({"__name__": "m", "x": "y"}, T0 + 3000, 0.1 + 0.2),
    ]
    return spark.createDataFrame(
        rows, "labels map<string,string>, t long, v double"
    )


def test_roundtrip_exact(spark):
    df = _samples(spark)
    back = parse_openmetrics(spark, lines=format_openmetrics(df))
    assert _canon(back) == _canon(df)


def test_roundtrip_ms_mode(spark):
    df = _samples(spark)
    back = parse_openmetrics(
        spark, lines=format_openmetrics(df, timestamps="ms"), timestamps="ms"
    )
    assert _canon(back) == _canon(df)


def test_fractional_second_stamps_are_exact_ms(spark):
    # 1704067200.123 s must come back as exactly ...123 ms — the
    # DECIMAL(20,3) path; double math would be off by ulps here
    txt = spark.createDataFrame(
        [("up 1 1704067200.123",), ("up 2 1704067200.999",)], "line string"
    )
    got = {r["t"]: r["v"] for r in parse_openmetrics(spark, lines=txt).collect()}
    assert got == {T0 + 123: 1.0, T0 + 999: 2.0}


def test_comments_blanks_and_eof_dropped(spark):
    txt = spark.createDataFrame(
        [
            ("# HELP up help text",),
            ("# TYPE up gauge",),
            ("   ",),
            ('up{job="x"} 1 1704067200',),
            ("# EOF",),
        ],
        "line string",
    )
    rows = parse_openmetrics(spark, lines=txt).collect()
    assert len(rows) == 1
    assert dict(rows[0]["labels"]) == {"__name__": "up", "job": "x"}
    assert rows[0]["t"] == T0 and rows[0]["v"] == 1.0


def test_bare_name_and_empty_braces(spark):
    txt = spark.createDataFrame(
        [("up 1 1704067200",), ("down{} 2 1704067201",)], "line string"
    )
    got = {
        r["labels"]["__name__"]: r["v"]
        for r in parse_openmetrics(spark, lines=txt).collect()
    }
    assert got == {"up": 1.0, "down": 2.0}


def test_malformed_lines_dropped_not_fatal(spark):
    txt = spark.createDataFrame(
        [
            ("up 1 1704067200",),
            ("just-garbage",),  # no value/timestamp
            ("name_only_no_fields",),
            ('ok{a="b"} not_a_number 1704067200',),  # value won't cast
        ],
        "line string",
    )
    rows = parse_openmetrics(spark, lines=txt).collect()
    assert [r["labels"]["__name__"] for r in rows] == ["up"]


def test_create_blocks_from_cli_path(spark, tmp_path):
    df = _samples(spark).filter(~F.isnan("v") & (F.col("v") < float("inf")))
    format_openmetrics(df).write.text(f"{tmp_path}/dump")
    db = create_blocks_from(spark, f"{tmp_path}/dump", f"{tmp_path}/db")
    assert _canon(db.querier(T0, T0 + 10_000).select([])) == _canon(df)
    # idempotent open: a second backfill into the SAME store appends
    more = spark.createDataFrame(
        [({"__name__": "late"}, T0 + 9000, 4.0)],
        "labels map<string,string>, t long, v double",
    )
    format_openmetrics(more).write.text(f"{tmp_path}/dump2")
    db2 = create_blocks_from(spark, f"{tmp_path}/dump2", f"{tmp_path}/db")
    assert db2.samples().count() == df.count() + 1


def test_utf8_names_roundtrip(spark):
    # 3.x quoted-name exposition: UTF-8 metric/label names render quoted
    # ({"my.metric","l w s"="v",legacy="x"}) and parse back exactly
    from tsdb_spark.sources.openmetrics import (
        format_openmetrics,
        parse_openmetrics,
    )

    rows = [
        ({"__name__": "my.metric", "label with space": "v 1", "ok": "x"},
         1_000, 1.5),
        ({"__name__": "plain", "ok": 'q"uote\\slash'}, 2_000, 2.0),
        ({"__name__": "m.n"}, 3_000, 3.0),
    ]
    df = spark.createDataFrame(rows, "labels MAP<STRING,STRING>, t LONG, v DOUBLE")
    lines = format_openmetrics(df, timestamps="ms")
    txt = {r["line"] for r in lines.collect()}
    assert '{"my.metric","label with space"="v 1",ok="x"} 1.5 1000' in txt
    assert '{"m.n"} 3.0 3000' in txt
    back = parse_openmetrics(spark, lines=lines, timestamps="ms")
    got = sorted(
        (tuple(sorted(dict(r["labels"]).items())), r["t"], r["v"])
        for r in back.collect()
    )
    want = sorted((tuple(sorted(l.items())), t, v) for l, t, v in rows)
    assert got == want
