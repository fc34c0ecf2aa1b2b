"""CLI surface (cmd/tsdb analog): each subcommand drives the store
in-process through the same SparkSession."""

import os

from tsdb_spark import DB
from tsdb_spark.__main__ import main


def _store(spark, tmp_path):
    db = DB.create(spark, str(tmp_path / "db"), block_width_ms=3_600_000)
    rows = [({"__name__": "m", "i": str(i % 3)}, i * 60_000, float(i)) for i in range(120)]
    db.append(
        spark.createDataFrame(rows, "labels MAP<STRING,STRING>, t LONG, v DOUBLE")
    )
    return str(tmp_path / "db")


def test_cli_ls_analyze_dump_roundtrip(spark, tmp_path, capsys):
    path = _store(spark, tmp_path)
    assert main(["ls", path]) == 0
    out = capsys.readouterr().out
    assert "t_bucket" in out and "num_samples" in out

    assert main(["analyze", path]) == 0
    out = capsys.readouterr().out
    assert "__name__" in out and "cardinality" in out

    assert main(["dump", path, "--maxt", "120000"]) == 0
    out = capsys.readouterr().out
    # reference dump prints `labels value ts` lines (cmd/tsdb/main.go:646)
    assert '{__name__="m",i="0"} 0 0' in out.replace("0.0 0", "0 0")

    dump_dir = str(tmp_path / "csv")
    assert main(["dump", path, "--out", dump_dir]) == 0
    assert any(f.endswith(".csv") for f in os.listdir(dump_dir))


def test_cli_compact_and_vacuum(spark, tmp_path, capsys):
    path = _store(spark, tmp_path)
    assert main(["compact", path]) == 0
    assert "compacted" in capsys.readouterr().out
    assert main(["vacuum", path]) == 0
    assert "rewrote buckets" in capsys.readouterr().out
    # the store still reads after maintenance
    assert DB.open_readonly(spark, path).samples().count() == 120


def test_cli_select_with_selector_string(spark, tmp_path, capsys):
    path = _store(spark, tmp_path)
    assert main(["select", path, 'm{i="1"}', "--maxt", "300000"]) == 0
    out = capsys.readouterr().out
    assert '{__name__="m",i="1"}' in out
    assert '{__name__="m",i="0"}' not in out


def test_cli_explain_shows_pushdown(spark, tmp_path, capsys):
    path = _store(spark, tmp_path)
    assert main(["explain", path, 'm{i="1"}', "--mint", "0", "--maxt", "60000"]) == 0
    out = capsys.readouterr().out
    assert "PartitionFilters" in out and "t_bucket" in out
    assert "BroadcastHashJoin" in out


def test_cli_stream_drains_file_source(spark, tmp_path, capsys):
    from tsdb_spark.schema import INGEST_SCHEMA
    from tsdb_spark.streaming import stream_shuffle_partitions

    src = str(tmp_path / "incoming")
    rows = [({"__name__": "s", "i": str(i % 4)}, i * 1000, float(i)) for i in range(50)]
    spark.createDataFrame(rows, INGEST_SCHEMA).write.parquet(src)

    store = str(tmp_path / "sdb")
    with stream_shuffle_partitions(spark, 4):
        assert main([
            "stream", store, "--source", src,
            "--checkpoint", str(tmp_path / "ckpt"),
        ]) == 0
    assert "ingested through epoch" in capsys.readouterr().out
    db = DB.open_readonly(spark, store)
    assert db.samples().count() == 50
    # a second drain with the same checkpoint is a no-op (exactly-once)
    with stream_shuffle_partitions(spark, 4):
        assert main([
            "stream", store, "--source", src,
            "--checkpoint", str(tmp_path / "ckpt"),
        ]) == 0
    assert DB.open_readonly(spark, store).samples().count() == 50


def test_cli_plan_dry_run(spark, tmp_path, capsys):
    path = _store(spark, tmp_path)
    assert main(["plan", path]) == 0
    out = capsys.readouterr().out
    assert out.startswith("plan:")
    # dry run: the store is untouched
    assert DB.open_readonly(spark, path).samples().count() == 120


def test_cli_rollup_materialize_and_serve(spark, tmp_path, capsys):
    path = _store(spark, tmp_path)
    assert main(["rollup", path]) == 0
    assert "materialized rollup artifact" in capsys.readouterr().out
    db = DB.open_readonly(spark, path)
    assert db.fresh_rollup_widths() == [3_600_000]
    # serve a coarser step read-only from the fresh artifact
    assert main(["rollup", path, "--serve-step", "7200000"]) == 0
    out = capsys.readouterr().out
    assert "from artifact w=3600000" in out
    assert "w_start" in out


def test_cli_query_promql_range(spark, tmp_path, capsys):
    # end-to-end: PromQL expression served from a store via the pruned
    # querier path (eval_range_db) — sum by (i) of a windowed rate grid
    path = _store(spark, tmp_path)
    assert main([
        "query", path, 'sum by (i) (count_over_time(m[10m]))',
        "--start", "600000", "--end", "3600000", "--step", "600000",
    ]) == 0
    out = capsys.readouterr().out
    assert "value" in out and "i" in out
    # 10 samples per 10m window across 3 i-values -> value column shows
    # a deterministic count; spot one grid row
    assert "10.0" in out or "4.0" in out

    # instant selector with lookback through the same path
    assert main([
        "query", path, 'm{i="1"}',
        "--start", "600000", "--end", "1800000", "--step", "600000",
        "--lookback", "600000",
    ]) == 0
    out = capsys.readouterr().out
    assert '{__name__="m",i="1"}' in out


def test_cli_alerts_and_query_json(spark, tmp_path, capsys):
    path = _store(spark, tmp_path)
    # alerts: m sums high enough to activate everywhere → firing after the for window
    assert main([
        "alerts", path, "hi_m", "sum_over_time(m[1h]) > 0",
        "--for", "3600000",
        "--start", "3600000", "--end", "7200000", "--step", "3600000",
    ]) == 0
    out = capsys.readouterr().out
    assert 'alertname="hi_m"' in out and "alertstate" in out

    # query --json: the Prometheus wire format end-to-end from the CLI
    assert main([
        "query", path, "count(m)",
        "--start", "3600000", "--end", "3600000", "--step", "1000",
        "--json",
    ]) == 0
    out = capsys.readouterr().out
    import json as _json

    body = _json.loads(out.strip().splitlines()[-1])
    assert body["status"] == "success"
    assert body["data"]["resultType"] == "matrix"
    assert body["data"]["result"], "query --json returned no series"


def test_cli_r6_subcommands(spark, tmp_path, capsys):
    """Round-6 CLI additions end to end: exemplars, dump --openmetrics →
    create-blocks-from roundtrip, check-rules, test-rules."""
    import json
    import textwrap

    path = _store(spark, tmp_path)
    db = DB.open(spark, path)
    db.append_exemplars(spark.createDataFrame(
        [({"__name__": "m", "i": "0"}, 0, 0.0, {"trace_id": "t0"})],
        "labels MAP<STRING,STRING>, t LONG, v DOUBLE, "
        "exemplar MAP<STRING,STRING>"))

    assert main(["exemplars", path, 'm{i="0"}', "--start", "0",
                 "--end", "100"]) == 0
    payload = json.loads(capsys.readouterr().out)
    assert payload["data"][0]["exemplars"][0]["labels"] == {"trace_id": "t0"}

    om = str(tmp_path / "om")
    assert main(["dump", path, "--openmetrics", "--out", om]) == 0
    capsys.readouterr()
    dst = str(tmp_path / "db2")
    assert main(["create-blocks-from", om, dst, "--timestamps", "ms"]) == 0
    assert "backfilled 120 samples" in capsys.readouterr().out

    rules = tmp_path / "rules.yml"
    rules.write_text(textwrap.dedent("""
        groups:
          - name: g
            interval: 1m
            rules:
              - record: m:sum
                expr: sum(m)
    """))
    assert main(["check-rules", str(rules)]) == 0
    assert "SUCCESS" in capsys.readouterr().out
    bad = tmp_path / "bad.yml"
    bad.write_text("groups:\n  - name: g\n    rules:\n      - record: r\n        expr: 'sum by ((m)'\n")
    assert main(["check-rules", str(bad)]) == 1
    capsys.readouterr()

    tests_yml = tmp_path / "t.yml"
    tests_yml.write_text(textwrap.dedent("""
        rule_files: [rules.yml]
        evaluation_interval: 1m
        tests:
          - interval: 1m
            input_series:
              - series: 'm{}'
                values: '1 2 3'
            promql_expr_test:
              - expr: m:sum
                eval_time: 2m
                exp_samples:
                  - labels: 'm:sum'
                    value: 3
    """))
    assert main(["test-rules", str(tests_yml)]) == 0
    assert "SUCCESS" in capsys.readouterr().out


def test_cli_test_promql(spark, tmp_path, capsys):
    """`test-promql` runs upstream-format script files and reports
    SUCCESS/FAILED with a nonzero exit on mismatch."""
    import textwrap

    good = tmp_path / "good.test"
    good.write_text(textwrap.dedent("""\
        load 1m
            g 0+2x5

        eval instant at 5m g
            g 10

        eval instant at 5m sum(g)
            {} 10
    """))
    assert main(["test-promql", str(good)]) == 0
    assert "SUCCESS" in capsys.readouterr().out

    bad = tmp_path / "bad.test"
    bad.write_text(textwrap.dedent("""\
        load 1m
            g 0+2x5

        eval instant at 5m g
            g 11
    """))
    assert main(["test-promql", str(bad)]) == 1
    out = capsys.readouterr().out
    assert "FAILED" in out and "got" in out


def test_cli_create_blocks_from_rules(spark, tmp_path, capsys):
    # `promtool tsdb create-blocks-from rules`: recording rules evaluate
    # over the historical range and land in the store; layered rule 2
    # reads rule 1's backfilled output; the alert rule is skipped
    path = _store(spark, tmp_path)
    rules = tmp_path / "rules.yml"
    rules.write_text(
        """groups:
- name: g
  interval: 5m
  rules:
  - record: m:sum
    expr: sum(m)
  - record: m:sum:double
    expr: m:sum * 2
  - alert: Never
    expr: m:sum > 1e18
"""
    )
    assert main([
        "create-blocks-from-rules", str(rules), path,
        "--start", "300000", "--end", "1800000",
    ]) == 0
    out = capsys.readouterr().out
    import json
    rep = json.loads(out.strip().splitlines()[-1])
    assert rep["rules"] == 2 and rep["skipped_alerts"] == 1
    assert rep["samples"] > 0
    db = DB.open(spark, path)
    from tsdb_spark.labels import eq
    r1 = {r["t"]: r["v"] for r in db.querier(0, 10**9).select(
        [eq("__name__", "m:sum")]).select("t", "v").collect()}
    r2 = {r["t"]: r["v"] for r in db.querier(0, 10**9).select(
        [eq("__name__", "m:sum:double")]).select("t", "v").collect()}
    # grid 300000..1800000 step 300000 -> 6 eval points
    assert len(r1) == 6 and len(r2) == 6
    for t, v in r1.items():
        assert r2[t] == v * 2


def test_cli_query_remote(spark, tmp_path, capsys):
    """query-remote is a pure HTTP client (promtool query analog):
    instant and range forms against a served store."""
    import json
    import threading

    from tsdb_spark import DB
    from tsdb_spark.api import serve
    from tsdb_spark.__main__ import main

    db = DB.create(spark, str(tmp_path / "db"), block_width_ms=3_600_000)
    db.append(
        spark.createDataFrame(
            [({"__name__": "m"}, t * 60_000, float(t)) for t in range(4)],
            "labels MAP<STRING,STRING>, t LONG, v DOUBLE",
        )
    )
    srv = serve(db, "127.0.0.1", 0)
    port = srv.server_address[1]
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    url = f"http://127.0.0.1:{port}"
    try:
        assert main(["query-remote", url, "m", "--time", "180"]) == 0
        out = json.loads(capsys.readouterr().out)
        assert out["data"]["result"][0]["value"] == [180.0, "3"]
        assert main([
            "query-remote", url, "sum(m)",
            "--start", "0", "--end", "180", "--step", "1m",
        ]) == 0
        out = json.loads(capsys.readouterr().out)
        assert out["data"]["result"][0]["values"] == [
            [0.0, "0"], [60.0, "1"], [120.0, "2"], [180.0, "3"],
        ]
        # range form without step: usage error, not a crash
        assert main(["query-remote", url, "m", "--start", "0", "--end", "60"]) == 2
    finally:
        srv.shutdown()
