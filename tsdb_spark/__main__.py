"""CLI for the engine — the `cmd/tsdb` analog (cmd/tsdb/main.go:94-141
command table: bench write / ls / analyze / dump).

    python -m tsdb_spark ls       <store>
    python -m tsdb_spark analyze  <store> [--limit N]
    python -m tsdb_spark select   <store> '<promql selector>' [--mint --maxt]
    python -m tsdb_spark query    <store> '<promql expr>' --start --end --step
    python -m tsdb_spark explain  <store> '<promql selector>' [--mint --maxt]
    python -m tsdb_spark dump     <store> [--mint MS] [--maxt MS] [--out DIR]
    python -m tsdb_spark bench-write <store> --events DIR [--width MS]
    python -m tsdb_spark create-blocks-from <input> <store> [--timestamps U]
    python -m tsdb_spark scrape   <store> --url URL [--interval MS --passes N]
    python -m tsdb_spark remote-write <store> --url URL --maxt MS
    python -m tsdb_spark stream   <store> --source DIR --checkpoint DIR
    python -m tsdb_spark plan     <store>
    python -m tsdb_spark compact  <store> [--width MS]
    python -m tsdb_spark rollup   <store> [--width MS | --serve-step MS]
    python -m tsdb_spark vacuum   <store>
    python -m tsdb_spark serve    <store> [--host H] [--port P] [--rules F]
    python -m tsdb_spark check-config <prometheus.yml>...
    python -m tsdb_spark check-rules <rules.yml>...
    python -m tsdb_spark test-rules  <tests.yml>...
    python -m tsdb_spark test-promql <file.test>...
    python -m tsdb_spark alerts   <store> <name> '<expr>' [--for MS] --start --end --step

Every command opens one SparkSession sized from $SPARK_GRAFT_CPUS and
operates on a DB directory (ls/analyze/dump open it read-only).
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="tsdb_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_ls = sub.add_parser("ls", help="list block (bucket) metas: cmd/tsdb/main.go:437-455")
    p_ls.add_argument("store")

    p_an = sub.add_parser("analyze", help="cardinality report: cmd/tsdb/main.go:464-616")
    p_an.add_argument("store")
    p_an.add_argument("--limit", type=int, default=20)

    p_du = sub.add_parser("dump", help="full scan `labels t v`: cmd/tsdb/main.go:618-653")
    p_du.add_argument("store")
    p_du.add_argument("--mint", type=int, default=-(2**62))
    p_du.add_argument("--maxt", type=int, default=2**62)
    p_du.add_argument("--out", help="write CSV here instead of stdout")
    p_du.add_argument(
        "--openmetrics",
        action="store_true",
        help="emit/write exposition text instead (ms stamps) — directly "
        "re-importable via `create-blocks-from --timestamps ms`",
    )

    p_se = sub.add_parser(
        "select", help='query samples by PromQL-style selector, e.g. \'click{user="7"}\''
    )
    p_se.add_argument("store")
    p_se.add_argument("selector")
    p_se.add_argument("--mint", type=int, default=-(2**62))
    p_se.add_argument("--maxt", type=int, default=2**62)
    p_se.add_argument("--limit", type=int, default=100)

    p_q = sub.add_parser(
        "query",
        help="evaluate a PromQL range expression over a time grid, e.g. "
        "'sum by (user) (rate(click[1h]))'",
    )
    p_q.add_argument("store")
    p_q.add_argument("expr")
    p_q.add_argument("--start", type=int, required=True, help="grid start (ms)")
    p_q.add_argument("--end", type=int, required=True, help="grid end (ms)")
    p_q.add_argument("--step", type=int, required=True, help="grid step (ms)")
    p_q.add_argument("--lookback", type=int, default=300_000,
                     help="instant-selector staleness window (ms)")
    p_q.add_argument("--limit", type=int, default=100)
    p_q.add_argument(
        "--json",
        action="store_true",
        help="emit the Prometheus /api/v1/query_range wire format",
    )

    p_al = sub.add_parser(
        "alerts",
        help="evaluate an alerting rule over a grid and print the "
        "ALERTS series (pending/firing state machine), e.g. "
        "alerts /db hi_click 'sum_over_time(click[1d]) > 60' "
        "--for 172800000 --start ... --end ... --step 86400000",
    )
    p_al.add_argument("store")
    p_al.add_argument("name")
    p_al.add_argument("expr")
    p_al.add_argument("--for", dest="for_ms", type=int, default=0,
                      help="continuous-activity ms before firing")
    p_al.add_argument("--start", type=int, required=True)
    p_al.add_argument("--end", type=int, required=True)
    p_al.add_argument("--step", type=int, required=True)
    p_al.add_argument("--limit", type=int, default=100)

    p_sv = sub.add_parser(
        "serve",
        help="serve the Prometheus HTTP API (/api/v1/query_range, "
        "query, labels, label/<n>/values, series) over a read-only "
        "store",
    )
    p_sv.add_argument("store")
    p_sv.add_argument("--host", default="127.0.0.1")
    p_sv.add_argument("--port", type=int, default=9090)
    p_sv.add_argument(
        "--config",
        help="full prometheus.yml: global (scrape_interval, "
        "evaluation_interval, external_labels), scrape_configs (static "
        "+ file_sd), rule_files, alerting.alertmanagers, remote_write — "
        "drives scrape + rules + notifier + remote-write forwarding "
        "with no other flags; opens the store WRITABLE",
    )
    p_sv.add_argument(
        "--rules",
        help="rule file (YAML, model/rulefmt) served at /api/v1/rules "
        "and evaluated by /api/v1/alerts",
    )
    p_sv.add_argument(
        "--eval-rules",
        action="store_true",
        help="with --rules: evaluate the groups on their intervals and "
        "record the results (incl. ALERTS series) back into the store — "
        "rules/manager.go; opens the store WRITABLE",
    )
    p_sv.add_argument(
        "--scrape-url",
        action="append",
        default=[],
        help="also scrape this target into the served store on "
        "--scrape-interval (repeatable) — the full mini-Prometheus: "
        "scrape -> store -> rules -> query API in one process; opens "
        "the store WRITABLE",
    )
    p_sv.add_argument("--scrape-interval", type=int, default=15_000)
    p_sv.add_argument(
        "--relabel-file",
        help="with --scrape-url: YAML list of upstream-style relabel "
        "rules (model/relabel) applied to every scraped sample as "
        "metric_relabel_configs — replace/keep/drop/labelmap/hashmod/"
        "labeldrop/labelkeep/lowercase/uppercase/keepequal/dropequal",
    )
    p_sv.add_argument(
        "--alertmanager-url",
        action="append",
        default=[],
        help="with --eval-rules: POST firing/resolved alerts to this "
        "Alertmanager base URL (api/v2/alerts; repeatable) — the "
        "notifier/notifier.go role",
    )
    p_sv.add_argument(
        "--write-buffer-ms",
        type=int,
        default=0,
        help="micro-batch /api/v1/write and OTLP ingestion: enqueue "
        "decoded rows and commit ONE append per window (trade: 2xx "
        "means accepted, not yet committed); 0 = synchronous commits "
        "(the default, 2xx = committed); opens the store WRITABLE",
    )
    p_sv.add_argument(
        "--write-buffer-spill",
        help="with --write-buffer-ms: fsync queued batches to this "
        "JSONL spill file before the 2xx (durable acks — the WAL "
        "analog for the push path); on start, surviving batches "
        "replay exactly once (content-hash dedup)",
    )
    p_sv.add_argument(
        "--enable-admin",
        action="store_true",
        help="unlock /api/v1/admin/tsdb/* (delete_series, "
        "clean_tombstones, snapshot) — opens the store WRITABLE; the "
        "upstream --web.enable-admin-api flag",
    )

    p_rr = sub.add_parser(
        "record",
        help="evaluate a recording rule and append the result back into "
        "the store as series `name`, e.g. "
        "record /db 'job:click:rate1h' 'sum by (user) (rate(click[1h]))'",
    )
    p_rr.add_argument("store")
    p_rr.add_argument("name")
    p_rr.add_argument("expr")
    p_rr.add_argument("--start", type=int, required=True, help="grid start (ms)")
    p_rr.add_argument("--end", type=int, required=True, help="grid end (ms)")
    p_rr.add_argument("--step", type=int, required=True, help="grid step (ms)")
    p_rr.add_argument(
        "--label",
        action="append",
        default=[],
        metavar="K=V",
        help="static rule label (repeatable; overrides result labels)",
    )

    p_ex = sub.add_parser(
        "explain", help="show the physical plan for a selector (pushdown audit)"
    )
    p_ex.add_argument("store")
    p_ex.add_argument("selector")
    p_ex.add_argument("--mint", type=int, default=-(2**62))
    p_ex.add_argument("--maxt", type=int, default=2**62)

    p_bw = sub.add_parser("bench-write", help="macro write bench: cmd/tsdb/main.go:143-327")
    p_bw.add_argument("store")
    p_bw.add_argument("--events", required=True, help="sf dir with events.parquet")
    p_bw.add_argument("--width", type=int, default=2 * 3600 * 1000)

    p_cb = sub.add_parser(
        "create-blocks-from",
        help="backfill: parse an OpenMetrics/exposition text dump and "
        "append it into a (new or existing) store — the `promtool tsdb "
        "create-blocks-from openmetrics` flow as one distributed parse",
    )
    p_cb.add_argument("input", help="text file / dir / glob of exposition lines")
    p_cb.add_argument("store")
    p_cb.add_argument("--timestamps", choices=("openmetrics", "ms"),
                      default="openmetrics",
                      help="stamp unit: OpenMetrics seconds (default) or "
                      "classic-exposition / `dump` milliseconds")
    p_cb.add_argument("--width", type=int, default=2 * 3600 * 1000,
                      help="block width for a NEW store (backfill.go cuts 2h)")

    p_cr2 = sub.add_parser(
        "create-blocks-from-rules",
        help="backfill: evaluate a rules file's recording rules over a "
        "historical range and append the results — `promtool tsdb "
        "create-blocks-from rules` (cmd/promtool/tsdb.go + rules.go)",
    )
    p_cr2.add_argument("rules", help="rules YAML (model/rulefmt)")
    p_cr2.add_argument("store", help="source store the expressions read")
    p_cr2.add_argument("--start", type=int, required=True, help="range start (ms)")
    p_cr2.add_argument("--end", type=int, required=True, help="range end (ms)")
    p_cr2.add_argument("--output", default=None,
                       help="destination store (default: the source store, "
                       "which lets layered rules read earlier outputs)")
    p_cr2.add_argument("--eval-interval", type=int, default=None,
                       help="override every group's interval (ms)")
    p_cr2.add_argument("--width", type=int, default=2 * 3600 * 1000,
                       help="block width for a NEW output store")

    p_rw = sub.add_parser(
        "remote-write",
        help="push a store's samples to another instance over the "
        "remote-write wire protocol (prompb WriteRequest + snappy; "
        "the engine as SENDER — migration/forwarding)",
    )
    p_rw.add_argument("store")
    p_rw.add_argument("--url", required=True, help=".../api/v1/write endpoint")
    p_rw.add_argument("--mint", type=int, default=0)
    p_rw.add_argument("--maxt", type=int, required=True)
    p_rw.add_argument("--selector", default=None, help="PromQL selector filter")
    p_rw.add_argument("--batch-series", type=int, default=500)
    p_rw.add_argument("--v2", action="store_true",
                      help="send Remote-Write 2.0 bodies (interned "
                      "symbols; carries native histograms too)")

    p_st = sub.add_parser(
        "stream",
        help="drain a parquet file-stream of (labels,t,v) into the store "
        "(Structured Streaming ingest with checkpoint/WAL semantics)",
    )
    p_st.add_argument("store")
    p_st.add_argument("--source", required=True, help="directory watched for parquet files")
    p_st.add_argument("--checkpoint", required=True)
    p_st.add_argument("--lateness-ms", type=int, default=None)
    p_st.add_argument("--compact-every", type=int, default=0)
    p_st.add_argument("--follow", action="store_true",
                      help="keep running (default: drain available files and stop)")

    p_sc = sub.add_parser(
        "scrape",
        help="pull exposition text from HTTP target(s) into the store "
        "on a fixed interval — the scrape/scrape.go loop; point it at "
        "another instance's /federate URL to federate two stores",
    )
    p_sc.add_argument("store")
    p_sc.add_argument("--url", action="append", default=[],
                      help="target URL (repeatable)")
    p_sc.add_argument("--config",
                      help="upstream-style scrape_configs YAML "
                      "(prometheus.yml surface: job_name, "
                      "scrape_interval, static_configs labels, "
                      "relabel_configs, metric_relabel_configs) — "
                      "alternative to --url")
    p_sc.add_argument("--job", default="scrape")
    p_sc.add_argument("--interval", type=int, default=15_000, help="ms between passes")
    p_sc.add_argument("--passes", type=int, default=1,
                      help="number of passes (0 = run forever)")
    p_sc.add_argument("--timestamps", choices=("ms", "openmetrics"), default="ms")
    p_sc.add_argument("--honor-labels", action="store_true")

    p_em = sub.add_parser(
        "exemplars",
        help="print exemplars for series matching a selector (or any "
        "PromQL expr) in a range — the /api/v1/query_exemplars payload",
    )
    p_em.add_argument("store")
    p_em.add_argument("expr")
    p_em.add_argument("--start", type=int, default=-(2**62), help="ms")
    p_em.add_argument("--end", type=int, default=2**62, help="ms")

    p_cc = sub.add_parser(
        "check-config",
        help="validate a prometheus.yml + its rule files (promtool "
        "check config): blocks, durations, job names, relabel rules, "
        "SD patterns, endpoints",
    )
    p_cc.add_argument("files", nargs="+")

    p_cr = sub.add_parser(
        "check-rules",
        help="validate rule files (promtool check rules): YAML shape, "
        "names, duplicates, and every expression parses",
    )
    p_cr.add_argument("files", nargs="+")

    p_tr = sub.add_parser(
        "test-rules",
        help="run rule unit-test files (promtool test rules, "
        "cmd/promtool/unittest.go): input_series + promql_expr_test + "
        "alert_rule_test",
    )
    p_tr.add_argument("files", nargs="+")

    p_tp = sub.add_parser(
        "test-promql",
        help="run promqltest script files (the upstream PromQL "
        "conformance format, promql/promqltest/test.go): load / "
        "eval instant|range / eval_fail / eval_ordered / clear",
    )
    p_tp.add_argument("files", nargs="+")

    p_qr = sub.add_parser(
        "query-remote",
        help="query ANOTHER instance's HTTP API (promtool query "
        "instant/range analog): GET /api/v1/query or /query_range and "
        "print the JSON result — no SparkSession, pure client",
    )
    p_qr.add_argument("url", help="base URL, e.g. http://host:9090")
    p_qr.add_argument("expr")
    p_qr.add_argument("--time", type=float, default=None,
                      help="instant eval time (unix seconds)")
    p_qr.add_argument("--start", type=float, default=None)
    p_qr.add_argument("--end", type=float, default=None)
    p_qr.add_argument("--step", default=None, help="range step (e.g. 1m)")

    p_pl = sub.add_parser("plan", help="show the next compaction step without running it")
    p_pl.add_argument("store")

    p_co = sub.add_parser("compact", help="planned (leveled) compaction rounds")
    p_co.add_argument("store")
    p_co.add_argument("--width", type=int, default=None)

    p_va = sub.add_parser("vacuum", help="small-file defragmentation")
    p_va.add_argument("store")

    p_ro = sub.add_parser(
        "rollup",
        help="materialize the per-series rollup artifact, or serve a "
        "step-aggregated range from the freshest usable one",
    )
    p_ro.add_argument("store")
    p_ro.add_argument("--width", type=int, default=3_600_000,
                      help="artifact width to materialize (ms)")
    p_ro.add_argument("--serve-step", type=int, default=None,
                      help="instead of materializing, print the range "
                      "aggregated to this step (ms) via rollup_at_step")
    p_ro.add_argument("--mint", type=int, default=-(2**62))
    p_ro.add_argument("--maxt", type=int, default=2**62)

    args = ap.parse_args(argv)

    if args.cmd == "check-config":
        # static validation — no SparkSession needed (promtool parity)
        from tsdb_spark.config import check_config

        bad = 0
        for path in args.files:
            errs = check_config(path)
            if errs:
                bad += 1
                print(f"FAILED {path}:")
                for e in errs:
                    print(f"  {e}")
            else:
                print(f"SUCCESS {path}")
        return 1 if bad else 0

    if args.cmd == "check-rules":
        # static validation — no SparkSession needed (promtool parity:
        # check rules is an offline lint)
        from tsdb_spark.promtool import check_rules

        bad = 0
        for path in args.files:
            errs = check_rules(path)
            if errs:
                bad += 1
                print(f"FAILED {path}:")
                for e in errs:
                    print(f"  {e}")
            else:
                from tsdb_spark.promtool import load_rule_file

                n = sum(len(g["rules"]) for g in load_rule_file(path))
                print(f"SUCCESS {path}: {n} rules found")
        return 1 if bad else 0

    if args.cmd == "query-remote":
        # pure HTTP client — promtool `query instant|range <url> <expr>`
        import json as _json
        import urllib.parse
        import urllib.request

        base = args.url.rstrip("/")
        if args.start is not None or args.end is not None:
            if None in (args.start, args.end) or not args.step:
                print("query-remote range form needs --start --end --step",
                      file=sys.stderr)
                return 2
            qs = urllib.parse.urlencode({
                "query": args.expr, "start": args.start,
                "end": args.end, "step": args.step,
            })
            u = f"{base}/api/v1/query_range?{qs}"
        else:
            params = {"query": args.expr}
            if args.time is not None:
                params["time"] = args.time
            u = f"{base}/api/v1/query?{urllib.parse.urlencode(params)}"
        with urllib.request.urlopen(u, timeout=30) as r:
            print(_json.dumps(_json.loads(r.read()), indent=2))
        return 0

    from tsdb_spark.db import DB
    from tsdb_spark.session import get_spark

    spark = get_spark(f"tsdb-{args.cmd}")
    spark.sparkContext.setLogLevel("ERROR")

    if args.cmd in ("test-rules", "test-promql"):
        from tsdb_spark.promtool import run_promql_tests, run_rule_tests

        runner = run_rule_tests if args.cmd == "test-rules" else run_promql_tests
        bad = 0
        for path in args.files:
            fails = runner(spark, path)
            if fails:
                bad += 1
                print(f"FAILED {path}:")
                for e in fails:
                    print(f"  {e}")
            else:
                print(f"SUCCESS {path}")
        return 1 if bad else 0

    if args.cmd == "ls":
        DB.open_readonly(spark, args.store).ls().show(1000, truncate=False)
    elif args.cmd == "analyze":
        from tsdb_spark.analyze import analyze_labels, analyze_metrics

        db = DB.open_readonly(spark, args.store)
        ser = db.series().select("series_id", "labels", "labels_str")
        smp = db.samples()
        print("== label cardinality / churn ==")
        analyze_labels(ser, smp).show(args.limit, truncate=False)
        print("== per-metric series/samples ==")
        analyze_metrics(smp.join(ser, "series_id")).show(args.limit, truncate=False)
    elif args.cmd == "dump":
        df = DB.open_readonly(spark, args.store).dump(args.mint, args.maxt)
        if args.openmetrics:
            from tsdb_spark.sources.openmetrics import format_openmetrics

            lines = format_openmetrics(
                df.select("labels", "t", "v"), timestamps="ms"
            )
            if args.out:
                lines.write.mode("overwrite").text(args.out)
                print(f"wrote {args.out}")
            else:
                for row in lines.toLocalIterator():
                    print(row["line"])
        elif args.out:
            # CSV has no MAP type — export the canonical rendering
            df.select("labels_str", "t", "v").write.mode("overwrite").option(
                "header", True
            ).csv(args.out)
            print(f"wrote {args.out}")
        else:
            for row in df.toLocalIterator():
                print(f'{row["labels_str"]} {row["v"]} {row["t"]}')
    elif args.cmd == "select":
        from tsdb_spark.labels import parse_selector

        db = DB.open_readonly(spark, args.store)
        df = db.querier(args.mint, args.maxt).select_sorted(
            parse_selector(args.selector)
        )
        df.select("labels_str", "t", "v").show(args.limit, truncate=False)
    elif args.cmd == "query":
        db = DB.open_readonly(spark, args.store)
        if args.json:
            import json as _json

            from tsdb_spark.api import query_range

            print(
                _json.dumps(
                    query_range(
                        db, args.expr, args.start, args.end, args.step,
                        args.lookback,
                    )
                )
            )
        else:
            from tsdb_spark.promql import eval_range_db

            eval_range_db(
                db, args.expr, args.start, args.end, args.step, args.lookback
            ).show(args.limit, truncate=False)
    elif args.cmd == "alerts":
        from tsdb_spark import labels as L
        from tsdb_spark.rules import AlertRule, alerts_frame

        db = DB.open_readonly(spark, args.store)
        frame = alerts_frame(
            db,
            AlertRule(args.name, args.expr, for_ms=args.for_ms),
            args.start,
            args.end,
            args.step,
        )
        frame.select(
            L.labels_str_expr("labels").alias("labels_str"), "t", "v"
        ).show(args.limit, truncate=False)
    elif args.cmd == "serve":
        from tsdb_spark.api import serve

        cfg = None
        if args.config:
            from tsdb_spark.config import load_config

            cfg = load_config(spark, args.config)
            print(
                f"config: {len(cfg.scrape_jobs)} scrape job(s), "
                f"{len(cfg.rule_groups)} rule group(s), "
                f"{len(cfg.alertmanager_urls)} alertmanager(s), "
                f"{len(cfg.remote_writes)} remote_write endpoint(s)"
            )
        groups = cfg.rule_groups if cfg else None
        if args.rules:
            from tsdb_spark.promtool import load_rule_file

            groups = (groups or []) + load_rule_file(args.rules)
        import os as _os

        writable = args.enable_admin or args.scrape_url or cfg is not None or (
            args.eval_rules and groups
        ) or args.write_buffer_ms > 0
        if writable and not _os.path.exists(f"{args.store}/_meta.json"):
            db = DB.create(spark, args.store)  # fresh scrape-into store
        elif writable:
            db = DB.open(spark, args.store)
        else:
            db = DB.open_readonly(spark, args.store)
        targets, scrape_status, scrape_md = [], {}, {}
        relabel_cfgs = None
        if args.scrape_url:
            from tsdb_spark.scrape import Target

            targets = [Target(url=u, job="scrape") for u in args.scrape_url]
            if args.relabel_file:
                from tsdb_spark.relabel import load_relabel_file

                relabel_cfgs = load_relabel_file(args.relabel_file)
                print(f"loaded {len(relabel_cfgs)} relabel rule(s)")
        # the query surface reads through remote_read endpoints when the
        # config carries any (upstream's fanout storage); appending
        # loops (scrape, forwarder, write buffer) keep the raw local
        # handle — remote read is a QUERY-path layer only
        query_db = db
        if cfg is not None:
            from tsdb_spark.remoteread import ReadThroughDB, clients_from

            query_db = ReadThroughDB(db, clients_from(cfg.remote_reads))
            if cfg.remote_reads:
                print(
                    f"reading through {len(cfg.remote_reads)} "
                    "remote_read endpoint(s)"
                )
        wbuf = None
        if args.write_buffer_ms > 0:
            from tsdb_spark.api import WriteBuffer

            wbuf = WriteBuffer(db, flush_ms=args.write_buffer_ms,
                               spill_path=args.write_buffer_spill)
            mode = "durable (spill)" if args.write_buffer_spill else "in-memory"
            if wbuf.replayed:
                print(f"write buffer replayed {wbuf.replayed} spilled entries")
            print(f"write buffering ({mode}): one append per "
                  f"{args.write_buffer_ms}ms")
        groups = list(groups) if groups else ([] if cfg else groups)
        notif = None
        fwd = None
        config_state = None
        if cfg is not None:
            # the lifecycle surface (/-/reload + /api/v1/status/config):
            # shared state lives in objects the loops read each tick, so
            # an in-place swap IS the reload — no thread restarts
            config_state = {"yaml": cfg.raw_yaml,
                            "otlp_nhcb": cfg.otlp_nhcb}

            def _reload(cfg=cfg, config_state=config_state):
                new_cfg = load_config(spark, args.config)
                cfg.scrape_jobs[:] = new_cfg.scrape_jobs
                extra = []
                if args.rules:
                    from tsdb_spark.promtool import load_rule_file as _lrf

                    extra = _lrf(args.rules)
                groups[:] = list(new_cfg.rule_groups) + extra
                cfg.external_labels.clear()
                cfg.external_labels.update(new_cfg.external_labels)
                if notif is not None:
                    notif.urls = [
                        u.rstrip("/")
                        for u in list(args.alertmanager_url)
                        + new_cfg.alertmanager_urls
                    ]
                    notif.external_labels = dict(new_cfg.external_labels)
                    notif.alert_relabel = list(new_cfg.alert_relabel)
                    notif.http_configs = dict(new_cfg.alertmanager_http)
                if fwd is not None:
                    head = db.durable_head()
                    for c in new_cfg.remote_writes:
                        self_marks = fwd.watermarks
                        if c.url not in self_marks:
                            self_marks[c.url] = head
                            fwd.sent.setdefault(c.url, 0)
                    fwd.configs[:] = new_cfg.remote_writes
                if query_db is not db:
                    from tsdb_spark.remoteread import clients_from as _cf

                    query_db.clients[:] = _cf(new_cfg.remote_reads)
                config_state["yaml"] = new_cfg.raw_yaml
                # serve-constructed captures that must follow a reload:
                # the OTLP NHCB flag is read per-request via config_state
                config_state["otlp_nhcb"] = new_cfg.otlp_nhcb
                print("configuration reloaded")

            config_state["reload"] = _reload
        srv = serve(query_db, args.host, args.port, rule_groups=groups,
                    enable_admin=args.enable_admin,
                    scrape_targets=targets, scrape_status=scrape_status,
                    scrape_metadata=scrape_md, write_buffer=wbuf,
                    external_labels=cfg.external_labels if cfg else None,
                    config_state=config_state,
                    otlp_nhcb=cfg.otlp_nhcb if cfg else False)
        import threading

        stop = threading.Event()
        am_urls = list(args.alertmanager_url) + (
            cfg.alertmanager_urls if cfg else []
        )
        if cfg is not None or (groups and args.eval_rules):
            from tsdb_spark.manager import Manager

            if am_urls or cfg is not None:
                from tsdb_spark.notifier import Notifier

                notif = Notifier(
                    am_urls,
                    external_labels=cfg.external_labels if cfg else None,
                    alert_relabel=cfg.alert_relabel if cfg else None,
                    spark=spark,
                    http_configs=cfg.alertmanager_http if cfg else None,
                )
                if am_urls:
                    print(f"notifying {len(am_urls)} alertmanager(s)")
            mgr = Manager(query_db, groups if groups is not None else [],
                          notifier=notif)
            threading.Thread(
                target=mgr.loop, args=(stop,), daemon=True
            ).start()
            if groups:
                print(f"evaluating "
                      f"{sum(len(g['rules']) for g in groups)} rule(s)")
        if cfg is not None:
            from tsdb_spark.config import (
                RemoteWriteForwarder,
                scrape_scheduler_loop,
            )

            threading.Thread(
                target=scrape_scheduler_loop,
                args=(spark, db, cfg.scrape_jobs, stop),
                kwargs={"status": scrape_status, "metadata": scrape_md},
                daemon=True,
            ).start()
            n_t = sum(len(j.targets) for j in cfg.scrape_jobs)
            print(f"scraping {len(cfg.scrape_jobs)} config job(s) "
                  f"({n_t} static target(s) + file SD)")
            fwd = RemoteWriteForwarder(
                db, cfg.remote_writes,
                external_labels=cfg.external_labels,
                metadata=scrape_md,
            )
            threading.Thread(
                target=fwd.loop, args=(stop,), daemon=True
            ).start()
            if cfg.remote_writes:
                print(f"forwarding to {len(cfg.remote_writes)} "
                      "remote_write endpoint(s)")
        if args.scrape_url:

            def _scrape():
                while not stop.is_set():
                    import time as _t

                    t0 = _t.time()
                    try:
                        from tsdb_spark.scrape import scrape_pass

                        scrape_pass(
                            spark, db, targets, status=scrape_status,
                            relabel_configs=relabel_cfgs,
                            metadata=scrape_md,
                        )
                    except Exception as e:  # keep serving on scrape errors
                        print(f"scrape pass failed: {e}")
                    stop.wait(max(0.0, args.scrape_interval / 1000.0 - (_t.time() - t0)))

            threading.Thread(target=_scrape, daemon=True).start()
            print(f"scraping {len(targets)} target(s) every {args.scrape_interval}ms")
        print(f"serving /api/v1 on http://{args.host}:{args.port}")
        try:
            srv.serve_forever()
        except KeyboardInterrupt:
            stop.set()
            srv.shutdown()
    elif args.cmd == "record":
        from tsdb_spark.rules import Rule, record

        db = DB.open(spark, args.store)
        statics = tuple(
            (kv.split("=", 1)[0], kv.split("=", 1)[1]) for kv in args.label
        )
        rule = Rule(args.name, args.expr, labels=statics)
        rep = record(db, [rule], args.start, args.end, args.step)[args.name]
        print(f"recorded {args.name}: {rep}")
    elif args.cmd == "explain":
        from tsdb_spark.labels import parse_selector

        db = DB.open_readonly(spark, args.store)
        df = db.querier(args.mint, args.maxt).select(parse_selector(args.selector))
        df.explain("formatted")
    elif args.cmd == "bench-write":
        from tsdb_spark.sources.events import events_samples

        db = DB.create(spark, args.store, block_width_ms=args.width)
        src = events_samples(spark, args.events).select("labels", "t", "v")
        t0 = time.time()
        db.append(src, report=False)
        dt = time.time() - t0
        n = db.samples().count()
        print(f"ingested {n} samples in {dt:.2f}s = {n / dt:,.0f} samples/sec")
    elif args.cmd == "exemplars":
        import json as _json

        from tsdb_spark.api import query_exemplars

        db = DB.open_readonly(spark, args.store)
        print(_json.dumps(query_exemplars(db, args.expr, args.start, args.end)))
    elif args.cmd == "create-blocks-from":
        from tsdb_spark.sources.openmetrics import create_blocks_from

        db = create_blocks_from(
            spark, args.input, args.store,
            block_width_ms=args.width, timestamps=args.timestamps,
        )
        print(f"backfilled {db.samples().count()} samples into {args.store}")
    elif args.cmd == "create-blocks-from-rules":
        import json as _json

        from tsdb_spark.promtool import backfill_rules

        rep = backfill_rules(
            spark, args.rules, args.store, args.output,
            args.start, args.end,
            eval_interval_ms=args.eval_interval, block_width_ms=args.width,
        )
        print(_json.dumps(rep))
    elif args.cmd == "remote-write":
        from tsdb_spark.labels import parse_selector
        from tsdb_spark.sources.remotewrite import (
            push_remote_write,
            push_remote_write_v2,
        )

        db = DB.open_readonly(spark, args.store)
        ms = parse_selector(args.selector) if args.selector else None
        sender = push_remote_write_v2 if args.v2 else push_remote_write
        n = sender(
            db, args.url, args.mint, args.maxt,
            matchers=ms, batch_series=args.batch_series,
        )
        print(f"pushed {n} samples to {args.url}")
    elif args.cmd == "stream":
        import os as _os

        from tsdb_spark.schema import INGEST_SCHEMA
        from tsdb_spark.streaming import StreamIngestor

        db = (
            DB.open(spark, args.store)
            if _os.path.exists(f"{args.store}/_meta.json")
            else DB.create(spark, args.store)
        )
        ing = StreamIngestor(
            db, lateness_ms=args.lateness_ms, compact_every=args.compact_every
        )
        stream = spark.readStream.schema(INGEST_SCHEMA).parquet(args.source)
        trigger = None if args.follow else {"availableNow": True}
        q = ing.start(stream, args.checkpoint, trigger=trigger)
        q.awaitTermination()
        print(f"ingested through epoch {db.meta.get('last_stream_epoch')}")
    elif args.cmd == "scrape":
        import os as _os

        from tsdb_spark.scrape import Target, scrape_loop

        if not args.url and not args.config:
            print("scrape needs --url or --config", file=sys.stderr)
            return 2
        db = (
            DB.open(spark, args.store)
            if _os.path.exists(f"{args.store}/_meta.json")
            else DB.create(spark, args.store)
        )
        if args.config:
            from tsdb_spark.scrape import load_scrape_config, scrape_config_pass

            jobs = load_scrape_config(spark, args.config)
            n_t = sum(len(j.targets) for j in jobs)
            done = 0
            while args.passes == 0 or done < args.passes:
                t0 = time.time()
                scrape_config_pass(spark, db, jobs)
                done += 1
                if args.passes != 0 and done >= args.passes:
                    break
                wait = args.interval / 1000.0 - (time.time() - t0)
                if wait > 0:
                    time.sleep(wait)
            print(f"scraped {n_t} target(s) over {len(jobs)} job(s); "
                  f"store now holds {db.samples().count()} samples")
            return 0
        targets = [
            Target(url=u, job=args.job, timestamps=args.timestamps)
            for u in args.url
        ]
        scrape_loop(
            spark, db, targets,
            interval_ms=args.interval,
            passes=None if args.passes == 0 else args.passes,
            honor_labels=args.honor_labels,
        )
        print(f"scraped {len(targets)} target(s); store now holds "
              f"{db.samples().count()} samples")
    elif args.cmd == "plan":
        db = DB.open_readonly(spark, args.store)
        buckets, width = db.compact_plan()
        if not buckets:
            print("plan: nothing to compact")
        elif width is None:
            print(f"plan: rewrite in place: {buckets}")
        else:
            print(f"plan: merge {buckets} -> width {width} ms")
    elif args.cmd == "compact":
        db = DB.open(spark, args.store)
        if args.width is not None:
            # explicit width: one full rewrite at that block width
            db.compact(args.width)
            print(f"compacted store to width {args.width} ms")
        else:
            rounds = db.auto_compact()
            print(f"compacted {len(rounds)} round(s): {rounds}")
    elif args.cmd == "vacuum":
        db = DB.open(spark, args.store)
        print(f"rewrote buckets: {db.vacuum()}")
    elif args.cmd == "rollup":
        if args.serve_step is not None:
            db = DB.open_readonly(spark, args.store)
            usable = [w for w in db.fresh_rollup_widths() if args.serve_step % w == 0]
            src = f"artifact w={max(usable)}" if usable else "raw samples (no fresh artifact)"
            print(f"serving step={args.serve_step} ms from {src}")
            db.rollup_at_step(args.mint, args.maxt, args.serve_step).show(50, False)
        else:
            db = DB.open(spark, args.store)
            db.materialize_rollup(args.width)
            print(f"materialized rollup artifact at width {args.width} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
