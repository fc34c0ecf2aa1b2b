"""OpenMetrics / Prometheus exposition text ⇄ samples (backfill path).

The upstream ecosystem's bulk-import flow is `promtool tsdb
create-blocks-from openmetrics` (prometheus/prometheus
cmd/promtool/backfill.go): parse an exposition-format dump and write it
into tsdb blocks. The reference library's own CLI stops at
ls/analyze/dump (cmd/tsdb/main.go) — like the PromQL/rules/API layers,
backfill is the layer users run *above* the reference, so it belongs
here. The `dump` subcommand already emits this shape (db.py dump:
`{labels} value timestamp`), so dump → create-blocks-from is a full
export/import roundtrip.

Spark-first: the parser is ONE JVM-side projection over
`spark.read.text` — regexp_extract / regexp_extract_all /
map_from_arrays, no Python in the row path — so a 100 TB exposition dump
parses as an ordinary distributed scan with the same shuffle profile as
any other ingest (the samples-side shuffle carries bare (series_id, t,
v); labels ride the dim path, db.py append).

Line grammar (one sample per line; `# ...` comment/TYPE/HELP/EOF lines
and blanks are dropped, matching backfill.go's textparse loop):

    name{l1="v1",l2="v2"} value timestamp
    name value timestamp            # empty label set

Timestamps: OpenMetrics stamps SECONDS (possibly fractional —
backfill.go multiplies by 1000); the classic exposition format (and
/federate here, web/federate.go) stamps MILLISECONDS. `timestamps=`
selects the unit; seconds parse through DECIMAL(20,3) so ms-precision
stamps roundtrip exactly (double math would lose ulps at 1.7e12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tsdb_spark import labels as L

#: metric names: [a-zA-Z_:][a-zA-Z0-9_:]*; label names: no colon
_NAME_RE = r"^([A-Za-z_:][A-Za-z0-9_:]*)"
#: one label pair inside the braces: name="value" where the name is
#: bare (legacy charset) or quoted (3.x UTF-8 names) and the value is
#: any run of non-quote/non-backslash chars or backslash escapes
#: (\\ \" \n)
_PAIR_RE = r'("(?:\\.|[^"\\])*"|[A-Za-z_][A-Za-z0-9_]*)="((?:\\.|[^"\\])*)"'
#: 3.x UTF-8 metric name: the leading bare quoted term in the braces
#: ({"my.metric", ...}) — quoted string followed by ',' or the end,
#: NOT by '=' (that would be a quoted label name)
_QNAME_RE = r'^\s*"((?:\\.|[^"\\])*)"\s*(?:,|$)'
#: NUL sentinel for the two-phase backslash unescape (can't appear in
#: exposition text — it's a line-oriented ASCII format)
_SENTINEL = "\x00"


def _unescape(col):
    """Exposition label-value unescape: \\\\ → \\, \\" → ", \\n → LF.
    The literal-backslash case must not re-trigger on the output of the
    other two, so it detours through a sentinel char first."""
    c = F.regexp_replace(col, r"\\\\", _SENTINEL)
    c = F.regexp_replace(c, r'\\"', '"')
    c = F.regexp_replace(c, r"\\n", "\n")
    return F.regexp_replace(c, _SENTINEL, r"\\")


def _escape(col):
    """Inverse of _unescape (same table as api._escape_label_value /
    web/federate.go's labels rendering)."""
    c = F.regexp_replace(col, r"\\", r"\\\\")
    c = F.regexp_replace(c, '"', '\\\\"')
    return F.regexp_replace(c, "\n", r"\\n")


def parse_openmetrics(
    spark: SparkSession,
    path: str | None = None,
    lines: DataFrame | None = None,
    timestamps: str = "openmetrics",
    default_time_ms: int | None = None,
) -> DataFrame:
    """Exposition text → samples(labels MAP<STRING,STRING>, t LONG,
    v DOUBLE) — db.append's input contract.

    `path` reads via spark.read.text (directory, glob, or single file);
    alternatively pass a one-string-column DataFrame as `lines`.
    `timestamps`: "openmetrics" (seconds, fractional ok — backfill.go)
    or "ms" (classic exposition / the `dump` CLI output).
    `default_time_ms` stamps timestamp-LESS lines (`name{...} value`,
    the common /metrics shape) with the given instant — the scrape-time
    rule (scrape/scrape.go append: un-timestamped samples get the
    scrape timestamp). Without it, such lines are dropped like any
    other malformed line (backfill.go requires explicit stamps).
    """
    if timestamps not in ("openmetrics", "ms"):
        raise ValueError(f"timestamps must be 'openmetrics' or 'ms', got {timestamps!r}")
    if lines is None:
        if path is None:
            raise ValueError("pass `path` or `lines`")
        lines = spark.read.text(path)
    col = lines.columns[0]
    ln = F.trim(F.col(col))
    rows = lines.select(ln.alias("ln")).filter(
        (F.length("ln") > 0) & ~F.col("ln").startswith("#")
    )

    # value [timestamp] are the tokens after the brace block (or after
    # the bare name); the timestamp group is optional. The brace match
    # is GREEDY to the last '}', so label values containing '}' or
    # spaces stay inside `braces`. A line may also START with '{' —
    # the 3.x UTF-8 form where the quoted metric name is the first
    # brace term ({"my.metric", ...}).
    has_braces = F.col("ln").rlike(
        r"^[A-Za-z_:][A-Za-z0-9_:]*\{"
    ) | F.col("ln").startswith("{")
    braces = F.when(
        has_braces, F.regexp_extract("ln", r"\{(.*)\}", 1)
    ).otherwise(F.lit(""))
    tail_re_braced = r"\}\s+(\S+)(?:\s+(\S+))?\s*$"
    tail_re_bare = r"^[A-Za-z_:][A-Za-z0-9_:]*\s+(\S+)(?:\s+(\S+))?\s*$"
    val_s = F.when(
        has_braces, F.regexp_extract("ln", tail_re_braced, 1)
    ).otherwise(F.regexp_extract("ln", tail_re_bare, 1))
    ts_s = F.when(
        has_braces, F.regexp_extract("ln", tail_re_braced, 2)
    ).otherwise(F.regexp_extract("ln", tail_re_bare, 2))

    bare_name = F.regexp_extract("ln", _NAME_RE, 1)
    qname = _unescape(F.regexp_extract(braces, _QNAME_RE, 1))
    parsed = rows.select(
        F.when(bare_name != "", bare_name).otherwise(qname).alias("name"),
        braces.alias("braces"),
        val_s.alias("val_s"),
        ts_s.alias("ts_s"),
    ).filter((F.col("name") != "") & (F.col("val_s") != ""))
    if default_time_ms is None:
        parsed = parsed.filter(F.col("ts_s") != "")

    # quoted label names carry their quotes through the regex group;
    # strip + unescape them (legacy bare names pass through)
    keys = F.transform(
        F.regexp_extract_all("braces", F.lit(_PAIR_RE), 1),
        lambda k: F.when(
            k.startswith('"'),
            _unescape(k.substr(F.lit(2), F.length(k) - 2)),
        ).otherwise(k),
    )
    vals = F.transform(
        F.regexp_extract_all("braces", F.lit(_PAIR_RE), 2), _unescape
    )
    labels = F.map_from_arrays(
        F.concat(F.array(F.lit("__name__")), keys),
        F.concat(F.array(F.col("name")), vals),
    )
    # +Inf/-Inf spellings (exposition format) aren't in Spark's double
    # cast vocabulary; NaN/Infinity are
    # try_cast, not cast: a malformed value/timestamp drops the line
    # (textparse's per-line error skip), it must not kill the whole scan
    # under ANSI mode
    v = (
        F.when(F.col("val_s").isin("+Inf", "Inf"), F.lit(float("inf")))
        .when(F.col("val_s") == "-Inf", F.lit(float("-inf")))
        .otherwise(F.col("val_s").try_cast("double"))
    )
    if timestamps == "openmetrics":
        t = (F.col("ts_s").try_cast("decimal(20,3)") * 1000).try_cast("long")
    else:
        t = F.col("ts_s").try_cast("long")
    if default_time_ms is not None:
        t = F.when(F.col("ts_s") == "", F.lit(int(default_time_ms))).otherwise(t)
    return parsed.select(
        L.strip_empty_labels(labels).alias("labels"),
        t.alias("t"),
        v.alias("v"),
    ).filter(F.col("t").isNotNull() & F.col("v").isNotNull())


def format_openmetrics(samples: DataFrame, timestamps: str = "openmetrics") -> DataFrame:
    """samples(labels, t, v) → one-column DataFrame of exposition lines
    (label pairs key-sorted, values escaped, name first) — the /federate
    and `dump` rendering as a distributed projection. Writer's dual of
    parse_openmetrics: parse(format(df)) == df exactly (values render via
    Java's shortest-roundtrip Double.toString; seconds stamps carry
    exactly 3 decimals so the DECIMAL(20,3) parse is lossless)."""
    if timestamps not in ("openmetrics", "ms"):
        raise ValueError(f"timestamps must be 'openmetrics' or 'ms', got {timestamps!r}")
    legacy = r"^[A-Za-z_][A-Za-z0-9_]*$"
    pairs = F.array_sort(
        F.filter(F.map_entries("labels"), lambda e: e["key"] != "__name__")
    )
    rendered = F.array_join(
        F.transform(
            pairs,
            lambda e: F.concat(
                # 3.x UTF-8 label names render quoted; legacy ones bare
                F.when(e["key"].rlike(legacy), e["key"]).otherwise(
                    F.concat(F.lit('"'), _escape(e["key"]), F.lit('"'))
                ),
                F.lit('="'),
                _escape(e["value"]),
                F.lit('"'),
            ),
        ),
        ",",
    )
    # Spark renders double Infinity/NaN as "Infinity"/"NaN"; map to the
    # exposition spellings so the output re-parses and upstream ingests it
    v_s = (
        F.when(F.col("v") == float("inf"), F.lit("+Inf"))
        .when(F.col("v") == float("-inf"), F.lit("-Inf"))
        .otherwise(F.col("v").cast("string"))
    )
    if timestamps == "openmetrics":
        ts = F.concat(
            (F.col("t").cast("long") / 1000).cast("decimal(20,3)").cast("string")
        )
    else:
        ts = F.col("t").cast("string")
    name = F.coalesce(F.element_at("labels", "__name__"), F.lit(""))
    legacy_name = name.rlike(r"^[A-Za-z_:][A-Za-z0-9_:]*$")
    # UTF-8 metric names move inside the braces as the first quoted
    # term ({"my.metric", ...} — the 3.x exposition syntax)
    prefix = F.when(legacy_name, name).otherwise(F.lit(""))
    qterm = F.when(
        legacy_name | (name == ""), F.lit("")
    ).otherwise(
        F.concat(
            F.lit('"'),
            _escape(name),
            F.lit('"'),
            F.when(rendered != "", F.lit(",")).otherwise(F.lit("")),
        )
    )
    return samples.select(
        F.concat(
            prefix,
            F.lit("{"),
            qterm,
            rendered,
            F.lit("}"),
            F.lit(" "),
            v_s,
            F.lit(" "),
            ts,
        ).alias("line")
    )


def create_blocks_from(
    spark: SparkSession,
    input_path: str,
    db_path: str,
    block_width_ms: int = 2 * 3600 * 1000,
    timestamps: str = "openmetrics",
):
    """`promtool tsdb create-blocks-from openmetrics <input> <db dir>`
    (cmd/promtool/backfill.go): parse the dump and append it into a
    (new or existing) store. backfill.go cuts 2h-aligned blocks; here
    the store's tumbling t_bucket partitioning (T4) does the same cut
    declaratively — one distributed parse feeding one transactional
    append, no driver-side batching loop. Returns the DB."""
    import os

    from tsdb_spark.db import DB

    db = (
        DB.open(spark, db_path)
        if os.path.exists(os.path.join(db_path, "_meta.json"))
        else DB.create(spark, db_path, block_width_ms=block_width_ms)
    )
    db.append(parse_openmetrics(spark, input_path, timestamps=timestamps))
    return db
