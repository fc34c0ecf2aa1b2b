"""Relabeling rules (upstream model/relabel/relabel.go — the public
`relabel_configs` / `metric_relabel_configs` surface every real scrape
config uses) as pure Column algebra over the `labels` MAP column.

Each rule joins the values of `source_labels` with `separator`, matches
the (fully anchored, like upstream) `regex`, and acts:

  replace    regex match → set `target_label` (template-expanded) to the
             group-expanded `replacement`; "" deletes the label; no
             match → rule is a no-op
  keep       drop the SAMPLE unless the joined value matches
  drop       drop the sample if it matches
  keepequal  drop unless joined value == current target_label value
  dropequal  drop if joined value == current target_label value
  lowercase / uppercase   target_label = lower/upper(joined value)
  hashmod    target_label = (last 8 bytes of md5(joined value), as a
             big-endian uint64) % modulus — upstream relabel.go's exact
             hash, so shard assignment agrees with Prometheus
  labelmap   every label NAME matching regex is copied to the
             group-expanded replacement name (original kept)
  labeldrop / labelkeep   remove labels by NAME regex

After all rules, empty-valued labels are stripped (upstream's
labels.Builder semantics) and samples whose label set emptied are
dropped (scrape.go drops unrelabeled series).

Everything is a projection + one optional filter — no UDFs, no shuffle;
at 100 TB these rewrites ride the same scan as parsing. Regex syntax is
Java (Spark's engine) vs upstream's RE2; the subset real configs use
(alternation, classes, anchors, groups, `$1`/`${1}` references) behaves
identically — see tests/test_relabel.py for the parity fixture.
"""

from __future__ import annotations

import re as _re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["RelabelConfig", "apply_relabel", "process_labels",
           "load_relabel_file"]

_ACTIONS = {
    "replace", "keep", "drop", "keepequal", "dropequal", "lowercase",
    "uppercase", "hashmod", "labelmap", "labeldrop", "labelkeep",
}


@dataclass(frozen=True)
class RelabelConfig:
    """One rule, defaults per upstream DefaultRelabelConfig
    (action=replace, separator=";", regex="(.*)", replacement="$1")."""

    action: str = "replace"
    source_labels: tuple[str, ...] = field(default_factory=tuple)
    separator: str = ";"
    regex: str = "(.*)"
    modulus: int = 0
    target_label: str = ""
    replacement: str = "$1"

    def __post_init__(self):
        if self.action not in _ACTIONS:
            raise ValueError(f"unknown relabel action {self.action!r}")
        if self.action == "hashmod" and self.modulus <= 0:
            raise ValueError("hashmod requires a positive modulus")
        if (
            self.action
            in {"replace", "keepequal", "dropequal", "lowercase",
                "uppercase", "hashmod"}
            and not self.target_label
        ):
            raise ValueError(f"{self.action} requires target_label")


def _anchored(regex: str) -> str:
    """Upstream anchors every relabel regex: ^(?:re)$."""
    return f"^(?:{regex})$"


_NAME_RUN = _re.compile(r"[0-9A-Za-z_]+")


def _tmpl(s: str, pattern: str) -> str:
    """Upstream's RE2 Expand template syntax → Java replacement syntax,
    with RE2's forgiving semantics preserved (Go regexp.ExpandString):

    - `$N` / `${N}` referencing a group the pattern HAS → Java `$N`;
      referencing a group it LACKS expands to the empty string (Java
      regexp_replace would throw IndexOutOfBounds at runtime, failing
      configs that are valid under Prometheus);
    - `$name` / `${name}` for a declared named group → Java `${name}`;
      an undeclared name expands to '' like RE2;
    - `$$`, or a `$` that starts no valid reference, → literal `$`
      (Java-escaped as `\\$`);
    - literal backslashes escape to `\\\\` (Java replacement treats
      `\\` as an escape character where RE2 templates do not).

    Reference name runs follow Go's extract(): the longest run of
    [0-9A-Za-z_]; `$1x` names the group "1x", which no pattern declares
    (names can't start with a digit), so it expands to '' — not Java's
    "$1 then literal x"."""
    try:
        compiled = _re.compile(pattern)
        ngroups, names = compiled.groups, set(compiled.groupindex)
    except _re.error:
        # Python couldn't parse what Java will run (syntax gap, e.g.
        # Java-only constructs): skip validation, pass references through
        ngroups, names = None, None

    def _num(n: int) -> str:
        if ngroups is not None and n > ngroups:
            return ""
        return f"${n}"

    def _named(name: str) -> str:
        if names is not None and name not in names:
            return ""
        return f"${{{name}}}"

    out: list[str] = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\":
            out.append("\\\\")
            i += 1
            continue
        if c != "$":
            out.append(c)
            i += 1
            continue
        rest = s[i + 1:]
        if rest.startswith("$"):
            out.append("\\$")
            i += 2
            continue
        if rest.startswith("{"):
            end = rest.find("}")
            name = rest[1:end] if end > 0 else ""
            if end > 0 and _NAME_RUN.fullmatch(name):
                out.append(_num(int(name)) if name.isdigit() else _named(name))
                i += 1 + end + 1
                continue
            # malformed ${...}: Go leaves the `$` literal
            out.append("\\$")
            i += 1
            continue
        m = _NAME_RUN.match(rest)
        if not m:
            out.append("\\$")  # `$` at end / before non-name char
            i += 1
            continue
        name = m.group(0)
        out.append(_num(int(name)) if name.isdigit() else _named(name))
        i += 1 + m.end()
    return "".join(out)


def _joined(labels: Column, cfg: RelabelConfig) -> Column:
    vals = [
        F.coalesce(F.element_at(labels, F.lit(sl)), F.lit(""))
        for sl in cfg.source_labels
    ]
    if not vals:
        return F.lit("")
    out = vals[0]
    for v in vals[1:]:
        out = F.concat(out, F.lit(cfg.separator), v)
    return out


def _set_label(labels: Column, key: Column, value: Column) -> Column:
    """labels[key] = value, dropping any prior entry for key (keys are
    dynamic Columns; map_concat would throw on the duplicate)."""
    without = F.map_filter(labels, lambda k, _: k != key)
    return F.map_concat(without, F.create_map(key, value))


def _apply_one(labels: Column, keep: Column, cfg: RelabelConfig):
    """Fold one rule into (labels, keep) Columns."""
    rx = _anchored(cfg.regex)
    val = _joined(labels, cfg)
    matched = val.rlike(rx)
    if cfg.action == "keep":
        return labels, keep & matched
    if cfg.action == "drop":
        return labels, keep & ~matched
    if cfg.action in ("keepequal", "dropequal"):
        cur = F.coalesce(
            F.element_at(labels, F.lit(cfg.target_label)), F.lit("")
        )
        eq = val == cur
        return labels, keep & (eq if cfg.action == "keepequal" else ~eq)
    if cfg.action == "replace":
        res = F.regexp_replace(val, rx, _tmpl(cfg.replacement, cfg.regex))
        tgt = F.regexp_replace(val, rx, _tmpl(cfg.target_label, cfg.regex))
        new = F.when(
            matched,
            F.when(res == "", F.map_filter(labels, lambda k, _: k != tgt))
            .otherwise(_set_label(labels, tgt, res)),
        ).otherwise(labels)
        return new, keep
    if cfg.action in ("lowercase", "uppercase"):
        fn = F.lower if cfg.action == "lowercase" else F.upper
        return _set_label(labels, F.lit(cfg.target_label), fn(val)), keep
    if cfg.action == "hashmod":
        # relabel.go: md5 sum, last 8 bytes as big-endian uint64,
        # % modulus. conv() reads the 16 hex chars as unsigned;
        # DECIMAL(20,0) holds the full uint64 range for the pmod.
        mod = F.pmod(
            F.conv(F.substring(F.md5(val), 17, 16), 16, 10).cast(
                "decimal(20,0)"
            ),
            F.lit(cfg.modulus),
        ).cast("long")
        return (
            _set_label(labels, F.lit(cfg.target_label), mod.cast("string")),
            keep,
        )
    if cfg.action == "labelmap":
        mapped = F.transform_keys(
            F.map_filter(labels, lambda k, _: k.rlike(rx)),
            lambda k, _: F.regexp_replace(k, rx, _tmpl(cfg.replacement, cfg.regex)),
        )
        new_keys = F.map_keys(mapped)
        return (
            F.map_concat(
                F.map_filter(
                    labels, lambda k, _: ~F.array_contains(new_keys, k)
                ),
                mapped,
            ),
            keep,
        )
    if cfg.action == "labeldrop":
        return F.map_filter(labels, lambda k, _: ~k.rlike(rx)), keep
    # labelkeep
    return F.map_filter(labels, lambda k, _: k.rlike(rx)), keep


def apply_relabel(
    df: DataFrame, configs: list[RelabelConfig], label_col: str = "labels"
) -> DataFrame:
    """Apply a rule chain to df[label_col] (MAP<STRING,STRING>):
    relabel.Process over every row as one projection + one filter.
    Rules see the previous rules' output (chaining, including the
    `__tmp` scratch-label convention); empty-valued labels are stripped
    at the end and rows whose label set emptied are dropped."""
    labels: Column = F.col(label_col)
    kept: Column = F.lit(True)
    for cfg in configs:
        labels, kept = _apply_one(labels, kept, cfg)
    labels = F.map_filter(labels, lambda _, v: v != "")
    # filter BEFORE replacing the column: kept's expression tree is
    # rooted at the ORIGINAL label map; filtering after the withColumn
    # would re-resolve that root against the rewritten map, so a drop
    # rule whose source label a later rule rewrites would re-evaluate
    # against the new value and mis-keep
    return (
        df.filter(kept)
        .withColumn(label_col, labels)
        .filter(F.size(F.map_keys(F.col(label_col))) > 0)
    )


def relabel_targets(spark, targets, configs: list[RelabelConfig]):
    """TARGET relabeling (the `relabel_configs:` block upstream applies
    at service-discovery time, scrape/target.go PopulateLabels): run the
    same rule chain over each Target's label set — a dropped label set
    drops the target. Reuses apply_relabel verbatim (one tiny local
    DataFrame over the handful of targets), so target- and
    metric-relabeling can never diverge semantically. Returns the
    surviving targets with their rewritten extra labels; job/instance
    rewrites land back on the Target fields."""
    from tsdb_spark.scrape import Target

    rows = [
        (i, t.target_labels()) for i, t in enumerate(targets)
    ]
    if not rows:
        return []
    df = spark.createDataFrame(rows, "idx LONG, labels MAP<STRING,STRING>")
    out = apply_relabel(df, configs)
    kept = []
    for r in out.orderBy("idx").collect():
        t = targets[r["idx"]]
        lab = dict(r["labels"])
        job = lab.pop("job", t.job)
        instance = lab.pop("instance", t.instance)
        kept.append(
            Target(
                url=t.url,
                job=job,
                instance=instance,
                labels=tuple(sorted(lab.items())),
                timestamps=t.timestamps,
            )
        )
    return kept


def _expand(template: str, m: "_re.Match") -> str:
    """Go regexp.ExpandString over a Python match — the same reference
    rules _tmpl translates for Java: $N/$name/${...}, missing groups
    expand to '', $$ is a literal $, name runs are the longest
    [0-9A-Za-z_] run (so `$1x` names group \"1x\" → '')."""
    gi = m.re.groupindex
    n = m.re.groups

    def _num(k: int) -> str:
        return (m.group(k) or "") if k <= n else ""

    def _named(name: str) -> str:
        return (m.group(name) or "") if name in gi else ""

    out: list[str] = []
    i = 0
    while i < len(template):
        c = template[i]
        if c != "$":
            out.append(c)
            i += 1
            continue
        rest = template[i + 1:]
        if rest.startswith("$"):
            out.append("$")
            i += 2
            continue
        if rest.startswith("{"):
            end = rest.find("}")
            name = rest[1:end] if end > 0 else ""
            if end > 0 and _NAME_RUN.fullmatch(name):
                out.append(_num(int(name)) if name.isdigit()
                           else _named(name))
                i += 1 + end + 1
                continue
            out.append("$")
            i += 1
            continue
        mm = _NAME_RUN.match(rest)
        if not mm:
            out.append("$")
            i += 1
            continue
        name = mm.group(0)
        out.append(_num(int(name)) if name.isdigit() else _named(name))
        i += 1 + mm.end()
    return "".join(out)


def process_labels(
    labels: dict, configs: list[RelabelConfig]
) -> dict | None:
    """relabel.Process as a pure-Python interpreter over ONE label-set
    dict: same RelabelConfig structs and same semantics as the Column
    engine (parity-pinned by tests/test_relabel.py), for driver-side
    human-scale consumers — alert batches — where launching a Spark
    job per notifier tick would be pure latency. Returns the rewritten
    dict, or None where the chain dropped the set."""
    import hashlib as _hashlib

    lab = dict(labels)
    for cfg in configs:
        rx = _re.compile(_anchored(cfg.regex))
        val = cfg.separator.join(
            lab.get(sl, "") for sl in cfg.source_labels
        )
        m = rx.search(val)
        if cfg.action == "keep":
            if m is None:
                return None
        elif cfg.action == "drop":
            if m is not None:
                return None
        elif cfg.action in ("keepequal", "dropequal"):
            eq = val == lab.get(cfg.target_label, "")
            if (cfg.action == "keepequal") != eq:
                return None
        elif cfg.action == "replace":
            if m is not None:
                res = _expand(cfg.replacement, m)
                tgt = _expand(cfg.target_label, m)
                if res == "":
                    lab.pop(tgt, None)
                else:
                    lab[tgt] = res
        elif cfg.action in ("lowercase", "uppercase"):
            lab[cfg.target_label] = (
                val.lower() if cfg.action == "lowercase" else val.upper()
            )
        elif cfg.action == "hashmod":
            # relabel.go: last 8 bytes of md5, big-endian, % modulus
            h = int.from_bytes(
                _hashlib.md5(val.encode()).digest()[-8:], "big"
            )
            lab[cfg.target_label] = str(h % cfg.modulus)
        elif cfg.action == "labelmap":
            mapped = {}
            for k, v in lab.items():
                km = rx.search(k)
                if km is not None:
                    mapped[_expand(cfg.replacement, km)] = v
            lab = {k: v for k, v in lab.items() if k not in mapped}
            lab.update(mapped)
        elif cfg.action == "labeldrop":
            lab = {k: v for k, v in lab.items() if rx.search(k) is None}
        else:  # labelkeep
            lab = {k: v for k, v in lab.items()
                   if rx.search(k) is not None}
    lab = {k: v for k, v in lab.items() if v != ""}
    return lab or None


def relabel_labelsets(
    spark, labelsets: list[dict], configs: list[RelabelConfig]
) -> list[dict | None]:
    """Run the rule chain over arbitrary label-set dicts (the
    `alert_relabel_configs:` consumer — notifier.go relabelAlerts):
    returns one entry per input, None where the chain dropped the set.
    Evaluates with the pure-Python process_labels interpreter — alert
    batches are human-scale, and a Spark job per notifier tick is pure
    latency; semantic parity with the Column engine is pinned by
    tests/test_relabel.py. `spark` is kept for signature compatibility
    and unused."""
    return [process_labels(lab, configs) for lab in labelsets]


def load_relabel_file(path: str) -> list[RelabelConfig]:
    """Load a YAML (or JSON) list of upstream-style relabel rule
    mappings — the exact `relabel_configs:` block syntax."""
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f)
    if isinstance(raw, dict):  # allow a {relabel_configs: [...]} document
        raw = raw.get("relabel_configs", raw.get("metric_relabel_configs"))
    if not isinstance(raw, list):
        raise ValueError("relabel file must contain a list of rules")
    out = []
    for r in raw:
        kw = dict(r)
        if "source_labels" in kw:
            kw["source_labels"] = tuple(kw["source_labels"])
        out.append(RelabelConfig(**kw))
    return out
