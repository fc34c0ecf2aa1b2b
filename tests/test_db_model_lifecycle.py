"""Stateful model-based lifecycle test: a fixed-seed random interleaving
of append / delete / compact / clean_tombstones / retention steps, each
checked against a pure-python model of the store's documented semantics
(the db_test.go:639-795 oracle pattern extended over the write path).

Model semantics under test (all matching the reference):
- in-batch amend keeps min(v) (default policy), duplicates collapse;
- cross-batch duplicates at (series, t) resolve later-ingest-wins
  (vertical dedup on ingest_seq);
- delete(mint, maxt, matchers) records tombstones for series existing
  at delete time; tombstones mask at read EVERY sample in the interval,
  including ones appended after the delete, until clean_tombstones
  physically drops the masked samples and clears the tombstones;
- retain_after drops whole buckets with lo + width <= cutoff — samples
  above the cutoff inside a surviving bucket stay;
- compaction/planning never changes query results, only layout.
"""

import random

import pytest

from tsdb_spark import labels as L
from tsdb_spark.db import DB

WIDTH = 1000


def canon(ls):
    return "{" + ",".join(f'{k}="{v}"' for k, v in sorted(ls.items())) + "}"


LABEL_SETS = [
    {"m": "cpu", "host": "a"},
    {"m": "cpu", "host": "b"},
    {"m": "mem", "host": "a"},
    {"m": "mem", "host": "b", "dc": "x"},
    {"m": "net", "dc": "x"},
]


class Model:
    def __init__(self):
        self.data = {}  # labels_str -> {t: v}
        self.tombs = {}  # labels_str -> [(mint, maxt)]

    def append(self, batch):
        # batch: list of (labels_str, t, v); in-batch: min(v) per (s, t);
        # cross-batch: the new batch overwrites (later-ingest-wins)
        agg = {}
        for s, t, v in batch:
            k = (s, t)
            agg[k] = min(agg[k], v) if k in agg else v
        for (s, t), v in agg.items():
            self.data.setdefault(s, {})[t] = v

    def delete(self, mint, maxt, pred):
        # tombstones bind to series existing at delete time
        for s in self.data:
            if pred(s):
                self.tombs.setdefault(s, []).append((mint, maxt))

    def clean_tombstones(self):
        for s, ivs in self.tombs.items():
            sams = self.data.get(s, {})
            for lo, hi in ivs:
                for t in [t for t in sams if lo <= t <= hi]:
                    del sams[t]
        self.tombs = {}

    def checkpoint(self, cutoff, widths):
        # checkpoint.go:102-261: retention behind the cutoff + tombstone
        # intervals clipped to [cutoff, inf) (spent records dropped)
        self.retain_after(cutoff, widths)
        for s in list(self.tombs):
            self.tombs[s] = [
                (max(lo, cutoff), hi) for lo, hi in self.tombs[s] if hi >= cutoff
            ]

    def retain_after(self, cutoff, widths=None):
        # retention drops whole blocks at their ACTUAL width — after a
        # level-promotion a coarse bucket straddling the cutoff survives
        # intact (db.go:839-906 deletes blocks, not sub-ranges; the
        # base-width assumption here was a latent model bug seed 101
        # exposed once compact-then-retain interleavings occurred)
        widths = widths if widths is not None else {}

        def dropped(t):
            for lo, w in widths.items():
                if lo <= t < lo + w:
                    return lo + w <= cutoff
            return (t - t % WIDTH) + WIDTH <= cutoff

        for sams in self.data.values():
            for t in [t for t in sams if dropped(t)]:
                del sams[t]

    def _masked(self, s, t):
        return any(lo <= t <= hi for lo, hi in self.tombs.get(s, []))

    def select_all(self):
        return {
            (s, t, v)
            for s, sams in self.data.items()
            for t, v in sams.items()
            if not self._masked(s, t)
        }


def series_pred(matchers):
    name_of = {canon(ls): ls for ls in LABEL_SETS}

    def pred(s):
        ls = name_of[s]
        return all(ls.get(m.name, "") == m.value for m in matchers)

    return pred


@pytest.mark.parametrize(
    "seed",
    # two fast seeds stay in the default lane; the five-seed soak sweep
    # of the same model runs in the opt-in slow lane (r11 lane split)
    [7, 23]
    + [pytest.param(s, marks=pytest.mark.slow) for s in (101, 367, 1009, 4242, 9001)],
)
def test_lifecycle_matches_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    db = DB.create(spark, str(tmp_path / f"life{seed}"), block_width_ms=WIDTH)
    model = Model()

    def spark_select_all():
        return {
            (r["labels_str"], r["t"], r["v"])
            for r in db.querier(-(10**12), 10**12).select([]).collect()
        }

    def do_append():
        batch = []
        for _ in range(rng.randint(20, 60)):
            ls = rng.choice(LABEL_SETS)
            t = rng.randint(0, 20_000)
            v = float(rng.randint(-50, 50))
            batch.append((ls, t, v))
        df = spark.createDataFrame(
            [(ls, t, v) for ls, t, v in batch],
            "labels MAP<STRING,STRING>, t LONG, v DOUBLE",
        )
        db.append(df)
        model.append([(canon(ls), t, v) for ls, t, v in batch])

    def do_delete():
        mint = rng.randint(0, 15_000)
        maxt = mint + rng.randint(0, 8_000)
        ms = [L.eq("m", rng.choice(["cpu", "mem", "net"]))]
        db.delete(mint, maxt, ms)
        model.delete(mint, maxt, series_pred(ms))

    def do_compact():
        db.auto_compact(max_rounds=2)

    def do_clean():
        db.clean_tombstones()
        model.clean_tombstones()

    def _resolve_overlaps():
        # retention on an OVERLAPPING layout is provenance-dependent in
        # both this engine and the reference (per-block time-horizon
        # deletion can drop a narrow newer block while a wide older one
        # covering the same range survives, resurrecting its values) —
        # semantics a per-(series,t) model cannot express without
        # tracking physical block membership. Real deployments compact
        # overlaps away continuously; the lifecycle does the same before
        # retention so the model's width rule is exact. Seed 1009
        # found this: dirs {3000:w3000, 4000:w1000} + retain(5904)
        # dropped the narrow block and resurrected coarse-block values.
        for _ in range(3):
            if not db.overlapping_buckets:
                return
            db.auto_compact(max_rounds=4)
        if db.overlapping_buckets:
            db.compact()  # full rewrite always clears overlaps

    def do_retain():
        cutoff = rng.randint(0, 8_000)
        _resolve_overlaps()
        widths = {
            lo: db.width_of(lo)
            for lo in (int(d.split("=")[1]) for d in db._bucket_dirs())
        }
        db.retain_after(cutoff)
        model.retain_after(cutoff, widths)

    def do_vacuum():
        # layout-only: results must be unchanged (the model does nothing)
        db.vacuum()

    def do_checkpoint():
        cutoff = rng.randint(0, 8_000)
        _resolve_overlaps()
        widths = {
            lo: db.width_of(lo)
            for lo in (int(d.split("=")[1]) for d in db._bucket_dirs())
        }
        db.checkpoint(cutoff)
        model.checkpoint(cutoff, widths)

    snap_n = [0]

    def do_snapshot_reopen():
        # fork-and-continue: the snapshot must carry the full state
        # (samples, tombstones, meta) — the rest of the run operates on
        # the REOPENED copy while the model never notices
        nonlocal db
        snap_n[0] += 1
        dest = str(tmp_path / f"snap{seed}_{snap_n[0]}")
        db.snapshot(dest)
        db = DB.open(spark, dest)

    do_append()  # non-empty start
    steps = [do_append, do_delete, do_compact, do_clean, do_retain,
             do_vacuum, do_checkpoint, do_snapshot_reopen]
    for i in range(12):
        rng.choice(steps)()
        assert spark_select_all() == model.select_all(), f"seed={seed} step={i}"
