#!/usr/bin/env python
"""Phase-level wall profile of DB.append (VERDICT r10 #4): wraps the
write, publish, seq-reserve, series-upsert and warm-index steps with
timers via monkeypatching. Measurement aid only."""
from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/../..")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from tsdb_spark import DB, get_spark  # noqa: E402
import tsdb_spark.db as dbmod  # noqa: E402
from tsdb_spark.sources.events import events_samples  # noqa: E402
import pyspark.sql.readwriter as rw  # noqa: E402

LOG: list[tuple[str, float]] = []


def timed(name, fn):
    def wrap(*a, **k):
        t0 = time.time()
        try:
            return fn(*a, **k)
        finally:
            LOG.append((name, time.time() - t0))

    return wrap


dbmod.DB._upsert_series = timed("upsert_series", dbmod.DB._upsert_series)
dbmod.DB._publish_staged = timed("publish_staged", dbmod.DB._publish_staged)
dbmod.DB._reserve_seq = timed("reserve_seq", dbmod.DB._reserve_seq)
dbmod.DB._write_meta = timed("write_meta", dbmod.DB._write_meta)
rw.DataFrameWriter.parquet = timed("writer.parquet", rw.DataFrameWriter.parquet)

spark = get_spark("profile-append")
spark.sparkContext.setLogLevel("ERROR")
wh = tempfile.mkdtemp(prefix="prof_append_")
rows = events_samples(spark, SF_DIR).select("labels", "t", "v")
rows.count()  # warm untimed

for rep in range(int(os.environ.get("REPS", "3"))):
    LOG.clear()
    t0 = time.time()
    db = DB.create(spark, f"{wh}/db{rep}", block_width_ms=6 * 3600 * 1000)
    t1 = time.time()
    db.append(rows, report=False)
    t2 = time.time()
    phases = {}
    for nm, d in LOG:
        phases[nm] = phases.get(nm, 0.0) + d
    acct = sum(phases.values())
    print(
        f"rep {rep}: append {t2-t1:6.3f}s  "
        + "  ".join(f"{k}={v:.3f}" for k, v in phases.items())
        + f"  other={t2-t1-acct:.3f}"
    )
