"""Oracle SQL result-type lint.

The driver compares Spark results to DuckDB oracle results after a
conversion step that (like ``relation.df()``) degrades DuckDB HUGEINT
to float64 and DECIMAL to object/decimal — so an oracle column typed
HUGEINT renders ``934.0`` where Spark renders ``934`` and the value
hash mismatches even though the values are identical (this bit the
round-2 and round-4 gates: docs_text_stats / docs_repetition /
docs_source_report all had an un-cast ``sum()`` or ``list_sum()``
which DuckDB types as HUGEINT).

DESCRIBE only binds the query (no scan), so this lints all ~116
oracles in seconds without Spark.
"""

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

#: DuckDB types that do not survive a pandas/arrow round-trip with the
#: same text rendering as the matching Spark type.
LOSSY = ("HUGEINT", "UHUGEINT", "DECIMAL", "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def test_no_lossy_oracle_column_types(con):
    oracles = entry_mod.oracle_sql()
    assert oracles, "oracle registry is empty"
    offenders = {}
    for name, sql in oracles.items():
        cols = con.execute(f"DESCRIBE SELECT * FROM ({sql})").fetchall()
        bad = [
            (c, ty)
            for c, ty, *_ in cols
            if any(ty.startswith(l) for l in LOSSY)
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracle columns with pandas-lossy DuckDB types (wrap in "
        f"CAST(... AS BIGINT/DOUBLE)): {offenders}"
    )
