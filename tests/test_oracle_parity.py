"""Mirror of the driver's correctness gate: run every queries() entry on
Spark AND its oracle_sql() on DuckDB over the same parquet tables,
compare row counts + order-insensitive values (columns sorted by name).

Run at sf0.001 locally; the driver runs sf0.01.
"""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, bool):
        return bool(v)
    return v


def _rows_to_set(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm(r[i]) for i in idx) for r in rows), key=repr
    )


QUERY_NAMES = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, name):
    qfn = entrymod.queries()[name]
    oracles = entrymod.oracle_sql()
    sdf = qfn(spark, SF_DIR)
    scols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]
    if name not in oracles:
        assert len(srows) >= 0  # rows-only check
        return
    con = _duck()
    res = con.sql(oracles[name])
    dcols = [c.lower() for c in res.columns]
    # The driver's value hash is TYPE-sensitive: any dtype divergence
    # between the Spark result and the DuckDB oracle hash-mismatches
    # even with identical values (round-1 failure mode: sum(int) ->
    # HUGEINT vs BIGINT).  Compare the full mapped dtype per column.
    _DUCK_TO_SPARK = {
        "BIGINT": "bigint", "INTEGER": "int", "SMALLINT": "smallint",
        "TINYINT": "tinyint", "DOUBLE": "double", "FLOAT": "float",
        "VARCHAR": "string", "BOOLEAN": "boolean", "BLOB": "binary",
        "DATE": "date", "TIMESTAMP": "timestamp",
    }
    sdtypes = {c.lower(): t for c, t in sdf.dtypes}
    for c, t in zip(res.columns, res.types):
        duck_t = str(t).upper()
        want = _DUCK_TO_SPARK.get(duck_t)
        assert want is not None, (
            f"{name}: oracle column {c} has unmapped DuckDB type {t} "
            f"(HUGEINT => add ::BIGINT; DECIMAL => cast to DOUBLE)"
        )
        got = sdtypes.get(c.lower())
        assert got == want, (
            f"{name}: dtype mismatch on {c}: spark={got} duck={t} "
            f"(driver hash is type-sensitive)"
        )
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), (
        f"{name}: column sets differ: spark={scols} duck={dcols}"
    )
    assert len(srows) == len(drows), (
        f"{name}: row counts differ: spark={len(srows)} duck={len(drows)}"
    )
    a = _rows_to_set(scols, srows)
    b = _rows_to_set(dcols, drows)
    if a != b:
        diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"doc_id", "order", "kind", "text"}.issubset(set(df.columns))
