"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs a registry query on Spark and its oracle on DuckDB over the same
parquet tables, then compares row count, column-name sets, and
order-insensitive values (columns sorted by name, rows sorted) — the same
contract `__spark_entry__.py` documents. Floats compare exactly because
every registry query rounds them identically on both sides.
"""

from __future__ import annotations

import math

import duckdb

from kafka_connect_oss_spark.sources.batch import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


#: The driver's typed value hash compares results after a pandas-style
#: conversion, so what must agree between engines is the VALUE FAMILY a
#: column lands in, not the exact width. Calibrated against the full
#: driver history (r01-r09 CORRECTNESS artifacts): BIGINT-vs-INTEGER and
#: DECIMAL(13,1)-vs-DOUBLE rows were green for rounds, while the three
#: r09 reds were all HUGEINT-vs-BIGINT — DuckDB's HUGEINT leaves the int
#: family (pandas converts int128 to float64: 123 -> 123.0) and the hash
#: breaks even though values stringify equal. So: every integer width is
#: family "int"; HUGEINT and DECIMAL/FLOAT/DOUBLE are family "float";
#: the assertion fails only when the families differ.
_DUCK_FAMILY = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
    "UTINYINT": "int", "USMALLINT": "int", "UINTEGER": "int",
    "UBIGINT": "int",
    "HUGEINT": "float", "UHUGEINT": "float",  # pandas int128 -> float64
    "FLOAT": "float", "DOUBLE": "float",
    "VARCHAR": "str", "BOOLEAN": "bool", "DATE": "date",
    "TIMESTAMP": "timestamp", "TIMESTAMP WITH TIME ZONE": "timestamp",
    "BLOB": "binary",
}

_SPARK_FAMILY = {
    "tinyint": "int", "smallint": "int", "int": "int", "bigint": "int",
    "float": "float", "double": "float",
    "string": "str", "boolean": "bool", "date": "date",
    "timestamp": "timestamp", "timestamp_ntz": "timestamp",
    "binary": "binary",
}


def _family(type_str: str, table) -> str | None:
    """Value family for a type string (None = unchecked), recursing into
    arrays. DECIMAL is float-family: both duckdb->pandas and a Spark
    DecimalType land outside the int family the same way."""
    s = type_str.strip()
    if s.upper().startswith("DECIMAL"):
        return "float"
    low, up = s.lower(), s.upper()
    if table is _DUCK_FAMILY and up.endswith("[]"):
        inner = _family(s[:-2], table)
        return f"list<{inner}>" if inner else None
    if table is _SPARK_FAMILY and low.startswith("array<"):
        inner = _family(s[6:-1], table)
        return f"list<{inner}>" if inner else None
    return table.get(up if table is _DUCK_FAMILY else low)


def assert_types(spark_dtypes, con, sql: str, name: str = "") -> None:
    """Fail when an oracle's final select leaks a DuckDB type whose value
    family differs from the Spark column's — the class the driver's typed
    hash rejects while every stringifying comparison (including this
    module's own value compare) stays blind (r09: uncast SUM() ->
    HUGEINT -> pandas float64 vs Spark BIGINT). Uses ``DESCRIBE <sql>``
    — the DB-API description only reports generic codes ('NUMBER');
    DESCRIBE reports real types without executing the query."""
    desc = con.execute(f"DESCRIBE {sql}").fetchall()
    ddt = {row[0]: str(row[1]) for row in desc}
    for col, st in spark_dtypes:
        exp = _family(st, _SPARK_FAMILY)
        got_t = ddt.get(col)
        got = _family(got_t, _DUCK_FAMILY) if got_t is not None else None
        if exp is None or got is None:
            continue
        assert got == exp, (
            f"{name}: oracle type-family mismatch on '{col}': duck type "
            f"{got_t} is family '{got}' but spark dtype {st} is family "
            f"'{exp}' — cast the oracle's final select (the driver's typed "
            f"hash fails on this even when values stringify equal; the "
            f"canonical case is an uncast SUM() widening to HUGEINT)")


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def compare(spark_df, con, sql: str, name: str = "") -> None:
    assert_types(spark_df.dtypes, con, sql, name)
    spark_cols = sorted(spark_df.columns)
    spark_rows = [tuple(_norm(r[c]) for c in spark_cols)
                  for r in spark_df.collect()]

    res = con.execute(sql)
    duck_cols_raw = [d[0] for d in res.description]
    duck_rows_raw = res.fetchall()
    order = sorted(range(len(duck_cols_raw)), key=lambda i: duck_cols_raw[i])
    duck_cols = [duck_cols_raw[i] for i in order]
    duck_rows = [tuple(_norm(row[i]) for i in order) for row in duck_rows_raw]

    assert spark_cols == duck_cols, (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}")
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}")
    sr, dr = sorted(spark_rows, key=repr), sorted(duck_rows, key=repr)
    for i, (a, b) in enumerate(zip(sr, dr)):
        assert a == b, f"{name}: first differing row #{i}:\n spark={a}\n duck ={b}"
