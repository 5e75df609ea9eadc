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


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def compare(spark_df, con, sql: str, name: str = "") -> None:
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
