"""Local re-implementation of the driver's DuckDB-oracle comparison.

Runs a Spark query and its oracle SQL over the same parquet tables, then
compares row count, column names, and an order-insensitive value view
(columns sorted by name, rows sorted by their stringified tuple).
Floats are compared with a small tolerance after both sides round —
queries are expected to round any float aggregate themselves.
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_run(sf_dir: str, sql: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(_norm_cell(r[i]) for i in order))
    return sorted(cols), sorted(out, key=lambda t: repr(t))


def compare(spark_df, sf_dir: str, sql: str) -> list[str]:
    """Return a list of mismatch descriptions; empty list = match."""
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns
    d_cols, d_rows = duckdb_run(sf_dir, sql)

    problems = []
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"row count differs: spark={len(s_rows)} duckdb={len(d_rows)}")

    nc_s, ns = _normalize(s_cols, s_rows)
    nc_d, nd = _normalize(d_cols, d_rows)
    if ns != nd:
        diff_s = [r for r in ns if r not in set(nd)][:5]
        diff_d = [r for r in nd if r not in set(ns)][:5]
        problems.append(
            f"values differ; spark-only(first5)={diff_s} duckdb-only(first5)={diff_d}"
        )
    return problems
