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
    cols, rows, _types = duckdb_run_typed(sf_dir, sql)
    return cols, rows


def duckdb_run_typed(sf_dir: str, sql: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    rel = con.sql(sql)
    cols = list(rel.columns)
    types = [str(t) for t in rel.types]
    rows = rel.fetchall()
    con.close()
    return cols, rows, types


# --- type-family comparison --------------------------------------------------
#
# The driver's value hash is type-tagged: DuckDB HUGEINT (bare SUM of an
# integer) or DECIMAL (e.g. SUM(x * 1.0), numeric literals) hash differently
# from Spark's BIGINT / DOUBLE even when the values are numerically equal.
# Round 1 shipped 5 false-green oracles because this file compared Python
# values only.  We now map both sides onto canonical type families and fail
# on any mismatch — HUGEINT and DECIMAL are their own families on purpose, so
# a bare integer SUM in an oracle's final projection is a local test failure.

_DUCK_INT = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}


def _duck_family(t: str):
    t = t.strip()
    if t.endswith("[]"):
        return ("list", _duck_family(t[:-2]))
    if t.startswith("DECIMAL"):
        return "decimal"
    if t in ("HUGEINT", "UHUGEINT"):
        return "hugeint"
    if t in _DUCK_INT:
        return "int"
    if t in ("FLOAT", "DOUBLE"):
        return "float"
    if t == "VARCHAR":
        return "string"
    if t == "DATE":
        return "date"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t == "BOOLEAN":
        return "bool"
    if t.startswith("STRUCT") or t.startswith("MAP"):
        return "struct"
    return t  # unknown: compare verbatim


def _spark_family(dt: str):
    dt = dt.strip()
    if dt.startswith("array<") and dt.endswith(">"):
        return ("list", _spark_family(dt[6:-1]))
    if dt.startswith("decimal"):
        return "decimal"
    if dt in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    if dt in ("float", "double"):
        return "float"
    if dt == "string":
        return "string"
    if dt == "date":
        return "date"
    if dt.startswith("timestamp"):
        return "timestamp"
    if dt == "boolean":
        return "bool"
    if dt.startswith("struct") or dt.startswith("map"):
        return "struct"
    return dt


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
    s_types = dict(spark_df.dtypes)
    d_cols, d_rows, d_types = duckdb_run_typed(sf_dir, sql)

    problems = []
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        return problems
    for col, dt in zip(d_cols, d_types):
        sf, df_ = _spark_family(s_types[col]), _duck_family(dt)
        if sf != df_:
            problems.append(
                f"type family differs on {col!r}: spark={s_types[col]}({sf}) "
                f"duckdb={dt}({df_})"
            )
    if problems:
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
