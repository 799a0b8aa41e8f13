"""Synthetic-table loaders for the driver's TPC-H-ish star schema.

Tables (per TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings, one parquet each under
``/root/testdata/sf*/``.

Loading is always ``spark.read.parquet`` with no inferred schemas —
parquet carries the types, and keeping the scan declarative lets
Catalyst push filters/projections into the file scan.
"""

from __future__ import annotations

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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    if name == "events":
        # events.ts is TIMESTAMP(NANOS) parquet, which Spark's vectorized
        # reader rejects; read nanos as long and floor-convert to the
        # engine's microsecond timestamps (matching DuckDB's ns→µs floor).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        from pyspark.sql import functions as F

        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))")
            )
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


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
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
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


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql() can reference it."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
