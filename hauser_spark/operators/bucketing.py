"""Bucketed (co-located) joins: pre-shuffle tables once, join shuffle-free
forever after.

At 100 TB the dominant repeated cost is the fact⋈fact shuffle (e.g.
lineitem⋈orders on orderkey in half the TPC-H shapes). Bucketing both
tables by the join key at write time stores them pre-partitioned: a join
on the bucket key then reads matching buckets pair-wise — zero Exchange
in the plan, and the cost was paid once at ingest instead of per-query.

Spark specifics encoded here:
- ``bucketBy`` requires ``saveAsTable`` (bucket metadata lives in the
  catalog, not in parquet); a plain ``parquet(path)`` write silently drops
  bucketing.
- Both sides must have the SAME bucket count on the join key, or Spark
  shuffles the mismatched side.
- ``sortBy`` within buckets lets the sort-merge join skip its sort too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    n_buckets: int = 16,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed+sorted catalog table on ``key``."""
    w = (
        df.write.format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .mode("overwrite")
    )
    if path:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def cobucket_tables(
    spark: SparkSession,
    sf_dir: str,
    base_path: str,
    n_buckets: int = 16,
    suffix: str = "",
) -> tuple[str, str]:
    """Bucket lineitem and orders by orderkey into catalog tables; returns
    the (lineitem, orders) table names. The ingest-time cost that buys
    shuffle-free fact⋈fact joins."""
    from ..tables import load_table

    li_name = f"lineitem_bkt{suffix}"
    od_name = f"orders_bkt{suffix}"
    write_bucketed(
        load_table(spark, sf_dir, "lineitem"),
        li_name,
        "l_orderkey",
        n_buckets,
        path=f"{base_path}/{li_name}",
    )
    orders = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    write_bucketed(
        orders, od_name, "l_orderkey", n_buckets, path=f"{base_path}/{od_name}"
    )
    return li_name, od_name
