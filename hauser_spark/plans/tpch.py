"""TPC-H-flavored analytical queries over the driver's synthetic star schema.

These are the "cookbook" analytics surface the reference points its users at
(README.md:104-132 of the reference shows count/filter/JSON-extract recipes
against the export table) — here made first-class, declared via the DataFrame
API so Catalyst picks the physical plan.

Scale notes (100 TB design intent):
- Dimension joins (region/nation/customer/supplier/part) are broadcast —
  dims are small by construction; ``F.broadcast`` pins the strategy so a
  1000-executor run never shuffles the fact table for them.
- Aggregations are expressed as groupBy/agg → Spark does partial (map-side)
  aggregation automatically; no ``collect()`` in any hot path.
- Every computed column is aliased; oracle SQL in ``__spark_entry__`` uses
  identical aliases so the driver's column-sorted value hash lines up.
- Money sums use ``money_sum`` (exact integer-cent summation): double
  addition is not associative, and a distributed sum's combine order is
  nondeterministic — per-term rounding + integer sums make every engine
  and every run agree to the last cent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import money_sum, stable_avg
from ..tables import load_table

_REV = None  # revenue expression built per-query to keep plan shapes clear


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: pricing summary report. The flagship scan+agg query.

    One pass over lineitem; partial aggregation map-side, 4-group output.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2024-12-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum(F.col("l_quantity")).alias("sum_qty"),
            money_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            money_sum(disc_price).alias("sum_disc_price"),
            money_sum(charge).alias("sum_charge"),
            stable_avg(F.col("l_quantity")).alias("avg_qty"),
            stable_avg(F.col("l_extendedprice")).alias("avg_price"),
            stable_avg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: revenue of undelivered orders for one segment.

    customer is a broadcast dim; orders⋈lineitem is the only shuffle join.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(cust.filter(F.col("c_mktsegment") == "BUILDING")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .filter(F.col("o_orderdate") < F.lit("1997-06-30"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation within a region.

    All four dims broadcast; the single shuffle is the final groupBy.
    """
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            nation.n_regionkey == region.r_regionkey,
        )
        .groupBy("n_name")
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure filter+agg — tests predicate pushdown to parquet."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & (F.col("l_discount").between(0.02, 0.06))
        & (F.col("l_quantity") < 24)
    ).agg(
        money_sum(F.col("l_extendedprice") * F.col("l_discount")).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns, per customer; top 20."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


def top_parts_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part-dimension rollup with a window-function rank (engine surface:
    window functions, which the reference's warehouse users get from SQL)."""
    from pyspark.sql import Window

    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    agg = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(
            money_sum(F.col("l_extendedprice")).alias("brand_revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
    w = Window.partitionBy("p_brand").orderBy(
        F.col("brand_revenue").desc(), F.col("p_type").asc()
    )
    return (
        agg.withColumn("rank_in_brand", F.row_number().over(w))
        .filter(F.col("rank_in_brand") <= 3)
        .orderBy("p_brand", "rank_in_brand")
    )


# One shared SQL text for the rank-function breadth query: the Spark side
# runs it VERBATIM through spark.sql over registered views — exercising
# the engine's SQL API path — and the oracle runs the identical text in
# DuckDB. ntile/percent_rank/cume_dist share one window (one shuffle +
# one sort); the tie-break on c_custkey pins every rank cross-engine.
_QUARTILES_SQL = """
    WITH ranked AS (
        SELECT c_mktsegment, c_acctbal,
               ntile(4) OVER w AS quartile,
               percent_rank() OVER w AS pr,
               cume_dist() OVER w AS cd
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment
                     ORDER BY c_acctbal, c_custkey)
    )
    SELECT c_mktsegment,
           CAST(quartile AS BIGINT) AS quartile,
           count(*) AS n_customers,
           ROUND(min(c_acctbal), 2) AS min_bal,
           ROUND(max(c_acctbal), 2) AS max_bal,
           ROUND(avg(pr), 6) AS avg_pct_rank,
           ROUND(max(cd), 6) AS max_cume_dist
    FROM ranked
    GROUP BY c_mktsegment, quartile
    ORDER BY c_mktsegment, quartile
"""


def window_quartiles_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-function breadth (ntile / percent_rank / cume_dist) via the
    SQL API: registered views + spark.sql on the same text the oracle
    runs. Catalyst folds the three rank functions into a single Window
    over one (c_mktsegment) exchange."""
    from ..tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_QUARTILES_SQL)


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_region_revenue": q5_region_revenue,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q10_returned_items": q10_returned_items,
    "top_parts_by_revenue": top_parts_by_revenue,
    "window_quartiles_customer": window_quartiles_customer,
}

from ..functions import money_sum_sql as _ms, stable_avg_sql as _sa  # noqa: E402

_DISC = "l_extendedprice * (1 - l_discount)"
_CHARGE = "l_extendedprice * (1 - l_discount) * (1 + l_tax)"

ORACLES = {
    "window_quartiles_customer": _QUARTILES_SQL,
    "q1_pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               {_ms('l_quantity')} AS sum_qty,
               {_ms('l_extendedprice')} AS sum_base_price,
               {_ms(_DISC)} AS sum_disc_price,
               {_ms(_CHARGE)} AS sum_charge,
               {_sa('l_quantity')} AS avg_qty,
               {_sa('l_extendedprice')} AS avg_price,
               {_sa('l_discount')} AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2024-12-01'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q3_shipping_priority": f"""
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               {_ms(_DISC)} AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1997-06-30'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
    """,
    "q5_region_revenue": f"""
        SELECT n_name, {_ms(_DISC)} AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name ASC
    """,
    "q6_forecast_revenue": f"""
        SELECT {_ms('l_extendedprice * l_discount')} AS revenue,
               COUNT(*) AS n_rows
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.02 AND 0.06
          AND l_quantity < 24
    """,
    "q10_returned_items": f"""
        SELECT c_custkey, c_name, n_name, c_acctbal,
               {_ms(_DISC)} AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name, c_acctbal
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
    """,
    "top_parts_by_revenue": f"""
        WITH agg AS (
            SELECT p_brand, p_type,
                   {_ms('l_extendedprice')} AS brand_revenue,
                   COUNT(*) AS n_items
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand, p_type
        ), ranked AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY p_brand
                ORDER BY brand_revenue DESC, p_type ASC
            ) AS rank_in_brand
            FROM agg
        )
        SELECT p_brand, p_type, brand_revenue, n_items, rank_in_brand
        FROM ranked WHERE rank_in_brand <= 3
        ORDER BY p_brand, rank_in_brand
    """,
}
