"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` / ``oracle_sql()`` — per-operator correctness gate; the driver
runs each Spark query against its DuckDB oracle at sf0.01 and compares
row-count + schema + order-insensitive value hash.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hauser_spark.operators import dedup as _dedup  # noqa: E402
from hauser_spark.operators import multimodal as _multimodal  # noqa: E402
from hauser_spark.operators import similarity as _similarity  # noqa: E402
from hauser_spark.operators import text as _text  # noqa: E402
from hauser_spark.plans import events as _events  # noqa: E402
from hauser_spark.plans import parity as _parity  # noqa: E402
from hauser_spark.plans import tpch  # noqa: E402

_MODULES = [_parity, _events, _text, _dedup, _similarity, _multimodal]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return tpch.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out = {
        "q1_pricing_summary": tpch.q1_pricing_summary,
        "q3_shipping_priority": tpch.q3_shipping_priority,
        "q5_region_revenue": tpch.q5_region_revenue,
        "q6_forecast_revenue": tpch.q6_forecast_revenue,
        "q10_returned_items": tpch.q10_returned_items,
        "top_parts_by_revenue": tpch.top_parts_by_revenue,
    }
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    out.update({
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
                   ROUND(AVG(l_quantity), 6) AS avg_qty,
                   ROUND(AVG(l_extendedprice), 6) AS avg_price,
                   ROUND(AVG(l_discount), 6) AS avg_disc,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '2024-12-01'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "q3_shipping_priority": """
            SELECT l_orderkey, o_orderdate, o_orderpriority,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '2024-06-30'
            GROUP BY l_orderkey, o_orderdate, o_orderpriority
            ORDER BY revenue DESC, l_orderkey ASC
            LIMIT 10
        """,
        "q5_region_revenue": """
            SELECT n_name,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
            GROUP BY n_name
            ORDER BY revenue DESC, n_name ASC
        """,
        "q6_forecast_revenue": """
            SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
                   COUNT(*) AS n_rows
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '2024-01-01'
              AND l_shipdate < TIMESTAMP '2025-01-01'
              AND l_discount BETWEEN 0.02 AND 0.06
              AND l_quantity < 24
        """,
        "q10_returned_items": """
            SELECT c_custkey, c_name, n_name, c_acctbal,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE l_returnflag = 'R'
            GROUP BY c_custkey, c_name, n_name, c_acctbal
            ORDER BY revenue DESC, c_custkey ASC
            LIMIT 20
        """,
        "top_parts_by_revenue": """
            WITH agg AS (
                SELECT p_brand, p_type,
                       ROUND(SUM(l_extendedprice), 2) AS brand_revenue,
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
    })
    return out
