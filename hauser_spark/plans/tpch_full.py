"""Completing the 22 TPC-H query shapes (q2, q8, q9, q11, q12, q13, q15,
q20, q21) adapted to the driver's synthetic star schema — there is no
partsupp table and lineitem carries no shipmode/commitdate/receiptdate, so
the lineitem fact serves as the part-supplier relation and delay bands are
derived from shipdate-orderdate. Every query preserves its TPC-H *shape*
(correlated min, market share, profit rollup, threshold-over-total,
conditional bands, outer-join histogram, argmax, dominance semi-join,
blocking-supplier multi-exists).

Scale notes:
- All dims broadcast; the only shuffles are fact-side groupBys.
- Ratio/share math uses integer-cent sums (order-independent across
  partitions and engines) before the final rounded division.
- Argmax/threshold comparisons happen on exact integer cents, so equality
  joins on aggregates are deterministic — a double-sum argmax would be
  flaky under AQE's nondeterministic combine order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import money_sum, money_sum_sql as _ms
from ..tables import load_table

_CENTS = lambda c: F.round(c * 100).cast("long")  # noqa: E731


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: for each part, the supplier(s) offering the minimum unit
    cost (correlated MIN subquery → per-part min join-back). Unit cost is
    min(round(extendedprice/quantity, 2)) — min is order-independent, so
    the equality join on it is exact."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    unit_cost = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.round(F.col("l_extendedprice") / F.col("l_quantity"), 2)).alias("unit_cost"))
    )
    min_cost = unit_cost.groupBy(F.col("l_partkey").alias("mc_key")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    return (
        unit_cost.join(
            F.broadcast(min_cost),
            (F.col("l_partkey") == F.col("mc_key"))
            & (F.col("unit_cost") == F.col("min_cost")),
        )
        .join(F.broadcast(part.filter(F.col("p_size").between(1, 15))),
              F.col("l_partkey") == part.p_partkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name", "n_name", "p_partkey", "p_type",
            F.col("min_cost").alias("supply_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "s_name", "p_partkey")
        .limit(100)
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: each supplier nation's share of revenue to ASIA-region
    customers, by order year. Shares computed on integer cents with a
    window total per year."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    n_cust = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_rkey")
    )
    n_supp = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    vol = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n_cust), cust.c_nationkey == F.col("cn_key"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("cn_rkey") == region.r_regionkey,
        )
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n_supp), supp.s_nationkey == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"), F.col("supp_nation"))
        .agg(F.sum(_CENTS(rev)).alias("cents"))
    )
    w = Window.partitionBy("o_year")
    return (
        vol.withColumn("total_cents", F.sum("cents").over(w))
        .select(
            "o_year",
            "supp_nation",
            (F.col("cents") / 100.0).alias("volume"),
            # integer half-up of cents·100/total at 6dp (quotient +
            # remainder test — exact; float ROUND of the same double
            # can flip at a real .5 decimal boundary, and the two
            # engines' ROUND semantics differ exactly there).  Domain:
            # cents·1e8 inside int64 out to ~1e10-cent shares; the
            # production variant widens to decimal, as elsewhere.
            (
                (
                    F.expr("(cents * 100000000) DIV total_cents")
                    + F.expr(
                        "IF(2 * ((cents * 100000000) % total_cents)"
                        " >= total_cents, 1, 0)"
                    )
                ).cast("double")
                / 1e6
            ).alias("mkt_share_pct"),
        )
        .orderBy("o_year", "supp_nation")
    )


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit (revenue − cost) by supplier nation and year; cost
    stands in as retailprice×quantity absent ps_supplycost."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("l_shipdate").alias("o_year"))
        .agg(money_sum(profit).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: parts whose total traded value exceeds a fraction of the
    grand total — threshold is a broadcast scalar over exact cents."""
    li = load_table(spark, sf_dir, "lineitem")
    value = F.col("l_extendedprice") * F.col("l_quantity")
    per_part = li.groupBy("l_partkey").agg(F.sum(_CENTS(value)).alias("cents"))
    total = per_part.agg(F.sum("cents").alias("total_cents"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("cents") > 0.001 * F.col("total_cents"))
        .select("l_partkey", (F.col("cents") / 100.0).alias("part_value"))
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


def q12_delay_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: order-priority mix per shipping-delay band (shipmode
    stand-in: FAST ≤30d < SLOW ≤60d < LATE)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    band = (
        F.when(delay > 60, "LATE").when(delay > 30, "SLOW").otherwise("FAST")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(band.alias("delay_band"), high.alias("is_high"))
        .groupBy("delay_band")
        .agg(
            F.sum(F.when(F.col("is_high"), 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(F.col("is_high"), 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("delay_band")
    )


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: histogram of per-customer order counts via left outer join —
    customers with zero orders must appear in the 0 bucket."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    counts = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy(cust.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        counts.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: supplier(s) with maximum revenue in a quarter — argmax via an
    exact-cents scalar max, so the equality join cannot be flaky."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_supp = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_CENTS(rev)).alias("cents"))
    )
    mx = per_supp.agg(F.max("cents").alias("max_cents"))
    return (
        per_supp.crossJoin(F.broadcast(mx))
        .filter(F.col("cents") == F.col("max_cents"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select(
            "s_suppkey", "s_name", (F.col("cents") / 100.0).alias("total_revenue")
        )
        .orderBy("s_suppkey")
    )


def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: suppliers holding a dominant (>50%) share of some part's
    1996 shipped quantity — nested semi-join chain."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    li96 = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    qty = li96.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(_CENTS(F.col("l_quantity"))).alias("q_cents")
    )
    per_part = qty.groupBy(F.col("l_partkey").alias("pp_key")).agg(
        F.sum("q_cents").alias("part_cents")
    )
    dominant = (
        qty.join(F.broadcast(per_part), F.col("l_partkey") == F.col("pp_key"))
        .filter(F.col("q_cents") * 2 > F.col("part_cents"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(dominant, supp.s_suppkey == dominant.l_suppkey, "left_semi")
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


def q21_blocking_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: in finished multi-supplier orders, the unique supplier
    whose last shipment set the order's final ship date (EXISTS other
    supplier + NOT EXISTS other supplier equally late)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    g = (
        li.join(
            orders.filter(F.col("o_orderstatus") == "F"),
            li.l_orderkey == orders.o_orderkey,
            "left_semi",
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("smax"))
    )
    w = Window.partitionBy("l_orderkey")
    marked = (
        g.withColumn("omax", F.max("smax").over(w))
        .withColumn("nsupp", F.count(F.lit(1)).over(w))
        .withColumn(
            "achievers",
            F.sum(F.when(F.col("smax") == F.col("omax"), 1).otherwise(0)).over(w),
        )
    )
    return (
        marked.filter(
            (F.col("nsupp") >= 2)
            & (F.col("achievers") == 1)
            & (F.col("smax") == F.col("omax"))
        )
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


def churned_customers_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations: customers active in 1996 EXCEPT active in 1997
    (churned), INTERSECT (retained), and the union year count — the three
    set ops in one result. Spark set ops hash-dedupe on all columns; the
    shuffle is one hash-partition per side, same as a distinct."""
    orders = load_table(spark, sf_dir, "orders")
    # One pass instead of three driver-blocking count() jobs: per
    # customer, a year-membership flag pair, then the three set-op
    # cardinalities as conditional sums over the distinct-customer
    # frame (churned = in96 ∧ ¬in97, retained = both, either = any —
    # identical to EXCEPT/INTERSECT/UNION counts on distinct sets).
    # Lazy end to end: no collect in the query path.
    per_cust = (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01"))
            & (F.col("o_orderdate") < F.lit("1998-01-01"))
        )
        .select(
            "o_custkey",
            (F.col("o_orderdate") < F.lit("1997-01-01")).alias("in96"),
            (F.col("o_orderdate") >= F.lit("1997-01-01")).alias("in97"),
        )
        .groupBy("o_custkey")
        .agg(F.max("in96").alias("in96"), F.max("in97").alias("in97"))
    )
    return per_cust.agg(
        F.coalesce(
            F.sum((F.col("in96") & ~F.col("in97")).cast("long")),
            F.lit(0).cast("long"),
        ).alias("churned"),
        F.coalesce(
            F.sum((F.col("in96") & F.col("in97")).cast("long")),
            F.lit(0).cast("long"),
        ).alias("retained"),
        F.count(F.lit(1)).alias("either_year"),
    )


QUERIES = {
    "churned_customers_setops": churned_customers_setops,
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q11_important_stock": q11_important_stock,
    "q12_delay_bands": q12_delay_bands,
    "q13_customer_distribution": q13_customer_distribution,
    "q15_top_supplier": q15_top_supplier,
    "q20_dominant_suppliers": q20_dominant_suppliers,
    "q21_blocking_supplier": q21_blocking_supplier,
}

_REV_CENTS = "CAST(ROUND((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)"

ORACLES = {
    "churned_customers_setops": """
        WITH y96 AS (
            SELECT DISTINCT o_custkey FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
        ), y97 AS (
            SELECT DISTINCT o_custkey FROM orders
            WHERE o_orderdate >= TIMESTAMP '1997-01-01'
              AND o_orderdate < TIMESTAMP '1998-01-01'
        )
        SELECT (SELECT COUNT(*) FROM (SELECT * FROM y96 EXCEPT SELECT * FROM y97)) AS churned,
               (SELECT COUNT(*) FROM (SELECT * FROM y96 INTERSECT SELECT * FROM y97)) AS retained,
               (SELECT COUNT(*) FROM (SELECT * FROM y96 UNION SELECT * FROM y97)) AS either_year
    """,
    "q2_min_cost_supplier": """
        WITH uc AS (
            SELECT l_partkey, l_suppkey,
                   MIN(ROUND(l_extendedprice / l_quantity, 2)) AS unit_cost
            FROM lineitem GROUP BY 1, 2
        ), mc AS (
            SELECT l_partkey AS mc_key, MIN(unit_cost) AS min_cost
            FROM uc GROUP BY 1
        )
        SELECT ROUND(s_acctbal, 2) AS s_acctbal, s_name, n_name,
               p_partkey, p_type, min_cost AS supply_cost
        FROM uc
        JOIN mc ON l_partkey = mc_key AND unit_cost = min_cost
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_size BETWEEN 1 AND 15
        ORDER BY s_acctbal DESC, s_name, p_partkey
        LIMIT 100
    """,
    "q8_market_share": f"""
        WITH vol AS (
            SELECT EXTRACT(year FROM o_orderdate) AS o_year,
                   n2.n_name AS supp_nation,
                   SUM({_REV_CENTS}) AS cents
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN region ON n1.n_regionkey = r_regionkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n2 ON s_nationkey = n2.n_nationkey
            WHERE r_name = 'ASIA'
            GROUP BY 1, 2
        )
        SELECT o_year, supp_nation,
               cents / 100.0 AS volume,
               CAST((cents * 100000000)
                        // SUM(cents) OVER (PARTITION BY o_year)
                    + CASE WHEN 2 * ((cents * 100000000)
                               % SUM(cents) OVER (PARTITION BY o_year))
                               >= SUM(cents) OVER (PARTITION BY o_year)
                           THEN 1 ELSE 0 END AS DOUBLE) / 1000000.0
                   AS mkt_share_pct
        FROM vol ORDER BY o_year, supp_nation
    """,
    "q9_product_profit": f"""
        SELECT n_name AS nation, EXTRACT(year FROM l_shipdate) AS o_year,
               {_ms('l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity')}
                   AS sum_profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY 1, 2 ORDER BY nation, o_year DESC
    """,
    "q11_important_stock": """
        WITH pp AS (
            SELECT l_partkey,
                   SUM(CAST(ROUND((l_extendedprice * l_quantity) * 100) AS BIGINT))
                       AS cents
            FROM lineitem GROUP BY 1
        )
        SELECT l_partkey, cents / 100.0 AS part_value
        FROM pp
        WHERE cents > 0.001 * (SELECT SUM(cents) FROM pp)
        ORDER BY part_value DESC, l_partkey
    """,
    "q12_delay_bands": """
        SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 60 THEN 'LATE'
                    WHEN date_diff('day', o_orderdate, l_shipdate) > 30 THEN 'SLOW'
                    ELSE 'FAST' END AS delay_band,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1 ORDER BY delay_band
    """,
    "q13_customer_distribution": """
        WITH counts AS (
            SELECT c.c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer c LEFT JOIN orders ON c.c_custkey = o_custkey
            GROUP BY 1
        )
        SELECT c_count, COUNT(*) AS custdist
        FROM counts GROUP BY 1
        ORDER BY custdist DESC, c_count DESC
    """,
    "q15_top_supplier": f"""
        WITH ps AS (
            SELECT l_suppkey, SUM({_REV_CENTS}) AS cents
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY 1
        )
        SELECT s_suppkey, s_name, cents / 100.0 AS total_revenue
        FROM ps JOIN supplier ON l_suppkey = s_suppkey
        WHERE cents = (SELECT MAX(cents) FROM ps)
        ORDER BY s_suppkey
    """,
    "q20_dominant_suppliers": """
        WITH qty AS (
            SELECT l_partkey, l_suppkey,
                   SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS q_cents
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
            GROUP BY 1, 2
        ), pp AS (
            SELECT l_partkey AS pp_key, SUM(q_cents) AS part_cents
            FROM qty GROUP BY 1
        )
        SELECT s_name, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE s_suppkey IN (
            SELECT DISTINCT l_suppkey
            FROM qty JOIN pp ON l_partkey = pp_key
            WHERE q_cents * 2 > part_cents
        )
        ORDER BY s_name
    """,
    "q21_blocking_supplier": """
        WITH g AS (
            SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS smax
            FROM lineitem
            WHERE l_orderkey IN (
                SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
            )
            GROUP BY 1, 2
        ), marked AS (
            SELECT l_orderkey, l_suppkey, smax,
                   MAX(smax) OVER (PARTITION BY l_orderkey) AS omax,
                   COUNT(*) OVER (PARTITION BY l_orderkey) AS nsupp
            FROM g
        ), m2 AS (
            SELECT *,
                   SUM(CASE WHEN smax = omax THEN 1 ELSE 0 END)
                       OVER (PARTITION BY l_orderkey) AS achievers
            FROM marked
        )
        SELECT s_name, COUNT(*) AS numwait
        FROM m2 JOIN supplier ON l_suppkey = s_suppkey
        WHERE nsupp >= 2 AND achievers = 1 AND smax = omax
        GROUP BY 1
        ORDER BY numwait DESC, s_name
        LIMIT 20
    """,
}
