"""Wider TPC-H-shape coverage: semi/anti joins, correlated aggregates,
conditional aggregation, disjunctive predicates, HAVING subqueries —
the relational surface a warehouse user expects, adapted to the driver's
column set (lineitem has no shipmode/commitdate; shapes preserved).

Scale notes per query in docstrings; dims broadcast throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import money_sum, money_sum_sql as _ms
from ..rankops import global_rank, ntile_from_rank
from ..tables import load_table


def q4_priority_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: orders having ≥1 lineitem shipped >30d after order date —
    EXISTS becomes a left-semi join (no row multiplication, one shuffle)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .select("o_orderkey")
        .distinct()
    )
    return (
        orders.join(late, "o_orderkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: shipping volume between nation pairs by year. Two
    broadcast dim joins (supplier, customer→nation) around the
    orders⋈lineitem fact join."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("s_nkey"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("c_nkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q14_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: conditional-aggregation ratio (promo share of revenue)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                money_sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                * 100.0
                / money_sum(rev),
                6,
            ).alias("promo_revenue_pct")
        )
    )


def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct-supplier counts per (brand, size band), with an
    exclusion predicate. countDistinct shuffles once on the group key."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(F.col("p_brand") != "Brand#13")
        .withColumn("size_band", F.floor(F.col("p_size") / 10) * 10)
        .groupBy("p_brand", "size_band")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), F.col("p_brand"), F.col("size_band")
        )
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: correlated scalar aggregate — lineitems below half the
    part's average quantity. The correlation becomes a broadcast join of
    per-part averages back onto the fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(F.broadcast(avg_qty), li.l_partkey == F.col("ap_key"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.round(money_sum(F.col("l_extendedprice")) / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: orders whose total quantity exceeds a threshold —
    HAVING-subquery becomes aggregate→filter→join back."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("raw_qty"))
        .filter(F.col("raw_qty") > 150)  # raw filter, like the oracle HAVING
        .select("l_orderkey", F.round("raw_qty", 2).alias("total_qty"))
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_total"),
            "total_qty",
        )
        .orderBy(F.col("o_total").desc(), F.col("o_orderkey"))
        .limit(20)
    )


def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: OR-of-ANDs predicate pushed as one filter — Catalyst
    factors the common join condition out of the disjunction."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & (F.col("p_size").between(1, 15))
            & (F.col("l_quantity").between(1, 20))
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & (F.col("p_size").between(10, 30))
            & (F.col("l_quantity").between(10, 40))
        )
    )
    return joined.filter(cond).agg(
        money_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: anti-join + scalar subquery — customers above the mean
    balance who never ordered."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            money_sum(F.col("c_acctbal")).alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )




TOPN_OTHER = 10


def top_parts_with_other(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-cardinality report: top-N parts by revenue, everything
    else collapsed into one OTHER row — the shape every production
    dashboard query takes so its OUTPUT stays O(N) no matter how many
    keys the data grows (a top-10 over 10M parts still emits 11 rows).

    Two-phase: the per-key aggregate partial-combines map-side (the only
    fact-table shuffle); the rank over the aggregated key table rides
    the bucket decomposition (rankops.global_rank — every key needs a
    label, so the rank-≤-N filter rewrite doesn't apply and a plain
    window would single-partition the part-grain frame); the
    relabel-and-reaggregate touches |keys| rows. The OTHER row keeps
    the report's total reconciling to the unfiltered sum — dropping
    the tail (plain top-k) silently loses revenue."""
    li = load_table(spark, sf_dir, "lineitem")
    # integer cents end-to-end: the OTHER row sums ~|keys| values, and a
    # double sum's last bits depend on combine order — longs do not
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    per_key = li.groupBy("l_partkey").agg(
        F.sum(cents).alias("rc"), F.count(F.lit(1)).alias("n_items")
    )
    labeled = global_rank(
        per_key, "rc", "l_partkey", descending=True, rank_name="rk"
    ).select(
        F.when(
            F.col("rk") <= TOPN_OTHER, F.col("l_partkey").cast("string")
        )
        .otherwise(F.lit("OTHER"))
        .alias("part"),
        "rc",
        "n_items",
    )
    return (
        labeled.groupBy("part")
        .agg(
            (F.sum("rc") / 100.0).alias("revenue"),
            F.sum("n_items").alias("n_items"),
        )
        .orderBy(F.desc("revenue"), F.asc("part"))
    )


def weekly_revenue_wow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly order revenue with week-over-week percent change — one
    lag window over the pre-aggregated weekly table (|weeks| rows, not
    the fact table). Change is an exact integer-cents ratio rounded
    6dp; the first week's change is NULL by definition."""
    od = load_table(spark, sf_dir, "orders")
    weekly = (
        od.select(
            F.date_trunc("week", F.col("o_orderdate")).alias("week"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("c"),
        )
        .groupBy("week")
        .agg(F.sum("c").alias("cents"), F.count(F.lit(1)).alias("n_orders"))
    )
    w = Window.orderBy("week")
    prev = F.lag("cents").over(w)
    return weekly.select(
        F.col("week").cast("date").alias("week"),
        "n_orders",
        (F.col("cents") / 100.0).alias("revenue"),
        F.round((F.col("cents") - prev) / prev, 6).alias("wow_change"),
    ).orderBy("week")




def revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer revenue — the concentration
    metric behind "top 1% of customers drive X%" analyses, computed
    exactly: with per-customer cents x ranked ascending (rank i),
    G = (2·Σ i·x − (n+1)·Σx) / (n·Σx). Every term is an exact integer
    (rank × cents sums), so the statistic is order-free and
    cross-engine identical to the final division. The rank rides the
    bucket decomposition (rankops.global_rank) — no single-partition
    window over the customer-grain frame."""
    od = load_table(spark, sf_dir, "orders")
    per_cust = od.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("x")
    )
    r = global_rank(per_cust, "x", "o_custkey", rank_name="i")
    return r.agg(
        F.count(F.lit(1)).alias("n_customers"),
        (F.sum("x") / 100.0).alias("total_revenue"),
        F.round(
            (2.0 * F.sum(F.col("i") * F.col("x"))
             - (F.count(F.lit(1)) + 1) * F.sum("x"))
            / (F.count(F.lit(1)) * F.sum("x")).cast("double"),
            6,
        ).alias("gini"),
    )


TRIM_PCT = 5  # trim 5% from each tail


def trimmed_mean_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (trimmed) mean of order totals: drop the lowest and
    highest TRIM_PCT% by rank, average the middle — the outlier-proof
    center every monitoring dashboard should use instead of the plain
    mean. Trim bounds come from integer rank arithmetic (no float
    quantiles to disagree on); sums are exact cents. The rank rides
    the bucket decomposition (rankops.global_rank) — the order-grain
    frame never sees a single-partition window."""
    od = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    # checkpointed: the ranked frame feeds the count aggregate AND the
    # trimmed fold — two consumers that each re-ran the whole bucket-
    # decomposition rank (global_rank's barrier covers only its input)
    r = global_rank(
        od.select("o_orderkey", cents.alias("c")),
        "c",
        "o_orderkey",
        rank_name="rn",
    ).localCheckpoint(eager=False)
    tot = r.agg(F.count(F.lit(1)).alias("n"))
    k = (F.col("n") * TRIM_PCT / F.lit(100)).cast("long")
    j = r.crossJoin(F.broadcast(tot.select("n", k.alias("k"))))
    return j.agg(
        F.max("n").alias("n_orders"),
        F.round(F.sum("c") / 100.0 / F.max("n"), 2).alias("mean_price"),
        F.sum(
            F.when(
                (F.col("rn") > F.col("k"))
                & (F.col("rn") <= F.col("n") - F.col("k")),
                1,
            ).otherwise(0)
        ).alias("n_kept"),
        F.round(
            F.sum(
                F.when(
                    (F.col("rn") > F.col("k"))
                    & (F.col("rn") <= F.col("n") - F.col("k")),
                    F.col("c"),
                ).otherwise(F.lit(0).cast("long"))
            )
            / 100.0
            / F.sum(
                F.when(
                    (F.col("rn") > F.col("k"))
                    & (F.col("rn") <= F.col("n") - F.col("k")),
                    1,
                ).otherwise(0)
            ),
            2,
        ).alias("trimmed_mean_price"),
    )




def abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) classification of customers by revenue: class A =
    customers up to 80% of cumulative revenue, B = to 95%, C = the
    tail — the standard inventory/CRM segmentation. Thresholds are
    applied as exact integer comparisons (cum_cents·100 ≤ 80·total)
    on a descending-rank running sum, so class boundaries never hinge
    on float share rounding. The running sum rides the bucket
    decomposition (rankops.global_rank) — no single-partition window
    over the customer-grain frame; the summary is a 3-row
    reaggregation."""
    od = load_table(spark, sf_dir, "orders")
    # checkpointed: the per-customer rollup feeds the total aggregate
    # AND the rank — two orders scans + customer shuffles without it
    per_cust = (
        od.groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "x"
            )
        )
        .localCheckpoint(eager=False)
    )
    tot = per_cust.agg(F.sum("x").alias("total"))
    r = global_rank(
        per_cust, "x", "o_custkey", descending=True, running_sum_col="x"
    ).crossJoin(F.broadcast(tot))
    cls = (
        F.when(F.col("cum") * 100 <= F.col("total") * 80, "A")
        .when(F.col("cum") * 100 <= F.col("total") * 95, "B")
        .otherwise("C")
    )
    return (
        r.select(cls.alias("abc_class"), "x", "total")
        .groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (F.sum("x") / 100.0).alias("revenue"),
            F.round(F.sum("x") / F.max("total").cast("double"), 6).alias(
                "revenue_share"
            ),
        )
        .orderBy("abc_class")
    )


QUERIES = {
    "abc_classification": abc_classification,
    "revenue_gini": revenue_gini,
    "trimmed_mean_price": trimmed_mean_price,
    "top_parts_with_other": top_parts_with_other,
    "weekly_revenue_wow": weekly_revenue_wow,
    "q4_priority_late_ship": q4_priority_late_ship,
    "q7_nation_volume": q7_nation_volume,
    "q14_promo_revenue_ratio": q14_promo_revenue_ratio,
    "q16_supplier_part_count": q16_supplier_part_count,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q18_large_orders": q18_large_orders,
    "q19_disjunctive_predicates": q19_disjunctive_predicates,
    "q22_idle_customers": q22_idle_customers,
}

ORACLES = {
    "q4_priority_late_ship": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 30 DAY
        )
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "q7_nation_volume": f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               EXTRACT(year FROM l_shipdate) AS l_year,
               {_ms('l_extendedprice * (1 - l_discount)')} AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE n1.n_name != n2.n_name
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
    "q14_promo_revenue_ratio": f"""
        SELECT ROUND(
            {_ms("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")}
            * 100.0 / {_ms('l_extendedprice * (1 - l_discount)')}, 6
        ) AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
    """,
    "q16_supplier_part_count": """
        SELECT p_brand, CAST(FLOOR(p_size / 10) AS BIGINT) * 10 AS size_band,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand != 'Brand#13'
        GROUP BY 1, 2
        ORDER BY supplier_cnt DESC, p_brand, size_band
    """,
    "q17_small_quantity_revenue": f"""
        WITH a AS (
            SELECT l_partkey AS ap_key, AVG(l_quantity) AS avg_qty
            FROM lineitem GROUP BY 1
        )
        SELECT ROUND({_ms('l_extendedprice')} / 7.0, 2) AS avg_yearly,
               COUNT(*) AS n_small
        FROM lineitem JOIN a ON l_partkey = ap_key
        WHERE l_quantity < 0.5 * avg_qty
    """,
    "q18_large_orders": """
        WITH big AS (
            SELECT l_orderkey, ROUND(SUM(l_quantity), 2) AS total_qty
            FROM lineitem GROUP BY 1
            HAVING SUM(l_quantity) > 150
        )
        SELECT c_name, c_custkey, o_orderkey, o_orderdate,
               ROUND(o_totalprice, 2) AS o_total, total_qty
        FROM big
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_total DESC, o_orderkey
        LIMIT 20
    """,
    "q19_disjunctive_predicates": f"""
        SELECT {_ms('l_extendedprice * (1 - l_discount)')} AS revenue,
               COUNT(*) AS n_rows
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 20)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
               AND l_quantity BETWEEN 10 AND 40)
    """,
    "q22_idle_customers": f"""
        SELECT c_mktsegment, count(*) AS n_custs,
               {_ms('c_acctbal')} AS total_bal
        FROM customer
        WHERE NOT EXISTS (
            SELECT 1 FROM orders WHERE o_custkey = c_custkey
        )
        AND c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                         WHERE c_acctbal > 0)
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
}

ORACLES["top_parts_with_other"] = f"""
    WITH per_key AS (
        SELECT l_partkey,
               sum(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                        AS BIGINT)) AS rc,
               count(*) AS n_items
        FROM lineitem GROUP BY l_partkey
    ),
    labeled AS (
        SELECT CASE WHEN ROW_NUMBER() OVER (ORDER BY rc DESC,
                                            l_partkey ASC) <= {TOPN_OTHER}
                    THEN CAST(l_partkey AS VARCHAR) ELSE 'OTHER' END
                   AS part,
               rc, n_items
        FROM per_key
    )
    SELECT part, sum(rc) / 100.0 AS revenue,
           CAST(sum(n_items) AS BIGINT) AS n_items
    FROM labeled GROUP BY part
    ORDER BY revenue DESC, part ASC
"""

ORACLES["weekly_revenue_wow"] = """
    WITH weekly AS (
        SELECT date_trunc('week', o_orderdate) AS week,
               sum(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents,
               count(*) AS n_orders
        FROM orders GROUP BY 1
    )
    SELECT CAST(week AS DATE) AS week, n_orders,
           cents / 100.0 AS revenue,
           ROUND((cents - LAG(cents) OVER (ORDER BY week))
                 * 1.0 / LAG(cents) OVER (ORDER BY week), 6) AS wow_change
    FROM weekly
    ORDER BY week
"""

ORACLES["revenue_gini"] = """
    WITH per_cust AS (
        SELECT o_custkey,
               sum(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS x
        FROM orders GROUP BY o_custkey
    ),
    r AS (
        SELECT x,
               ROW_NUMBER() OVER (ORDER BY x, o_custkey) AS i
        FROM per_cust
    )
    SELECT count(*) AS n_customers,
           sum(x) / 100.0 AS total_revenue,
           ROUND((2.0 * sum(i * x) - (count(*) + 1) * sum(x))
                 * 1.0 / (count(*) * sum(x)), 6) AS gini
    FROM r
"""

ORACLES["trimmed_mean_price"] = f"""
    WITH r AS (
        SELECT o_orderkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c,
               ROW_NUMBER() OVER (
                   ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT),
                            o_orderkey) AS rn
        FROM orders
    ),
    tot AS (
        SELECT count(*) AS n,
               CAST(count(*) * {TRIM_PCT} / 100 AS BIGINT) AS k
        FROM r
    )
    SELECT max(n) AS n_orders,
           ROUND(sum(c) / 100.0 / max(n), 2) AS mean_price,
           CAST(sum(CASE WHEN rn > k AND rn <= n - k THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           ROUND(sum(CASE WHEN rn > k AND rn <= n - k THEN c ELSE 0 END)
                 / 100.0
                 / sum(CASE WHEN rn > k AND rn <= n - k THEN 1 ELSE 0 END),
                 2) AS trimmed_mean_price
    FROM r CROSS JOIN tot
"""

ORACLES["abc_classification"] = """
    WITH per_cust AS (
        SELECT o_custkey,
               sum(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS x
        FROM orders GROUP BY o_custkey
    ),
    r AS (
        SELECT x,
               sum(x) OVER (ORDER BY x DESC, o_custkey ASC
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum,
               (SELECT sum(x) FROM per_cust) AS total
        FROM per_cust
    ),
    labeled AS (
        SELECT CASE WHEN cum * 100 <= total * 80 THEN 'A'
                    WHEN cum * 100 <= total * 95 THEN 'B'
                    ELSE 'C' END AS abc_class,
               x, total
        FROM r
    )
    SELECT abc_class, count(*) AS n_customers,
           sum(x) / 100.0 AS revenue,
           ROUND(sum(x) * 1.0 / max(total), 6) AS revenue_share
    FROM labeled
    GROUP BY abc_class
    ORDER BY abc_class
"""


# ------------------------------------------------------- 2-D skyline

def part_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier (skyline) of parts under (minimize retail price,
    maximize size): every part for which no other part is at least as
    cheap AND at least as large with one strict improvement — the
    classic multi-criteria shortlist query.

    2-D skylines avoid the quadratic dominance join entirely: group to
    per-price maxima, prefix-scan the strictly-cheaper running maximum
    (one window over DISTINCT prices), and a part survives iff its size
    beats that running max and equals its price group's max.  At scale
    the prefix-scan composes: range-partition by price, per-partition
    skyline, then merge (skylines are closed under union+re-skyline) —
    the window here is over distinct prices, already ≪ the table.
    """
    part = load_table(spark, sf_dir, "part")
    per_price = part.groupBy("p_retailprice").agg(
        F.max("p_size").alias("pmax")
    )
    w = Window.orderBy("p_retailprice").rowsBetween(
        Window.unboundedPreceding, -1
    )
    bars = per_price.select(
        "p_retailprice",
        "pmax",
        F.max("pmax").over(w).alias("mprev"),
    )
    return (
        part.join(F.broadcast(bars), "p_retailprice")
        .filter(
            (F.col("p_size") == F.col("pmax"))
            & (
                F.col("mprev").isNull()
                | (F.col("p_size") > F.col("mprev"))
            )
        )
        .select("p_partkey", "p_name", "p_retailprice", "p_size")
        .orderBy("p_retailprice", "p_partkey")
    )


QUERIES["part_skyline"] = part_skyline

ORACLES["part_skyline"] = """
    WITH per_price AS (
        SELECT p_retailprice, max(p_size) AS pmax
        FROM part GROUP BY p_retailprice
    ),
    bars AS (
        SELECT p_retailprice, pmax,
               max(pmax) OVER (ORDER BY p_retailprice
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) AS mprev
        FROM per_price
    )
    SELECT p.p_partkey, p.p_name, p.p_retailprice, p.p_size
    FROM part p JOIN bars b USING (p_retailprice)
    WHERE p.p_size = b.pmax
      AND (b.mprev IS NULL OR p.p_size > b.mprev)
    ORDER BY p.p_retailprice, p.p_partkey
"""


# ------------------------------------------------------ RFM segments

RFM_Q = 5


def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation grid: customers scored into recency and
    frequency quintiles (ntile over total orders, deterministic
    tie-break on custkey), rolled up to the R×F grid with each cell's
    size and exact mean spend — the classic CRM/activation readout
    (high-R high-F = loyal; low-R high-F = churn risk to win back).

    Exactness: recency rides integer day-diffs against the corpus max
    order date (no wall clock — retry-safe); monetary means are exact
    half-up division of cent sums; ntile's fill semantics (equal
    buckets, remainder to the first) are identical cross-engine given
    the total tie order.  Scale: one orders scan reduces map-side to
    customer grain; each quintile rides the bucket decomposition —
    rankops.global_rank for the total-order rank, rankops.
    ntile_from_rank for ntile's exact fill rule as a pure (rank, n)
    function — so the customer frame never sees a single-partition
    window; the grid reduce carries 25 cells.
    """
    od = load_table(spark, sf_dir, "orders")
    asof = od.agg(F.max(F.to_date("o_orderdate")).alias("asof"))
    cust = (
        od.groupBy("o_custkey")
        .agg(
            F.max(F.to_date("o_orderdate")).alias("last_order"),
            F.count(F.lit(1)).alias("freq"),
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("long")
            ).alias("cents"),
        )
        .crossJoin(F.broadcast(asof))
        .select(
            "o_custkey",
            F.datediff("asof", "last_order").cast("long").alias("rec"),
            "freq",
            "cents",
        )
        # cached: the customer rollup feeds BOTH the nc count and the
        # rank chain (global_rank barriers its own input, but nc read
        # the raw lineage and re-ran the orders scan + rollup)
        .cache()
    )
    nc = cust.agg(F.count(F.lit(1)).alias("__nc"))
    ranked = global_rank(
        global_rank(cust, "rec", "o_custkey", rank_name="__rr"),
        "freq",
        "o_custkey",
        descending=True,
        rank_name="__rf",
    ).crossJoin(F.broadcast(nc))
    scored = ranked.select(
        "rec", "freq", "cents",
        ntile_from_rank("__rr", "__nc", RFM_Q).alias("r_q"),
        ntile_from_rank("__rf", "__nc", RFM_Q).alias("f_q"),
    )
    return (
        scored.groupBy("r_q", "f_q")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("cents").alias("s"),
            F.sum("rec").alias("sr"),
        )
        .select(
            "r_q",
            "f_q",
            "n_customers",
            F.expr(
                "CAST((2 * s + n_customers)"
                " DIV (2 * n_customers) AS DOUBLE) / 1e2"
            ).alias("mean_spend"),
            F.expr(
                "CAST((2 * sr * 100 + n_customers)"
                " DIV (2 * n_customers) AS DOUBLE) / 1e2"
            ).alias("mean_recency_days"),
        )
        .orderBy("r_q", "f_q")
    )


ORACLES["customer_rfm_segments"] = f"""
    WITH cust AS (
        SELECT o_custkey,
               max(CAST(o_orderdate AS DATE)) AS last_order,
               count(*) AS freq,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        FROM orders GROUP BY 1
    ),
    asof_d AS (SELECT max(CAST(o_orderdate AS DATE)) AS d0 FROM orders),
    r AS (
        SELECT c.o_custkey,
               datediff('day', c.last_order, a.d0) AS rec,
               c.freq, c.cents
        FROM cust c CROSS JOIN asof_d a
    ),
    scored AS (
        SELECT rec, freq, cents,
               ntile({RFM_Q}) OVER (ORDER BY rec ASC, o_custkey ASC)
                   AS r_q,
               ntile({RFM_Q}) OVER (ORDER BY freq DESC, o_custkey ASC)
                   AS f_q
        FROM r
    )
    SELECT CAST(r_q AS BIGINT) AS r_q,
           CAST(f_q AS BIGINT) AS f_q,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST((2 * sum(cents) + count(*))
                // (2 * count(*)) AS DOUBLE) / 1e2
               AS mean_spend,
           CAST((2 * sum(rec) * 100 + count(*))
                // (2 * count(*)) AS DOUBLE) / 1e2
               AS mean_recency_days
    FROM scored
    GROUP BY 1, 2
    ORDER BY 1, 2
"""

QUERIES["customer_rfm_segments"] = customer_rfm_segments
