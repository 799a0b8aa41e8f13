"""Data-quality constraint audit — dbt-test-style checks as one plan.

A pipeline feeding a 100 TB lake needs its invariants *checked*, not
assumed: referential integrity, key uniqueness, null contracts,
accepted values, and business-rule ranges. Each check here compiles to
a scan + (anti-join | aggregate) producing a single violation count;
the audit is their union — one DataFrame, one pass per table branch,
results small enough to alert on.

Scale notes: the two referential checks anti-join against the parent
keys — broadcast here (parent keys fit), bloom-prefilter or shuffle
anti-join at full scale (`operators/bloomjoin.py` is the pre-filter
this would compose with). Uniqueness is a groupBy-HAVING on the key —
map-side partial aggregation carries (key, count) partials only.
Everything else is a pure scan predicate that pushes down to parquet.

The reference's only "quality" machinery is skip-malformed-records on
JSON decode (`internal/service.go:199-203`) and the append-only schema
compatibility check (`warehouse/schema.go:135-145`); this extends the
idea to declarative data contracts. Two checks intentionally FAIL on
the synthetic data (price cap, discount band) so the failure path is
exercised, not just the zeros.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table

PRICE_CAP = 400_000.0
DISCOUNT_MAX = 0.08
STATUS_OK = ("P", "O", "F")


def _check(name: str, table: str, n: DataFrame) -> DataFrame:
    """Wrap a 1-row count DataFrame (column `n`) as an audit row."""
    return n.select(
        F.lit(name).alias("check"),
        F.lit(table).alias("table_name"),
        F.col("n").alias("n_violations"),
        (F.col("n") == 0).alias("passed"),
    )


def constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run every declared constraint; one row per check."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")
    events = load_table(spark, sf_dir, "events")

    cnt = lambda df: df.agg(F.count(F.lit(1)).alias("n"))  # noqa: E731

    ri_orders = cnt(
        orders.join(
            F.broadcast(customer.select("c_custkey")),
            orders.o_custkey == customer.c_custkey,
            "left_anti",
        )
    )
    ri_lineitem = cnt(
        lineitem.join(
            F.broadcast(orders.select("o_orderkey")),
            lineitem.l_orderkey == orders.o_orderkey,
            "left_anti",
        )
    )
    uniq_cust = cnt(
        customer.groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
    )
    nn_props = cnt(events.filter(F.col("props").isNull()))
    acc_status = cnt(
        orders.filter(~F.col("o_orderstatus").isin(*STATUS_OK))
    )
    rng_price = cnt(orders.filter(F.col("o_totalprice") > PRICE_CAP))
    rng_disc = cnt(
        lineitem.filter(
            (F.col("l_discount") < 0.0)
            | (F.col("l_discount") > DISCOUNT_MAX)
        )
    )

    audit = (
        _check("ri_orders_custkey", "orders", ri_orders)
        .unionByName(_check("ri_lineitem_orderkey", "lineitem", ri_lineitem))
        .unionByName(_check("unique_customer_key", "customer", uniq_cust))
        .unionByName(_check("not_null_events_props", "events", nn_props))
        .unionByName(_check("accepted_values_orderstatus", "orders", acc_status))
        .unionByName(_check("range_orders_totalprice", "orders", rng_price))
        .unionByName(_check("range_lineitem_discount", "lineitem", rng_disc))
    )
    return audit.orderBy("check")


QUERIES = {
    "dq_constraint_audit": constraint_audit,
}

ORACLES = {
    "dq_constraint_audit": f"""
        WITH checks AS (
            SELECT 'ri_orders_custkey' AS "check", 'orders' AS table_name,
                   (SELECT count(*) FROM orders o
                    LEFT JOIN customer c ON o.o_custkey = c.c_custkey
                    WHERE c.c_custkey IS NULL) AS n_violations
            UNION ALL
            SELECT 'ri_lineitem_orderkey', 'lineitem',
                   (SELECT count(*) FROM lineitem l
                    LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
                    WHERE o.o_orderkey IS NULL)
            UNION ALL
            SELECT 'unique_customer_key', 'customer',
                   (SELECT count(*) FROM (
                        SELECT c_custkey FROM customer
                        GROUP BY 1 HAVING count(*) > 1))
            UNION ALL
            SELECT 'not_null_events_props', 'events',
                   (SELECT count(*) FROM events WHERE props IS NULL)
            UNION ALL
            SELECT 'accepted_values_orderstatus', 'orders',
                   (SELECT count(*) FROM orders
                    WHERE o_orderstatus NOT IN ('P', 'O', 'F'))
            UNION ALL
            SELECT 'range_orders_totalprice', 'orders',
                   (SELECT count(*) FROM orders
                    WHERE o_totalprice > {PRICE_CAP})
            UNION ALL
            SELECT 'range_lineitem_discount', 'lineitem',
                   (SELECT count(*) FROM lineitem
                    WHERE l_discount < 0.0 OR l_discount > {DISCOUNT_MAX})
        )
        SELECT "check", table_name, n_violations,
               n_violations = 0 AS passed
        FROM checks
        ORDER BY "check"
    """,
}


def rowcount_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily ingest-volume drift monitor: z-score of each day's event
    count against the corpus mean/std of daily counts — the first alarm
    a pipeline wires (a feed that half-fails shows up as a volume dip
    long before any value-level check fires; the value-level
    changepoint twin is ``events_cusum_changepoint``).

    Exactness: daily counts are integers, so the mean/std moments are
    exact integer sums (n_days, Σc, Σc²); the z expression is one fixed
    IEEE sequence evaluated identically in the oracle (same device as
    ``profile_correlation_matrix``).  Shape: one (day) aggregate with
    map-side combine, a 1-row moment aggregate broadcast back — nothing
    beyond the daily rollup ever shuffles."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    mom = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
    )
    z = (
        (F.col("c") - F.col("s") / F.col("n"))
        / F.sqrt(
            F.col("ss").cast("double") / F.col("n")
            - (F.col("s") / F.col("n")) * (F.col("s") / F.col("n"))
        )
    )
    return (
        daily.crossJoin(F.broadcast(mom))
        .select(
            "day",
            F.col("c").alias("n_events"),
            F.round(z, 6).alias("z_score"),
            (F.abs(z) >= 3.0).alias("is_anomaly"),
        )
        .orderBy("day")
    )


QUERIES["dq_rowcount_drift"] = rowcount_drift

ORACLES["dq_rowcount_drift"] = """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, count(*) AS c
        FROM events GROUP BY 1
    ),
    mom AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(c) AS BIGINT) AS s,
               CAST(sum(c * c) AS BIGINT) AS ss
        FROM daily
    )
    SELECT day,
           CAST(c AS BIGINT) AS n_events,
           ROUND((c - s * 1.0 / n)
                 / sqrt(CAST(ss AS DOUBLE) / n
                        - (s * 1.0 / n) * (s * 1.0 / n)), 6) AS z_score,
           abs((c - s * 1.0 / n)
               / sqrt(CAST(ss AS DOUBLE) / n
                      - (s * 1.0 / n) * (s * 1.0 / n))) >= 3.0 AS is_anomaly
    FROM daily, mom ORDER BY day
"""


# ------------------------------------------- value conformance audit

DQ_VALUE_MAX = 100000.0


def value_conformance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type value-column conformance audit: negatives, over-bound
    values, values off the 2-decimal cent grid, and empty props — the
    rule table a warehouse DQ gate evaluates on every load, reported as
    exact counts with a ppm pass rate.

    The cent-grid check (value·100 == round(value·100)) is a pure
    double comparison both engines evaluate identically.  Scale: one
    map-side-combinable per-type aggregate over the scan.
    """
    ev = load_table(spark, sf_dir, "events")
    m = ev.selectExpr(
        "event_type",
        "CAST(value < 0 AS LONG) AS neg",
        f"CAST(value > {DQ_VALUE_MAX} AS LONG) AS over_max",
        "CAST(value * 100 != round(value * 100) AS LONG) AS off_grid",
        "CAST(props IS NULL OR props = '' AS LONG) AS empty_props",
    )
    return (
        m.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("neg").alias("n_negative"),
            F.sum("over_max").alias("n_over_max"),
            F.sum("off_grid").alias("n_off_cent_grid"),
            F.sum("empty_props").alias("n_empty_props"),
        )
        .selectExpr(
            "event_type",
            "n",
            "n_negative",
            "n_over_max",
            "n_off_cent_grid",
            "n_empty_props",
            "(2*(n - n_negative - n_over_max - n_off_cent_grid)*1000000"
            " + n) DIV (2*n) AS pass_ppm",
        )
        .orderBy("event_type")
    )


QUERIES["dq_value_conformance"] = value_conformance

ORACLES["dq_value_conformance"] = f"""
    WITH m AS (
        SELECT event_type,
               CASE WHEN value < 0 THEN 1 ELSE 0 END AS neg,
               CASE WHEN value > {DQ_VALUE_MAX} THEN 1 ELSE 0 END
                   AS over_max,
               CASE WHEN value * 100 != round(value * 100)
                    THEN 1 ELSE 0 END AS off_grid,
               CASE WHEN props IS NULL OR props = ''
                    THEN 1 ELSE 0 END AS empty_props
        FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(neg) AS BIGINT) AS n_negative,
           CAST(sum(over_max) AS BIGINT) AS n_over_max,
           CAST(sum(off_grid) AS BIGINT) AS n_off_cent_grid,
           CAST(sum(empty_props) AS BIGINT) AS n_empty_props,
           CAST((2*(count(*) - sum(neg) - sum(over_max) - sum(off_grid))
                 *1000000 + count(*)) // (2*count(*)) AS BIGINT)
               AS pass_ppm
    FROM m GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------- freshness SLO

#: Staleness budget per channel, in hours.  At fixture cadence every
#: event type lands steadily, so breaches indicate a genuinely dark
#: channel — the same semantics a production freshness monitor has.
FRESHNESS_SLO_HOURS = 24


def freshness_slo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-channel data-freshness SLO table — the first panel on every
    pipeline health dashboard: for each event type, its last-seen
    timestamp, the lag behind the stream head (the dataset's global
    max ts — "now" for a batch fixture), and whether the staleness
    budget is breached.  A channel whose lag grows while others stay
    current is a broken producer, not low traffic — which is exactly
    why lag is measured against the stream head rather than the wall
    clock.

    Scale shape: one map-side-combinable max per type plus a 1-row
    global max broadcast — the scan is touched once.  Lag is integer
    floor-hours on epoch seconds, exact cross-engine.
    """
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(F.max("ts").alias("last_ts"))
    head = ev.agg(F.max("ts").alias("head_ts"))
    return (
        per.crossJoin(F.broadcast(head))
        .selectExpr(
            "event_type",
            "CAST(unix_timestamp(last_ts) AS BIGINT) AS last_epoch",
            "(unix_timestamp(head_ts) - unix_timestamp(last_ts))"
            " DIV 3600 AS lag_hours",
            f"CAST(IF((unix_timestamp(head_ts) - unix_timestamp(last_ts))"
            f" DIV 3600 > {FRESHNESS_SLO_HOURS}, 1, 0) AS BIGINT)"
            " AS slo_breach",
        )
        .orderBy("event_type")
    )


QUERIES["dq_freshness_slo"] = freshness_slo

ORACLES["dq_freshness_slo"] = f"""
    WITH per AS (
        SELECT event_type, max(ts) AS last_ts FROM events
        GROUP BY event_type
    ),
    head AS (SELECT max(ts) AS head_ts FROM events)
    SELECT event_type,
           CAST(floor(epoch(last_ts)) AS BIGINT) AS last_epoch,
           CAST((floor(epoch(head_ts))::BIGINT - floor(epoch(last_ts))::BIGINT)
                // 3600 AS BIGINT) AS lag_hours,
           CAST(CASE WHEN (floor(epoch(head_ts))::BIGINT
                           - floor(epoch(last_ts))::BIGINT) // 3600
                          > {FRESHNESS_SLO_HOURS}
                THEN 1 ELSE 0 END AS BIGINT) AS slo_breach
    FROM per, head ORDER BY event_type
"""
