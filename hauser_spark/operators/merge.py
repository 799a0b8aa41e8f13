"""MERGE INTO (upsert) — CDC-batch application without shuffling the fact.

The reference's sinks only append or truncate-reload a partition
(warehouse/bigquery.go:130-161, warehouse/redshift.go:241-246); it has
no row-level upsert. A warehouse engine needs one: apply a batch of
updates/inserts keyed on the primary key, keeping untouched rows.

Scale design — the whole point of this module: the naive MERGE is a
full-outer join, which shuffles the *entire* target on the key. But a
CDC batch is small relative to the target (here ~2% — at 100 TB, a few
GB against the corpus), so the merge is re-expressed as
broadcast-only joins:

- ``kept``     = target ⟕anti broadcast(update keys)   — 'keep'
- ``matched``  = target ⟕semi broadcast(update keys), keys only —
                 re-broadcast to tag each update row as 'update'
                 (key existed) vs 'insert' (new key)
- result       = kept ∪ tagged updates

No stage shuffles the target; the plan is scan → broadcast-anti →
union, and the only exchange is the final summary groupBy. The
full-outer formulation (what the DuckDB oracle runs) is semantically
identical — matched rows take the update's values, unmatched target
rows survive, unmatched update rows insert.

Update arithmetic sticks to raw IEEE ops (`+`), which are bit-identical
across engines; aggregate money goes through money_sum (per-term cents,
order-free integer sum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import money_sum, money_sum_sql as _ms
from ..tables import load_table

UPDATE_MOD = 97  # orders with o_orderkey % 97 == 0 get a status/price update
INSERT_MOD = 997  # source rows minting brand-new keys
KEY_OFFSET = 100_000_000  # new-key namespace, disjoint from any test SF
PRICE_BUMP = 1000.0
INSERT_PRICE = 1000.0


def _update_batch(orders: DataFrame) -> DataFrame:
    """Deterministic CDC batch derived from the target itself:
    ~1% updates (status→'D', price+1000) and ~0.1% inserts (new keys)."""
    upd = orders.filter(F.col("o_orderkey") % UPDATE_MOD == 0).select(
        F.col("o_orderkey").alias("k"),
        F.lit("D").alias("status"),
        (F.col("o_totalprice") + F.lit(PRICE_BUMP)).alias("price"),
    )
    ins = orders.filter(F.col("o_orderkey") % INSERT_MOD == 0).select(
        (F.col("o_orderkey") + F.lit(KEY_OFFSET)).alias("k"),
        F.lit("N").alias("status"),
        F.lit(INSERT_PRICE).alias("price"),
    )
    return upd.union(ins)


def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the CDC batch to orders; summarize the merged table per
    (status, action) with row counts and money-exact totals."""
    orders = load_table(spark, sf_dir, "orders")
    updates = _update_batch(orders)
    upd_keys = updates.select("k")

    kept = orders.join(
        F.broadcast(upd_keys), orders["o_orderkey"] == upd_keys["k"], "left_anti"
    ).select(
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
        F.lit("keep").alias("action"),
    )
    # keys of updates that hit an existing row: scan the target once with
    # a broadcast semi-join; output is ⊆ the (small) update batch, so it
    # re-broadcasts for the tag join.
    matched = (
        orders.join(
            F.broadcast(upd_keys),
            orders["o_orderkey"] == upd_keys["k"],
            "left_semi",
        )
        .select(F.col("o_orderkey").alias("mk"))
        .withColumn("is_match", F.lit(True))
    )
    tagged = (
        updates.join(
            F.broadcast(matched), updates["k"] == matched["mk"], "left"
        )
        .select(
            "status",
            "price",
            F.when(F.col("is_match"), F.lit("update"))
            .otherwise(F.lit("insert"))
            .alias("action"),
        )
    )
    return (
        kept.unionByName(tagged)
        .groupBy("status", "action")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            money_sum(F.col("price")).alias("total_price"),
        )
        .orderBy("status", "action")
    )


QUERIES = {
    "merge_upsert_orders": merge_upsert_orders,
}

# oracle: the textbook full-outer-join MERGE — semantically identical to
# the broadcast formulation above, and the natural SQL spelling.
ORACLES = {
    "merge_upsert_orders": f"""
        WITH updates AS (
            SELECT o_orderkey AS k, 'D' AS status,
                   o_totalprice + {PRICE_BUMP} AS price
            FROM orders WHERE o_orderkey % {UPDATE_MOD} = 0
            UNION ALL
            SELECT o_orderkey + {KEY_OFFSET}, 'N', {INSERT_PRICE}
            FROM orders WHERE o_orderkey % {INSERT_MOD} = 0
        ),
        merged AS (
            SELECT coalesce(u.status, t.o_orderstatus) AS status,
                   coalesce(u.price, t.o_totalprice) AS price,
                   CASE WHEN t.o_orderkey IS NULL THEN 'insert'
                        WHEN u.k IS NOT NULL THEN 'update'
                        ELSE 'keep' END AS action
            FROM orders t FULL OUTER JOIN updates u ON t.o_orderkey = u.k
        )
        SELECT status, action, count(*) AS n_rows,
               {_ms("price")} AS total_price
        FROM merged GROUP BY status, action ORDER BY status, action
    """,
}


# ------------------------------------------------- CDC log compaction

CDC_UPD1_MOD, CDC_UPD1_REM = 7, 3     # epoch-1 updates
CDC_UPD2_MOD, CDC_UPD2_REM = 11, 2    # epoch-2 updates
CDC_DEL_MOD, CDC_DEL_REM = 13, 5      # epoch-3 deletes
CDC_BUMP1, CDC_BUMP2 = 500.0, 250.0


def _cdc_log(orders: DataFrame) -> DataFrame:
    """Deterministic four-epoch CDC log derived from orders: every key
    inserts at epoch 0; two deterministic update waves; a delete wave.

    One scan, not four: the union-of-filters spelling re-read orders
    once per epoch (4 scans, 112 tasks at bench SF); the same multiset
    of log records falls out of a single pass that emits each row's
    epochs via inline over a null-filtered literal array (guide §2.3,
    fan instead of re-scan).  Row values are built by the identical
    expressions, so the downstream max_by compaction sees identical
    records."""
    base = orders.select(F.col("o_orderkey").alias("k"), "o_totalprice")
    return base.selectExpr(
        "k",
        "inline(filter(array("
        "  struct(0 AS epoch, 'I' AS op,"
        "         o_totalprice AS price),"
        f" IF(k % {CDC_UPD1_MOD} = {CDC_UPD1_REM},"
        f"    struct(1 AS epoch, 'U' AS op,"
        f"           o_totalprice + {CDC_BUMP1}D AS price), NULL),"
        f" IF(k % {CDC_UPD2_MOD} = {CDC_UPD2_REM},"
        f"    struct(2 AS epoch, 'U' AS op,"
        f"           o_totalprice + {CDC_BUMP2}D AS price), NULL),"
        f" IF(k % {CDC_DEL_MOD} = {CDC_DEL_REM},"
        f"    struct(3 AS epoch, 'D' AS op,"
        f"           CAST(0.0 AS DOUBLE) AS price), NULL)"
        "), x -> x IS NOT NULL))",
    )


def cdc_log_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-wins compaction of a CDC log — the Kafka-compacted-topic /
    Delta-rewrite primitive: reduce (key, epoch, op, value) history to
    each key's final state, then summarize.

    Scale design — the whole point: compaction is ONE groupBy with
    map-side-combinable ``max_by`` partials (each partition carries a
    single running winner per key), NOT a window row_number, which
    would sort every log partition end-to-end.  For a 100 TB log the
    groupBy shuffles one record per (partition, key) — the window
    formulation shuffles the log.  The summary is money-exact
    (``money_sum`` integer cents).
    """
    orders = load_table(spark, sf_dir, "orders")
    log = _cdc_log(orders)
    final = log.groupBy("k").agg(
        F.expr("max_by(op, epoch)").alias("final_op"),
        F.expr("max_by(price, epoch)").alias("final_price"),
        F.count(F.lit(1)).alias("n_versions"),
    )
    return (
        final.groupBy("final_op")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            money_sum(F.col("final_price")).alias("total_price"),
            F.sum("n_versions").cast("long").alias("n_log_records"),
        )
        .orderBy("final_op")
    )


QUERIES["cdc_log_compaction"] = cdc_log_compaction

ORACLES["cdc_log_compaction"] = f"""
    WITH log AS (
        SELECT o_orderkey AS k, 0 AS epoch, 'I' AS op,
               o_totalprice AS price FROM orders
        UNION ALL
        SELECT o_orderkey, 1, 'U', o_totalprice + {CDC_BUMP1}
        FROM orders WHERE o_orderkey % {CDC_UPD1_MOD} = {CDC_UPD1_REM}
        UNION ALL
        SELECT o_orderkey, 2, 'U', o_totalprice + {CDC_BUMP2}
        FROM orders WHERE o_orderkey % {CDC_UPD2_MOD} = {CDC_UPD2_REM}
        UNION ALL
        SELECT o_orderkey, 3, 'D', 0.0
        FROM orders WHERE o_orderkey % {CDC_DEL_MOD} = {CDC_DEL_REM}
    ),
    final AS (
        SELECT k, max_by(op, epoch) AS final_op,
               max_by(price, epoch) AS final_price,
               count(*) AS n_versions
        FROM log GROUP BY k
    )
    SELECT final_op, CAST(count(*) AS BIGINT) AS n_keys,
           {_ms("final_price")} AS total_price,
           CAST(sum(n_versions) AS BIGINT) AS n_log_records
    FROM final GROUP BY final_op ORDER BY final_op
"""
