"""Bloom-filter runtime pre-filtering for semi-joins.

The quintessential big-join optimization: before shuffling the fact side
of `fact SEMI JOIN keys`, build a tiny Bloom bitmap of the key set on the
build side, broadcast it, and drop fact rows that can't possibly match —
the shuffle then carries only (matches + false positives) instead of the
whole fact table. Spark's own runtime bloom-filter rewrite
(spark.sql.optimizer.runtime.bloomFilter.enabled) does this behind the
optimizer; here it is explicit so the mechanism is visible and testable.

Design:
- bitmap = 8192 bits packed into 128 longs, built from a distinct scan of
  the (already filtered, small) build side and collected to the driver —
  collecting a *bitmap* is the point of a Bloom filter: constant-size
  state regardless of build cardinality. K=4 probe positions come from
  disjoint 13-bit slices of the shared md5-derived 60-bit hash.
- the probe test compiles to pure expressions: element_at on a 128-long
  literal array + shift/mask per position — no Python, stays inside
  whole-stage codegen, evaluated BEFORE the join's exchange.
- Bloom filters admit false positives but never false negatives, so the
  exact semi-join that follows returns the identical result with or
  without the pre-filter — which is exactly what the DuckDB oracle
  checks (plain semi-join, no bloom).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import money_sum, money_sum_sql
from ..tables import load_table

N_BITS = 8192  # 128 longs
N_WORDS = N_BITS // 64
K_PROBES = 4


def _positions(col: Column) -> list[Column]:
    """K probe positions from disjoint 13-bit slices of xxhash64.

    xxhash64, not md5: the bloom's bits never cross engines (the oracle
    runs the plain semi-join), so the hash only needs to be fast and
    well-mixed — xxhash64 is a native long-to-long expression, ~10x
    cheaper per row than md5's string round-trip."""
    h = F.xxhash64(col)
    return [
        F.pmod(F.shiftrightunsigned(h, 13 * j), F.lit(N_BITS)).cast("long")
        for j in range(K_PROBES)
    ]


def build_bloom(keys: DataFrame, key_col: str) -> list[int]:
    """Collect the key set's Bloom bitmap (128 ints) on the driver."""
    pos = keys.select(
        F.explode(F.array(*_positions(F.col(key_col)))).alias("p")
    ).distinct()
    words = (
        pos.groupBy((F.col("p") / 64).cast("long").alias("w"))
        # bit_or of 1<<(p%64): bitwise aggregate, map-side combinable
        .agg(
            F.expr(
                "bit_or(shiftleft(cast(1 as bigint), cast(p % 64 as int)))"
            ).alias("bits")
        )
        .collect()
    )
    bitmap = [0] * N_WORDS
    for r in words:
        bitmap[int(r["w"])] = int(r["bits"])
    return bitmap


def bloom_might_contain(col: Column, bitmap: list[int]) -> Column:
    """Pure-expression membership test against the literal bitmap."""
    # one ArrayType literal, not CreateArray(128 casts): the constant is
    # referenced K times and a literal keeps codegen size flat
    words = F.lit(bitmap).cast("array<bigint>")
    cond = None
    for p in _positions(col):
        word = F.element_at(words, (p / 64).cast("int") + 1)
        bit = F.getbit(word, p % 64) == 1
        cond = bit if cond is None else (cond & bit)
    return cond


def bloom_semi_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by return flag for lineitems of URGENT high-value orders:
    bloom pre-filter (drops most of lineitem before the exchange) then
    the exact semi-join. Result is identical to the plain semi-join —
    the oracle runs the plain one."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    keys = orders.filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_totalprice") > 150000.0)
    ).select("o_orderkey")
    bitmap = build_bloom(keys, "o_orderkey")
    pruned = li.filter(bloom_might_contain(F.col("l_orderkey"), bitmap))
    return (
        pruned.join(
            keys, pruned.l_orderkey == keys.o_orderkey, "left_semi"
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue"),
        )
        .orderBy("l_returnflag")
    )


QUERIES = {
    "bloom_semi_join_revenue": bloom_semi_join_revenue,
}

ORACLES = {
    # bloom admits no false negatives, so the bloom-prefiltered semi-join
    # must hash-match the plain semi-join
    "bloom_semi_join_revenue": f"""
        SELECT l_returnflag, count(*) AS n_items,
               {money_sum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
        FROM lineitem
        WHERE l_orderkey IN (
            SELECT o_orderkey FROM orders
            WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 150000.0
        )
        GROUP BY l_returnflag ORDER BY l_returnflag
    """,
}
