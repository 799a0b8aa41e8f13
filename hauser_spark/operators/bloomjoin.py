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


# ---------------------------------------------------- FPR audit

FPR_M_PER_KEY = 16  # bloom bits per build key (m = 16·n)
FPR_K = 4           # probe hashes


def bloom_fpr_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter false-positive-rate audit: build a size-matched
    filter (m = 16·n bits, k = 4) over the event ids of the window's
    first half, probe it with the second half's event ids (disjoint by
    construction -- every probe is a true negative), and report observed vs analytic
    FPR — the calibration run that sizes every bloom pre-filter in this
    module before it ships.

    Engine-portable construction: probe positions are 60-bit md5 hashes
    (j:key) mod m, and membership is expressed relationally — a probe
    key is "positive" iff ALL k of its positions appear in the distinct
    position set of the build keys.  That is bit-exact bloom semantics
    with the bitmap kept as a relation instead of a driver-side literal,
    which is also the 100 TB shape (the position set shuffles once;
    nothing is collected).  The analytic rate (1−(1−1/m)^{kn})^k is one
    deterministic double expression of exact integers.
    """
    ev = load_table(spark, sf_dir, "events")
    half = ev.agg(
        F.expr(
            "CAST(from_unixtime((unix_seconds(CAST(min(ts) AS TIMESTAMP))"
            " + unix_seconds(CAST(max(ts) AS TIMESTAMP))) DIV 2)"
            " AS DATE)"
        ).alias("mid")
    )
    # localCheckpoint barriers (VERDICT r6 task 4): `tagged` is read
    # four ways (build positions, probe positions, both counts) and
    # `n_build` is broadcast three times — without the barrier every
    # reference re-executes the scan + midpoint-agg subtree.
    tagged = (
        ev.crossJoin(F.broadcast(half))
        .select(
            "event_id", (F.to_date("ts") <= F.col("mid")).alias("early")
        )
        .localCheckpoint(eager=False)
    )
    build = tagged.filter(F.col("early")).select("event_id")
    probes = tagged.filter(~F.col("early")).select("event_id")
    # both halves' counts in ONE aggregate over the checkpointed frame
    # (n_probe was a fourth full pass over `tagged`)
    n_build = (
        tagged.groupBy()
        .agg(
            F.sum(F.col("early").cast("long")).alias("n"),
            F.sum((~F.col("early")).cast("long")).alias("np"),
        )
        .localCheckpoint(eager=False)
    )

    def positions(df):
        out = df.crossJoin(F.broadcast(n_build.select("n")))
        pos = []
        for j in range(FPR_K):
            pos.append(
                F.expr(
                    f"CAST(conv(substring(md5(concat_ws(':', '{j}',"
                    " CAST(event_id AS STRING))), 1, 15), 16, 10)"
                    f" AS BIGINT) % (n * {FPR_M_PER_KEY})"
                ).alias(f"p{j}")
            )
        return out.select("event_id", *pos)

    bits = (
        positions(build)
        .selectExpr(
            f"explode(array({', '.join(f'p{j}' for j in range(FPR_K))}))"
            " AS p"
        )
        .distinct()
    )
    probe_pos = positions(probes).selectExpr(
        "event_id",
        f"explode(array({', '.join(f'p{j}' for j in range(FPR_K))}))"
        " AS p",
    )
    hits = (
        probe_pos.join(bits, "p", "left_semi")
        .groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("nh"))
        .filter(F.col("nh") >= FPR_K)
    )
    n_fp = hits.groupBy().agg(F.count(F.lit(1)).alias("fp"))
    return (
        n_build.crossJoin(n_fp)
        .selectExpr(
            "CAST(n AS BIGINT) AS n_build",
            "CAST(np AS BIGINT) AS n_probe",
            "CAST(fp AS BIGINT) AS false_positives",
            "CAST((2*fp*1000000 + np) DIV (2*np) AS DOUBLE) / 1e6"
            " AS fpr_observed",
            f"round(pow(1.0 - pow(1.0 - 1.0/(n*{FPR_M_PER_KEY}),"
            f" {FPR_K}*n), {FPR_K}), 6) AS fpr_expected",
        )
    )


QUERIES["bloom_fpr_audit"] = bloom_fpr_audit


def _bloom_fpr_oracle() -> str:
    pos_list = ", ".join(
        f"('0x' || substr(md5('{j}' || ':' || CAST(event_id AS VARCHAR)),"
        f" 1, 15))::BIGINT % (n * {FPR_M_PER_KEY})"
        for j in range(FPR_K)
    )
    return f"""
        WITH half AS (
            SELECT CAST(to_timestamp((CAST(floor(epoch(min(ts)))
                        AS BIGINT) + CAST(floor(epoch(max(ts)))
                        AS BIGINT)) // 2) AS DATE) AS mid
            FROM events
        ),
        tagged AS (
            SELECT event_id,
                   CASE WHEN CAST(ts AS DATE) <= mid
                        THEN 1 ELSE 0 END AS early
            FROM events CROSS JOIN half
        ),
        nb AS (SELECT count(*) AS n FROM tagged WHERE early = 1),
        build_pos AS (
            SELECT DISTINCT unnest([{pos_list}]) AS p
            FROM tagged CROSS JOIN nb WHERE early = 1
        ),
        probe_pos AS (
            SELECT event_id, unnest([{pos_list}]) AS p
            FROM tagged CROSS JOIN nb WHERE early = 0
        ),
        hits AS (
            SELECT pp.event_id
            FROM probe_pos pp JOIN build_pos b ON pp.p = b.p
            GROUP BY pp.event_id HAVING count(*) >= {FPR_K}
        ),
        m AS (
            SELECT (SELECT n FROM nb) AS n,
                   (SELECT count(*) FROM tagged WHERE early = 0)
                       AS np,
                   (SELECT count(*) FROM hits) AS fp
        )
        SELECT CAST(n AS BIGINT) AS n_build,
               CAST(np AS BIGINT) AS n_probe,
               CAST(fp AS BIGINT) AS false_positives,
               CAST((2*fp*1000000 + np) // (2*np) AS DOUBLE) / 1e6
                   AS fpr_observed,
               round(pow(1.0 - pow(1.0 - 1.0/(n*{FPR_M_PER_KEY}),
                     {FPR_K}*n), {FPR_K}), 6) AS fpr_expected
        FROM m
    """


ORACLES["bloom_fpr_audit"] = _bloom_fpr_oracle()
