"""Range (interval/band) join — the scale-path rewrite.

A naive range join `fact JOIN dim ON fact.v BETWEEN dim.lo AND dim.hi`
plans as BroadcastNestedLoopJoin in open-source Spark: every fact row is
tested against every interval, O(|fact|·|dim|) — workable for a handful
of bands, fatal for real interval tables. The standard rewrite (what
Databricks' range-join optimization and every streaming interval-join
does under the hood) is *bucketing*: quantize the domain into fixed-width
buckets, explode each interval to the buckets it overlaps, equi-join on
the bucket id (hash join, shuffle-free when the interval side broadcasts)
and apply the exact range predicate as a residual filter. Cost drops to
O(|fact| + matches), and the equi-join key restores all of Spark's join
machinery (broadcast, AQE, codegen).

The reference has no joins at all (SURVEY §2.6) — this belongs to the
beyond-reference analytics surface, with band-aggregation semantics any
warehouse user of the reference's export table would write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import money_sum, money_sum_sql
from ..tables import load_table, values_df

# value bands over events.value (domain ~[0, 500)); deliberately jagged
# and non-aligned to the bucket width to exercise the residual filter.
BANDS = [
    ("micro", 0.0, 10.0),
    ("small", 10.0, 40.0),
    ("mid", 40.0, 120.0),
    ("large", 120.0, 350.0),
    ("whale", 350.0, 1000.0),
]
BUCKET_WIDTH = 25.0


def bucketed_range_join(
    fact: DataFrame,
    value_col: str,
    intervals: DataFrame,
    lo: str = "lo",
    hi: str = "hi",
    width: float = BUCKET_WIDTH,
) -> DataFrame:
    """Equi-join rewrite of `fact.value_col ∈ [lo, hi)`.

    The interval side explodes to every bucket it overlaps (cheap: it is
    the small side), the fact side computes a single bucket id, and the
    exact half-open range predicate runs as a residual filter after the
    hash join. Intervals may overlap; a fact row matches each interval at
    most once (via its own bucket), so no dedup is needed.
    """
    exploded = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo) / width),
                # hi is exclusive: a bucket starting exactly at hi can't match
                F.floor((F.col(hi) - 1e-9) / width),
            )
        ),
    )
    bucketed = fact.withColumn("__bucket", F.floor(F.col(value_col) / width))
    return bucketed.join(F.broadcast(exploded), "__bucket").filter(
        (F.col(value_col) >= F.col(lo)) & (F.col(value_col) < F.col(hi))
    )


def value_band_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-band event stats via the bucketed range join."""
    ev = load_table(spark, sf_dir, "events")
    bands = values_df(spark, BANDS, "band string, lo double, hi double")
    joined = bucketed_range_join(ev, "value", bands)
    return (
        joined.groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n"),
            money_sum(F.col("value")).alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("band")
    )


QUERIES = {
    "range_join_value_bands": value_band_revenue,
}

_BANDS_SQL = " UNION ALL ".join(
    f"SELECT '{b}' AS band, {lo} AS lo, {hi} AS hi" for b, lo, hi in BANDS
)

ORACLES = {
    "range_join_value_bands": f"""
        WITH bands AS ({_BANDS_SQL})
        SELECT band, count(*) AS n,
               {money_sum_sql('value')} AS total_value,
               count(DISTINCT user_id) AS n_users
        FROM events JOIN bands
          ON events.value >= bands.lo AND events.value < bands.hi
        GROUP BY band ORDER BY band
    """,
}
