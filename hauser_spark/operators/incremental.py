"""Incremental aggregate maintenance — merge partial aggregates instead
of recomputing from scratch.

The reference's whole design is incremental: only data past the sync
watermark is ever re-read (SURVEY §4 "incremental-only recomputation";
`warehouse/redshift.go:330-354`). This operator carries that idea into
the analytics layer: a materialized rollup is kept fresh by scanning
ONLY the delta past the watermark and merging its partial aggregates
into the existing state — the algebraic-aggregate property (count/sum/
min/max are mergeable; avg derives from sum+count) that every
incremental view-maintenance engine and Spark's own partial-aggregation
(`HashAggregate(partial) → exchange → HashAggregate(final)`) is built
on.

At 100 TB the difference is the whole game: a daily refresh scans one
day (~read TB/365), not the full history; the state side is the
already-aggregated rollup (|days| × |types| rows — trivially small), so
the merge shuffles only group keys, never facts. The watermark is
deliberately mid-day so one day's group is genuinely split across
state and delta — the merge is exercised, not just unioned.

The oracle is the from-scratch GROUP BY over the full table: the gate
proves merged-incremental ≡ full recompute, which is exactly the
invariant an incremental pipeline has to hold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_events_window

# mid-day watermark: 2024-01-20T12:00 splits day 20 across state/delta
WATERMARK = "2024-01-20 12:00:00"
_LO = "2024-01-01 00:00:00"
_HI = "2024-02-01 00:00:00"


def _partial_rollup(df: DataFrame) -> DataFrame:
    """Mergeable partial aggregates per (day, event_type)."""
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        df.select(
            F.to_date("ts").alias("day"),
            "event_type",
            cents.alias("c"),
        )
        .groupBy("day", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("c").alias("cents"),
            F.min("c").alias("min_c"),
            F.max("c").alias("max_c"),
        )
    )


def merge_rollups(state: DataFrame, delta: DataFrame) -> DataFrame:
    """Merge two partial rollups: the algebraic-aggregate combine step."""
    return (
        state.unionByName(delta)
        .groupBy("day", "event_type")
        .agg(
            F.sum("n").alias("n"),
            F.sum("cents").alias("cents"),
            F.min("min_c").alias("min_c"),
            F.max("max_c").alias("max_c"),
        )
    )


def incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily/type rollup maintained as state ⊕ delta; ≡ full recompute.

    Both sides read through ``load_events_window`` so the watermark
    predicate pushes down to the parquet scan as a raw int64 comparison
    (row-group pruning); in a partitioned deployment the state side is
    simply the stored rollup table and never re-scans facts at all.
    """
    state = _partial_rollup(load_events_window(spark, sf_dir, _LO, WATERMARK))
    delta = _partial_rollup(load_events_window(spark, sf_dir, WATERMARK, _HI))
    merged = merge_rollups(state, delta)
    return merged.select(
        "day",
        "event_type",
        F.col("n").alias("n_events"),
        (F.col("cents") / 100.0).alias("revenue"),
        (F.col("min_c") / 100.0).alias("min_value"),
        (F.col("max_c") / 100.0).alias("max_value"),
        # integer half-up of cents/(100·n) at 6dp — the float ROUND can
        # land on a real .5 boundary (same device as dow_seasonality)
        (
            F.expr("(2 * cents * 10000 + n) DIV (2 * n)").cast("double")
            / 1e6
        ).alias("avg_value"),
    ).orderBy("day", "event_type")


QUERIES = {
    "incremental_rollup_merge": incremental_rollup,
}

ORACLES = {
    # from-scratch recompute: the invariant the incremental path must hold
    "incremental_rollup_merge": """
        SELECT CAST(ts AS DATE) AS day,
               event_type,
               count(*) AS n_events,
               sum(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS revenue,
               min(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS min_value,
               max(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS max_value,
               CAST((2 * sum(CAST(ROUND(value * 100) AS BIGINT)) * 10000
                     + count(*)) // (2 * count(*)) AS DOUBLE)
                   / 1000000.0 AS avg_value
        FROM events
        GROUP BY 1, 2
        ORDER BY day, event_type
    """,
}
