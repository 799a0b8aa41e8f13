"""Deterministic cardinality sketches.

KMV (k-minimum-values) distinct-count estimation [Bar-Yossef et al. 2002,
"Counting distinct elements in a data stream"]: hash every element to
[0, 2^60) and keep the k smallest distinct hash values; if the kth
smallest (normalized) is h_k, the estimate is (k-1)/h_k. This is the
estimator family behind approx_count_distinct, but built from md5 so
Spark, DuckDB and Python compute bit-identical results — which makes an
*approximate* operator exactly oracle-checkable (same estimate, same
error, on every engine).

Scale design: the expensive part is `distinct hash per group`, one
shuffle with map-side partial dedup; the k-smallest selection is a
window row_number over groups bounded at k rows each. At 100 TB the
same plan holds — the sketch state per group is k longs, and the
distinct-before-rank keeps the window input tiny. (Spark's native
approx_count_distinct/HLL is the zero-window alternative; traded here
for cross-engine determinism, same tradeoff as value_percentiles.)

The reference has no sketches — its only aggregates are max()/count()
watermark reads (SURVEY §2.4, warehouse/redshift.go:308-315). This is
part of the beyond-reference analytics surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_table

K = 64
HASH_SPAN = float(1 << 60)  # md5-prefix hash domain: [0, 2^60)


def _h60(col: F.Column) -> F.Column:
    """60-bit md5-derived hash, identical in Spark and DuckDB."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10)
        .cast("long")
    )


def kmv_distinct_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-event_id estimate per event_type, with the exact
    count and relative error alongside (the estimate is deterministic, so
    the error is too)."""
    ev = load_table(spark, sf_dir, "events")
    hashes = ev.select(
        "event_type", _h60(F.col("event_id")).alias("h")
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    topk = hashes.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= K
    )
    per = topk.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_seen"), F.max("h").alias("kth")
    )
    est = F.when(F.col("n_seen") < K, F.col("n_seen").cast("double")).otherwise(
        F.lit((K - 1) * HASH_SPAN) / F.col("kth")
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("event_id").alias("n_exact")
    )
    return (
        per.join(exact, "event_type")
        .select(
            "event_type",
            "n_exact",
            F.round(est, 4).alias("n_est"),
            F.round((est - F.col("n_exact")) / F.col("n_exact"), 6).alias(
                "rel_err"
            ),
        )
        .orderBy("event_type")
    )


QUERIES = {
    "sketch_kmv_distinct": kmv_distinct_per_type,
}

ORACLES = {
    "sketch_kmv_distinct": f"""
        WITH hashes AS (
            SELECT DISTINCT event_type,
                   ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT AS h
            FROM events
        ),
        ranked AS (
            SELECT event_type, h,
                   ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
            FROM hashes
        ),
        per AS (
            SELECT event_type, count(*) AS n_seen, max(h) AS kth
            FROM ranked WHERE rn <= {K} GROUP BY event_type
        ),
        exact AS (
            SELECT event_type, count(DISTINCT event_id) AS n_exact
            FROM events GROUP BY event_type
        )
        SELECT per.event_type, n_exact,
               ROUND(CASE WHEN n_seen < {K} THEN CAST(n_seen AS DOUBLE)
                          ELSE {(K - 1) * HASH_SPAN!r} / kth END, 4) AS n_est,
               ROUND((CASE WHEN n_seen < {K} THEN CAST(n_seen AS DOUBLE)
                           ELSE {(K - 1) * HASH_SPAN!r} / kth END - n_exact)
                     / n_exact, 6) AS rel_err
        FROM per JOIN exact ON per.event_type = exact.event_type
        ORDER BY per.event_type
    """,
}
