"""SURVEY §2 operator inventory as oracle-checkable queries on the driver's
``events`` table (event_id, ts, user_id, event_type, value, props).

Each entry demonstrates one reference operator's semantics through the
engine, with an ANSI-SQL oracle DuckDB runs on the same parquet. Names
track SURVEY §2 operator ids (S4, F1, F3, T3-T7, A1-A4, W1-W2, W5, O1, K4).

Scale notes: every query is a declarative plan — filters and projections
reach the parquet scan (PushedFilters/ReadSchema), aggregates do map-side
partial aggregation, window functions shuffle once on their partition key.
No Python touches row data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import money_sum, money_sum_sql as _ms
from ..tables import load_table

# Window bounds chosen inside the events table's range (2024-01-01..01-31).
_WIN_START = "2024-01-10 00:00:00"
_WIN_END = "2024-01-20 00:00:00"


def s4_typed_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4: explicit-schema decode — ids stay int64 (never double), JSON
    props field extracted typed (json.Number semantics,
    internal/service.go:183-211)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_id",
            "user_id",
            F.get_json_object("props", "$.k").cast("long").alias("k_val"),
        )
        .filter(F.col("k_val") > 50)
        .orderBy("event_id")
    )


def f1_time_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: start-inclusive / end-exclusive window predicate on the event
    time (client/client.go:31-33). Uses the window-aware events loader so
    the predicate pushes into the parquet scan as a long comparison
    (row-group pruning) instead of sitting above the ns→µs conversion."""
    from ..tables import load_events_window

    ev = load_events_window(spark, sf_dir, _WIN_START, _WIN_END)
    return ev.select("event_id", "ts", "user_id", "event_type").orderBy("event_id")


def f2_segment_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: SegmentId restriction (client/export.go:52, config/config.go:17)
    — the export carries only events of the named segment's members;
    ``everyone`` is a no-op.  The declarative twin of the server-side
    filter: segment membership is an all-time predicate over users
    (SegmentTimeRange "All Time", client/export.go:55-56), applied to the
    windowed scan as a semi-join.

    Scale shape: membership is a groupBy on user_id (one shuffle over the
    distinct-user projection, far smaller than the fact scan), then a
    semi-join that AQE converts to broadcast when the segment is small —
    the common case, since segments are defined to be cohorts."""
    ev = load_table(spark, sf_dir, "events")
    members = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
    )
    from ..tables import load_events_window

    win = load_events_window(spark, sf_dir, _WIN_START, _WIN_END)
    return win.join(members, "user_id", "left_semi").select(
        "event_id", "ts", "user_id", "event_type"
    )


def f2_segment_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2's driver-facing artifact: a per-type digest of the segment-
    filtered window — row count, exact event_id sum, and distinct
    members. The full filtered scan (``f2_segment_filter``) is what the
    service ships to the sink (distributed write); driver-collecting it
    is the anti-pattern the 8×-scale probe flagged (compute 0.6 s,
    collect of 267k rows 2.4 s). The digest runs the identical
    semi-joined scan and pins the same row set: any membership or
    window drift moves n / id_sum / n_users."""
    f = f2_segment_filter(spark, sf_dir)
    return (
        f.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("event_id").alias("id_sum"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("event_type")
    )


def f3_projection_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: field-list projection — only two columns reach the scan
    (ReadSchema pruning ≙ the export field list,
    warehouse/schema.go:176-190)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", "event_type").filter(
        F.col("event_type").isin("click", "purchase")
    )


def t4_ordered_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4: ordered projection with empty-string null-fill for missing
    fields (internal/service.go:98-117). ``missing_col`` plays the role of
    a destination-only column."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id"),
        F.coalesce(F.col("event_type"), F.lit("")).alias("event_type_filled"),
        F.coalesce(F.col("props"), F.lit("{}")).alias("custom_vars"),
        F.lit("").alias("missing_col"),
    )


def t6_scalar_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6: RFC3339Micro timestamp text with Go trailing-zero trimming +
    newline scrub (warehouse/warehouse.go:54-71)."""
    ev = load_table(spark, sf_dir, "events")
    formatted = F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
    trimmed = F.regexp_replace(formatted, r"(\.\d*?)0+$", r"$1")
    trimmed = F.regexp_replace(trimmed, r"\.$", "")
    return ev.select(
        "event_id",
        F.concat(trimmed, F.lit("Z")).alias("ts_rfc3339"),
        F.regexp_replace("event_type", r"[\n\r]", " ").alias("clean_type"),
    ).orderBy("event_id")


def t7_truncate_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7: Redshift-style VarCharMax truncation (warehouse/redshift.go:101-116)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id", F.substring("props", 1, 8).alias("props_trunc")
    ).orderBy("event_id")


def a1_sync_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2: max() high-watermark (warehouse/redshift.go:308-315)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.max("ts").alias("watermark"), F.count(F.lit(1)).alias("n_rows")
    )


def a3_repair_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5 condition: compare two scalar watermarks (the loaded-past-
    checkpoint detection, warehouse/redshift.go:341-351). Expressed as a
    cross join of two 1-row aggregates."""
    ev = load_table(spark, sf_dir, "events")
    all_wm = ev.agg(F.max("ts").alias("data_wm"))
    ckpt_wm = ev.filter(F.col("ts") < F.lit(_WIN_END)).agg(
        F.max("ts").alias("sync_wm")
    )
    return all_wm.crossJoin(ckpt_wm).select(
        (F.col("data_wm") > F.col("sync_wm")).alias("needs_repair"),
        "data_wm",
        "sync_wm",
    )


def w1_tumbling_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: epoch-aligned tumbling 6h bundle windows + per-bundle record
    counts (A4) — Spark's window() has exactly hauser's alignment
    (internal/service.go:280-284)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "6 hours").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.col("w.start").alias("bundle_start"),
            F.col("w.end").alias("bundle_end"),
            "n_events",
            "n_users",
        )
        .orderBy("bundle_start")
    )


def w2_mature_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: watermark/allowed-lateness gate — only events at least 24h
    older than the head of the stream are mature
    (internal/service.go:286-294)."""
    ev = load_table(spark, sf_dir, "events")
    head = ev.agg(F.max("ts").alias("head"))
    return (
        ev.crossJoin(head)
        .filter(F.col("ts") <= F.col("head") - F.expr("INTERVAL 24 HOURS"))
        .agg(F.count(F.lit(1)).alias("mature_events"))
    )


def w5_delete_past_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5/F4: repair predicate — the surviving rows after
    DELETE WHERE ts > watermark (warehouse/redshift.go:284-294)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("ts") <= F.lit(_WIN_END))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("surviving"))
        .orderBy("event_type")
    )


def o1_stable_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: deterministic export order — stable sort by event time with a
    total-order tiebreak (testing/mockclient.go:47-49 + SURVEY §5)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        ev.select("event_id", "ts", F.row_number().over(w).alias("seq"))
        .filter(F.col("seq") <= 100)
    )


def k4_day_partition_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4: day-partitioned load accounting — rows per day partition
    (warehouse/bigquery.go:130-161's $YYYYMMDD decorator)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            money_sum(F.col("value")).alias("day_value"),
        )
        .orderBy("day")
    )


QUERIES = {
    "s4_typed_scan": s4_typed_scan,
    "f1_time_range_scan": f1_time_range_scan,
    "f2_segment_filter": f2_segment_digest,
    "f3_projection_pushdown": f3_projection_pushdown,
    "t4_ordered_projection": t4_ordered_projection,
    "t6_scalar_conversion": t6_scalar_conversion,
    "t7_truncate_conversion": t7_truncate_conversion,
    "a1_sync_watermark": a1_sync_watermark,
    "a3_repair_check": a3_repair_check,
    "w1_tumbling_windows": w1_tumbling_windows,
    "w2_mature_events": w2_mature_events,
    "w5_delete_past_watermark": w5_delete_past_watermark,
    "o1_stable_sort": o1_stable_sort,
    "k4_day_partition_load": k4_day_partition_load,
}

ORACLES = {
    "s4_typed_scan": """
        SELECT event_id, user_id, CAST(props->>'$.k' AS BIGINT) AS k_val
        FROM events
        WHERE CAST(props->>'$.k' AS BIGINT) > 50
        ORDER BY event_id
    """,
    "f1_time_range_scan": f"""
        SELECT event_id, ts, user_id, event_type FROM events
        WHERE ts >= TIMESTAMP '{_WIN_START}' AND ts < TIMESTAMP '{_WIN_END}'
        ORDER BY event_id
    """,
    "f2_segment_filter": f"""
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(event_id) AS BIGINT) AS id_sum,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events
        WHERE ts >= TIMESTAMP '{_WIN_START}' AND ts < TIMESTAMP '{_WIN_END}'
          AND user_id IN (SELECT DISTINCT user_id FROM events
                          WHERE event_type = 'purchase')
        GROUP BY event_type
        ORDER BY event_type
    """,
    "f3_projection_pushdown": """
        SELECT event_id, event_type FROM events
        WHERE event_type IN ('click', 'purchase')
    """,
    "t4_ordered_projection": """
        SELECT event_id,
               COALESCE(event_type, '') AS event_type_filled,
               COALESCE(props, '{}') AS custom_vars,
               '' AS missing_col
        FROM events
    """,
    "t6_scalar_conversion": r"""
        SELECT event_id,
               regexp_replace(
                   regexp_replace(strftime(ts, '%Y-%m-%dT%H:%M:%S.%f'),
                                  '(\.\d*?)0+$', '\1'),
                   '\.$', '') || 'Z' AS ts_rfc3339,
               regexp_replace(event_type, '[\n\r]', ' ', 'g') AS clean_type
        FROM events ORDER BY event_id
    """,
    "t7_truncate_conversion": """
        SELECT event_id, substring(props, 1, 8) AS props_trunc
        FROM events ORDER BY event_id
    """,
    "a1_sync_watermark": """
        SELECT max(ts) AS watermark, count(*) AS n_rows FROM events
    """,
    "a3_repair_check": f"""
        SELECT a.data_wm > b.sync_wm AS needs_repair, a.data_wm, b.sync_wm
        FROM (SELECT max(ts) AS data_wm FROM events) a
        CROSS JOIN (SELECT max(ts) AS sync_wm FROM events
                    WHERE ts < TIMESTAMP '{_WIN_END}') b
    """,
    "w1_tumbling_windows": """
        SELECT TIMESTAMP '1970-01-01'
                   + to_seconds(CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT)) AS bundle_start,
               TIMESTAMP '1970-01-01'
                   + to_seconds(CAST(floor(epoch(ts) / 21600) * 21600 + 21600 AS BIGINT)) AS bundle_end,
               count(*) AS n_events,
               count(DISTINCT user_id) AS n_users
        FROM events
        GROUP BY 1, 2 ORDER BY 1
    """,
    "w2_mature_events": """
        SELECT count(*) AS mature_events FROM events
        WHERE ts <= (SELECT max(ts) - INTERVAL 24 HOUR FROM events)
    """,
    "w5_delete_past_watermark": f"""
        SELECT event_type, count(*) AS surviving FROM events
        WHERE ts <= TIMESTAMP '{_WIN_END}'
        GROUP BY event_type ORDER BY event_type
    """,
    "o1_stable_sort": """
        SELECT event_id, ts, seq FROM (
            SELECT event_id, ts,
                   ROW_NUMBER() OVER (ORDER BY ts ASC, event_id ASC) AS seq
            FROM events
        ) WHERE seq <= 100
    """,
    "k4_day_partition_load": f"""
        SELECT CAST(ts AS DATE) AS day, count(*) AS n_rows,
               {_ms('value')} AS day_value
        FROM events GROUP BY 1 ORDER BY 1
    """,
}
