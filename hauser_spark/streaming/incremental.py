"""The incremental export pipeline as Structured Streaming.

The batch driver loop (service.py) is the faithful mapping of the
reference — hauser itself is poll-and-sleep batch (SURVEY §7). This module
is the alternative the engine offers when the event source is a landing
zone of files (or Kafka, with a one-line source swap):

- W1 tumbling windows      → ``F.window(ts, duration)`` (epoch-aligned,
                             identical alignment semantics to
                             internal/service.go:280-284)
- W2 ExportDelay watermark → ``withWatermark(ts, delay)`` — late events
                             beyond the delay are dropped, exactly the
                             reference's documented late-data policy
                             (README.md:43-47)
- W3 trigger loop          → ``trigger(availableNow=True)`` for catch-up,
                             ``processingTime`` for steady state
- W4 checkpoint            → ``checkpointLocation`` (replaces the sync
                             table when streaming owns the pipeline)

Scale notes: file-source streaming lists incrementally
(``maxFilesPerTrigger`` bounds a micro-batch); the windowed aggregate is
a streaming state-store aggregation keyed by window — state size is
bounded by (windows in flight × groups), and the watermark evicts closed
windows. Day-partitioned parquet sink + ``availableNow`` reproduces the
bundle-at-a-time load with exactly-once file-sink semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_events(
    spark: SparkSession,
    source_dir: str,
    fmt: str = "json",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source event stream with an explicit schema (S4: never infer —
    ids must be long, not double)."""
    reader = spark.readStream.format(fmt).schema(EVENT_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(source_dir)


def stream_bundle_counts(
    events: DataFrame,
    window_duration: str = "6 hours",
    watermark_delay: str = "24 hours",
) -> DataFrame:
    """W1+W2: watermarked tumbling-window bundle aggregation — the
    streaming twin of plans/parity.w1_tumbling_windows (same alignment,
    same output shape, plus late-data eviction)."""
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy(F.window("ts", window_duration).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("user_id").alias("n_users_approx"),
        )
        .select(
            F.col("w.start").alias("bundle_start"),
            F.col("w.end").alias("bundle_end"),
            "n_events",
            "n_users_approx",
        )
    )


def stream_dedup_events(
    events: DataFrame, watermark_delay: str = "24 hours"
) -> DataFrame:
    """Streaming exact dedup on the event key within the watermark horizon
    — the streaming member of the dedup suite (operators/dedup.py). State
    is bounded: keys older than the watermark are evicted."""
    return events.withWatermark("ts", watermark_delay).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_available_now(
    result: DataFrame, checkpoint_dir: str, out_dir: str | None = None
):
    """W3 catch-up: drain everything currently available, then stop —
    the streaming analog of the batch loop's zero-wait fast path
    (internal/service.go:362-378). Returns the finished query."""
    writer = (
        result.writeStream.outputMode(
            "append" if out_dir else "complete"
        ).option("checkpointLocation", checkpoint_dir)
    )
    if out_dir:
        q = writer.format("parquet").option("path", out_dir).trigger(
            availableNow=True
        ).start()
    else:
        q = (
            writer.format("memory")
            .queryName("bundles")
            .trigger(availableNow=True)
            .start()
        )
    q.awaitTermination()
    return q
