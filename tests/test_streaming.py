"""Structured Streaming incremental pipeline: the streaming windowed
aggregation must agree with the batch w1 computation, and streaming dedup
must drop exact duplicate events."""

import json

from pyspark.sql import functions as F

from hauser_spark.streaming import (
    stream_bundle_counts,
    stream_dedup_events,
    stream_events,
)
from hauser_spark.streaming.incremental import run_available_now


def _write_event_files(tmp_path, events, files=3):
    src = tmp_path / "landing"
    src.mkdir()
    per = max(1, len(events) // files)
    for i in range(0, len(events), per):
        with open(src / f"chunk{i}.json", "w") as f:
            for e in events[i : i + per]:
                f.write(json.dumps(e) + "\n")
    return str(src)


def _mk_events(n=200):
    out = []
    for i in range(n):
        out.append(
            {
                "event_id": i,
                "ts": f"2024-01-0{1 + (i % 5)}T{i % 24:02d}:15:00.000Z",
                "user_id": i % 17,
                "event_type": ["view", "click", "purchase"][i % 3],
                "value": round(i * 0.5, 2),
                "props": json.dumps({"k": i % 100}),
            }
        )
    return out


def test_streaming_bundle_counts_match_batch(spark, tmp_path):
    events = _mk_events()
    src = _write_event_files(tmp_path, events)

    streamed = stream_bundle_counts(stream_events(spark, src), "6 hours")
    run_available_now(streamed, str(tmp_path / "ckpt"))
    got = {
        (r["bundle_start"], r["bundle_end"]): r["n_events"]
        for r in spark.sql("SELECT * FROM bundles").collect()
    }

    batch = spark.read.schema(
        stream_events(spark, src).schema
    ).json(src)
    expected = {
        (r["w"]["start"], r["w"]["end"]): r["n"]
        for r in batch.groupBy(F.window("ts", "6 hours").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == expected
    assert sum(got.values()) == len(events)


def test_streaming_dedup_drops_duplicates(spark, tmp_path):
    events = _mk_events(60)
    dupes = events + events[:20]  # re-deliver 20 events
    src = _write_event_files(tmp_path, dupes)

    deduped = stream_dedup_events(stream_events(spark, src))
    run_available_now(deduped, str(tmp_path / "ckpt2"), str(tmp_path / "out"))
    got = spark.read.parquet(str(tmp_path / "out"))
    assert got.count() == 60
    assert got.select("event_id").distinct().count() == 60
