"""Day-partitioned warehouse (the BigQuery layout): partition-routed loads,
first-of-day WRITE_TRUNCATE, W6 partition-grain exactly-once repair
(warehouse/bigquery.go:59-161), and PartitionExpiration retention
(warehouse/bigquery.go:206-227).
"""

import datetime as dt
import os

import pytest

from hauser_spark.config import Config
from hauser_spark.schema import INT64, STRING, TIME, Schema, WarehouseField
from hauser_spark.service import HauserService, make_database
from hauser_spark.sinks.warehouse import (
    PARTITION_COL,
    PartitionedSparkWarehouseDatabase,
)

UTC = dt.timezone.utc
DAY1 = dt.datetime(2020, 8, 26, tzinfo=UTC)


def tiny_schema() -> Schema:
    return Schema(
        [
            WarehouseField("EventStart", "EventStart", TIME),
            WarehouseField("EventType", "EventType", STRING),
            WarehouseField("UserId", "UserId", INT64),
        ]
    )


def write_csv(path, rows):
    with open(path, "w") as f:
        f.write("EventStart,EventType,UserId\n")
        for r in rows:
            f.write(",".join(str(v) for v in r) + "\n")
    return path


def bundle_rows(day_hour, n):
    """n rows inside the hour starting at day_hour."""
    return [
        (
            (day_hour + dt.timedelta(minutes=5 * i)).strftime("%Y-%m-%d %H:%M:%S"),
            "click",
            i,
        )
        for i in range(n)
    ]


@pytest.fixture
def db(spark, tmp_path):
    d = PartitionedSparkWarehouseDatabase(spark, str(tmp_path / "wh"))
    d.init_export_table(tiny_schema())
    return d


def test_fresh_table_metadata(db):
    # empty partitioned table: exists, has columns, empty df
    assert db.does_table_exist(db.export_path)
    assert db.get_export_table_columns() == ["EventStart", "EventType", "UserId"]
    assert db.export_df().count() == 0
    assert db.last_sync_point() is None


def test_partition_routed_load_and_truncate(db, tmp_path):
    s = tiny_schema()
    # first bundle of the day: 00:00 start ⇒ truncate mode
    csv1 = write_csv(tmp_path / "b1.csv", bundle_rows(DAY1, 4))
    db.load_to_warehouse(str(csv1), s, bundle_start=DAY1)
    db.save_sync_point(DAY1 + dt.timedelta(hours=1), DAY1)
    # second bundle same day appends
    csv2 = write_csv(
        tmp_path / "b2.csv", bundle_rows(DAY1 + dt.timedelta(hours=1), 3)
    )
    db.load_to_warehouse(str(csv2), s, bundle_start=DAY1 + dt.timedelta(hours=1))
    db.save_sync_point(DAY1 + dt.timedelta(hours=2), DAY1)
    assert db.export_df().count() == 7
    # the day partition directory exists on disk
    assert os.path.isdir(os.path.join(db.export_path, f"{PARTITION_COL}=2020-08-26"))
    # re-running the FIRST bundle (crash replay) truncates the partition:
    # count returns to 4, not 11
    db.load_to_warehouse(str(csv1), s, bundle_start=DAY1)
    assert db.export_df().count() == 4


def test_w6_repair_backtracks_to_day_start(db, tmp_path):
    s = tiny_schema()
    csv1 = write_csv(tmp_path / "b1.csv", bundle_rows(DAY1, 4))
    db.load_to_warehouse(str(csv1), s, bundle_start=DAY1)
    db.save_sync_point(DAY1 + dt.timedelta(hours=1), DAY1)
    # orphan: a load committed whose checkpoint didn't
    csv2 = write_csv(
        tmp_path / "b2.csv", bundle_rows(DAY1 + dt.timedelta(hours=1), 3)
    )
    db.load_to_warehouse(str(csv2), s, bundle_start=DAY1 + dt.timedelta(hours=1))
    # repair: watermark backtracks to start of day, sync rows past it removed,
    # export rows untouched (cleanup happens on the next first-of-day load)
    wm = db.last_sync_point()
    assert wm == DAY1
    assert db.read_sync_table().count() == 0
    assert db.export_df().count() == 7
    # replaying the day from its first bundle heals: truncate then append
    db.load_to_warehouse(str(csv1), s, bundle_start=DAY1)
    db.save_sync_point(DAY1 + dt.timedelta(hours=1), DAY1)
    db.load_to_warehouse(str(csv2), s, bundle_start=DAY1 + dt.timedelta(hours=1))
    db.save_sync_point(DAY1 + dt.timedelta(hours=2), DAY1)
    assert db.export_df().count() == 7  # exactly once, no duplicates
    assert db.last_sync_point() == DAY1 + dt.timedelta(hours=2)


def test_partition_expiration(spark, tmp_path):
    db = PartitionedSparkWarehouseDatabase(
        spark, str(tmp_path / "wh"), partition_expiration=dt.timedelta(days=3)
    )
    s = tiny_schema()
    db.init_export_table(s)
    for d in range(6):
        day = DAY1 + dt.timedelta(days=d)
        csv = write_csv(tmp_path / f"d{d}.csv", bundle_rows(day, 2))
        db.load_to_warehouse(str(csv), s, bundle_start=day)
    assert db.export_df().count() == 12
    now = DAY1 + dt.timedelta(days=6)  # partitions for day 0..5
    dropped = db.ensure_partition_expiration(now=now)
    # cutoff = day 3 start ⇒ days 0,1,2 dropped
    assert dropped == 3
    assert db.export_df().count() == 6


def test_schema_evolution_partitioned(db, tmp_path):
    s = tiny_schema()
    csv1 = write_csv(tmp_path / "b1.csv", bundle_rows(DAY1, 2))
    db.load_to_warehouse(str(csv1), s, bundle_start=DAY1)
    wider = Schema(
        s.fields + [WarehouseField("PageUrl", "PageUrl", STRING)]
    )
    db.apply_export_schema(wider)
    assert db.get_export_table_columns() == [
        "EventStart", "EventType", "UserId", "PageUrl",
    ]
    # old rows null-filled; jagged load of the old 3-col CSV still works
    csv2 = write_csv(
        tmp_path / "b2.csv", bundle_rows(DAY1 + dt.timedelta(hours=1), 2)
    )
    db.load_to_warehouse(str(csv2), s, bundle_start=DAY1 + dt.timedelta(hours=1))
    df = db.export_df()
    assert df.count() == 4
    assert df.filter(df.PageUrl.isNull()).count() == 4


def test_service_end_to_end_partitioned(spark, tmp_path):
    """Golden harness case with the partitioned database: group-by-day
    bundles (every load is first-of-day truncate), byte-identical CSVs."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_parity_golden import (
        NOW,
        REF,
        START,
        RecordingStorage,
        _assert_golden,
    )
    from hauser_spark.sources.export_client import LocalFixtureClient

    cfg = Config(
        group_files_by_day=True,
        start_time=START,
        tmp_dir=str(tmp_path / "t"),
        partitioned_export=True,
    ).validate(NOW)
    db = make_database(spark, cfg, str(tmp_path / "wh"))
    assert isinstance(db, PartitionedSparkWarehouseDatabase)
    storage = RecordingStorage(str(tmp_path / "storage"))
    svc = HauserService(
        spark=spark,
        config=cfg,
        client=LocalFixtureClient(spark, f"{REF}/raw.json"),
        storage=storage,
        database=db,
        get_now=lambda: NOW,
    )
    svc.init()
    bundles = 0
    while True:
        r = svc.process_next()
        if not r.processed:
            break
        bundles += 1
        assert bundles < 20
    assert bundles == 5
    _assert_golden(storage, f"{REF}/groupByDay")
    # one partition dir per day that had events
    parts = sorted(
        e for e in os.listdir(db.export_path) if e.startswith(f"{PARTITION_COL}=")
    )
    assert len(parts) >= 4
    # watermark survives a fresh database object (durable metadata)
    db2 = PartitionedSparkWarehouseDatabase(spark, str(tmp_path / "wh"))
    assert db2.last_sync_point() is not None
