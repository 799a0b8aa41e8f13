"""End-to-end golden-file parity: replay the reference's TestHauser harness
(internal/service_test.go:34-194) through the Spark engine and byte-compare
every uploaded file against the reference's checked-in goldens.

Fixtures are read in place from /root/reference/testing/testdata (read-only).
"""

import datetime as dt
import os

import pytest

from hauser_spark.config import Config
from hauser_spark.schema import make_schema
from hauser_spark.service import HauserService
from hauser_spark.sinks.storage import LocalStorage
from hauser_spark.sinks.warehouse import SparkWarehouseDatabase
from hauser_spark.sources.export_client import LocalFixtureClient

REF = "/root/reference/testing/testdata"
UTC = dt.timezone.utc
NOW = dt.datetime(2020, 9, 1, tzinfo=UTC)
START = dt.datetime(2020, 8, 26, tzinfo=UTC)

DEFAULT_COLUMNS = [
    "EventCustomName", "EventStart", "EventType", "EventTargetText",
    "EventTargetSelectorTok", "EventModFrustrated", "EventModDead",
    "EventModError", "EventModSuspicious", "IndvId", "PageClusterId",
    "PageUrl", "PageDuration", "PageActiveDuration", "PageRefererUrl",
    "PageLatLong", "PageAgent", "PageIp", "PageBrowser", "PageDevice",
    "PageOperatingSystem", "PageNumInfos", "PageNumWarnings",
    "PageNumErrors", "SessionId", "PageId", "UserAppKey", "UserEmail",
    "UserDisplayName", "UserId", "CustomVars", "LoadDomContentTime",
    "LoadFirstPaintTime", "LoadEventTime",
]

EXISTING_COLUMNS = [
    "EventStart", "PageAgent", "EventTargetSelectorTok", "CustomColumn",
]


class RecordingStorage(LocalStorage):
    """MockStorage analog: keeps uploaded bytes after deletion."""

    def __init__(self, base_dir):
        super().__init__(base_dir)
        self.uploaded: dict[str, bytes] = {}
        self.deleted: list[str] = []

    def save_file(self, name, src_path):
        with open(src_path, "rb") as f:
            self.uploaded[name] = f.read()
        return super().save_file(name, src_path)

    def save_bytes(self, name, data):
        if name != ".sync.hauser":
            self.uploaded[name] = data
        return super().save_bytes(name, data)

    def delete_file(self, name):
        self.deleted.append(name)
        super().delete_file(name)


def _pre_create_table(spark, db, columns):
    """MockDatabase(initialColumns) analog: destination table pre-exists
    with these columns (types resolved like the warehouse would)."""
    base = make_schema()
    fields = [base.get_field_for_name(c) for c in columns]
    # keep the DB column name (e.g. PageAgent), not the source field name
    from hauser_spark.schema import Schema, WarehouseField

    named = [
        WarehouseField(col, f.fs_field_name, f.field_type)
        for col, f in zip(columns, fields)
    ]
    db.init_export_table(Schema(named))


def _run_case(spark, tmp_path, initial_columns, config, storage_only):
    storage = RecordingStorage(str(tmp_path / "storage"))
    db = None
    if not storage_only:
        db = SparkWarehouseDatabase(spark, str(tmp_path / "warehouse"))
        if initial_columns:
            _pre_create_table(spark, db, initial_columns)
    client = LocalFixtureClient(spark, f"{REF}/raw.json")
    svc = HauserService(
        spark=spark,
        config=config.validate(NOW),
        client=client,
        storage=storage,
        database=db,
        get_now=lambda: NOW,
    )
    svc.init()
    bundles = 0
    while True:
        result = svc.process_next()
        if not result.processed:
            break
        bundles += 1
        assert bundles < 20, "runaway loop"
    return svc, storage, db, bundles


def _assert_golden(storage, golden_dir):
    golden_files = sorted(os.listdir(golden_dir))
    assert sorted(storage.uploaded) == golden_files
    for name in golden_files:
        with open(os.path.join(golden_dir, name), "rb") as f:
            expected = f.read()
        got = storage.uploaded[name]
        if got != expected:
            # first differing line for debuggability
            for i, (e, g) in enumerate(
                zip(expected.split(b"\n"), got.split(b"\n"))
            ):
                assert e == g, f"{name} line {i}:\nwant {e!r}\ngot  {g!r}"
            assert got == expected, f"{name}: length mismatch"


def test_base_case_legacy_table(spark, tmp_path):
    cfg = Config(
        export_duration=dt.timedelta(hours=24), start_time=START, tmp_dir=str(tmp_path / "t")
    )
    svc, storage, db, bundles = _run_case(spark, tmp_path, DEFAULT_COLUMNS, cfg, False)
    assert bundles == 5
    assert len(storage.deleted) == 5
    _assert_golden(storage, f"{REF}/default")
    # loaded rows landed in the warehouse table
    assert db.export_df().count() > 0


def test_group_by_day_fresh(spark, tmp_path):
    cfg = Config(
        group_files_by_day=True, start_time=START, tmp_dir=str(tmp_path / "t")
    )
    svc, storage, db, bundles = _run_case(spark, tmp_path, None, cfg, False)
    assert bundles == 5
    _assert_golden(storage, f"{REF}/groupByDay")


def test_storage_only_json(spark, tmp_path):
    cfg = Config(
        export_duration=dt.timedelta(hours=24),
        start_time=START,
        save_as_json=True,
        storage_only=True,
        tmp_dir=str(tmp_path / "t"),
    )
    svc, storage, db, bundles = _run_case(spark, tmp_path, None, cfg, True)
    assert bundles == 5
    _assert_golden(storage, f"{REF}/json")


def test_existing_weird_columns(spark, tmp_path):
    cfg = Config(
        export_duration=dt.timedelta(hours=24), start_time=START, tmp_dir=str(tmp_path / "t")
    )
    svc, storage, db, bundles = _run_case(spark, tmp_path, EXISTING_COLUMNS, cfg, False)
    assert bundles == 5
    _assert_golden(storage, f"{REF}/existing")
