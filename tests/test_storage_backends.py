"""Storage suite parameterized over providers: the byte-level Storage
interface (warehouse/warehouse.go:28-35) and the storage-side sync
checkpoint (warehouse/warehouse.go:74-107) must behave identically on
the local-disk backend and the Hadoop-FS URI backend (tested with
``file://``; ``s3a://``/``gs://`` differ only in scheme + connector)."""

import datetime as dt

import pytest

from hauser_spark.sinks.storage import (
    HadoopFsStorage,
    LocalStorage,
    make_storage,
)

UTC = dt.timezone.utc


@pytest.fixture(params=["local", "hadoop-file"])
def storage(request, spark, tmp_path):
    base = tmp_path / "store"
    if request.param == "local":
        return LocalStorage(str(base))
    return HadoopFsStorage(spark, f"file://{base}")


def test_bytes_round_trip(storage):
    ref = storage.save_bytes("a/b.csv", b"hello,world\n")
    assert storage.exists("a/b.csv")
    assert storage.read_file("a/b.csv") == b"hello,world\n"
    assert ref.endswith("a/b.csv")


def test_save_file_round_trip(storage, tmp_path):
    src = tmp_path / "src.csv"
    src.write_bytes(b"x,y\n1,2\n")
    storage.save_file("out/data.csv", str(src))
    assert storage.read_file("out/data.csv") == b"x,y\n1,2\n"


def test_overwrite_is_last_writer_wins(storage):
    storage.save_bytes("k", b"v1")
    storage.save_bytes("k", b"v2")
    assert storage.read_file("k") == b"v2"


def test_delete_and_absent_delete(storage):
    storage.save_bytes("gone", b"x")
    storage.delete_file("gone")
    assert not storage.exists("gone")
    storage.delete_file("gone")  # deleting a missing object is a no-op


def test_sync_point_round_trip(storage):
    assert storage.last_sync_point() is None
    t = dt.datetime(2020, 8, 27, 12, 30, 0, tzinfo=UTC)
    storage.save_sync_point(t)
    assert storage.last_sync_point() == t


def test_golden_base_case_on_hadoop_fs(spark, tmp_path):
    """The reference's TestHauser base case byte-compared against its
    goldens with bundles landing through the Hadoop-FS backend."""
    import datetime as dt

    from hauser_spark.config import Config
    from hauser_spark.service import HauserService
    from hauser_spark.sinks.warehouse import SparkWarehouseDatabase
    from hauser_spark.sources.export_client import LocalFixtureClient
    from tests.test_parity_golden import (
        DEFAULT_COLUMNS,
        NOW,
        REF,
        START,
        _assert_golden,
        _pre_create_table,
    )

    class RecordingHadoopStorage(HadoopFsStorage):
        def __init__(self, spark, base_uri):
            super().__init__(spark, base_uri)
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

    storage = RecordingHadoopStorage(spark, f"file://{tmp_path}/store")
    db = SparkWarehouseDatabase(spark, str(tmp_path / "warehouse"))
    _pre_create_table(spark, db, DEFAULT_COLUMNS)
    cfg = Config(
        export_duration=dt.timedelta(hours=24),
        start_time=START,
        tmp_dir=str(tmp_path / "t"),
    )
    svc = HauserService(
        spark=spark,
        config=cfg.validate(NOW),
        client=LocalFixtureClient(spark, f"{REF}/raw.json"),
        storage=storage,
        database=db,
        get_now=lambda: NOW,
    )
    svc.init()
    bundles = 0
    while svc.process_next().processed:
        bundles += 1
        assert bundles < 20
    assert bundles == 5
    assert len(storage.deleted) == 5
    _assert_golden(storage, f"{REF}/default")


def test_make_storage_provider_switch(spark, tmp_path):
    s = make_storage(spark, "local", str(tmp_path / "l"))
    assert isinstance(s, LocalStorage)
    h = make_storage(spark, "ignored", f"file://{tmp_path}/u")
    assert isinstance(h, HadoopFsStorage)
    with pytest.raises(ValueError):
        make_storage(spark, "azure", "bucket")
    # aws/gcp map to their schemes (connector jars resolve at use time)
    assert make_storage(spark, "aws", "b").base_uri == "s3a://b"
    assert make_storage(spark, "gcp", "b").base_uri == "gs://b"
