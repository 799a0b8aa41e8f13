"""Object-store put/get/delete + the storage-side sync file.

Reference surface: warehouse/warehouse.go:28-35 (Storage interface),
warehouse/localdisk.go (local), warehouse/s3.go / warehouse/gcs.go (cloud).
Spark's Hadoop FS connectors subsume all three schemes — a production
deployment passes an ``s3a://`` / ``gs://`` base URI and the same code
runs; locally this is plain filesystem I/O.

The sync file (warehouse/warehouse.go:16,74-107) is the storage-only
checkpoint: a single RFC3339 timestamp in ``.sync.hauser``.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil

SYNC_FILE_NAME = ".sync.hauser"
UTC = dt.timezone.utc


def format_rfc3339(t: dt.datetime) -> str:
    """Go time.Format(time.RFC3339): second precision, Z for UTC."""
    t = t.astimezone(UTC)
    return t.strftime("%Y-%m-%dT%H:%M:%SZ")


class SyncViaStorageMixin:
    """warehouse/warehouse.go:74-107 — the storage-side checkpoint,
    expressed over the provider's own byte-level ops so every backend
    (local disk, Hadoop-FS URI) inherits identical semantics."""

    def last_sync_point(self) -> dt.datetime | None:
        """S5: read .sync.hauser → timestamp; absent ⇒ None (zero time ⇒
        caller falls back to StartTime, internal/service.go:275-278)."""
        if not self.exists(SYNC_FILE_NAME):
            return None
        text = self.read_file(SYNC_FILE_NAME).decode().strip()
        if not text:
            return None
        return dt.datetime.fromisoformat(text.replace("Z", "+00:00"))

    def save_sync_point(self, t: dt.datetime) -> None:
        """W4 (file variant): overwrite with RFC3339 text."""
        self.save_bytes(SYNC_FILE_NAME, format_rfc3339(t).encode())


class LocalStorage(SyncViaStorageMixin):
    """Local-disk storage provider (warehouse/localdisk.go)."""

    def __init__(self, base_dir: str, use_start_time: bool = False):
        self.base_dir = base_dir
        # UseStartTime: sync point falls back to config start (localdisk.go)
        self.use_start_time = use_start_time
        os.makedirs(base_dir, exist_ok=True)

    # -- Storage interface (warehouse/warehouse.go:28-35) --

    def save_file(self, name: str, src_path: str) -> str:
        """K1: put object; returns its URI (here: the path)."""
        dest = os.path.join(self.base_dir, name)
        os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
        shutil.copyfile(src_path, dest)
        return dest

    def save_bytes(self, name: str, data: bytes) -> str:
        dest = os.path.join(self.base_dir, name)
        os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
        with open(dest, "wb") as f:
            f.write(data)
        return dest

    def read_file(self, name: str) -> bytes:
        with open(os.path.join(self.base_dir, name), "rb") as f:
            return f.read()

    def delete_file(self, name: str) -> None:
        try:
            os.remove(os.path.join(self.base_dir, name))
        except FileNotFoundError:
            pass

    def exists(self, name: str) -> bool:
        return os.path.exists(os.path.join(self.base_dir, name))

class HadoopFsStorage(SyncViaStorageMixin):
    """Object-store provider over Spark's Hadoop FileSystem API.

    One implementation covers every scheme the cluster's Hadoop build
    knows — ``file://`` (tested hermetically), ``s3a://``
    (warehouse/s3.go:39-75 semantics), ``gs://`` (warehouse/gcs.go:35-50)
    — because the byte-level Storage ops (put / get / delete / exists)
    map 1:1 onto FileSystem calls and auth/retries live in the Hadoop
    connector, exactly where a Spark deployment configures them.  No new
    Python dependency: the calls go through the live SparkSession's JVM.
    """

    def __init__(self, spark, base_uri: str, use_start_time: bool = False):
        self.base_uri = base_uri.rstrip("/")
        self.use_start_time = use_start_time
        self._jvm = spark._jvm
        self._hconf = spark._jsc.hadoopConfiguration()
        self.__fs = None

    @property
    def _fs(self):
        # lazy: the scheme's connector resolves on first use, so a
        # storage handle can be constructed (e.g. from config) on hosts
        # whose classpath lacks that cloud's jar
        if self.__fs is None:
            juri = self._jvm.java.net.URI(self.base_uri)
            self.__fs = self._jvm.org.apache.hadoop.fs.FileSystem.get(
                juri, self._hconf
            )
        return self.__fs

    def _path(self, name: str):
        return self._jvm.org.apache.hadoop.fs.Path(
            f"{self.base_uri}/{name}"
        )

    # -- Storage interface (warehouse/warehouse.go:28-35) --

    def save_file(self, name: str, src_path: str) -> str:
        """K1: put object (s3.go:39-51 upload ≙ copyFromLocalFile);
        returns the object URI (GetFileReference analog)."""
        src = self._jvm.org.apache.hadoop.fs.Path(
            "file://" + os.path.abspath(src_path)
        )
        # delSrc=False, overwrite=True — puts are idempotent re-puts on
        # retry, matching the uploader semantics
        self._fs.copyFromLocalFile(False, True, src, self._path(name))
        return f"{self.base_uri}/{name}"

    def save_bytes(self, name: str, data: bytes) -> str:
        out = self._fs.create(self._path(name), True)
        try:
            out.write(bytearray(data))
        finally:
            out.close()
        return f"{self.base_uri}/{name}"

    def read_file(self, name: str) -> bytes:
        stream = self._fs.open(self._path(name))
        try:
            return bytes(
                self._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
            )
        finally:
            stream.close()

    def delete_file(self, name: str) -> None:
        # recursive=False: objects only, same as the per-object deletes
        self._fs.delete(self._path(name), False)

    def exists(self, name: str) -> bool:
        return bool(self._fs.exists(self._path(name)))


#: Provider switch (core/core.go:18-51): config provider name → storage.
def make_storage(spark, provider: str, base: str, use_start_time=False):
    """``local`` → plain filesystem; ``aws``/``gcp`` → the Hadoop-FS
    backend with the scheme the reference's provider would target; any
    explicit URI (``scheme://…``) → Hadoop-FS as-is."""
    if "://" in base:
        return HadoopFsStorage(spark, base, use_start_time)
    if provider == "local":
        return LocalStorage(base, use_start_time)
    if provider == "aws":
        return HadoopFsStorage(spark, f"s3a://{base}", use_start_time)
    if provider == "gcp":
        return HadoopFsStorage(spark, f"gs://{base}", use_start_time)
    raise ValueError(f"unknown storage provider {provider!r}")
