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


class LocalStorage:
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

    # -- SyncViaStorageMixin (warehouse/warehouse.go:74-107) --

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
