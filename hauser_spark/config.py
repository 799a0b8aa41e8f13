"""Engine configuration with the reference's validation/defaulting rules.

Mirrors config/config.go:141-251: defaulting (ExportDuration 1h, ExportDelay
24h, StartTime now-30d), validation (duration divides 24h, min delay), and
the back-compat rewrites (GroupFilesByDay ⇒ ExportDuration=24h; deprecated
Warehouse ⇒ Provider). TOML loading is supported via tomllib.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field

from .windows import validate_export_delay, validate_export_duration

UTC = dt.timezone.utc


DEFAULT_API_URL = "https://api.fullstory.com"  # config/config.go:16
DEFAULT_SEGMENT_ID = "everyone"  # config/config.go:17


@dataclass
class Config:
    # core knobs (config/config.go:30-60)
    export_duration: dt.timedelta = dt.timedelta(hours=1)
    export_delay: dt.timedelta = dt.timedelta(hours=24)
    start_time: dt.datetime | None = None
    tmp_dir: str = "tmp"
    file_prefix: str = ""
    include_mobile_apps_fields: bool = False
    save_as_json: bool = False
    storage_only: bool = False
    segment_id: str = DEFAULT_SEGMENT_ID
    # API transport (config/config.go:35,57; client/transport.go:20-30)
    fs_api_token: str = ""
    api_url: str = DEFAULT_API_URL
    # retry/backoff (config/config.go:40-41; internal/service.go:27-30)
    backoff: dt.timedelta = dt.timedelta(seconds=30)
    backoff_steps_max: int = 8
    # group-by-day back-compat (config/config.go:174-177)
    group_files_by_day: bool = False
    # provider selection ("local" | "spark") — the reference's provider
    # switch (core/core.go:18-51) collapses to Spark-native sinks here.
    provider: str = "spark"
    # sink tuning
    varchar_max: int = 65535
    # day-partitioned export table (the BigQuery layout,
    # warehouse/bigquery.go:342-348) + partition retention
    # (PartitionExpiration, config/config.go:98,116)
    partitioned_export: bool = False
    partition_expiration: dt.timedelta | None = None
    extra: dict = field(default_factory=dict)

    def validate(self, now: dt.datetime | None = None) -> "Config":
        now = now or dt.datetime.now(UTC)
        # config/config.go:166-172 — empty string means "use the default"
        if not self.api_url:
            self.api_url = DEFAULT_API_URL
        if not self.segment_id:
            self.segment_id = DEFAULT_SEGMENT_ID
        if self.group_files_by_day:
            # config/config.go:174-177
            self.export_duration = dt.timedelta(hours=24)
        validate_export_duration(self.export_duration)
        validate_export_delay(self.export_delay)
        if self.start_time is None:
            # config/config.go:196-199 — default backfill horizon 30 days
            self.start_time = now - dt.timedelta(days=30)
        if self.save_as_json and not self.storage_only:
            # config/config.go:247-249 — JSON mode is storage-only
            raise ValueError("SaveAsJson requires StorageOnly mode")
        return self


def load_toml(path: str) -> Config:
    """Minimal TOML loader honoring the reference's key names and its
    env-override layer: ``FULLSTORY_API_TOKEN`` beats the TOML value,
    applied *before* validation (config/config.go:141-161)."""
    import os
    import tomllib

    with open(path, "rb") as f:
        raw = tomllib.load(f)

    def dur(key: str, default: dt.timedelta) -> dt.timedelta:
        if key not in raw:
            return default
        v = raw[key]
        if isinstance(v, (int, float)):
            return dt.timedelta(seconds=v)
        # Go duration strings: "24h", "15m", "30s", "1h30m"
        import re

        total = dt.timedelta()
        for num, unit in re.findall(r"([\d.]+)([hms])", str(v)):
            total += dt.timedelta(
                **{{"h": "hours", "m": "minutes", "s": "seconds"}[unit]: float(num)}
            )
        return total

    cfg = Config(
        export_duration=dur("ExportDuration", dt.timedelta(hours=1)),
        export_delay=dur("ExportDelay", dt.timedelta(hours=24)),
        tmp_dir=raw.get("TmpDir", "tmp"),
        file_prefix=raw.get("FilePrefix", ""),
        include_mobile_apps_fields=raw.get("IncludeMobileAppsFields", False),
        save_as_json=raw.get("SaveAsJson", False),
        storage_only=raw.get("StorageOnly", False),
        group_files_by_day=raw.get("GroupFilesByDay", False),
        segment_id=raw.get("SegmentId", DEFAULT_SEGMENT_ID),
        fs_api_token=raw.get("FsApiToken", ""),
        api_url=raw.get("ApiURL", DEFAULT_API_URL),
    )
    if raw.get("StartTime"):
        cfg.start_time = dt.datetime.fromisoformat(
            str(raw["StartTime"]).replace("Z", "+00:00")
        )
    # provider selection, incl. the deprecated Warehouse rewrite
    # (config/config.go:206-221): local/redshift/bigquery map onto the
    # modern provider names
    provider = str(raw.get("Provider", "")).lower()
    if not provider:
        provider = {
            "local": "local",
            "redshift": "aws",
            "bigquery": "gcp",
        }.get(str(raw.get("Warehouse", "")).lower(), "")
    if provider:
        cfg.provider = provider
    # provider sections verbatim (SaveDir/Bucket/S3Only/GCSOnly...) plus
    # the engine-level extension keys the Spark-native deployment needs:
    # WarehouseDir (where the reference would hold Redshift/BigQuery
    # connection info) and FixtureFile (hermetic export source for
    # offline runs/tests)
    for section in ("local", "s3", "gcs", "redshift", "bigquery"):
        cfg.extra[section] = dict(raw.get(section, {}))
    cfg.extra["warehouse_dir"] = raw.get("WarehouseDir", "spark-warehouse")
    cfg.extra["fixture_file"] = raw.get("FixtureFile", "")
    cfg.partitioned_export = bool(
        raw.get("PartitionedExport", cfg.provider == "gcp")
    )
    # provider-specific StorageOnly rules (config/config.go:225-246):
    # local supports storage only; S3Only/GCSOnly imply StorageOnly
    if cfg.provider == "local":
        cfg.storage_only = True
    elif cfg.provider == "aws":
        cfg.storage_only = cfg.storage_only or bool(
            cfg.extra["s3"].get("S3Only")
        )
    elif cfg.provider == "gcp":
        cfg.storage_only = cfg.storage_only or bool(
            cfg.extra["gcs"].get("GCSOnly")
        )
    # env > TOML > default, pre-validation (config/config.go:154-156)
    env_token = os.environ.get("FULLSTORY_API_TOKEN", "")
    if env_token:
        cfg.fs_api_token = env_token
    return cfg.validate()
