"""Console entrypoint — the reference's ``main`` (main.go:18-39) as
``python -m hauser_spark``:

    python -m hauser_spark -c config.toml
    python -m hauser_spark -version

Wiring order matches the reference exactly: load+validate config →
make storage → make database → make client → service.run().  The only
engine-level additions are ``--max-bundles`` (bounded runs — the
reference loops forever; tests and backfills want a stop condition) and
the ``FixtureFile`` config key (hermetic export source instead of the
REST API, the same LocalFixtureClient the golden-parity suite drives).
"""

from __future__ import annotations

import argparse
import sys

from . import __version__
from .config import Config, load_toml
from .service import HauserService, make_database
from .sinks.storage import make_storage


def make_service(spark, cfg: Config) -> HauserService:
    """MakeStorage/MakeDatabase/NewClient/NewHauser (main.go:33-38)."""
    provider = cfg.provider if cfg.provider in ("local", "aws", "gcp") else "local"
    if provider == "local":
        base = cfg.extra.get("local", {}).get("SaveDir", "export")
        use_start = bool(cfg.extra.get("local", {}).get("UseStartTime", False))
    elif provider == "aws":
        base = cfg.extra.get("s3", {}).get("Bucket", "")
        use_start = False
    else:
        base = cfg.extra.get("gcs", {}).get("Bucket", "")
        use_start = False
    storage = make_storage(spark, provider, base, use_start_time=use_start)

    database = None
    if not cfg.storage_only:
        database = make_database(
            spark, cfg, cfg.extra.get("warehouse_dir", "spark-warehouse")
        )

    fixture = cfg.extra.get("fixture_file", "")
    if fixture:
        from .sources.export_client import LocalFixtureClient

        client = LocalFixtureClient(spark, fixture)
    else:
        from .sources.rest_client import HttpExportTransport, RestExportClient

        client = RestExportClient(
            spark,
            HttpExportTransport(
                cfg.api_url, cfg.fs_api_token, segment_id=cfg.segment_id
            ),
        )
    return HauserService(
        spark=spark,
        config=cfg,
        client=client,
        storage=storage,
        database=database,
    )


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="hauser_spark")
    ap.add_argument(
        "-c", default="config.toml", metavar="FILE", help="configuration file"
    )
    ap.add_argument(
        "-version", "--version", action="store_true", help="print version"
    )
    ap.add_argument(
        "--max-bundles",
        type=int,
        default=None,
        help="stop after N bundles (default: run until caught up, then poll)",
    )
    args = ap.parse_args(argv)

    if args.version:
        print(f"hauser_spark {__version__}")
        return 0

    cfg = load_toml(args.c)

    from .session import build_session

    spark = build_session(app_name="hauser_spark")
    svc = make_service(spark, cfg)
    processed = svc.run(max_bundles=args.max_bundles)
    print(f"processed {processed} bundle(s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
