"""Source connectors: the DataExportClient surface of the reference
(client/client.go:30-44) re-expressed as DataFrame producers."""

from .export_client import DataExportClient, LocalFixtureClient  # noqa: F401
