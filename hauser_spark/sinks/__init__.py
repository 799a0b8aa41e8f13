"""Sinks: object storage, CSV serialization, and the warehouse database
surface (warehouse/ of the reference) re-expressed on Spark-managed tables."""

from .storage import LocalStorage  # noqa: F401
from .warehouse import SparkWarehouseDatabase  # noqa: F401
