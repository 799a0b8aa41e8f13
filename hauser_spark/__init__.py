"""hauser_spark — a PySpark-native analytics engine with the capabilities of
fullstorydev/hauser, rebuilt Spark-first.

The reference (read-only at /root/reference) is an incremental ETL service:
windowed export scan -> per-record transform (projection + custom-vars pivot)
-> CSV serialize -> object storage -> warehouse bulk load, with sync-point
checkpointing and exactly-once crash repair (see SURVEY.md).

This package re-expresses those semantics on Spark DataFrames:

- ``hauser_spark.schema``    — export schema + reconciliation (warehouse/schema.go)
- ``hauser_spark.transform`` — the record transform as Catalyst expressions
                               (internal/service.go:72-119)
- ``hauser_spark.windows``   — bundle window math (internal/service.go:269-294)
- ``hauser_spark.sync``      — checkpoint read/write (warehouse/warehouse.go:74-107)
- ``hauser_spark.service``   — the incremental driver loop (internal/service.go:362-378)
- ``hauser_spark.sources``   — export-client connectors (client/)
- ``hauser_spark.sinks``     — storage + warehouse writers (warehouse/)
- ``hauser_spark.operators`` — large-scale analytics extensions: dedup,
                               similarity search, text analysis, multimodal.
"""

__version__ = "0.1.0"
