"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` / ``oracle_sql()`` — per-operator correctness gate; the driver
runs each Spark query against its DuckDB oracle at sf0.01 and compares
row-count + schema + order-insensitive value hash.

Query implementations live in ``hauser_spark.plans.*`` (TPC-H-shape
analytics, SURVEY §2 operator inventory, event analytics) and
``hauser_spark.operators.*`` (dedup, similarity, text, multimodal); each
module exports matching QUERIES/ORACLES dicts merged here.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hauser_spark.operators import basket as _basket  # noqa: E402
from hauser_spark.operators import bloomjoin as _bloomjoin  # noqa: E402
from hauser_spark.operators import curation as _curation  # noqa: E402
from hauser_spark.operators import decontam as _decontam  # noqa: E402
from hauser_spark.operators import dedup as _dedup  # noqa: E402
from hauser_spark.operators import diff as _diff  # noqa: E402
from hauser_spark.operators import dq as _dq  # noqa: E402
from hauser_spark.operators import incremental as _incremental  # noqa: E402
from hauser_spark.operators import merge as _merge  # noqa: E402
from hauser_spark.operators import multimodal as _multimodal  # noqa: E402
from hauser_spark.operators import profile as _profile  # noqa: E402
from hauser_spark.operators import similarity as _similarity  # noqa: E402
from hauser_spark.operators import fuzzy as _fuzzy  # noqa: E402
from hauser_spark.operators import graph as _graph  # noqa: E402
from hauser_spark.operators import rangejoin as _rangejoin  # noqa: E402
from hauser_spark.operators import sampling as _sampling  # noqa: E402
from hauser_spark.operators import scd as _scd  # noqa: E402
from hauser_spark.operators import sketches as _sketches  # noqa: E402
from hauser_spark.operators import text as _text  # noqa: E402
from hauser_spark.plans import events as _events  # noqa: E402
from hauser_spark.plans import parity as _parity  # noqa: E402
from hauser_spark.plans import tpch as _tpch  # noqa: E402
from hauser_spark.plans import tpch_extra as _tpch_extra  # noqa: E402
from hauser_spark.plans import tpch_full as _tpch_full  # noqa: E402

# Order matters: the driver's correctness run walks queries() in insertion
# order and stops at a budget (round 1 covered exactly the first 50 of 129).
# Modules whose queries have never received a driver correctness row go
# FIRST so each round widens external verification; the families fully
# checked in round 1 (tpch*, parity) go last.
_MODULES = [
    _decontam,
    _dedup,
    _similarity,
    _text,
    _sketches,
    _sampling,
    _graph,
    _fuzzy,
    _merge,
    _scd,
    _rangejoin,
    _basket,
    _incremental,
    _diff,
    _dq,
    _profile,
    _curation,
    _bloomjoin,
    _multimodal,
    _events,
    _parity,
    _tpch,
    _tpch_extra,
    _tpch_full,
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _tpch.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable] = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return out
