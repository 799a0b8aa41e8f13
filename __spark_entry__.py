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
from hauser_spark.operators import quality as _quality  # noqa: E402
from hauser_spark.operators import similarity as _similarity  # noqa: E402
from hauser_spark.operators import fuzzy as _fuzzy  # noqa: E402
from hauser_spark.operators import graph as _graph  # noqa: E402
from hauser_spark.operators import rangejoin as _rangejoin  # noqa: E402
from hauser_spark.operators import sampling as _sampling  # noqa: E402
from hauser_spark.operators import scd as _scd  # noqa: E402
from hauser_spark.operators import sketches as _sketches  # noqa: E402
from hauser_spark.operators import linkgraph as _linkgraph  # noqa: E402
from hauser_spark.operators import stats as _stats  # noqa: E402
from hauser_spark.operators import text as _text  # noqa: E402
from hauser_spark.operators import urlnorm as _urlnorm  # noqa: E402
from hauser_spark.plans import events as _events  # noqa: E402
from hauser_spark.plans import parity as _parity  # noqa: E402
from hauser_spark.plans import tpch as _tpch  # noqa: E402
from hauser_spark.plans import tpch_extra as _tpch_extra  # noqa: E402
from hauser_spark.plans import tpch_full as _tpch_full  # noqa: E402

# Order matters: the driver's correctness run walks queries() in insertion
# order and stops at a budget (each round covers the first 50 declared).
# _PRIORITY pins the head of the ordering per-query: this round's new
# admissions plus any RESHAPED queries whose old green rows no longer
# certify the current output (keyed into tests/test_entry_order.py's
# STALE_RECHECKS).  The rest of the budget window fills AGE-FIRST
# (VERDICT r10 task 2): after the priority head, queries are ordered by
# the round of their most recent driver check, oldest first, so the
# surplus budget rotates onto the longest-unchecked rows instead of
# re-confirming recently-green families — 13 of the 14 §2 parity
# micro-queries had no driver green newer than round 1 by round 10.
# Staleness is derived from the committed CORRECTNESS_r*.json history,
# so the rotation is self-maintaining round over round.
_PRIORITY: list[str] = [
    # -- new in round 11 (admission recipe per wave) --
    "sim_stale_probe_policy",
    "sim_rebuild_cadence_planner",
    # f2 is the one §2 parity row whose last driver check (r03) is newer
    # than round 1 — pinned so ALL 14 parity micro-queries land inside
    # this round's budget window rather than 13 now + 1 next round.
    "f2_segment_filter",
]


def _last_driver_check() -> dict[str, int]:
    """Round of each query's most recent driver correctness row (green or
    red — a red row still proves the driver LOOKED recently; reds are
    separately forced into _PRIORITY as reshapes).  Never-checked names
    are absent (treated as round 0 = most stale)."""
    import glob
    import json
    import re

    base = os.path.dirname(os.path.abspath(__file__))
    last: dict[str, int] = {}
    rounds = sorted(
        (int(m.group(1)), p)
        for p in glob.glob(os.path.join(base, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    )
    for rnd, path in rounds:
        with open(path) as f:
            for name in json.load(f):
                last[name] = rnd
    return last


def _ordered(merged: dict) -> dict:
    # tie-break within an age group by NAME, not dict position: the
    # per-module QUERIES and ORACLES dicts don't insert keys in the same
    # order everywhere, and queries()/oracle_sql() must walk identically.
    head = {k: merged[k] for k in _PRIORITY if k in merged}
    last = _last_driver_check()
    tail = sorted(
        (k for k in merged if k not in head),
        key=lambda k: (last.get(k, 0), k),
    )
    head.update((k, merged[k]) for k in tail)
    return head


_MODULES = [
    _decontam,
    _dedup,
    _similarity,
    _text,
    _urlnorm,
    _sketches,
    _linkgraph,
    _stats,
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
    _quality,
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
    return _ordered(out)


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return _ordered(out)
