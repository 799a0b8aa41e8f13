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
# _PRIORITY pins the head of the ordering per-query: round 7 leads with
# the 4 round-6 second-wave queries that have never received a driver
# correctness row, then dedup_band_tradeoff (green in r6 but reshaped in
# round 7: it gained the n_capped_buckets/n_capped_pairs cap-audit
# columns, so the old row no longer certifies it — see
# tests/test_entry_order.STALE_RECHECKS), then this round's new
# admissions in wave order.  Surplus budget falls on green
# re-confirmations, which is free.
_PRIORITY = [
    # -- never driver-checked: round-6 wave 2 --
    "profile_equi_depth_histogram",
    "stats_permutation_test",
    "events_segment_migration",
    "sim_pq_distortion_audit",
    # -- reshaped since its green row (cap-audit columns, round 7) --
    "dedup_band_tradeoff",
    # -- new in round 7 (admission recipe per wave) --
    # wave 1: the VERDICT task-7 trio
    "quality_calibration_curve",
    "text_tokenizer_fertility",
    "dedup_url_canonical_rollup",
    # wave 2: islands, Poisson bootstrap, DSIR, CUPED
    "profile_id_gap_islands",
    "stats_poisson_bootstrap_ci",
    "curation_dsir_weights",
    "stats_cuped_adjustment",
    # wave 3: sequential testing primitives
    "stats_sprt_monitor",
    "stats_srm_check",
    # wave 4: agreement + optimizer-stats profiling
    "quality_rater_kappa",
    "profile_cross_column_ndv",
    # wave 5: data-layout planning
    "profile_zorder_pruning_gain",
    # wave 6: empirical-Bayes rate shrinkage
    "quality_eb_shrunk_rates",
    # wave 7: shuffle-skew planning
    "profile_salting_balance",
    # wave 8: filter knob-tuning, fingerprint agreement, hubness,
    # compaction planning, FDR control
    "quality_filter_ablation_grid",
    "quality_length_threshold_sweep",
    "dedup_method_agreement",
    "sim_hubness_audit",
    "profile_compaction_planner",
    "stats_bh_fdr",
    # wave 9: signature compression, retrieval curve, dup-quality link
    "dedup_bbit_minhash_audit",
    "sim_recall_at_k_sweep",
    "curation_dup_quality_contingency",
    # wave 10: tokenizer size curve, decontam n-gram knob, IVF balance
    "text_vocab_fertility_sweep",
    "decontam_ngram_size_sweep",
    "sim_cell_balance_audit",
    # wave 11: attribution knobs and bloom sizing
    "events_funnel_window_sensitivity",
    "events_attribution_comparison",
    "profile_bloom_size_planner",
    # wave 12: visual-dedup radius knob, freshness SLO
    "mm_phash_threshold_sweep",
    "dq_freshness_slo",
    # wave 13: hub-risk exponent, experiment sizing
    "graph_powerlaw_alpha",
    "stats_sample_size_planner",
    # wave 14: CBO estimator audit, vocab projection, design shootout
    "profile_join_cardinality_audit",
    "text_heaps_projection",
    "sample_allocation_variance",
]


def _ordered(merged: dict) -> dict:
    head = {k: merged[k] for k in _PRIORITY if k in merged}
    head.update((k, v) for k, v in merged.items() if k not in head)
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
