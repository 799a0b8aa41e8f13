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
from hauser_spark.plans import events as _events  # noqa: E402
from hauser_spark.plans import parity as _parity  # noqa: E402
from hauser_spark.plans import tpch as _tpch  # noqa: E402
from hauser_spark.plans import tpch_extra as _tpch_extra  # noqa: E402
from hauser_spark.plans import tpch_full as _tpch_full  # noqa: E402

# Order matters: the driver's correctness run walks queries() in insertion
# order and stops at a budget (each round covers the first 50 declared).
# _PRIORITY pins the head of the ordering per-query: round 6 front-loads
# the 42 queries that have never received a driver correctness row (the
# round-5 wave-5 tail plus waves 6-16, all green in the local driver-gate
# mirror tests/test_oracle_parity.py), clearing the catalog's driver-row
# debt with 8 budget slots to spare; those slots take this round's new
# admissions in order.
_PRIORITY = [
    # -- never driver-checked: round-5 wave-5 tail (6) --
    "text_stopword_profile",
    "stats_runs_test_revenue",
    "profile_numeric_histogram",
    "sketch_linear_counting",
    "curation_lang_balance",
    "dedup_shingle_df_profile",
    # -- never driver-checked: round-5 wave 6 --
    "profile_psi_drift",
    "curation_temperature_resample",
    "dedup_levenshtein_band",
    "stats_jarque_bera",
    "events_user_entropy",
    "sim_silhouette_audit",
    # -- wave 7 --
    "sketch_hll_daily_union",
    "stats_anova_oneway",
    "stats_hill_tail_index",
    "text_simpson_diversity",
    "profile_candidate_keys",
    "events_click_purchase_xcorr",
    # -- wave 8 --
    "text_coverage_curve",
    "text_js_divergence",
    "events_conversion_lag",
    "stats_cohens_d_pairs",
    # -- wave 9 --
    "dedup_cdc_chunks",
    "stats_levene_bf",
    "events_pareto_cuts",
    "sample_rate_audit",
    "sim_pca_power_iteration",
    # -- wave 11 --
    "sim_nprobe_recall_sweep",
    "events_retention_decay_fit",
    "events_funnel_ttc",
    "stats_power_mde",
    # -- wave 12 --
    "sample_group_kfold",
    "profile_decimal_audit",
    "sketch_quantile_merge_audit",
    "events_dau_wau_stickiness",
    # -- wave 13 --
    "sim_centroid_shift_drift",
    "quality_mixture_shift",
    # -- wave 14 --
    "dedup_band_tradeoff",
    "events_revenue_drawdown",
    # -- wave 15 --
    "stats_theil_decomposition",
    "sample_neyman_allocation",
    "events_cohort_ltv_curve",
    # -- new in round 6 (budget slots 43-50; admission recipe per wave) --
    "stats_kruskal_wallis",
    "stats_welch_ttest",
    "stats_gini_lorenz",
    "events_markov_entropy_rate",
    "graph_edge_embeddedness",
    "sketch_hll_precision_sweep",
    "decontam_minhash_fuzzy",
    "sample_ipf_raking",
    # -- round-6 wave 2 (positions 51+: overflow, heads round 7's budget) --
    "profile_equi_depth_histogram",
    "stats_permutation_test",
    "events_segment_migration",
    "sim_pq_distortion_audit",
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
