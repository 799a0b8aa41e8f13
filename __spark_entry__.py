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
from hauser_spark.operators import text as _text  # noqa: E402
from hauser_spark.plans import events as _events  # noqa: E402
from hauser_spark.plans import parity as _parity  # noqa: E402
from hauser_spark.plans import tpch as _tpch  # noqa: E402
from hauser_spark.plans import tpch_extra as _tpch_extra  # noqa: E402
from hauser_spark.plans import tpch_full as _tpch_full  # noqa: E402

# Order matters: the driver's correctness run walks queries() in insertion
# order and stops at a budget (rounds 1 and 2 each covered exactly the
# first 50 declared).  _PRIORITY pins the head of the ordering per-query:
# round 3 front-loads the 41 queries that have never received a driver
# correctness row, then the 6 re-check targets (text_inverted_index's
# array->string fix and the five round-1 hash-fails fixed in round 2),
# then any queries new this round — everything else keeps module order.
_PRIORITY = [
    # -- never driver-checked (41) --
    "range_join_value_bands",
    "basket_pair_cooccurrence",
    "incremental_rollup_merge",
    "diff_table_reconcile",
    "dq_constraint_audit",
    "profile_ks_two_sample",
    "profile_table_columns",
    "profile_join_skew",
    "curate_documents",
    "curation_summary",
    "bloom_semi_join_revenue",
    "mm_metadata_extract",
    "mm_feature_summary",
    "mm_frame_sample",
    "mm_format_sniff",
    "mm_byte_entropy",
    "events_value_percentiles",
    "events_topk_per_user",
    "events_cube_day_type",
    "events_interarrival",
    "events_sliding_windows",
    "events_value_outliers",
    "events_gapfill_hourly",
    "events_value_histogram",
    "events_grouping_sets",
    "events_unpivot_measures",
    "events_cohort_retention",
    "events_moving_avg_7d",
    "events_activity_streaks",
    "events_touch_attribution",
    "events_rolling_distinct_7d",
    "events_sequence_patterns",
    "events_transition_matrix",
    "events_new_vs_returning",
    "events_top_paths",
    "events_max_concurrency",
    "events_cusum_changepoint",
    "events_daily_trend",
    "events_dow_seasonality",
    "events_user_burstiness",
    "f2_segment_filter",
    # -- re-checks: fixed since their red row (6) --
    "text_inverted_index",
    "q12_delay_bands",
    "trimmed_mean_price",
    "top_parts_with_other",
    "events_sessionize",
    "events_pivot_type_by_day",
    # -- new in round 3 --
    "mm_image_decode",
    "quality_gopher_rules",
    "quality_pii_scan",
    # (past the 50-row budget this round; head of round 4's)
    "quality_repetition_ratio",
    "quality_source_cap",
    "sim_pq_adc_topk",
    "sim_pq_recall_audit",
    "text_bigram_surprisal",
    "sketch_histogram_quantiles",
    "sim_matryoshka_topk",
    "sim_matryoshka_recall_audit",
    "events_session_funnel",
    "text_template_detection",
    "text_bpe_train",
    "sim_two_stage_rerank",
    "sim_two_stage_recall_audit",
    "decontam_span_report",
    "corpus_report",
    "mm_audio_pcm_stats",
    "text_bpe_apply",
    "quality_vocab_oov",
    "mm_image_phash",
    "dedup_containment",
    "profile_correlation_matrix",
    "sample_dedup_aware",
    "dq_rowcount_drift",
    "sketch_rolling_distinct_7d",
    "sim_centroid_drift",
    "quality_lang_agreement",
    "curation_effective_tokens",
    "decontam_matrix",
    # re-check: digest reshape in round 3 (collect-bound at 8× as full
    # tables; now bounded artifacts over the identical compute)
    "events_asof_join",
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
