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
# _PRIORITY pins the head of the ordering per-query: round 4 front-loads
# the 28 round-3-continuation queries that have never received a driver
# correctness row, then the one stale re-check (events_asof_join's r1 row
# predates its round-3 bounded-digest reshape), then the 21 queries new
# this round — exactly the 50-row budget.  The further 9 round-4
# operators (hll / energy-flux / ppl-curve / kcore / skyline / holt /
# phash-radius / link-prediction / decayed-leaderboard) keep module
# order past the window and head round 5's budget.  Cumulative
# driver-green after this batch: 193/202.
_PRIORITY = [
    # -- never driver-checked (28, staged at the end of round 3) --
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
    # -- re-check: digest reshape in round 3 (collect-bound at 8× as full
    # tables; now bounded artifacts over the identical compute) --
    "events_asof_join",
    # -- new in round 4 (each passes the local oracle gate on admission) --
    "dedup_containment_lsh",
    "events_feature_snapshot",
    "graph_pagerank",
    "graph_triangles_clustering",
    "graph_degree_histogram",
    "stats_chi_square_type_dow",
    "stats_mutual_information",
    "stats_bootstrap_ci_mean",
    "profile_fk_inclusion",
    "text_pmi_collocations",
    "quality_k_anonymity",
    "cdc_log_compaction",
    "sketch_theta_set_ops",
    "events_seasonal_decompose",
    "sim_dedup_threshold_sweep",
    "curation_shard_skew",
    "stats_ols_value_model",
    "stats_two_proportion_ztest",
    "mm_scene_cuts",
    "graph_label_propagation",
    "sim_kmeans_lloyd",
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
