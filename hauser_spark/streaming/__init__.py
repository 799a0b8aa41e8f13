"""Structured Streaming surface: the reference's incremental loop (W1-W3)
as a real streaming query, for deployments that want push-based ingestion
instead of the batch driver loop."""

from .incremental import (  # noqa: F401
    bootstrap_minhash_index,
    merge_corpus_stats,
    read_corpus_stats,
    read_dedup_decisions,
    stream_corpus_stats,
    stream_bundle_counts,
    stream_click_purchase_join,
    stream_dedup_events,
    stream_documents,
    stream_events,
    read_rollup_state,
    stream_hopping_counts,
    stream_minhash_dedup,
    stream_partitioned_load,
    stream_rollup_merge,
    stream_cdc_compaction,
    merge_compaction,
    stream_sessionize,
    stream_hll_registers,
    read_hll_registers,
    stream_psi_cells,
    read_psi_cells,
    stream_cms_cells,
    read_cms_cells,
    stream_partition_stats,
    read_partition_stats,
    stream_source_volume,
    read_source_volume,
)
