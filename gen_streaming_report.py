#!/usr/bin/env python3
"""Batch-equivalence evidence for the streaming twins (VERDICT r3 #8).

The Structured-Streaming operators (foreachBatch rollup maintenance,
streaming MinHash dedup, streaming corpus statistics, stateful
sessionization, hopping windows, stream-stream interval join, the
incremental bundle loop, and partitioned exactly-once load) are
non-SQL-expressible, so they carry no DuckDB oracle entry — their
correctness contract is equivalence to their batch twins, enforced by
`tests/test_streaming.py`.  This script re-runs exactly that suite and
writes a per-twin pass/fail artifact (STREAMING_r{N}.json) so a judge
can read the evidence without re-running the suite.

Usage: python3 gen_streaming_report.py [round_number]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import xml.etree.ElementTree as ET

HERE = os.path.dirname(os.path.abspath(__file__))

# test -> (streaming operator, batch twin it must equal)
TWINS = {
    "test_streaming_misroute_equals_batch_decay_row": (
        "ingest-maintained stale-index misroute counters (arriving"
        " vectors assigned against the stream_centroid_sums state,"
        " additive (n, n_mis) monoid, epoch-versioned,"
        " streaming/incremental.py:stream_misroute_counters)",
        "batch sim_index_misroute_decay row (n, misroute_stale_ppm) at"
        " the streamed corpus' index age",
    ),
    "test_streaming_funnel_equals_batch_at_buffer": (
        "ingest-maintained funnel conversion chains at a fixed reorder"
        " buffer D (dual-axis pending buffer with finality horizons +"
        " per-(axis, user) chain sufficient statistic, epoch-versioned"
        " state, streaming/incremental.py:stream_funnel_state)",
        "batch events_funnel_under_lateness row at buffer_sec = D"
        " (both buffered counters and event-time truth)",
    ),
    "test_version_gc_keeps_replay_horizon": (
        "versioned-state GC shared by every foreachBatch twin (latest"
        " + predecessor kept, partial dirs untouched,"
        " streaming/incremental.py:_gc_versions)",
        "state-directory robustness case (no batch twin)",
    ),
    "test_streaming_centroids_equal_batch_index": (
        "ingest-maintained IVF coarse-centroid table (per-(label, dim)"
        " integer micro-sum monoids, epoch-versioned state,"
        " streaming/incremental.py:stream_centroid_sums)",
        "batch similarity._structured_centroids of the same corpus"
        " (the FRESH index sim_ivf_staleness_audit prices)",
    ),
    "test_streaming_two_fingerprint_drift_diff_equals_batch": (
        "two ingest-maintained fingerprint states (base + perturbed"
        " streams) diffed state-table-to-state-table"
        " (streaming/incremental.py:diff_fingerprint_states)",
        "batch profile_snapshot_drift events slice (same flags)",
    ),
    "test_streaming_lateness_survives_empty_batch": (
        "empty-micro-batch robustness of the lateness counter state"
        " (coalesced sums + greatest-merged watermark,"
        " streaming/incremental.py:stream_lateness_counters)",
        "batch events_lateness_profile table (unchanged by the empty"
        " batch)",
    ),
    "test_streaming_fingerprint_equals_batch_fingerprint": (
        "streaming drift-fingerprint maintenance (per-event_type"
        " versioned counters, streaming/incremental.py:"
        "stream_drift_fingerprint)",
        "batch profile.drift_fingerprint events slice",
    ),
    "test_streaming_lateness_equals_batch_profile": (
        "streaming watermark/lateness counter maintenance (one-row"
        " versioned state, streaming/incremental.py:"
        "stream_lateness_counters)",
        "batch events_lateness_profile table",
    ),
    "test_streaming_source_volume_equals_batch_card": (
        "streaming dataset-card volume maintenance ((source, lang)-grain"
        " versioned state, streaming/incremental.py:stream_source_volume)",
        "batch curation_dataset_card volume/language/fertility columns",
    ),
    "test_streaming_compaction_stats_equal_batch": (
        "streaming compaction-planner maintenance (day-grain versioned"
        " state, streaming/incremental.py:stream_partition_stats)",
        "batch profile_compaction_planner table",
    ),
    "test_streaming_url_frontier_matches_batch_rollup": (
        "streaming canonical-URL frontier dedup (canonicalize +"
        " dropDuplicatesWithinWatermark, streaming/incremental.py)",
        "batch dedup_url_canonical_rollup n_canonical per domain",
    ),
    "test_streaming_bundle_counts_match_batch": (
        "readStream bundle loop (streaming/incremental.py:run_streaming)",
        "batch service loop bundle counts (service.process_next)",
    ),
    "test_streaming_dedup_drops_duplicates": (
        "dropDuplicates within watermark (streaming/incremental.py)",
        "batch exact dedup on the same records",
    ),
    "test_streaming_stateful_sessionize": (
        "applyInPandasWithState sessionization",
        "batch gap-based sessionize (plans/events.py:sessionize)",
    ),
    "test_streaming_hopping_counts_match_batch": (
        "streaming hopping-window counts (1h by 15min)",
        "batch hopping windows (plans/events.py)",
    ),
    "test_stream_stream_interval_join_matches_batch": (
        "watermark-bounded stream-stream interval join",
        "batch range-predicate join over the same streams",
    ),
    "test_streaming_partitioned_load_exactly_once": (
        "foreachBatch day-partitioned load with W6 repair",
        "exactly-once partition state after crash/replay",
    ),
    "test_streaming_rollup_merge_equals_batch": (
        "foreachBatch rollup maintenance on versioned epoch state",
        "one-shot batch rollup (operators/incremental.py:merge_rollups)",
    ),
    "test_streaming_minhash_dedup_matches_batch_and_grows": (
        "streaming MinHash dedup vs growing at-rest band index",
        "batch incremental_minhash_dedup over the same corpus",
    ),
    "test_streaming_cdc_compaction_equals_batch": (
        "foreachBatch CDC latest-wins compaction"
        " (streaming/incremental.py:stream_cdc_compaction)",
        "batch cdc_log_compaction digest (operators/merge.py)",
    ),
    "test_streaming_corpus_stats_equals_batch": (
        "streaming corpus-statistics maintenance (epoch-versioned KMV)",
        "batch per-source corpus stats (same algebraic partials)",
    ),
    "test_streaming_hll_registers_equal_batch": (
        "streaming HLL register maintenance (pairwise register max)",
        "batch hll_register_partials (operators/sketches.py)",
    ),
    "test_streaming_psi_cells_equal_batch": (
        "streaming PSI drift-cell maintenance (versioned count sum)",
        "batch psi_drift cell bucketing (operators/profile.py)",
    ),
    "test_streaming_cms_cells_equal_batch": (
        "streaming count-min sketch maintenance (versioned cell sum)",
        "batch cms_heavy_hitters sketch cells (operators/sketches.py)",
    ),
}


def main() -> None:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    xml_path = os.path.join(HERE, ".streaming_junit.xml")
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "pytest",
            "tests/test_streaming.py",
            "-q",
            "--tb=line",
            f"--junitxml={xml_path}",
        ],
        cwd=HERE,
        capture_output=True,
        text=True,
    )
    suite = ET.parse(xml_path).getroot().find("testsuite")
    twins = {}
    for case in suite.iter("testcase"):
        name = case.get("name")
        failed = case.find("failure") is not None or case.find("error") is not None
        op, batch = TWINS.get(name, (name, "?"))
        twins[name] = {
            "streaming_operator": op,
            "batch_twin": batch,
            "status": "fail" if failed else "pass",
            "time_sec": round(float(case.get("time", "0")), 1),
        }
    out = {
        "metric": "streaming_batch_equivalence",
        "suite": "tests/test_streaming.py",
        "n_twins": len(twins),
        "n_pass": sum(1 for t in twins.values() if t["status"] == "pass"),
        "pytest_exit": proc.returncode,
        "twins": twins,
    }
    path = os.path.join(HERE, f"STREAMING_r{rnd:02d}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    os.unlink(xml_path)
    print(json.dumps({k: out[k] for k in ("n_twins", "n_pass", "pytest_exit")}))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
