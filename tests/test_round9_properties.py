"""Round-9 property tests.

Covers the ADVICE-r8 rankops fixes (plan-audit barrier escape, integer
ntile) and the round's new operators as they land.
"""

import pytest
from pyspark.sql import functions as F

from hauser_spark import rankops


# --------------------------------------------- rankops barrier escape


def test_no_checkpoint_barrier_exposes_upstream_plan(spark, sf_oracle):
    """ADVICE r8 (medium): global_rank's localCheckpoint truncates the
    logical plan to a LogicalRDD, blinding executedPlan audits to every
    operator upstream of a rank.  The no_checkpoint_barrier context must
    restore full visibility: the parquet scan feeding the rank is
    invisible with the barrier and visible without it."""
    from hauser_spark.tables import load_table

    def ranked():
        docs = load_table(spark, sf_oracle, "documents").select(
            "doc_id", F.length("text").alias("v")
        )
        return rankops.global_rank(docs, "v", "doc_id")

    barriered = ranked()._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" not in barriered  # the blindness being fixed
    assert "ExistingRDD" in barriered or "LogicalRDD" in barriered

    with rankops.no_checkpoint_barrier():
        audited = ranked()._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" in audited
    # the flag restores itself on exit (and is thread-local: a
    # concurrent builder thread never sees the audit's suppression)
    assert not rankops._no_barrier()
    import threading

    seen = {}
    with rankops.no_checkpoint_barrier():
        t = threading.Thread(
            target=lambda: seen.update(off=rankops._no_barrier())
        )
        t.start()
        t.join()
    assert seen == {"off": False}
    sub = ranked()._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" not in sub


def test_no_checkpoint_barrier_preserves_results(spark, sf_oracle):
    """Skipping the barrier is a pure execution-strategy change: rank
    and running-sum values must be bit-identical either way."""
    from hauser_spark.tables import load_table

    def ranked():
        docs = load_table(spark, sf_oracle, "documents").select(
            "doc_id", F.length("text").alias("v")
        )
        return (
            rankops.global_rank(
                docs, "v", "doc_id", running_sum_col="v"
            )
            .orderBy("doc_id")
            .limit(200)
        )

    with_barrier = [tuple(r) for r in ranked().collect()]
    with rankops.no_checkpoint_barrier():
        without = [tuple(r) for r in ranked().collect()]
    assert with_barrier == without


# --------------------------------------------- integer-exact ntile


@pytest.mark.parametrize("n,q", [(1, 4), (7, 4), (8, 4), (9, 4), (100, 7)])
def test_ntile_from_rank_matches_sql_ntile(spark, n, q):
    """The integer-DIV fill rule must equal SQL ntile(q) for every rank
    1..n (the contract the RFM oracle freezes)."""
    df = spark.range(1, n + 1).select(
        F.col("id").alias("r"), F.lit(n).cast("long").alias("n")
    )
    got = {
        r.r: r.t
        for r in df.select(
            "r", rankops.ntile_from_rank("r", "n", q).alias("t")
        ).collect()
    }
    expect = {}
    size, rem = n // q, n % q
    r = 1
    for b in range(1, q + 1):
        for _ in range(size + (1 if b <= rem else 0)):
            expect[r] = b
            r += 1
    assert got == expect


# ----------------------------------- SemDeDup keep-farthest policy


def test_semdedup_keep_farthest_diverges_from_min_id(spark, tmp_path):
    """VERDICT r8 task 4: the representative policy must change WHICH
    doc survives.  Planted cluster: v1 points near the centroid and
    pairs with both v2 and v3 (v2-v3 are not a pair), so keep-min-id
    drops {v2, v3} (n_dropped = 2 at every tau) while keep-farthest
    drops only v1, the centroid-nearest member (n_dropped_far = 1)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hauser_spark.operators.similarity import semdedup_tau_sweep

    # cos(v1,v2) = 0.8, cos(v1,v3) = 0.5, cos(v2,v3) = -0.12 (< all
    # taus); v1 is double-length so the centroid tilts toward it
    vecs = [
        (1, [2.0, 0.0], 0),
        (2, [0.8, 0.6], 0),
        (3, [0.5, -0.8660254], 0),
    ]
    tbl = pa.table(
        {
            "vec_id": pa.array([v[0] for v in vecs], pa.int64()),
            "embedding": pa.array(
                [v[1] for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array([v[2] for v in vecs], pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    rows = semdedup_tau_sweep(spark, str(tmp_path)).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.n_pairs == 2, r
        assert r.n_dropped == 2, r  # min-id drops d2 of both pairs
        assert r.n_dropped_far == 1, r  # farthest keeps v2 AND v3
        assert r.n_kept == 1 and r.n_kept_far == 2, r


def test_ntile_from_rank_exact_beyond_double_precision(spark):
    """ADVICE r8 (low): double-division truncation drifts past 2^53.
    With n near 2^60 the integer-DIV rule must still place boundary
    ranks exactly.  Checks the first bucket's upper boundary: rank =
    size+1 (where size = n DIV q) belongs to bucket 2 when rem == 0."""
    n = (1 << 60) + 8  # n % 4 == 0 at this value? 2^60 divisible by 4, +8 too
    q = 4
    size = n // q
    rows = [(size, n), (size + 1, n), (2 * size, n), (2 * size + 1, n)]
    df = spark.createDataFrame(rows, "r long, n long")
    got = {
        r.r: r.t
        for r in df.select(
            "r", rankops.ntile_from_rank("r", "n", q).alias("t")
        ).collect()
    }
    assert got == {size: 1, size + 1: 2, 2 * size: 2, 2 * size + 1: 3}


# ------------------------------------- global running max (watermark)


def test_global_running_max_equals_naive_window(spark, sf_oracle):
    """The bucket decomposition must reproduce the partition-less
    MAX ... ROWS UNBOUNDED PRECEDING AND 1 PRECEDING exactly, on the
    real jittered arrival frame (which is genuinely out of order)."""
    from pyspark.sql import Window

    from hauser_spark.plans.events import events_with_arrival
    from hauser_spark.rankops import global_running_max

    ev = events_with_arrival(spark, sf_oracle)
    got = {
        r.event_id: r.wm
        for r in global_running_max(
            ev, "arrival_us", "event_id", "ts_us", name="wm"
        ).collect()
    }
    w = Window.orderBy("arrival_us", "event_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    want = {
        r.event_id: r.wm
        for r in ev.withColumn("wm", F.max("ts_us").over(w)).collect()
    }
    assert got == want
    # the fixture is genuinely out of order: some events are late
    assert any(
        v is not None for v in got.values()
    )


def test_lateness_profile_is_nonvacuous(spark, sf_oracle):
    """The jittered arrival column must actually disorder the stream:
    at allowed lateness 0 a majority of events are late, and the
    counters are monotone nonincreasing in the allowed lateness."""
    from hauser_spark.plans.events import lateness_profile

    rows = lateness_profile(spark, sf_oracle).collect()
    assert rows[0].allowed_sec == 0 and rows[0].n_late > 0
    lates = [r.n_late for r in rows]
    assert lates == sorted(lates, reverse=True)
    assert rows[0].max_late_sec > 0


# ------------------------------------- cross-run drift harness


def test_snapshot_drift_flags_exactly_the_plants(spark, sf_oracle):
    """VERDICT r8 task 6: the drift table must flag the six planted
    (segment, stat) perturbations — click row-drop (n, sum_cents),
    purchase null-injection (null_value_ppm, sum_cents), src7 feed
    break (n, sum_chars) — and NOTHING else: unperturbed integer
    fingerprints diff to exactly zero."""
    from hauser_spark.operators.profile import snapshot_drift

    rows = snapshot_drift(spark, sf_oracle).collect()
    flagged = {(r.tbl, r.seg, r.stat) for r in rows if r.flagged}
    assert flagged == {
        ("events", "click", "n"),
        ("events", "click", "sum_cents"),
        ("events", "purchase", "null_value_ppm"),
        ("events", "purchase", "sum_cents"),
        ("documents", "src7", "n"),
        ("documents", "src7", "sum_chars"),
    }
    # every unflagged stat drifted by exactly zero (determinism, not
    # threshold generosity, is what keeps the false-positive rate 0)
    assert all(r.drift_ppm == 0 for r in rows if not r.flagged)


# ------------------------------------- window completeness ladder


def test_window_completeness_is_monotone_and_saturates(spark, sf_oracle):
    """Completeness must rise monotonically with the emission delay and
    saturate at exactly 100% once the delay covers the max jitter
    (ARRIVAL_JITTER_SEC): no event can arrive later than that."""
    from hauser_spark.plans.events import (
        ARRIVAL_JITTER_SEC,
        window_completeness,
    )

    rows = window_completeness(spark, sf_oracle).collect()
    on_time = [r.n_on_time for r in rows]
    assert on_time == sorted(on_time)
    complete = [r.n_windows_complete for r in rows]
    assert complete == sorted(complete)
    last = rows[-1]
    assert last.delay_sec >= ARRIVAL_JITTER_SEC
    assert last.n_on_time == last.n_events
    assert last.n_windows_complete == last.n_windows
    # non-vacuous: at delay 0 some windows are incomplete
    assert rows[0].n_windows_complete < rows[0].n_windows


# ------------------------------------- hard-negative mining


def test_hard_negatives_outrank_remaining_negatives(spark, sf_oracle):
    """Every anchor yields exactly HN_K negatives, none sharing the
    anchor's label, ranked by descending cosine; the rank-1 negative's
    margin is the largest margin in its anchor group."""
    from hauser_spark.operators.similarity import (
        HN_K,
        N_QUERIES,
        hard_negative_mining,
        _load_embeddings,
    )

    rows = hard_negative_mining(spark, sf_oracle).collect()
    labels = {
        r.vec_id: r.label
        for r in _load_embeddings(spark, sf_oracle)
        .filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "label")
        .collect()
    }
    by_q = {}
    for r in rows:
        by_q.setdefault(r.q_id, []).append(r)
    assert set(by_q) == set(labels)
    for q, grp in by_q.items():
        assert [g.rank for g in grp] == list(range(1, HN_K + 1))
        assert all(g.neg_label != labels[q] for g in grp)
        cs = [g.cos_ppm for g in grp]
        assert cs == sorted(cs, reverse=True)
        ms = [g.margin_ppm for g in grp]
        assert ms[0] == max(ms)


# ------------------------------------- redelivery TTL planner


def test_redelivery_ttl_saturates_at_max_lag(spark, sf_oracle):
    """Caught counts are monotone in TTL and exactly complete at the
    3600 s ceiling (lags are planted in 1..3600); roughly 1 in 20
    events is a duplicate."""
    from hauser_spark.plans.events import redelivery_ttl_planner

    rows = redelivery_ttl_planner(spark, sf_oracle).collect()
    caught = [r.n_caught for r in rows]
    assert caught == sorted(caught)
    assert rows[-1].n_caught == rows[-1].n_dupes
    assert rows[-1].n_leaked == 0
    n, d = rows[0].n_events, rows[0].n_dupes
    assert 0.03 * n < d < 0.08 * n


# ------------------------------------- prototypicality pruning


def test_prototypicality_policies_diverge(spark, sf_oracle):
    """Both policies keep identical counts (the keep rule is a per-
    cluster rank cutoff) but opposite ends of the prototypicality
    scale: at every keep fraction the easy-keep mean centroid
    similarity strictly exceeds the hard-keep mean, and kept counts
    are monotone in keep_pct."""
    from hauser_spark.operators.similarity import prototypicality_pruning

    rows = prototypicality_pruning(spark, sf_oracle).collect()
    by_pct = {}
    for r in rows:
        by_pct.setdefault(r.keep_pct, {})[r.policy] = r
    assert set(by_pct) == {25, 50, 75}
    prev_n = 0
    for pct in (25, 50, 75):
        easy, hard = by_pct[pct]["easy"], by_pct[pct]["hard"]
        assert easy.n_kept == hard.n_kept > prev_n
        assert easy.kept_cs_mean_ppm > hard.kept_cs_mean_ppm
        prev_n = easy.n_kept


# ------------------------------------- sessionization impact


def test_sessionization_impact_is_nonvacuous_and_bounded(spark, sf_oracle):
    """Out-of-order arrival must actually move session boundaries for
    a nontrivial share of users, and both sessionizations count at
    least one session per user."""
    from hauser_spark.plans.events import lateness_sessionization_impact

    r = lateness_sessionization_impact(spark, sf_oracle).collect()[0]
    assert r.n_users_diff > 0
    assert r.n_sessions_event_time >= r.n_users
    assert r.n_sessions_arrival_time >= r.n_users
    assert 0 < r.users_diff_ppm < 1_000_000


# ------------------------------------- watermark state-size cost


def test_watermark_state_residency_tracks_delay(spark, sf_oracle):
    """State row-seconds and mean residency must rise monotonically
    with the allowed lateness, and the D=0 mean residency must sit
    near the window width (a state row lives from first arrival to
    the watermark passing window end): the physics the capacity table
    exists to expose."""
    from hauser_spark.plans.events import (
        COMPLETENESS_WINDOW_US,
        watermark_state_size,
    )

    rows = watermark_state_size(spark, sf_oracle).collect()
    res = [r.state_row_sec for r in rows]
    assert res == sorted(res)
    assert all(r.state_row_sec > 0 for r in rows)
    peaks = [r.max_open_windows for r in rows]
    assert peaks == sorted(peaks)
    # created-row count never falls as the allowed lateness grows
    nw = [r.n_windows for r in rows]
    assert nw == sorted(nw)
    w_sec = COMPLETENESS_WINDOW_US // 1_000_000
    assert 0.5 * w_sec < rows[0].mean_residency_sec < 1.5 * w_sec
    # the D=3600 mean residency carries the extra hour
    assert rows[-1].mean_residency_sec > rows[0].mean_residency_sec + 3000


def test_watermark_state_all_late_exclusion_non_vacuous(spark, sf_smoke):
    """On the SPARSE sf0.001 stream some windows' events all arrive
    after the watermark passed window_end + D=0 — those windows never
    create state rows (their events are the dropped-late population),
    so the D=0 created-row count must sit strictly below the saturated
    tail and residency must stay positive (the pre-fix symptom was
    negative row-seconds from evict_at < first_arr)."""
    from hauser_spark.plans.events import watermark_state_size

    rows = watermark_state_size(spark, sf_smoke).collect()
    assert all(r.state_row_sec > 0 for r in rows)
    nw = [r.n_windows for r in rows]
    assert nw == sorted(nw) and nw[0] < nw[-1]


# ------------------------------------- reorder-buffer curve


def test_reorder_buffer_saturates_at_max_jitter(spark, sf_oracle):
    """A buffer covering the max jitter restores event-time truth
    exactly (zero users differ, buffered session total equals the
    truth); below it, a nontrivial share of users still differ."""
    from hauser_spark.plans.events import (
        ARRIVAL_JITTER_SEC,
        reorder_buffer_curve,
    )

    rows = reorder_buffer_curve(spark, sf_oracle).collect()
    assert rows[-1].buffer_sec >= ARRIVAL_JITTER_SEC
    assert rows[-1].n_users_diff == 0
    assert rows[-1].n_sessions_buffered == rows[-1].n_sessions_true
    assert rows[0].n_users_diff > 0


def test_keyed_state_dominates_window_grain(spark, sf_oracle):
    """Keyed state rows = windows x types present; at every delay the
    keyed peak and row-seconds dominate the window-grain audit, and the
    keyed mean residency is SHORTER than the window's (a key's row is
    created at the key's first arrival, never earlier)."""
    from hauser_spark.plans.events import (
        keyed_state_size,
        watermark_state_size,
    )

    keyed = {r.delay_sec: r for r in keyed_state_size(spark, sf_oracle).collect()}
    win = {
        r.delay_sec: r for r in watermark_state_size(spark, sf_oracle).collect()
    }
    assert set(keyed) == set(win)
    for d in keyed:
        assert keyed[d].n_state_rows >= win[d].n_windows
        assert keyed[d].max_open_rows >= win[d].max_open_windows
        assert keyed[d].state_row_sec >= win[d].state_row_sec
        assert keyed[d].mean_residency_sec <= win[d].mean_residency_sec


# ------------------------------------- DSIR effective sample size


def test_dsir_ess_bounds_and_consistency(spark, sf_oracle):
    """ESS/n lies in (1/n, 1]; the top-weight share is at least 1/n and
    at most 1; and the fixture's weight spread is real (ESS strictly
    below n for every language — near-uniform weights would make the
    audit vacuous)."""
    from hauser_spark.operators.curation import dsir_ess

    rows = dsir_ess(spark, sf_oracle).collect()
    assert len(rows) >= 2
    for r in rows:
        assert 0 < r.ess_ratio_ppm <= 1_000_000
        assert r.ess_ratio_ppm < 999_000  # genuinely non-uniform
        lo = 1_000_000 // r.n_docs
        assert lo <= r.top_weight_share_ppm <= 1_000_000
