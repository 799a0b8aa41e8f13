"""Invariant tests for the round-5 continuation waves (6-12) — the
properties an oracle value-hash cannot express: monotonicity, bounds,
symmetry, and conservation laws of the new operators."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def q(spark):
    return {
        name: fn
        for name, fn in entry.queries().items()
    }


def _rows(q, spark, name):
    return q[name](spark, SF).collect()


def test_psi_nonnegative(spark, q):
    for r in _rows(q, spark, "profile_psi_drift"):
        assert r.psi >= 0.0


def test_temperature_resample_flattens(spark, q):
    rows = _rows(q, spark, "curation_temperature_resample")
    # α<1 boosts below-average sources and shrinks above-average ones;
    # shares stay a distribution
    assert abs(sum(r.temp_ppm for r in rows) - 1_000_000) < len(rows)
    for r in rows:
        if r.natural_ppm * len(rows) < 1_000_000:
            assert r.boost >= 1.0
        elif r.natural_ppm * len(rows) > 1_000_000:
            assert r.boost <= 1.0


def test_levenshtein_band_bounds(spark, q):
    for r in _rows(q, spark, "dedup_levenshtein_band"):
        assert 0 <= r.near_pairs <= r.n_pairs
        assert r.min_dist * r.n_pairs <= r.sum_dist


def test_jarque_bera_shape(spark, q):
    (r,) = _rows(q, spark, "stats_jarque_bera")
    assert r.jb_stat >= 0.0
    assert r.reject_normal in (0, 1)
    assert (r.jb_stat > 5.991465) == bool(r.reject_normal)


def test_user_entropy_bounds(spark, q):
    import math

    for r in _rows(q, spark, "events_user_entropy"):
        assert -1e-6 <= r.entropy_nats <= math.log(r.n_types) + 1e-6


def test_silhouette_range(spark, q):
    for r in _rows(q, spark, "sim_silhouette_audit"):
        assert -1.0 <= r.silhouette <= 1.0


def test_hll_daily_union_lossless(spark, q):
    (r,) = _rows(q, spark, "sketch_hll_daily_union")
    assert r.merge_lossless == 1
    assert r.union_est == r.direct_est


def test_quantile_merge_lossless_and_monotone(spark, q):
    rows = _rows(q, spark, "sketch_quantile_merge_audit")
    assert all(r.merge_lossless == 1 for r in rows)
    bounds = [r.upper_bound_dollars for r in rows]
    assert bounds == sorted(bounds)


def test_anova_levene_nonnegative(spark, q):
    (a,) = _rows(q, spark, "stats_anova_oneway")
    (w,) = _rows(q, spark, "stats_levene_bf")
    assert a.f_stat >= 0.0 and w.w_stat >= 0.0
    assert a.ss_between >= 0.0 and a.ss_within >= 0.0


def test_hill_tail_positive(spark, q):
    (r,) = _rows(q, spark, "stats_hill_tail_index")
    assert r.gamma_hill > 0.0 and r.alpha_tail > 0.0
    assert r.k >= 5


def test_simpson_vs_vocab(spark, q):
    for r in _rows(q, spark, "text_simpson_diversity"):
        # the UNBIASED collision estimator Σc(c−1)/(n(n−1)) may
        # undershoot the biased Σ(c/n)² by O(1/n), so its inverse can
        # exceed the vocabulary by the same small-sample slack
        assert 1.0 <= r.inv_simpson <= r.vocab * (1 + 2.0 / r.n_tokens) + 1
        assert 0.0 <= r.simpson_d <= 1.0


def test_candidate_keys_verdicts(spark, q):
    rows = {
        (r.table_name, r.column_name): r
        for r in _rows(q, spark, "profile_candidate_keys")
    }
    assert rows[("orders", "o_orderkey")].is_key == 1
    assert rows[("orders", "o_custkey")].is_key == 0
    # NB: the driver's synthetic lineitem does NOT keep the TPC-H
    # (l_orderkey, l_linenumber) composite unique — the audit itself
    # discovered that, which is exactly its job; assert consistency,
    # not the TPC-H schema's promise
    for r in rows.values():
        assert r.n_distinct <= r.n_rows
        assert r.is_key == (1 if r.n_distinct == r.n_rows else 0)


def test_xcorr_bounds_and_symmetric_pairs(spark, q):
    rows = _rows(q, spark, "events_click_purchase_xcorr")
    assert len(rows) == 7
    for r in rows:
        assert -1.0 - 1e-9 <= r.xcorr <= 1.0 + 1e-9


def test_coverage_curve_monotone(spark, q):
    rows = _rows(q, spark, "text_coverage_curve")
    cov = [r.coverage_ppm for r in rows]
    assert cov == sorted(cov)
    assert cov[-1] <= 1_000_000


def test_jsd_bounds(spark, q):
    rows = _rows(q, spark, "text_js_divergence")
    n_langs = len({r.lang_a for r in rows} | {r.lang_b for r in rows})
    assert len(rows) == n_langs * (n_langs - 1) // 2
    for r in rows:
        assert -1e-9 <= r.jsd_bits <= 1.0 + 1e-9


def test_conversion_lag_nonnegative(spark, q):
    for r in _rows(q, spark, "events_conversion_lag"):
        assert r.lag_days >= 0 and r.n_users > 0


def test_cohens_d_matches_anova_inputs(spark, q):
    rows = _rows(q, spark, "stats_cohens_d_pairs")
    assert len(rows) == 10  # C(5,2) event-type pairs
    for r in rows:
        assert r.pooled_sd > 0.0


def test_cdc_chunk_conservation(spark, q):
    (r,) = _rows(q, spark, "dedup_cdc_chunks")
    assert r.n_distinct_chunks <= r.n_chunks
    assert 0 <= r.dup_tokens < r.total_tokens
    assert 0 <= r.dedup_savings_ppm <= 1_000_000


def test_pareto_cuts_concentration(spark, q):
    rows = _rows(q, spark, "events_pareto_cuts")
    shares = {r.top_pct: r.share_ppm for r in rows}
    # concentration: top-p% of users hold at least p% of revenue,
    # and shares are monotone in the cut
    for p, s in shares.items():
        assert s >= p * 10_000 - 1
    vals = [shares[p] for p in sorted(shares)]
    assert vals == sorted(vals)


def test_sample_rate_audit_counts(spark, q):
    (r,) = _rows(q, spark, "sample_rate_audit")
    assert r.n_buckets == 20
    assert r.min_bucket <= r.n_docs // 20 <= r.max_bucket
    assert r.chi2 >= 0.0


def test_pca_share_bounds(spark, q):
    (r,) = _rows(q, spark, "sim_pca_power_iteration")
    # top eigenvalue explains at least 1/dim of the variance and at
    # most all of it
    assert 1.0 / r.dim - 1e-6 <= r.lambda1_share <= 1.0 + 1e-6
    assert 0 <= r.top_dim < r.dim


def test_nprobe_sweep_monotone_saturating(spark, q):
    rows = _rows(q, spark, "sim_nprobe_recall_sweep")
    recall = [r.recall_ppm for r in sorted(rows, key=lambda r: r.nprobe)]
    assert recall == sorted(recall)  # more probes never hurt recall
    assert recall[-1] <= 1_000_000


def test_group_kfold_partition(spark, q):
    rows = _rows(q, spark, "sample_group_kfold")
    assert len(rows) == 5
    assert abs(sum(r.event_share_ppm for r in rows) - 1_000_000) < 10


def test_decimal_audit_consistency(spark, q):
    for r in _rows(q, spark, "profile_decimal_audit"):
        # integer rows are a subset of fits-cents rows
        assert r.beyond_cents_rows <= r.non_integer_rows <= r.n_rows
        assert r.fits_cents == (1 if r.beyond_cents_rows == 0 else 0)


def test_stickiness_bounds(spark, q):
    for r in _rows(q, spark, "events_dau_wau_stickiness"):
        assert r.dau <= r.wau
        assert 0 < r.stickiness_ppm <= 1_000_000


def test_funnel_ttc_ordered_percentiles(spark, q):
    for r in _rows(q, spark, "events_funnel_ttc"):
        assert 0 <= r.p50_sec <= r.p90_sec <= r.max_sec


def test_power_mde_positive(spark, q):
    (r,) = _rows(q, spark, "stats_power_mde")
    assert r.mde_abs > 0.0 and r.mde_rel_ppm > 0
    assert 0 < r.pooled_rate_ppm < 1_000_000


def test_queries_fail_fast_on_missing_dir(spark, q):
    """Driver contract: a bad sf_dir raises AnalysisException at plan
    time (PATH_NOT_FOUND) — it must never hang or return empty.  One
    representative per input table/family; load_table resolves paths
    eagerly, so this pins the whole catalog's behavior."""
    from pyspark.errors import AnalysisException

    for name in (
        "q1_pricing_summary",       # lineitem
        "profile_psi_drift",        # events
        "text_simpson_diversity",   # documents
        "sim_silhouette_audit",     # embeddings
        "stats_theil_decomposition",  # orders + customer
    ):
        with pytest.raises(AnalysisException):
            q[name](spark, "/root/testdata/sf_does_not_exist").collect()


def test_centroid_drift_bounds(spark, q):
    (r,) = _rows(q, spark, "sim_centroid_shift_drift")
    assert r.dims == 64
    assert 0.0 <= r.shift_max_dim <= r.shift_l2
    assert 0 <= r.worst_dim < r.dims


def test_mixture_shift_consistency(spark, q):
    rows = _rows(q, spark, "quality_mixture_shift")
    for r in rows:
        assert 0 <= r.n_kept <= r.n_docs
        assert 0 <= r.keep_rate_ppm <= 1_000_000
        assert r.chi2_term >= 0.0


def test_band_tradeoff_s_curve(spark, q):
    rows = sorted(
        _rows(q, spark, "dedup_band_tradeoff"),
        key=lambda r: r.rows_per_band,
    )
    # widening bands (fewer, longer) can only LOSE candidates and
    # recall; precision can only improve
    cands = [r.n_candidates for r in rows]
    assert cands == sorted(cands, reverse=True)
    recalls = [r.recall_ppm for r in rows]
    assert recalls == sorted(recalls, reverse=True)
    for r in rows:
        assert r.n_verified <= r.n_candidates
        assert r.n_verified <= r.n_truth


def test_drawdown_bounds(spark, q):
    (r,) = _rows(q, spark, "events_revenue_drawdown")
    assert 0 <= r.drawdown_cents <= r.peak_cents
    assert 0 <= r.drawdown_ppm <= 1_000_000


def test_theil_decomposition_additive(spark, q):
    (r,) = _rows(q, spark, "stats_theil_decomposition")
    assert r.theil_total >= 0.0
    assert r.theil_between >= -1e-6
    assert abs(r.theil_total - r.theil_between - r.theil_within) < 1e-9


def test_neyman_shares_sum(spark, q):
    rows = _rows(q, spark, "sample_neyman_allocation")
    assert abs(sum(r.proportional_ppm for r in rows) - 1_000_000) < 10
    assert abs(sum(r.neyman_ppm for r in rows) - 1_000_000) < 10


def test_ltv_curve_monotone(spark, q):
    rows = _rows(q, spark, "events_cohort_ltv_curve")
    by_cohort: dict = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_week, []).append(
            (r.week_k, r.cum_revenue_cents)
        )
    for pts in by_cohort.values():
        pts.sort()
        cum = [c for _, c in pts]
        assert cum == sorted(cum)  # cumulative revenue never decreases
