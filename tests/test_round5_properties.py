"""Property tests for the round-5 operator wave — invariants the oracle
hash can't see (they hold even when both engines are wrong the same
way)."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_survival_km_is_monotone_nonincreasing(spark):
    """S(t) must be a valid survival curve: in (0, 1], nonincreasing,
    with risk sets that shrink as t grows."""
    from hauser_spark.plans.events import survival_km

    rows = survival_km(spark, SF).collect()
    assert rows
    prev_s, prev_risk = 1.0 + 1e-9, None
    for r in rows:
        assert 0.0 <= r.survival <= 1.0
        assert r.survival <= prev_s + 1e-12
        if prev_risk is not None:
            assert r.n_risk <= prev_risk
        assert 0 < r.n_conversions <= r.n_risk
        prev_s, prev_risk = r.survival, r.n_risk


def test_waterfill_spends_exactly_the_budget_greedily(spark):
    """Allocations are source-whole except at most one boundary source,
    ordered by quality, and sum to the budget (or the corpus if the
    budget exceeds it)."""
    from hauser_spark.operators.curation import (
        WATERFILL_BUDGET_DEN,
        WATERFILL_BUDGET_NUM,
        mixture_waterfill,
    )

    rows = mixture_waterfill(spark, SF).collect()
    total = sum(r.tokens for r in rows)
    budget = total * WATERFILL_BUDGET_NUM // WATERFILL_BUDGET_DEN
    assert sum(r.allocated_tokens for r in rows) == min(budget, total)
    by_quality = sorted(rows, key=lambda r: (-r.quality_ppm, r.source))
    partial_seen = False
    for r in by_quality:
        assert 0 <= r.allocated_tokens <= r.tokens
        if partial_seen:
            assert r.allocated_tokens == 0
        elif r.allocated_tokens < r.tokens:
            partial_seen = True


def test_silence_runs_agree_with_bruteforce(spark):
    """The numpy run-length kernel must agree with a per-doc pure-Python
    rescan of the same decoded samples."""
    import struct

    from hauser_spark.operators.multimodal import (
        AUDIO_MIN_RUN,
        AUDIO_QUIET_T,
        _MAGICS,
        _planted_payload,
        audio_silence_runs,
    )
    from hauser_spark.tables import load_table

    got = {r.doc_id: r for r in audio_silence_runs(spark, SF).collect()}
    docs = (
        load_table(spark, SF, "documents")
        .filter(F.col("doc_id") % len(_MAGICS) == 2)
        .select("doc_id", _planted_payload().alias("payload"))
        .limit(40)
        .collect()
    )
    assert docs
    for row in docs:
        body = bytes(row.payload)[4:]
        n = len(body) // 2
        s = struct.unpack(f"<{n}h", body[: 2 * n])
        runs, cur = [], 0
        for x in s:
            if abs(x) < AUDIO_QUIET_T:
                cur += 1
            elif cur:
                runs.append(cur)
                cur = 0
        if cur:
            runs.append(cur)
        r = got[row.doc_id]
        assert r.n_samples == n
        assert r.n_quiet == sum(runs)
        assert r.n_runs == sum(1 for x in runs if x >= AUDIO_MIN_RUN)
        assert r.longest_run == (max(runs) if runs else 0)


def test_tile_contrast_tiles_partition_the_image(spark):
    """Each image's four tiles cover all pixels exactly once, and the
    per-tile luminance totals re-add to the whole-image total."""
    from hauser_spark.operators.multimodal import (
        BMP_H,
        BMP_W,
        image_tile_contrast,
    )

    rows = image_tile_contrast(spark, SF).collect()
    per_doc: dict[int, list] = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, tiles in per_doc.items():
        assert sorted(t.tile for t in tiles) == [0, 1, 2, 3], doc_id
        assert sum(t.n_px for t in tiles) == BMP_W * BMP_H
        for t in tiles:
            assert 0 <= t.contrast <= 3 * 255


def test_bloom_fpr_observed_tracks_analytic(spark):
    """The observed FPR must sit within a loose binomial band of the
    analytic rate — a broken position hash blows this immediately."""
    from hauser_spark.operators.bloomjoin import bloom_fpr_audit

    r = bloom_fpr_audit(spark, SF).collect()[0]
    assert r.n_build > 0 and r.n_probe > 0
    # E[fp] = np*p; allow 4 sigma + slack for the tiny-p regime
    import math

    exp_fp = r.n_probe * r.fpr_expected
    sigma = math.sqrt(max(exp_fp, 1.0))
    assert abs(r.false_positives - exp_fp) <= 4 * sigma + 3


def test_knn_classifier_votes_are_topk_sized(spark):
    """Winning vote counts are bounded by k and predictions carry the
    majority; the query's own vector never votes."""
    from hauser_spark.operators.similarity import TOP_K, knn_classifier

    rows = knn_classifier(spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r.votes <= TOP_K
        assert r.correct == (r.predicted == r.true_label)


def test_ltv_deciles_are_ordered_and_complete(spark):
    """Ten deciles, population differences bounded by 1, revenue share
    nonincreasing from decile 0, shares sum to ~1."""
    from hauser_spark.plans.events import user_ltv_deciles

    rows = user_ltv_deciles(spark, SF).collect()
    assert [r.decile for r in rows] == list(range(10))
    pops = [r.n_users for r in rows]
    assert max(pops) - min(pops) <= 1
    for a, b in zip(rows, rows[1:]):
        assert a.revenue >= b.revenue - 1e-9
        assert a.min_user_revenue >= b.max_user_revenue - 1e-9
    assert abs(sum(r.revenue_share for r in rows) - 1.0) < 1e-4


def test_benford_terms_reconstruct_counts(spark):
    """Digits 1..9 all present; observed counts sum to the positive-value
    row count; expected counts sum to ~N."""
    from hauser_spark.operators.stats import benford_digit_test
    from hauser_spark.tables import load_table

    rows = benford_digit_test(spark, SF).collect()
    assert [r.digit for r in rows] == list(range(1, 10))
    n_pos = (
        load_table(spark, SF, "events").filter(F.col("value") > 0).count()
    )
    assert sum(r.n_obs for r in rows) == n_pos
    assert abs(sum(r.expected for r in rows) - n_pos) < 1.0


def test_containment_lsh_probe_floor_keeps_exact_recall(spark):
    """The >=3-probe-hit candidate floor must not lose any pair the
    exact containment twin reports (the deterministic guarantee for
    min-side <= 50 shingles)."""
    from hauser_spark.operators import dedup as dd

    exact = {
        (r.d1, r.d2)
        for r in dd.containment_pairs(spark, SF).collect()
    }
    lsh = {
        (r.d1, r.d2)
        for r in dd.containment_lsh_pairs(spark, SF).collect()
    }
    assert exact == lsh
