"""Property tests for the round-6 operator wave — invariants the oracle
hash can't see (they hold even when both engines are wrong the same
way)."""

import math

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_gini_lorenz_is_a_valid_lorenz_curve(spark):
    """Gini ∈ [0,1); cumulative shares are nondecreasing, convex-ish
    (each decile adds at least the previous decile's mean share under
    ascending sort), and end exactly at 1e6 ppm."""
    from hauser_spark.operators.stats import gini_lorenz

    rows = gini_lorenz(spark, SF).collect()
    assert len(rows) == 10
    g = rows[0].gini
    assert 0.0 <= g < 1.0
    assert all(abs(r.gini - g) < 1e-12 for r in rows)
    prev = 0
    shares = []
    for r in rows:
        assert r.cum_share_ppm >= prev
        shares.append(r.cum_share_ppm - prev)
        prev = r.cum_share_ppm
    assert rows[-1].cum_share_ppm == 1_000_000
    # ascending revenue sort ⇒ per-decile share is nondecreasing
    assert all(
        b >= a - 1 for a, b in zip(shares, shares[1:])
    ), shares  # −1 ppm slack for the half-add rounding


def test_kruskal_wallis_invariants(spark):
    """H ≥ 0; tie-corrected H ≥ raw H (correction divisor ≤ 1); df is
    groups − 1."""
    from hauser_spark.operators.stats import kruskal_wallis

    r = kruskal_wallis(spark, SF).collect()[0]
    assert r.df == 4
    assert r.h_stat >= 0
    assert r.h_tie_corrected >= r.h_stat - 1e-9
    assert r.n_orders > 0


def test_welch_ttest_matches_arm_counts(spark):
    """Arms partition the purchase rows; df sits between min(n)−1 and
    n1+n2−2 (the Welch-Satterthwaite bounds)."""
    from hauser_spark.operators.stats import welch_ttest

    r = welch_ttest(spark, SF).collect()[0]
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert r.n_weekend + r.n_weekday == ev
    assert min(r.n_weekend, r.n_weekday) - 1 <= r.welch_df
    assert r.welch_df <= r.n_weekend + r.n_weekday - 2


def test_markov_entropy_rate_is_mixture_of_state_entropies(spark):
    """0 ≤ H(next|i) ≤ log2(#states); the rate is inside the per-state
    range (it is their π-weighted mean); shares sum to ~1e6 ppm."""
    from hauser_spark.plans.events import markov_entropy_rate

    rows = markov_entropy_rate(spark, SF).collect()
    k = len(rows)
    assert k >= 2
    cap = math.log2(k)
    for r in rows:
        assert -1e-9 <= r.next_entropy_bits <= cap + 1e-9
    lo = min(r.next_entropy_bits for r in rows)
    hi = max(r.next_entropy_bits for r in rows)
    rate = rows[0].entropy_rate_bits
    assert lo - 1e-9 <= rate <= hi + 1e-9
    assert abs(sum(r.share_ppm for r in rows) - 1_000_000) <= k


def test_edge_embeddedness_bounds_and_adjacency(spark):
    """Overlap ratio in (0,1]; common < union; every reported pair is an
    actual KNN edge."""
    from hauser_spark.operators.linkgraph import (
        edge_embeddedness,
        knn_edges_cached,
    )

    rows = edge_embeddedness(spark, SF).collect()
    assert rows
    edges = {
        (r.a, r.b) for r in knn_edges_cached(spark, SF).collect()
    }
    for r in rows:
        assert 0.0 < r.embeddedness <= 1.0
        assert 0 < r.common <= r.union_n
        assert (r.u, r.v) in edges


def test_hll_sweep_error_shrinks_with_registers(spark):
    """Realized |relative error| at m=1024 beats m=16, and every
    realized error is within ~4 analytic standard errors."""
    from hauser_spark.operators.sketches import hll_precision_sweep

    rows = {r.p: r for r in hll_precision_sweep(spark, SF).collect()}
    assert set(rows) == {4, 6, 8, 10}
    assert abs(rows[10].rel_err) <= abs(rows[4].rel_err) + 1e-9
    for r in rows.values():
        assert abs(r.rel_err) <= 4.0 * r.se_analytic
        assert r.m_registers == 1 << r.p


def test_fuzzy_decontam_flags_are_subset_of_training(spark):
    """Flag counts never exceed the source's training population, and
    any reported pair jaccard clears the τ = ½ gate in ppm."""
    from hauser_spark.operators.decontam import (
        minhash_fuzzy_contamination,
    )

    rows = minhash_fuzzy_contamination(spark, SF).collect()
    assert rows
    assert any(r.n_flagged > 0 for r in rows)  # planted near-dups cross
    for r in rows:
        assert 0 <= r.n_flagged <= r.n_train_docs
        assert r.n_pairs >= r.n_flagged
        if r.n_pairs:
            assert r.max_jac_ppm >= 500_000 - 1


def test_ipf_raking_hits_both_margins(spark):
    """After IPF_ROUNDS the weighted lang marginal is uniform and the
    weighted source marginal preserves observed volume (both to ~0.1%),
    and weights are strictly positive."""
    from hauser_spark.operators.sampling import ipf_raking

    df = ipf_raking(spark, SF)
    rows = df.collect()
    assert all(r.weight_ppm > 0 for r in rows)
    total = sum(r.expected_docs_micro for r in rows)
    langs = {}
    srcs = {}
    for r in rows:
        langs[r.lang] = langs.get(r.lang, 0) + r.expected_docs_micro
        srcs[r.source] = srcs.get(r.source, 0) + r.expected_docs_micro
    target_l = total / len(langs)
    for v in langs.values():
        assert abs(v - target_l) / target_l < 1e-3
    observed = {
        r["source"]: r["n"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for s, v in srcs.items():
        assert abs(v / 1e6 - observed[s]) / observed[s] < 1e-3


def test_equi_depth_buckets_have_exact_mass(spark):
    """Bucket k holds exactly ⌈(k+1)N/B⌉−⌈kN/B⌉ rows (integer order
    statistics), value ranges are disjoint and increasing, and the
    masses sum to N."""
    from hauser_spark.operators.profile import (
        EQUI_DEPTH_B,
        equi_depth_histogram,
    )

    rows = equi_depth_histogram(spark, SF).collect()
    assert len(rows) == EQUI_DEPTH_B
    # N comes from the TABLE, not from the query's own n_rows column —
    # summing the query output made the "masses sum to N" invariant
    # vacuous and hid the floor-label row-loss bug (ADVICE r6).
    n = spark.read.parquet(f"{SF}/orders.parquet").count()
    assert sum(r.n_rows for r in rows) == n
    for r in rows:
        k = r.bucket
        expected = ((k + 1) * n) // EQUI_DEPTH_B - (k * n) // EQUI_DEPTH_B
        assert r.n_rows == expected, (k, r.n_rows, expected)
    for a, b in zip(rows, rows[1:]):
        assert a.value_hi <= b.value_lo


def test_equi_depth_exact_on_non_multiple_n(spark, tmp_path):
    """N=10007 (not a multiple of B=10): every bucket mass is exactly
    ⌈(k+1)N/B⌉−⌈kN/B⌉ and masses sum to N — the case the floor-based
    label formula silently lost rows on (it produced 10003/10007)."""
    from hauser_spark.operators.profile import (
        EQUI_DEPTH_B,
        equi_depth_histogram,
    )

    n = 10007
    sf = str(tmp_path / "sf_synth")
    (
        spark.range(n)
        .selectExpr("(id % 997) * 1.37 + 1 AS o_totalprice")
        .write.parquet(f"{sf}/orders.parquet")
    )
    rows = equi_depth_histogram(spark, sf).collect()
    assert sum(r.n_rows for r in rows) == n
    for r in rows:
        k = r.bucket
        expected = ((k + 1) * n) // EQUI_DEPTH_B - (k * n) // EQUI_DEPTH_B
        assert r.n_rows == expected, (k, r.n_rows, expected)


def test_permutation_test_p_value_is_calibrated_null(spark):
    """No true weekend effect is planted, so the randomization p-value
    must not be extreme, and it agrees with Welch's verdict; p is the
    add-one estimator over exactly PERM_B replicates."""
    from hauser_spark.operators.stats import (
        PERM_B,
        permutation_test,
        welch_ttest,
    )

    r = permutation_test(spark, SF).collect()[0]
    assert r.b_replicates == PERM_B
    assert abs(
        r.p_value - (r.n_exceed + 1) / (PERM_B + 1)
    ) < 1e-6  # p_value is reported at 6 dp
    w = welch_ttest(spark, SF).collect()[0]
    assert (r.p_value < 0.05) == bool(w.reject_equal_means)


def test_segment_migration_partitions_every_user(spark):
    """Matrix masses sum to the distinct-user universe; no user is
    'absent' in both halves; shares sum to ~1e6 ppm."""
    from hauser_spark.plans.events import segment_migration

    rows = segment_migration(spark, SF).collect()
    users = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r.n_users for r in rows) == users
    assert not any(
        r.seg_h1 == "absent" and r.seg_h2 == "absent" for r in rows
    )
    assert abs(sum(r.share_ppm for r in rows) - 1_000_000) <= len(rows)
