"""Structural invariants for the round-4 operator families — properties
that must hold on ANY data, checked beside the value-exact oracles (the
oracle proves engine parity; these prove the MATH is the claimed one).
"""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_pagerank_is_a_distribution(spark):
    """Ranks are positive and sum to 1 (no dangling mass leaks)."""
    from hauser_spark.operators.linkgraph import pagerank

    rows = pagerank(spark, SF).collect()
    assert rows and all(r["pagerank"] > 0 for r in rows)
    assert abs(sum(r["pagerank"] for r in rows) - 1.0) < 1e-4


def test_triangles_bounded_by_degree(spark):
    """Per-node triangles ≤ C(degree, 2); local_cc ∈ [0, 1]."""
    from hauser_spark.operators.linkgraph import triangles_clustering

    for r in triangles_clustering(spark, SF).collect():
        assert r["n_triangles"] <= r["degree"] * (r["degree"] - 1) // 2
        assert 0.0 <= r["local_cc"] <= 1.0


def test_kcore_trajectory_monotone(spark):
    """Peeling can only shrink the graph; counts are non-increasing."""
    from hauser_spark.operators.linkgraph import kcore_peel

    rows = kcore_peel(spark, SF).orderBy("round").collect()
    for a, b in zip(rows, rows[1:]):
        assert b["n_nodes"] <= a["n_nodes"]
        assert b["n_edges"] <= a["n_edges"]


def test_lpa_trajectory_coalesces(spark):
    """Community count never increases round-over-round under min-tie
    synchronous LPA on a connected graph."""
    from hauser_spark.operators.linkgraph import label_propagation

    rows = label_propagation(spark, SF).orderBy("round").collect()
    for a, b in zip(rows, rows[1:]):
        assert b["n_communities"] <= a["n_communities"]


def test_link_prediction_pairs_not_adjacent(spark):
    """Predicted links must be absent from the edge list — they are
    predictions, not recall."""
    from hauser_spark.operators.linkgraph import (
        knn_edges_cached,
        link_prediction,
    )

    edges = {
        (r["a"], r["b"]) for r in knn_edges_cached(spark, SF).collect()
    }
    for r in link_prediction(spark, SF).collect():
        assert (r["u"], r["v"]) not in edges
        assert 0.0 < r["jaccard"] <= 1.0


def test_skyline_is_undominated(spark):
    """No returned part is dominated by ANY part of the full table
    (cheaper-or-equal AND larger-or-equal with one strict)."""
    from hauser_spark.plans.tpch_extra import part_skyline
    from hauser_spark.tables import load_table

    sky = part_skyline(spark, SF)
    part = load_table(spark, SF, "part").select(
        F.col("p_retailprice").alias("price"), F.col("p_size").alias("size")
    )
    dominated = (
        sky.join(
            part,
            (F.col("price") <= F.col("p_retailprice"))
            & (F.col("size") >= F.col("p_size"))
            & (
                (F.col("price") < F.col("p_retailprice"))
                | (F.col("size") > F.col("p_size"))
            ),
        )
        .count()
    )
    assert dominated == 0 and sky.count() > 0


def test_chi_square_nonnegative_and_v_bounded(spark):
    from hauser_spark.operators.stats import chi_square_type_dow

    r = chi_square_type_dow(spark, SF).collect()[0]
    assert r["chi2"] >= 0.0
    assert 0.0 <= r["cramers_v"] <= 1.0


def test_mutual_information_bounds(spark):
    """0 ≤ MI ≤ min(H(X), H(Y)); NMI in [0, 1]."""
    from hauser_spark.operators.stats import mutual_information

    r = mutual_information(spark, SF).collect()[0]
    assert 0.0 <= r["mi_bits"] <= min(r["h_x_bits"], r["h_y_bits"]) + 1e-9
    assert 0.0 <= r["nmi"] <= 1.0


def test_bootstrap_ci_ordered_and_brackets_point(spark):
    """ci_lo ≤ ci_hi, and the point estimate falls inside the CI (a
    95% interval from 64 replicates of a 1000-row sample must cover
    the sample mean)."""
    from hauser_spark.operators.stats import bootstrap_ci_mean

    for r in bootstrap_ci_mean(spark, SF).collect():
        assert r["ci_lo"] <= r["ci_hi"]
        assert r["ci_lo"] <= r["mean_value"] <= r["ci_hi"]
        assert r["n_replicates"] == 64


def test_ols_r_squared_bounded(spark):
    from hauser_spark.operators.stats import ols_value_model

    r = ols_value_model(spark, SF).collect()[0]
    assert 0.0 <= r["r_squared"] <= 1.0


def test_kmeans_partitions_corpus(spark):
    """Cluster sizes sum to the embedding count; inertia non-negative."""
    from hauser_spark.operators.similarity import kmeans_lloyd
    from hauser_spark.tables import load_table

    rows = kmeans_lloyd(spark, SF).collect()
    n = load_table(spark, SF, "embeddings").count()
    assert sum(r["n_members"] for r in rows) == n
    assert all(r["inertia"] >= 0.0 for r in rows)


def test_cdc_compaction_partitions_keys(spark):
    """Final ops partition the key space: n_keys sums to |orders|, and
    log records sum to the full log length."""
    from hauser_spark.operators.merge import cdc_log_compaction, _cdc_log
    from hauser_spark.tables import load_table

    orders = load_table(spark, SF, "orders")
    rows = cdc_log_compaction(spark, SF).collect()
    assert sum(r["n_keys"] for r in rows) == orders.count()
    assert sum(r["n_log_records"] for r in rows) == _cdc_log(orders).count()


def test_hll_estimate_within_sketch_error(spark):
    """HLL with m=256 has σ ≈ 1.04/√m ≈ 6.5%; estimates stay within
    5σ of exact on every type (a decoder/rank bug lands far outside)."""
    from hauser_spark.operators.sketches import hll_distinct_per_type

    for r in hll_distinct_per_type(spark, SF).collect():
        assert abs(r["rel_err"]) < 5 * 0.065, r


def test_seasonal_decompose_reconstructs(spark):
    """trend + seasonal + residual == n exactly (integer micro-units)."""
    from hauser_spark.plans.events import seasonal_decompose

    for r in seasonal_decompose(spark, SF).collect():
        recon = r["trend"] + r["seasonal"] + r["residual"]
        assert abs(recon - r["n_events"]) < 1e-6, r


def test_holt_forecast_is_linear_in_horizon(spark):
    """Forecasts lie on the level+h·trend line: second differences 0."""
    from hauser_spark.plans.events import holt_forecast

    rows = holt_forecast(spark, SF).orderBy("h").collect()
    f = [r["forecast_revenue"] for r in rows]
    for a, b, c in zip(f, f[1:], f[2:]):
        assert abs((c - b) - (b - a)) < 1e-5


def test_phash_radius_search_symmetric_consistency(spark):
    """Every reported match is within the radius, and the probe set is
    respected."""
    from hauser_spark.operators.multimodal import (
        PHASH_HAM_MAX,
        PHASH_N_PROBES,
        phash_near_dup,
    )

    rows = phash_near_dup(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["q_doc"] < PHASH_N_PROBES
        assert 0 <= r["hamming"] <= PHASH_HAM_MAX
        assert r["q_doc"] != r["match_doc"]


def test_theta_sketch_exact_when_sets_fit(spark):
    """When both sides' distinct sets fit inside the K-sketch, the
    theta estimate IS the exact intersection (rel_err == 0)."""
    from hauser_spark.operators.sketches import THETA_K, theta_set_ops
    from hauser_spark.tables import load_table

    li = load_table(spark, SF, "lineitem")
    max_distinct = (
        li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .agg(F.max("n"))
        .collect()[0][0]
    )
    if max_distinct <= THETA_K:
        for r in theta_set_ops(spark, SF).collect():
            assert r["rel_err_inter"] == 0.0


def test_shard_skew_conserves_totals(spark):
    """Shard loads sum to the kept-corpus totals; skew averages ~1."""
    from hauser_spark.operators.curation import N_SHARDS, shard_skew

    rows = shard_skew(spark, SF).collect()
    assert len(rows) <= N_SHARDS
    mean_skew = sum(r["token_skew"] for r in rows) / len(rows)
    assert 0.5 < mean_skew < 1.5
