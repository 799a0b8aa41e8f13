"""Round-7 wave-8 property tests: invariants the oracle hash can't see
(both engines share the arithmetic, so a shared bug passes the gate —
these pin the SEMANTICS against independently-derived ground truth)."""

from pyspark.sql import functions as F  # noqa: F401

SF = "/root/testdata/sf0.01"


def test_ablation_grid_is_monotone_and_anchored(spark):
    """Adding a rule can only shrink the kept set; mask 0 keeps
    everything; the full mask equals the intersection of the three
    single-rule masks' survivors (counts can't verify set identity, but
    the inclusion-exclusion bound must hold)."""
    from hauser_spark.operators.quality import filter_ablation_grid

    rows = {r.mask_id: r for r in filter_ablation_grid(spark, SF).collect()}
    assert len(rows) == 8
    n_all = rows[0].docs_kept
    t_all = rows[0].tokens_kept
    assert rows[0].doc_keep_ppm == 1000000 == rows[0].token_keep_ppm
    total = (
        spark.read.parquet(f"{SF}/documents.parquet").count()
    )
    assert n_all == total
    for m in range(8):
        for bit in (1, 2, 4):
            if m & bit:
                # superset mask keeps no more than the mask without the bit
                assert rows[m].docs_kept <= rows[m ^ bit].docs_kept
                assert rows[m].tokens_kept <= rows[m ^ bit].tokens_kept
    # full mask >= inclusion-exclusion lower bound from single rules
    lb = (
        rows[1].docs_kept + rows[2].docs_kept + rows[4].docs_kept
        - 2 * n_all
    )
    assert rows[7].docs_kept >= max(0, lb)
    assert t_all >= rows[7].tokens_kept


def test_length_sweep_monotone_and_exact_at_anchor(spark):
    """Retention is non-increasing in the threshold, and the threshold-50
    point must equal an independent direct count."""
    from hauser_spark.operators.quality import length_threshold_sweep

    rows = length_threshold_sweep(spark, SF).collect()
    docs = [r.docs_kept for r in rows]
    toks = [r.tokens_kept for r in rows]
    assert docs == sorted(docs, reverse=True)
    assert toks == sorted(toks, reverse=True)
    direct = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .selectExpr("size(split(trim(lower(text)), '\\\\s+')) AS n")
        .filter("n >= 40")
        .count()
    )
    at40 = {r.min_tokens: r.docs_kept for r in rows}[40]
    assert at40 == direct


def test_method_agreement_counts_are_consistent(spark):
    """The confusion cells must tile the union, and each family's total
    must equal its own pair query's row count."""
    from hauser_spark.operators.dedup import (
        method_agreement,
        minhash_lsh_pairs,
        simhash_hamming_pairs,
    )

    r = method_agreement(spark, SF).collect()[0]
    assert r.n_both + r.n_minhash_only + r.n_simhash_only == r.n_union
    assert r.n_both + r.n_minhash_only == r.n_minhash
    assert r.n_both + r.n_simhash_only == r.n_simhash
    assert r.n_minhash == minhash_lsh_pairs(spark, SF).count()
    assert r.n_simhash == simhash_hamming_pairs(spark, SF).count()
    assert 0 <= r.agreement_ppm <= 1000000


def test_hubness_histogram_masses(spark):
    """The histogram covers every vector exactly once, and total
    k-occurrence mass equals the number of (src, neighbor) slots:
    sum(k_occ * n_vectors) = sum over cells of |cell| * min(K, |cell|-1)."""
    from hauser_spark.operators.similarity import HUB_K, hubness_audit

    rows = hubness_audit(spark, SF).collect()
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    n = emb.count()
    assert sum(r.n_vectors for r in rows) == n
    cells = emb.groupBy("label").count().collect()
    slots = sum(c["count"] * min(HUB_K, c["count"] - 1) for c in cells)
    assert sum(r.k_occ * r.n_vectors for r in rows) == slots


def test_compaction_planner_masses_and_bounds(spark):
    """Partitions tile the table; target file count respects the size
    law ceil(bytes/target) and strictly reduces the modeled day-grain
    layout's file count on every multi-day month."""
    from hauser_spark.operators.profile import (
        COMPACT_TARGET_BYTES,
        compaction_planner,
    )

    rows = compaction_planner(spark, SF).collect()
    total = spark.read.parquet(f"{SF}/orders.parquet").count()
    assert sum(r.n_rows for r in rows) == total
    for r in rows:
        want = max(
            1,
            (r.est_bytes + COMPACT_TARGET_BYTES - 1) // COMPACT_TARGET_BYTES,
        )
        assert r.files_target == want
        assert r.avg_file_bytes_after >= r.avg_file_bytes_now
        if r.files_now > r.est_bytes // COMPACT_TARGET_BYTES + 1:
            assert r.files_target <= r.files_now


def test_bh_fdr_step_up_shape(spark):
    """Rejections form a prefix of the significance ranking, every
    rejected statistic clears its own rung, and the per-type masses are
    independently recomputable."""
    from hauser_spark.operators.stats import bh_fdr

    rows = bh_fdr(spark, SF).collect()
    assert [r.bh_rank for r in rows] == list(range(1, len(rows) + 1))
    flags = [r.reject_flag for r in rows]
    assert flags == sorted(flags, reverse=True)  # prefix property
    for r in rows:
        if r.reject_flag:
            # the step-up allows stat < crit inside the prefix only if a
            # LOWER-ranked stat clears its rung; the max rung clearer
            # bounds the prefix
            pass
    clearers = [r.bh_rank for r in rows if r.stat_nano >= r.crit_nano]
    cutoff = max(clearers) if clearers else 0
    assert all(
        (r.bh_rank <= cutoff) == bool(r.reject_flag) for r in rows
    )
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .selectExpr(
            "event_type",
            "CASE WHEN dayofweek(ts) IN (1, 7) THEN 1 ELSE 0 END AS wk",
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("wk").alias("nw"))
        .collect()
    )
    masses = {r.event_type: (r.n, r.nw) for r in ev}
    for r in rows:
        assert (r.n_events, r.n_weekend) == masses[r.event_type]


def test_bbit_error_decreases_with_width_and_converges(spark):
    """More bits can only improve the estimator on average at the
    extremes of the ladder: the 1-bit row must carry the largest mean
    |error|, and the 16-bit row must agree with the full-width (b=31)
    row to ≤2 ppm — the low-16-bit match counts are identical on this
    fixture (chance agreement of differing hashes is ~2^-16/hash), so
    the only residue is the collision-correction factor 1/(1−2⁻ᵇ)
    itself, worth <2 ppm of Jaccard."""
    from hauser_spark.operators.dedup import bbit_minhash_audit

    rows = {r.bits: r for r in bbit_minhash_audit(spark, SF).collect()}
    assert set(rows) == {1, 2, 4, 8, 16, 31}
    n = {r.n_pairs for r in rows.values()}
    assert len(n) == 1  # same verified-pair set at every width
    assert abs(rows[16].mean_abs_err_ppm - rows[31].mean_abs_err_ppm) <= 2
    assert abs(rows[16].mean_bias_ppm - rows[31].mean_bias_ppm) <= 2
    assert rows[1].mean_abs_err_ppm >= rows[31].mean_abs_err_ppm


def test_recall_sweep_is_consistent_with_single_k_audit(spark):
    """The k=10 sweep point must equal the mean of the per-query
    recall@10 the existing audit reports, and hits can never exceed
    k * |queries|."""
    from hauser_spark.operators.similarity import (
        N_QUERIES,
        ivf_recall_audit,
        recall_at_k_sweep,
    )

    rows = {r.k: r for r in recall_at_k_sweep(spark, SF).collect()}
    assert set(rows) == {1, 3, 5, 10}
    for k, r in rows.items():
        assert 0 <= r.n_hits <= k * N_QUERIES
    audit = ivf_recall_audit(spark, SF).collect()
    assert rows[10].n_hits == sum(a.n_hits for a in audit)


def test_contingency_margins_match_component_queries(spark):
    """The dup margin must equal the distinct membership of the LSH
    pair frame plus exact-dup groups; the lowq margin must match a
    direct recount with curate()'s rule constants."""
    from hauser_spark.operators.curation import (
        MAX_PUNCT_DENSITY,
        MIN_ALPHA_RATIO,
        MIN_TOKENS,
        dup_quality_contingency,
    )
    from hauser_spark.operators.dedup import minhash_lsh_pairs

    r = dup_quality_contingency(spark, SF).collect()[0]
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    lowq = docs.selectExpr(
        "size(split(trim(lower(text)), '\\\\s+')) AS nt",
        "regexp_count(text, '[^\\\\w\\\\s]') AS np",
        "regexp_count(text, '[A-Za-z]') AS na",
        "length(text) AS L",
    ).filter(
        f"nt < {MIN_TOKENS} OR np / L > {MAX_PUNCT_DENSITY}"
        f" OR na / L < {MIN_ALPHA_RATIO}"
    ).count()
    assert r.n_lowq == lowq
    pairs = minhash_lsh_pairs(spark, SF)
    members = (
        pairs.selectExpr("d1 AS doc_id")
        .union(pairs.selectExpr("d2 AS doc_id"))
        .distinct()
        .count()
    )
    # fixture has no exact dups at sf0.01, so near-dup membership IS
    # the dup margin here (the exact-dup OR branch is covered at sf0.1)
    assert r.n_dup == members
    assert r.n_docs == docs.count()
    assert r.n_dup_lowq <= min(r.n_dup, r.n_lowq)


def test_vocab_sweep_monotone_and_anchored(spark):
    """Token count strictly decreases per merge (every learned merge
    fires somewhere), bytes/token strictly rises, and the 0-merge
    checkpoint equals the raw whitespace token count."""
    from hauser_spark.operators.text import vocab_fertility_sweep

    rows = vocab_fertility_sweep(spark, SF).collect()
    toks = [r.n_tokens for r in rows]
    bpt = [r.bytes_per_token_ppm for r in rows]
    assert toks == sorted(toks, reverse=True) and len(set(toks)) == len(toks)
    assert bpt == sorted(bpt)
    raw = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .selectExpr("size(split(trim(lower(text)), '\\\\s+')) AS n")
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert rows[0].n_merges == 0 and rows[0].n_tokens == raw


def test_ngram_sweep_monotone_in_n(spark):
    """Longer n-grams can only shrink the hit set (every (n+k)-gram hit
    implies an n-gram hit within it on the same doc pair universe —
    checked as monotone counts), and the n=5 row must agree with the
    production detector's doc count."""
    from hauser_spark.operators.decontam import (
        benchmark_contamination,
        ngram_size_sweep,
    )

    rows = {r.n_gram: r for r in ngram_size_sweep(spark, SF).collect()}
    assert set(rows) == {3, 5, 8}
    assert rows[3].docs_hit >= rows[5].docs_hit >= rows[8].docs_hit
    assert rows[5].docs_hit == benchmark_contamination(spark, SF).count()
    for r in rows.values():
        assert r.docs_flagged <= r.docs_hit


def test_cell_balance_masses(spark):
    """The audit's masses must be recomputable from the raw cell
    histogram."""
    from hauser_spark.operators.similarity import cell_balance_audit

    r = cell_balance_audit(spark, SF).collect()[0]
    cells = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .groupBy("label")
        .count()
        .collect()
    )
    ns = sorted((c["count"] for c in cells), reverse=True)
    assert r.n_cells == len(ns)
    assert r.n_vectors == sum(ns)
    assert r.min_cell == min(ns) and r.max_cell == max(ns)
    top3 = sum(ns[:3])
    assert r.nprobe3_worst_share_ppm == (
        2 * top3 * 1000000 + sum(ns)
    ) // (2 * sum(ns))


def test_window_sensitivity_monotone_and_saturating(spark):
    """Conversions are non-decreasing in the window and bounded by the
    clicker count; the n=90 point must equal the unwindowed
    click→purchase converter count."""
    from hauser_spark.plans.events import funnel_window_sensitivity

    rows = funnel_window_sensitivity(spark, SF).collect()
    convs = [r.n_converted for r in rows]
    assert convs == sorted(convs)
    for r in rows:
        assert r.n_converted <= r.n_clickers
    direct = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "click", F.col("ts")))
            .alias("fc"),
            F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
            .alias("fb"),
        )
        .filter("fc IS NOT NULL AND fb IS NOT NULL AND fb >= fc")
        .filter(
            "unix_timestamp(fb) DIV 86400"
            " - unix_timestamp(fc) DIV 86400 <= 90"
        )
        .count()
    )
    assert {r.window_days: r.n_converted for r in rows}[90] == direct


def test_attribution_models_conserve_credit(spark):
    """Each model must distribute exactly one credit per converting
    user: first/last totals equal the converter count, and linear ppm
    totals equal it within per-user rounding (±1 ppm per user)."""
    from hauser_spark.plans.events import (
        attribution_comparison,
        touch_attribution,
    )

    rows = attribution_comparison(spark, SF).collect()
    n_conv = touch_attribution(spark, SF).count()
    assert sum(r.first_touch for r in rows) == n_conv
    assert sum(r.last_touch for r in rows) == n_conv
    linear_total = sum(r.linear_credit_ppm for r in rows)
    assert abs(linear_total - n_conv * 1000000) <= n_conv


def test_bloom_planner_matches_closed_form(spark):
    """m and k must match the closed-form optimum recomputed in
    Python from the same n, and FPR targets order the sizes."""
    import math

    from hauser_spark.operators.profile import (
        BLOOM_TARGET_FPR_PPM,
        bloom_size_planner,
    )

    rows = {r.target_fpr_ppm: r for r in bloom_size_planner(spark, SF).collect()}
    n = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .filter(
            "o_orderpriority = '1-URGENT' AND o_totalprice > 150000.0"
        )
        .count()
    )
    for p in BLOOM_TARGET_FPR_PPM:
        r = rows[p]
        assert r.n_keys == n
        m_exact = n * -math.log(p / 1e6) / math.log(2) ** 2
        assert abs(r.m_bits - math.ceil(m_exact)) <= 1  # nano freeze slack
        k_exact = round(r.m_bits / n * math.log(2))
        assert abs(r.k_hashes - max(1, k_exact)) <= 1
    ms = [rows[p].m_bits for p in sorted(BLOOM_TARGET_FPR_PPM)]
    assert ms == sorted(ms, reverse=True)  # stricter FPR -> more bits


def test_phash_sweep_nests_and_anchors(spark):
    """Radius r results nest inside r+1 (counts monotone), the r=4
    point equals the production radius search's pair count, and probe
    coverage is bounded by the probe-set size."""
    from hauser_spark.operators.multimodal import (
        PHASH_N_PROBES,
        phash_near_dup,
        phash_threshold_sweep,
    )

    rows = phash_threshold_sweep(spark, SF).collect()
    pair_counts = [r.n_pairs for r in rows]
    probe_counts = [r.probes_matched for r in rows]
    assert pair_counts == sorted(pair_counts)
    assert probe_counts == sorted(probe_counts)
    assert {r.radius: r.n_pairs for r in rows}[4] == phash_near_dup(
        spark, SF
    ).count()
    for r in rows:
        assert r.probes_matched <= PHASH_N_PROBES


def test_freshness_lag_is_vs_stream_head(spark):
    """One channel must have lag 0 (it owns the stream head), and every
    lag must be recomputable from raw per-type maxima."""
    from hauser_spark.operators.dq import freshness_slo

    rows = freshness_slo(spark, SF).collect()
    assert min(r.lag_hours for r in rows) == 0
    raw = {
        r.event_type: r.m
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("event_type")
        .agg(F.expr("unix_timestamp(max(ts))").alias("m"))
        .collect()
    }
    head = max(raw.values())
    for r in rows:
        assert r.last_epoch == raw[r.event_type]
        assert r.lag_hours == (head - raw[r.event_type]) // 3600


def test_powerlaw_alpha_matches_python_mle(spark):
    """The frozen-log MLE must match a straight Python recomputation
    from the raw degree list to ~1e-5 (the 1e6 log freeze)."""
    import math

    from hauser_spark.operators.linkgraph import (
        knn_edges_cached,
        powerlaw_alpha,
    )

    r = powerlaw_alpha(spark, SF).collect()[0]
    und = knn_edges_cached(spark, SF)
    deg = {}
    for row in und.collect():
        deg[row.a] = deg.get(row.a, 0) + 1
        deg[row.b] = deg.get(row.b, 0) + 1
    ds = list(deg.values())
    assert r.n_nodes == len(ds)
    assert r.d_min == min(ds) and r.d_max == max(ds)
    alpha = 1 + len(ds) / sum(math.log(2 * d) for d in ds)
    assert abs(r.alpha_all - alpha) < 1e-4
    tail = [d for d in ds if d >= 2]
    alpha2 = 1 + len(tail) / sum(math.log(d / 1.5) for d in tail)
    assert abs(r.alpha_tail2 - alpha2) < 1e-4
    assert r.alpha_all > 1  # MLE is only defined above 1


def test_sample_size_planner_matches_closed_form(spark):
    """n_per_arm must match the closed form recomputed in Python from
    the same base rate, and shrink quadratically with the lift."""
    import math

    from hauser_spark.operators.stats import (
        _ZZ2,
        PLAN_LIFTS_PPM,
        sample_size_planner,
    )

    rows = {r.lift_ppm: r for r in sample_size_planner(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet")
    n = ev.count()
    c = ev.filter("event_type = 'purchase'").count()
    p = c / n
    for lift in PLAN_LIFTS_PPM:
        want = math.ceil(_ZZ2 * 2.0 * p * (1 - p) / (p * lift / 1e6) ** 2)
        assert rows[lift].n_per_arm == want
    # quadratic law: 2x lift -> ~4x fewer samples
    ratio = rows[10000].n_per_arm / rows[20000].n_per_arm
    assert 3.9 < ratio < 4.1


def test_join_cardinality_exact_on_fk_errs_on_dates(spark):
    """On a clean PK-FK join the NDV estimate is EXACT (est = actual);
    the non-key date join must reproduce a recount of the real
    collision cardinality."""
    from hauser_spark.operators.profile import join_cardinality_audit

    rows = {r.join_pair: r for r in join_cardinality_audit(spark, SF).collect()}
    for fk in ("orders_customer", "lineitem_orders", "lineitem_part"):
        assert rows[fk].est_rows == rows[fk].actual_rows
        assert rows[fk].est_over_actual_ppm == 1000000
    o = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    actual = o.join(li, o.o_orderdate == li.l_shipdate).count()
    assert rows["date_collision"].actual_rows == actual


def test_heaps_projection_consistent_with_fit(spark):
    """Projection must equal V·scale^beta recomputed in Python from
    the emitted beta, and 100x >= 10x >= observed vocab."""
    from hauser_spark.operators.text import heaps_projection

    for r in heaps_projection(spark, SF).collect():
        want10 = round(r.vocab * 10 ** r.heaps_beta)
        want100 = round(r.vocab * 100 ** r.heaps_beta)
        assert abs(r.vocab_at_10x - want10) <= 1
        assert abs(r.vocab_at_100x - want100) <= 1
        assert r.vocab <= r.vocab_at_10x <= r.vocab_at_100x
        assert 0 < r.heaps_beta < 1


def test_neyman_is_optimal_among_schemes(spark):
    """Neyman allocation minimizes the stratified-mean variance by
    construction — its variance must be <= both competitors (within
    the nano freeze), and efficiency_vs_prop must reflect the ratio."""
    from hauser_spark.operators.sampling import allocation_variance

    rows = {r.scheme: r for r in allocation_variance(spark, SF).collect()}
    assert rows["neyman"].var_nano <= rows["proportional"].var_nano + 5
    assert rows["neyman"].var_nano <= rows["equal"].var_nano + 5
    assert rows["proportional"].efficiency_vs_prop_ppm == 1000000
    for r in rows.values():
        assert r.var_nano > 0
