"""Physical-plan quality gates: the 100 TB properties must be visible in
the plan, not assumed — predicate pushdown reaches the parquet scan,
projection pruning narrows ReadSchema, dim joins broadcast, and the
transform stays inside whole-stage codegen with no Python in the hot path.
"""

import pytest
from pyspark.sql import functions as F

from hauser_spark.plans import parity, tpch
from hauser_spark.schema import make_schema
from hauser_spark.transform import build_parity_projection


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushdown_reaches_scan(spark, sf_oracle):
    df = parity.f1_time_range_scan(spark, sf_oracle)
    plan = _plan(df)
    # the window predicate reaches the scan as long comparisons on the raw
    # nanos column — row-group prunable
    assert "GreaterThanOrEqual(ts" in plan.split("PushedFilters")[1], plan
    assert "LessThan(ts" in plan.split("PushedFilters")[1], plan


def test_projection_pruning_narrows_readschema(spark, sf_oracle):
    df = parity.f3_projection_pushdown(spark, sf_oracle)
    plan = _plan(df)
    # only the two selected columns reach the scan
    assert "ReadSchema: struct<event_id:bigint,event_type:string>" in plan, plan


def test_dim_joins_broadcast(spark, sf_oracle):
    df = tpch.q5_region_revenue(spark, sf_oracle)
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= 3, plan
    # the fact table never sort-merge-joins against a dim
    assert "SortMergeJoin" not in plan, plan


def test_transform_is_pure_codegen(spark):
    """The export transform must compile to expressions only — a Python
    UDF (BatchEvalPython) in this path would be a 10-100x regression."""
    df = spark.createDataFrame(
        [{"EventType": "click", "evt_a_real": "4", "PageUrl": "http://x"}]
    )
    out = build_parity_projection(df, make_schema())
    plan = _plan(out)
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_q1_partial_aggregation(spark, sf_oracle):
    """groupBy compiles to partial (map-side) + final hash aggregation —
    the shape that scales: the shuffle carries 4 groups, not 600k rows."""
    df = tpch.q1_pricing_summary(spark, sf_oracle)
    plan = _plan(df)
    assert plan.count("HashAggregate") >= 2, plan


def test_full_tpch_no_cartesian(spark, sf_oracle):
    """Every q2-q21 shape keys its joins — scalar-total patterns use a
    1-row broadcast, never an unkeyed cartesian over data."""
    from hauser_spark.plans import tpch_full

    for name, fn in tpch_full.QUERIES.items():
        plan = _plan(fn(spark, sf_oracle))
        assert "CartesianProduct" not in plan, f"{name}: {plan}"


def test_q8_dims_all_broadcast(spark, sf_oracle):
    """Market share joins 5 dims around the fact join — all broadcast;
    the only sort-merge join allowed is lineitem⋈orders."""
    from hauser_spark.plans import tpch_full

    plan = _plan(tpch_full.q8_market_share(spark, sf_oracle))
    assert plan.count("BroadcastHashJoin") >= 5, plan


def test_q21_single_shuffle_for_windows(spark, sf_oracle):
    """The three analytic windows share one partitioning (l_orderkey), so
    they evaluate in a single Window stage after one shuffle."""
    from hauser_spark.plans import tpch_full

    plan = _plan(tpch_full.q21_blocking_supplier(spark, sf_oracle))
    assert plan.count("Window") <= 2, plan


def test_ngram_join_no_cartesian(spark, sf_oracle):
    """The shingle self-join must be an equi-join on the shingle hash,
    never a cartesian product."""
    from hauser_spark.operators.dedup import ngram_jaccard_pairs

    plan = _plan(ngram_jaccard_pairs(spark, sf_oracle))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bucketed_join_is_shuffle_free(spark, sf_oracle, tmp_path):
    """Co-bucketed fact tables join without any Exchange: the per-query
    shuffle is pre-paid at write time. The same join on plain parquet
    must show Exchanges — proving the bucket metadata (not data size)
    is what removed them."""
    from pyspark.sql import functions as F

    from hauser_spark.operators.bucketing import cobucket_tables
    from hauser_spark.tables import load_table

    li_name, od_name = cobucket_tables(
        spark, sf_oracle, str(tmp_path), n_buckets=8, suffix="_t"
    )
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # bucketing matters in the shuffle-join regime — past the broadcast
    # threshold; force it so the plan shape is the one bucketing targets
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li, od = spark.table(li_name), spark.table(od_name)
        joined = li.join(od, "l_orderkey").groupBy("o_orderpriority").count()
        plan = _plan(joined)
        assert "SortMergeJoin" in plan, plan
        sort_merge = plan[plan.find("SortMergeJoin"):]
        assert "Exchange" not in sort_merge, plan
        # control: identical join on non-bucketed reads shuffles
        li_p = load_table(spark, sf_oracle, "lineitem")
        od_p = load_table(spark, sf_oracle, "orders").withColumnRenamed(
            "o_orderkey", "l_orderkey"
        )
        control = _plan(li_p.join(od_p, "l_orderkey").groupBy("o_orderpriority").count())
        assert "Exchange" in control
        # and the bucketed join still computes the right thing
        got = {r["o_orderpriority"]: r["count"] for r in joined.collect()}
        exp = {
            r["o_orderpriority"]: r["count"]
            for r in li_p.join(od_p, "l_orderkey").groupBy("o_orderpriority").count().collect()
        }
        assert got == exp
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql(f"DROP TABLE IF EXISTS {li_name}")
        spark.sql(f"DROP TABLE IF EXISTS {od_name}")


def test_range_join_is_hash_not_nested_loop(spark, sf_oracle):
    """The bucketed range-join rewrite must plan as a broadcast HASH join
    (equi-key on the bucket id) — BroadcastNestedLoopJoin here means the
    rewrite regressed to the O(|fact|x|dim|) naive plan."""
    from hauser_spark.operators import rangejoin

    plan = _plan(rangejoin.value_band_revenue(spark, sf_oracle))
    assert "BroadcastHashJoin" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_bloom_prefilter_prunes_and_is_sound(spark, sf_oracle):
    """The bloom pre-filter must (a) admit every true match — no false
    negatives, or the semi-join silently loses rows — and (b) actually
    prune, or the runtime filter is dead weight before the exchange."""
    from pyspark.sql import functions as F

    from hauser_spark.operators import bloomjoin
    from hauser_spark.tables import load_table

    orders = load_table(spark, sf_oracle, "orders")
    li = load_table(spark, sf_oracle, "lineitem")
    keys = orders.filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_totalprice") > 150000.0)
    ).select("o_orderkey")
    bitmap = bloomjoin.build_bloom(keys, "o_orderkey")
    passed = li.filter(
        bloomjoin.bloom_might_contain(F.col("l_orderkey"), bitmap)
    )
    n_total = li.count()
    n_passed = passed.count()
    n_true = li.join(keys, li.l_orderkey == keys.o_orderkey, "left_semi").count()
    # soundness: every true match survives the pre-filter
    n_true_after = passed.join(
        keys, passed.l_orderkey == keys.o_orderkey, "left_semi"
    ).count()
    assert n_true_after == n_true
    # effectiveness: the filter drops a real share of the fact side
    assert n_passed < n_total * 0.7, (n_passed, n_total, n_true)


def test_jaccard_pairs_single_join(spark, sf_oracle):
    """After the n_sh-as-groupBy-key refactor the pair pipeline must
    contain exactly ONE join (the shingle self-join) — reappearing size
    joins mean the functional-dependency trick regressed."""
    from hauser_spark.operators.dedup import ngram_jaccard_pairs

    plan = _plan(ngram_jaccard_pairs(spark, sf_oracle))
    n_joins = sum(
        plan.count(j)
        for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin")
    )
    assert n_joins == 1, plan


def test_cms_estimate_join_broadcast(spark, sf_oracle):
    """The 1024-cell sketch must broadcast for the estimate join — a
    sort-merge join against a fixed-size sketch would shuffle the
    lookup side for nothing."""
    from hauser_spark.operators.sketches import cms_heavy_hitters

    plan = _plan(cms_heavy_hitters(spark, sf_oracle))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_sliding_window_partial_agg(spark, sf_oracle):
    """Hopping windows replicate rows map-side and still combine
    partially before the exchange: >= 2 HashAggregates, and only the
    agg + the final orderBy exchanges appear."""
    from hauser_spark.plans.events import sliding_windows

    plan = _plan(sliding_windows(spark, sf_oracle))
    assert plan.count("HashAggregate") >= 2, plan
    assert plan.count("Exchange") <= 3, plan


def test_connected_components_chain(spark):
    """Min-label propagation crosses a multi-hop chain (diameter > 1)
    and keeps disjoint components apart."""
    from hauser_spark.operators.graph import _connected_components

    und = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "d1 long, d2 long"
    )
    edges = und.selectExpr("d1 as src", "d2 as dst").union(
        und.selectExpr("d2 as src", "d1 as dst")
    )
    got = {
        r["node"]: r["label"] for r in _connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_chain_round_count(spark):
    """Pointer jumping must cross a 16-node chain in O(log d) rounds —
    plain one-hop min propagation would need 15."""
    from hauser_spark.operators.graph import _connected_components

    n = 16
    und = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "d1 long, d2 long"
    )
    edges = und.selectExpr("d1 as src", "d2 as dst").union(
        und.selectExpr("d2 as src", "d1 as dst")
    )
    labels, rounds = _connected_components(edges, with_rounds=True)
    got = {r["node"]: r["label"] for r in labels.collect()}
    assert got == {i: 1 for i in range(1, n + 1)}
    assert rounds <= 6, rounds


def test_connected_components_empty_edges(spark):
    """Zero edges must converge to an empty labelling immediately —
    F.sum over an empty frame is NULL, which once spun the loop to
    MAX_ITERS and raised (ADVICE r2)."""
    from hauser_spark.operators.graph import _connected_components

    edges = spark.createDataFrame([], "src long, dst long")
    assert _connected_components(edges).collect() == []


def test_merge_upsert_never_shuffles_target(spark, sf_oracle):
    """The CDC merge must stay broadcast-only — a SortMergeJoin means the
    full-outer formulation leaked in and the entire target shuffles."""
    from hauser_spark.operators.merge import merge_upsert_orders

    plan = _plan(merge_upsert_orders(spark, sf_oracle))
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 3, plan


def test_text_and_dedup_paths_python_free(spark, sf_oracle):
    """Every text/dedup/sampling query must compile to JVM expressions —
    Python eval nodes in these hot paths are a 10-100x regression. (The
    only sanctioned Python is the BLAS-backed similarity kernels and the
    multimodal codec stubs.)"""
    from hauser_spark.operators import dedup, sampling, text

    for mod in (text, dedup, sampling):
        for name, fn in mod.QUERIES.items():
            plan = _plan(fn(spark, sf_oracle))
            assert "BatchEvalPython" not in plan, name
            assert "ArrowEvalPython" not in plan, name
            assert "FlatMapGroupsInPandas" not in plan, name


def test_basket_pairs_broadcast_and_python_free(spark, sf_oracle):
    """Pair mining: one shuffle builds baskets, pairs explode JVM-side
    (higher-order functions, no Python), and the lift denominators join
    broadcast — the pair table never sort-merge-joins or re-shuffles."""
    from hauser_spark.operators import basket

    df = basket.pair_cooccurrence(spark, sf_oracle)
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_incremental_merge_equals_recompute_and_pushes_down(spark, sf_oracle):
    """The watermark predicate reaches both parquet scans as raw int64
    comparisons (row-group prunable), and merging state ⊕ delta partials
    is row-identical to the from-scratch rollup."""
    from hauser_spark.operators import incremental
    from hauser_spark.tables import load_events_window, load_table

    df = incremental.incremental_rollup(spark, sf_oracle)
    plan = _plan(df)
    assert plan.count("PushedFilters: [IsNotNull(ts)") >= 2 or (
        "LessThan(ts" in plan and "GreaterThanOrEqual(ts" in plan
    ), plan

    full = incremental._partial_rollup(load_table(spark, sf_oracle, "events"))
    merged_raw = incremental.merge_rollups(
        incremental._partial_rollup(
            load_events_window(
                spark, sf_oracle, incremental._LO, incremental.WATERMARK
            )
        ),
        incremental._partial_rollup(
            load_events_window(
                spark, sf_oracle, incremental.WATERMARK, incremental._HI
            )
        ),
    )
    a = sorted(map(tuple, full.collect()))
    b = sorted(map(tuple, merged_raw.collect()))
    assert a == b


def test_table_diff_drilldown_is_bucket_pruned(spark, sf_oracle):
    """Reconciliation: the bucket-summary pass partial-aggregates before
    its exchange, and the row-level phase is gated by a broadcast of the
    dirty-bucket list — the full tables never meet in an open join."""
    from hauser_spark.operators import diff

    df = diff.table_diff(spark, sf_oracle)
    plan = _plan(df)
    assert plan.count("HashAggregate") >= 2, plan
    assert plan.count("Broadcast") >= 2, plan
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_table_diff_identical_tables_is_empty(spark, sf_oracle):
    """Soundness: diffing a table against itself finds nothing (every
    bucket checksum agrees, so the drill-down input is empty)."""
    from hauser_spark.operators import diff
    from hauser_spark.tables import load_table

    a = diff._with_row_hash(load_table(spark, sf_oracle, "orders"))
    sa = diff._bucket_summary(a)
    sb = diff._bucket_summary(a)
    dirty = (
        sa.alias("sa")
        .join(sb.alias("sb"), "__bucket", "full_outer")
        .filter(~F.col("sa.checksum").eqNullSafe(F.col("sb.checksum")))
    )
    assert dirty.count() == 0


def test_streaks_reuse_one_user_partitioning(spark, sf_oracle):
    """Gaps-and-islands: after the window's user_id exchange, both the
    per-island and per-user aggregations must reuse that partitioning —
    the only exchanges are distinct, window, and the final sort."""
    from hauser_spark.plans import events

    df = events.activity_streaks(spark, sf_oracle)
    plan = _plan(df)
    assert plan.count("Exchange") <= 3, plan
    assert plan.count("Window") == 1, plan
    assert "BatchEvalPython" not in plan, plan


def test_sq8_scoring_is_jvm_integer_path(spark, sf_oracle):
    """Quantized ANN must stay in JVM expressions (no Python per pair)
    and never degrade past the single intended broadcast of queries."""
    from hauser_spark.operators import similarity

    df = similarity.sq8_quantized_topk(spark, sf_oracle)
    plan = _plan(df)
    assert "BatchEvalPython" not in plan, plan
    assert "ArrowEvalPython" not in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan


def _walk_physical(node):
    if node.nodeName() == "AdaptiveSparkPlan":
        # initialPlan, NOT inputPlan: inputPlan predates
        # EnsureRequirements, so it contains no Exchange/Sort nodes at
        # all and any gate looking for them is silently vacuous
        # (round-8 find — the broadcast gates below were blind to AQE
        # plans until this).
        yield from _walk_physical(node.initialPlan())
        return
    yield node
    children = node.children()
    for i in range(children.size()):
        yield from _walk_physical(children.apply(i))


def test_scd2_never_shuffles_dimension(spark, sf_oracle):
    """SCD2 apply: every join is a broadcast of the CDC batch (or its
    keys) against the dimension scan — no sort-merge join, no exchange
    of the dimension itself."""
    from hauser_spark.operators import scd

    df = scd.scd2_apply(spark, sf_oracle)
    plan = _plan(df)
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert "CartesianProduct" not in plan, plan


def test_scd2_broadcasts_only_batch_sized_frames(spark, sf_oracle):
    """Broadcast direction gate (VERDICT r3): no BroadcastExchange may
    have a parquet scan of the dimension in its runtime subtree — a
    dimension-derived broadcast OOMs executors at a 10^9-row dimension.
    Batch-sized key frames are cached, so their broadcasts read an
    InMemoryTableScan; the dimension itself is scanned at most twice
    (unchanged + closed branches) and never hash-repartitioned."""
    from hauser_spark.operators import scd

    root = (
        scd.scd2_apply(spark, sf_oracle)
        ._jdf.queryExecution()
        .executedPlan()
    )
    nodes = list(_walk_physical(root))
    joins = [n for n in nodes if "BroadcastHashJoin" in n.nodeName()]
    assert len(joins) >= 3, root.toString()
    for j in joins:
        build_idx = 0 if "BuildLeft" in j.buildSide().toString() else 1
        build = j.children().apply(build_idx)
        for n in _walk_physical(build):
            name = n.nodeName().lower()
            assert not (
                "scan parquet" in name or "filescan" in name
            ), f"broadcast build side scans a table: {j.toString()}"
    # the dimension feeds exactly the two surviving-row branches
    scans = [
        n
        for n in nodes
        if "scan parquet" in n.nodeName().lower()
        or "filescan" in n.nodeName().lower()
    ]
    assert len(scans) <= 2, [n.nodeName() for n in scans]
    assert all(
        "hashpartitioning" not in n.nodeName().lower() for n in nodes
    ), root.toString()


def test_scd2_point_in_time_unforced_residual_equi_join(spark, sf_oracle):
    """Point-in-time lookup: the validity interval must ride as a
    residual on an equi join (hash or sort-merge, AQE's call) — never a
    nested loop — and the dim broadcast is no longer forced."""
    from hauser_spark.operators import scd

    plan = _plan(scd.scd2_point_in_time(spark, sf_oracle))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_dq_audit_anti_joins_broadcast(spark, sf_oracle):
    """Every referential check must anti-join via broadcast of the
    parent keys — no sort-merge join, no cartesian, no Python."""
    from hauser_spark.operators import dq

    plan = _plan(dq.constraint_audit(spark, sf_oracle))
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "BatchEvalPython" not in plan, plan


def test_attribution_single_user_partitioning(spark, sf_oracle):
    """Conversions, both windows, and the final per-user aggregate all
    key on user_id — the plan reuses that partitioning instead of
    re-exchanging per stage."""
    from hauser_spark.plans import events

    plan = _plan(events.touch_attribution(spark, sf_oracle))
    assert plan.count("Exchange") <= 4, plan
    assert "CartesianProduct" not in plan, plan


def test_table_profile_two_scans_no_expand(spark, sf_oracle):
    """The ANALYZE-style profile is exactly TWO passes: one wide
    aggregate for counts/min/max/len, one unpivoted pass feeding the
    bucketed-KMV NDV sketch — never a per-column rescan (11 scans) and
    never the count-distinct Expand (each row duplicated x11 through the
    aggregate), which was the pre-sketch design's scale-killer."""
    from hauser_spark.operators import profile

    plan = _plan(profile.table_profile(spark, sf_oracle))
    assert plan.count("Scan parquet") == 2, plan
    assert "Expand" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_join_strategy_is_controllable(spark, sf_oracle):
    """Physical join strategy responds to hints: the same lineitem⋈orders
    aggregation plans as SortMergeJoin un-hinted (past the broadcast
    threshold), as ShuffledHashJoin with the shuffle_hash hint — and
    both produce identical results. At scale this is the lever when one
    side is large-but-fits-per-partition and the sort is pure waste."""
    from hauser_spark.tables import load_table

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = load_table(spark, sf_oracle, "lineitem")
        od = load_table(spark, sf_oracle, "orders").withColumnRenamed(
            "o_orderkey", "l_orderkey"
        )
        base = li.join(od, "l_orderkey").groupBy("o_orderpriority").count()
        hinted = li.join(od.hint("shuffle_hash"), "l_orderkey").groupBy(
            "o_orderpriority"
        ).count()
        assert "SortMergeJoin" in _plan(base), _plan(base)
        assert "ShuffledHashJoin" in _plan(hinted), _plan(hinted)
        a = {tuple(r) for r in base.collect()}
        b = {tuple(r) for r in hinted.collect()}
        assert a == b and a
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_incremental_dedup_corpus_never_shuffles_incoming_broadcast(
    spark, sf_oracle
):
    """Incremental dedup: the corpus band index is probed by a BROADCAST
    of the incoming batch's keys, and the candidate verification joins
    broadcast the candidate list — at least two broadcast joins, no
    cartesian, no Python in the path."""
    from hauser_spark.operators import dedup

    plan = _plan(dedup.incremental_minhash_dedup(spark, sf_oracle))
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_ivf_index_lifecycle_prunes_partitions(spark, sf_oracle, tmp_path):
    """The persisted IVF index serves identical results to the inline
    operator, and its fine-search scan partition-prunes to the probed
    cells (PartitionFilters on the cell-partitioned corpus)."""
    from hauser_spark.operators import similarity

    idx = str(tmp_path / "ivf")
    similarity.build_ivf_index(spark, sf_oracle, idx)
    served = similarity.ivf_topk_from_index(spark, sf_oracle, idx)
    inline = similarity.ivf_topk(spark, sf_oracle)
    assert sorted(map(tuple, served.collect())) == sorted(
        map(tuple, inline.collect())
    )
    plan = _plan(served)
    assert "PartitionFilters: [" in plan, plan
    seg = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "label" in seg, plan


def test_quality_filters_are_scan_local(spark, sf_oracle):
    """The Gopher/PII/repetition filters must be narrow map stages over
    one parquet scan with map-side partial aggregation — no joins, no
    Python nodes, nothing but the final small-aggregate exchange."""
    from hauser_spark.operators import quality

    # repetition_ratio's public form checkpoints before its global sort
    # (r11: the range sampler otherwise re-runs the tokenize chain),
    # which truncates the printed plan — the gate reads the kernel
    # frame seam instead, where the invariant lives.
    builders = {
        "quality_gopher_rules": quality.QUERIES["quality_gopher_rules"],
        "quality_pii_scan": quality.QUERIES["quality_pii_scan"],
        "quality_repetition_ratio": quality._repetition_frame,
    }
    for name, build in builders.items():
        plan = _plan(build(spark, sf_oracle))
        for node in (
            "Join",
            "CartesianProduct",
            "BatchEvalPython",
            "ArrowEvalPython",
            "FlatMapGroupsInPandas",
        ):
            assert node not in plan, f"{name}: unexpected {node}\n{plan}"
        assert plan.count("Scan parquet") == 1, f"{name}: {plan}"
    # the aggregating two run partial + final aggregation
    for name in ("quality_gopher_rules", "quality_pii_scan"):
        plan = _plan(quality.QUERIES[name](spark, sf_oracle))
        assert plan.count("HashAggregate") >= 2, f"{name}: {plan}"


def test_source_cap_single_source_shuffle(spark, sf_oracle):
    """The per-source cap ranks within source: exactly one hash exchange
    on source feeds the window; no Python, no joins."""
    from hauser_spark.operators import quality

    plan = _plan(quality.source_cap(spark, sf_oracle))
    assert "hashpartitioning(source" in plan, plan
    assert "Join" not in plan and "BatchEvalPython" not in plan, plan


def test_pq_adc_all_joins_broadcast(spark, sf_oracle):
    """PQ: codebook / distance-table / codeword-stat / query-norm sides
    are all tiny and must broadcast — a sort-merge join anywhere in the
    PQ path would shuffle the corpus per query."""
    from hauser_spark.operators import similarity

    plan = _plan(similarity.pq_adc_topk(spark, sf_oracle))
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 4, plan
    assert "CartesianProduct" not in plan, plan


def test_semantic_clusters_no_iterative_shuffles(spark, sf_oracle):
    """Cell-local clustering: exactly ONE Arrow-grouped stage (the
    per-cell union-find — since round 10 the cell-SCORING stage reads
    the near_dup_pairs_cached memo, so a cold plan shows it as a
    pre-built leaf, not a second kernel) and no join at all — the
    iterative label-propagation shape (join per round) must be gone."""
    from hauser_spark.operators import similarity

    plan = _plan(similarity.semantic_dedup_clusters(spark, sf_oracle))
    assert plan.count("FlatMapGroupsInPandas") == 1, plan
    assert "Join" not in plan, plan


def test_bigram_surprisal_no_python_no_cartesian(spark, sf_oracle):
    from hauser_spark.operators import text

    plan = _plan(text.bigram_surprisal(spark, sf_oracle))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan, plan


def test_span_report_bench_side_broadcasts(spark, sf_oracle):
    """Span-level decontam: the benchmark shingle side must broadcast —
    a sort-merge join here would shuffle the corpus shingle stream."""
    from hauser_spark.operators import decontam

    plan = _plan(decontam.contamination_spans(spark, sf_oracle))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_two_stage_rerank_shortlist_broadcasts(spark, sf_oracle):
    """The rerank tier joins corpus vectors to the (tiny) shortlist and
    query side — both broadcast; no corpus shuffle join."""
    from hauser_spark.operators import similarity

    plan = _plan(similarity.two_stage_rerank(spark, sf_oracle))
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan


def test_bpe_pair_count_no_sort_no_join(spark, sf_oracle):
    """One BPE round's pair count explodes arrays_zip of the two
    shifted slices straight into a partial-agg count — never a
    self-join, and (round 11) never a window sort either: the row-form
    lead() paid a full doc-partitioned sort per training round."""
    from pyspark.sql import functions as F

    from hauser_spark.operators import text as t
    from hauser_spark.tables import load_table

    docs = load_table(spark, sf_oracle, "documents")
    ts = docs.select(t.tokens_col(F.col("text")).alias("toks")).filter(
        F.size("toks") >= 2
    )
    counts = (
        ts.selectExpr(
            "slice(toks, 1, size(toks) - 1) AS h",
            "slice(toks, 2, size(toks) - 1) AS t",
        )
        .selectExpr("explode(arrays_zip(h, t)) AS p")
        .selectExpr("p.h AS a", "p.t AS b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = _plan(counts)
    assert "CartesianProduct" not in plan and "Join" not in plan, plan
    assert "Sort" not in plan and "Window" not in plan, plan
    assert plan.count("HashAggregate") >= 2, plan


def test_cdc_compaction_is_aggregate_not_window(spark, sf_oracle):
    """Latest-wins compaction must compile to a max_by aggregate (map-side
    partial per partition), never a window row_number — the window form
    sorts every log partition end-to-end, which at a 100 TB log is the
    difference between one shuffled record per (partition, key) and
    shuffling the log."""
    from hauser_spark.operators.merge import cdc_log_compaction

    plan = _plan(cdc_log_compaction(spark, sf_oracle))
    assert "Window" not in plan, plan
    assert "HashAggregate" in plan or "SortAggregate" in plan, plan


def test_graph_family_no_unbounded_joins(spark, sf_oracle):
    """Every link-graph query must avoid Cartesian/nested-loop joins —
    the KNN sparsification exists precisely so all joins are bounded
    equi-joins on node/edge keys."""
    from hauser_spark.operators import linkgraph

    for name, fn in linkgraph.QUERIES.items():
        plan = _plan(fn(spark, sf_oracle))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_scene_cuts_single_arrow_pass(spark, sf_oracle):
    """Scene-cut detection is ONE doc-local Arrow pass: exactly one
    Python eval node, no per-byte explode, no shuffle before the kernel
    (frames never leave their document).  Reads the kernel frame seam:
    the public query checkpoints before its global sort (r11), which
    truncates the printed plan."""
    from hauser_spark.operators.multimodal import _scene_cuts_frame

    plan = _plan(_scene_cuts_frame(spark, sf_oracle))
    n_py = sum(
        plan.count(n)
        for n in ("MapInPandas", "ArrowEvalPython", "BatchEvalPython")
    )
    assert n_py == 1, plan
    assert "Generate" not in plan, plan  # no explode — bytes stay packed


def test_fk_inclusion_scans_are_column_pruned(spark, sf_oracle):
    """Each table is scanned ONCE with exactly its candidate key
    columns (the r11 per-table fan): a scan pulling non-key columns
    multiplies the branch scans into real IO at 100 TB, and a
    per-column-role scan would read the fat tables 14 times instead
    of 8."""
    from hauser_spark.operators.profile import fk_inclusion

    plan = _plan(fk_inclusion(spark, sf_oracle))
    # lineitem: all three FK columns ride one pruned scan
    assert (
        "ReadSchema: struct<l_orderkey:bigint,l_partkey:bigint,"
        "l_suppkey:bigint>" in plan
    ), plan
    assert "ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint>" in plan, plan
    # no scan pulls a non-key column
    assert "l_quantity" not in plan and "o_totalprice" not in plan, plan


def test_kmeans_assignment_is_map_side(spark, sf_oracle):
    """K-means assignment must be a pure map-side expression (broadcast
    centroids folded into the plan as literals): the only exchanges are
    the final per-cluster aggregate's."""
    from hauser_spark.operators.similarity import kmeans_lloyd

    plan = _plan(kmeans_lloyd(spark, sf_oracle))
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    # assignment + summary: one partial/final aggregate pair over the
    # embedding scan — no join anywhere in the final plan
    for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
        assert j not in plan, plan


def test_no_broadcast_of_generate_over_cached_frame(spark, sf_oracle):
    """Admission gate for the Catalyst size-underestimate class (VERDICT
    r4: it produced two real scale bugs — the graph family and
    containment-LSH both auto-broadcast corpus-sized cache+explode
    frames, OOMing executors at 64x). Cached frames report computed
    stats; an explode on top multiplies rows without multiplying the
    estimate, so Catalyst may broadcast a frame that is corpus-sized at
    runtime. No BroadcastExchange in ANY catalog query may contain a
    Generate over an InMemoryTableScan in its build subtree. Intentional
    tiny-side cases go in ALLOW with a justification."""
    import __spark_entry__ as entry

    ALLOW: dict[str, str] = {
        # explicit, bounded-by-construction broadcasts (each documented
        # at the call site); everything else in the LSH family is now
        # shuffle_hash/merge-pinned (round 8 — this gate was vacuous
        # under AQE until _walk_physical switched to initialPlan and
        # immediately caught 11 queries, 8 of them real)
        "dedup_incremental_minhash": "batch-grain band keys + per-batch"
        " candidate list broadcast by design (corpus side never"
        " shuffles)",
        "decontam_minhash_fuzzy": "benchmark-side band keys — benchmark"
        " suites are KB-to-MB scale by construction",
        "sketch_cms_heavy_hitters": "CMS sketch aggregated to <= D*W ="
        " 1024 cells before the broadcast estimate join",
    }
    from hauser_spark import rankops

    qs = entry.queries()
    offenders = {}
    for name, fn in qs.items():
        if name in ALLOW:
            continue
        # no_checkpoint_barrier: global_rank's localCheckpoint replaces
        # the plan below it with a LogicalRDD, which would blind this
        # walker to every broadcast upstream of a rank (ADVICE r8 —
        # the same class of vacuity the initialPlan fix closed).
        with rankops.no_checkpoint_barrier():
            root = fn(spark, sf_oracle)._jdf.queryExecution().executedPlan()
        n_hits = 0
        for n in _walk_physical(root):
            if "BroadcastExchange" in n.nodeName():
                sub = list(_walk_physical(n))
                has_generate = any(
                    "Generate" in m.nodeName() for m in sub
                )
                has_cached = any(
                    "InMemoryTableScan" in m.nodeName() for m in sub
                )
                if has_generate and has_cached:
                    n_hits += 1
        if n_hits:
            offenders[name] = n_hits
        spark.catalog.clearCache()
    assert not offenders, offenders


def test_triangles_warm_plan_rides_the_memos(spark, sf_oracle):
    """Round-6 gate: a warm triangles run must read the checkpointed
    deg/oriented/adjacency memos (ExistingRDD leaves), not re-derive
    the KNN pipeline — the pre-memo plan was 237 exchanges of pure
    re-analysis.  Warm final plan: one in-row intersect, a handful of
    exchanges, no wedge-materializing join chain."""
    from hauser_spark.operators import linkgraph

    linkgraph.triangles_clustering(spark, sf_oracle).collect()  # warm
    df = linkgraph.triangles_clustering(spark, sf_oracle)
    df.collect()
    plan = _plan(df)
    final = plan.split("== Initial Plan ==")[0]
    assert "Scan ExistingRDD" in final, final
    assert final.count("Exchange") <= 14, final
    assert "array_intersect" in final, final


def test_band_tradeoff_buckets_are_capped_and_single_job(spark, sf_oracle):
    """Round-6 gate: candidate pairs come from an in-row bucket
    aggregate (size-capped collect_list → slice/transform pairs), not a
    banded self-join, so per-bucket fan-out is bounded by HOT_ABS_CAP²
    no matter the corpus."""
    from hauser_spark.operators import dedup

    df = dedup.band_tradeoff(spark, sf_oracle)
    # the result frame is the collected scoreboard; audit the candidate
    # pipeline directly instead
    docs = dedup.load_table(spark, sf_oracle, "documents")
    sh = dedup._shingles(docs)
    sigs = dedup._minhash_signatures(sh.select("doc_id", "sh"))
    plan = _optimized(df)  # tiny local frame — just sanity
    assert df.count() == len(dedup.BAND_CONFIGS)
    # source-level guarantee: the module's cap constant gates the bucket
    import inspect

    src = inspect.getsource(dedup.band_tradeoff)
    assert "HOT_ABS_CAP" in src and "collect_list" in src
    assert ".join(" not in src.split("sort_array")[0], (
        "candidate generation must not self-join the banded frame"
    )


def test_ipf_raking_truncates_lineage_per_round(spark, sf_oracle):
    """Round-6 gate: the unrolled IPF rounds must checkpoint — without
    it each half-round doubles the plan subtree (520 exchanges for a
    100-row frame)."""
    from hauser_spark.operators import sampling

    df = sampling.ipf_raking(spark, sf_oracle)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert "Scan ExistingRDD" in final, final
    assert final.count("Exchange") <= 4, final


def test_burrows_delta_single_grid_pass(spark, sf_oracle):
    """Round-6 gate: per-word moments are window aggregates and pair
    terms are generated in-row, so the grid subtree appears ONCE — the
    moments-join + z⋈z shape re-expanded it four times."""
    from hauser_spark.operators import text

    df = text.burrows_delta(spark, sf_oracle)
    df.collect()
    plan = _plan(df)
    final = plan.split("== Initial Plan ==")[0]
    # one wordcount aggregate pair feeding one window; no self-join of
    # the z frame (the only joins left are the top-words/rate grid)
    assert final.count("SortMergeJoin") <= 2, final
    assert "Window" in final, final


def test_nprobe_sweep_is_one_pass_riding_the_memos(spark, sf_oracle):
    """Round-7 gate (VERDICT r6 task 3): the five-level nprobe sweep
    must be ONE window pass + ONE conditional aggregate over the
    max-nprobe scored pairs, riding the centroid and exact-ranker
    checkpoint memos — the pre-rewrite shape re-ranked and re-joined
    per level (5x plan replication, 190 exchange mentions, BNL x40)."""
    from hauser_spark.operators import similarity

    similarity.nprobe_recall_sweep(spark, sf_oracle).collect()  # warm
    df = similarity.nprobe_recall_sweep(spark, sf_oracle)
    df.collect()
    plan = _plan(df)
    final = plan.split("== Initial Plan ==")[0]
    assert "Scan ExistingRDD" in final, final  # memos, not rebuilds
    assert plan.count("Exchange") <= 40, plan.count("Exchange")
    assert final.count("Exchange") <= 10, final
    # one probe BNL is inherent (query x centroid); the per-level
    # re-rank replication is what the gate forbids
    assert final.count("BroadcastNestedLoop") <= 1, final
    src_windows = final.count("Window")
    assert src_windows <= 6, f"per-level window replication: {src_windows}"


def test_curation_family_warm_plans_ride_the_verdict_memo(spark, sf_oracle):
    """Round-7 gate (VERDICT r6 task 6): every query composing on the
    curation verdicts must read the checkpointed verdict frame (an
    ExistingRDD leaf, no md5/minhash near-dup stage in the warm final
    plan) — bypassing the memo re-executes the whole quality→exact-dup
    →near-dup pipeline per query (funnel was 2.4 s -> 0.27 s on the
    memo)."""
    from hauser_spark.operators import curation

    family = (
        "curate_documents",
        "curation_summary",
        "curation_effective_tokens",
        "curation_shard_skew",
    )
    for name in family:
        fn = curation.QUERIES[name]
        fn(spark, sf_oracle).collect()  # warm the memo
        df = fn(spark, sf_oracle)
        df.collect()
        final = _plan(df).split("== Initial Plan ==")[0]
        assert "Scan ExistingRDD" in final, (name, final)
        assert "md5" not in final, (name, "near-dup stage re-derived")
        assert final.count("Exchange") <= 4, (name, final)


def test_lsh_family_warm_plans_ride_the_pair_memo(spark, sf_oracle):
    """Round-9 gate (VERDICT r8 task 1): every query composing on the
    LSH-verified pair frame must read the checkpointed memo (an
    ExistingRDD leaf — no minhash/banding stage in the warm final plan).
    Bypassing the memo re-bands the corpus per query (method_agreement
    was 2.58 s, the suite's #3 query, rebuilding BOTH pair frames;
    measured at sf0.1: 3.5 s/rebuild vs 0.17 s/warm read)."""
    import __spark_entry__ as entry

    qs = entry.queries()
    family = (
        "dedup_minhash_lsh",
        "dedup_simhash_hamming",
        "dedup_method_agreement",
        "dedup_cross_source_contamination",
        "dedup_transitivity_audit",
        "curation_stage_order_whatif",
        "curation_dup_quality_contingency",
        "sample_split_leakage",
    )
    for name in family:
        fn = qs[name]
        fn(spark, sf_oracle).collect()  # warm the memo
        df = fn(spark, sf_oracle)
        df.collect()
        final = _plan(df).split("== Initial Plan ==")[0]
        assert "Scan ExistingRDD" in final, (name, final)
        # the banded candidate pipelines must NOT be re-derived: the
        # MinHash path would show its band_key projection, the SimHash
        # path its bit_count hamming compare (md5 alone is no signal —
        # several consumers fingerprint docs with md5 legitimately)
        assert "band_key" not in final, (name, "LSH pairs re-derived")
        assert "bit_count" not in final, (name, "SimHash pairs re-derived")
    spark.catalog.clearCache()


def test_near_dup_family_warm_plans_ride_the_pair_memo(spark, sf_oracle):
    """Round-10 gate (VERDICT r9 task 4): every query composing on the
    cell-bounded cosine pair frame must read the checkpointed memo (an
    ExistingRDD leaf — no Arrow applyInPandas scoring stage in the warm
    final plan).  Bypassing the memo re-runs the BLAS kernel per query
    (measured at sf0.1: ~0.5-0.6 s per rebuild × 4 redundant consumers;
    hubness 1.68 s → 0.92 s on the memo)."""
    import __spark_entry__ as entry

    qs = entry.queries()
    family = (
        "sim_embedding_near_dup",
        "sim_semantic_dedup_clusters",
        "sim_dedup_threshold_sweep",
        "sim_hubness_audit",
        "sim_semdedup_tau_sweep",
    )
    for name in family:
        fn = qs[name]
        fn(spark, sf_oracle).collect()  # warm the memo
        df = fn(spark, sf_oracle)
        df.collect()
        final = _plan(df).split("== Initial Plan ==")[0]
        # ExistingRDD is the physical memo leaf; LogicalRDD is its
        # logical face, which is all that survives when AQE folds an
        # empty filter result (near_dup at tau=0.95 has zero pairs on
        # the synthetic embeddings) to an EmptyRelation
        assert "ExistingRDD" in final or "LogicalRDD" in final, (
            name,
            final,
        )
        # the Arrow cell-SCORING stage must NOT be re-derived (other
        # Arrow kernels are legitimate — clusters runs a cluster_cell
        # CC kernel ABOVE the memoized pair frame)
        assert "score_cell" not in final, (
            name,
            "pair kernel re-derived",
        )
    spark.catalog.clearCache()


def test_wave8_single_pass_shapes(spark, sf_oracle):
    """Round-7 wave-8 gates: the ablation grid, length sweep, compaction
    planner, and BH-FDR are single-scan conditional aggregates — no
    joins, no Python, no row-multiplying explode BEFORE aggregation
    (the inline() that stacks result rows runs above the aggregate on a
    1-row/m-row frame, which is free)."""
    from hauser_spark.operators import profile, quality, stats

    cases = {
        "quality_filter_ablation_grid": quality.QUERIES[
            "quality_filter_ablation_grid"
        ],
        "quality_length_threshold_sweep": quality.QUERIES[
            "quality_length_threshold_sweep"
        ],
        "profile_compaction_planner": profile.QUERIES[
            "profile_compaction_planner"
        ],
        "stats_bh_fdr": stats.QUERIES["stats_bh_fdr"],
    }
    for name, fn in cases.items():
        plan = _plan(fn(spark, sf_oracle))
        for node in (
            "Join",
            "CartesianProduct",
            "BatchEvalPython",
            "ArrowEvalPython",
            "FlatMapGroupsInPandas",
        ):
            assert node not in plan, f"{name}: unexpected {node}\n{plan}"
        assert plan.count("Scan parquet") == 1, f"{name}: {plan}"
        # map-side partial + final aggregation
        assert plan.count("HashAggregate") >= 2, f"{name}: {plan}"
    # the two sweep queries must aggregate BELOW the row-stacking
    # Generate: a Generate feeding an aggregate would be the row
    # multiplication this design avoids
    for name in (
        "quality_filter_ablation_grid",
        "quality_length_threshold_sweep",
    ):
        plan = _plan(cases[name](spark, sf_oracle))
        gen = plan.find("Generate")
        agg = plan.rfind("HashAggregate")
        assert gen != -1 and gen < agg, (
            f"{name}: inline() must sit above the aggregate\n{plan}"
        )


def test_no_singlepartition_window_over_unbounded_frames(spark, sf_oracle):
    """Round-8 gate (VERDICT r7 task 5): a window spec with ORDER BY but
    no PARTITION BY requires SinglePartition — Spark moves EVERY input
    row to one task.  Fine on a 10-row rollup; a scale-killer on a
    fact/user/doc/customer/part-grain frame (the segment-migration
    class).  Catalog-wide ban with two escapes:

    - rankops.global_rank's bucket cumulative (orders by the synthetic
      ``__s`` bucket id, <= RANK_BUCKETS rows by construction) — the
      sanctioned device unbounded-grain ranks must ride;
    - ALLOW-listed queries whose windowed frame is bounded by its key
      DOMAIN, not the row count (calendar days, histogram bins,
      sources, distinct price/cents values, ...), each with the bound
      written next to it.

    Top-k rank windows need no escape: a literal ``rank <= k`` filter
    rewrites to TakeOrderedAndProject / WindowGroupLimit, which never
    plans a SinglePartition exchange over the full frame.
    """
    import __spark_entry__ as entry

    ALLOW = {
        # day-grain rollups: |days| is a time-domain constant at any SF
        "events_anomaly_mad_days": "daily rollup (+ tiny y/dev ranks)",
        "events_click_purchase_xcorr": "daily rollup lags",
        "events_cusum_changepoint": "daily cumulative",
        "events_moving_avg_7d": "daily range frame",
        "events_revenue_acf": "daily lags",
        "events_revenue_drawdown": "daily running peak + 1-row argmax",
        "events_seasonal_decompose": "daily range frames",
        "events_survival_km": "duration-days risk sets",
        "stats_ljung_box_revenue": "daily lags",
        "stats_runs_test_revenue": "daily lag + day-grain rank",
        "stats_sprt_monitor": "daily cumulative + scalar mins",
        "weekly_revenue_wow": "weekly lag",
        "events_theil_sen_trend": "day-PAIR grain (days^2, still a"
        " time-domain statistic, not data-volume-bound)",
        # distinct-value-domain grain: the domain saturates (prices,
        # cents) so the frame grows sublinearly and plateaus
        "part_skyline": "distinct retail prices",
        "profile_equi_depth_histogram": "distinct order cents",
        "profile_ks_two_sample": "distinct order values",
        "stats_kruskal_wallis": "distinct purchase cents",
        "stats_mann_whitney_utest": "distinct purchase cents",
        "stats_spearman_corr": "distinct daily x/y values",
        # small fixed domains
        "curation_dsir_weights": "source grain (dozens)",
        "curation_mixture_waterfill": "source grain (dozens)",
        "quality_eb_shrunk_rates": "source grain (dozens)",
        "events_value_histogram": "fixed histogram bins",
        "sketch_histogram_quantiles": "fixed histogram bins",
        "sketch_quantile_merge_audit": "fixed histogram bins",
        "graph_nation_modularity": "25 nations",
        "stats_bh_fdr": "event-type grain (<= 5)",
        "sim_cell_balance_audit": "IVF cell grain (<= K_CELLS)",
        "events_segment_migration": "distinct activity levels"
        " (log-of-corpus statistic, NOT user grain)",
        "stats_gini_lorenz": "10-decile reaggregation",
        "events_watermark_state_size": "60s time-domain cell spine"
        " suffix-min + hour-window sweep line (calendar grain, the"
        " gapfill-spine class — grows with the clock, not the volume)",
        "events_keyed_state_size": "same 60s time-domain cell spine"
        " suffix-min as events_watermark_state_size (calendar grain)",
        "events_watermark_policy_planner": "composes the state-size"
        " leg's 60s time-domain cell spine (calendar grain) on the"
        " shared planner ladder",
    }
    from hauser_spark import rankops

    qs = entry.queries()
    offenders = {}
    for name, fn in qs.items():
        # audit the FULL plan: global_rank's checkpoint barrier would
        # otherwise hide any window upstream of a rank (ADVICE r8)
        with rankops.no_checkpoint_barrier():
            root = fn(spark, sf_oracle)._jdf.queryExecution().executedPlan()
        bad = []
        for n in _walk_physical(root):
            if "Window" not in n.nodeName():
                continue
            spec = n.simpleString(120)
            for m in list(_walk_physical(n))[1:]:
                if "Exchange" in m.nodeName():
                    if "SinglePartition" in str(m.outputPartitioning()):
                        if "__s#" not in spec and name not in ALLOW:
                            bad.append(spec[:120])
                    break
        if bad:
            offenders[name] = bad
        spark.catalog.clearCache()
    assert not offenders, offenders
