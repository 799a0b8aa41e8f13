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
