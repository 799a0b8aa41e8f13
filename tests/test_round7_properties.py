"""Round-7 property tests: ADVICE-driven guards and new invariants."""

from pyspark.sql import functions as F  # noqa: F401

SF = "/root/testdata/sf0.01"


def test_welch_ttest_degenerate_arm_is_guarded(spark, tmp_path):
    """An empty (or singleton) weekend arm must yield NULL t/df, a NULL
    (empty) or defined (singleton) mean_diff, and reject_equal_means=0
    — not a division-by-zero NaN cascade (ADVICE r6)."""
    from hauser_spark.operators.stats import welch_ttest

    sf = str(tmp_path / "sf_synth")
    # 50 purchases, all on a Monday (2026-01-05) -> weekend arm empty
    (
        spark.range(50)
        .selectExpr(
            "CAST(id AS STRING) AS user_id",
            "timestamp'2026-01-05 12:00:00' + make_interval(0,0,0,0,0,0,id)"
            " AS ts",
            "'purchase' AS event_type",
            "1.0 + id AS value",
        )
        .write.parquet(f"{sf}/events.parquet")
    )
    r = welch_ttest(spark, sf).collect()[0]
    assert r.n_weekend == 0 and r.n_weekday == 50
    assert r.mean_diff is None
    assert r.t_value is None and r.welch_df is None
    assert r.reject_equal_means == 0

    # singleton weekend arm (one Saturday event): mean_diff defined,
    # t/df still NULL (variance of a singleton is undefined)
    sf2 = str(tmp_path / "sf_synth2")
    (
        spark.range(50)
        .selectExpr(
            "CAST(id AS STRING) AS user_id",
            "IF(id = 0, timestamp'2026-01-03 12:00:00',"
            " timestamp'2026-01-05 12:00:00') AS ts",
            "'purchase' AS event_type",
            "1.0 + id AS value",
        )
        .write.parquet(f"{sf2}/events.parquet")
    )
    r2 = welch_ttest(spark, sf2).collect()[0]
    assert r2.n_weekend == 1 and r2.n_weekday == 49
    assert r2.mean_diff is not None
    assert r2.t_value is None and r2.welch_df is None
    assert r2.reject_equal_means == 0


def test_welch_ttest_normal_path_unchanged(spark):
    """On the real sf0.01 data (both arms populous) the guard is inert:
    t/df are non-NULL and the flag agrees with |t| vs the 5% z."""
    from hauser_spark.operators.stats import welch_ttest

    r = welch_ttest(spark, SF).collect()[0]
    assert r.n_weekend >= 2 and r.n_weekday >= 2
    assert r.t_value is not None and r.welch_df is not None
    assert r.reject_equal_means == (1 if abs(r.t_value) > 1.959964 else 0)


def test_memo_put_bounds_and_evicts_cross_app():
    """Session memos hold localCheckpoint blocks; the bounded put must
    cap per-application entries FIFO and eagerly drop entries from
    other (dead) applications (ADVICE r6)."""
    from hauser_spark.memo import MEMO_MAX_ENTRIES, memo_put

    memo = {}
    for i in range(MEMO_MAX_ENTRIES + 3):
        memo_put(memo, ("app-1", f"sf{i}"), i)
    assert len(memo) == MEMO_MAX_ENTRIES
    # FIFO: oldest sf_dirs evicted, newest retained
    assert ("app-1", "sf0") not in memo
    assert ("app-1", f"sf{MEMO_MAX_ENTRIES + 2}") in memo
    # a new application evicts every stale entry
    memo_put(memo, ("app-2", "sfX"), 99)
    assert list(memo) == [("app-2", "sfX")]


def test_memoized_families_still_share_frames(spark):
    """The bounded memo must not break sharing: two curation queries in
    the same session reuse one checkpointed verdict frame."""
    from hauser_spark.operators import curation

    curation._CURATE_MEMO.clear()
    curation.effective_tokens(spark, SF).collect()
    assert len(curation._CURATE_MEMO) == 1
    first = next(iter(curation._CURATE_MEMO.values()))
    curation.shard_skew(spark, SF).collect()
    assert next(iter(curation._CURATE_MEMO.values())) is first


def test_url_canonicalizer_handles_the_standard_messes(spark):
    """Hand-written raw URLs -> expected canonical forms: case, www,
    default ports, tracking params, param order, fragments, trailing
    slashes, non-default port retention."""
    from hauser_spark.operators.urlnorm import canonical_url_sql

    cases = [
        ("HTTP://WWW.Ex.COM:80/p/1/?utm_source=x&b=2&a=1#frag",
         "http://ex.com/p/1?a=1&b=2"),
        ("https://ex.com:443/", "https://ex.com/"),
        ("https://ex.com:8443/x", "https://ex.com:8443/x"),
        ("http://ex.com/p/2?lang=en&id=2",
         "http://ex.com/p/2?id=2&lang=en"),
        ("http://ex.com/p/2?id=2&lang=en",
         "http://ex.com/p/2?id=2&lang=en"),
        ("http://ex.com", "http://ex.com/"),
        ("http://ex.com/?ref=feed&utm_medium=m", "http://ex.com/"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [
        r.c
        for r in df.selectExpr(
            f"{canonical_url_sql('url', 'spark')} AS c"
        ).collect()
    ]
    assert got == [c for _, c in cases], list(zip(got, cases))

    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE u(url VARCHAR)")
    con.executemany("INSERT INTO u VALUES (?)", [(u,) for u, _ in cases])
    dgot = [
        r[0]
        for r in con.execute(
            f"SELECT {canonical_url_sql('url', 'duckdb')} FROM u"
        ).fetchall()
    ]
    assert dgot == got, list(zip(dgot, got))
