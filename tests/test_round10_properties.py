"""Round-10 admission property tests.

Each new operator pins the property that makes it non-vacuous on the
driver fixture — the oracle-parity suite proves cross-engine equality;
these prove the NUMBERS move for the reason the docstring claims.
"""

from pyspark.sql import functions as F  # noqa: F401


# ------------------------------------- funnel under lateness


def test_funnel_under_lateness_saturates_and_moves(spark, sf_oracle):
    """A reorder buffer covering the max jitter restores the
    event-time-true conversion table EXACTLY (zero users differ,
    buffered count equals truth); at D=0 the out-of-order stream flips
    a nonzero set of users' conversions — the strict-order-funnel
    blast radius the query exists to price."""
    from hauser_spark.plans.events import (
        ARRIVAL_JITTER_SEC,
        funnel_under_lateness,
    )

    rows = funnel_under_lateness(spark, sf_oracle).collect()
    assert rows[-1].buffer_sec >= ARRIVAL_JITTER_SEC
    assert rows[-1].n_users_diff == 0
    assert rows[-1].n_converted_buffered == rows[-1].n_converted_true
    assert rows[0].n_users_diff > 0
    # truth column is the same event-time table at every buffer size
    truths = {r.n_converted_true for r in rows}
    assert len(truths) == 1
    # non-degenerate funnel: some but not all users convert on truth
    assert 0 < rows[-1].n_converted_true < rows[-1].n_users


def test_funnel_under_lateness_flips_both_ways(spark, sf_oracle):
    """The lateness mechanism moves conversions BOTH ways (a late view
    breaks a chain; a late purchase surfacing after a click fabricates
    one): at some sub-saturation buffer the buffered count differs from
    truth, and across the ladder the buffered counts are not constant —
    the curve is a real function of D, not an offset."""
    from hauser_spark.plans.events import funnel_under_lateness

    rows = funnel_under_lateness(spark, sf_oracle).collect()
    sub = rows[:-1]
    assert any(
        r.n_converted_buffered != r.n_converted_true for r in sub
    )
    assert len({r.n_converted_buffered for r in rows}) > 1


# ------------------------------------- IVF index staleness


def test_structured_embeddings_have_real_cosine_clusters(spark, sf_oracle):
    """The planted-structure view must create what the raw fixture
    lacks (the recorded round-9 decline evidence): within-label mean
    cosine far above cross-label.  Without this the staleness audit
    would be vacuous again."""
    from pyspark.sql import functions as F

    from hauser_spark.operators.similarity import (
        _dot,
        _norm,
        embeddings_with_structure,
    )

    emb = embeddings_with_structure(spark, sf_oracle).limit(120)
    a = emb.selectExpr("vec_id AS i1", "label AS l1", "v AS v1")
    b = emb.selectExpr("vec_id AS i2", "label AS l2", "v AS v2")
    pairs = a.crossJoin(b).filter("i1 < i2").select(
        (F.col("l1") == F.col("l2")).alias("same"),
        (
            _dot(F.col("v1"), F.col("v2"))
            / (_norm(F.col("v1")) * _norm(F.col("v2")))
        ).alias("cos"),
    )
    rows = {
        r.same: r.m
        for r in pairs.groupBy("same").agg(F.avg("cos").alias("m")).collect()
    }
    assert rows[True] > 0.5
    assert abs(rows[False]) < 0.3
    assert rows[True] - rows[False] > 0.4


def test_staleness_gap_positive_then_saturates(spark, sf_oracle):
    """The stale index must lose real recall at small nprobe (the
    moved-cluster mass) and be EXACTLY equivalent to the fresh index
    when every cell is probed; the fresh index dominates at every
    ladder point."""
    from hauser_spark.operators.similarity import ivf_staleness_audit

    rows = ivf_staleness_audit(spark, sf_oracle).collect()
    assert rows[0].gap_ppm > 0
    assert rows[-1].gap_ppm == 0
    assert rows[-1].hits_stale == rows[-1].hits_fresh
    for r in rows:
        assert r.hits_fresh >= r.hits_stale
        assert 0 < r.recall_stale_ppm <= 1_000_000


def test_misroute_decay_is_monotone_and_bounded(spark, sf_oracle):
    """The rebuild-cadence physics: at age 0 stale and fresh indexes
    are the same table (exact-zero everything); stale misroute then
    climbs monotonically with index age, never exceeds the cumulative
    moved-label mass (a misrouted vector must be a moved one under
    this geometry), and the fresh index stays pinned at its age-0
    level."""
    from hauser_spark.operators.similarity import index_misroute_decay

    rows = index_misroute_decay(spark, sf_oracle).collect()
    assert rows[0].index_age == 0
    assert rows[0].moved_mass_ppm == 0
    assert rows[0].misroute_stale_ppm == rows[0].misroute_fresh_ppm == 0
    stale = [r.misroute_stale_ppm for r in rows]
    assert stale == sorted(stale)
    assert stale[-1] > 0
    moved = [r.moved_mass_ppm for r in rows]
    assert moved == sorted(moved) and moved[-1] > moved[1] > 0
    for r in rows:
        assert r.misroute_stale_ppm <= r.moved_mass_ppm
        assert r.misroute_fresh_ppm == rows[0].misroute_fresh_ppm


def test_policy_planner_recommends_cheapest_feasible(spark, sf_oracle):
    """One row per drop SLO; the recommended delay meets its SLO
    (late_ppm <= slo), tightening the SLO never loosens the delay, the
    recommendations are non-degenerate (>= 3 distinct settings on this
    fixture), and costs (state row-seconds) are nondecreasing as the
    SLO tightens — the cheapest-feasible contract."""
    from hauser_spark.plans.events import (
        DROP_SLO_PPM,
        watermark_policy_planner,
    )

    rows = watermark_policy_planner(spark, sf_oracle).collect()
    assert len(rows) == len(DROP_SLO_PPM)
    assert [r.slo_ppm for r in rows] == sorted(DROP_SLO_PPM, reverse=True)
    for r in rows:
        assert r.late_ppm <= r.slo_ppm
    delays = [r.delay_sec for r in rows]
    assert delays == sorted(delays)
    assert len(set(delays)) >= 3
    costs = [r.state_row_sec for r in rows]
    assert costs == sorted(costs)
    # the zero-drop setting is fully complete and fully on time
    assert rows[-1].windows_complete_ppm == 1_000_000
    assert rows[-1].on_time_ppm == 1_000_000
