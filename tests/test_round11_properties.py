"""Round-11 admission property tests.

Each new operator pins the property that makes it non-vacuous on the
driver fixture — the oracle-parity suite proves cross-engine equality;
these prove the NUMBERS move for the reason the docstring claims.
"""


# ------------------------------------- stale probe policy


def test_stale_probe_policy_grid_shape(spark, sf_oracle):
    """The (age, nprobe) recall grid behaves like a grid, not a
    constant: recall is non-decreasing in nprobe within each age,
    exactly 1.0 at saturation (probing every cell = the exact ranker),
    non-increasing in age at nprobe=1 (cumulative moved mass), and
    perfect at age 0 (the index matches its corpus)."""
    from hauser_spark.operators.similarity import (
        STALE_NPROBES,
        stale_probe_policy,
    )

    rows = {
        r["index_age"]: r
        for r in stale_probe_policy(spark, sf_oracle).collect()
    }
    assert sorted(rows) == [0, 1, 2, 3]
    for age, r in rows.items():
        recalls = [r[f"recall_np{np_}_ppm"] for np_ in STALE_NPROBES]
        assert recalls == sorted(recalls), (age, recalls)
        assert recalls[-1] == 1_000_000, (age, recalls)
    assert rows[0]["recall_np1_ppm"] == 1_000_000
    np1 = [rows[a]["recall_np1_ppm"] for a in (0, 1, 2, 3)]
    assert np1 == sorted(np1, reverse=True), np1


def test_stale_probe_policy_decision_moves(spark, sf_oracle):
    """The policy content (the round-11 vet): min_nprobe MOVES across
    ages — and the age-1 plateau is real: no sub-saturation probe
    budget improves on nprobe=1 (probe_gain exactly 0: a coherently
    moved cluster ranks its true cell below every sub-saturation rung),
    while at age 2 extra probes DO buy recall back (probe_gain > 0).
    A static decision column would have been declined."""
    from hauser_spark.operators.similarity import stale_probe_policy

    rows = {
        r["index_age"]: r
        for r in stale_probe_policy(spark, sf_oracle).collect()
    }
    mins = [rows[a]["min_nprobe"] for a in (0, 1, 2, 3)]
    assert len(set(mins)) >= 2, mins
    assert rows[0]["min_nprobe"] == 1
    assert rows[1]["probe_gain_ppm"] == 0, rows[1]
    assert rows[2]["probe_gain_ppm"] > 0, rows[2]
    # every min_nprobe actually clears the SLO, and no smaller rung does
    from hauser_spark.operators.similarity import STALE_NPROBES

    for a, r in rows.items():
        m = r["min_nprobe"]
        assert r[f"recall_np{m}_ppm"] >= r["slo_ppm"], (a, r)
        for np_ in STALE_NPROBES:
            if np_ < m:
                assert r[f"recall_np{np_}_ppm"] < r["slo_ppm"], (a, np_)


# ------------------------------------- rebuild cadence planner


def test_cadence_planner_recommendation_moves(spark, sf_oracle):
    """The round-11 vet for the planner: the cheapest cadence must move
    on BOTH axes — rebuild cost (cheap rebuilds → shorter cadence) and
    recall SLO (the stricter SLO makes stale operation cost 10 probes
    per query from age 1, flipping cheap-rebuild deployments to
    cadence 1).  A fixture where one corner dominated everywhere would
    have been declined as a static join."""
    from hauser_spark.operators.similarity import rebuild_cadence_planner

    rows = {
        (r["slo_ppm"], r["rebuild_cost"]): r
        for r in rebuild_cadence_planner(spark, sf_oracle).collect()
    }
    cadences = {k: r["cadence"] for k, r in rows.items()}
    assert len(set(cadences.values())) >= 3, cadences
    # cadence non-decreasing in rebuild cost at fixed SLO
    for slo in (750_000, 850_000):
        seq = [cadences[(slo, rc)] for rc in (1_000, 20_000, 100_000)]
        assert seq == sorted(seq), (slo, seq)
    # the strict SLO never recommends a LONGER cadence than the loose
    # one at the same rebuild cost... except where saturation probing
    # already dominates — pin the fixture's actual table instead
    assert cadences[(750_000, 1_000)] == 2
    assert cadences[(850_000, 1_000)] == 1
    assert cadences[(750_000, 20_000)] == 3
    for r in rows.values():
        assert r["cost_total"] == r["cost_rebuilds"] + r["cost_probes"]
        assert r["cost_total"] > 0
