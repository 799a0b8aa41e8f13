"""The driver's correctness run walks ``queries()`` in insertion order and
stops at a ~50-row budget; ``__spark_entry__._PRIORITY`` therefore IS the
round's external-verification plan.  Pin it: every priority name must be a
declared query with an oracle, and the merged dict must lead with the
priority list verbatim (a module re-ordering or a typo in the list would
silently burn the budget on already-green rows)."""

import glob
import json
import re

import __spark_entry__ as entrymod

#: Queries whose green driver row predates a reshape of their output (so
#: the row no longer certifies the current query), keyed by the round the
#: reshape landed in: ``{name: reshape_round}``.  An entry retires
#: AUTOMATICALLY once a green row lands in ``CORRECTNESS_r{N}.json`` with
#: ``N >= reshape_round`` — round 7 began red because a hand-maintained
#: set (then ``{"dedup_band_tradeoff"}``) outlived the very driver row
#: that satisfied it (VERDICT r7 what's-wrong #1).
STALE_RECHECKS: dict[str, int] = {
    # round 9: keep-farthest-from-centroid policy columns added
    # (n_dropped_far / n_kept_far / keep_far_ppm) — the r8 green row
    # certifies the old 6-column shape
    "sim_semdedup_tau_sweep": 9,
    # round 10: all-late windows/keys (evict_at <= first_arr) excluded
    # from state-row creation (ADVICE r9 medium) — the r9 green rows
    # certify the old arithmetic that summed negative residencies
    "events_watermark_state_size": 10,
    "events_keyed_state_size": 10,
}


def _green() -> tuple[dict[str, bool], dict[str, int]]:
    """(latest-check green flag, highest round with a green row) per
    query, from every driver correctness artifact present.  Glob, don't
    hand-list: a hand-maintained tuple lagged a round twice (r05, r06)
    and mis-staged the next round's _PRIORITY (VERDICT r6 task 2)."""
    paths = glob.glob("CORRECTNESS_r*.json")
    assert paths, "no CORRECTNESS_r*.json found next to the repo root"
    rounds = sorted(
        (int(m.group(1)), p)
        for p in paths
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    )
    latest: dict[str, bool] = {}
    green_round: dict[str, int] = {}
    for rnd, path in rounds:
        for name, row in json.load(open(path)).items():
            ok = bool(
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            )
            latest[name] = ok
            if ok:
                green_round[name] = rnd
    return latest, green_round


def _needs_check() -> list[str]:
    """Queries that need a driver (re-)check, in queries() order: never
    driver-checked, red at their latest check, or reshaped since their
    last green row."""
    latest, green_round = _green()
    return [
        n
        for n in entrymod.queries()
        if not latest.get(n, False)
        or green_round.get(n, -1) < STALE_RECHECKS.get(n, 0)
    ]


def test_priority_names_are_declared():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    missing_q = [p for p in entrymod._PRIORITY if p not in q]
    missing_o = [p for p in entrymod._PRIORITY if p not in o]
    assert not missing_q, missing_q
    assert not missing_o, missing_o


def test_queries_lead_with_priority():
    head = list(entrymod.queries())[: len(entrymod._PRIORITY)]
    assert head == entrymod._PRIORITY
    ohead = list(entrymod.oracle_sql())[: len(entrymod._PRIORITY)]
    assert ohead == entrymod._PRIORITY


def test_tail_is_age_first():
    """Round-11 rule (VERDICT r10 task 2): after the _PRIORITY head, the
    ordering is oldest-driver-check-first (name tie-break), so surplus
    budget rotates onto the longest-unchecked rows instead of re-running
    recently-green families.  Derived from the committed
    CORRECTNESS_r*.json history, so it self-maintains round over round."""
    names = list(entrymod.queries())
    last = entrymod._last_driver_check()
    tail = names[len(entrymod._PRIORITY):]
    keys = [(last.get(n, 0), n) for n in tail]
    assert keys == sorted(keys), "tail not ordered oldest-check-first"
    # queries() and oracle_sql() must walk in the SAME order — the name
    # tie-break exists because per-module QUERIES/ORACLES dicts don't
    # agree on insertion order
    assert list(entrymod.oracle_sql()) == names


def test_budget_head_spends_no_slot_on_green_rows():
    # The driver contract this guards: every query needing a check must
    # land inside the 50-row budget window, and when MORE than 50 need
    # one, no slot may go to an already-green row.  Green rows inside
    # the head while needs-check rows also fit is merely a free
    # re-confirmation, NOT a failure — asserting otherwise made every
    # round *begin* red the moment the driver's own CORRECTNESS file
    # landed and flipped the head green (VERDICT r7 what's-wrong #1).
    needs = _needs_check()
    if not needs:
        return  # all declared queries green at their latest check
    head = list(entrymod.queries())[:50]
    missing = [n for n in needs[:50] if n not in head]
    assert not missing, (
        f"queries needing a driver check fall outside the 50-row budget "
        f"window: {missing}"
    )
    if len(needs) > 50:
        needy = set(needs)
        misplaced = [n for n in head if n not in needy]
        assert not misplaced, (
            f"budget slots spent on already-green rows while "
            f"{len(needs)} queries still need a check: {misplaced}"
        )
