"""The driver's correctness run walks ``queries()`` in insertion order and
stops at a ~50-row budget; ``__spark_entry__._PRIORITY`` therefore IS the
round's external-verification plan.  Pin it: every priority name must be a
declared query with an oracle, and the merged dict must lead with the
priority list verbatim (a module re-ordering or a typo in the list would
silently burn the budget on already-green rows)."""

import glob
import json

import __spark_entry__ as entrymod

#: Queries whose latest green driver row predates a reshape of their
#: output (so the row no longer certifies the current query) — they
#: legitimately occupy budget slots despite being green on file.
#: (dedup_band_tradeoff gained n_capped_buckets/n_capped_pairs columns
#: in round 7, after its round-6 green row.)
STALE_RECHECKS: set[str] = {"dedup_band_tradeoff"}


def _green() -> dict[str, bool]:
    # Glob, don't hand-list: a hand-maintained tuple lagged a round
    # twice (omitted r05 in round 5, r06 in round 6) and mis-staged the
    # next round's _PRIORITY (VERDICT r6 task 2).
    paths = sorted(glob.glob("CORRECTNESS_r*.json"))
    assert paths, "no CORRECTNESS_r*.json found next to the repo root"
    green: dict[str, bool] = {}
    for path in paths:
        for name, row in json.load(open(path)).items():
            green[name] = bool(
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            )
    return green


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


def test_budget_head_spends_no_slot_on_green_rows():
    # Queries that need a (re-)check — never driver-checked, red at their
    # latest check, or reshaped since their green row — must fill the
    # budget window FIRST.  Surplus slots (needs-check < 50) may fall on
    # green re-confirmations; new round-4 queries should be appended to
    # _PRIORITY so they claim those slots instead.
    green = _green()
    q = entrymod.queries()
    needs = [
        n for n in q if (not green.get(n, False)) or n in STALE_RECHECKS
    ]
    head = list(q)[:50]
    k = min(50, len(needs))
    misplaced = [
        n for n in head[:k] if green.get(n, False) and n not in STALE_RECHECKS
    ]
    assert not misplaced, (
        f"budget slots spent on already-green rows while "
        f"{len(needs)} queries still need a check: {misplaced}"
    )
    # and every needs-check query actually made it into the window
    missing = [n for n in needs[:k] if n not in head]
    assert not missing, missing
