"""The driver's correctness run walks ``queries()`` in insertion order and
stops at a ~50-row budget; ``__spark_entry__._PRIORITY`` therefore IS the
round's external-verification plan.  Pin it: every priority name must be a
declared query with an oracle, and the merged dict must lead with the
priority list verbatim (a module re-ordering or a typo in the list would
silently burn the budget on already-green rows)."""

import json

import __spark_entry__ as entrymod


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
    # Every query in the driver's 50-row window must be one that needs a
    # (re-)check: never driver-checked, or red at its latest check.
    # (_PRIORITY entries past the budget are next-round staging — a
    # reshaped-but-previously-green query legitimately sits there.)
    green = {}
    for path in ("CORRECTNESS_r01.json", "CORRECTNESS_r02.json"):
        for name, row in json.load(open(path)).items():
            green[name] = bool(
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            )
    head = list(entrymod.queries())[:50]
    wasted = [n for n in head if green.get(n)]
    assert not wasted, f"budget slots spent on already-green rows: {wasted}"
