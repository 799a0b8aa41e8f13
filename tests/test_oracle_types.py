"""Static type lint over every declared oracle: no HUGEINT / DECIMAL may
reach an oracle's output schema.

The driver's correctness hash is type-tagged — DuckDB returns HUGEINT for a
bare ``SUM(<integer>)`` (even ``SUM(CAST(x AS BIGINT))``!) and DECIMAL for
numeric-literal arithmetic, while the Spark side yields BIGINT / DOUBLE, so
numerically-equal results still hash-mismatch.  Round 1 lost 5 correctness
rows to exactly this.  The fix is always ``CAST(SUM(...) AS BIGINT)`` (cast
*outside* the aggregate) or ``CAST(... AS DOUBLE)``.

This lint only plans each oracle (LIMIT-0 via relation typing, no execution,
no Spark), so it runs in seconds and fails the build the moment a new oracle
reintroduces the bug class.  The runtime twin — ``tests/oracle.py:compare``'s
type-family check — catches the same bug at sf0.01 with real data.
"""

import duckdb
import pytest

import __spark_entry__ as entrymod
from tests.oracle import TABLES

SF = "/root/testdata/sf0.001"

BANNED = ("HUGEINT", "UHUGEINT", "DECIMAL")

# The driver canonicalizer factorizes cells with pandas; list/struct/map
# cells are unhashable (round 2 lost `text_inverted_index` to a
# `TypeError: unhashable type: 'list'`).  Nested outputs must be
# flattened to strings (`array_join` / `array_to_string`).
BANNED_NESTED = ("LIST", "STRUCT", "MAP", "ARRAY", "UNION")


def _oracle_cases():
    return sorted(entrymod.oracle_sql().items())


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    yield c
    c.close()


@pytest.mark.parametrize(
    "name,sql", _oracle_cases(), ids=[n for n, _ in _oracle_cases()]
)
def test_oracle_output_types_hashable(con, name, sql):
    rel = con.sql(sql)
    bad = [
        f"{col}: {t}"
        for col, t in zip(rel.columns, (str(t) for t in rel.types))
        if any(t.startswith(b) for b in BANNED)
        or t.endswith("[]")
        or any(t.startswith(b) for b in BANNED_NESTED)
    ]
    assert not bad, (
        f"{name}: oracle output contains driver-unhashable types "
        f"(wrap in CAST(... AS BIGINT/DOUBLE) *outside* the SUM; flatten "
        f"arrays with array_to_string): {bad}"
    )
