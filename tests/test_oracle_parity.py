"""Every queries() entry with an oracle must hash-match DuckDB at sf0.01 —
the local mirror of the driver's CORRECTNESS gate."""

import pytest

import __spark_entry__ as entrymod
from tests.oracle import compare


def _cases():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    return [(name, qs[name], oracles.get(name)) for name in sorted(qs)]


@pytest.mark.parametrize("name,fn,sql", _cases(), ids=[c[0] for c in _cases()])
def test_query_matches_oracle(spark, sf_oracle, name, fn, sql):
    df = fn(spark, sf_oracle)
    if sql is None:
        # rows-only check (driver's weaker gate for non-SQL-expressible ops)
        assert df.count() >= 0
        return
    problems = compare(df, sf_oracle, sql)
    assert not problems, f"{name}: " + "; ".join(problems)
