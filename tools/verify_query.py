#!/usr/bin/env python3
"""Verify named queries against their DuckDB oracles at one or more SFs.

Usage: python tools/verify_query.py <query> [<query> ...]
       SFS=sf0.001,sf0.01,sf0.1 python tools/verify_query.py <query>

The per-query mirror of tests/test_oracle_parity.py, for fast iteration
while optimizing: runs each named query at every SF and prints MATCH or
the compare() problem list.  Exit code 1 on any mismatch.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hauser_spark.session import build_session  # noqa: E402
from tests.oracle import compare  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sfs = os.environ.get("SFS", "sf0.001,sf0.01,sf0.1").split(",")
    import __spark_entry__ as entrymod

    spark = build_session(app_name="verify_query")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    bad = 0
    for name in names:
        sql = oracles.get(name)
        for sf in sfs:
            sf_dir = f"/root/testdata/{sf}"
            df = qs[name](spark, sf_dir)
            if sql is None:
                print(f"{name} @ {sf}: no oracle (rows={df.count()})")
                continue
            problems = compare(df, sf_dir, sql)
            if problems:
                bad += 1
                print(f"{name} @ {sf}: MISMATCH: " + "; ".join(problems))
            else:
                print(f"{name} @ {sf}: MATCH")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
