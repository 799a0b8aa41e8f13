#!/usr/bin/env python3
"""Capture .explain("formatted") for named queries into plans/$SPARK_GRAFT_PLAN_DIR (default r12)/.

Usage: python tools/explain_query.py <suffix> <query> [<query> ...]

Writes plans/<dir>/<query>_<suffix>.txt (suffix = before|after).  Uses
$SPARK_GRAFT_SF_DIR (default sf0.1) so the captured plan is the same
shape the bench times.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hauser_spark.session import build_session  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod

    spark = build_session(app_name="explain_capture")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLAN_DIR", "r12"),
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        txt = buf.getvalue()
        print(
            f"{name}: {len(txt.splitlines())} plan lines, "
            f"{txt.count('Exchange')} Exchange mentions -> {path}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
