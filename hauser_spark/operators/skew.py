"""Skew-handling join strategies for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized shuffle partitions. Salting is the explicit
fallback for the cases AQE can't fix — e.g. one key carrying 30% of the
fact table, or skew on the *build* side of a shuffle join. The transform:

  fact:  salt = pmod(hash(<unique col>), n)   — spreads one hot key over n
  dim:   replicated n times with salt 0..n-1  — every salted fact row still
                                                finds its dim row
  join on (key, salt) → drop salt.

Semantics are identical to the plain equi-join (inner/left), shuffle
partitioning is n-times finer on the hot keys. Deterministic: the salt
derives from a hash of real columns, never rand().
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
    salt_source: str | None = None,
) -> DataFrame:
    """Equi-join ``fact ⋈ dim ON on`` with the fact side salted ``n_salts``
    ways and the dim side replicated to match.

    ``salt_source``: column whose hash spreads rows within a hot key
    (defaults to all fact columns — any unique-ish column works). Only
    inner and left joins preserve semantics (the dim side is replicated;
    right/full would multiply unmatched dim rows).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    src = (
        [F.col(salt_source)] if salt_source else [F.col(c) for c in fact.columns]
    )
    salted_fact = fact.withColumn(
        SALT_COL, F.pmod(F.hash(*src), F.lit(n_salts)).cast("int")
    )
    salted_dim = dim.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = salted_fact.join(salted_dim, on=[on, SALT_COL], how=how)
    return joined.drop(SALT_COL)
