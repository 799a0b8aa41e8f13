"""Blocked fuzzy string matching — approximate entity resolution.

Finds near-identical part names (edit distance ≤ τ) without the O(n²)
all-pairs scan: names are *blocked* on a cheap key (their last token —
the product noun), the self-join runs inside blocks only, and the exact
``levenshtein`` filter — built into both Spark and DuckDB, so the
operator is exactly oracle-checkable — prunes the survivors. This is
the same candidate-then-verify shape as the MinHash/LSH dedup path
(operators/dedup.py), with token blocking standing in for banding.

Scale: the distinct-name projection collapses the fact-size input
first (partial-aggregated), so the quadratic stage runs on the
entity vocabulary, not the row count, and only within blocks —
at 100 TB the block histogram is the thing to watch (a degenerate
block re-creates O(n²); production would cap block size or add a
second blocking key, same as LSH banding).

Reference parity: no fuzzy surface in the reference (string ops are
limited to scrubbing/format, SURVEY §2.9); beyond-reference
training-data operator (catalog/entity dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table

MAX_EDIT_DISTANCE = 3


def fuzzy_part_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct part-name pairs sharing a product noun with edit
    distance ≤ 3 — the near-duplicate catalog entries."""
    part = load_table(spark, sf_dir, "part")
    names = (
        part.select(F.col("p_name").alias("name"))
        .distinct()
        .withColumn("block", F.element_at(F.split("name", " "), -1))
    )
    a, b = names.alias("a"), names.alias("b")
    dist = F.levenshtein(F.col("a.name"), F.col("b.name"))
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.name") < F.col("b.name")),
        )
        .filter(dist <= MAX_EDIT_DISTANCE)
        .select(
            F.col("a.name").alias("name1"),
            F.col("b.name").alias("name2"),
            dist.cast("long").alias("edit_dist"),
        )
        .orderBy("name1", "name2")
    )


QUERIES = {
    "fuzzy_part_match": fuzzy_part_match,
}

ORACLES = {
    "fuzzy_part_match": f"""
        WITH names AS (
            SELECT DISTINCT p_name AS name,
                   (string_split(p_name, ' '))[-1] AS block
            FROM part
        )
        SELECT a.name AS name1, b.name AS name2,
               CAST(levenshtein(a.name, b.name) AS BIGINT) AS edit_dist
        FROM names a JOIN names b
          ON a.block = b.block AND a.name < b.name
        WHERE levenshtein(a.name, b.name) <= {MAX_EDIT_DISTANCE}
        ORDER BY name1, name2
    """,
}
