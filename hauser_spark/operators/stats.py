"""Statistical testing over event/customer frames — chi-square
independence, mutual information, Poisson-bootstrap confidence
intervals.

A data pipeline that ships training corpora needs hypothesis tests the
same way it needs profiles: "did the type mix shift by weekday?"
(chi-square), "how much does segment tell you about geography?"
(mutual information — the feature-selection score), and "what is the
uncertainty on this mean?" (bootstrap).  All three are exact,
deterministic compositions of scans + groupBy aggregates.

Scale design:

- chi-square / MI reduce to a contingency table (groupBy two low-card
  columns — map-side partials, result is cells not rows) and a
  broadcast-joined marginal recombination.  Works unchanged at 100 TB:
  the only shuffled payload is the cell counts.
- the bootstrap is the POISSON bootstrap (the at-scale formulation used
  when n is too large to resample by index: each row draws its
  replicate multiplicity w ~ Poisson(1) independently, so no pass ever
  materializes a resample).  Replicate multiplicities here are
  *deterministic*: w = InvCDF_Poisson(1)(u) with u a 60-bit md5 hash of
  (event_id, replicate) — the same engine-portable hash as
  ``operators/sketches.py:_h60`` — compared against PRECOMPUTED integer
  thresholds in the 2^60 domain, so both engines pick bit-identical
  weights with no floating-point parity surface.  The explode is
  events × B rows, but it is generated map-side (explode(sequence)),
  aggregated map-side, and never shuffled at row grain: the shuffle
  carries (type, replicate) partial sums only.
- CI bounds are explicit order statistics of the B replicate means
  (row_number, not percentile interpolation — interpolation semantics
  differ across engines).

No reference counterpart (the reference is an exporter); this is part
of the beyond-reference analytics surface.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..rankops import global_rank
from ..tables import load_table
from .sketches import _h60

B_REPLICATES = 64
SLICES_PER_MD5 = 8  # each 32-hex-char digest yields 8 × 16-bit slices
CONV_VALUE_MIN = 97.0  # conversion = any purchase at/above this value —
# keeps the converted fraction away from 0/1 across the test SFs
# Poisson(1) inverse-CDF thresholds scaled to the 16-bit slice domain:
# floor(CDF(k) * 2^16) for k = 0..4; weights above the last are 5.
# 16 bits per replicate lets ONE md5 digest seed 8 replicates (the md5
# itself is the bootstrap's dominant CPU at scale — 8 digests per row
# instead of 64 cut the 8× probe from superlinear to ~linear).  The
# thresholds are kept as 4-char lowercase-hex literals and compared
# LEXICOGRAPHICALLY against the raw digest slice: fixed-width hex
# ordering is numeric ordering, identical bytewise in both engines, and
# it skips a per-replicate conv() hex-parse that dominated the weight
# CPU once the md5 count was down to 8.
_POIS_CDF_HEX = []
_acc = 0.0
for _k in range(5):
    _acc += math.exp(-1.0) / math.factorial(_k)
    _POIS_CDF_HEX.append(format(int(_acc * (1 << 16)), "04x"))


def _poisson_weight_sql(h: str) -> str:
    """CASE ladder mapping a 4-hex-char slice expression to its
    Poisson(1) multiplicity (SQL text, valid in Spark and DuckDB)."""
    cases = " ".join(
        f"WHEN {h} < '{t}' THEN {k}"
        for k, t in enumerate(_POIS_CDF_HEX)
    )
    return f"CASE {cases} ELSE 5 END"


def chi_square_type_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test: event_type × day-of-week.

    One row: N, dof, the statistic, and Cramér's V.  The contingency
    table is a two-column groupBy (map-side combinable); marginals are
    re-aggregated from the cells, never from the base table.
    """
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.col("event_type"), F.dayofweek("ts").alias("dow")
    ).agg(F.count(F.lit(1)).alias("o"))
    cells = cells.cache()
    rt = cells.groupBy("event_type").agg(F.sum("o").alias("row_n"))
    ct = cells.groupBy("dow").agg(F.sum("o").alias("col_n"))
    tot = cells.agg(
        F.sum("o").alias("n"),
        F.countDistinct("event_type").alias("r"),
        F.countDistinct("dow").alias("c"),
    )
    e = (
        cells.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "dow")
        .crossJoin(F.broadcast(tot))
        .select(
            "n",
            "r",
            "c",
            (
                F.pow(
                    F.col("o")
                    - F.col("row_n") * F.col("col_n") / F.col("n"),
                    F.lit(2.0),
                )
                / (F.col("row_n") * F.col("col_n") / F.col("n"))
            ).alias("term"),
        )
    )
    return e.groupBy("n", "r", "c").agg(
        F.sum("term").alias("chi2_raw")
    ).select(
        F.col("n").cast("long").alias("n_events"),
        ((F.col("r") - 1) * (F.col("c") - 1)).cast("long").alias("dof"),
        F.round("chi2_raw", 6).alias("chi2"),
        F.round(
            F.sqrt(
                F.col("chi2_raw")
                / (F.col("n") * F.least(F.col("r") - 1, F.col("c") - 1))
            ),
            6,
        ).alias("cramers_v"),
    )


def _chi_square_oracle() -> str:
    return """
        WITH cells AS (
            SELECT event_type, dayofweek(ts) + 1 AS dow, count(*) AS o
            FROM events GROUP BY 1, 2
        ),
        rt AS (SELECT event_type, sum(o) AS row_n FROM cells GROUP BY 1),
        ct AS (SELECT dow, sum(o) AS col_n FROM cells GROUP BY 1),
        tot AS (SELECT sum(o) AS n, count(DISTINCT event_type) AS r,
                       count(DISTINCT dow) AS c FROM cells),
        terms AS (
            SELECT tot.n, tot.r, tot.c,
                   pow(cells.o - rt.row_n * ct.col_n / CAST(tot.n AS DOUBLE), 2)
                   / (rt.row_n * ct.col_n / CAST(tot.n AS DOUBLE)) AS term
            FROM cells
            JOIN rt USING (event_type) JOIN ct USING (dow) CROSS JOIN tot
        )
        SELECT CAST(n AS BIGINT) AS n_events,
               CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
               round(sum(term), 6) AS chi2,
               round(sqrt(sum(term)
                     / (n * least(r - 1, c - 1))), 6) AS cramers_v
        FROM terms GROUP BY n, r, c
    """


def mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (bits) between customer market segment and
    nation, with both marginal entropies and the normalized MI.

    The feature-selection score computed the at-scale way: cell counts
    only; every probability is a ratio of broadcast-joined aggregates.
    """
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    joined = cust.join(
        F.broadcast(nat.select("n_nationkey", "n_name")),
        cust.c_nationkey == nat.n_nationkey,
    )
    cells = joined.groupBy("c_mktsegment", "n_name").agg(
        F.count(F.lit(1)).alias("o")
    )
    cells = cells.cache()
    rx = cells.groupBy("c_mktsegment").agg(F.sum("o").alias("nx"))
    ry = cells.groupBy("n_name").agg(F.sum("o").alias("ny"))
    tot = cells.agg(F.sum("o").alias("n"))
    p = (
        cells.join(F.broadcast(rx), "c_mktsegment")
        .join(F.broadcast(ry), "n_name")
        .crossJoin(F.broadcast(tot))
    )
    lg2 = math.log(2.0)
    mi_term = (F.col("o") / F.col("n")) * (
        F.log(
            F.col("o") * F.col("n") / (F.col("nx") * F.col("ny"))
        )
        / F.lit(lg2)
    )
    hx_term = (F.col("nx") / F.col("n")) * (
        F.log(F.col("n") / F.col("nx")) / F.lit(lg2)
    )
    hy_term = (F.col("ny") / F.col("n")) * (
        F.log(F.col("n") / F.col("ny")) / F.lit(lg2)
    )
    mi = p.agg(F.sum(mi_term).alias("mi_raw")).select("mi_raw")
    hx = (
        rx.crossJoin(F.broadcast(tot))
        .agg(F.sum(hx_term).alias("hx_raw"))
        .select("hx_raw")
    )
    hy = (
        ry.crossJoin(F.broadcast(tot))
        .agg(F.sum(hy_term).alias("hy_raw"))
        .select("hy_raw")
    )
    return (
        mi.crossJoin(hx)
        .crossJoin(hy)
        .select(
            F.lit("c_mktsegment").alias("x_col"),
            F.lit("n_name").alias("y_col"),
            F.round("mi_raw", 6).alias("mi_bits"),
            F.round("hx_raw", 6).alias("h_x_bits"),
            F.round("hy_raw", 6).alias("h_y_bits"),
            F.round(
                F.col("mi_raw")
                / F.sqrt(F.col("hx_raw") * F.col("hy_raw")),
                6,
            ).alias("nmi"),
        )
    )


def _mutual_information_oracle() -> str:
    return """
        WITH joined AS (
            SELECT c_mktsegment, n_name
            FROM customer JOIN nation ON c_nationkey = n_nationkey
        ),
        cells AS (
            SELECT c_mktsegment, n_name, count(*) AS o
            FROM joined GROUP BY 1, 2
        ),
        rx AS (SELECT c_mktsegment, sum(o) AS nx FROM cells GROUP BY 1),
        ry AS (SELECT n_name, sum(o) AS ny FROM cells GROUP BY 1),
        tot AS (SELECT sum(o) AS n FROM cells),
        mi AS (
            SELECT sum((o / CAST(n AS DOUBLE))
                       * ln(o * CAST(n AS DOUBLE) / (nx * CAST(ny AS DOUBLE)))
                       / ln(2.0)) AS mi_raw
            FROM cells JOIN rx USING (c_mktsegment)
            JOIN ry USING (n_name) CROSS JOIN tot
        ),
        hx AS (
            SELECT sum((nx / CAST(n AS DOUBLE))
                       * ln(CAST(n AS DOUBLE) / nx) / ln(2.0)) AS hx_raw
            FROM rx CROSS JOIN tot
        ),
        hy AS (
            SELECT sum((ny / CAST(n AS DOUBLE))
                       * ln(CAST(n AS DOUBLE) / ny) / ln(2.0)) AS hy_raw
            FROM ry CROSS JOIN tot
        )
        SELECT 'c_mktsegment' AS x_col, 'n_name' AS y_col,
               round(mi_raw, 6) AS mi_bits,
               round(hx_raw, 6) AS h_x_bits,
               round(hy_raw, 6) AS h_y_bits,
               round(mi_raw / sqrt(hx_raw * hy_raw), 6) AS nmi
        FROM mi CROSS JOIN hx CROSS JOIN hy
    """


def bootstrap_ci_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type bootstrap CI for mean(value): B Poisson replicates,
    bounds as explicit order statistics (ranks 2 and B-1 ≈ 2.5/97.5%).

    No replicate explode: each row contributes its B Poisson weights as
    2B map-side partial sums (Σw·cents, Σw per replicate) inside ONE
    groupBy — the scan never generates B× rows, and the shuffle carries
    (type → 2B longs) only.  Replicate means are exact-integer
    rationals; the order statistics come from sorting the B-element
    (mean, b) array in-row, and the 6-dp rounding uses the module's
    half-up integer device, so there is no float-summation-order parity
    surface anywhere (the earlier float form could flip a 6th digit
    across engines; this one cannot).
    """
    # All expressions are built as SQL strings: the B=64-replicate frame
    # is ~2000 column-object constructions through the py4j bridge, which
    # costs multiple seconds of driver time per call — string expressions
    # parse JVM-side in one hop and plan identically.
    ev = load_table(spark, sf_dir, "events").selectExpr(
        "event_type",
        "CAST(round(value * 100) AS BIGINT) AS cents",
        "event_id",
    )
    # two staged projections so each replicate hash is computed exactly
    # once per row: weights evaluated inside the aggregate would re-run
    # the md5 chain per CASE branch (5× per replicate — measured 5×
    # slower end-to-end)
    B = B_REPLICATES
    n_digests = B // SLICES_PER_MD5
    digests = ev.selectExpr(
        "event_type",
        "cents",
        *[
            f"md5(concat_ws(':', CAST(event_id AS STRING), '{g}'))"
            f" AS g{g}"
            for g in range(n_digests)
        ],
    )
    # replicate b reads 4 hex chars from digest b DIV 8 at offset
    # 4·(b MOD 8): one md5 per 8 replicates, no numeric parse
    hashed = digests.selectExpr(
        "event_type",
        "cents",
        *[
            f"substring(g{b // SLICES_PER_MD5},"
            f" {4 * (b % SLICES_PER_MD5) + 1}, 4) AS h{b}"
            for b in range(B)
        ],
    )
    weighted = hashed.selectExpr(
        "event_type",
        "cents",
        *[f"{_poisson_weight_sql(f'h{b}')} AS w{b}" for b in range(B)],
    )
    agg = weighted.groupBy("event_type").agg(
        F.expr("sum(cents)").alias("s_all"),
        F.expr("count(1)").alias("n"),
        *[F.expr(f"sum(w{b} * cents)").alias(f"s{b}") for b in range(B)],
        *[F.expr(f"sum(w{b})").alias(f"w{b}") for b in range(B)],
    )
    # replicate means as exact-integer rationals, ranked by sorting the
    # B-element (mean, b, s, w) struct array in-row — no second shuffle,
    # no window
    reps = (
        "sort_array(array("
        + ", ".join(
            f"struct(CAST(s{b} AS DOUBLE) / (100.0 * w{b}) AS m,"
            f" {b} AS b, s{b} AS s, w{b} AS w)"
            for b in range(B)
        )
        + "))"
    )

    # round(s/(100·w), 6) exactly on positive ints:
    # (2·s·10⁴ + w) DIV (2·w) — same half-up device as ols/did; DIV
    # keeps the quotient in long arithmetic at any scale.
    def _exact6(s: str, w: str) -> str:
        return f"CAST((2 * {s} * 10000 + {w}) DIV (2 * {w}) AS DOUBLE) / 1e6"

    return (
        agg.selectExpr("event_type", "s_all", "n", f"{reps} AS reps")
        .selectExpr(
            "event_type",
            "s_all",
            "n",
            "element_at(reps, 2) AS lo",
            f"element_at(reps, {B - 1}) AS hi",
        )
        .selectExpr(
            "event_type",
            f"{_exact6('s_all', 'n')} AS mean_value",
            f"{_exact6('lo.s', 'lo.w')} AS ci_lo",
            f"{_exact6('hi.s', 'hi.w')} AS ci_hi",
            f"CAST({B} AS BIGINT) AS n_replicates",
        )
        .orderBy("event_type")
    )


def _bootstrap_oracle() -> str:
    h = "substr(md5(event_id || ':' || (b // 8)), 4 * (b % 8) + 1, 4)"
    return f"""
        WITH rep AS (
            SELECT event_type, b,
                   CAST(round("value" * 100) AS BIGINT) AS cents,
                   {_poisson_weight_sql(h)} AS w
            FROM events, (SELECT unnest(range({B_REPLICATES})) AS b)
        ),
        means AS (
            SELECT event_type, b, sum(w * cents) AS s, sum(w) AS wn,
                   CAST(sum(w * cents) AS DOUBLE) / (100 * sum(w)) AS m
            FROM rep GROUP BY 1, 2
        ),
        ranked AS (
            SELECT event_type, b, s, wn, m,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY m, b) AS rk
            FROM means
        ),
        point AS (
            SELECT event_type,
                   CAST((2 * sum(cents) * 10000 + count(*))
                        // (2 * count(*)) AS DOUBLE) / 1e6 AS mean_value
            FROM (SELECT event_type,
                         CAST(round("value" * 100) AS BIGINT) AS cents
                  FROM events) GROUP BY 1
        ),
        ci AS (
            SELECT event_type,
                   CAST((2 * min(CASE WHEN rk = 2 THEN s END) * 10000
                         + min(CASE WHEN rk = 2 THEN wn END))
                        // (2 * min(CASE WHEN rk = 2 THEN wn END))
                        AS DOUBLE) / 1e6 AS ci_lo,
                   CAST((2 * min(CASE WHEN rk = {B_REPLICATES - 1}
                                 THEN s END) * 10000
                         + min(CASE WHEN rk = {B_REPLICATES - 1}
                               THEN wn END))
                        // (2 * min(CASE WHEN rk = {B_REPLICATES - 1}
                                    THEN wn END))
                        AS DOUBLE) / 1e6 AS ci_hi,
                   CAST(count(*) AS BIGINT) AS n_replicates
            FROM ranked GROUP BY event_type
        )
        SELECT p.event_type, p.mean_value, c.ci_lo, c.ci_hi, c.n_replicates
        FROM point p JOIN ci c USING (event_type)
        ORDER BY p.event_type
    """


QUERIES = {
    "stats_chi_square_type_dow": chi_square_type_dow,
    "stats_mutual_information": mutual_information,
    "stats_bootstrap_ci_mean": bootstrap_ci_mean,
}

ORACLES = {
    "stats_chi_square_type_dow": _chi_square_oracle(),
    "stats_mutual_information": _mutual_information_oracle(),
    "stats_bootstrap_ci_mean": _bootstrap_oracle(),
}


def ols_value_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form OLS: event value (cents) regressed on hour-of-day and
    day-of-week — "is spend driven by time of day or weekday?".

    The at-scale linear-model recipe: ONE aggregation pass collects the
    nine normal-equation moments (all EXACT integer sums — y in cents),
    then the 3×3 system solves in closed form by Cramer's rule written
    as one fixed double expression tree, so both engines evaluate
    bit-identical IEEE arithmetic (no iterative solver, no
    order-dependent float aggregation anywhere).  At 100 TB this is a
    single map-side-combinable groupBy producing nine longs — the model
    fit is free next to the scan.
    """
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        F.hour("ts").cast("long").alias("x1"),
        (F.dayofweek("ts")).cast("long").alias("x2"),
        F.round(F.col("value") * 100).cast("long").alias("yc"),
    )
    m = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x1").alias("s1"),
        F.sum("x2").alias("s2"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum("yc").alias("sy"),
        F.sum(F.col("x1") * F.col("yc")).alias("s1y"),
        F.sum(F.col("x2") * F.col("yc")).alias("s2y"),
        F.sum(F.col("yc") * F.col("yc")).alias("syy"),
    )
    # Cramer's rule on A = [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]],
    # b = [sy,s1y,s2y]; fixed expression tree → engine-identical doubles.
    det_expr = (
        "(CAST(n AS DOUBLE) * (CAST(s11 AS DOUBLE) * CAST(s22 AS DOUBLE)"
        " - CAST(s12 AS DOUBLE) * CAST(s12 AS DOUBLE))"
        " - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s22 AS DOUBLE)"
        " - CAST(s12 AS DOUBLE) * CAST(s2 AS DOUBLE))"
        " + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s12 AS DOUBLE)"
        " - CAST(s11 AS DOUBLE) * CAST(s2 AS DOUBLE)))"
    )
    d0 = (
        "(CAST(sy AS DOUBLE) * (CAST(s11 AS DOUBLE) * CAST(s22 AS DOUBLE)"
        " - CAST(s12 AS DOUBLE) * CAST(s12 AS DOUBLE))"
        " - CAST(s1 AS DOUBLE) * (CAST(s1y AS DOUBLE) * CAST(s22 AS DOUBLE)"
        " - CAST(s12 AS DOUBLE) * CAST(s2y AS DOUBLE))"
        " + CAST(s2 AS DOUBLE) * (CAST(s1y AS DOUBLE) * CAST(s12 AS DOUBLE)"
        " - CAST(s11 AS DOUBLE) * CAST(s2y AS DOUBLE)))"
    )
    d1 = (
        "(CAST(n AS DOUBLE) * (CAST(s1y AS DOUBLE) * CAST(s22 AS DOUBLE)"
        " - CAST(s12 AS DOUBLE) * CAST(s2y AS DOUBLE))"
        " - CAST(sy AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s22 AS DOUBLE)"
        " - CAST(s12 AS DOUBLE) * CAST(s2 AS DOUBLE))"
        " + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s2y AS DOUBLE)"
        " - CAST(s1y AS DOUBLE) * CAST(s2 AS DOUBLE)))"
    )
    d2 = (
        "(CAST(n AS DOUBLE) * (CAST(s11 AS DOUBLE) * CAST(s2y AS DOUBLE)"
        " - CAST(s1y AS DOUBLE) * CAST(s12 AS DOUBLE))"
        " - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s2y AS DOUBLE)"
        " - CAST(s1y AS DOUBLE) * CAST(s2 AS DOUBLE))"
        " + CAST(sy AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s12 AS DOUBLE)"
        " - CAST(s11 AS DOUBLE) * CAST(s2 AS DOUBLE)))"
    )
    # R² from the same moments: SST = syy - sy²/n;
    # SSE = syy - (b0·sy + b1·s1y + b2·s2y)
    return m.selectExpr(
        "CAST(n AS BIGINT) AS n_events",
        f"round({d0} / {det_expr} / 100.0, 6) AS intercept_dollars",
        f"round({d1} / {det_expr} / 100.0, 6) AS beta_hour_dollars",
        f"round({d2} / {det_expr} / 100.0, 6) AS beta_dow_dollars",
        (
            f"round(1.0 - (CAST(syy AS DOUBLE)"
            f" - ({d0} / {det_expr} * CAST(sy AS DOUBLE)"
            f" + {d1} / {det_expr} * CAST(s1y AS DOUBLE)"
            f" + {d2} / {det_expr} * CAST(s2y AS DOUBLE)))"
            f" / (CAST(syy AS DOUBLE)"
            f" - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)"
            f" / CAST(n AS DOUBLE)), 6) AS r_squared"
        ),
    )


def _ols_oracle() -> str:
    det = (
        "(CAST(n AS DOUBLE) * (CAST(s11 AS DOUBLE) * CAST(s22 AS DOUBLE)"
        " - CAST(s12 AS DOUBLE) * CAST(s12 AS DOUBLE))"
        " - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s22 AS DOUBLE)"
        " - CAST(s12 AS DOUBLE) * CAST(s2 AS DOUBLE))"
        " + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s12 AS DOUBLE)"
        " - CAST(s11 AS DOUBLE) * CAST(s2 AS DOUBLE)))"
    )
    d0 = (
        "(CAST(sy AS DOUBLE) * (CAST(s11 AS DOUBLE) * CAST(s22 AS DOUBLE)"
        " - CAST(s12 AS DOUBLE) * CAST(s12 AS DOUBLE))"
        " - CAST(s1 AS DOUBLE) * (CAST(s1y AS DOUBLE) * CAST(s22 AS DOUBLE)"
        " - CAST(s12 AS DOUBLE) * CAST(s2y AS DOUBLE))"
        " + CAST(s2 AS DOUBLE) * (CAST(s1y AS DOUBLE) * CAST(s12 AS DOUBLE)"
        " - CAST(s11 AS DOUBLE) * CAST(s2y AS DOUBLE)))"
    )
    d1 = (
        "(CAST(n AS DOUBLE) * (CAST(s1y AS DOUBLE) * CAST(s22 AS DOUBLE)"
        " - CAST(s12 AS DOUBLE) * CAST(s2y AS DOUBLE))"
        " - CAST(sy AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s22 AS DOUBLE)"
        " - CAST(s12 AS DOUBLE) * CAST(s2 AS DOUBLE))"
        " + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s2y AS DOUBLE)"
        " - CAST(s1y AS DOUBLE) * CAST(s2 AS DOUBLE)))"
    )
    d2 = (
        "(CAST(n AS DOUBLE) * (CAST(s11 AS DOUBLE) * CAST(s2y AS DOUBLE)"
        " - CAST(s1y AS DOUBLE) * CAST(s12 AS DOUBLE))"
        " - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s2y AS DOUBLE)"
        " - CAST(s1y AS DOUBLE) * CAST(s2 AS DOUBLE))"
        " + CAST(sy AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s12 AS DOUBLE)"
        " - CAST(s11 AS DOUBLE) * CAST(s2 AS DOUBLE)))"
    )
    return f"""
        WITH base AS (
            SELECT CAST(hour(ts) AS BIGINT) AS x1,
                   CAST(dayofweek(ts) + 1 AS BIGINT) AS x2,
                   CAST(round("value" * 100) AS BIGINT) AS yc
            FROM events
        ),
        m AS (
            SELECT count(*) AS n, sum(x1) AS s1, sum(x2) AS s2,
                   sum(x1 * x1) AS s11, sum(x1 * x2) AS s12,
                   sum(x2 * x2) AS s22, sum(yc) AS sy,
                   sum(x1 * yc) AS s1y, sum(x2 * yc) AS s2y,
                   sum(yc * yc) AS syy
            FROM base
        )
        SELECT CAST(n AS BIGINT) AS n_events,
               round({d0} / {det} / 100.0, 6) AS intercept_dollars,
               round({d1} / {det} / 100.0, 6) AS beta_hour_dollars,
               round({d2} / {det} / 100.0, 6) AS beta_dow_dollars,
               round(1.0 - (CAST(syy AS DOUBLE)
                     - ({d0} / {det} * CAST(sy AS DOUBLE)
                        + {d1} / {det} * CAST(s1y AS DOUBLE)
                        + {d2} / {det} * CAST(s2y AS DOUBLE)))
                     / (CAST(syy AS DOUBLE)
                        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                        / CAST(n AS DOUBLE)), 6) AS r_squared
        FROM m
    """


def two_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on a deterministic 50/50 user split: does
    variant A convert (≥1 purchase event) differently from variant B?

    The A/B-test readout computed the at-scale way: per-user conversion
    flags reduce map-side, the four counts (n, conversions per arm)
    are the only shuffled payload, and the z statistic is one fixed
    double expression over exact integers — engine-identical.  The
    variant assignment is the md5 user hash (what a real experiment
    framework derives from a salt + unit id).
    """
    ev = load_table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.max(
            (
                (F.col("event_type") == "purchase")
                & (F.col("value") >= CONV_VALUE_MIN)
            ).cast("long")
        ).alias("converted")
    )
    arms = users.select(
        F.pmod(_h60(F.col("user_id")), F.lit(2)).alias("variant"),
        "converted",
    )
    m = arms.groupBy().agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(
            F.when(F.col("variant") == 0, F.col("converted")).otherwise(0)
        ).alias("c_a"),
        F.sum(
            F.when(F.col("variant") == 1, F.col("converted")).otherwise(0)
        ).alias("c_b"),
    )
    z = (
        "CASE WHEN c_a + c_b = 0 OR c_a + c_b = n_a + n_b THEN NULL ELSE "
        "(CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE)"
        " - CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE))"
        " / sqrt((CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))"
        " * (1.0 - CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))"
        " * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))"
        " END"
    )
    return m.selectExpr(
        "CAST(n_a AS BIGINT) AS n_a",
        "CAST(n_b AS BIGINT) AS n_b",
        "CAST(c_a AS BIGINT) AS conversions_a",
        "CAST(c_b AS BIGINT) AS conversions_b",
        "round(CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6) AS p_a",
        "round(CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6) AS p_b",
        f"round({z}, 6) AS z_score",
    )


def _ztest_oracle() -> str:
    h = "('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT"
    z = (
        "CASE WHEN c_a + c_b = 0 OR c_a + c_b = n_a + n_b THEN NULL ELSE "
        "(CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE)"
        " - CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE))"
        " / sqrt((CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))"
        " * (1.0 - CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))"
        " * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))"
        " END"
    )
    return f"""
        WITH users AS (
            SELECT user_id,
                   max(CASE WHEN event_type = 'purchase'
                            AND "value" >= {CONV_VALUE_MIN}
                            THEN 1 ELSE 0 END) AS converted
            FROM events GROUP BY user_id
        ),
        arms AS (
            SELECT {h} % 2 AS variant, converted FROM users
        ),
        m AS (
            SELECT sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS n_a,
                   sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS n_b,
                   sum(CASE WHEN variant = 0 THEN converted ELSE 0 END) AS c_a,
                   sum(CASE WHEN variant = 1 THEN converted ELSE 0 END) AS c_b
            FROM arms
        )
        SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
               CAST(c_a AS BIGINT) AS conversions_a,
               CAST(c_b AS BIGINT) AS conversions_b,
               round(CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6) AS p_a,
               round(CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6) AS p_b,
               round({z}, 6) AS z_score
        FROM m
    """


QUERIES["stats_ols_value_model"] = ols_value_model
QUERIES["stats_two_proportion_ztest"] = two_proportion_ztest
ORACLES["stats_ols_value_model"] = _ols_oracle()
ORACLES["stats_two_proportion_ztest"] = _ztest_oracle()


DID_SPLIT_DOM = 15  # pre period: day-of-month <= 15


def did_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences readout: purchase-value means per
    (variant, period) cell and the DiD estimate — the standard causal
    contrast when a treatment lands mid-period on one arm (variant = the
    md5 user split of ``two_proportion_ztest``; period splits at
    day-of-month DID_SPLIT_DOM).

    One groupBy produces the four cells' exact integer moments (cents,
    counts); every mean is exact half-up division and the DiD itself is
    one fixed double expression over exact longs — engine-identical.
    At 100 TB: the fact scan reduces map-side to four partial cells.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    arms = ev.select(
        F.pmod(_h60(F.col("user_id")), F.lit(2)).alias("variant"),
        F.when(F.dayofmonth("ts") <= DID_SPLIT_DOM, F.lit("pre"))
        .otherwise(F.lit("post"))
        .alias("period"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    cells = arms.groupBy("variant", "period").agg(
        F.sum("cents").alias("s"), F.count(F.lit(1)).alias("n")
    )
    wide = cells.groupBy().pivot(
        "variant", [0, 1]
    ).agg(
        F.max(F.when(F.col("period") == "pre", F.col("s"))).alias("s_pre"),
        F.max(F.when(F.col("period") == "pre", F.col("n"))).alias("n_pre"),
        F.max(F.when(F.col("period") == "post", F.col("s"))).alias("s_post"),
        F.max(F.when(F.col("period") == "post", F.col("n"))).alias("n_post"),
    )
    mean6 = (
        lambda s, n: F.expr(
            f"CAST((2 * {s} * 10000 + {n}) DIV (2 * {n}) AS DOUBLE) / 1e6"
        )
    )  # noqa: E731  — exact half-up of cents/(100·n) at 6dp
    did = (
        "(CAST(`1_s_post` AS DOUBLE) / CAST(`1_n_post` AS DOUBLE)"
        " - CAST(`1_s_pre` AS DOUBLE) / CAST(`1_n_pre` AS DOUBLE)"
        " - (CAST(`0_s_post` AS DOUBLE) / CAST(`0_n_post` AS DOUBLE)"
        "    - CAST(`0_s_pre` AS DOUBLE) / CAST(`0_n_pre` AS DOUBLE)))"
        " / 100.0"
    )
    return wide.select(
        mean6("`0_s_pre`", "`0_n_pre`").alias("control_pre_mean"),
        mean6("`0_s_post`", "`0_n_post`").alias("control_post_mean"),
        mean6("`1_s_pre`", "`1_n_pre`").alias("treat_pre_mean"),
        mean6("`1_s_post`", "`1_n_post`").alias("treat_post_mean"),
        F.expr(f"round({did}, 6)").alias("did_estimate"),
        (
            F.col("`0_n_pre`") + F.col("`0_n_post`")
            + F.col("`1_n_pre`") + F.col("`1_n_post`")
        ).alias("n_purchases"),
    )


def _did_oracle() -> str:
    h = "('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT"
    mean6 = (
        lambda s, n: f"CAST((2 * {s} * 10000 + {n}) // (2 * {n})"
        f" AS DOUBLE) / 1e6"
    )
    did = (
        "(CAST(s1_post AS DOUBLE) / CAST(n1_post AS DOUBLE)"
        " - CAST(s1_pre AS DOUBLE) / CAST(n1_pre AS DOUBLE)"
        " - (CAST(s0_post AS DOUBLE) / CAST(n0_post AS DOUBLE)"
        "    - CAST(s0_pre AS DOUBLE) / CAST(n0_pre AS DOUBLE)))"
        " / 100.0"
    )
    return f"""
        WITH arms AS (
            SELECT {h} % 2 AS variant,
                   CASE WHEN dayofmonth(ts) <= {DID_SPLIT_DOM}
                        THEN 'pre' ELSE 'post' END AS period,
                   CAST(round("value" * 100) AS BIGINT) AS cents
            FROM events WHERE event_type = 'purchase'
        ),
        cells AS (
            SELECT variant, period, sum(cents) AS s, count(*) AS n
            FROM arms GROUP BY 1, 2
        ),
        wide AS (
            SELECT
              max(CASE WHEN variant=0 AND period='pre' THEN s END) AS s0_pre,
              max(CASE WHEN variant=0 AND period='pre' THEN n END) AS n0_pre,
              max(CASE WHEN variant=0 AND period='post' THEN s END) AS s0_post,
              max(CASE WHEN variant=0 AND period='post' THEN n END) AS n0_post,
              max(CASE WHEN variant=1 AND period='pre' THEN s END) AS s1_pre,
              max(CASE WHEN variant=1 AND period='pre' THEN n END) AS n1_pre,
              max(CASE WHEN variant=1 AND period='post' THEN s END) AS s1_post,
              max(CASE WHEN variant=1 AND period='post' THEN n END) AS n1_post
            FROM cells
        )
        SELECT {mean6("s0_pre", "n0_pre")} AS control_pre_mean,
               {mean6("s0_post", "n0_post")} AS control_post_mean,
               {mean6("s1_pre", "n1_pre")} AS treat_pre_mean,
               {mean6("s1_post", "n1_post")} AS treat_post_mean,
               round({did}, 6) AS did_estimate,
               CAST(n0_pre + n0_post + n1_pre + n1_post AS BIGINT)
                   AS n_purchases
        FROM wide
    """


QUERIES["stats_did_analysis"] = did_analysis
ORACLES["stats_did_analysis"] = _did_oracle()


def mann_whitney_utest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (rank-sum) test: do the two md5 user arms see
    different purchase-VALUE distributions?  The robust companion to
    ``stats_did_analysis``'s mean contrast — rank-based, so a heavy
    tail in one arm cannot fake (or mask) a shift.

    Exactness: ranking happens on the *distinct-cents* frame, not per
    row — ties get the textbook average rank via the tie-group device
    ``2·avg_rank = 2·(rows below) + t + 1``, so the doubled rank sum
    ``2·R_treat`` is an order-free integer; U, the tie-corrected
    variance, z, and the rank-biserial effect size are one fixed double
    expression over five exact longs at the end — engine-identical.

    Scale: the fact scan reduces map-side to (cents, n, n_treat) cells;
    the only window runs over the DISTINCT VALUE frame (bounded by the
    price domain, not the row count), and the final reduce carries five
    longs.  At 100 TB the shuffled payload is the cents histogram.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    cells = (
        ev.select(
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            F.pmod(_h60(F.col("user_id")), F.lit(2)).alias("variant"),
        )
        .groupBy("cents")
        .agg(
            F.count(F.lit(1)).alias("t"),
            F.sum("variant").alias("t1"),
        )
    )
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, -1)
    ranked = cells.withColumn(
        "below", F.coalesce(F.sum("t").over(w), F.lit(0))
    )
    m = ranked.agg(
        F.sum("t").alias("n"),
        F.sum("t1").alias("n1"),
        F.sum(
            F.col("t1") * (2 * F.col("below") + F.col("t") + 1)
        ).alias("r2"),
        F.sum(
            F.col("t") * F.col("t") * F.col("t") - F.col("t")
        ).alias("ties"),
    )
    stat = """
        CAST(r2 - n1 * (n1 + 1) AS DOUBLE) / 2.0
    """  # U_treat = R_treat - n1(n1+1)/2, from the doubled rank sum
    var = """
        (CAST(n - n1 AS DOUBLE) * CAST(n1 AS DOUBLE) / 12.0)
        * (CAST(n + 1 AS DOUBLE)
           - CAST(ties AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))
    """
    z = f"""
        (({stat}) - CAST(n - n1 AS DOUBLE) * CAST(n1 AS DOUBLE) / 2.0)
        / sqrt({var})
    """
    rb = f"""
        2.0 * ({stat}) / (CAST(n - n1 AS DOUBLE) * CAST(n1 AS DOUBLE))
        - 1.0
    """
    return m.select(
        (F.col("n") - F.col("n1")).alias("n_control"),
        F.col("n1").alias("n_treat"),
        F.expr(stat).alias("u_treat"),
        F.expr(f"round({z}, 6)").alias("z_value"),
        F.expr(f"round({rb}, 6)").alias("rank_biserial"),
    )


def _mann_whitney_oracle() -> str:
    h = "('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT"
    stat = "CAST(r2 - n1 * (n1 + 1) AS DOUBLE) / 2.0"
    var = (
        "(CAST(n - n1 AS DOUBLE) * CAST(n1 AS DOUBLE) / 12.0)"
        " * (CAST(n + 1 AS DOUBLE)"
        "    - CAST(ties AS DOUBLE)"
        "      / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))"
    )
    z = (
        f"(({stat}) - CAST(n - n1 AS DOUBLE) * CAST(n1 AS DOUBLE) / 2.0)"
        f" / sqrt({var})"
    )
    rb = (
        f"2.0 * ({stat}) / (CAST(n - n1 AS DOUBLE) * CAST(n1 AS DOUBLE))"
        " - 1.0"
    )
    return f"""
        WITH cells AS (
            SELECT CAST(round("value" * 100) AS BIGINT) AS cents,
                   count(*) AS t,
                   sum({h} % 2) AS t1
            FROM events WHERE event_type = 'purchase'
            GROUP BY 1
        ),
        ranked AS (
            SELECT t, t1,
                   COALESCE(sum(t) OVER (ORDER BY cents
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING), 0) AS below
            FROM cells
        ),
        m AS (
            SELECT sum(t) AS n, sum(t1) AS n1,
                   sum(t1 * (2 * below + t + 1)) AS r2,
                   sum(t * t * t - t) AS ties
            FROM ranked
        )
        SELECT CAST(n - n1 AS BIGINT) AS n_control,
               CAST(n1 AS BIGINT) AS n_treat,
               {stat} AS u_treat,
               round({z}, 6) AS z_value,
               round({rb}, 6) AS rank_biserial
        FROM m
    """


QUERIES["stats_mann_whitney_utest"] = mann_whitney_utest
ORACLES["stats_mann_whitney_utest"] = _mann_whitney_oracle()


def spearman_spend_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between customer spend and order
    count, with the raw-cents Pearson beside it — the monotone-vs-
    linear association readout (Spearman >> Pearson says the relation
    is monotone but curved; Pearson >> Spearman says a few whales carry
    it).

    Exactness: Spearman IS Pearson on tie-averaged ranks, and the
    doubled average rank ``2·r = 2·(rows below) + t + 1`` (the
    [[stats_mann_whitney_utest]] device, applied per axis on the
    DISTINCT-VALUE frames) is an exact integer, so all five rank-moment
    sums are exact — they ride decimal(38,0)/HUGEINT because doubled
    ranks square to ~4n² (past int64 at corpus scale).  Raw-cents
    moments ride the same widths.  Both coefficients are one fixed
    double expression each at the end.

    Scale: the orders scan reduces map-side to customer grain; each
    rank axis is one groupBy on the value + a window over the
    distinct-VALUE frame + a value-keyed join back — rank assignment
    never global-sorts the customer frame itself.
    """
    od = load_table(spark, sf_dir, "orders")
    # checkpointed: the customer frame feeds the main join AND both
    # rank axes' distinct-value aggregates — three consumers that each
    # re-ran the orders scan + customer rollup
    cust = od.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "x"
        ),
        F.count(F.lit(1)).alias("y"),
    ).localCheckpoint(eager=False)

    def dranks(df: DataFrame, col: str, out: str) -> DataFrame:
        per = df.groupBy(col).agg(F.count(F.lit(1)).alias("t"))
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
        return per.select(
            col,
            (
                2 * F.coalesce(F.sum("t").over(w), F.lit(0))
                + F.col("t")
                + 1
            ).alias(out),
        )
    ranked = (
        cust.join(dranks(cust, "x", "rx"), "x")
        .join(dranks(cust, "y", "ry"), "y")
        .select(
            F.col("x").cast("decimal(38,0)").alias("x"),
            F.col("y").cast("decimal(38,0)").alias("y"),
            F.col("rx").cast("decimal(38,0)").alias("rx"),
            F.col("ry").cast("decimal(38,0)").alias("ry"),
        )
    )
    m = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rx").alias("sx"), F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
        F.sum("x").alias("px"), F.sum("y").alias("py"),
        F.sum(F.col("x") * F.col("y")).alias("pxy"),
        F.sum(F.col("x") * F.col("x")).alias("pxx"),
        F.sum(F.col("y") * F.col("y")).alias("pyy"),
    )

    def corr(sx, sy, sxy, sxx, syy):
        return (
            f"(CAST(n AS DOUBLE) * CAST({sxy} AS DOUBLE)"
            f" - CAST({sx} AS DOUBLE) * CAST({sy} AS DOUBLE))"
            f" / sqrt((CAST(n AS DOUBLE) * CAST({sxx} AS DOUBLE)"
            f"         - CAST({sx} AS DOUBLE) * CAST({sx} AS DOUBLE))"
            f"        * (CAST(n AS DOUBLE) * CAST({syy} AS DOUBLE)"
            f"           - CAST({sy} AS DOUBLE) * CAST({sy} AS DOUBLE)))"
        )
    return m.select(
        F.col("n").cast("long").alias("n_customers"),
        F.expr(
            f"round({corr('sx', 'sy', 'sxy', 'sxx', 'syy')}, 6)"
        ).alias("spearman_rho"),
        F.expr(
            f"round({corr('px', 'py', 'pxy', 'pxx', 'pyy')}, 6)"
        ).alias("pearson_r"),
    )


def _spearman_oracle() -> str:
    def corr(sx, sy, sxy, sxx, syy):
        return (
            f"(CAST(n AS DOUBLE) * CAST({sxy} AS DOUBLE)"
            f" - CAST({sx} AS DOUBLE) * CAST({sy} AS DOUBLE))"
            f" / sqrt((CAST(n AS DOUBLE) * CAST({sxx} AS DOUBLE)"
            f"         - CAST({sx} AS DOUBLE) * CAST({sx} AS DOUBLE))"
            f"        * (CAST(n AS DOUBLE) * CAST({syy} AS DOUBLE)"
            f"           - CAST({sy} AS DOUBLE) * CAST({sy} AS DOUBLE)))"
        )
    return f"""
        WITH cust AS (
            SELECT o_custkey,
                   sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS x,
                   count(*) AS y
            FROM orders GROUP BY 1
        ),
        rx AS (
            SELECT x,
                   (2 * COALESCE(sum(t) OVER (ORDER BY x
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) + t + 1) AS rx
            FROM (SELECT x, count(*) AS t FROM cust GROUP BY 1)
        ),
        ry AS (
            SELECT y,
                   (2 * COALESCE(sum(t) OVER (ORDER BY y
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) + t + 1) AS ry
            FROM (SELECT y, count(*) AS t FROM cust GROUP BY 1)
        ),
        ranked AS (
            SELECT c.x::HUGEINT AS x, c.y::HUGEINT AS y,
                   rx.rx::HUGEINT AS rx, ry.ry::HUGEINT AS ry
            FROM cust c JOIN rx USING (x) JOIN ry USING (y)
        ),
        m AS (
            SELECT count(*) AS n,
                   sum(rx) AS sx, sum(ry) AS sy, sum(rx * ry) AS sxy,
                   sum(rx * rx) AS sxx, sum(ry * ry) AS syy,
                   sum(x) AS px, sum(y) AS py, sum(x * y) AS pxy,
                   sum(x * x) AS pxx, sum(y * y) AS pyy
            FROM ranked
        )
        SELECT CAST(n AS BIGINT) AS n_customers,
               round({corr("sx", "sy", "sxy", "sxx", "syy")}, 6)
                   AS spearman_rho,
               round({corr("px", "py", "pxy", "pxx", "pyy")}, 6)
                   AS pearson_r
        FROM m
    """


QUERIES["stats_spearman_corr"] = spearman_spend_orders
ORACLES["stats_spearman_corr"] = _spearman_oracle()


# ----------------------------------------------- Benford digit audit

def benford_digit_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit audit of event values against Benford's
    law — the fraud/synthetic-data screen (organic transaction amounts
    follow log10(1+1/d); generated or tampered value columns don't).

    The digit comes from the decimal rendering of exact integer cents
    (no float log10 near power-of-ten boundaries); expected counts and
    chi-square terms are single deterministic double products of exact
    integers, rounded at 6dp.  Scale: one map-side-combinable 9-group
    aggregate over the scan.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 0)
    d = ev.selectExpr(
        "CAST(substring(CAST(CAST(round(value*100) AS BIGINT) AS STRING),"
        " 1, 1) AS BIGINT) AS digit"
    )
    obs = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n_obs"))
    tot = obs.agg(F.sum("n_obs").alias("n"))
    return (
        obs.crossJoin(F.broadcast(tot))
        .selectExpr(
            "digit",
            "n_obs",
            "round(n * (ln(1.0 + 1.0/digit) / ln(10.0)), 6) AS expected",
            "round(pow(n_obs - n * (ln(1.0 + 1.0/digit) / ln(10.0)), 2)"
            " / (n * (ln(1.0 + 1.0/digit) / ln(10.0))), 6) AS chi2_term",
        )
        .orderBy("digit")
    )


QUERIES["stats_benford_digit_test"] = benford_digit_test

ORACLES["stats_benford_digit_test"] = """
    WITH d AS (
        SELECT CAST(substr(CAST(CAST(round(value*100) AS BIGINT)
                                AS VARCHAR), 1, 1) AS BIGINT) AS digit
        FROM events WHERE value > 0
    ),
    obs AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_obs
            FROM d GROUP BY 1),
    tot AS (SELECT sum(n_obs) AS n FROM obs)
    SELECT digit, n_obs,
           round(n * (ln(1.0 + 1.0/digit) / ln(10.0)), 6) AS expected,
           round(pow(n_obs - n * (ln(1.0 + 1.0/digit) / ln(10.0)), 2)
                 / (n * (ln(1.0 + 1.0/digit) / ln(10.0))), 6)
               AS chi2_term
    FROM obs CROSS JOIN tot ORDER BY digit
"""


# -------------------------------------------- Kendall tau-b (daily)

def kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b rank correlation between daily revenue and daily
    event count — the robust monotone-association check next to
    [[stats_spearman_corr]] (tau is less sensitive to single outlier
    days and has an exact small-n null distribution).

    Exact: concordant/discordant/tied counts are integers from the
    day-pair comparison; tau-b's denominator is one sqrt of exact
    integers.  Scale: the fact scan reduces map-side to one row per
    day; the pair stage is a day-grain self-join — bounded by the
    calendar (n(n-1)/2 pairs for n days), never by event volume.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("x"),
        F.count(F.lit(1)).alias("y"),
    )
    pairs = (
        daily.alias("a")
        .join(daily.alias("b"), F.col("a.day") < F.col("b.day"))
        .selectExpr(
            "CAST(sign((b.x - a.x) * (b.y - a.y)) AS BIGINT) AS s",
            "CAST(a.x = b.x AS INT) AS tx",
            "CAST(a.y = b.y AS INT) AS ty",
        )
    )
    m = pairs.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum((F.col("s") == 1).cast("long")).alias("nc"),
        F.sum((F.col("s") == -1).cast("long")).alias("nd"),
        F.sum("tx").alias("t1"),
        F.sum("ty").alias("t2"),
    )
    return m.selectExpr(
        "n0 AS n_pairs",
        "nc AS concordant",
        "nd AS discordant",
        "t1 AS ties_x",
        "t2 AS ties_y",
        "round((nc - nd) / sqrt(CAST((n0 - t1) AS DOUBLE)"
        " * CAST((n0 - t2) AS DOUBLE)), 6) AS tau_b",
    )


QUERIES["stats_kendall_tau_daily"] = kendall_tau_daily

ORACLES["stats_kendall_tau_daily"] = """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(sum(round(value*100)) AS BIGINT) AS x,
               CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    pairs AS (
        SELECT CAST(sign((b.x - a.x) * (b.y - a.y)) AS BIGINT) AS s,
               CASE WHEN a.x = b.x THEN 1 ELSE 0 END AS tx,
               CASE WHEN a.y = b.y THEN 1 ELSE 0 END AS ty
        FROM daily a JOIN daily b ON a.day < b.day
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n0,
               CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS nc,
               CAST(sum(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS nd,
               CAST(sum(tx) AS BIGINT) AS t1,
               CAST(sum(ty) AS BIGINT) AS t2
        FROM pairs
    )
    SELECT n0 AS n_pairs, nc AS concordant, nd AS discordant,
           t1 AS ties_x, t2 AS ties_y,
           round((nc - nd) / sqrt(CAST((n0 - t1) AS DOUBLE)
                 * CAST((n0 - t2) AS DOUBLE)), 6) AS tau_b
    FROM m
"""


# ------------------------------------------- Ljung-Box portmanteau

LJUNG_BOX_LAGS = 7


def ljung_box_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test on daily revenue: is the series
    white noise, or does it carry autocorrelation worth modeling?
    Q = n(n+2) Σ_{k=1..L} r_k²/(n−k) — the one-number gate in front of
    the ACF/seasonality family ([[events_revenue_acf]]).

    The r_k use the same exact-integer centering device as the ACF op
    (u_t = n·x_t − S on decimal(38,0)/HUGEINT partials, one double
    division each, rounded 6dp); each Q term is then integer-scaled
    (1e9) before the order-free sum.  Scale: day-grain after one
    map-side daily aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("x")
    )
    tot = daily.agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("s"))
    u = daily.crossJoin(F.broadcast(tot)).select(
        "day",
        "n",
        (F.col("n") * F.col("x") - F.col("s"))
        .cast("decimal(38,0)")
        .alias("u"),
    )
    w = Window.orderBy("day")
    lagged = u.select(
        "n",
        "u",
        *[
            F.lag("u", k).over(w).alias(f"u{k}")
            for k in range(1, LJUNG_BOX_LAGS + 1)
        ],
    )
    m = lagged.agg(
        F.first("n").alias("n"),
        F.sum(F.col("u") * F.col("u")).alias("den"),
        *[
            F.sum(F.col("u") * F.col(f"u{k}")).alias(f"num{k}")
            for k in range(1, LJUNG_BOX_LAGS + 1)
        ],
    )
    rk = [
        f"round(CAST(num{k} AS DOUBLE) / CAST(den AS DOUBLE), 6)"
        for k in range(1, LJUNG_BOX_LAGS + 1)
    ]
    qsum = " + ".join(
        f"CAST(round(1000000000 * pow({rk[k - 1]}, 2) / (n - {k}))"
        f" AS BIGINT)"
        for k in range(1, LJUNG_BOX_LAGS + 1)
    )
    return m.selectExpr(
        "CAST(n AS BIGINT) AS n_days",
        f"CAST({LJUNG_BOX_LAGS} AS BIGINT) AS n_lags",
        f"round(CAST(n * (n + 2) * ({qsum}) AS DOUBLE) / 1e9, 6)"
        " AS q_stat",
    )


QUERIES["stats_ljung_box_revenue"] = ljung_box_revenue


def _ljung_box_oracle() -> str:
    lag_cols = ", ".join(
        f"lag(u, {k}) OVER (ORDER BY day) AS u{k}"
        for k in range(1, LJUNG_BOX_LAGS + 1)
    )
    nums = ", ".join(
        f"sum(u * u{k}) AS num{k}" for k in range(1, LJUNG_BOX_LAGS + 1)
    )
    rk = [
        f"round(CAST(num{k} AS DOUBLE) / CAST(den AS DOUBLE), 6)"
        for k in range(1, LJUNG_BOX_LAGS + 1)
    ]
    qsum = " + ".join(
        f"CAST(round(1000000000 * pow({rk[k - 1]}, 2) / (n - {k}))"
        f" AS BIGINT)"
        for k in range(1, LJUNG_BOX_LAGS + 1)
    )
    return f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(sum(round(value*100)) AS BIGINT) AS x
            FROM events GROUP BY 1
        ),
        tot AS (SELECT count(*) AS n, sum(x) AS s FROM daily),
        u AS (
            SELECT day, n, CAST(n * x - s AS HUGEINT) AS u
            FROM daily CROSS JOIN tot
        ),
        lagged AS (SELECT n, u, {lag_cols} FROM u),
        m AS (
            SELECT any_value(n) AS n, sum(u * u) AS den, {nums}
            FROM lagged
        )
        SELECT CAST(n AS BIGINT) AS n_days,
               CAST({LJUNG_BOX_LAGS} AS BIGINT) AS n_lags,
               round(CAST(n * (n + 2) * ({qsum}) AS DOUBLE) / 1e9, 6)
                   AS q_stat
        FROM m
    """


ORACLES["stats_ljung_box_revenue"] = _ljung_box_oracle()


# --------------------------------------------- Wald-Wolfowitz runs

def runs_test_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test on daily revenue vs its median: too few
    runs above/below the median means trending/sticky days, too many
    means oscillation — the randomness gate in front of the trend and
    changepoint family.

    The median is an explicit order statistic (rank (n+1) DIV 2); runs
    and the +/− counts are exact integers from one ordered window; the
    z-score is one expression over exact integers.  Scale: day-grain
    after the daily map-side aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("x")
    )
    wv = Window.orderBy("x", "day")
    med = (
        daily.withColumn("rk", F.row_number().over(wv))
        .crossJoin(
            F.broadcast(daily.agg(F.count(F.lit(1)).alias("n")))
        )
        .filter(F.expr("rk = (n + 1) DIV 2"))
        .select(F.col("x").alias("med"))
    )
    wd = Window.orderBy("day")
    signs = (
        daily.crossJoin(F.broadcast(med))
        .filter(F.col("x") != F.col("med"))
        .select("day", (F.col("x") > F.col("med")).alias("up"))
        .withColumn(
            "new_run",
            (
                F.col("up")
                != F.coalesce(F.lag("up").over(wd), ~F.col("up"))
            ).cast("long"),
        )
    )
    m = signs.agg(
        F.sum(F.col("up").cast("long")).alias("n1"),
        F.sum((~F.col("up")).cast("long")).alias("n2"),
        F.sum("new_run").alias("runs"),
    )
    return m.selectExpr(
        "CAST(n1 AS BIGINT) AS n_above",
        "CAST(n2 AS BIGINT) AS n_below",
        "CAST(runs AS BIGINT) AS n_runs",
        # 1.0D/2.0D: bare float literals parse as DECIMAL in Spark SQL
        # (and the decimal propagates through the whole expression)
        "round(1.0D + 2.0D * n1 * n2 / (n1 + n2), 6) AS expected_runs",
        "round((runs - (1.0D + 2.0D * n1 * n2 / (n1 + n2)))"
        " / sqrt(2.0D * n1 * n2 * (2.0D * n1 * n2 - n1 - n2)"
        " / (pow(CAST(n1 + n2 AS DOUBLE), 2) * (n1 + n2 - 1))), 6)"
        " AS z_score",
    )


QUERIES["stats_runs_test_revenue"] = runs_test_revenue

ORACLES["stats_runs_test_revenue"] = """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(sum(round(value*100)) AS BIGINT) AS x
        FROM events GROUP BY 1
    ),
    med AS (
        SELECT x AS med FROM (
            SELECT x, row_number() OVER (ORDER BY x, day) AS rk,
                   count(*) OVER () AS n
            FROM daily
        ) WHERE rk = (n + 1) // 2
    ),
    signs AS (
        SELECT day, x > med AS up
        FROM daily CROSS JOIN med WHERE x != med
    ),
    flagged AS (
        SELECT up,
               CASE WHEN up != COALESCE(
                        lag(up) OVER (ORDER BY day), NOT up)
                    THEN 1 ELSE 0 END AS new_run
        FROM signs
    ),
    m AS (
        SELECT sum(CASE WHEN up THEN 1 ELSE 0 END) AS n1,
               sum(CASE WHEN up THEN 0 ELSE 1 END) AS n2,
               sum(new_run) AS runs
        FROM flagged
    )
    SELECT CAST(n1 AS BIGINT) AS n_above,
           CAST(n2 AS BIGINT) AS n_below,
           CAST(runs AS BIGINT) AS n_runs,
           round(1.0 + 2.0 * n1 * n2 / (n1 + n2), 6) AS expected_runs,
           round((runs - (1.0 + 2.0 * n1 * n2 / (n1 + n2)))
                 / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                 / (pow(CAST(n1 + n2 AS DOUBLE), 2) * (n1 + n2 - 1))), 6)
               AS z_score
    FROM m
"""


# ------------------------------------------ Jarque-Bera normality

JB_CRIT_5PCT = 5.991465  # chi-square(2) 95th percentile


def jarque_bera_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality test on the daily-revenue series: sample
    skewness and (raw) kurtosis from standardized central moments, the
    JB statistic n/6·(b1² + (b2−3)²/4), and the 5% chi-square(2)
    verdict — the gatekeeper before any Gaussian-assuming monitor.

    Exactness: daily revenue is an exact integer-cents sum; each
    centered term u = (cents − mean)/range is a double built from
    integer aggregates only, its powers are explicit multiplications
    (no cross-libm ``pow``), and u², u³, u⁴ freeze to 1e6 integers per
    day before the cross-day sums.  Scale: one map-side pass to days,
    a 1-row bound frame broadcast back — the moment pass shuffles
    |days| rows regardless of input size.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents")
    )
    b = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s1"),
        (F.max("cents") - F.min("cents")).alias("rng"),
    )
    t = (
        daily.crossJoin(F.broadcast(b))
        .selectExpr(
            "n",
            "(cents - CAST(s1 AS DOUBLE) / n) / rng AS u",
        )
        .selectExpr(
            "n",
            "CAST(round(1e6 * u * u) AS BIGINT) AS t2",
            "CAST(round(1e6 * u * u * u) AS BIGINT) AS t3",
            "CAST(round(1e6 * u * u * u * u) AS BIGINT) AS t4",
        )
        .groupBy("n")
        .agg(
            F.sum("t2").alias("s2"),
            F.sum("t3").alias("s3"),
            F.sum("t4").alias("s4"),
        )
    )
    return t.selectExpr(
        "CAST(n AS BIGINT) AS n_days",
        "round((CAST(s3 AS DOUBLE)/n/1e6)"
        " / ((CAST(s2 AS DOUBLE)/n/1e6)"
        "    * sqrt(CAST(s2 AS DOUBLE)/n/1e6)), 6) AS skewness",
        "round((CAST(s4 AS DOUBLE)/n/1e6)"
        " / ((CAST(s2 AS DOUBLE)/n/1e6)"
        "    * (CAST(s2 AS DOUBLE)/n/1e6)), 6) AS kurtosis",
        "round(n / 6.0 * ("
        "  ((CAST(s3 AS DOUBLE)/n/1e6)"
        "   / ((CAST(s2 AS DOUBLE)/n/1e6)"
        "      * sqrt(CAST(s2 AS DOUBLE)/n/1e6)))"
        "  * ((CAST(s3 AS DOUBLE)/n/1e6)"
        "     / ((CAST(s2 AS DOUBLE)/n/1e6)"
        "        * sqrt(CAST(s2 AS DOUBLE)/n/1e6)))"
        "  + ((CAST(s4 AS DOUBLE)/n/1e6)"
        "     / ((CAST(s2 AS DOUBLE)/n/1e6)"
        "        * (CAST(s2 AS DOUBLE)/n/1e6)) - 3.0)"
        "    * ((CAST(s4 AS DOUBLE)/n/1e6)"
        "       / ((CAST(s2 AS DOUBLE)/n/1e6)"
        "          * (CAST(s2 AS DOUBLE)/n/1e6)) - 3.0) / 4.0"
        f"), 6) AS jb_stat",
        "CAST(CASE WHEN n / 6.0 * ("
        "  ((CAST(s3 AS DOUBLE)/n/1e6)"
        "   / ((CAST(s2 AS DOUBLE)/n/1e6)"
        "      * sqrt(CAST(s2 AS DOUBLE)/n/1e6)))"
        "  * ((CAST(s3 AS DOUBLE)/n/1e6)"
        "     / ((CAST(s2 AS DOUBLE)/n/1e6)"
        "        * sqrt(CAST(s2 AS DOUBLE)/n/1e6)))"
        "  + ((CAST(s4 AS DOUBLE)/n/1e6)"
        "     / ((CAST(s2 AS DOUBLE)/n/1e6)"
        "        * (CAST(s2 AS DOUBLE)/n/1e6)) - 3.0)"
        "    * ((CAST(s4 AS DOUBLE)/n/1e6)"
        "       / ((CAST(s2 AS DOUBLE)/n/1e6)"
        "          * (CAST(s2 AS DOUBLE)/n/1e6)) - 3.0) / 4.0"
        f") > {JB_CRIT_5PCT} THEN 1 ELSE 0 END AS BIGINT)"
        " AS reject_normal",
    )


QUERIES["stats_jarque_bera"] = jarque_bera_revenue

_JB_SKEW = """((CAST(sum(t3) AS DOUBLE)/any_value(n)/1e6)
   / ((CAST(sum(t2) AS DOUBLE)/any_value(n)/1e6)
      * sqrt(CAST(sum(t2) AS DOUBLE)/any_value(n)/1e6)))"""
_JB_KURT = """((CAST(sum(t4) AS DOUBLE)/any_value(n)/1e6)
   / ((CAST(sum(t2) AS DOUBLE)/any_value(n)/1e6)
      * (CAST(sum(t2) AS DOUBLE)/any_value(n)/1e6)))"""

ORACLES["stats_jarque_bera"] = f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               sum(CAST(round(value * 100) AS BIGINT)) AS cents
        FROM events GROUP BY 1
    ),
    b AS (
        SELECT count(*) AS n, sum(cents) AS s1,
               max(cents) - min(cents) AS rng
        FROM daily
    ),
    u AS (
        SELECT b.n,
               (d.cents - CAST(b.s1 AS DOUBLE) / b.n) / b.rng AS u
        FROM daily d, b
    ),
    t AS (
        SELECT n,
               CAST(round(1e6 * u * u) AS BIGINT) AS t2,
               CAST(round(1e6 * u * u * u) AS BIGINT) AS t3,
               CAST(round(1e6 * u * u * u * u) AS BIGINT) AS t4
        FROM u
    )
    SELECT CAST(any_value(n) AS BIGINT) AS n_days,
           round({_JB_SKEW}, 6) AS skewness,
           round({_JB_KURT}, 6) AS kurtosis,
           round(any_value(n) / 6.0 * ({_JB_SKEW} * {_JB_SKEW}
                 + ({_JB_KURT} - 3.0) * ({_JB_KURT} - 3.0) / 4.0), 6)
               AS jb_stat,
           CAST(CASE WHEN any_value(n) / 6.0 * ({_JB_SKEW} * {_JB_SKEW}
                 + ({_JB_KURT} - 3.0) * ({_JB_KURT} - 3.0) / 4.0)
                 > {JB_CRIT_5PCT} THEN 1 ELSE 0 END AS BIGINT)
               AS reject_normal
    FROM t
"""


# ------------------------------------------ one-way ANOVA (F-test)

ANOVA_F_CRIT_4_INF = 2.371945  # F(4, ∞) 95th percentile — k=5 groups


def anova_oneway_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of event value across event types: between/within
    sum-of-squares decomposition and the F statistic — "does the mean
    transaction value differ by event type at all?" before any pairwise
    test.

    Exactness: per-group n, Σc, Σc² on integer cents are exact; each
    group's between-groups contribution s²/n freezes to an integer
    (round of a double built from exact ints) before the cross-group
    sum, so no float summation order leaks.  Scale: one map-side
    partial aggregate to k rows; everything after is arithmetic on a
    k-row frame.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("q"),
    )
    per = g.selectExpr(
        "n",
        "s",
        "q",
        "CAST(round(CAST(s AS DOUBLE) * s / n) AS BIGINT) AS bg",
    )
    tot = per.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("nn"),
        F.sum("s").alias("ss"),
        F.sum("q").alias("qq"),
        F.sum("bg").alias("sbg"),
    )
    return tot.selectExpr(
        "CAST(k AS BIGINT) AS k_groups",
        "CAST(nn AS BIGINT) AS n_rows",
        # SSB = Σs_g²/n_g − S²/N ; SSW = Q − Σs_g²/n_g   (cents²)
        "round((sbg - CAST(ss AS DOUBLE) * ss / nn) / 1e4, 2) AS ss_between",
        "round((qq - CAST(sbg AS DOUBLE)) / 1e4, 2) AS ss_within",
        "round(((sbg - CAST(ss AS DOUBLE) * ss / nn) / (k - 1))"
        " / ((qq - CAST(sbg AS DOUBLE)) / (nn - k)), 6) AS f_stat",
        "CAST(CASE WHEN ((sbg - CAST(ss AS DOUBLE) * ss / nn) / (k - 1))"
        " / ((qq - CAST(sbg AS DOUBLE)) / (nn - k))"
        f" > {ANOVA_F_CRIT_4_INF} THEN 1 ELSE 0 END AS BIGINT)"
        " AS reject_equal_means",
    )


QUERIES["stats_anova_oneway"] = anova_oneway_value

ORACLES["stats_anova_oneway"] = f"""
    WITH c AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
        FROM events
    ),
    g AS (
        SELECT event_type, count(*) AS n, sum(c) AS s, sum(c * c) AS q
        FROM c GROUP BY 1
    ),
    per AS (
        SELECT n, s, q,
               CAST(round(CAST(s AS DOUBLE) * s / n) AS BIGINT) AS bg
        FROM g
    ),
    tot AS (
        SELECT count(*) AS k, sum(n) AS nn, sum(s) AS ss,
               sum(q) AS qq, sum(bg) AS sbg
        FROM per
    )
    SELECT CAST(k AS BIGINT) AS k_groups,
           CAST(nn AS BIGINT) AS n_rows,
           round((sbg - CAST(ss AS DOUBLE) * ss / nn) / 1e4, 2)
               AS ss_between,
           round((qq - CAST(sbg AS DOUBLE)) / 1e4, 2) AS ss_within,
           round(((sbg - CAST(ss AS DOUBLE) * ss / nn) / (k - 1))
                 / ((qq - CAST(sbg AS DOUBLE)) / (nn - k)), 6) AS f_stat,
           CAST(CASE WHEN ((sbg - CAST(ss AS DOUBLE) * ss / nn) / (k - 1))
                 / ((qq - CAST(sbg AS DOUBLE)) / (nn - k))
                 > {ANOVA_F_CRIT_4_INF} THEN 1 ELSE 0 END AS BIGINT)
               AS reject_equal_means
    FROM tot
"""


# ------------------------------------------ Hill tail-index estimator


def hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the user-activity tail index: over the k most
    active users, γ = mean ln(c_(i)/c_(k)) and α = 1/γ — the
    heavy-tail exponent that decides whether per-user state needs skew
    handling (α ≤ 2 means the hottest users dominate any shuffle).

    k adapts as max(5, n_users/10) so the estimator is defined at
    every SF.  Exactness: the top-k cut is a deterministic rank
    (count desc, user_id asc); each ln(count) freezes to a 1e6 integer
    before the cross-user sum (the ``zipf_fit`` device).  Scale: one
    per-user count; the rank rides the bucket decomposition
    (rankops.global_rank), never a single-partition window over users.
    """
    ev = load_table(spark, sf_dir, "events")
    # checkpointed: the per-user count feeds the user-count aggregate
    # AND the rank (two events scans + user shuffles without it); the
    # ranked frame feeds the kth-cut lookup AND the top-k fold, so it
    # carries its own barrier too
    per = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    nu = per.agg(F.count(F.lit(1)).alias("n_users"))
    ranked = (
        global_rank(per, "c", "user_id", descending=True, rank_name="rk")
        .crossJoin(F.broadcast(nu))
        .selectExpr(
            "c",
            "rk",
            "n_users",
            "greatest(5, n_users DIV 10) AS k",
            "CAST(round(ln(CAST(c AS DOUBLE)) * 1e6) AS BIGINT) AS lnc",
        )
        .localCheckpoint(eager=False)
    )
    kth = ranked.filter(F.col("rk") == F.col("k")).selectExpr(
        "c AS ck", "lnc AS lnck"
    )
    top = ranked.filter(F.col("rk") < F.col("k"))
    agg = top.groupBy("n_users", "k").agg(
        F.sum("lnc").alias("s_ln"), F.count(F.lit(1)).alias("m")
    )
    return agg.crossJoin(F.broadcast(kth)).selectExpr(
        "CAST(n_users AS BIGINT) AS n_users",
        "CAST(k AS BIGINT) AS k",
        "CAST(ck AS BIGINT) AS kth_count",
        "round((s_ln - m * lnck) / (CAST(m AS DOUBLE) * 1e6), 6)"
        " AS gamma_hill",
        "round((CAST(m AS DOUBLE) * 1e6) / (s_ln - m * lnck), 6)"
        " AS alpha_tail",
    )


QUERIES["stats_hill_tail_index"] = hill_tail_index

ORACLES["stats_hill_tail_index"] = """
    WITH per AS (
        SELECT user_id, count(*) AS c FROM events GROUP BY 1
    ),
    nu AS (SELECT count(*) AS n_users FROM per),
    ranked AS (
        SELECT c,
               row_number() OVER (ORDER BY c DESC, user_id ASC) AS rk,
               n.n_users,
               greatest(5, n.n_users // 10) AS k,
               CAST(round(ln(c * 1.0) * 1e6) AS BIGINT) AS lnc
        FROM per, nu n
    ),
    kth AS (SELECT c AS ck, lnc AS lnck FROM ranked WHERE rk = k),
    agg AS (
        SELECT n_users, k, sum(lnc) AS s_ln, count(*) AS m
        FROM ranked WHERE rk < k GROUP BY 1, 2
    )
    SELECT CAST(a.n_users AS BIGINT) AS n_users,
           CAST(a.k AS BIGINT) AS k,
           CAST(kth.ck AS BIGINT) AS kth_count,
           round((a.s_ln - a.m * kth.lnck)
                 / (CAST(a.m AS DOUBLE) * 1e6), 6) AS gamma_hill,
           round((CAST(a.m AS DOUBLE) * 1e6)
                 / (a.s_ln - a.m * kth.lnck), 6) AS alpha_tail
    FROM agg a, kth
"""


# ------------------------------------------ pairwise Cohen's d


def cohens_d_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Cohen's d effect size between every pair of event
    types on transaction value — the magnitude readout that belongs
    next to the ANOVA verdict ([[stats_anova_oneway]] says the means
    differ; this says by how many pooled standard deviations).

    All moments are exact integer-cents sums; d and the pooled SD are
    single double expressions over one k-row aggregate (k = #types),
    joined k(k−1)/2 ways — trivially broadcastable.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("q"),
    )
    a = g.selectExpr(
        "event_type AS type_a", "n AS an", "s AS as_", "q AS aq"
    )
    b = g.selectExpr(
        "event_type AS type_b", "n AS bn", "s AS bs", "q AS bq"
    )
    return (
        a.join(b, F.col("type_a") < F.col("type_b"))
        .selectExpr(
            "type_a",
            "type_b",
            "round((CAST(as_ AS DOUBLE)/an - CAST(bs AS DOUBLE)/bn)"
            " / sqrt(((aq - CAST(as_ AS DOUBLE)*as_/an)"
            "         + (bq - CAST(bs AS DOUBLE)*bs/bn))"
            "        / (an + bn - 2)), 6) AS cohens_d",
            "round(sqrt(((aq - CAST(as_ AS DOUBLE)*as_/an)"
            "            + (bq - CAST(bs AS DOUBLE)*bs/bn))"
            "           / (an + bn - 2)) / 100, 6) AS pooled_sd",
        )
        .orderBy("type_a", "type_b")
    )


QUERIES["stats_cohens_d_pairs"] = cohens_d_pairs

ORACLES["stats_cohens_d_pairs"] = """
    WITH c AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
        FROM events
    ),
    g AS (
        SELECT event_type, count(*) AS n, sum(c) AS s, sum(c * c) AS q
        FROM c GROUP BY 1
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           round((CAST(a.s AS DOUBLE)/a.n - CAST(b.s AS DOUBLE)/b.n)
                 / sqrt(((a.q - CAST(a.s AS DOUBLE)*a.s/a.n)
                         + (b.q - CAST(b.s AS DOUBLE)*b.s/b.n))
                        / (a.n + b.n - 2)), 6) AS cohens_d,
           round(sqrt(((a.q - CAST(a.s AS DOUBLE)*a.s/a.n)
                       + (b.q - CAST(b.s AS DOUBLE)*b.s/b.n))
                      / (a.n + b.n - 2)) / 100, 6) AS pooled_sd
    FROM g a JOIN g b ON a.event_type < b.event_type
    ORDER BY type_a, type_b
"""


# -------------------------------- Brown-Forsythe variance equality


def levene_bf_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe (median-centered Levene) test of variance
    equality across event types — the robust gatekeeper that decides
    whether the pooled-variance assumptions behind
    [[stats_anova_oneway]] and [[stats_cohens_d_pairs]] hold at all.

    The spread score is |2c − 2·median| — doubled so the even-count
    median interpolation (x.5 cents) stays an exact integer; W is
    then the one-way F statistic on those integer scores, with the
    same frozen per-group s²/n device as the ANOVA.  Scale: one
    exact-median pass per group (at 100 TB swap in the histogram-
    quantile sketch), one integer-moment pass.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    med = ev.groupBy("event_type").agg(
        (F.expr("percentile(c, 0.5)") * 2).cast("long").alias("med2")
    )
    z = ev.join(F.broadcast(med), "event_type").selectExpr(
        "event_type", "abs(2*c - med2) AS z2"
    )
    g = z.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("z2").alias("s"),
        F.sum(F.col("z2") * F.col("z2")).alias("q"),
    )
    per = g.selectExpr(
        "n", "s", "q",
        "CAST(round(CAST(s AS DOUBLE) * s / n) AS BIGINT) AS bg",
    )
    tot = per.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("nn"),
        F.sum("s").alias("ss"),
        F.sum("q").alias("qq"),
        F.sum("bg").alias("sbg"),
    )
    return tot.selectExpr(
        "CAST(k AS BIGINT) AS k_groups",
        "CAST(nn AS BIGINT) AS n_rows",
        "round(((sbg - CAST(ss AS DOUBLE)*ss/nn) / (k-1))"
        " / ((qq - CAST(sbg AS DOUBLE)) / (nn-k)), 6) AS w_stat",
        "CAST(CASE WHEN ((sbg - CAST(ss AS DOUBLE)*ss/nn) / (k-1))"
        " / ((qq - CAST(sbg AS DOUBLE)) / (nn-k))"
        f" > {ANOVA_F_CRIT_4_INF} THEN 1 ELSE 0 END AS BIGINT)"
        " AS reject_equal_variance",
    )


QUERIES["stats_levene_bf"] = levene_bf_test

ORACLES["stats_levene_bf"] = f"""
    WITH c AS (
        SELECT event_type, CAST(round(value*100) AS BIGINT) AS c
        FROM events
    ),
    med AS (
        SELECT event_type, CAST(2 * median(c) AS BIGINT) AS med2
        FROM c GROUP BY 1
    ),
    z AS (
        SELECT c.event_type, abs(2*c.c - m.med2) AS z2
        FROM c JOIN med m USING (event_type)
    ),
    g AS (
        SELECT event_type, count(*) AS n, sum(z2) AS s, sum(z2*z2) AS q
        FROM z GROUP BY 1
    ),
    per AS (
        SELECT n, s, q,
               CAST(round(CAST(s AS DOUBLE) * s / n) AS BIGINT) AS bg
        FROM g
    ),
    tot AS (
        SELECT count(*) AS k, sum(n) AS nn, sum(s) AS ss, sum(q) AS qq,
               sum(bg) AS sbg
        FROM per
    )
    SELECT CAST(k AS BIGINT) AS k_groups, CAST(nn AS BIGINT) AS n_rows,
           round(((sbg - CAST(ss AS DOUBLE)*ss/nn) / (k-1))
                 / ((qq - CAST(sbg AS DOUBLE)) / (nn-k)), 6) AS w_stat,
           CAST(CASE WHEN ((sbg - CAST(ss AS DOUBLE)*ss/nn) / (k-1))
                 / ((qq - CAST(sbg AS DOUBLE)) / (nn-k))
                 > {ANOVA_F_CRIT_4_INF}
                THEN 1 ELSE 0 END AS BIGINT) AS reject_equal_variance
    FROM tot
"""


# ------------------------------------------- A/B power analysis (MDE)

Z_ALPHA_2 = 1.959964  # two-sided 5%
Z_BETA = 0.841621  # 80% power


def power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum detectable effect of the weekday-vs-weekend purchase-
    rate comparison at α = 5% (two-sided), 80% power, given the
    observed group sizes and pooled rate — the "is this experiment
    even powered?" pre-check that belongs in front of
    [[stats_two_proportion_ztest]].

    MDE = (z_{α/2} + z_β)·√(p̄(1−p̄)(1/n₁ + 1/n₂)) with everything
    built from exact integer counts; z constants are fixed literals in
    both engines.  Scale: one map-side conditional-count aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    g = ev.selectExpr(
        "CASE WHEN dayofweek(ts) IN (1, 7) THEN 'weekend'"
        " ELSE 'weekday' END AS grp",
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv",
    )
    m = g.agg(
        F.sum(F.expr("CASE WHEN grp = 'weekday' THEN 1 ELSE 0 END")).alias(
            "n1"
        ),
        F.sum(
            F.expr("CASE WHEN grp = 'weekday' THEN conv ELSE 0 END")
        ).alias("c1"),
        F.sum(F.expr("CASE WHEN grp = 'weekend' THEN 1 ELSE 0 END")).alias(
            "n2"
        ),
        F.sum(
            F.expr("CASE WHEN grp = 'weekend' THEN conv ELSE 0 END")
        ).alias("c2"),
    )
    zz = Z_ALPHA_2 + Z_BETA
    return m.selectExpr(
        "CAST(n1 AS BIGINT) AS n_weekday",
        "CAST(n2 AS BIGINT) AS n_weekend",
        "(2*(c1+c2)*1000000 + (n1+n2)) DIV (2*(n1+n2))"
        " AS pooled_rate_ppm",
        f"round({zz!r}"
        " * sqrt(CAST(c1+c2 AS DOUBLE)/(n1+n2)"
        "        * (1 - CAST(c1+c2 AS DOUBLE)/(n1+n2))"
        "        * (1.0/n1 + 1.0/n2)), 6) AS mde_abs",
        f"CAST(round({zz!r}"
        " * sqrt(CAST(c1+c2 AS DOUBLE)/(n1+n2)"
        "        * (1 - CAST(c1+c2 AS DOUBLE)/(n1+n2))"
        "        * (1.0/n1 + 1.0/n2))"
        " / (CAST(c1+c2 AS DOUBLE)/(n1+n2)) * 1e6) AS BIGINT)"
        " AS mde_rel_ppm",
    )


QUERIES["stats_power_mde"] = power_mde

ORACLES["stats_power_mde"] = f"""
    WITH g AS (
        SELECT CASE WHEN dayofweek(ts) + 1 IN (1, 7) THEN 'weekend'
               ELSE 'weekday' END AS grp,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                   AS conv
        FROM events
    ),
    m AS (
        SELECT sum(CASE WHEN grp = 'weekday' THEN 1 ELSE 0 END) AS n1,
               sum(CASE WHEN grp = 'weekday' THEN conv ELSE 0 END) AS c1,
               sum(CASE WHEN grp = 'weekend' THEN 1 ELSE 0 END) AS n2,
               sum(CASE WHEN grp = 'weekend' THEN conv ELSE 0 END) AS c2
        FROM g
    )
    SELECT CAST(n1 AS BIGINT) AS n_weekday,
           CAST(n2 AS BIGINT) AS n_weekend,
           CAST((2*(c1+c2)*1000000 + (n1+n2)) // (2*(n1+n2)) AS BIGINT)
               AS pooled_rate_ppm,
           round({Z_ALPHA_2 + Z_BETA!r}
                 * sqrt(CAST(c1+c2 AS DOUBLE)/(n1+n2)
                        * (1 - CAST(c1+c2 AS DOUBLE)/(n1+n2))
                        * (1.0/n1 + 1.0/n2)), 6) AS mde_abs,
           CAST(round({Z_ALPHA_2 + Z_BETA!r}
                 * sqrt(CAST(c1+c2 AS DOUBLE)/(n1+n2)
                        * (1 - CAST(c1+c2 AS DOUBLE)/(n1+n2))
                        * (1.0/n1 + 1.0/n2))
                 / (CAST(c1+c2 AS DOUBLE)/(n1+n2)) * 1e6) AS BIGINT)
               AS mde_rel_ppm
    FROM m
"""


# --------------------------------- Theil inequality decomposition


def theil_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-T inequality of per-customer revenue, decomposed into
    between-nation and within-nation components — the additive
    decomposition Gini can't give ([[revenue_gini]] says HOW unequal;
    this says WHERE the inequality lives: across markets or inside
    them).

    T = (1/n)Σ(x/μ)ln(x/μ); every ln ratio is exact-rational-fed and
    freezes to a 1e6 integer, and each summed term cents·lnr stays a
    BIGINT product, so the cross-row sums are exact integers with one
    double division at the end.  Scale: one order-grain aggregate to
    customers (shuffle on custkey), one nation rollup, both map-side
    combinable.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    pc = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            orders.o_custkey == cust.c_custkey,
        )
        .groupBy("c_nationkey", "o_custkey")
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("long")
            ).alias("cents")
        )
    ).cache()
    tot = pc.agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s")
    )
    terms = (
        pc.filter("cents > 0")
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "cents",
            "s",
            "cents * CAST(round(ln(CAST(cents AS DOUBLE) * n / s) * 1e6)"
            " AS BIGINT) AS t",
        )
    )
    total_t = terms.agg(
        F.sum("t").alias("st"), F.any_value("s").alias("s")
    ).selectExpr(
        "round(CAST(st AS DOUBLE) / (CAST(s AS DOUBLE) * 1e6), 6)"
        " AS theil_total"
    )
    grp = pc.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("ng"), F.sum("cents").alias("sg")
    )
    btw = (
        grp.crossJoin(F.broadcast(tot))
        .selectExpr(
            "s",
            "sg * CAST(round(ln((CAST(sg AS DOUBLE) * n)"
            " / (CAST(s AS DOUBLE) * ng)) * 1e6) AS BIGINT) AS t",
        )
        .agg(F.sum("t").alias("st"), F.any_value("s").alias("s"))
        .selectExpr(
            "round(CAST(st AS DOUBLE) / (CAST(s AS DOUBLE) * 1e6), 6)"
            " AS theil_between"
        )
    )
    return (
        tot.crossJoin(F.broadcast(total_t))
        .crossJoin(F.broadcast(btw))
        .selectExpr(
            "CAST(n AS BIGINT) AS n_customers",
            "theil_total",
            "theil_between",
            "round(theil_total - theil_between, 6) AS theil_within",
        )
    )


QUERIES["stats_theil_decomposition"] = theil_decomposition

ORACLES["stats_theil_decomposition"] = """
    WITH pc AS (
        SELECT c.c_nationkey AS nk, o.o_custkey AS ck,
               sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    ),
    tot AS (SELECT count(*) AS n, sum(cents) AS s FROM pc),
    terms AS (
        SELECT cents * CAST(round(ln(CAST(cents AS DOUBLE) * t.n / t.s)
                                  * 1e6) AS BIGINT) AS t,
               t.s
        FROM pc, tot t WHERE cents > 0
    ),
    total_t AS (
        SELECT round(CAST(sum(t) AS DOUBLE)
                     / (CAST(any_value(s) AS DOUBLE) * 1e6), 6)
                   AS theil_total
        FROM terms
    ),
    grp AS (
        SELECT nk, count(*) AS ng, sum(cents) AS sg FROM pc GROUP BY 1
    ),
    btw AS (
        SELECT round(CAST(sum(sg * CAST(round(ln(
                   (CAST(sg AS DOUBLE) * t.n)
                   / (CAST(t.s AS DOUBLE) * ng)) * 1e6) AS BIGINT))
                   AS DOUBLE)
                   / (CAST(any_value(t.s) AS DOUBLE) * 1e6), 6)
                   AS theil_between
        FROM grp, tot t
    )
    SELECT CAST(t.n AS BIGINT) AS n_customers,
           tt.theil_total, b.theil_between,
           round(tt.theil_total - b.theil_between, 6) AS theil_within
    FROM tot t, total_t tt, btw b
"""


# ------------------------------------------- Kruskal-Wallis H test


def kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H: do order VALUES differ across the five order
    priorities?  The k-group extension of ``stats_mann_whitney_utest``
    — rank-based, so a heavy tail in one priority class cannot fake
    (or mask) a location shift the way it can in ``stats_anova_oneway``.

    Exactness: the same tie-group rank device as Mann-Whitney
    (``2·avg_rank = 2·below + t + 1`` on the distinct-cents frame), so
    every doubled group rank sum ``2·R_g`` is an order-free integer;
    each group's ``R_g²/n_g`` term freezes to a long (the ANOVA ``bg``
    device) before the cross-group sum, and H plus its tie correction
    is one fixed double expression over exact longs.  Scale: the fact
    scan reduces map-side to (cents, per-priority counts) cells; the
    only window runs over the DISTINCT price frame, and the final
    reduce carries a dozen longs.
    """
    od = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.substring("o_orderpriority", 1, 1).cast("int").alias("g"),
    )
    cells = od.groupBy("cents").agg(
        F.count(F.lit(1)).alias("t"),
        *[
            F.sum(F.when(F.col("g") == i, 1).otherwise(0)).alias(f"t{i}")
            for i in range(1, 6)
        ],
    )
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, -1)
    ranked = cells.withColumn(
        "below", F.coalesce(F.sum("t").over(w), F.lit(0))
    )
    m = ranked.agg(
        F.sum("t").alias("n"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias(
            "ties"
        ),
        *[F.sum(f"t{i}").alias(f"n{i}") for i in range(1, 6)],
        *[
            F.sum(
                F.col(f"t{i}") * (2 * F.col("below") + F.col("t") + 1)
            ).alias(f"r{i}")
            for i in range(1, 6)
        ],
    )
    # each group's (2R_g)²/n_g stays a DOUBLE — (2R_g)² passes 2^63 at
    # the 64× probe scale, so an integer freeze would overflow; the
    # cross-group sum is written in FIXED textual order (b1+…+b5), so
    # both engines evaluate the identical IEEE expression and the
    # result is deterministic without integer exactness.  (r_g itself
    # is an exact long up to ~10⁹ rows: r_g ≤ 2·N·n_g.)
    per = m.selectExpr(
        "n",
        "ties",
        *[
            f"CAST(r{i} AS DOUBLE) * r{i} / n{i} AS b{i}"
            for i in range(1, 6)
        ],
    ).selectExpr(
        "n",
        "ties",
        "b1 + b2 + b3 + b4 + b5 AS sb",  # Σ (2R_g)²/n_g, fixed order
    )
    # H = 12/(N(N+1)) · Σ R_g²/n_g − 3(N+1), with R_g = r_g/2 → /4;
    # tie-corrected H' = H / (1 − Σ(t³−t)/(N³−N))
    h = (
        "12.0 / (CAST(n AS DOUBLE) * (n + 1)) * (CAST(sb AS DOUBLE) / 4.0)"
        " - 3.0 * (n + 1)"
    )
    hc = (
        f"({h}) / (1.0 - CAST(ties AS DOUBLE)"
        " / (CAST(n AS DOUBLE) * n * n - n))"
    )
    return per.selectExpr(
        "CAST(n AS BIGINT) AS n_orders",
        "CAST(4 AS BIGINT) AS df",
        f"round({h}, 6) AS h_stat",
        f"round({hc}, 6) AS h_tie_corrected",
        # chi-square(4) critical value at 0.05
        f"CAST(CASE WHEN ({hc}) > 9.487729 THEN 1 ELSE 0 END AS BIGINT)"
        " AS reject_equal_medians",
    )


QUERIES["stats_kruskal_wallis"] = kruskal_wallis


def _kruskal_oracle() -> str:
    tcols = ",\n                   ".join(
        f"sum(CASE WHEN g = {i} THEN 1 ELSE 0 END) AS t{i}"
        for i in range(1, 6)
    )
    ncols = ", ".join(f"sum(t{i}) AS n{i}" for i in range(1, 6))
    rcols = ", ".join(
        f"sum(t{i} * (2 * below + t + 1)) AS r{i}" for i in range(1, 6)
    )
    bcols = ", ".join(
        f"CAST(r{i} AS DOUBLE) * r{i} / n{i} AS b{i}"
        for i in range(1, 6)
    )
    h = (
        "12.0 / (CAST(n AS DOUBLE) * (n + 1)) * (CAST(sb AS DOUBLE) / 4.0)"
        " - 3.0 * (n + 1)"
    )
    hc = (
        f"({h}) / (1.0 - CAST(ties AS DOUBLE)"
        " / (CAST(n AS DOUBLE) * n * n - n))"
    )
    return f"""
        WITH od AS (
            SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                   CAST(substr(o_orderpriority, 1, 1) AS INT) AS g
            FROM orders
        ),
        cells AS (
            SELECT cents, count(*) AS t,
                   {tcols}
            FROM od GROUP BY 1
        ),
        ranked AS (
            SELECT *,
                   COALESCE(sum(t) OVER (ORDER BY cents
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING), 0) AS below
            FROM cells
        ),
        m AS (
            SELECT sum(t) AS n, sum(t * t * t - t) AS ties,
                   {ncols}, {rcols}
            FROM ranked
        ),
        per AS (SELECT n, ties, {bcols} FROM m),
        fin AS (SELECT n, ties, b1 + b2 + b3 + b4 + b5 AS sb FROM per)
        SELECT CAST(n AS BIGINT) AS n_orders,
               CAST(4 AS BIGINT) AS df,
               round({h}, 6) AS h_stat,
               round({hc}, 6) AS h_tie_corrected,
               CAST(CASE WHEN ({hc}) > 9.487729 THEN 1 ELSE 0 END
                    AS BIGINT) AS reject_equal_medians
        FROM fin
    """


ORACLES["stats_kruskal_wallis"] = _kruskal_oracle()


# ------------------------------------------------ Welch unequal-variance t


def welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test: weekend vs weekday purchase
    VALUES — the inference companion to
    ``events_weekday_weekend_lift``'s descriptive ratio (a lift of
    1.04 means nothing without knowing whether it clears noise).
    Welch, not pooled Student: the two arms have different sizes (5/7
    of days are weekdays) and nothing guarantees equal variances.

    Exactness: per-arm n, Σc, Σc² on integer cents are exact map-side
    sums; the t statistic and Welch-Satterthwaite df are one fixed
    double expression over six exact longs.  Degenerate arms (n < 2,
    where the sample variance is undefined) return NULL t/df and 0 for
    the rejection flag instead of a division-by-zero NaN cascade; an
    empty arm also NULLs the mean difference.  Scale: the whole scan
    reduces to one six-long row.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    m = ev.select(
        F.dayofweek("ts").isin(1, 7).alias("we"),
        F.round(F.col("value") * 100).cast("long").alias("c"),
    ).agg(
        F.sum(F.when(F.col("we"), 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("we"), F.col("c")).otherwise(0)).alias("s1"),
        F.sum(
            F.when(F.col("we"), F.col("c") * F.col("c")).otherwise(0)
        ).alias("q1"),
        F.sum(F.when(~F.col("we"), 1).otherwise(0)).alias("n2"),
        F.sum(F.when(~F.col("we"), F.col("c")).otherwise(0)).alias("s2"),
        F.sum(
            F.when(~F.col("we"), F.col("c") * F.col("c")).otherwise(0)
        ).alias("q2"),
    )
    # sample variance s² = (Q − S²/n)/(n−1); se² = s1²/n1 + s2²/n2
    v1 = "((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1) / (n1 - 1))"
    v2 = "((CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2) / (n2 - 1))"
    se2 = f"({v1} / n1 + {v2} / n2)"
    t = (
        f"(CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)"
        f" / sqrt({se2})"
    )
    df_ws = (
        f"({se2} * {se2})"
        f" / ({v1} * {v1} / (CAST(n1 AS DOUBLE) * n1 * (n1 - 1))"
        f"    + {v2} * {v2} / (CAST(n2 AS DOUBLE) * n2 * (n2 - 1)))"
    )
    return m.selectExpr(
        "CAST(n1 AS BIGINT) AS n_weekend",
        "CAST(n2 AS BIGINT) AS n_weekday",
        "CASE WHEN n1 >= 1 AND n2 >= 1 THEN"
        " round(CAST(s1 AS DOUBLE) / n1 / 100"
        " - CAST(s2 AS DOUBLE) / n2 / 100, 6) END AS mean_diff",
        f"CASE WHEN n1 >= 2 AND n2 >= 2 THEN round({t}, 6)"
        " END AS t_value",
        f"CASE WHEN n1 >= 2 AND n2 >= 2 THEN round({df_ws}, 2)"
        " END AS welch_df",
        "CAST(CASE WHEN n1 >= 2 AND n2 >= 2"
        f" AND abs({t}) > 1.959964 THEN 1 ELSE 0 END"
        " AS BIGINT) AS reject_equal_means",
    )


QUERIES["stats_welch_ttest"] = welch_ttest


def _welch_oracle() -> str:
    v1 = "((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1) / (n1 - 1))"
    v2 = "((CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2) / (n2 - 1))"
    se2 = f"({v1} / n1 + {v2} / n2)"
    t = (
        f"(CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)"
        f" / sqrt({se2})"
    )
    df_ws = (
        f"({se2} * {se2})"
        f" / ({v1} * {v1} / (CAST(n1 AS DOUBLE) * n1 * (n1 - 1))"
        f"    + {v2} * {v2} / (CAST(n2 AS DOUBLE) * n2 * (n2 - 1)))"
    )
    return f"""
        WITH m AS (
            SELECT dayofweek(ts) IN (0, 6) AS we,
                   CAST(round(value * 100) AS BIGINT) AS c
            FROM events WHERE event_type = 'purchase'
        ),
        agg AS (
            SELECT sum(CASE WHEN we THEN 1 ELSE 0 END) AS n1,
                   sum(CASE WHEN we THEN c ELSE 0 END) AS s1,
                   sum(CASE WHEN we THEN c * c ELSE 0 END) AS q1,
                   sum(CASE WHEN NOT we THEN 1 ELSE 0 END) AS n2,
                   sum(CASE WHEN NOT we THEN c ELSE 0 END) AS s2,
                   sum(CASE WHEN NOT we THEN c * c ELSE 0 END) AS q2
            FROM m
        )
        SELECT CAST(n1 AS BIGINT) AS n_weekend,
               CAST(n2 AS BIGINT) AS n_weekday,
               CASE WHEN n1 >= 1 AND n2 >= 1 THEN
                    round(CAST(s1 AS DOUBLE) / n1 / 100
                          - CAST(s2 AS DOUBLE) / n2 / 100, 6)
               END AS mean_diff,
               CASE WHEN n1 >= 2 AND n2 >= 2 THEN round({t}, 6)
               END AS t_value,
               CASE WHEN n1 >= 2 AND n2 >= 2 THEN round({df_ws}, 2)
               END AS welch_df,
               CAST(CASE WHEN n1 >= 2 AND n2 >= 2
                         AND abs({t}) > 1.959964 THEN 1 ELSE 0 END
                    AS BIGINT) AS reject_equal_means
        FROM agg
    """


ORACLES["stats_welch_ttest"] = _welch_oracle()


# ------------------------------------------- Gini / Lorenz concentration


def gini_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration readout: the Lorenz curve of per-customer
    lifetime revenue in deciles plus the exact Gini coefficient — the
    single number a "whale risk" review asks for, and the inequality
    companion to ``stats_theil_decomposition`` (Gini is the metric
    everyone quotes; Theil is the one that decomposes).

    Exactness: revenue is summed as integer cents; with customers
    sorted (revenue, custkey) ascending, Gini folds to
    ``(2·Σ i·xᵢ)/(n·Σx) − (n+1)/n`` — both sums exact longs, one double
    division at the end.  Decile boundaries are the integer rule
    ``((rank−1)·10) DIV n + 1`` (no ntile: remainder semantics differ
    across engines).  Cumulative shares use the half-add ppm device.

    Scale: the per-customer rollup is a map-side-combinable groupBy;
    the Lorenz rank rides the bucket decomposition
    (rankops.global_rank) — per-bucket counts plus a bucket-partitioned
    row_number, so the customer-grain frame never sees a
    single-partition window.  Everything after the rank is 10 rows.
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    rev = (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("c"),
        )
        .groupBy("o_custkey")
        .agg(F.sum("c").alias("cents"))
    )
    pc = cust.join(
        rev, cust.c_custkey == rev.o_custkey, "left"
    ).select(
        "c_custkey", F.coalesce("cents", F.lit(0)).alias("cents")
    )
    # checkpointed: the ranked frame feeds the totals aggregate AND the
    # decile rollup — two consumers that each re-ran the whole
    # bucket-decomposition rank (global_rank's internal barrier covers
    # its input, not its output)
    ranked = global_rank(
        pc, "cents", "c_custkey", rank_name="rn"
    ).localCheckpoint(eager=False)
    # Σ cents and Σ rank·cents overflow a long past ~10⁷ customers (the
    # 64× probe's scale), so both accumulate in DECIMAL(38,0) — exact
    # and order-free, like DuckDB's automatic BIGINT→HUGEINT sums.
    tot = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("s"),
        F.sum(
            (F.col("rn") * F.col("cents")).cast("decimal(38,0)")
        ).alias("ix"),
    )
    dec = (
        ranked.crossJoin(F.broadcast(tot))
        .select(
            F.expr("((rn - 1) * 10) DIV n").alias("dec0"),
            "cents",
            "n",
            "s",
            "ix",
        )
        .groupBy("dec0")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("cents").cast("decimal(38,0)")).alias("dc"),
            F.first("n").alias("n"),
            F.first("s").alias("s"),
            F.first("ix").alias("ix"),
        )
    )
    wcum = Window.orderBy("dec0").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        dec.withColumn("cum", F.sum("dc").over(wcum))
        .selectExpr(
            "dec0 + 1 AS decile",
            "CAST(n_customers AS BIGINT) AS n_customers",
            "CAST(dc AS DOUBLE) / 100 AS decile_revenue",
            # decimal DIV: exact integral quotient (Spark returns a
            # bigint; DuckDB's HUGEINT // mirrors it)
            "(2 * cum * 1000000 + s) DIV (2 * s) AS cum_share_ppm",
            "round(2.0 * CAST(ix AS DOUBLE)"
            " / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE))"
            " - CAST(n + 1 AS DOUBLE) / n, 6) AS gini",
        )
        .orderBy("decile")
    )


QUERIES["stats_gini_lorenz"] = gini_lorenz

ORACLES["stats_gini_lorenz"] = """
    WITH rev AS (
        SELECT o_custkey, sum(CAST(round(o_totalprice * 100) AS BIGINT))
                   AS cents
        FROM orders GROUP BY 1
    ),
    pc AS (
        SELECT c.c_custkey, COALESCE(r.cents, 0) AS cents
        FROM customer c LEFT JOIN rev r ON r.o_custkey = c.c_custkey
    ),
    ranked AS (
        SELECT cents,
               row_number() OVER (ORDER BY cents, c_custkey) AS rn
        FROM pc
    ),
    tot AS (
        SELECT count(*) AS n, sum(cents) AS s, sum(rn * cents) AS ix
        FROM ranked
    ),
    dec AS (
        SELECT ((rn - 1) * 10) // n AS dec0,
               count(*) AS n_customers, sum(cents) AS dc,
               any_value(n) AS n, any_value(s) AS s, any_value(ix) AS ix
        FROM ranked, tot GROUP BY 1
    ),
    cum AS (
        SELECT *,
               sum(dc) OVER (ORDER BY dec0
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cum
        FROM dec
    )
    SELECT CAST(dec0 + 1 AS BIGINT) AS decile,
           CAST(n_customers AS BIGINT) AS n_customers,
           CAST(dc AS DOUBLE) / 100 AS decile_revenue,
           CAST((2 * cum * 1000000 + s) // (2 * s) AS BIGINT)
               AS cum_share_ppm,
           round(2.0 * CAST(ix AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE))
                 - CAST(n + 1 AS DOUBLE) / n, 6) AS gini
    FROM cum
    ORDER BY decile
"""


# --------------------------------------- deterministic permutation test

PERM_B = 60  # one 60-bit md5 digest seeds 60 sign-assignment replicates


def permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Randomization (permutation) test for the weekend-vs-weekday
    purchase-mean difference — the distribution-free p-value companion
    to ``stats_welch_ttest``'s parametric one: under the null, arm
    labels are exchangeable, so the observed difference is compared to
    PERM_B random re-assignments of rows to arms.

    Determinism at scale: replicate r assigns a row to the pseudo-
    weekend arm by BIT r of the row's 60-bit md5 hash (the bootstrap
    module's one-digest-many-replicates device), so every engine and
    every retry draws the identical null distribution, and the whole
    test is oracle-checkable.  Random re-assignment (binomial arms) is
    the standard at-scale randomization test — fixed-size permutation
    would need a global shuffle per replicate.  Scale: one md5 per row,
    a ×B map-side explode aggregated to B cells before the shuffle,
    arithmetic on a B-row frame after.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    base = ev.select(
        _h60(F.col("event_id")).alias("h"),
        F.round(F.col("value") * 100).cast("long").alias("c"),
        F.dayofweek("ts").isin(1, 7).cast("long").alias("we"),
    )
    obs = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.sum("we").alias("n1o"),
        F.sum(F.col("we") * F.col("c")).alias("s1o"),
    )
    cells = (
        base.select(
            "h", "c", F.explode(F.expr(f"sequence(0, {PERM_B - 1})")).alias("r")
        )
        .selectExpr(
            "r",
            "c",
            "pmod(shiftright(h, CAST(r AS INT)), 2) AS bit",
        )
        .groupBy("r")
        .agg(
            F.sum("bit").alias("n1"),
            F.sum(F.col("bit") * F.col("c")).alias("s1"),
        )
    )
    obs_diff = (
        "(CAST(s1o AS DOUBLE) / n1o"
        " - CAST(s - s1o AS DOUBLE) / (n - n1o))"
    )
    rep_diff = (
        "(CAST(s1 AS DOUBLE) / n1 - CAST(s - s1 AS DOUBLE) / (n - n1))"
    )
    exceed = (
        f"CASE WHEN n1 = 0 OR n1 = n THEN 1"
        f" WHEN abs({rep_diff}) >= abs({obs_diff}) THEN 1 ELSE 0 END"
    )
    return (
        cells.crossJoin(F.broadcast(obs))
        .selectExpr("n", "s", "n1o", "s1o", f"{exceed} AS ex")
        .groupBy("n", "s", "n1o", "s1o")
        .agg(
            F.count(F.lit(1)).alias("b"),
            F.sum("ex").alias("n_exceed"),
        )
        .selectExpr(
            "CAST(n AS BIGINT) AS n_purchases",
            f"round({obs_diff} / 100, 6) AS obs_mean_diff",
            "CAST(b AS BIGINT) AS b_replicates",
            "CAST(n_exceed AS BIGINT) AS n_exceed",
            "round(CAST(n_exceed + 1 AS DOUBLE) / (b + 1), 6)"
            " AS p_value",
        )
    )


QUERIES["stats_permutation_test"] = permutation_test


def _perm_oracle() -> str:
    h = "('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT"
    obs_diff = (
        "(CAST(s1o AS DOUBLE) / n1o"
        " - CAST(s - s1o AS DOUBLE) / (n - n1o))"
    )
    rep_diff = (
        "(CAST(s1 AS DOUBLE) / n1 - CAST(s - s1 AS DOUBLE) / (n - n1))"
    )
    exceed = (
        f"CASE WHEN n1 = 0 OR n1 = n THEN 1"
        f" WHEN abs({rep_diff}) >= abs({obs_diff}) THEN 1 ELSE 0 END"
    )
    return f"""
        WITH base AS (
            SELECT {h} AS h,
                   CAST(round(value * 100) AS BIGINT) AS c,
                   CAST(dayofweek(ts) IN (0, 6) AS BIGINT) AS we
            FROM events WHERE event_type = 'purchase'
        ),
        obs AS (
            SELECT count(*) AS n, sum(c) AS s, sum(we) AS n1o,
                   sum(we * c) AS s1o
            FROM base
        ),
        cells AS (
            SELECT r, sum((h >> CAST(r AS INT)) % 2) AS n1,
                   sum(((h >> CAST(r AS INT)) % 2) * c) AS s1
            FROM base, unnest(range(0, {PERM_B})) AS t(r)
            GROUP BY r
        ),
        ex AS (
            SELECT n, s, n1o, s1o, {exceed} AS ex
            FROM cells, obs
        )
        SELECT CAST(n AS BIGINT) AS n_purchases,
               round({obs_diff} / 100, 6) AS obs_mean_diff,
               CAST(count(*) AS BIGINT) AS b_replicates,
               CAST(sum(ex) AS BIGINT) AS n_exceed,
               round(CAST(sum(ex) + 1 AS DOUBLE) / (count(*) + 1), 6)
                   AS p_value
        FROM ex GROUP BY n, s, n1o, s1o
    """


ORACLES["stats_permutation_test"] = _perm_oracle()


# ------------------------------------------- Poisson bootstrap CI

POISSON_B_REPS = 32
#: Poisson(1) CDF thresholds scaled to the md5 60-bit key space —
#: Python-precomputed literals (no engine evaluates exp), so the
#: per-(row, replicate) weight w = #{k : u >= T_k} is pure integer
#: comparison and both engines draw bit-identical weights.
import math as _math

_POISSON_CDF_60 = tuple(
    round(sum(_math.exp(-1) / _math.factorial(i) for i in range(k + 1))
          * (1 << 60))
    for k in range(8)
)


def poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap of the mean order value — the bootstrap that
    actually runs at 100 TB (Chamandy et al. 2012 / Google's "Estimating
    uncertainty for massive data streams"): instead of resampling n rows
    with replacement (which needs n draws of global state per
    replicate), every row carries an independent Poisson(1) weight per
    replicate, so ALL replicates ride ONE scan as a map-side expression
    and the shuffle is |replicates| groups.  The classic resampling twin
    is [[stats_bootstrap_ci_mean]]; this is its scale path.

    Exactness: weights come from md5 60-bit integers against
    Python-precomputed CDF literals; per-replicate weighted sums are
    DECIMAL(38,0); each replicate mean is frozen to half-add integer
    micro-dollars before the tiny R-row order-statistics/moment
    aggregate (Σm² passes 2⁶³ — decimal / HUGEINT keeps it exact, and
    freezing makes the CI endpoints and se independent of double
    summation order).  The interval is the (2nd, 31st) order statistic
    of R=32 replicate means ≈ a 93.75% percentile CI.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    w_terms = " + ".join(
        f"IF(u >= {t}, 1, 0)" for t in _POISSON_CDF_60
    )
    rep = (
        o.selectExpr(
            "o_orderkey",
            "cents",
            f"explode(sequence(0, {POISSON_B_REPS - 1})) AS r",
        )
        .selectExpr(
            "r",
            "cents",
            "CAST(conv(substring(md5(concat(CAST(o_orderkey AS STRING),"
            " ':', CAST(r AS STRING))), 1, 15), 16, 10) AS BIGINT) AS u",
        )
        .selectExpr("r", "cents", f"({w_terms}) AS w")
    )
    per_rep = (
        rep.groupBy("r")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("cents").cast("decimal(38,0)")).alias("sc"),
            F.sum(F.col("w").cast("decimal(38,0)")).alias("sw"),
            F.sum(
                (F.col("w") * F.col("cents")).cast("decimal(38,0)")
            ).alias("swx"),
        )
        .selectExpr(
            "n",
            "sc",
            # replicate mean in half-add integer micro-dollars
            "CAST((2 * swx * 10000 + sw) DIV (2 * sw) AS DECIMAL(38,0))"
            " AS m",
        )
    )
    return per_rep.agg(
        F.max("n").alias("n_orders"),
        F.count(F.lit(1)).alias("n_replicates"),
        F.max("sc").alias("sc"),
        F.expr("sort_array(collect_list(m))").alias("ms"),
        F.sum("m").alias("sm"),
        F.sum(F.expr("m * m")).alias("sm2"),
    ).selectExpr(
        "CAST(n_orders AS BIGINT) AS n_orders",
        "CAST(n_replicates AS BIGINT) AS n_replicates",
        "CAST((2 * sc * 10000 + n_orders) DIV (2 * n_orders) AS DOUBLE)"
        " / 1e6 AS mean_value",
        "CAST(element_at(ms, 2) AS DOUBLE) / 1e6 AS ci_lo",
        f"CAST(element_at(ms, {POISSON_B_REPS - 1}) AS DOUBLE) / 1e6"
        " AS ci_hi",
        # n·Σm² − (Σm)² stays decimal-exact; Spark `DIV` is unusable
        # here (decimal DIV returns BIGINT and the quotient ~1e24
        # wraps), so divide as doubles after the exact subtraction
        "round(sqrt(CAST(n_replicates * sm2 - sm * sm AS DOUBLE)"
        " / n_replicates / (n_replicates - 1)) / 1e6, 6) AS se",
    )


QUERIES["stats_poisson_bootstrap_ci"] = poisson_bootstrap_ci


def _poisson_bootstrap_oracle() -> str:
    w_terms = " + ".join(
        f"CASE WHEN u >= {t} THEN 1 ELSE 0 END" for t in _POISSON_CDF_60
    )
    return f"""
    WITH o AS (
        SELECT o_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    rep AS (
        SELECT r, cents,
               ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':'
                   || CAST(r AS VARCHAR)), 1, 15))::BIGINT AS u
        FROM o, unnest(range(0, {POISSON_B_REPS})) AS t(r)
    ),
    per AS (
        SELECT r, count(*) AS n, sum(cents) AS sc, sum(w) AS sw,
               sum(CAST(w AS HUGEINT) * cents) AS swx
        FROM (SELECT r, cents, {w_terms} AS w FROM rep)
        GROUP BY r
    ),
    m AS (
        SELECT n, sc, (2 * swx * 10000 + sw) // (2 * sw) AS m
        FROM per
    )
    SELECT CAST(max(n) AS BIGINT) AS n_orders,
           CAST(count(*) AS BIGINT) AS n_replicates,
           CAST((2 * max(sc) * 10000 + max(n)) // (2 * max(n))
                AS DOUBLE) / 1e6 AS mean_value,
           CAST(list_sort(list(m))[2] AS DOUBLE) / 1e6 AS ci_lo,
           CAST(list_sort(list(m))[{POISSON_B_REPS - 1}] AS DOUBLE) / 1e6
               AS ci_hi,
           round(sqrt(CAST(count(*) * sum(CAST(m AS HUGEINT) * m)
                 - sum(CAST(m AS HUGEINT)) * sum(CAST(m AS HUGEINT))
                 AS DOUBLE)
                 / count(*) / (count(*) - 1)) / 1e6, 6) AS se
    FROM m
"""


ORACLES["stats_poisson_bootstrap_ci"] = _poisson_bootstrap_oracle()


# ---------------------------------------------------- CUPED adjustment


def cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (Controlled-experiment Using Pre-Experiment Data, Deng et
    al. 2013) — the variance-reduction workhorse of every experiment
    platform: adjust each user's post-period metric by θ times their
    pre-period covariate and the A/B delta's variance drops by ρ².
    Units are users; the pre covariate is first-half event count, the
    post metric second-half purchase cents, arms split user_id by md5
    parity (a deterministic stand-in for the assignment column an
    experiment table carries).  Reported: raw and CUPED-adjusted
    treatment deltas, θ, ρ², and the se shrink factor √(1−ρ²).

    Exactness: every moment (Σx, Σy, Σx², Σxy per arm) is an exact
    DECIMAL(38,0) sum of integers — n·Σxy−ΣxΣy forms keep covariance
    integer-exact, and the only doubles are the final fixed-shape
    ratios (the r6 overflow discipline).  Scale: one fact scan reduces
    to user grain in a single shuffle; everything after is a 2-row
    aggregate.
    """
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "cuped_events"
    )
    return spark.sql("""
        WITH us AS (
            SELECT user_id, unix_timestamp(ts) AS t, event_type,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM cuped_events
        ),
        m AS (SELECT (min(t) + max(t)) DIV 2 AS mid FROM us),
        per AS (
            SELECT user_id,
                   CAST(sum(IF(t <= mid, 1, 0)) AS BIGINT) AS x,
                   CAST(sum(IF(t > mid AND event_type = 'purchase',
                               cents, 0)) AS BIGINT) AS y,
                   IF(substring(md5(CAST(user_id AS STRING)), 1, 1)
                      <= '7', 0, 1) AS arm
            FROM us, m GROUP BY user_id, arm
        ),
        mo AS (
            SELECT count(*) AS n,
                   sum(CAST(x AS DECIMAL(38,0))) AS sx,
                   sum(CAST(y AS DECIMAL(38,0))) AS sy,
                   sum(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
                   sum(CAST(y AS DECIMAL(38,0)) * y) AS syy,
                   sum(CAST(x AS DECIMAL(38,0)) * y) AS sxy,
                   sum(IF(arm = 1, 1, 0)) AS nb,
                   sum(IF(arm = 1, CAST(x AS DECIMAL(38,0)), 0)) AS sxb,
                   sum(IF(arm = 1, CAST(y AS DECIMAL(38,0)), 0)) AS syb
            FROM per
        ),
        d AS (
            SELECT n, nb, n - nb AS na,
                   CAST(n * sxy - sx * sy AS DOUBLE) AS covn,
                   CAST(n * sxx - sx * sx AS DOUBLE) AS varxn,
                   CAST(n * syy - sy * sy AS DOUBLE) AS varyn,
                   CAST(syb AS DOUBLE) / nb
                       - CAST(sy - syb AS DOUBLE) / (n - nb) AS draw,
                   CAST(sxb AS DOUBLE) / nb
                       - CAST(sx - sxb AS DOUBLE) / (n - nb) AS dpre
            FROM mo
        )
        SELECT CAST(na AS BIGINT) AS n_control,
               CAST(nb AS BIGINT) AS n_treated,
               round(covn / varxn, 6) AS theta,
               round(covn * covn / (varxn * varyn), 6) AS rho_sq,
               round(sqrt(1.0 - covn * covn / (varxn * varyn)), 6)
                   AS se_shrink,
               round(draw / 100, 6) AS diff_raw,
               round((draw - (covn / varxn) * dpre) / 100, 6)
                   AS diff_cuped
        FROM d
    """)


QUERIES["stats_cuped_adjustment"] = cuped_adjustment

ORACLES["stats_cuped_adjustment"] = """
    WITH us AS (
        -- floor, not ::BIGINT: DuckDB's epoch()::BIGINT ROUNDS
        -- sub-second fractions where Spark's unix_timestamp floors
        SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t, event_type,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    m AS (SELECT (min(t) + max(t)) // 2 AS mid FROM us),
    per AS (
        SELECT user_id,
               CAST(sum(CASE WHEN t <= mid THEN 1 ELSE 0 END) AS BIGINT)
                   AS x,
               CAST(sum(CASE WHEN t > mid AND event_type = 'purchase'
                        THEN cents ELSE 0 END) AS BIGINT) AS y,
               CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1)
                    <= '7' THEN 0 ELSE 1 END AS arm
        FROM us, m GROUP BY user_id, arm
    ),
    mo AS (
        SELECT count(*) AS n,
               sum(CAST(x AS HUGEINT)) AS sx,
               sum(CAST(y AS HUGEINT)) AS sy,
               sum(CAST(x AS HUGEINT) * x) AS sxx,
               sum(CAST(y AS HUGEINT) * y) AS syy,
               sum(CAST(x AS HUGEINT) * y) AS sxy,
               sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS nb,
               sum(CASE WHEN arm = 1 THEN CAST(x AS HUGEINT)
                        ELSE 0 END) AS sxb,
               sum(CASE WHEN arm = 1 THEN CAST(y AS HUGEINT)
                        ELSE 0 END) AS syb
        FROM per
    ),
    d AS (
        SELECT n, nb, n - nb AS na,
               CAST(n * sxy - sx * sy AS DOUBLE) AS covn,
               CAST(n * sxx - sx * sx AS DOUBLE) AS varxn,
               CAST(n * syy - sy * sy AS DOUBLE) AS varyn,
               CAST(syb AS DOUBLE) / nb
                   - CAST(sy - syb AS DOUBLE) / (n - nb) AS draw,
               CAST(sxb AS DOUBLE) / nb
                   - CAST(sx - sxb AS DOUBLE) / (n - nb) AS dpre
        FROM mo
    )
    SELECT CAST(na AS BIGINT) AS n_control,
           CAST(nb AS BIGINT) AS n_treated,
           round(covn / varxn, 6) AS theta,
           round(covn * covn / (varxn * varyn), 6) AS rho_sq,
           round(sqrt(1.0 - covn * covn / (varxn * varyn)), 6)
               AS se_shrink,
           round(draw / 100, 6) AS diff_raw,
           round((draw - (covn / varxn) * dpre) / 100, 6) AS diff_cuped
    FROM d
"""


# --------------------------------------------------- SPRT monitor

SPRT_P0, SPRT_P1 = 0.19, 0.21
#: Python-precomputed nano-unit literals (no engine evaluates a log):
#: per-success and per-failure log-likelihood-ratio increments and the
#: Wald boundaries ln((1-beta)/alpha) = ln 19 at alpha = beta = 0.05.
SPRT_LW_NANO = 100083459  # round(ln(p1/p0) * 1e9)
SPRT_LL_NANO = -25001302  # round(ln((1-p1)/(1-p0)) * 1e9)
SPRT_A_NANO = 2944438979  # round(ln 19 * 1e9)


def sprt_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's sequential probability ratio test over the daily purchase
    share — the always-valid monitoring primitive an experimentation or
    data-quality platform runs instead of a fixed-horizon test: after
    each day the cumulative log-likelihood ratio of H1 (share = 0.21)
    vs H0 (share = 0.19) either crosses ln 19 (accept H1), −ln 19
    (accept H0), or continues.  On this corpus (true share ≈ 0.198) the
    monitor reads 'continue' for a week and then accepts H1 — the
    day-by-day trace IS the operator's output.

    Exactness: the LLR increments are Python-precomputed nano-unit
    integer literals, so the cumulative sum is an exact integer window
    — no engine evaluates a log and no double summation order exists.
    Scale: the fact scan reduces to day grain map-side; the running sum
    orders DAYS (a few thousand rows at any horizon), not events.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("k"),
    )
    w = (
        Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = daily.withColumn(
        "llr_nano",
        F.sum(
            F.expr(
                f"k * CAST({SPRT_LW_NANO} AS BIGINT)"
                f" + (n - k) * CAST({SPRT_LL_NANO} AS BIGINT)"
            )
        ).over(w),
    )
    # A sequential test STOPS at its first boundary crossing: the
    # decision column freezes from the earliest crossing day on
    # (the llr trace keeps accumulating for the audit readout).
    wall = Window.partitionBy()
    frozen = (
        cum.withColumn(
            "d1",
            F.min(
                F.expr(f"IF(llr_nano >= {SPRT_A_NANO}, day, NULL)")
            ).over(wall),
        )
        .withColumn(
            "d0",
            F.min(
                F.expr(f"IF(llr_nano <= -{SPRT_A_NANO}, day, NULL)")
            ).over(wall),
        )
    )
    return frozen.selectExpr(
        "day",
        "CAST(n AS BIGINT) AS n_events",
        "CAST(k AS BIGINT) AS n_success",
        "round(CAST(llr_nano AS DOUBLE) / 1e9, 6) AS llr",
        "CASE WHEN d1 IS NOT NULL AND (d0 IS NULL OR d1 <= d0)"
        " AND day >= d1 THEN 'accept_h1'"
        " WHEN d0 IS NOT NULL AND (d1 IS NULL OR d0 < d1)"
        " AND day >= d0 THEN 'accept_h0'"
        " ELSE 'continue' END AS decision",
    ).orderBy("day")


QUERIES["stats_sprt_monitor"] = sprt_monitor

ORACLES["stats_sprt_monitor"] = f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, count(*) AS n,
               sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS k
        FROM events GROUP BY 1
    ),
    cum AS (
        SELECT day, n, k,
               sum(k * CAST({SPRT_LW_NANO} AS BIGINT)
                   + (n - k) * CAST({SPRT_LL_NANO} AS BIGINT))
                   OVER (ORDER BY day
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS llr_nano
        FROM daily
    ),
    frozen AS (
        SELECT *,
               min(CASE WHEN llr_nano >= {SPRT_A_NANO} THEN day END)
                   OVER () AS d1,
               min(CASE WHEN llr_nano <= -{SPRT_A_NANO} THEN day END)
                   OVER () AS d0
        FROM cum
    )
    SELECT day,
           CAST(n AS BIGINT) AS n_events,
           CAST(k AS BIGINT) AS n_success,
           round(CAST(llr_nano AS DOUBLE) / 1e9, 6) AS llr,
           CASE WHEN d1 IS NOT NULL AND (d0 IS NULL OR d1 <= d0)
                     AND day >= d1 THEN 'accept_h1'
                WHEN d0 IS NOT NULL AND (d1 IS NULL OR d0 < d1)
                     AND day >= d0 THEN 'accept_h0'
                ELSE 'continue' END AS decision
    FROM frozen ORDER BY day
"""


# --------------------------------------------------- daily SRM check

SRM_CHI2_CRIT = 3.841459  # chi-square(1) at 5%


def srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily sample-ratio-mismatch check — the first alarm every
    experiment platform wires: under a 50/50 assignment (md5-parity
    arms, the same deterministic stand-in as [[stats_cuped_adjustment]])
    the daily active-user split must not drift, and a day whose
    chi-square exceeds the 5% critical value is flagged before anyone
    reads a treatment effect off it.  chi² for two cells reduces to
    (n_a − n_b)²/n — one exact-integer expression; the critical value
    is a literal, so no p-value function is needed.  Scale: distinct
    users per (day, arm) is one map-side-combinable aggregate; the
    check itself is day-grain.
    """
    ev = load_table(spark, sf_dir, "events")
    per = (
        ev.selectExpr(
            "CAST(ts AS DATE) AS day",
            "user_id",
            "IF(substring(md5(CAST(user_id AS STRING)), 1, 1) <= '7',"
            " 0, 1) AS arm",
        )
        .distinct()
        .groupBy("day")
        .agg(
            F.sum(F.expr("IF(arm = 0, 1, 0)")).alias("ua"),
            F.sum(F.expr("IF(arm = 1, 1, 0)")).alias("ub"),
        )
    )
    return per.selectExpr(
        "day",
        "CAST(ua AS BIGINT) AS users_a",
        "CAST(ub AS BIGINT) AS users_b",
        "round(CAST((ua - ub) * (ua - ub) AS DOUBLE) / (ua + ub), 6)"
        " AS chi2",
        f"CAST(IF(CAST((ua - ub) * (ua - ub) AS DOUBLE) / (ua + ub)"
        f" > {SRM_CHI2_CRIT}, 1, 0) AS BIGINT) AS srm_flag",
    ).orderBy("day")


QUERIES["stats_srm_check"] = srm_check

ORACLES["stats_srm_check"] = f"""
    WITH pa AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id,
               CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1)
                    <= '7' THEN 0 ELSE 1 END AS arm
        FROM events
    ),
    per AS (
        SELECT day,
               sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS ua,
               sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS ub
        FROM pa GROUP BY day
    )
    SELECT day,
           CAST(ua AS BIGINT) AS users_a,
           CAST(ub AS BIGINT) AS users_b,
           round(CAST((ua - ub) * (ua - ub) AS DOUBLE) / (ua + ub), 6)
               AS chi2,
           CAST(CASE WHEN CAST((ua - ub) * (ua - ub) AS DOUBLE)
                          / (ua + ub) > {SRM_CHI2_CRIT}
                THEN 1 ELSE 0 END AS BIGINT) AS srm_flag
    FROM per ORDER BY day
"""


# --------------------------------------- Benjamini-Hochberg FDR

BH_ALPHA = 0.05
BH_M = 5  # number of simultaneous tests = number of event types

# chi-square(1df) critical values at levels α·i/m, i = 1..m, frozen to
# nano units at module import (stdlib NormalDist, same device as the
# SPRT Wald boundaries): testing p_(i) ≤ α·i/m on the ascending-p order
# is testing stat_(i) ≥ crit_i on the descending-statistic order.
from statistics import NormalDist as _ND  # noqa: E402

BH_CRITS_NANO = tuple(
    int(round(_ND().inv_cdf(1 - (BH_ALPHA * i / BH_M) / 2) ** 2 * 1e9))
    for i in range(1, BH_M + 1)
)


def bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini–Hochberg FDR control over a family of simultaneous
    tests — the multiple-comparisons correction every experimentation
    platform applies when one release ships many metrics: per event
    type, a one-sample binomial χ² of its weekend share against the
    calendar-uniform 2/7, then the BH step-up (reject the ``i*`` most
    significant where ``i* = max{{i : stat_(i) ≥ crit(α·i/m)}}``) so
    the EXPECTED false-discovery fraction stays ≤ α — where the naive
    per-test α would fire spuriously ~m·α of the time.

    Determinism: statistics are IEEE doubles in one fixed textual
    expression order, frozen to nano-unit BIGINTs; critical values are
    Python-stdlib literals baked into BOTH plans.  Scale shape: one
    map-side-combinable aggregate to m rows, then window ranking over
    the m-row frame — the corpus is touched once.
    """
    ev = load_table(spark, sf_dir, "events")
    per = (
        ev.select(
            "event_type",
            F.expr(
                "CASE WHEN dayofweek(ts) IN (1, 7) THEN 1 ELSE 0 END"
            ).alias("wk"),
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("wk").alias("nw"))
    )
    # 2e0, not 2.0: Spark parses `2.0` as DECIMAL(2,1) and the decimal
    # division truncates at scale 6, while DuckDB's `/` is DOUBLE —
    # exponent literals are DOUBLE in both engines.
    stat = (
        "((nw - n * 2e0 / 7) * (nw - n * 2e0 / 7))"
        " / (n * (2e0 / 7) * (5e0 / 7))"
    )
    crit_case = " ".join(
        f"WHEN r = {i + 1} THEN {c}L"
        for i, c in enumerate(BH_CRITS_NANO)
    )
    scored = per.selectExpr(
        "event_type",
        "CAST(n AS BIGINT) AS n_events",
        "CAST(nw AS BIGINT) AS n_weekend",
        f"CAST(round(({stat}) * 1e9) AS BIGINT) AS stat_nano",
    ).selectExpr(
        "*",
        "row_number() OVER (ORDER BY stat_nano DESC, event_type ASC)"
        " AS r",
    ).selectExpr(
        # ELSE raises, never falls back: the frozen BH_CRITS_NANO
        # table is sized for exactly BH_M simultaneous tests — a 6th
        # event type reaching rank 6 would otherwise silently reuse
        # the most liberal critical value and over-reject.  CASE is
        # lazily evaluated per row in both engines, so the guard costs
        # nothing until it fires.
        "*",
        f"CASE {crit_case} ELSE CAST(raise_error("
        f"'stats_bh_fdr: event-type count exceeds frozen BH_M={BH_M}')"
        " AS BIGINT) END AS crit_nano",
    )
    return scored.selectExpr(
        "event_type",
        "n_events",
        "n_weekend",
        "stat_nano",
        "CAST(r AS BIGINT) AS bh_rank",
        "crit_nano",
        "CAST(IF(r <= coalesce(max(CASE WHEN stat_nano >= crit_nano"
        " THEN r END) OVER (), 0), 1, 0) AS BIGINT) AS reject_flag",
    ).orderBy("bh_rank")


QUERIES["stats_bh_fdr"] = bh_fdr

_BH_CRIT_CASE_SQL = " ".join(
    f"WHEN r = {i + 1} THEN CAST({c} AS BIGINT)"
    for i, c in enumerate(BH_CRITS_NANO)
)

ORACLES["stats_bh_fdr"] = f"""
    WITH per AS (
        SELECT event_type, count(*) AS n,
               sum(CASE WHEN dayofweek(ts) + 1 IN (1, 7)
                   THEN 1 ELSE 0 END) AS nw
        FROM events GROUP BY event_type
    ),
    scored AS (
        SELECT event_type,
               CAST(n AS BIGINT) AS n_events,
               CAST(nw AS BIGINT) AS n_weekend,
               CAST(round(
                   ((nw - n * 2e0 / 7) * (nw - n * 2e0 / 7))
                   / (n * (2e0 / 7) * (5e0 / 7)) * 1e9) AS BIGINT)
                   AS stat_nano
        FROM per
    ),
    ranked AS (
        SELECT *, row_number() OVER (ORDER BY stat_nano DESC,
                                     event_type ASC) AS r
        FROM scored
    ),
    critd AS (
        SELECT *, CASE {_BH_CRIT_CASE_SQL}
                  ELSE CAST(error(
                      'stats_bh_fdr: event-type count exceeds BH_M')
                      AS BIGINT) END
                  AS crit_nano
        FROM ranked
    )
    SELECT event_type, n_events, n_weekend, stat_nano,
           CAST(r AS BIGINT) AS bh_rank, crit_nano,
           CAST(CASE WHEN r <= coalesce(max(CASE WHEN
                    stat_nano >= crit_nano THEN r END) OVER (), 0)
                THEN 1 ELSE 0 END AS BIGINT) AS reject_flag
    FROM critd ORDER BY bh_rank
"""


# ------------------------------------- sample-size planner

#: Relative lifts priced by the planner, in ppm of the base rate.
PLAN_LIFTS_PPM = (10000, 20000, 50000, 100000)

_ZZ2 = (Z_ALPHA_2 + Z_BETA) ** 2  # (z_{α/2} + z_β)², frozen literal


def sample_size_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment sample-size table — the dual of [[stats_power_mde]]:
    given the OBSERVED purchase base rate, the per-arm n required to
    detect a 1/2/5/10% relative lift at α = 5% (two-sided), 80% power
    (n = (z_{α/2}+z_β)²·2·p̄(1−p̄)/(p̄·L)², the standard equal-arm
    approximation) and, priced against the observed daily event
    volume, the days of traffic that n costs — the number an
    experiment review actually argues about.

    Determinism: the z-sum is a frozen Python literal; p̄, the daily
    volume, and the ceil() land in one fixed textual expression order.
    Scale shape: one conditional-count aggregate, stacked to |lifts|
    rows by a 1-row inline.
    """
    ev = load_table(spark, sf_dir, "events")
    base = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.expr("CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END")
        ).alias("c"),
        F.countDistinct(F.to_date("ts")).alias("days"),
    )
    cells = []
    for lift in PLAN_LIFTS_PPM:
        n_req = (
            f"CAST(ceil({_ZZ2!r} * 2.0"
            " * (CAST(c AS DOUBLE) / n) * (1 - CAST(c AS DOUBLE) / n)"
            f" / ((CAST(c AS DOUBLE) / n) * {lift / 1e6!r}"
            f"    * (CAST(c AS DOUBLE) / n) * {lift / 1e6!r}))"
            " AS BIGINT)"
        )
        cells.append(
            f"named_struct('lift', {lift}L, 'n_req', {n_req})"
        )
    return (
        base.selectExpr(
            "n", "c", "days", f"inline(array({', '.join(cells)}))"
        )
        .selectExpr(
            "CAST(lift AS BIGINT) AS lift_ppm",
            "(2 * c * 1000000 + n) DIV (2 * n) AS base_rate_ppm",
            "n_req AS n_per_arm",
            # both arms drawn from the same stream: 2n events needed
            "CAST(ceil(CAST(2 * n_req AS DOUBLE)"
            " / (CAST(n AS DOUBLE) / days)) AS BIGINT) AS days_needed",
        )
        .orderBy("lift_ppm")
    )


QUERIES["stats_sample_size_planner"] = sample_size_planner

_SSP_CELLS = " UNION ALL ".join(
    f"""SELECT {lift} AS lift,
        CAST(ceil({_ZZ2!r} * 2.0
             * (CAST(c AS DOUBLE) / n) * (1 - CAST(c AS DOUBLE) / n)
             / ((CAST(c AS DOUBLE) / n) * {lift / 1e6!r}
                * (CAST(c AS DOUBLE) / n) * {lift / 1e6!r}))
             AS BIGINT) AS n_req,
        n, c, days FROM base"""
    for lift in PLAN_LIFTS_PPM
)

ORACLES["stats_sample_size_planner"] = f"""
    WITH base AS (
        SELECT count(*) AS n,
               sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS c,
               count(DISTINCT CAST(ts AS DATE)) AS days
        FROM events
    )
    SELECT CAST(lift AS BIGINT) AS lift_ppm,
           CAST((2 * c * 1000000 + n) // (2 * n) AS BIGINT)
               AS base_rate_ppm,
           CAST(n_req AS BIGINT) AS n_per_arm,
           CAST(ceil(CAST(2 * n_req AS DOUBLE)
                / (CAST(n AS DOUBLE) / days)) AS BIGINT) AS days_needed
    FROM ({_SSP_CELLS}) ORDER BY lift_ppm
"""
