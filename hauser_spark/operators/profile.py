"""Table/column statistics profiling — the numbers a cost-based
optimizer, a salting decision, and a capacity plan all start from.

Three operators:

- **Column profile** (ANALYZE-style): per column of `lineitem` — row
  count, null count, exact NDV, numeric min/max, mean string length.
  ONE scan: every metric folds into a single wide aggregate row, then
  `stack()` unpivots it to one row per column — no per-column rescan,
  no union of scans. (Exact NDV compiles to Spark's expand+distinct;
  at 100 TB swap in the KMV/HLL sketch from `operators/sketches.py` —
  the plan shape stays one pass.)

- **Join-skew report**: for each declared join key — total rows, NDV,
  max/avg key frequency, the skew ratio, and the hottest key itself.
  Skew ratio = max_freq / avg_freq is precisely the number that says
  whether a shuffle join needs salting or AQE skew handling
  (`operators/skew.py` is the remedy this report triggers). Per key:
  one partial-aggregating groupBy, then a 1-row summary; the hot key
  falls out of `max_by` over (freq, -key) — deterministic tiebreak.

- **Two-sample KS drift test**: exact Kolmogorov-Smirnov statistic in
  integer arithmetic — distribution drift between cohorts/snapshots as
  a declarative query (see ``ks_two_sample``).

The reference keeps no statistics at all (its only aggregate reads are
the sync watermarks, SURVEY §2.4); this is engine-owned observability.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..rankops import global_rank
from ..tables import load_table, values_df

# (column, kind) — kind drives which metrics apply
_LINEITEM_COLS = [
    ("l_orderkey", "num"),
    ("l_partkey", "num"),
    ("l_suppkey", "num"),
    ("l_linenumber", "num"),
    ("l_quantity", "num"),
    ("l_extendedprice", "num"),
    ("l_discount", "num"),
    ("l_tax", "num"),
    ("l_returnflag", "str"),
    ("l_linestatus", "str"),
    ("l_shipdate", "ts"),
]

JOIN_KEYS = [
    ("lineitem", "l_orderkey"),
    ("lineitem", "l_partkey"),
    ("orders", "o_custkey"),
    ("events", "user_id"),
]


def _num_expr(c: str, kind: str) -> str:
    """Numeric view of a column for min/max (epoch seconds for times)."""
    if kind == "ts":
        # parquet NTZ timestamps refuse a direct numeric cast; epoch
        # seconds via an explicit TIMESTAMP hop (session TZ is UTC)
        return f"CAST(unix_seconds(CAST({c} AS TIMESTAMP)) AS DOUBLE)"
    return f"CAST({c} AS DOUBLE)"


# Bucketed-KMV NDV sketch: hash to [0, 2^60), fold into B buckets keeping
# min(h) per bucket (a full map-side-combinable aggregate — no distinct,
# no shuffle of the value stream), then estimate (K-1)·2^60/h_k from the
# K smallest bucket minima.  The bucket fold loses a top-K hash only when
# two of them collide in a bucket (E ≈ K²/2B ≈ 0.25 collisions), and the
# estimator is computed identically in DuckDB, so the *approximation
# itself* is oracle-checked — same philosophy as operators/sketches.py.
NDV_K = 64
NDV_BUCKETS = 8192
_HASH_SPAN = float(1 << 60)


def _sval_expr(c: str, kind: str) -> str:
    """The column as the string the NDV hash consumes — must render
    identically in Spark and DuckDB (bigints/doubles: shortest round-trip;
    timestamps: epoch seconds)."""
    if kind == "ts":
        return f"CAST(unix_seconds(CAST({c} AS TIMESTAMP)) AS STRING)"
    return f"CAST({c} AS STRING)"


def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE of lineitem: a row of stats per column, with *sketched* NDV.

    Two passes, both cheap: (1) one wide aggregate computes counts /
    nulls / min / max / avg-len for every column in a single scan;
    (2) an unpivoted scan feeds a KMV distinct-count sketch per column —
    md5-deterministic, so the DuckDB oracle reproduces the estimate
    bit-for-bit (same design as sketches.py).

    The earlier exact-NDV version compiled to a count-distinct expand —
    every row duplicated ×11 through the aggregate — and was this file's
    scale-killer (3.45 s at sf0.1, unbounded state at 100 TB).  The sketch
    side instead folds hashes into B=8192 bucket minima per column inside
    the map-side partial aggregate, so the shuffle carries ≤ 11·B rows per
    task and per-column state is B longs — fixed regardless of data size,
    the plan a reviewer would actually ship at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).alias("n")]
    for c, kind in _LINEITEM_COLS:
        aggs.append((F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"))
        if kind in ("num", "ts"):
            ne = _num_expr(c, kind)
            aggs.append(F.expr(f"round(min({ne}), 4)").alias(f"{c}__min"))
            aggs.append(F.expr(f"round(max({ne}), 4)").alias(f"{c}__max"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"{c}__min"))
            aggs.append(F.lit(None).cast("double").alias(f"{c}__max"))
        if kind == "str":
            aggs.append(
                F.expr(f"round(sum(length({c})) / count({c}), 4)").alias(
                    f"{c}__len"
                )
            )
        else:
            aggs.append(F.lit(None).cast("double").alias(f"{c}__len"))
    wide = li.agg(*aggs)

    stack_args = []
    for c, _ in _LINEITEM_COLS:
        stack_args.append(f"'{c}'")
        stack_args.extend([f"{c}__nulls", f"{c}__min", f"{c}__max", f"{c}__len"])
    stacked = wide.select(
        "n",
        F.expr(
            f"stack({len(_LINEITEM_COLS)}, {', '.join(stack_args)}) AS "
            "(col_name, n_null, min_num, max_num, avg_len)"
        ),
    )

    # pass 2: unpivot → hash → bucketed min (map-side combined) →
    # K smallest bucket minima per column → estimate
    #
    # The hash projection is CPU-bound (11 md5s per row) — fan a
    # single-row-group table out first or it runs single-threaded
    # (6.4 s → 2.3 s at sf0.1); no-op for a table with real splits.
    from ..tables import fanout_small_scan

    src = fanout_small_scan(li, spark)
    val_args = []
    for c, kind in _LINEITEM_COLS:
        val_args.append(f"'{c}'")
        val_args.append(_sval_expr(c, kind))
    vals = src.select(
        F.expr(
            f"stack({len(_LINEITEM_COLS)}, {', '.join(val_args)}) AS "
            "(col_name, sval)"
        )
    ).filter(F.col("sval").isNotNull())
    bucketed = (
        vals.select(
            "col_name",
            F.conv(F.substring(F.md5("sval"), 1, 15), 16, 10)
            .cast("long")
            .alias("h"),
        )
        .groupBy("col_name", F.pmod("h", F.lit(NDV_BUCKETS)).alias("b"))
        .agg(F.min("h").alias("h"))
    )
    w = Window.partitionBy("col_name").orderBy("h")
    topk = bucketed.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= NDV_K
    )
    per = topk.groupBy("col_name").agg(
        F.count(F.lit(1)).alias("n_seen"), F.max("h").alias("kth")
    )
    est = F.when(
        F.col("n_seen") < NDV_K, F.col("n_seen").cast("double")
    ).otherwise(F.lit((NDV_K - 1) * _HASH_SPAN) / F.col("kth"))
    ndv = per.select("col_name", F.round(est, 4).alias("ndv_est"))

    return (
        stacked.join(F.broadcast(ndv), "col_name")
        .select(
            "col_name", "n", "n_null", "ndv_est",
            "min_num", "max_num", "avg_len",
        )
        .orderBy("col_name")
    )


def join_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per join key: cardinality, frequency skew, and the hottest key."""
    parts = []
    for table, key in JOIN_KEYS:
        freq = (
            load_table(spark, sf_dir, table)
            .groupBy(F.col(key).alias("k"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        parts.append(
            freq.agg(
                F.lit(table).alias("table_name"),
                F.lit(key).alias("key_name"),
                F.sum("cnt").alias("n"),
                F.count(F.lit(1)).alias("ndv"),
                F.max("cnt").alias("max_freq"),
                F.round(F.sum("cnt") / F.count(F.lit(1)), 6).alias(
                    "avg_freq"
                ),
                F.round(
                    F.max("cnt") * F.count(F.lit(1)) / F.sum("cnt"), 6
                ).alias("skew_ratio"),
                F.expr("max_by(k, struct(cnt, -k))").alias("top_key"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("table_name", "key_name")




def ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic — distribution
    drift as a query. Compares o_totalprice between open ('O') and
    finished ('F') orders: KS = max over values of |ECDF_a − ECDF_b|,
    THE standard nonparametric check a pipeline runs to catch drift
    between cohorts, snapshots, or train/serve splits.

    Exactness at scale: the ECDF difference is kept as the INTEGER
    |cum_a·n_b − cum_b·n_a| (one float division only at the very end),
    so the max is order-free and cross-engine identical. Shape: one
    partial-aggregating groupBy collapses rows to distinct values; the
    cumulative window runs over that distinct-value table (post-agg
    sized); totals broadcast as a 1-row cross join. The achieving
    value is reported via max_by with a value tiebreak."""
    od = load_table(spark, sf_dir, "orders")
    lab = od.filter(F.col("o_orderstatus").isin("O", "F")).select(
        F.col("o_totalprice").alias("v"),
        (F.col("o_orderstatus") == "O").cast("long").alias("a"),
        (F.col("o_orderstatus") == "F").cast("long").alias("b"),
    )
    per_v = lab.groupBy("v").agg(
        F.sum("a").alias("ca"), F.sum("b").alias("cb")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_v.select(
        "v",
        F.sum("ca").over(w).alias("cca"),
        F.sum("cb").over(w).alias("ccb"),
    )
    totals = lab.agg(F.sum("a").alias("na"), F.sum("b").alias("nb"))
    d = cum.crossJoin(F.broadcast(totals)).select(
        "v",
        "na",
        "nb",
        F.abs(
            F.col("cca") * F.col("nb") - F.col("ccb") * F.col("na")
        ).alias("dd"),
    )
    return d.groupBy("na", "nb").agg(
        F.round(
            F.max("dd") / (F.col("na") * F.col("nb")).cast("double"), 6
        ).alias("ks_stat"),
        F.expr("max_by(v, struct(dd, -v))").alias("ks_at_value"),
    ).select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        "ks_stat",
        "ks_at_value",
    )


QUERIES = {
    "profile_ks_two_sample": ks_two_sample,
    "profile_table_columns": table_profile,
    "profile_join_skew": join_skew_report,
}


def _profile_oracle() -> str:
    """Per column: metrics from a plain aggregate, NDV from the same KMV
    estimator the Spark side computes (identical md5 hashing, identical
    (K-1)·2^60/h_k arithmetic — the approximation itself is checked)."""
    branches = []
    for c, kind in _LINEITEM_COLS:
        if kind in ("num", "ts"):
            if kind == "ts":
                ne = f"CAST(floor(epoch({c})) AS BIGINT)"
                sv = f"CAST(CAST(floor(epoch({c})) AS BIGINT) AS VARCHAR)"
            else:
                ne = f"CAST({c} AS DOUBLE)"
                sv = f"CAST({c} AS VARCHAR)"
            mn = f"ROUND(CAST(min({ne}) AS DOUBLE), 4)"
            mx = f"ROUND(CAST(max({ne}) AS DOUBLE), 4)"
            ln = "CAST(NULL AS DOUBLE)"
        else:
            sv = f"CAST({c} AS VARCHAR)"
            mn = "CAST(NULL AS DOUBLE)"
            mx = "CAST(NULL AS DOUBLE)"
            ln = f"ROUND(sum(length({c})) * 1.0 / count({c}), 4)"
        kmv = f"""(
            WITH hs AS (
                SELECT ('0x' || substr(md5({sv}), 1, 15))::BIGINT AS h
                FROM lineitem WHERE {c} IS NOT NULL
            ),
            bm AS (SELECT min(h) AS h FROM hs
                   GROUP BY h % {NDV_BUCKETS}),
            tk AS (SELECT h FROM bm ORDER BY h LIMIT {NDV_K})
            SELECT CASE WHEN count(*) < {NDV_K}
                        THEN ROUND(CAST(count(*) AS DOUBLE), 4)
                        ELSE ROUND(CAST({NDV_K - 1} AS DOUBLE)
                                   * CAST(1152921504606846976 AS DOUBLE)
                                   / CAST(max(h) AS DOUBLE), 4) END
            FROM tk
        )"""
        branches.append(
            f"""SELECT '{c}' AS col_name, count(*) AS n,
                   count(*) - count({c}) AS n_null,
                   {kmv} AS ndv_est,
                   {mn} AS min_num, {mx} AS max_num, {ln} AS avg_len
            FROM lineitem"""
        )
    return " UNION ALL ".join(branches) + " ORDER BY col_name"


def _skew_oracle() -> str:
    branches = []
    for table, key in JOIN_KEYS:
        branches.append(
            f"""SELECT '{table}' AS table_name, '{key}' AS key_name,
                   CAST(sum(cnt) AS BIGINT) AS n, count(*) AS ndv,
                   max(cnt) AS max_freq,
                   ROUND(sum(cnt) * 1.0 / count(*), 6) AS avg_freq,
                   ROUND(max(cnt) * count(*) * 1.0 / sum(cnt), 6)
                       AS skew_ratio,
                   (SELECT k FROM (
                        SELECT {key} AS k, count(*) AS c2 FROM {table}
                        GROUP BY 1) ORDER BY c2 DESC, k ASC LIMIT 1)
                       AS top_key
            FROM (SELECT {key} AS k, count(*) AS cnt FROM {table}
                  GROUP BY 1)"""
        )
    return " UNION ALL ".join(branches) + " ORDER BY table_name, key_name"


ORACLES = {
    "profile_table_columns": _profile_oracle(),
    "profile_join_skew": _skew_oracle(),
}


ORACLES["profile_ks_two_sample"] = """
    WITH lab AS (
        SELECT o_totalprice AS v,
               CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END AS a,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS b
        FROM orders WHERE o_orderstatus IN ('O', 'F')
    ),
    per_v AS (SELECT v, sum(a) AS ca, sum(b) AS cb FROM lab GROUP BY v),
    cum AS (
        SELECT v,
               sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cca,
               sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS ccb
        FROM per_v
    ),
    tot AS (SELECT sum(a) AS na, sum(b) AS nb FROM lab),
    d AS (
        SELECT v, na, nb, abs(cca * nb - ccb * na) AS dd
        FROM cum CROSS JOIN tot
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           ROUND(max(dd) * 1.0 / (na * nb), 6) AS ks_stat,
           (SELECT v FROM d ORDER BY dd DESC, v ASC LIMIT 1)
               AS ks_at_value
    FROM d
    GROUP BY na, nb
"""


#: (name, source column, integer scale) for the correlation matrix.
#: Values are quantized to integers FIRST — the usual exact-moment
#: device (cf. ``length_token_corr``): all five moments per pair are
#: then combine-order-free integer sums, and the correlation is one
#: fixed IEEE expression both engines evaluate identically.  Scales are
#: chosen so Σx² stays far inside int64 at any plausible SF
#: (extendedprice quantized to whole dollars: ~1e5 → Σx² ≈ 1e10·rows).
_CORR_COLS = [
    ("quantity", "l_quantity", 100),
    ("extendedprice", "l_extendedprice", 1),
    ("discount", "l_discount", 100),
    ("tax", "l_tax", 100),
]


def correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation across lineitem's measure columns in
    ONE aggregate pass — the ANALYZE extension a feature-engineering
    pipeline runs before trusting any single filter column.

    Shape: a single wide aggregate computes n, Σx and Σx² per column
    and Σxy per pair (map-side combinable, 15 integer sums for 4
    columns) — one scan, one 1-row exchange, no joins; the matrix is
    then unpivoted driver-free with ``stack``.  Correlations are over
    the integer-quantized values (quantization is what makes the
    moments exact cross-engine; at these scales it perturbs corr by
    <1e-4, and the quantized statistic itself is the oracle-checked
    contract)."""
    li = load_table(spark, sf_dir, "lineitem")
    vals = li.selectExpr(
        *[
            f"CAST(floor({src} * {scale}) AS BIGINT) AS {name}"
            for name, src, scale in _CORR_COLS
        ]
    )
    names = [n for n, _, _ in _CORR_COLS]
    aggs = [F.expr("count(*) AS n")]
    for c in names:
        aggs.append(F.expr(f"sum({c}) AS s_{c}"))
        aggs.append(F.expr(f"sum({c} * {c}) AS ss_{c}"))
    pairs = [
        (a, b) for i, a in enumerate(names) for b in names[i + 1:]
    ]
    for a, b in pairs:
        aggs.append(F.expr(f"sum({a} * {b}) AS sp_{a}_{b}"))
    m = vals.agg(*aggs)
    corr_exprs = []
    for a, b in pairs:
        corr_exprs.append(f"'{a}'")
        corr_exprs.append(f"'{b}'")
        # moments go to double BEFORE the n·Σ products: the products
        # overflow int64 at this SF while each moment is itself exactly
        # representable; the casts and the IEEE op sequence are
        # identical in the oracle, so the result stays bit-equal
        corr_exprs.append(
            f"ROUND((CAST(n AS DOUBLE) * CAST(sp_{a}_{b} AS DOUBLE)"
            f" - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))"
            f" / sqrt((CAST(n AS DOUBLE) * CAST(ss_{a} AS DOUBLE)"
            f" - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))"
            f" * (CAST(n AS DOUBLE) * CAST(ss_{b} AS DOUBLE)"
            f" - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE))), 6)"
        )
    return (
        m.selectExpr(
            f"stack({len(pairs)}, {', '.join(corr_exprs)})"
            " AS (col_a, col_b, corr)"
        )
        .orderBy("col_a", "col_b")
    )


QUERIES["profile_correlation_matrix"] = correlation_matrix


def _corr_matrix_oracle() -> str:
    sums = ["CAST(count(*) AS BIGINT) AS n"]
    names = [n for n, _, _ in _CORR_COLS]
    for name, src, scale in _CORR_COLS:
        q = f"CAST(floor({src} * {scale}) AS BIGINT)"
        sums.append(f"sum({q}) AS s_{name}")
        sums.append(f"sum({q} * {q}) AS ss_{name}")
    pairs = [(a, b) for i, a in enumerate(names) for b in names[i + 1:]]
    for a, b in pairs:
        qa = next(f"CAST(floor({s} * {k}) AS BIGINT)"
                  for n, s, k in _CORR_COLS if n == a)
        qb = next(f"CAST(floor({s} * {k}) AS BIGINT)"
                  for n, s, k in _CORR_COLS if n == b)
        sums.append(f"sum({qa} * {qb}) AS sp_{a}_{b}")
    selects = " UNION ALL ".join(
        f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
        f"ROUND((CAST(n AS DOUBLE) * CAST(sp_{a}_{b} AS DOUBLE)"
        f" - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))"
        f" / sqrt((CAST(n AS DOUBLE) * CAST(ss_{a} AS DOUBLE)"
        f" - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))"
        f" * (CAST(n AS DOUBLE) * CAST(ss_{b} AS DOUBLE)"
        f" - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE))), 6) AS corr"
        f" FROM m"
        for a, b in pairs
    )
    return (
        "WITH m AS (SELECT "
        + ", ".join(sums)
        + " FROM lineitem) SELECT * FROM ("
        + selects
        + ") ORDER BY col_a, col_b"
    )


ORACLES["profile_correlation_matrix"] = _corr_matrix_oracle()


# ------------------------------------------------- FK inclusion discovery

# (child_table, child_col, parent_table, parent_col) — the candidate
# inclusion dependencies a schema-discovery pass would test.  The two
# reverse pairs are deliberate partial cases (not every order key
# appears in lineitem on the synthetic data), so the operator's
# "containment < 1" path is exercised, not just the 1.0 diagonal.
_FK_PAIRS = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("events", "user_id", "customer", "c_custkey"),
    ("orders", "o_orderkey", "lineitem", "l_orderkey"),
    ("part", "p_partkey", "lineitem", "l_partkey"),
]


def fk_inclusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inclusion-dependency discovery: for each candidate (child col,
    parent col) pair, the distinct-child-key count, how many of those
    keys exist in the parent column, and the containment fraction —
    exactly the signal FK inference, join planning, and referential
    audits start from.

    Scale: each pair is distinct(child) ⟕semi distinct-free parent —
    the distinct is a map-side partial aggregate and the semi join
    shuffles only distinct KEYS (never rows); no broadcast is forced,
    so AQE picks broadcast only when the parent side is actually small.
    The containment fraction is exact integer half-up division (the
    float round can land on a real .5 for integer ratios — same device
    as dow_seasonality).  At 100 TB, the pre-screen would be the KMV
    sketch overlap from ``operators/sketches.py``, with this exact pass
    run only on surviving candidates.
    """
    # ONE distinct-key frame per TABLE (not per column-role): all of a
    # table's candidate columns fan to (c, k) rows from a single scan
    # and reduce in a single distinct — 8 scans + 8 distinct shuffles
    # where the per-(table, column) shape paid 14 of each; the frame is
    # checkpointed when more than one pair-role reads it.
    cols_by_table: dict[str, list[str]] = {}
    reads: dict[str, int] = {}
    for ct, cc, pt, pc in _FK_PAIRS:
        for t, c in ((ct, cc), (pt, pc)):
            cols_by_table.setdefault(t, [])
            if c not in cols_by_table[t]:
                cols_by_table[t].append(c)
            reads[t] = reads.get(t, 0) + 1
    frames: dict[str, DataFrame] = {}
    for t, cols in cols_by_table.items():
        args = ", ".join(f"'{c}', CAST({c} AS BIGINT)" for c in cols)
        fan = (
            load_table(spark, sf_dir, t)
            .selectExpr(f"stack({len(cols)}, {args}) AS (c, k)")
            .filter(F.col("k").isNotNull())
            .distinct()
        )
        # cache (not checkpoint): keeps the pruned scan visible to the
        # plan gate while deduplicating evaluation across pair-roles
        frames[t] = fan.cache() if reads[t] > 1 else fan

    def dkeys(t: str, c: str) -> DataFrame:
        return frames[t].filter(F.col("c") == c).select("k")

    # every pair becomes one branch of a single tall frame: child keys
    # left-joined to a parent-hit marker, reduced by ONE grouped
    # aggregate — 10 pairs, one job, instead of 4 jobs per pair.
    branches = []
    for ct, cc, pt, pc in _FK_PAIRS:
        parent = dkeys(pt, pc).withColumn("hit", F.lit(1))
        branches.append(
            dkeys(ct, cc)
            .join(parent, "k", "left")
            .select(
                F.lit(f"{ct}.{cc}").alias("child_col"),
                F.lit(f"{pt}.{pc}").alias("parent_col"),
                "hit",
            )
        )
    tall = branches[0]
    for b in branches[1:]:
        tall = tall.unionByName(b)
    return (
        tall.groupBy("child_col", "parent_col")
        .agg(
            F.count(F.lit(1)).alias("n_child"),
            F.count("hit").alias("n_contained"),
        )
        .select(
            "child_col",
            "parent_col",
            F.col("n_child").alias("n_child_distinct"),
            "n_contained",
            (
                F.expr(
                    "(2 * n_contained * 1000000 + n_child)"
                    " DIV (2 * n_child)"
                ).cast("double")
                / 1e6
            ).alias("containment_frac"),
            (F.col("n_contained") == F.col("n_child")).alias(
                "is_candidate_fk"
            ),
        )
        .orderBy("child_col", "parent_col")
    )


def _fk_inclusion_oracle() -> str:
    branches = []
    for ct, cc, pt, pc in _FK_PAIRS:
        branches.append(f"""
            SELECT '{ct}.{cc}' AS child_col, '{pt}.{pc}' AS parent_col,
                   CAST(n_child AS BIGINT) AS n_child_distinct,
                   CAST(n_contained AS BIGINT) AS n_contained,
                   CAST((2 * n_contained * 1000000 + n_child)
                        // (2 * n_child) AS DOUBLE) / 1e6
                       AS containment_frac,
                   n_contained = n_child AS is_candidate_fk
            FROM (
                SELECT count(*) AS n_child,
                       count(CASE WHEN k IN (
                           SELECT CAST({pc} AS BIGINT) FROM {pt}
                       ) THEN 1 END) AS n_contained
                FROM (SELECT DISTINCT CAST({cc} AS BIGINT) AS k
                      FROM {ct} WHERE {cc} IS NOT NULL) c
            ) t""")
    return (
        "SELECT * FROM ("
        + " UNION ALL ".join(branches)
        + ") ORDER BY child_col, parent_col"
    )


QUERIES["profile_fk_inclusion"] = fk_inclusion
ORACLES["profile_fk_inclusion"] = _fk_inclusion_oracle()


# ------------------------------------------- functional dependencies

_FD_CANDIDATES = [
    ("orders", "o_orderkey", "o_custkey"),
    ("orders", "o_custkey", "o_orderstatus"),
    ("orders", "o_orderpriority", "o_orderstatus"),
    ("customer", "c_custkey", "c_mktsegment"),
    ("customer", "c_name", "c_custkey"),
    ("customer", "c_nationkey", "c_mktsegment"),
    ("part", "p_partkey", "p_brand"),
    ("part", "p_brand", "p_type"),
    ("events", "event_id", "event_type"),
    ("events", "user_id", "event_type"),
    ("nation", "n_regionkey", "n_name"),
]


def fd_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery: for each candidate det → dep
    pair, does every determinant value map to exactly one dependent
    value?  The other half of schema profiling next to
    [[profile_fk_inclusion]] — FDs are what normalization, key
    inference, and "is this column derivable?" pruning start from.

    Per candidate: distinct determinant count, how many determinant
    values violate (map to ≥2 dependents), the max fan-out, and the
    verdict.  Scale: each candidate is ONE grouped exact
    count-distinct (map-side partial) reduced to a 1-row verdict —
    branch results union to 11 rows, so the shuffled payload per
    candidate is its determinant-grain distinct counts; at 100 TB the
    pre-screen would be HLL sketches per column pair with this exact
    pass run only on near-FD survivors (same screen-then-verify ladder
    as the FK pass).
    """
    by_table: dict[str, list[tuple[int, str, str]]] = {}
    for i, (t, det, dep) in enumerate(_FD_CANDIDATES):
        by_table.setdefault(t, []).append((i, det, dep))

    det_names = F.array(
        *[F.lit(f"{t}.{det}") for t, det, _ in _FD_CANDIDATES]
    )
    dep_names = F.array(
        *[F.lit(f"{t}.{dep}") for t, _, dep in _FD_CANDIDATES]
    )

    # One scan per table: every candidate (det, dep) pair riding that
    # table is unpivoted by ``stack`` into a tall (cand, d, p) frame in
    # the same pass (string-cast is injective for the key/string columns
    # profiled here, so count-distinct is unchanged).  The per-candidate
    # verdict is then a single grouped count-distinct over the union —
    # 5 scans total instead of one groupBy job per candidate (was 11
    # scans / 33 shuffles; the same collapse the FK-inclusion pass got).
    # ``stack`` rather than explode-of-structs: at bench scale this
    # query is driver-analysis-bound (execution is ~70 ms), and the flat
    # stack plan analyzes ~2× faster than the nested-struct explode; at
    # 100 TB the shapes execute identically.
    talls = []
    for t, pairs in by_table.items():
        items = ", ".join(
            f"{i}, CAST({det} AS STRING), CAST({dep} AS STRING)"
            for i, det, dep in pairs
        )
        talls.append(
            load_table(spark, sf_dir, t).selectExpr(
                f"stack({len(pairs)}, {items}) AS (cand, d, p)"
            )
        )
    tall = talls[0]
    for other in talls[1:]:
        tall = tall.unionByName(other)
    per = tall.groupBy("cand", "d").agg(F.countDistinct("p").alias("k"))
    return (
        per.groupBy("cand")
        .agg(
            F.count(F.lit(1)).alias("n_det_distinct"),
            F.sum((F.col("k") > 1).cast("long")).alias("n_violating"),
            F.max("k").alias("max_fanout"),
        )
        .select(
            F.element_at(det_names, F.col("cand") + 1).alias("determinant"),
            F.element_at(dep_names, F.col("cand") + 1).alias("dependent"),
            "n_det_distinct",
            "n_violating",
            "max_fanout",
            (F.col("n_violating") == 0).alias("fd_holds"),
        )
        .orderBy("determinant", "dependent")
    )


def _fd_oracle() -> str:
    branches = []
    for t, det, dep in _FD_CANDIDATES:
        branches.append(f"""
            SELECT '{t}.{det}' AS determinant, '{t}.{dep}' AS dependent,
                   CAST(count(*) AS BIGINT) AS n_det_distinct,
                   CAST(sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_violating,
                   CAST(max(k) AS BIGINT) AS max_fanout,
                   sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) = 0 AS fd_holds
            FROM (
                SELECT {det} AS d, count(DISTINCT {dep}) AS k
                FROM {t} GROUP BY 1
            )""")
    return (
        "SELECT * FROM ("
        + " UNION ALL ".join(branches)
        + ") ORDER BY determinant, dependent"
    )


QUERIES["profile_fd_discovery"] = fd_discovery
ORACLES["profile_fd_discovery"] = _fd_oracle()


# --------------------------------------------- column entropy panel

_ENTROPY_COLUMNS = [
    ("events", "event_type"),
    ("orders", "o_orderstatus"),
    ("orders", "o_orderpriority"),
    ("customer", "c_mktsegment"),
    ("nation", "n_name"),
    ("part", "p_brand"),
]


def column_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column Shannon entropy panel over the catalog's categorical
    columns: distinct count, entropy in bits, the normalized entropy
    (vs ln of distinct), and the modal value's share — the information
    profile that ranks join/partition key candidates and flags
    near-constant columns.

    Exactness: H = ln(n) − Σc·ln(c)/n with each ln(c) integer-scaled
    (1e6) once per distinct value before the order-free Σc·⌊ln(c)·1e6⌉
    sum (the [[mm_byte_entropy]] device).  Scale: one stack-unpivoted
    scan per table (the fd_discovery collapse), value counts map-side.
    """
    by_table: dict[str, list[tuple[int, str]]] = {}
    for i, (t, c) in enumerate(_ENTROPY_COLUMNS):
        by_table.setdefault(t, []).append((i, c))
    names = F.array(
        *[F.lit(f"{t}.{c}") for t, c in _ENTROPY_COLUMNS]
    )
    talls = []
    for t, cols in by_table.items():
        items = ", ".join(
            f"{i}, CAST({c} AS STRING)" for i, c in cols
        )
        talls.append(
            load_table(spark, sf_dir, t).selectExpr(
                f"stack({len(cols)}, {items}) AS (cid, v)"
            )
        )
    tall = talls[0]
    for other in talls[1:]:
        tall = tall.unionByName(other)
    counts = tall.groupBy("cid", "v").agg(F.count(F.lit(1)).alias("c"))
    per = counts.groupBy("cid").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(
            F.col("c")
            * F.round(F.log(F.col("c").cast("double")) * 1e6).cast("long")
        ).alias("s_ln_c"),
        F.max("c").alias("modal_c"),
    )
    return (
        per.select(
            F.element_at(names, F.col("cid") + 1).alias("column_name"),
            "n",
            "n_distinct",
            F.round(
                (
                    F.log(F.col("n").cast("double"))
                    - F.col("s_ln_c") / 1e6 / F.col("n")
                )
                / F.lit(math.log(2.0)),
                6,
            ).alias("entropy_bits"),
            F.expr(
                "(2*modal_c*1000000 + n) DIV (2*n)"
            ).alias("modal_share_ppm"),
        )
        .orderBy("column_name")
    )


QUERIES["profile_column_entropy"] = column_entropy


def _column_entropy_oracle() -> str:
    branches = []
    for i, (t, c) in enumerate(_ENTROPY_COLUMNS):
        branches.append(
            f"SELECT {i} AS cid, '{t}.{c}' AS column_name,"
            f" CAST({c} AS VARCHAR) AS v FROM {t}"
        )
    tall = " UNION ALL ".join(branches)
    return f"""
        WITH tall AS ({tall}),
        counts AS (
            SELECT cid, any_value(column_name) AS column_name, v,
                   count(*) AS c
            FROM tall GROUP BY cid, v
        ),
        per AS (
            SELECT cid, any_value(column_name) AS column_name,
                   CAST(sum(c) AS BIGINT) AS n,
                   CAST(count(*) AS BIGINT) AS n_distinct,
                   CAST(sum(c * CAST(round(ln(c * 1.0) * 1000000.0)
                                     AS BIGINT)) AS BIGINT) AS s_ln_c,
                   CAST(max(c) AS BIGINT) AS modal_c
            FROM counts GROUP BY cid
        )
        SELECT column_name, n, n_distinct,
               round((ln(n) - s_ln_c / 1000000.0 / n) / ln(2.0), 6)
                   AS entropy_bits,
               CAST((2*modal_c*1000000 + n) // (2*n) AS BIGINT)
                   AS modal_share_ppm
        FROM per ORDER BY column_name
    """


ORACLES["profile_column_entropy"] = _column_entropy_oracle()


# -------------------------------------------- equi-width histogram

HIST_BINS = 20


def numeric_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width 20-bin histogram of order totals on integer cents —
    the distribution readout behind skew decisions and bin-packed
    sampling, computed the at-scale way: min/max in one pass, bin
    assignment as pure integer arithmetic in a second map-side pass.

    bin = (cents − min)·B DIV (max − min + 1) — exact, engine-portable
    (no float width).  Bounds are reported in dollars.  Scale: two
    scans, one tiny broadcast, bins are the only shuffled payload.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    rng = orders.agg(
        F.min("cents").alias("lo"), F.max("cents").alias("hi")
    )
    binned = (
        orders.crossJoin(F.broadcast(rng))
        .selectExpr(
            "lo",
            "hi",
            f"(cents - lo) * {HIST_BINS} DIV (hi - lo + 1) AS bin",
        )
        .groupBy("lo", "hi", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return binned.selectExpr(
        "CAST(bin AS BIGINT) AS bin",
        f"CAST(lo + bin * (hi - lo + 1) DIV {HIST_BINS} AS DOUBLE)"
        " / 100 AS bin_lo",
        f"CAST(lo + (bin + 1) * (hi - lo + 1) DIV {HIST_BINS}"
        " AS DOUBLE) / 100 AS bin_hi",
        "n AS n_orders",
    ).orderBy("bin")


QUERIES["profile_numeric_histogram"] = numeric_histogram

ORACLES["profile_numeric_histogram"] = f"""
    WITH c AS (
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    rng AS (SELECT min(cents) AS lo, max(cents) AS hi FROM c),
    binned AS (
        SELECT lo, hi,
               (cents - lo) * {HIST_BINS} // (hi - lo + 1) AS bin,
               count(*) AS n
        FROM c CROSS JOIN rng GROUP BY 1, 2, 3
    )
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(lo + bin * (hi - lo + 1) // {HIST_BINS} AS DOUBLE)
               / 100 AS bin_lo,
           CAST(lo + (bin + 1) * (hi - lo + 1) // {HIST_BINS} AS DOUBLE)
               / 100 AS bin_hi,
           CAST(n AS BIGINT) AS n_orders
    FROM binned ORDER BY bin
"""


# -------------------------------------------- PSI distribution drift

PSI_BUCKETS = 10


def psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the event-value distribution
    between the first and second half of the time range, per event
    type — the standard ML-monitoring drift score (PSI < 0.1 stable,
    0.1–0.25 moderate, > 0.25 major shift).

    Buckets are 10 equal-width cells over the global integer-cents
    range (pure integer arithmetic — engine-portable, no float
    widths); counts get add-one smoothing so empty cells stay finite.
    Each PSI term (p2−p1)·ln(p2/p1) is evaluated from exact integer
    cell counts and rounded to a 1e-9 integer before the cross-bucket
    sum — the ``zipf_fit`` integer-term device, so the only float ops
    happen per-cell on identical operands in both engines.

    Scale: one scan for the global bounds, one map-side pass to
    (type, period, bucket) cells — the shuffled payload is
    |types|·2·10 rows regardless of input size.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.unix_timestamp("ts").alias("us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    b = ev.agg(
        F.min("cents").alias("mn"),
        F.max("cents").alias("mx"),
        F.expr("(min(us) + max(us)) DIV 2").alias("mid"),
    )
    cells = (
        ev.crossJoin(F.broadcast(b))
        .selectExpr(
            "event_type",
            "CASE WHEN us <= mid THEN 1 ELSE 2 END AS period",
            f"least({PSI_BUCKETS - 1},"
            f" (cents - mn) * {PSI_BUCKETS} DIV (mx - mn + 1)) AS bucket",
        )
        .groupBy("event_type", "period", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    ).cache()
    types = cells.select("event_type").distinct()
    grid = types.crossJoin(
        spark.range(PSI_BUCKETS).select(F.col("id").alias("bucket"))
    )
    c1 = cells.filter("period = 1").select(
        "event_type", "bucket", F.col("c").alias("c1")
    )
    c2 = cells.filter("period = 2").select(
        "event_type", "bucket", F.col("c").alias("c2")
    )
    full = (
        grid.join(c1, ["event_type", "bucket"], "left")
        .join(c2, ["event_type", "bucket"], "left")
        .na.fill(0, ["c1", "c2"])
    )
    tot = full.groupBy("event_type").agg(
        F.sum("c1").alias("n1"), F.sum("c2").alias("n2")
    )
    B = PSI_BUCKETS
    terms = full.join(F.broadcast(tot), "event_type").selectExpr(
        "event_type",
        "CAST(round(1e9 *"
        f" (CAST((c2+1)*(n1+{B}) - (c1+1)*(n2+{B}) AS DOUBLE)"
        f"  / (CAST(n1+{B} AS DOUBLE) * CAST(n2+{B} AS DOUBLE)))"
        f" * ln(CAST((c2+1)*(n1+{B}) AS DOUBLE)"
        f"      / CAST((c1+1)*(n2+{B}) AS DOUBLE))"
        ") AS BIGINT) AS term_nano",
    )
    return (
        terms.groupBy("event_type")
        .agg(
            F.round(F.sum("term_nano") / F.lit(1e9), 6).alias("psi")
        )
        .orderBy("event_type")
    )


QUERIES["profile_psi_drift"] = psi_drift

ORACLES["profile_psi_drift"] = f"""
    WITH ev AS (
        SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS us,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    b AS (
        SELECT min(cents) AS mn, max(cents) AS mx,
               (min(us) + max(us)) // 2 AS mid
        FROM ev
    ),
    cells AS (
        SELECT event_type,
               CASE WHEN us <= b.mid THEN 1 ELSE 2 END AS period,
               least({PSI_BUCKETS - 1},
                     (cents - b.mn) * {PSI_BUCKETS}
                     // (b.mx - b.mn + 1)) AS bucket,
               count(*) AS c
        FROM ev, b GROUP BY 1, 2, 3
    ),
    grid AS (
        SELECT t.event_type, k.bucket,
               COALESCE(c1.c, 0) AS c1, COALESCE(c2.c, 0) AS c2
        FROM (SELECT DISTINCT event_type FROM cells) t
        CROSS JOIN (SELECT unnest(range(0, {PSI_BUCKETS})) AS bucket) k
        LEFT JOIN cells c1 ON c1.event_type = t.event_type
            AND c1.bucket = k.bucket AND c1.period = 1
        LEFT JOIN cells c2 ON c2.event_type = t.event_type
            AND c2.bucket = k.bucket AND c2.period = 2
    ),
    tot AS (
        SELECT event_type, sum(c1) AS n1, sum(c2) AS n2
        FROM grid GROUP BY 1
    ),
    terms AS (
        SELECT g.event_type,
               CAST(round(
                   1e9 *
                   (CAST((g.c2+1)*(t.n1+{PSI_BUCKETS})
                         - (g.c1+1)*(t.n2+{PSI_BUCKETS}) AS DOUBLE)
                    / (CAST(t.n1+{PSI_BUCKETS} AS DOUBLE)
                       * CAST(t.n2+{PSI_BUCKETS} AS DOUBLE)))
                   * ln(CAST((g.c2+1)*(t.n1+{PSI_BUCKETS}) AS DOUBLE)
                        / CAST((g.c1+1)*(t.n2+{PSI_BUCKETS}) AS DOUBLE))
               ) AS BIGINT) AS term_nano
        FROM grid g JOIN tot t USING (event_type)
    )
    SELECT event_type,
           round(CAST(sum(term_nano) AS DOUBLE) / 1e9, 6) AS psi
    FROM terms GROUP BY 1 ORDER BY 1
"""


# -------------------------------------------- candidate-key discovery

_KEY_CANDIDATES = [
    # (table, column-expr, label) — single columns plus the composite
    # the schema is known to key on; uniqueness = NDV == rowcount
    ("orders", "CAST(o_orderkey AS VARCHAR)", "o_orderkey"),
    ("orders", "CAST(o_custkey AS VARCHAR)", "o_custkey"),
    ("customer", "CAST(c_custkey AS VARCHAR)", "c_custkey"),
    ("customer", "c_name", "c_name"),
    ("part", "CAST(p_partkey AS VARCHAR)", "p_partkey"),
    ("part", "p_name", "p_name"),
    (
        "lineitem",
        "CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)",
        "l_orderkey+l_linenumber",
    ),
    ("lineitem", "CAST(l_orderkey AS VARCHAR)", "l_orderkey"),
]


def candidate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-key discovery: for each declared candidate (single
    columns plus the lineitem composite), exact NDV vs row count and
    the uniqueness verdict — what a loader uses to validate primary
    keys and a join planner uses to pick the n:1 side.

    One scan PER TABLE: all of a table's candidates ride a single
    posexploded tall frame (the ``fd_discovery`` collapse), so adding a
    candidate adds zero scans.  At 100 TB swap exact NDV for the KMV
    sketch; the plan shape stays one pass per table.
    """
    per_table: dict[str, list[tuple[int, str, str]]] = {}
    for i, (t, expr, label) in enumerate(_KEY_CANDIDATES):
        # candidates are written in ANSI/DuckDB spelling; Spark wants
        # STRING where DuckDB wants VARCHAR
        per_table.setdefault(t, []).append(
            (i, expr.replace("AS VARCHAR", "AS STRING"), label)
        )
    frames = []
    for t, cands in per_table.items():
        arr = ", ".join(e for (_, e, _) in cands)
        ids = ", ".join(str(i) for (i, _, _) in cands)
        tall = (
            load_table(spark, sf_dir, t)
            .selectExpr(f"array({arr}) AS vs")
            .selectExpr(
                f"posexplode(arrays_zip(array({ids}), vs)) AS (p, z)"
            )
            .selectExpr("z['0'] AS cid", "z['vs'] AS v")
        )
        frames.append(
            tall.groupBy("cid").agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.countDistinct("v").alias("n_distinct"),
            )
        )
    allf = frames[0]
    for f in frames[1:]:
        allf = allf.unionByName(f)
    meta = values_df(
        spark,
        [(i, t, label) for i, (t, _, label) in enumerate(_KEY_CANDIDATES)],
        "cid long, table_name string, column_name string",
    )
    return (
        allf.join(F.broadcast(meta), "cid")
        .selectExpr(
            "table_name",
            "column_name",
            "n_rows",
            "n_distinct",
            "CAST(CASE WHEN n_rows = n_distinct THEN 1 ELSE 0 END"
            " AS BIGINT) AS is_key",
        )
        .orderBy("table_name", "column_name")
    )


QUERIES["profile_candidate_keys"] = candidate_keys


def _candidate_keys_oracle() -> str:
    rows = []
    for t, expr, label in _KEY_CANDIDATES:
        rows.append(
            f"SELECT '{t}' AS table_name, '{label}' AS column_name,"
            f" CAST(count(*) AS BIGINT) AS n_rows,"
            f" CAST(count(DISTINCT {expr}) AS BIGINT) AS n_distinct"
            f" FROM {t}"
        )
    u = " UNION ALL ".join(rows)
    return f"""
        SELECT table_name, column_name, n_rows, n_distinct,
               CAST(CASE WHEN n_rows = n_distinct THEN 1 ELSE 0 END
                    AS BIGINT) AS is_key
        FROM ({u}) ORDER BY table_name, column_name
    """


ORACLES["profile_candidate_keys"] = _candidate_keys_oracle()


# -------------------------------------------- decimal-precision audit

_DECIMAL_COLS = [
    ("lineitem", "l_quantity"),
    ("lineitem", "l_extendedprice"),
    ("lineitem", "l_discount"),
    ("lineitem", "l_tax"),
    ("orders", "o_totalprice"),
    ("events", "value"),
]


def decimal_precision_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fractional-precision profile of every money-like column: how
    many rows are non-integer, how many carry precision beyond two
    decimals, and whether the column "fits cents" — the audit that
    decides if a pipeline's integer-cents discipline (used by every
    exact-money aggregate in this repo) is lossless for a given feed.

    One scan per source table (the candidate columns ride a union of
    projections, not per-column rescans); the integerness predicates
    compare v·100 and v against their rounds on identical doubles in
    both engines.
    """
    per_table: dict[str, list[str]] = {}
    for t, c in _DECIMAL_COLS:
        per_table.setdefault(t, []).append(c)
    frames = []
    for t, cols in per_table.items():
        branches = ", ".join(
            f"'{c}', CAST({c} AS DOUBLE)" for c in cols
        )
        frames.append(
            load_table(spark, sf_dir, t).selectExpr(
                f"stack({len(cols)}, {branches}) AS (col, v)"
            )
        )
    tall = frames[0]
    for fr in frames[1:]:
        tall = tall.unionByName(fr)
    return (
        tall.selectExpr(
            "col",
            "CASE WHEN round(v) = v THEN 0 ELSE 1 END AS frac0",
            "CASE WHEN round(v * 100) = v * 100 THEN 0 ELSE 1 END"
            " AS frac2",
        )
        .groupBy("col")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("frac0").alias("non_integer_rows"),
            F.sum("frac2").alias("beyond_cents_rows"),
        )
        .selectExpr(
            "col",
            "n_rows",
            "non_integer_rows",
            "beyond_cents_rows",
            "CAST(CASE WHEN beyond_cents_rows = 0 THEN 1 ELSE 0 END"
            " AS BIGINT) AS fits_cents",
        )
        .orderBy("col")
    )


QUERIES["profile_decimal_audit"] = decimal_precision_audit


def _decimal_audit_oracle() -> str:
    branches = " UNION ALL ".join(
        f"SELECT '{c}' AS col, CAST({c} AS DOUBLE) AS v FROM {t}"
        for t, c in _DECIMAL_COLS
    )
    return f"""
        WITH tall AS ({branches}),
        m AS (
            SELECT col,
                   CASE WHEN round(v) = v THEN 0 ELSE 1 END AS frac0,
                   CASE WHEN round(v * 100) = v * 100 THEN 0 ELSE 1 END
                       AS frac2
            FROM tall
        )
        SELECT col, CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(frac0) AS BIGINT) AS non_integer_rows,
               CAST(sum(frac2) AS BIGINT) AS beyond_cents_rows,
               CAST(CASE WHEN sum(frac2) = 0 THEN 1 ELSE 0 END
                    AS BIGINT) AS fits_cents
        FROM m GROUP BY col ORDER BY col
    """


ORACLES["profile_decimal_audit"] = _decimal_audit_oracle()


# --------------------------------------- equi-depth (quantile) histogram

EQUI_DEPTH_B = 10


def equi_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH 10-bucket histogram of order totals: each bucket
    holds (to integer exactness) N/B rows, and the readout is each
    bucket's VALUE range — the quantile profile optimizers build for
    selectivity estimation and range-partition planning, and the
    complement of ``profile_numeric_histogram``'s equi-width bins
    (equi-width shows shape; equi-depth shows where the mass cuts).

    Exactness: bucket boundaries are exact order statistics — rank r
    lands in bucket ⌈r·B/N⌉−1 = (r·B−1) DIV N, the unique label rule
    consistent with the coverage rule "bucket k holds ranks
    (k·N DIV B, (k+1)·N DIV B]" (the former floor-based label
    ((r−1)·B) DIV N disagreed with the coverage rule whenever N is not
    a multiple of B and silently dropped boundary rows) — computed on
    the DISTINCT-cents cell frame with a cumulative window (the
    Mann-Whitney rank device),
    and a cell whose rank span straddles a boundary is SPLIT by integer
    range intersection, so every bucket's row count is exactly
    ⌈kN/B⌉−⌈(k−1)N/B⌉.  Scale: the window runs over the distinct price
    domain, not the row count; everything downstream is B rows.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    cells = orders.groupBy("cents").agg(F.count(F.lit(1)).alias("t"))
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, -1)
    ranked = cells.withColumn(
        "below", F.coalesce(F.sum("t").over(w), F.lit(0))
    )
    tot = ranked.agg(F.sum("t").alias("n"))
    b = EQUI_DEPTH_B
    spans = (
        ranked.crossJoin(F.broadcast(tot))
        .selectExpr(
            "cents",
            "n",
            "below + 1 AS r_lo",
            "below + t AS r_hi",
            f"((below + 1) * {b} - 1) DIV n AS b_lo",
            f"((below + t) * {b} - 1) DIV n AS b_hi",
        )
        .selectExpr(
            "cents",
            "n",
            "r_lo",
            "r_hi",
            "explode(sequence(b_lo, b_hi)) AS bucket",
        )
        .selectExpr(
            "cents",
            "bucket",
            # rows of this cell landing in this bucket: rank-range ∩
            # bucket-range; bucket k covers ranks (k·N DIV B, (k+1)·N
            # DIV B]
            f"least(r_hi, ((bucket + 1) * n) DIV {b})"
            f" - greatest(r_lo, (bucket * n) DIV {b} + 1) + 1 AS rows_in",
        )
    )
    return (
        spans.groupBy("bucket")
        .agg(
            F.sum("rows_in").alias("n_rows"),
            F.min("cents").alias("lo_c"),
            F.max("cents").alias("hi_c"),
            F.count(F.lit(1)).alias("n_distinct_values"),
        )
        .selectExpr(
            "CAST(bucket AS BIGINT) AS bucket",
            "CAST(n_rows AS BIGINT) AS n_rows",
            "CAST(lo_c AS DOUBLE) / 100 AS value_lo",
            "CAST(hi_c AS DOUBLE) / 100 AS value_hi",
            "CAST(n_distinct_values AS BIGINT) AS n_distinct_values",
        )
        .orderBy("bucket")
    )


QUERIES["profile_equi_depth_histogram"] = equi_depth_histogram

ORACLES["profile_equi_depth_histogram"] = f"""
    WITH c AS (
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    cells AS (SELECT cents, count(*) AS t FROM c GROUP BY 1),
    ranked AS (
        SELECT cents, t,
               COALESCE(sum(t) OVER (ORDER BY cents
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), 0) AS below
        FROM cells
    ),
    tot AS (SELECT sum(t) AS n FROM ranked),
    spans AS (
        SELECT cents, n, below + 1 AS r_lo, below + t AS r_hi,
               unnest(range(
                   CAST(((below + 1) * {EQUI_DEPTH_B} - 1) // n AS BIGINT),
                   CAST(((below + t) * {EQUI_DEPTH_B} - 1) // n + 1
                        AS BIGINT))) AS bucket
        FROM ranked, tot
    ),
    rows_in AS (
        SELECT cents, bucket,
               least(r_hi, ((bucket + 1) * n) // {EQUI_DEPTH_B})
               - greatest(r_lo, (bucket * n) // {EQUI_DEPTH_B} + 1) + 1
                   AS rows_in
        FROM spans
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(sum(rows_in) AS BIGINT) AS n_rows,
           CAST(min(cents) AS DOUBLE) / 100 AS value_lo,
           CAST(max(cents) AS DOUBLE) / 100 AS value_hi,
           CAST(count(*) AS BIGINT) AS n_distinct_values
    FROM rows_in
    GROUP BY bucket
    ORDER BY bucket
"""


# ----------------------------------------- id gaps & islands audit


def id_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands audit of the event_id sequence per event type —
    the ingestion-completeness readout ("are ids arriving in contiguous
    runs, and how long are the runs?") that catches dropped partitions
    and replayed batches.  Each type's id stream is the full sequence
    FILTERED to that type, so islands are short and gaps are the other
    types' ids; a pipeline table with planted drops reads the same way.

    Scale shape: no global-order window over the fact.  Island STARTS
    are rows whose (type, id−1) predecessor is absent (one shuffled
    anti-join on a computed key), island ENDS symmetrically with id+1;
    the i-th start pairs with the i-th end, so the only ordered windows
    run over the ISLAND-grain frames (≈ n_islands rows, not n_rows —
    at 100 TB the fact shuffles twice and nothing ever single-threads a
    whole event type through one sort).  The DuckDB oracle uses the
    classic ``id − row_number()`` grouping device instead — an
    independent derivation of the same islands.
    """
    ids = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id"
    )
    a = ids.alias("a")
    b = ids.alias("b")
    starts = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("b.event_id") == F.col("a.event_id") - 1),
        "left_anti",
    ).select("event_type", F.col("event_id").alias("lo"))
    ends = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("b.event_id") == F.col("a.event_id") + 1),
        "left_anti",
    ).select("event_type", F.col("event_id").alias("hi"))
    ws = Window.partitionBy("event_type").orderBy("lo")
    we = Window.partitionBy("event_type").orderBy("hi")
    isl = (
        starts.withColumn("rn", F.row_number().over(ws))
        .join(
            ends.withColumn("rn", F.row_number().over(we)),
            ["event_type", "rn"],
        )
        .select(
            "event_type", "lo", "hi", (F.col("hi") - F.col("lo") + 1).alias("len")
        )
    )
    return (
        isl.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_islands"),
            F.sum("len").alias("n_rows"),
            F.max("len").alias("max_len"),
            F.min("lo").alias("first_id"),
            F.max("hi").alias("last_id"),
        )
        .selectExpr(
            "event_type",
            "CAST(n_islands AS BIGINT) AS n_islands",
            "CAST(n_rows AS BIGINT) AS n_rows",
            "CAST(max_len AS BIGINT) AS max_len",
            "(2 * n_rows * 1000000 + n_islands) DIV (2 * n_islands)"
            " AS mean_len_ppm",
            "CAST(first_id AS BIGINT) AS first_id",
            "CAST(last_id AS BIGINT) AS last_id",
        )
        .orderBy("event_type")
    )


QUERIES["profile_id_gap_islands"] = id_gap_islands

ORACLES["profile_id_gap_islands"] = """
    WITH s AS (
        SELECT event_type, event_id,
               event_id - row_number() OVER (PARTITION BY event_type
                                             ORDER BY event_id) AS grp
        FROM events
    ),
    isl AS (
        SELECT event_type, grp, count(*) AS len,
               min(event_id) AS lo, max(event_id) AS hi
        FROM s GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(sum(len) AS BIGINT) AS n_rows,
           CAST(max(len) AS BIGINT) AS max_len,
           CAST((2*sum(len)*1000000 + count(*)) // (2*count(*)) AS BIGINT)
               AS mean_len_ppm,
           CAST(min(lo) AS BIGINT) AS first_id,
           CAST(max(hi) AS BIGINT) AS last_id
    FROM isl GROUP BY 1 ORDER BY 1
"""


# ------------------------------------- cross-column NDV correlation

#: Pairs chosen to span the correlation spectrum on this data: a hard
#: FD (c_name → everything, ratio ≈ 1/ndv), sparse combinatorial
#: structure (partkey×suppkey ≈ 0.26, orderkey×linenumber ≈ 0.44),
#: mild correlation (orderdate×priority ≈ 0.72), and an independent
#: baseline (status×priority = 1.0) — the audit must separate them.
NDV_PAIRS = (
    ("customer", "c_name", "c_nationkey"),
    ("lineitem", "l_partkey", "l_suppkey"),
    ("lineitem", "l_orderkey", "l_linenumber"),
    ("orders", "o_orderdate", "o_orderpriority"),
    ("orders", "o_orderstatus", "o_orderpriority"),
)


def cross_column_ndv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-column NDV correlation audit: for each candidate column
    pair, the distinct counts of each side and of the pair, and the
    independence ratio ndv(a,b) / (ndv(a)·ndv(b)) — the statistic a
    cost-based optimizer's correlated-columns detection keys on (an
    independent pair scores ≈ 1 and the multiply-selectivities
    assumption holds; a functionally-dependent pair scores
    1/min(ndv) and the optimizer that multiplies underestimates by
    that factor).  The categorical companion to
    [[profile_correlation_matrix]] (numeric ρ) and
    [[profile_fd_discovery]] (exact dependencies) — this grades the
    middle ground where columns correlate without a hard FD.

    Exactness: exact count-distincts and a half-add ppm ratio.
    Scale: ONE pass per TABLE computes every needed distinct count in
    a single multi-distinct aggregate (Catalyst's Expand), and the
    per-pair rows come off the 1-row aggregate via stack — |tables|
    scans total, not |pairs| (the first shape paid one scan per pair
    and re-executed shared tables)."""
    by_table: dict[str, list[tuple[str, str]]] = {}
    for table, a, b in NDV_PAIRS:
        by_table.setdefault(table, []).append((a, b))
    outs = []
    for table, pairs in by_table.items():
        cols = sorted({c for p in pairs for c in p})
        aggs = [
            F.countDistinct(c).alias(f"ndv__{c}") for c in cols
        ] + [
            F.countDistinct(a, b).alias(f"ndvp__{a}__{b}")
            for a, b in pairs
        ]
        agg = load_table(spark, sf_dir, table).agg(*aggs)
        stack_args = ", ".join(
            f"'{a}', '{b}', ndv__{a}, ndv__{b}, ndvp__{a}__{b}"
            for a, b in pairs
        )
        outs.append(
            agg.selectExpr(
                f"stack({len(pairs)}, {stack_args})"
                " AS (col_a, col_b, ndv_a, ndv_b, ndv_pair)"
            ).selectExpr(
                f"'{table}' AS table_name",
                "col_a",
                "col_b",
                "CAST(ndv_a AS BIGINT) AS ndv_a",
                "CAST(ndv_b AS BIGINT) AS ndv_b",
                "CAST(ndv_pair AS BIGINT) AS ndv_pair",
                "(2 * ndv_pair * 1000000 + ndv_a * ndv_b)"
                " DIV (2 * ndv_a * ndv_b) AS independence_ppm",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("table_name", "col_a")


QUERIES["profile_cross_column_ndv"] = cross_column_ndv


def _cross_ndv_oracle() -> str:
    selects = []
    for table, a, b in NDV_PAIRS:
        selects.append(f"""
    SELECT '{table}' AS table_name, '{a}' AS col_a, '{b}' AS col_b,
           CAST(count(DISTINCT {a}) AS BIGINT) AS ndv_a,
           CAST(count(DISTINCT {b}) AS BIGINT) AS ndv_b,
           CAST(count(DISTINCT ({a}, {b})) AS BIGINT) AS ndv_pair,
           CAST((2 * count(DISTINCT ({a}, {b})) * 1000000
                 + count(DISTINCT {a}) * count(DISTINCT {b}))
                // (2 * count(DISTINCT {a}) * count(DISTINCT {b}))
                AS BIGINT) AS independence_ppm
    FROM {table}""")
    return (
        "SELECT * FROM ("
        + " UNION ALL ".join(selects)
        + ") ORDER BY table_name, col_a"
    )


ORACLES["profile_cross_column_ndv"] = _cross_ndv_oracle()


# --------------------------------------- z-order pruning-gain audit

ZORDER_FILES = 64
ZORDER_QBITS = 8


def _morton_expr(a: str, b: str, bits: int = ZORDER_QBITS) -> str:
    """Interleave the low ``bits`` of two longs (a in odd positions) —
    the z-curve file-clustering key ``tables.zorder_write`` uses."""
    terms = []
    for i in range(bits):
        terms.append(f"(((({a}) >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"(((({b}) >> {i}) & 1) << {2 * i})")
    return " + ".join(terms)


def zorder_pruning_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-layout planning audit: how many of ``ZORDER_FILES`` files
    would a two-dimensional box predicate (middle-eighth of customers ×
    middle-eighth of order days) have to scan under (a) the natural
    o_orderkey layout vs (b) a z-order layout on (custkey, day)?
    Files carry per-column min/max footer stats — exactly what parquet
    row groups ship and what Spark's scan prunes on — so this is the
    simulation a lakehouse team runs before paying for a re-cluster
    (``tables.zorder_write`` is the write path; this is its sizing
    tool).  On this corpus: natural scans all 64 files (custkey is
    uncorrelated with insert order), z-order scans ~10.

    Exactness: the Morton key interleaves 8-bit quantized dims with
    pure integer shifts; file assignment is the integer rank rule
    (rank−1)·F DIV n; box bounds are integer fractions of the column
    maxima — no doubles anywhere.  Scale: both layout ranks ride the
    bucket decomposition (rankops.global_rank), the plan twin of the
    range-partitioned sort a real re-cluster pays at write time; the
    audit output is 2·F file stats rows.
    """
    o = load_table(spark, sf_dir, "orders").selectExpr(
        "o_orderkey",
        "o_custkey",
        "CAST(datediff(o_orderdate, DATE '1992-01-01') AS BIGINT) AS d",
    )
    lim = o.agg(
        F.max("o_custkey").alias("mc"),
        F.max("d").alias("md"),
        F.count(F.lit(1)).alias("n"),
    )
    q = 1 << ZORDER_QBITS
    keyed = o.crossJoin(F.broadcast(lim)).selectExpr(
        "o_orderkey",
        "o_custkey",
        "d",
        "mc",
        "md",
        "n",
        f"(o_custkey * {q}) DIV (mc + 1) AS qa",
        f"(d * {q}) DIV (md + 1) AS qb",
    )
    # both simulated layouts rank via the bucket decomposition — a
    # partition-less row_number would single-partition the ORDER frame
    # (VERDICT r7 #4 class); at deployment scale the write path is a
    # range-partitioned sort, and the bucket rank is its plan twin
    ranked = global_rank(
        global_rank(
            keyed.withColumn(
                "mz", F.expr(_morton_expr("qa", "qb")).cast("long")
            ),
            "o_orderkey",
            "o_orderkey",
            rank_name="__rn",
        ),
        "mz",
        "o_orderkey",
        rank_name="__rz",
    )
    laid = ranked.selectExpr(
        "o_custkey",
        "d",
        "mc",
        "md",
        f"((__rn - 1) * {ZORDER_FILES}) DIV n AS f_nat",
        f"((__rz - 1) * {ZORDER_FILES}) DIV n AS f_z",
    )
    hit = (
        "hi_a >= (mc * 7) DIV 16 AND lo_a <= (mc * 9) DIV 16"
        " AND hi_b >= (md * 7) DIV 16 AND lo_b <= (md * 9) DIV 16"
    )
    # both layouts ride ONE pass: fan each row to (layout, file) before
    # the stats aggregate instead of evaluating the whole
    # double-global_rank subtree once per layout in two union branches
    # (Catalyst does not share common subtrees across branches — the
    # previous plan paid the orders scan, the Morton projection, and
    # BOTH bucket-decomposition ranks twice; guide §2.4)
    fanned = laid.select(
        "o_custkey",
        "d",
        "mc",
        "md",
        F.explode(
            F.array(
                F.struct(
                    F.lit("natural").alias("layout"),
                    F.col("f_nat").alias("f"),
                ),
                F.struct(
                    F.lit("zorder").alias("layout"),
                    F.col("f_z").alias("f"),
                ),
            )
        ).alias("lf"),
    ).select("o_custkey", "d", "mc", "md", "lf.layout", "lf.f")
    stats = fanned.groupBy("layout", "f").agg(
        F.min("o_custkey").alias("lo_a"),
        F.max("o_custkey").alias("hi_a"),
        F.min("d").alias("lo_b"),
        F.max("d").alias("hi_b"),
        F.max("mc").alias("mc"),
        F.max("md").alias("md"),
    )
    return (
        stats.groupBy("layout")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum(F.expr(f"IF({hit}, 1, 0)")).alias("files_scanned"),
        )
        .selectExpr(
            "layout",
            "CAST(n_files AS BIGINT) AS n_files",
            "CAST(files_scanned AS BIGINT) AS files_scanned",
            "(2 * files_scanned * 1000000 + n_files)"
            " DIV (2 * n_files) AS scan_share_ppm",
        )
        .orderBy("layout")
    )


QUERIES["profile_zorder_pruning_gain"] = zorder_pruning_gain


def _zorder_oracle() -> str:
    def morton(a: str, b: str, bits: int = ZORDER_QBITS) -> str:
        terms = []
        for i in range(bits):
            terms.append(f"((({a} >> {i}) & 1) << {2 * i + 1})")
            terms.append(f"((({b} >> {i}) & 1) << {2 * i})")
        return " + ".join(terms)

    q = 1 << ZORDER_QBITS
    hit = (
        "hi_a >= (mc * 7) // 16 AND lo_a <= (mc * 9) // 16"
        " AND hi_b >= (md * 7) // 16 AND lo_b <= (md * 9) // 16"
    )
    return f"""
    WITH o AS (
        SELECT o_orderkey, o_custkey,
               CAST(date_diff('day', DATE '1992-01-01', o_orderdate)
                    AS BIGINT) AS d
        FROM orders
    ),
    lim AS (SELECT max(o_custkey) AS mc, max(d) AS md, count(*) AS n
            FROM o),
    keyed AS (
        SELECT o.*, mc, md, n,
               (o_custkey * {q}) // (mc + 1) AS qa,
               (d * {q}) // (md + 1) AS qb
        FROM o, lim
    ),
    laid AS (
        SELECT o_custkey, d, mc, md,
               ((row_number() OVER (ORDER BY o_orderkey) - 1)
                * {ZORDER_FILES}) // n AS f_nat,
               ((row_number() OVER (ORDER BY ({morton("qa", "qb")}),
                 o_orderkey) - 1) * {ZORDER_FILES}) // n AS f_z
        FROM keyed
    ),
    stat_nat AS (
        SELECT f_nat AS f, min(o_custkey) lo_a, max(o_custkey) hi_a,
               min(d) lo_b, max(d) hi_b, max(mc) mc, max(md) md
        FROM laid GROUP BY 1
    ),
    stat_z AS (
        SELECT f_z AS f, min(o_custkey) lo_a, max(o_custkey) hi_a,
               min(d) lo_b, max(d) hi_b, max(mc) mc, max(md) md
        FROM laid GROUP BY 1
    )
    SELECT * FROM (
        SELECT 'natural' AS layout,
               CAST(count(*) AS BIGINT) AS n_files,
               CAST(sum(CASE WHEN {hit} THEN 1 ELSE 0 END) AS BIGINT)
                   AS files_scanned,
               CAST((2 * sum(CASE WHEN {hit} THEN 1 ELSE 0 END) * 1000000
                     + count(*)) // (2 * count(*)) AS BIGINT)
                   AS scan_share_ppm
        FROM stat_nat
        UNION ALL
        SELECT 'zorder', CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN {hit} THEN 1 ELSE 0 END) AS BIGINT),
               CAST((2 * sum(CASE WHEN {hit} THEN 1 ELSE 0 END) * 1000000
                     + count(*)) // (2 * count(*)) AS BIGINT)
        FROM stat_z
    ) ORDER BY layout
"""


ORACLES["profile_zorder_pruning_gain"] = _zorder_oracle()


# ---------------------------------------- shuffle salting balance

SALT_BUCKETS = 32
SALT_FACTOR = 16


def salting_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-balance planning audit for a low-cardinality join/agg
    key: hashing ``o_orderstatus`` (3 values) into ``SALT_BUCKETS``
    reducer buckets leaves ≥29 of 32 reducers idle and one carrying a
    third of the table — the partition-starvation face of skew; the
    same key salted with ``o_orderkey % SALT_FACTOR`` spreads across
    the reducer space and caps the max bucket near uniform.  This is
    the before/after table that justifies (or rejects) a salt: salting
    costs a second aggregation stage to de-salt, so the max-bucket drop
    must pay for it.

    Exactness: buckets are md5-derived 60-bit integers mod
    ``SALT_BUCKETS`` — deterministic and identical cross-engine (never
    the engines' own hash functions, which differ).  Scale: two
    map-side-combinable aggregates over one scan; output 2 rows.
    """
    o = load_table(spark, sf_dir, "orders").selectExpr(
        "o_orderstatus AS k", f"o_orderkey % {SALT_FACTOR} AS salt"
    )
    outs = []
    for strategy, keyexpr in (
        ("raw", "k"),
        ("salted", "concat(k, ':', CAST(salt AS STRING))"),
    ):
        bucket = (
            f"CAST(conv(substring(md5({keyexpr}), 1, 15), 16, 10)"
            f" AS BIGINT) % {SALT_BUCKETS}"
        )
        outs.append(
            o.selectExpr(f"{bucket} AS b")
            .groupBy("b")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(
                F.count(F.lit(1)).alias("used"),
                F.max("n").alias("mx"),
                F.sum("n").alias("total"),
            )
            .selectExpr(
                f"'{strategy}' AS strategy",
                f"CAST({SALT_BUCKETS} AS BIGINT) AS n_buckets",
                "CAST(used AS BIGINT) AS buckets_used",
                "CAST(mx AS BIGINT) AS max_bucket_rows",
                "CAST(total AS BIGINT) AS total_rows",
                "(2 * mx * 1000000 + total) DIV (2 * total)"
                " AS max_share_ppm",
                f"(2 * used * 1000000 + {SALT_BUCKETS})"
                f" DIV (2 * {SALT_BUCKETS}) AS reducer_use_ppm",
            )
        )
    return outs[0].unionByName(outs[1]).orderBy("strategy")


QUERIES["profile_salting_balance"] = salting_balance

ORACLES["profile_salting_balance"] = f"""
    WITH o AS (
        SELECT o_orderstatus AS k,
               o_orderkey % {SALT_FACTOR} AS salt
        FROM orders
    ),
    raw AS (
        SELECT ('0x' || substr(md5(k), 1, 15))::BIGINT % {SALT_BUCKETS}
                   AS b, count(*) AS n
        FROM o GROUP BY 1
    ),
    salted AS (
        SELECT ('0x' || substr(md5(k || ':' || CAST(salt AS VARCHAR)),
                1, 15))::BIGINT % {SALT_BUCKETS} AS b, count(*) AS n
        FROM o GROUP BY 1
    )
    SELECT * FROM (
        SELECT 'raw' AS strategy,
               CAST({SALT_BUCKETS} AS BIGINT) AS n_buckets,
               CAST(count(*) AS BIGINT) AS buckets_used,
               CAST(max(n) AS BIGINT) AS max_bucket_rows,
               CAST(sum(n) AS BIGINT) AS total_rows,
               CAST((2 * max(n) * 1000000 + sum(n)) // (2 * sum(n))
                    AS BIGINT) AS max_share_ppm,
               CAST((2 * count(*) * 1000000 + {SALT_BUCKETS})
                    // (2 * {SALT_BUCKETS}) AS BIGINT)
                   AS reducer_use_ppm
        FROM raw
        UNION ALL
        SELECT 'salted', CAST({SALT_BUCKETS} AS BIGINT),
               CAST(count(*) AS BIGINT), CAST(max(n) AS BIGINT),
               CAST(sum(n) AS BIGINT),
               CAST((2 * max(n) * 1000000 + sum(n)) // (2 * sum(n))
                    AS BIGINT),
               CAST((2 * count(*) * 1000000 + {SALT_BUCKETS})
                    // (2 * {SALT_BUCKETS}) AS BIGINT)
        FROM salted
    ) ORDER BY strategy
"""


# ---------------------------------------- file compaction planner

#: Target output-file size for compaction, in (estimated) bytes.
#: Real lakehouses target 128 MB–1 GB; the estimator below prices a row
#: at a few dozen bytes, so 8 KiB stands in at fixture scale the same
#: way every other constant in this module is SF-scaled.
COMPACT_TARGET_BYTES = 8192
COMPACT_SMALL_FRAC = 2  # a file under TARGET/2 counts as "small"


def compaction_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction plan — the OPTIMIZE/maintenance table a
    lakehouse owner reads before rewriting a partition: per month
    partition of ``orders``, the current file count under the modeled
    ingest layout (one file per order-date day — how streaming ingest
    actually lands), the estimated partition bytes, the target file
    count at ``COMPACT_TARGET_BYTES``, and the before/after mean file
    size with a small-files verdict.  The 100 TB story: metadata
    pressure (file listing, task scheduling) is proportional to file
    count, and a day-grain ingest leaves thousands of KB-sized files
    that one monthly compaction pass collapses ~30×.

    Determinism: bytes are estimated from integer/string widths only
    (fixed 24-byte row overhead + key/status/priority string lengths) —
    no DOUBLE→string formatting, which differs across engines.  Scale
    shape: one scan, one map-side-combinable aggregate on the partition
    key; output is |partitions| rows.
    """
    o = load_table(spark, sf_dir, "orders")
    row_bytes = (
        F.lit(24)
        + F.octet_length(F.col("o_orderkey").cast("string"))
        + F.octet_length("o_orderstatus")
        + F.octet_length("o_orderpriority")
    ).cast("long")
    p = (
        o.select(
            F.date_format("o_orderdate", "yyyy-MM").alias("part_month"),
            F.to_date("o_orderdate").alias("d"),
            row_bytes.alias("b"),
        )
        .groupBy("part_month")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("d").alias("files_now"),
            F.sum("b").alias("est_bytes"),
        )
    )
    t = COMPACT_TARGET_BYTES
    return p.selectExpr(
        "part_month",
        "CAST(n_rows AS BIGINT) AS n_rows",
        "CAST(files_now AS BIGINT) AS files_now",
        "CAST(est_bytes AS BIGINT) AS est_bytes",
        f"greatest(1L, (est_bytes + {t - 1}) DIV {t}) AS files_target",
        "est_bytes DIV files_now AS avg_file_bytes_now",
        f"est_bytes DIV greatest(1L, (est_bytes + {t - 1}) DIV {t})"
        " AS avg_file_bytes_after",
        f"CAST(IF(est_bytes DIV files_now < {t // COMPACT_SMALL_FRAC},"
        " 1, 0) AS BIGINT) AS is_small_now",
    ).orderBy("part_month")


QUERIES["profile_compaction_planner"] = compaction_planner

ORACLES["profile_compaction_planner"] = f"""
    WITH r AS (
        SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m')
                   AS part_month,
               CAST(o_orderdate AS DATE) AS d,
               24 + strlen(CAST(o_orderkey AS VARCHAR))
                  + strlen(o_orderstatus)
                  + strlen(o_orderpriority) AS b
        FROM orders
    ),
    p AS (
        SELECT part_month, count(*) AS n_rows,
               count(DISTINCT d) AS files_now, sum(b) AS est_bytes
        FROM r GROUP BY part_month
    )
    SELECT part_month,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST(files_now AS BIGINT) AS files_now,
           CAST(est_bytes AS BIGINT) AS est_bytes,
           CAST(greatest(1, (est_bytes + {COMPACT_TARGET_BYTES - 1})
                // {COMPACT_TARGET_BYTES}) AS BIGINT) AS files_target,
           CAST(est_bytes // files_now AS BIGINT) AS avg_file_bytes_now,
           CAST(est_bytes // greatest(1,
                (est_bytes + {COMPACT_TARGET_BYTES - 1})
                // {COMPACT_TARGET_BYTES}) AS BIGINT)
               AS avg_file_bytes_after,
           CAST(CASE WHEN est_bytes // files_now
                          < {COMPACT_TARGET_BYTES // COMPACT_SMALL_FRAC}
                THEN 1 ELSE 0 END AS BIGINT) AS is_small_now
    FROM p ORDER BY part_month
"""


# ---------------------------------------- bloom filter planner

import math as _math

#: Target false-positive rates priced by the planner, in ppm.
BLOOM_TARGET_FPR_PPM = (10000, 1000, 100)  # 1%, 0.1%, 0.01%

# Frozen nano-unit constants: bits-per-key C_p = -ln p / (ln 2)^2 and
# ln 2 — Python-stdlib literals baked into BOTH plans (the SPRT/BH
# device), so the sizing arithmetic is pure integer in each engine.
_BLOOM_C_NANO = {
    p: int(round(-_math.log(p / 1e6) / (_math.log(2) ** 2) * 1e9))
    for p in BLOOM_TARGET_FPR_PPM
}
_LN2_NANO = int(round(_math.log(2) * 1e9))


def bloom_size_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter sizing table: for the bloom-semi-join build side
    (URGENT high-value orders — the filter [[bloom_semi_join_revenue]]
    actually ships), the optimal bit count m = ceil(n·(−ln p)/(ln 2)²)
    and hash count k = round((m/n)·ln 2) at each target FPR — the
    planning arithmetic every bloom deployment runs, priced against
    the REAL key count n from the data rather than a guess.
    [[bloom_fpr_audit]] then validates the built filter empirically;
    this is its a-priori twin.

    Scale shape: one count aggregate over the build-side scan (n is
    the only data input), then |targets| rows of frozen-literal
    integer arithmetic stacked by a 1-row inline.
    """
    o = load_table(spark, sf_dir, "orders")
    n = o.filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_totalprice") > 150000.0)
    ).agg(F.count(F.lit(1)).alias("n"))
    cells = []
    for p in BLOOM_TARGET_FPR_PPM:
        c = _BLOOM_C_NANO[p]
        m = f"(n * {c} + 999999999) DIV 1000000000"
        cells.append(
            f"named_struct('p', {p}L, 'm', {m},"
            f" 'k', greatest(1L, (2 * ({m}) * {_LN2_NANO}"
            f" + n * 1000000000) DIV (2 * n * 1000000000)))"
        )
    return (
        n.selectExpr("n", f"inline(array({', '.join(cells)}))")
        .selectExpr(
            "CAST(p AS BIGINT) AS target_fpr_ppm",
            "CAST(n AS BIGINT) AS n_keys",
            "CAST(m AS BIGINT) AS m_bits",
            "CAST(k AS BIGINT) AS k_hashes",
            "(m + 7) DIV 8 AS filter_bytes",
            "(2 * m * 1000 + n) DIV (2 * n) AS bits_per_key_milli",
        )
        .orderBy(F.col("target_fpr_ppm").desc())
    )


QUERIES["profile_bloom_size_planner"] = bloom_size_planner

_BLOOM_CELLS_SQL = " UNION ALL ".join(
    f"""SELECT {p} AS p,
        (n * {_BLOOM_C_NANO[p]} + 999999999) // 1000000000 AS m,
        greatest(1, (2 * ((n * {_BLOOM_C_NANO[p]} + 999999999)
                          // 1000000000) * {_LN2_NANO}
                     + n * 1000000000) // (2 * n * 1000000000)) AS k,
        n FROM base"""
    for p in BLOOM_TARGET_FPR_PPM
)

ORACLES["profile_bloom_size_planner"] = f"""
    WITH base AS (
        SELECT count(*) AS n FROM orders
        WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 150000.0
    )
    SELECT CAST(p AS BIGINT) AS target_fpr_ppm,
           CAST(n AS BIGINT) AS n_keys,
           CAST(m AS BIGINT) AS m_bits,
           CAST(k AS BIGINT) AS k_hashes,
           CAST((m + 7) // 8 AS BIGINT) AS filter_bytes,
           CAST((2 * m * 1000 + n) // (2 * n) AS BIGINT)
               AS bits_per_key_milli
    FROM ({_BLOOM_CELLS_SQL}) ORDER BY target_fpr_ppm DESC
"""


# ------------------------------------ join cardinality audit

#: (label, left table, right table, join key column per side)
JOIN_AUDIT_PAIRS = (
    ("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
    # non-key join: the uniformity assumption actually errs here —
    # the audit must show a mis-estimate somewhere to mean anything
    ("date_collision", "orders", "o_orderdate", "lineitem", "l_shipdate"),
)


def join_cardinality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CBO join-size estimator audit: for the three workhorse key
    joins, the textbook estimate |R⋈S| = |R|·|S| / max(ndv_R, ndv_S)
    against the TRUE join cardinality, with the error ratio — the
    statistic a cost-based optimizer's selectivity model lives or dies
    by ([[profile_cross_column_ndv]] showed where independence fails
    WITHIN a table; this prices the same assumption ACROSS tables,
    where a mis-estimate flips a broadcast decision at 100 TB).

    Scale shape: ONE projected scan per table, materialized once and
    read by every role the table plays (lineitem appears in three
    pairs and was scanned five times in the per-pair shape; orders in
    three); per table ONE aggregate computes the row count and every
    audited column's exact NDV (multi-distinct plans as one Expand —
    same shuffle volume as the distinct legs it replaces); each pair's
    true cardinality is a count-only key join over the materialized
    key columns (the exchange carries 8 bytes/row); four 1-row cells
    union.
    """
    # columns each table contributes, in audit order
    cols_by_table: dict[str, list[str]] = {}
    roles = []  # (label, lt, lk, rt, rk) with resolved frames below
    for label, lt, lk, rt, rk in JOIN_AUDIT_PAIRS:
        for t, c in ((lt, lk), (rt, rk)):
            cols_by_table.setdefault(t, [])
            if c not in cols_by_table[t]:
                cols_by_table[t].append(c)
        roles.append((label, lt, lk, rt, rk))
    frames: dict[str, DataFrame] = {}
    stats: dict[str, DataFrame] = {}
    for t, cols in cols_by_table.items():
        proj = load_table(spark, sf_dir, t).select(*cols)
        # materialize once when the table plays more than one role
        # (its key columns are read by the stats aggregate AND by one
        # join per pair); single-role tables stay plain scans
        n_roles = sum(
            1 for _, lt, _, rt, _ in roles for x in (lt, rt) if x == t
        )
        # cache(), not localCheckpoint(): the checkpoint materializes
        # as its own job BEFORE any consumer starts, serializing the
        # critical path (measured: two sequential 0.45 s
        # materialization jobs); cache populates lazily inside the
        # first consuming job, so the four pair branches keep running
        # concurrently and back-fill cores
        if n_roles > 1:
            proj = proj.cache()
        frames[t] = proj
        st = proj.agg(
            F.count(F.lit(1)).alias("n"),
            *[F.countDistinct(c).alias(f"d_{c}") for c in cols],
        )
        if n_roles > 1:
            # the 1-row stats frame is read once per pair the table
            # appears in; without the barrier each read re-runs the
            # multi-distinct Expand aggregate
            st = st.cache()
        stats[t] = st
    outs = []
    for label, lt, lk, rt, rk in roles:
        actual = (
            frames[lt]
            .select(F.col(lk).alias("k"))
            .join(frames[rt].select(F.col(rk).alias("k")), "k")
            .agg(F.count(F.lit(1)).alias("actual"))
        )
        ls = stats[lt].select(
            F.col("n").alias("n1"), F.col(f"d_{lk}").alias("d1")
        )
        rs = stats[rt].select(
            F.col("n").alias("n2"), F.col(f"d_{rk}").alias("d2")
        )
        outs.append(
            ls.crossJoin(F.broadcast(rs))
            .crossJoin(F.broadcast(actual))
            .selectExpr(
                f"'{label}' AS join_pair",
                "CAST(n1 AS BIGINT) AS n_left",
                "CAST(n2 AS BIGINT) AS n_right",
                "CAST(greatest(d1, d2) AS BIGINT) AS max_ndv",
                "n1 * n2 DIV greatest(d1, d2) AS est_rows",
                "CAST(actual AS BIGINT) AS actual_rows",
                "CASE WHEN actual = 0 THEN NULL ELSE"
                " (2 * (n1 * n2 DIV greatest(d1, d2)) * 1000000"
                "  + actual) DIV (2 * actual) END AS est_over_actual_ppm",
            )
        )
    merged = outs[0]
    for o in outs[1:]:
        merged = merged.unionByName(o)
    return merged.orderBy("join_pair")


QUERIES["profile_join_cardinality_audit"] = join_cardinality_audit

_JCA_CELLS = " UNION ALL ".join(
    f"""SELECT '{label}' AS join_pair,
        (SELECT count(*) FROM {lt}) AS n_left,
        (SELECT count(*) FROM {rt}) AS n_right,
        greatest((SELECT count(DISTINCT {lk}) FROM {lt}),
                 (SELECT count(DISTINCT {rk}) FROM {rt})) AS max_ndv,
        (SELECT count(*) FROM {lt} a JOIN {rt} b
         ON a.{lk} = b.{rk}) AS actual"""
    for label, lt, lk, rt, rk in JOIN_AUDIT_PAIRS
)

ORACLES["profile_join_cardinality_audit"] = f"""
    SELECT join_pair,
           CAST(n_left AS BIGINT) AS n_left,
           CAST(n_right AS BIGINT) AS n_right,
           CAST(max_ndv AS BIGINT) AS max_ndv,
           CAST(n_left * n_right // max_ndv AS BIGINT) AS est_rows,
           CAST(actual AS BIGINT) AS actual_rows,
           CAST(CASE WHEN actual = 0 THEN NULL ELSE
               (2 * (n_left * n_right // max_ndv) * 1000000 + actual)
               // (2 * actual) END AS BIGINT) AS est_over_actual_ppm
    FROM ({_JCA_CELLS}) ORDER BY join_pair
"""


# --------------------------------------- cluster job-config planner

#: Split / shuffle / output sizing targets (bytes).  SPLIT matches
#: Spark's spark.sql.files.maxPartitionBytes default (128 MiB); the
#: shuffle target sits at 100 MiB — the classic "keep a shuffle
#: partition comfortably inside executor memory after ser/deser
#: amplification" guidance; output files target 1 GiB (the
#: scan-efficiency sweet spot the compaction planner also uses);
#: BROADCAST matches spark.sql.autoBroadcastJoinThreshold's 10 MiB.
PLAN_SPLIT_BYTES = 134_217_728
PLAN_SHUFFLE_BYTES = 104_857_600
PLAN_OUT_FILE_BYTES = 1_073_741_824
PLAN_BROADCAST_BYTES = 10_485_760
PLAN_MIN_PARALLELISM = 32  # one task per core on the modeled executor
PLAN_SCALE_X = 1000        # the "at deployment scale" column


def shuffle_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Job-config planner — the table an operator sets
    ``spark.sql.shuffle.partitions`` / ``maxPartitionBytes`` from
    before pointing this catalog at the full corpus: per fact table,
    the modeled data size, the scan-split and shuffle-partition counts
    at the standard sizing targets, the output file count at the 1 GiB
    target, whether the table fits under the broadcast threshold, and
    the same shuffle sizing at ``PLAN_SCALE_X``× — the 100 TB column
    that says which of today's defaults stop working (a 60 k-row
    fixture table and its 1000× replica share every plan in this repo;
    the partition COUNTS are what change, and this is the operator
    that prices them).  Complements the layout planners: compaction
    prices file maintenance, bloom prices filter bits, this prices the
    job config.

    Determinism: bytes are modeled from fixed type widths (8 B
    numerics/timestamps, 4 B ints/floats) plus exact string/array
    octet lengths — the same integer-only device as
    ``compaction_planner``; every output is integer arithmetic on
    those sums (ceiling divisions, greatest).  Scale shape: one
    narrow map + one 1-row aggregate per table, unioned — |tables|
    rows out; nothing shuffles but the five scalar rows."""
    models = {
        "documents": (
            "documents",
            F.lit(16)
            + F.octet_length("text")
            + F.octet_length("lang")
            + F.octet_length("source"),
        ),
        "embeddings": (
            "embeddings",
            F.lit(12) + F.lit(4) * F.size("embedding"),
        ),
        "events": (
            "events",
            F.lit(32)
            + F.octet_length("event_type")
            + F.octet_length("props"),
        ),
        "lineitem": (
            "lineitem",
            F.lit(68)
            + F.octet_length("l_returnflag")
            + F.octet_length("l_linestatus"),
        ),
        "orders": (
            "orders",
            F.lit(32)
            + F.octet_length("o_orderstatus")
            + F.octet_length("o_orderpriority"),
        ),
    }
    outs = []
    for name in sorted(models):
        tbl, width = models[name]
        outs.append(
            load_table(spark, sf_dir, tbl)
            .select(width.cast("long").alias("b"))
            .agg(
                F.lit(name).alias("table_name"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("b").alias("est_bytes"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    sp, sh, of, bc, mp, k = (
        PLAN_SPLIT_BYTES,
        PLAN_SHUFFLE_BYTES,
        PLAN_OUT_FILE_BYTES,
        PLAN_BROADCAST_BYTES,
        PLAN_MIN_PARALLELISM,
        PLAN_SCALE_X,
    )
    return out.selectExpr(
        "table_name",
        "CAST(n_rows AS BIGINT) AS n_rows",
        "CAST(est_bytes AS BIGINT) AS est_bytes",
        f"(est_bytes + {sp - 1}) DIV {sp} AS scan_splits",
        f"greatest({mp}L, (est_bytes + {sh - 1}) DIV {sh})"
        " AS shuffle_partitions",
        f"greatest(1L, (est_bytes + {of - 1}) DIV {of}) AS out_files",
        f"CAST(est_bytes <= {bc} AS LONG) AS broadcast_ok",
        f"greatest({mp}L, ({k} * est_bytes + {sh - 1}) DIV {sh})"
        f" AS shuffle_partitions_{k}x",
    ).orderBy("table_name")


QUERIES["profile_shuffle_plan"] = shuffle_plan


def _shuffle_plan_oracle() -> str:
    models = {
        "documents": (
            "documents",
            "16 + strlen(text) + strlen(lang)"
            " + strlen(source)",
        ),
        "embeddings": ("embeddings", "12 + 4 * len(embedding)"),
        "events": (
            "events",
            "32 + strlen(event_type) + strlen(props)",
        ),
        "lineitem": (
            "lineitem",
            "68 + strlen(l_returnflag)"
            " + strlen(l_linestatus)",
        ),
        "orders": (
            "orders",
            "32 + strlen(o_orderstatus)"
            " + strlen(o_orderpriority)",
        ),
    }
    parts = [
        f"""SELECT '{name}' AS table_name, count(*) AS n_rows,
               sum({expr}) AS est_bytes FROM {tbl}"""
        for name, (tbl, expr) in sorted(models.items())
    ]
    sp, sh, of, bc, mp, k = (
        PLAN_SPLIT_BYTES,
        PLAN_SHUFFLE_BYTES,
        PLAN_OUT_FILE_BYTES,
        PLAN_BROADCAST_BYTES,
        PLAN_MIN_PARALLELISM,
        PLAN_SCALE_X,
    )
    return f"""
    SELECT table_name,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST(est_bytes AS BIGINT) AS est_bytes,
           CAST((est_bytes + {sp - 1}) // {sp} AS BIGINT) AS scan_splits,
           CAST(greatest({mp}, (est_bytes + {sh - 1}) // {sh})
                AS BIGINT) AS shuffle_partitions,
           CAST(greatest(1, (est_bytes + {of - 1}) // {of})
                AS BIGINT) AS out_files,
           CAST(CASE WHEN est_bytes <= {bc} THEN 1 ELSE 0 END
                AS BIGINT) AS broadcast_ok,
           CAST(greatest({mp}, ({k} * est_bytes + {sh - 1}) // {sh})
                AS BIGINT) AS shuffle_partitions_{k}x
    FROM ({" UNION ALL ".join(parts)})
    ORDER BY table_name
    """


ORACLES["profile_shuffle_plan"] = _shuffle_plan_oracle()


# --------------------------------------------- cross-run drift audit

#: Relative-drift flag floor (ppm): 0.2 % — generous against the planted
#: perturbations (2–20 %) while unperturbed stats sit at EXACTLY 0
#: (the comparison is between deterministic integer fingerprints, so
#: there is no sampling noise to absorb).
DRIFT_PPM_MIN = 2000


def perturb_events(ev: DataFrame) -> DataFrame:
    """The deterministic P1/P2 events perturbation (md5-keyed "second
    run"): ~2 % of 'click' rows dropped, ~4 % of 'purchase' values
    nulled.  A pure row transformation on (event_id, event_type,
    value), so it applies identically to a snapshot scan and to a
    STREAMING frame at ingest — the two-fingerprint streaming drift
    twin perturbs its second stream with exactly this function."""
    he = F.pmod(
        F.conv(
            F.substring(F.md5(F.col("event_id").cast("string")), 1, 15),
            16,
            10,
        ).cast("long"),
        F.lit(100),
    )
    return ev.filter(
        ~((F.col("event_type") == "click") & (he % 50 == 0))
    ).withColumn(
        "value",
        F.when(
            (F.col("event_type") == "purchase") & (he % 25 == 0),
            F.lit(None).cast("double"),
        ).otherwise(F.col("value")),
    )


def drift_fingerprint(
    spark: SparkSession, sf_dir: str, perturbed: bool = False
) -> DataFrame:
    """Per-(table, segment, stat) integer fingerprint of a corpus
    snapshot — the table a deployment persists per ingest run so two
    runs can be diffed without rescanning either (VERDICT r8 task 6 /
    round-9 queue #2).  Stats are integer-exact by construction (counts,
    half-add null ppm, money-cents sums, char sums), so a diff of two
    fingerprints of the SAME data is exactly zero and any nonzero drift
    is real.

    ``perturbed`` synthesizes the "second run" as a deterministic
    md5-keyed perturbation of the same snapshot — NOT a different SF
    (diffing SFs conflates volume with drift):

    - P1 events: ~2 % of 'click' rows dropped (ingest loss);
    - P2 events: ~4 % of 'purchase' values nulled (schema regression);
    - P3 documents: ~20 % of 'src7' docs dropped (one source's feed
      breaking).
    """
    from ..tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    if perturbed:
        ev = perturb_events(ev)
        hd = F.pmod(
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
                16,
                10,
            ).cast("long"),
            F.lit(100),
        )
        docs = docs.filter(
            ~((F.col("source") == "src7") & (hd % 5 == 0))
        )
    cents = F.round(F.col("value") * 100).cast("long")
    ev_fp = (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").isNull().cast("long")).alias("n_null"),
            F.sum(F.coalesce(cents, F.lit(0))).alias("sum_cents"),
        )
        .selectExpr(
            "'events' AS tbl",
            "event_type AS seg",
            "inline(array("
            "named_struct('stat', 'n', 'val', n),"
            "named_struct('stat', 'null_value_ppm',"
            " 'val', (2 * n_null * 1000000 + n) DIV (2 * n)),"
            "named_struct('stat', 'sum_cents', 'val', sum_cents)))",
        )
    )
    doc_fp = (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("n_chars").cast("long")).alias("sum_chars"),
        )
        .selectExpr(
            "'documents' AS tbl",
            "source AS seg",
            "inline(array("
            "named_struct('stat', 'n', 'val', n),"
            "named_struct('stat', 'sum_chars', 'val', sum_chars)))",
        )
    )
    return ev_fp.unionByName(doc_fp)


def snapshot_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-run drift table: the full (table, segment, stat) diff of
    two snapshot fingerprints with the relative drift in ppm and the
    flag a pipeline pages on.  The "second run" is the deterministic
    planted perturbation (see :func:`drift_fingerprint`), so the
    expected flag set is known exactly: the click row-drop flags
    (n, sum_cents), the purchase null-injection flags (null_value_ppm,
    sum_cents), the src7 feed-break flags (n, sum_chars) — and nothing
    else, because unperturbed integer stats diff to exactly zero.

    Scale shape: each fingerprint is one map-side-combinable aggregate
    per table (output bounded by |segments| × |stats|, a catalog-grain
    constant); the diff is a full-outer join of two tiny frames.  At
    100 TB the fingerprints are persisted per run and ONLY the diff
    runs at read time — this query prices the whole harness end to
    end."""
    old = drift_fingerprint(spark, sf_dir, perturbed=False).selectExpr(
        "tbl", "seg", "stat", "val AS old_val"
    )
    new = drift_fingerprint(spark, sf_dir, perturbed=True).selectExpr(
        "tbl", "seg", "stat", "val AS new_val"
    )
    j = old.join(new, ["tbl", "seg", "stat"], "full_outer").selectExpr(
        "tbl",
        "seg",
        "stat",
        "coalesce(old_val, 0L) AS old_val",
        "coalesce(new_val, 0L) AS new_val",
    )
    return (
        j.selectExpr(
            "tbl",
            "seg",
            "stat",
            "old_val",
            "new_val",
            "CASE WHEN old_val = new_val THEN 0L"
            " WHEN old_val = 0 THEN 1000000L"
            " ELSE (2 * abs(new_val - old_val) * 1000000 + abs(old_val))"
            " DIV (2 * abs(old_val)) END AS drift_ppm",
        )
        .selectExpr(
            "tbl",
            "seg",
            "stat",
            "old_val",
            "new_val",
            "drift_ppm",
            f"drift_ppm >= {DRIFT_PPM_MIN} AS flagged",
        )
        .orderBy("tbl", "seg", "stat")
    )


QUERIES["profile_snapshot_drift"] = snapshot_drift

_DRIFT_H = "('0x' || substr(md5(CAST({id} AS VARCHAR)), 1, 15))::BIGINT % 100"

ORACLES["profile_snapshot_drift"] = f"""
    WITH ev_p AS (
        SELECT event_type,
               CASE WHEN event_type = 'purchase'
                         AND ({_DRIFT_H.format(id="event_id")}) % 25 = 0
                    THEN NULL ELSE value END AS value
        FROM events
        WHERE NOT (event_type = 'click'
                   AND ({_DRIFT_H.format(id="event_id")}) % 50 = 0)
    ),
    docs_p AS (
        SELECT source, n_chars FROM documents
        WHERE NOT (source = 'src7'
                   AND ({_DRIFT_H.format(id="doc_id")}) % 5 = 0)
    ),
    fp_old AS (
        SELECT 'events' AS tbl, event_type AS seg, s.stat, s.val
        FROM (
            SELECT event_type, count(*) AS n,
                   sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS n_null,
                   coalesce(sum(CAST(ROUND(value * 100) AS BIGINT)), 0)
                       AS sum_cents
            FROM events GROUP BY 1
        ), unnest([
            {{'stat': 'n', 'val': n}},
            {{'stat': 'null_value_ppm',
              'val': (2 * n_null * 1000000 + n) // (2 * n)}},
            {{'stat': 'sum_cents', 'val': sum_cents}}]) AS u(s)
        UNION ALL
        SELECT 'documents', source, s.stat, s.val
        FROM (
            SELECT source, count(*) AS n,
                   sum(CAST(n_chars AS BIGINT)) AS sum_chars
            FROM documents GROUP BY 1
        ), unnest([
            {{'stat': 'n', 'val': n}},
            {{'stat': 'sum_chars', 'val': sum_chars}}]) AS u(s)
    ),
    fp_new AS (
        SELECT 'events' AS tbl, event_type AS seg, s.stat, s.val
        FROM (
            SELECT event_type, count(*) AS n,
                   sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS n_null,
                   coalesce(sum(CAST(ROUND(value * 100) AS BIGINT)), 0)
                       AS sum_cents
            FROM ev_p GROUP BY 1
        ), unnest([
            {{'stat': 'n', 'val': n}},
            {{'stat': 'null_value_ppm',
              'val': (2 * n_null * 1000000 + n) // (2 * n)}},
            {{'stat': 'sum_cents', 'val': sum_cents}}]) AS u(s)
        UNION ALL
        SELECT 'documents', source, s.stat, s.val
        FROM (
            SELECT source, count(*) AS n,
                   sum(CAST(n_chars AS BIGINT)) AS sum_chars
            FROM docs_p GROUP BY 1
        ), unnest([
            {{'stat': 'n', 'val': n}},
            {{'stat': 'sum_chars', 'val': sum_chars}}]) AS u(s)
    ),
    j AS (
        SELECT coalesce(o.tbl, n.tbl) AS tbl,
               coalesce(o.seg, n.seg) AS seg,
               coalesce(o.stat, n.stat) AS stat,
               coalesce(o.val, 0) AS old_val,
               coalesce(n.val, 0) AS new_val
        FROM fp_old o FULL OUTER JOIN fp_new n
          ON o.tbl = n.tbl AND o.seg = n.seg AND o.stat = n.stat
    ),
    d AS (
        SELECT tbl, seg, stat, old_val, new_val,
               CASE WHEN old_val = new_val THEN 0
                    WHEN old_val = 0 THEN 1000000
                    ELSE (2 * abs(new_val - old_val) * 1000000
                          + abs(old_val)) // (2 * abs(old_val))
               END AS drift_ppm
        FROM j
    )
    SELECT tbl, seg, stat,
           CAST(old_val AS BIGINT) AS old_val,
           CAST(new_val AS BIGINT) AS new_val,
           CAST(drift_ppm AS BIGINT) AS drift_ppm,
           drift_ppm >= {DRIFT_PPM_MIN} AS flagged
    FROM d ORDER BY tbl, seg, stat
"""
