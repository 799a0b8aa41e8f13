"""Deterministic cardinality sketches.

KMV (k-minimum-values) distinct-count estimation [Bar-Yossef et al. 2002,
"Counting distinct elements in a data stream"]: hash every element to
[0, 2^60) and keep the k smallest distinct hash values; if the kth
smallest (normalized) is h_k, the estimate is (k-1)/h_k. This is the
estimator family behind approx_count_distinct, but built from md5 so
Spark, DuckDB and Python compute bit-identical results — which makes an
*approximate* operator exactly oracle-checkable (same estimate, same
error, on every engine).

Scale design: the expensive part is `distinct hash per group`, one
shuffle with map-side partial dedup; the k-smallest selection is a
window row_number over groups bounded at k rows each. At 100 TB the
same plan holds — the sketch state per group is k longs, and the
distinct-before-rank keeps the window input tiny. (Spark's native
approx_count_distinct/HLL is the zero-window alternative; traded here
for cross-engine determinism, same tradeoff as value_percentiles.)

The reference has no sketches — its only aggregates are max()/count()
watermark reads (SURVEY §2.4, warehouse/redshift.go:308-315). This is
part of the beyond-reference analytics surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_table, values_df

K = 64
HASH_SPAN = float(1 << 60)  # md5-prefix hash domain: [0, 2^60)


def _h60(col: F.Column) -> F.Column:
    """60-bit md5-derived hash, identical in Spark and DuckDB."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10)
        .cast("long")
    )


def kmv_distinct_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-event_id estimate per event_type, with the exact
    count and relative error alongside (the estimate is deterministic, so
    the error is too)."""
    ev = load_table(spark, sf_dir, "events")
    hashes = ev.select(
        "event_type", _h60(F.col("event_id")).alias("h")
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    topk = hashes.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= K
    )
    per = topk.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_seen"), F.max("h").alias("kth")
    )
    est = F.when(F.col("n_seen") < K, F.col("n_seen").cast("double")).otherwise(
        F.lit((K - 1) * HASH_SPAN) / F.col("kth")
    )
    # exact side = count of the SAME distinct-hash set, not a separate
    # countDistinct over events — that avoided distinct-expand was the
    # query's dominant cost (measured 2.9s -> 1.3s at sf0.1).
    # (60-bit hashes: a collision would undercount by 1 with p ~ n²/2^61;
    # deterministic on fixed data and oracle-checked at every SF.)
    exact = hashes.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_exact")
    )
    return (
        per.join(exact, "event_type")
        .select(
            "event_type",
            "n_exact",
            F.round(est, 4).alias("n_est"),
            F.round((est - F.col("n_exact")) / F.col("n_exact"), 6).alias(
                "rel_err"
            ),
        )
        .orderBy("event_type")
    )


# -------------------------------------------------------- count-min sketch

CMS_W = 256  # buckets per row
CMS_D = 4  # hash rows (salted md5)
CMS_TOP = 20


def _cms_bucket(r: int, col: F.Column) -> F.Column:
    """Row-r bucket: salted 60-bit md5 hash mod W."""
    return F.pmod(_h60(F.concat(F.lit(f"{r}:"), col)), F.lit(CMS_W))


def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch [Cormode & Muthukrishnan 2005] frequency
    estimates for the corpus' top tokens, with exact counts alongside.

    The sketch is D salted-hash rows × W buckets = a fixed D·W-cell
    state no matter how many tokens stream through — the point of the
    operator at 100 TB: the token stream is aggregated into ≤ D·W
    (row, bucket) partial counts map-side, the shuffle carries only
    those, and the resulting 1024-row sketch is broadcast back for the
    estimate join. Estimates are min-over-rows, so only collisions
    inflate them (one-sided error); md5 salting keeps every engine's
    sketch bit-identical, so the *approximation itself* is
    oracle-checked, not just the exact side."""
    docs = load_table(spark, sf_dir, "documents")
    from .text import tokens_col

    toks = docs.select(
        F.explode(tokens_col(F.col("text"))).alias("tok")
    )
    # Aggregate-then-sketch: the wordcount shuffle combines map-side, so
    # the sketch update hashes each DISTINCT token once with its weight
    # instead of md5-ing every token occurrence ×D (measured 4.0s → sub-1s
    # at sf0.1). Identical sketch by CMS mergeability (cell = Σ weights).
    exact = (
        toks.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_n")).cache()
    )
    rb = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("r"),
                    _cms_bucket(r, F.col("tok")).alias("bucket"),
                )
                for r in range(CMS_D)
            ]
        )
    ).alias("rb")
    cms = (
        exact.select("exact_n", rb)
        .select("rb.r", "rb.bucket", "exact_n")
        .groupBy("r", "bucket")
        .agg(F.sum("exact_n").alias("c"))
    )
    top = exact.orderBy(F.desc("exact_n"), F.asc("tok")).limit(CMS_TOP)
    lookup = top.select(
        "tok",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        _cms_bucket(r, F.col("tok")).alias("bucket"),
                    )
                    for r in range(CMS_D)
                ]
            )
        ).alias("rb"),
    ).select("tok", "exact_n", "rb.r", "rb.bucket")
    return (
        lookup.join(F.broadcast(cms), ["r", "bucket"])
        .groupBy("tok", "exact_n")
        .agg(F.min("c").alias("cms_n"))
        .select(
            "tok",
            "exact_n",
            "cms_n",
            (F.col("cms_n") - F.col("exact_n")).alias("overcount"),
        )
        .orderBy(F.desc("exact_n"), F.asc("tok"))
    )


def _cms_oracle() -> str:
    toks = r"regexp_split_to_array(lower(trim(text)), '\s+')"
    bucket = (
        lambda r: f"('0x' || substr(md5('{r}:' || tok), 1, 15))::BIGINT"
        f" % {CMS_W}"
    )
    rows_union = "\n            UNION ALL\n            ".join(
        f"SELECT {r} AS r, {bucket(r)} AS bucket FROM toks"
        for r in range(CMS_D)
    )
    lookup_union = "\n            UNION ALL\n            ".join(
        f"SELECT tok, exact_n, {r} AS r, {bucket(r)} AS bucket FROM top"
        for r in range(CMS_D)
    )
    return f"""
        WITH toks AS (
            SELECT unnest({toks}) AS tok FROM documents
        ),
        rows_ AS (
            {rows_union}
        ),
        cms AS (
            SELECT r, bucket, count(*) AS c FROM rows_ GROUP BY 1, 2
        ),
        exact AS (
            SELECT tok, count(*) AS exact_n FROM toks GROUP BY tok
        ),
        top AS (
            SELECT tok, exact_n FROM exact
            ORDER BY exact_n DESC, tok LIMIT {CMS_TOP}
        ),
        lookup AS (
            {lookup_union}
        )
        SELECT l.tok, l.exact_n, min(c.c) AS cms_n,
               min(c.c) - l.exact_n AS overcount
        FROM lookup l JOIN cms c ON c.r = l.r AND c.bucket = l.bucket
        GROUP BY l.tok, l.exact_n
        ORDER BY l.exact_n DESC, l.tok
    """




def kmv_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV set-operation estimates [Beyer et al. 2007, "On synopses for
    distinct-value estimation under multiset operations"] — the
    optimizer-stats use of sketches: estimate a join's key overlap
    WITHOUT joining.

    Two key sets (customers holding 'P'-status vs 'F'-status orders) are
    each reduced to distinct 60-bit hashes; the K smallest hashes of the
    *union* form one sketch, mergeable across any partitioning. From it:
    |A∪B| ~ (K-1)/h_k, Jaccard ~ fraction of sketch members present in
    both sides, |A∩B| ~ J·|A∪B|. At 100 TB each side collapses to K
    longs before anything meets — a per-table synopsis maintained at
    ingest answers "how big is this join" in O(K), which is exactly how
    engines size hash tables and pick join order. md5-derived hashes
    keep the sketch — and its error, reported against the exact counts
    computed alongside — bit-identical across engines.
    """
    orders = load_table(spark, sf_dir, "orders")

    # ONE scan + ONE per-key aggregate builds both sides' membership
    # flags (the previous per-side distinct frames were each evaluated
    # three times — hash stream, exact count, exact intersection join —
    # six scans and six distinct shuffles for the same information;
    # guide §2.4).  Checkpointed per invocation: the key frame is read
    # by the sketch pass and the exact-count pass.
    ab = (
        orders.filter(F.col("o_orderstatus").isin("P", "F"))
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(
            F.max(
                (F.col("o_orderstatus") == "P").cast("int")
            ).alias("in_a"),
            F.max(
                (F.col("o_orderstatus") == "F").cast("int")
            ).alias("in_b"),
        )
        .localCheckpoint(eager=False)
    )
    # groupBy(h) kept even though k is already distinct: the oracle
    # merges on the HASH, so a (vanishingly unlikely) md5 collision
    # between two keys must collapse here exactly as it does there
    sketch = (
        ab.select(_h60(F.col("k")).alias("h"), "in_a", "in_b")
        .groupBy("h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
        .orderBy("h")
        .limit(K)
    )
    stats = sketch.agg(
        F.count(F.lit(1)).alias("n_seen"),
        F.max("h").alias("kth"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("n_both"),
    )
    exact = ab.agg(
        F.sum("in_a").cast("long").alias("n_a"),
        F.sum("in_b").cast("long").alias("n_b"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("n_inter"),
    )
    u_est = F.when(
        F.col("n_seen") < K, F.col("n_seen").cast("double")
    ).otherwise(F.lit((K - 1) * HASH_SPAN) / F.col("kth"))
    j_est = F.col("n_both").cast("double") / F.col("n_seen")
    return stats.crossJoin(F.broadcast(exact)).select(
        "n_a",
        "n_b",
        "n_inter",
        F.round(u_est, 4).alias("union_est"),
        F.round(j_est, 6).alias("jaccard_est"),
        F.round(j_est * u_est, 4).alias("inter_est"),
        F.round(
            (j_est * u_est - F.col("n_inter")) / F.col("n_inter"), 6
        ).alias("inter_rel_err"),
    )


QUERIES = {
    "sketch_kmv_join_cardinality": kmv_join_cardinality,
    "sketch_kmv_distinct": kmv_distinct_per_type,
    "sketch_cms_heavy_hitters": cms_heavy_hitters,
}

ORACLES = {
    "sketch_kmv_join_cardinality": f"""
        WITH a AS (
            SELECT DISTINCT o_custkey AS k FROM orders
            WHERE o_orderstatus = 'P'
        ),
        b AS (
            SELECT DISTINCT o_custkey AS k FROM orders
            WHERE o_orderstatus = 'F'
        ),
        merged AS (
            SELECT h, max(in_a) AS in_a, max(in_b) AS in_b FROM (
                SELECT ('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 15))::BIGINT AS h,
                       1 AS in_a, 0 AS in_b FROM a
                UNION ALL
                SELECT ('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 15))::BIGINT,
                       0, 1 FROM b
            ) GROUP BY h
        ),
        sketch AS (SELECT * FROM merged ORDER BY h LIMIT {K}),
        stats AS (
            SELECT count(*) AS n_seen, max(h) AS kth,
                   sum(in_a * in_b) AS n_both
            FROM sketch
        ),
        exact AS (
            SELECT (SELECT count(*) FROM a) AS n_a,
                   (SELECT count(*) FROM b) AS n_b,
                   (SELECT count(*) FROM a JOIN b USING (k)) AS n_inter
        )
        SELECT n_a, n_b, n_inter,
               ROUND(CASE WHEN n_seen < {K} THEN CAST(n_seen AS DOUBLE)
                          ELSE {(K - 1) * HASH_SPAN!r} / kth END, 4)
                   AS union_est,
               ROUND(CAST(n_both AS DOUBLE) / n_seen, 6) AS jaccard_est,
               ROUND((CAST(n_both AS DOUBLE) / n_seen)
                     * (CASE WHEN n_seen < {K} THEN CAST(n_seen AS DOUBLE)
                             ELSE {(K - 1) * HASH_SPAN!r} / kth END), 4)
                   AS inter_est,
               ROUND(((CAST(n_both AS DOUBLE) / n_seen)
                      * (CASE WHEN n_seen < {K} THEN CAST(n_seen AS DOUBLE)
                              ELSE {(K - 1) * HASH_SPAN!r} / kth END)
                      - n_inter) / n_inter, 6) AS inter_rel_err
        FROM stats CROSS JOIN exact
    """,
    "sketch_cms_heavy_hitters": _cms_oracle(),
    "sketch_kmv_distinct": f"""
        WITH hashes AS (
            SELECT DISTINCT event_type,
                   ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT AS h
            FROM events
        ),
        ranked AS (
            SELECT event_type, h,
                   ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
            FROM hashes
        ),
        per AS (
            SELECT event_type, count(*) AS n_seen, max(h) AS kth
            FROM ranked WHERE rn <= {K} GROUP BY event_type
        ),
        exact AS (
            SELECT event_type, count(DISTINCT event_id) AS n_exact
            FROM events GROUP BY event_type
        )
        SELECT per.event_type, n_exact,
               ROUND(CASE WHEN n_seen < {K} THEN CAST(n_seen AS DOUBLE)
                          ELSE {(K - 1) * HASH_SPAN!r} / kth END, 4) AS n_est,
               ROUND((CASE WHEN n_seen < {K} THEN CAST(n_seen AS DOUBLE)
                           ELSE {(K - 1) * HASH_SPAN!r} / kth END - n_exact)
                     / n_exact, 6) AS rel_err
        FROM per JOIN exact ON per.event_type = exact.event_type
        ORDER BY per.event_type
    """,
}


# --------------------------------------------------- histogram quantiles

HIST_BINS = 256
HIST_QS = (0.5, 0.9, 0.99)


def histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable equi-width histogram quantile sketch + error audit —
    the third leg of the sketch triad (KMV distinct, CMS heavy hitters,
    histogram quantiles).

    The sketch state is HIST_BINS integer counts — trivially mergeable
    across partitions/days (vector add), which is what production
    percentile dashboards actually maintain; Spark's approx_percentile
    (t-digest-ish) is the built-in equivalent but is not reproducible
    cross-engine, so this operator builds the portable variant: bounds
    from one min/max pass, bin counts with map-side combine, estimate
    by linear interpolation inside the target bin, and the audit column
    reports |est − exact| against the exact interpolated percentile.

    Scale shape: two narrow passes over the fact scan (bounds, counts)
    + a 256-row cumulative window. The exact percentile exists only as
    the audit twin — at 100 TB you ship the sketch, sample the audit."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    width = (F.col("hi") - F.col("lo")) / HIST_BINS
    hist = (
        ev.crossJoin(F.broadcast(bounds))
        .select(
            F.least(
                F.lit(HIST_BINS - 1),
                F.floor((F.col("value") - F.col("lo")) / width).cast("long"),
            ).alias("bin"),
            "lo",
            "hi",
            "n",
        )
        .groupBy("bin", "lo", "hi", "n")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wcum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("cum", F.sum("c").over(wcum)).withColumn(
        "prev", F.col("cum") - F.col("c")
    )
    exact = ev.agg(
        *[
            F.round(F.expr(f"percentile(value, {p})"), 6).alias(
                f"x{int(p * 100)}"
            )
            for p in HIST_QS
        ]
    )
    parts = []
    for p in HIST_QS:
        target = F.lit(p) * F.col("n")
        est = F.col("lo") + (F.col("hi") - F.col("lo")) / HIST_BINS * (
            F.col("bin") + (target - F.col("prev")) / F.col("c")
        )
        parts.append(
            cum.filter((F.col("cum") >= target) & (F.col("prev") < target))
            .select(
                F.lit(p).alias("q"),
                F.round(est, 6).alias("est"),
            )
        )
    stacked = parts[0]
    for part in parts[1:]:
        stacked = stacked.unionByName(part)
    out = stacked.crossJoin(F.broadcast(exact))
    exact_col = None
    for p in HIST_QS:
        exact_col = (
            F.when(F.col("q") == p, F.col(f"x{int(p * 100)}"))
            if exact_col is None
            else exact_col.when(F.col("q") == p, F.col(f"x{int(p * 100)}"))
        )
    return out.select(
        "q",
        "est",
        exact_col.alias("exact"),
        F.round(F.abs(F.col("est") - exact_col), 6).alias("abs_err"),
    ).orderBy("q")


QUERIES["sketch_histogram_quantiles"] = histogram_quantiles

_HQ_SEL = []
for _p in HIST_QS:
    _HQ_SEL.append(
        f"""
        SELECT CAST({_p} AS DOUBLE) AS q,
               ROUND(lo + (hi - lo) / {HIST_BINS}
                     * (bin + (CAST({_p} AS DOUBLE) * n - prev) / c), 6)
                   AS est
        FROM cum
        WHERE cum >= CAST({_p} AS DOUBLE) * n
          AND prev < CAST({_p} AS DOUBLE) * n
        """
    )

ORACLES["sketch_histogram_quantiles"] = f"""
    WITH bounds AS (
        SELECT min(value) AS lo, max(value) AS hi,
               CAST(count(*) AS BIGINT) AS n
        FROM events
    ),
    binned AS (
        SELECT least({HIST_BINS - 1},
                     CAST(floor((value - lo)
                                / ((hi - lo) / {HIST_BINS})) AS BIGINT))
                   AS bin, lo, hi, n
        FROM events CROSS JOIN bounds
    ),
    hist AS (
        SELECT bin, lo, hi, n, CAST(count(*) AS BIGINT) AS c
        FROM binned GROUP BY bin, lo, hi, n
    ),
    cum AS (
        SELECT *, CAST(SUM(c) OVER (ORDER BY bin
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum,
               CAST(SUM(c) OVER (ORDER BY bin
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) - c AS prev
        FROM hist
    ),
    ests AS ({" UNION ALL ".join(_HQ_SEL)}),
    exact AS (
        SELECT ROUND(quantile_cont(value, 0.5), 6) AS x50,
               ROUND(quantile_cont(value, 0.9), 6) AS x90,
               ROUND(quantile_cont(value, 0.99), 6) AS x99
        FROM events
    )
    SELECT q, est,
           CASE WHEN q = 0.5 THEN x50
                WHEN q = 0.9 THEN x90
                ELSE x99 END AS exact,
           ROUND(abs(est - CASE WHEN q = 0.5 THEN x50
                                WHEN q = 0.9 THEN x90
                                ELSE x99 END), 6) AS abs_err
    FROM ests CROSS JOIN exact
    ORDER BY q
"""


# ------------------------------------------- mergeable rolling distinct

ROLL_B = 1024  # buckets per daily sketch


def rolling_distinct_sketch_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per day via MERGED daily KMV
    sketches, audited against the exact inverted-contribution query —
    the at-scale shape of sliding distinct: daily sketches are computed
    (in production: persisted) ONCE, and every window is a bucket-min
    merge of seven sketch rows, never a recompute over raw events.
    Versus the exact twin (``events_rolling_distinct_7d``), the merge
    stream carries ≤ B rows per (day, window) instead of the activity
    set — the win grows with daily actives.

    Deterministic: md5-derived hashes, min/argmin merges — the estimate
    (and therefore its error) is reproducible bit-for-bit, which is why
    the audit columns can be oracle-checked like any exact query."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(F.to_date("ts").alias("day"), _h60(F.col("user_id")).alias("h"))
        .groupBy("day", F.pmod("h", F.lit(ROLL_B)).alias("b"))
        .agg(F.min("h").alias("h"))
    )
    bounds = daily.agg(F.max("day").alias("hi"))
    contrib = daily.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"), "day", "b", "h"
    ).select(F.date_add(F.col("day"), F.col("off")).alias("wday"), "b", "h")
    merged = (
        contrib.crossJoin(F.broadcast(bounds))
        .filter(F.col("wday") <= F.col("hi"))
        .groupBy("wday", "b")
        .agg(F.min("h").alias("h"))
    )
    w = Window.partitionBy("wday").orderBy("h")
    per = (
        merged.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= K)
        .groupBy("wday")
        .agg(F.count(F.lit(1)).alias("n_seen"), F.max("h").alias("kth"))
    )
    est = F.when(
        F.col("n_seen") < K, F.col("n_seen").cast("double")
    ).otherwise(F.lit((K - 1) * HASH_SPAN) / F.col("kth"))
    from ..plans.events import rolling_distinct_users_7d

    exact = rolling_distinct_users_7d(spark, sf_dir).select(
        F.col("day").alias("wday"), F.col("n_users_7d").alias("n_exact")
    )
    return (
        per.join(exact, "wday")
        .select(
            F.col("wday").alias("day"),
            "n_exact",
            F.round(est, 4).alias("n_est"),
            F.round((est - F.col("n_exact")) / F.col("n_exact"), 6).alias(
                "rel_err"
            ),
        )
        .orderBy("day")
    )


QUERIES["sketch_rolling_distinct_7d"] = rolling_distinct_sketch_7d

ORACLES["sketch_rolling_distinct_7d"] = f"""
    WITH hashes AS (
        SELECT CAST(ts AS DATE) AS day,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
                   AS h
        FROM events
    ),
    daily AS (
        SELECT day, h % {ROLL_B} AS b, min(h) AS h
        FROM hashes GROUP BY day, h % {ROLL_B}
    ),
    bounds AS (SELECT max(day) AS hi FROM daily),
    contrib AS (
        SELECT d.day + CAST(t.o AS INTEGER) AS wday, d.b, d.h
        FROM daily d, unnest(range(0, 7)) AS t(o)
    ),
    merged AS (
        SELECT c.wday, c.b, min(c.h) AS h
        FROM contrib c, bounds bo
        WHERE c.wday <= bo.hi
        GROUP BY c.wday, c.b
    ),
    topk AS (
        SELECT wday, h,
               ROW_NUMBER() OVER (PARTITION BY wday ORDER BY h) AS rn
        FROM merged
    ),
    per AS (
        SELECT wday, CAST(count(*) AS BIGINT) AS n_seen, max(h) AS kth
        FROM topk WHERE rn <= {K} GROUP BY wday
    ),
    du AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    xcontrib AS (
        SELECT du.day + CAST(t.o AS INTEGER) AS wday, du.user_id
        FROM du, unnest(range(0, 7)) AS t(o)
    ),
    exact AS (
        SELECT c.wday, count(DISTINCT c.user_id) AS n_exact
        FROM xcontrib c, bounds b
        WHERE c.wday <= b.hi
        GROUP BY 1
    )
    SELECT p.wday AS day,
           CAST(e.n_exact AS BIGINT) AS n_exact,
           ROUND(CASE WHEN p.n_seen < {K} THEN p.n_seen * 1.0
                      ELSE {(K - 1)} * {HASH_SPAN} / p.kth END, 4) AS n_est,
           ROUND((CASE WHEN p.n_seen < {K} THEN p.n_seen * 1.0
                       ELSE {(K - 1)} * {HASH_SPAN} / p.kth END
                  - e.n_exact) / e.n_exact, 6) AS rel_err
    FROM per p JOIN exact e ON p.wday = e.wday
    ORDER BY day
"""


# --------------------------------------------- theta set-operation sketch

THETA_K = 256


def theta_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV/theta sketch set operations: estimated distinct
    |A ∩ B| and |A ∪ B| between the part-key sets shipped under each
    pair of return flags, with the exact counts and relative errors
    alongside (the hash is deterministic, so the estimate — and its
    error — is a fixed function of the data, oracle-checkable).

    This is the Theta-sketch union/intersection algebra (Dasgupta et
    al., "Theta-Sketch Framework"): each side keeps its K smallest
    60-bit hashes; θ = the smaller of the two coverage thresholds
    (2^60 when a side's set fits entirely in the sketch); common
    hashes below θ scale by 2^60/θ.  Mergeability is the 100 TB story:
    per-partition sketches union by keeping the K smallest of the
    merged minima — an algebraic aggregate, no re-scan; set
    intersections between 10^11-row segments then cost K rows each.

    Spark shape: one distinct per (flag, key-hash) — map-side partial;
    per-flag sketches via a bounded row_number window (K rows out per
    flag); the pair algebra runs on sketch rows only.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # cached: the distinct (flag, hash) key set is read by FOUR
    # consumers (the sketch window, the per-flag stats, and both sides
    # of the exact-intersection self-join) — uncached, each re-ran the
    # lineitem scan + md5 + distinct shuffle (5 scans per run); the
    # materialized frame IS the sketch-build proxy (keys only, never
    # rows), so this is also the 100 TB shape
    hashes = (
        li.select(
            F.col("l_returnflag").alias("flag"),
            _h60(F.col("l_partkey")).alias("h"),
        )
        .distinct()
        .cache()
    )
    w = Window.partitionBy("flag").orderBy("h")
    # cached: the K-row-per-flag sketch is read three times (the kth
    # aggregate and both sides of the common-hash self-join); uncached,
    # each read re-sorted the full hash frame through the window
    sk = (
        hashes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= THETA_K)
        .select("flag", "h")
        .cache()
    )
    stats = hashes.groupBy("flag").agg(
        F.count(F.lit(1)).alias("n_exact"), F.max("h").alias("h_max")
    )
    kth = sk.groupBy("flag").agg(
        F.count(F.lit(1)).alias("n_sk"), F.max("h").alias("kth")
    )
    # coverage threshold: the sketch covers [0, cov) of the hash space.
    # cached: read by both sides of the pairs crossing AND both sides
    # of the exact-union crossing (4 reads), each of which otherwise
    # re-ran the stats + kth aggregates over the hash frame
    cov = (
        stats.join(kth, "flag")
        .select(
            "flag",
            "n_exact",
            F.when(
                F.col("n_sk") < F.lit(THETA_K), F.lit(float(HASH_SPAN))
            )
            .otherwise(F.col("kth").cast("double"))
            .alias("cov"),
        )
        .cache()
    )
    pairs = (
        cov.alias("x")
        .join(cov.alias("y"), F.col("x.flag") < F.col("y.flag"))
        .select(
            F.col("x.flag").alias("f1"),
            F.col("y.flag").alias("f2"),
            F.least("x.cov", "y.cov").alias("theta"),
        )
    )
    common = (
        pairs.join(
            sk.alias("s1"), F.col("f1") == F.col("s1.flag")
        )
        .join(
            sk.alias("s2"),
            (F.col("f2") == F.col("s2.flag"))
            & (F.col("s1.h") == F.col("s2.h")),
        )
        .filter(F.col("s1.h").cast("double") < F.col("theta"))
        .groupBy("f1", "f2", "theta")
        .agg(F.count(F.lit(1)).alias("c_common"))
    )
    ex = (
        hashes.alias("a")
        .join(
            hashes.alias("b"),
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.flag") < F.col("b.flag")),
        )
        .groupBy(
            F.col("a.flag").alias("f1"), F.col("b.flag").alias("f2")
        )
        .agg(F.count(F.lit(1)).alias("exact_inter"))
    )
    exu = (
        cov.alias("x")
        .join(cov.alias("y"), F.col("x.flag") < F.col("y.flag"))
        .select(
            F.col("x.flag").alias("f1"),
            F.col("y.flag").alias("f2"),
            (F.col("x.n_exact") + F.col("y.n_exact")).alias("n_sum"),
        )
    )
    est_i = F.col("c_common") * F.lit(float(HASH_SPAN)) / F.col("theta")
    return (
        common.join(ex, ["f1", "f2"])
        .join(exu, ["f1", "f2"])
        .select(
            "f1",
            "f2",
            "exact_inter",
            F.round(est_i, 4).alias("est_inter"),
            (F.col("n_sum") - F.col("exact_inter")).alias("exact_union"),
            F.round(
                (est_i - F.col("exact_inter"))
                / F.col("exact_inter"),
                6,
            ).alias("rel_err_inter"),
        )
        .orderBy("f1", "f2")
    )


QUERIES["sketch_theta_set_ops"] = theta_set_ops

_H60_SQL = "('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15))::BIGINT"

ORACLES["sketch_theta_set_ops"] = f"""
    WITH hashes AS (
        SELECT DISTINCT l_returnflag AS flag, {_H60_SQL} AS h
        FROM lineitem
    ),
    sk AS (
        SELECT flag, h FROM (
            SELECT flag, h,
                   row_number() OVER (PARTITION BY flag ORDER BY h) AS rn
            FROM hashes) t WHERE rn <= {THETA_K}
    ),
    stats AS (
        SELECT flag, count(*) AS n_exact FROM hashes GROUP BY flag
    ),
    kth AS (
        SELECT flag, count(*) AS n_sk, max(h) AS kth FROM sk GROUP BY flag
    ),
    cov AS (
        SELECT s.flag, s.n_exact,
               CASE WHEN k.n_sk < {THETA_K}
                    THEN CAST({int(HASH_SPAN)} AS DOUBLE)
                    ELSE CAST(k.kth AS DOUBLE) END AS cov
        FROM stats s JOIN kth k ON s.flag = k.flag
    ),
    pairs AS (
        SELECT x.flag AS f1, y.flag AS f2,
               least(x.cov, y.cov) AS theta,
               x.n_exact + y.n_exact AS n_sum
        FROM cov x JOIN cov y ON x.flag < y.flag
    ),
    common AS (
        SELECT p.f1, p.f2, p.theta, count(*) AS c_common
        FROM pairs p
        JOIN sk s1 ON s1.flag = p.f1
        JOIN sk s2 ON s2.flag = p.f2 AND s1.h = s2.h
        WHERE CAST(s1.h AS DOUBLE) < p.theta
        GROUP BY p.f1, p.f2, p.theta
    ),
    ex AS (
        SELECT a.flag AS f1, b.flag AS f2, count(*) AS exact_inter
        FROM hashes a JOIN hashes b
          ON a.h = b.h AND a.flag < b.flag
        GROUP BY 1, 2
    )
    SELECT c.f1, c.f2,
           CAST(e.exact_inter AS BIGINT) AS exact_inter,
           round(c.c_common * CAST({int(HASH_SPAN)} AS DOUBLE) / c.theta, 4)
               AS est_inter,
           CAST(p.n_sum - e.exact_inter AS BIGINT) AS exact_union,
           round((c.c_common * CAST({int(HASH_SPAN)} AS DOUBLE) / c.theta
                  - e.exact_inter) / e.exact_inter, 6) AS rel_err_inter
    FROM common c
    JOIN ex e ON e.f1 = c.f1 AND e.f2 = c.f2
    JOIN pairs p ON p.f1 = c.f1 AND p.f2 = c.f2
    ORDER BY c.f1, c.f2
"""


# ------------------------------------------------------------ HyperLogLog

HLL_P = 8                 # 2^8 = 256 registers
HLL_M = 1 << HLL_P
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)  # standard alpha_256
_HLL_WBITS = 52           # rank field width: 60-bit hash minus 8 index bits
# single precomputed double for alpha·m²·2^52 — ONE literal on both
# sides (separate literals parse as DECIMAL in DuckDB and overflow)
_HLL_NUM = HLL_ALPHA * HLL_M * HLL_M * float(1 << _HLL_WBITS)


def hll_register_partials(ev):
    """Per-(event_type, register) rank maxima — the mergeable HLL state.

    This is the sketch's algebraic partial: registers from any split of
    the data merge by pairwise max, which is what makes the sketch both
    shuffle-cheap here and maintainable incrementally by the streaming
    twin (``streaming/incremental.py:stream_hll_registers``)."""
    h = _h60(F.col("event_id"))
    return (
        ev.select(
            "event_type",
            F.pmod(h, F.lit(HLL_M)).alias("j"),
            # exact integer >> 8 — `h / 256` would round-trip through a
            # double and corrupt 60-bit hashes past 2^53
            F.shiftright(h, HLL_P).alias("w"),
        )
        .withColumn(
            "rank",
            F.when(F.col("w") == 0, F.lit(_HLL_WBITS + 1)).otherwise(
                F.lit(_HLL_WBITS) - F.length(F.expr("bin(w)")) + 1
            ),
        )
        .groupBy("event_type", "j")
        .agg(F.max("rank").alias("m"))
    )


def hll_distinct_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-event estimate per event_type with the exact
    count and relative error alongside — the industry-standard
    cardinality sketch next to the KMV twin (``kmv_distinct_per_type``),
    same deterministic md5 hash, so the estimate is a fixed function of
    the data and oracle-checkable bit-for-bit.

    Engine-portable arithmetic: register index = low 8 hash bits; rank =
    leading-zero count of the remaining 52-bit field computed as
    ``52 - length(bin(w)) + 1`` — an INTEGER string op, no float log.
    The harmonic sum Σ2^(−M_j) is computed as the EXACT integer
    Σ2^(52−M_j) (each term ≤ 2^51, 256 terms — fits a long, order-free)
    divided by 2^52 once, so the only float ops are the final fixed
    expression.  Mergeability is the scale story: registers are a
    per-partition max — an algebraic aggregate; sketches union by
    pairwise register max, never by re-scan.
    """
    ev = load_table(spark, sf_dir, "events")
    # ONE scan serves both the sketch and its exact ground truth: j is
    # a pure function of event_id, so per-register countDistinct sums
    # to the per-type exact count — the old shape ran a second full
    # events scan + groupBy + join just for n_exact
    h = _h60(F.col("event_id"))
    per_j = (
        ev.select(
            "event_type",
            F.pmod(h, F.lit(HLL_M)).alias("j"),
            F.shiftright(h, HLL_P).alias("w"),
            "event_id",
        )
        .withColumn(
            "rank",
            F.when(F.col("w") == 0, F.lit(_HLL_WBITS + 1)).otherwise(
                F.lit(_HLL_WBITS) - F.length(F.expr("bin(w)")) + 1
            ),
        )
        .groupBy("event_type", "j")
        .agg(
            F.max("rank").alias("m"),
            F.countDistinct("event_id").alias("c"),
        )
    )
    # exact integer harmonic numerator: zero registers contribute 2^52
    # (rank 0); register j with max rank M contributes 2^(52-M)
    agg = per_j.groupBy("event_type").agg(
        F.sum(
            # DataFrame shiftleft takes a literal bit count; the SQL
            # form accepts the per-register column
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_WBITS} - m)")
        ).alias("s_nonzero"),
        F.count(F.lit(1)).alias("n_regs_hit"),
        F.sum("c").alias("n_exact"),
    )
    two52 = float(1 << _HLL_WBITS)
    est_raw = (
        F.lit(_HLL_NUM)
        / (
            F.col("s_nonzero").cast("double")
            + (F.lit(HLL_M) - F.col("n_regs_hit")).cast("double")
            * F.lit(two52)
        )
    )
    v = F.lit(HLL_M) - F.col("n_regs_hit")  # empty registers
    est = F.when(
        (est_raw <= F.lit(2.5 * HLL_M)) & (v > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v.cast("double")),
    ).otherwise(est_raw)
    return (
        agg.select(
            "event_type",
            "n_exact",
            F.round(est, 4).alias("hll_est"),
            F.round((est - F.col("n_exact")) / F.col("n_exact"), 6).alias(
                "rel_err"
            ),
        )
        .orderBy("event_type")
    )


QUERIES["sketch_hll_distinct"] = hll_distinct_per_type

_H60_EV = "('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT"

ORACLES["sketch_hll_distinct"] = f"""
    WITH hv AS (
        SELECT event_type, {_H60_EV} % {HLL_M} AS j,
               {_H60_EV} // {HLL_M} AS w
        FROM events
    ),
    ranks AS (
        SELECT event_type, j,
               CASE WHEN w = 0 THEN {_HLL_WBITS + 1}
                    ELSE {_HLL_WBITS} - length(bin(w)) + 1 END AS rank
        FROM hv
    ),
    regs AS (
        SELECT event_type, j, max(rank) AS m
        FROM ranks GROUP BY event_type, j
    ),
    agg AS (
        SELECT event_type,
               CAST(sum(CAST(1 AS BIGINT) << ({_HLL_WBITS} - m)) AS BIGINT)
                   AS s_nonzero,
               count(*) AS n_regs_hit
        FROM regs GROUP BY event_type
    ),
    exact AS (
        SELECT event_type, count(DISTINCT event_id) AS n_exact
        FROM events GROUP BY event_type
    ),
    est AS (
        SELECT a.event_type, e.n_exact,
               CASE WHEN
                   CAST({_HLL_NUM!r} AS DOUBLE)
                   / (CAST(s_nonzero AS DOUBLE)
                      + CAST({HLL_M} - n_regs_hit AS DOUBLE)
                        * CAST({float(1 << _HLL_WBITS)!r} AS DOUBLE))
                       <= {2.5 * HLL_M}
                   AND {HLL_M} - n_regs_hit > 0
               THEN CAST({float(HLL_M)!r} AS DOUBLE)
                    * ln(CAST({float(HLL_M)!r} AS DOUBLE)
                         / CAST({HLL_M} - n_regs_hit AS DOUBLE))
               ELSE
                   CAST({_HLL_NUM!r} AS DOUBLE)
                   / (CAST(s_nonzero AS DOUBLE)
                      + CAST({HLL_M} - n_regs_hit AS DOUBLE)
                        * CAST({float(1 << _HLL_WBITS)!r} AS DOUBLE))
               END AS est
        FROM agg a JOIN exact e USING (event_type)
    )
    SELECT event_type, CAST(n_exact AS BIGINT) AS n_exact,
           round(est, 4) AS hll_est,
           round((est - n_exact) / n_exact, 6) AS rel_err
    FROM est ORDER BY event_type
"""


# ------------------------------------------- time-decayed leaderboard

DECAY_HALF_LIFE_DAYS = 7.0
DECAY_TOP = 20


def decayed_activity_leaderboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed user-activity leaderboard: each event
    contributes 2^(−age_days / half_life), freshest data dominating —
    the standard "trending now" score that a plain count cannot express.

    Order-free by construction: the per-event decay weight is rounded
    to integer micro-units BEFORE summation (money_sum device), so the
    distributed sum is exact and the top-k cut deterministic.  Age is
    measured from the corpus max timestamp (one broadcast scalar), so
    the score is a pure function of the data.  Scale: one groupBy on
    user_id with map-side partials; the decay re-weights at read time —
    no state, no reprocessing when the window slides.
    """
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("mx"))
    scored = ev.crossJoin(F.broadcast(mx)).select(
        "user_id",
        F.round(
            F.pow(
                F.lit(2.0),
                -F.datediff(F.to_date("mx"), F.to_date("ts"))
                / F.lit(DECAY_HALF_LIFE_DAYS),
            )
            * 1e6
        )
        .cast("long")
        .alias("w_u6"),
    )
    per = scored.groupBy("user_id").agg(
        F.sum("w_u6").alias("score_u6"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return (
        per.orderBy(F.desc("score_u6"), "user_id")
        .limit(DECAY_TOP)
        .select(
            "user_id",
            "n_events",
            (F.col("score_u6").cast("double") / 1e6).alias("decayed_score"),
        )
    )


QUERIES["sketch_decayed_leaderboard"] = decayed_activity_leaderboard

ORACLES["sketch_decayed_leaderboard"] = f"""
    WITH mx AS (SELECT max(ts) AS mx FROM events),
    scored AS (
        SELECT user_id,
               CAST(round(pow(2.0,
                   -date_diff('day', CAST(ts AS DATE), CAST(mx AS DATE))
                   / {DECAY_HALF_LIFE_DAYS}) * 1e6) AS BIGINT) AS w_u6
        FROM events CROSS JOIN mx
    ),
    per AS (
        SELECT user_id, sum(w_u6) AS score_u6, count(*) AS n_events
        FROM scored GROUP BY user_id
    )
    SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
           CAST(score_u6 AS DOUBLE) / 1e6 AS decayed_score
    FROM per
    ORDER BY score_u6 DESC, user_id
    LIMIT {DECAY_TOP}
"""


# ----------------------------------------------- linear counting

LC_M = 4096  # linear-counting bitmap bits


def linear_counting_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-counting distinct estimate for event users, checked
    against the exact count: hash each user into an m-bit bitmap and
    estimate n ≈ −m·ln(V/m) from the empty fraction V/m — the
    low-cardinality-regime sketch that complements KMV/HLL (it beats
    both when n ≪ m, which is exactly the per-partition regime of a
    two-level distinct at 100 TB).

    The bitmap is relational (distinct occupied positions — the same
    engine-portable device as [[bloom_fpr_audit]]), so DuckDB
    reproduces the estimate bit-for-bit; the estimator is one ln of an
    exact integer ratio.  Error is reported in ppm of the exact count.
    """
    ev = load_table(spark, sf_dir, "events")
    occupied = ev.selectExpr(
        "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 15),"
        f" 16, 10) AS BIGINT) % {LC_M} AS p"
    ).distinct()
    m = occupied.agg(F.count(F.lit(1)).alias("occ"))
    exact = ev.agg(F.countDistinct("user_id").alias("n_exact"))
    return (
        m.crossJoin(exact)
        .selectExpr(
            "CAST(occ AS BIGINT) AS occupied_bits",
            f"CAST({LC_M} AS BIGINT) AS m_bits",
            f"CAST(round(-{LC_M} * ln(({LC_M} - occ) * 1.0 / {LC_M}))"
            " AS BIGINT) AS n_estimated",
            "n_exact",
            f"abs((2*CAST(round(-{LC_M} * ln(({LC_M} - occ) * 1.0"
            f" / {LC_M})) AS BIGINT)*1000000 + n_exact)"
            " DIV (2*n_exact) - 1000000) AS err_ppm",
        )
    )


QUERIES["sketch_linear_counting"] = linear_counting_users

ORACLES["sketch_linear_counting"] = f"""
    WITH occupied AS (
        SELECT DISTINCT ('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                        1, 15))::BIGINT % {LC_M} AS p
        FROM events
    ),
    m AS (SELECT count(*) AS occ FROM occupied),
    exact AS (SELECT count(DISTINCT user_id) AS n_exact FROM events)
    SELECT CAST(occ AS BIGINT) AS occupied_bits,
           CAST({LC_M} AS BIGINT) AS m_bits,
           CAST(round(-{LC_M} * ln(({LC_M} - occ) * 1.0 / {LC_M}))
                AS BIGINT) AS n_estimated,
           CAST(n_exact AS BIGINT) AS n_exact,
           CAST(abs((2*CAST(round(-{LC_M} * ln(({LC_M} - occ) * 1.0
                / {LC_M})) AS BIGINT)*1000000 + n_exact)
                // (2*n_exact) - 1000000) AS BIGINT) AS err_ppm
    FROM m CROSS JOIN exact
"""


# ----------------------------------- HLL mergeability (daily union)


def hll_daily_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mergeability audit that justifies HLL at 100 TB: build one
    register set PER DAY (the shape a partitioned ingest maintains),
    union them by pairwise register max, and show the merged estimate
    equals the single-pass whole-range estimate bit-for-bit — so daily
    sketches can serve any date-range query without re-scanning.

    One row: day count, merged-union estimate, direct one-pass
    estimate, an equality flag (the audit), and the exact distinct.
    Same integer-only register arithmetic as ``hll_distinct_per_type``
    (rank via bin-length, harmonic sum as Σ2^(52−M) exact longs).
    """
    ev = load_table(spark, sf_dir, "events")
    h = _h60(F.col("event_id"))
    hv = ev.select(
        F.to_date("ts").alias("day"),
        F.pmod(h, F.lit(HLL_M)).alias("j"),
        F.shiftright(h, HLL_P).alias("w"),
    ).withColumn(
        "rank",
        F.when(F.col("w") == 0, F.lit(_HLL_WBITS + 1)).otherwise(
            F.lit(_HLL_WBITS) - F.length(F.expr("bin(w)")) + 1
        ),
    )
    # fan each event to a ('daily', day) and a ('direct', NULL) row so
    # BOTH register sets come out of ONE scan + ONE map-side-combined
    # aggregate instead of two full md5 passes (the direct set is still
    # folded from the complete event stream independent of the day
    # grouping — the mergeability audit stays a real comparison); the
    # tiny register frame is checkpointed for its three readers
    fanned = hv.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("daily").alias("kind"),
                    F.col("day").alias("day"),
                ),
                F.struct(
                    F.lit("direct").alias("kind"),
                    F.lit(None).cast("date").alias("day"),
                ),
            )
        ).alias("t"),
        "j",
        "rank",
    ).select("t.kind", "t.day", "j", "rank")
    regs = (
        fanned.groupBy("kind", "day", "j")
        .agg(F.max("rank").alias("m"))
        .localCheckpoint(eager=False)
    )
    daily = regs.filter(F.col("kind") == "daily")
    merged = daily.groupBy("j").agg(F.max("m").alias("m"))
    direct = regs.filter(F.col("kind") == "direct").select("j", "m")

    def _est(regs):
        agg = regs.agg(
            F.sum(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_WBITS} - m)")
            ).alias("s_nonzero"),
            F.count(F.lit(1)).alias("n_regs_hit"),
        )
        est_raw = F.lit(_HLL_NUM) / (
            F.col("s_nonzero").cast("double")
            + (F.lit(HLL_M) - F.col("n_regs_hit")).cast("double")
            * F.lit(float(1 << _HLL_WBITS))
        )
        v = F.lit(HLL_M) - F.col("n_regs_hit")
        est = F.when(
            (est_raw <= F.lit(2.5 * HLL_M)) & (v > 0),
            F.lit(float(HLL_M))
            * F.log(F.lit(float(HLL_M)) / v.cast("double")),
        ).otherwise(est_raw)
        return agg.select(F.round(est, 3).alias("est"))

    # n_days reads the |days|·M-row daily register frame (every event
    # lands in some (day, j) group, so the day sets are identical);
    # only the exact-distinct ground truth still scans events — and
    # without a second count-distinct in the same aggregate it no
    # longer pays the expand
    n_days = daily.agg(F.countDistinct("day").alias("n_days")).crossJoin(
        ev.agg(F.countDistinct("event_id").alias("n_exact"))
    )
    u = _est(merged).selectExpr("est AS union_est")
    d = _est(direct).selectExpr("est AS direct_est")
    return (
        n_days.crossJoin(u)
        .crossJoin(d)
        .selectExpr(
            "CAST(n_days AS BIGINT) AS n_days",
            "union_est",
            "direct_est",
            "CAST(CASE WHEN union_est = direct_est THEN 1 ELSE 0 END"
            " AS BIGINT) AS merge_lossless",
            "CAST(n_exact AS BIGINT) AS n_exact",
        )
    )


QUERIES["sketch_hll_daily_union"] = hll_daily_union

_HLL_EST_SQL = f"""
    CASE WHEN
        CAST({_HLL_NUM!r} AS DOUBLE)
        / (CAST(s_nonzero AS DOUBLE)
           + CAST({HLL_M} - n_regs_hit AS DOUBLE)
             * CAST({float(1 << _HLL_WBITS)!r} AS DOUBLE))
            <= {2.5 * HLL_M}
        AND {HLL_M} - n_regs_hit > 0
    THEN CAST({float(HLL_M)!r} AS DOUBLE)
         * ln(CAST({float(HLL_M)!r} AS DOUBLE)
              / CAST({HLL_M} - n_regs_hit AS DOUBLE))
    ELSE
        CAST({_HLL_NUM!r} AS DOUBLE)
        / (CAST(s_nonzero AS DOUBLE)
           + CAST({HLL_M} - n_regs_hit AS DOUBLE)
             * CAST({float(1 << _HLL_WBITS)!r} AS DOUBLE))
    END
"""

ORACLES["sketch_hll_daily_union"] = f"""
    WITH hv AS (
        SELECT CAST(ts AS DATE) AS day,
               {_H60_EV} % {HLL_M} AS j,
               {_H60_EV} // {HLL_M} AS w
        FROM events
    ),
    ranks AS (
        SELECT day, j,
               CASE WHEN w = 0 THEN {_HLL_WBITS + 1}
                    ELSE {_HLL_WBITS} - length(bin(w)) + 1 END AS rank
        FROM hv
    ),
    daily AS (SELECT day, j, max(rank) AS m FROM ranks GROUP BY 1, 2),
    merged AS (SELECT j, max(m) AS m FROM daily GROUP BY 1),
    direct AS (SELECT j, max(rank) AS m FROM ranks GROUP BY 1),
    ua AS (
        SELECT CAST(sum(CAST(1 AS BIGINT) << ({_HLL_WBITS} - m))
                    AS BIGINT) AS s_nonzero,
               count(*) AS n_regs_hit
        FROM merged
    ),
    da AS (
        SELECT CAST(sum(CAST(1 AS BIGINT) << ({_HLL_WBITS} - m))
                    AS BIGINT) AS s_nonzero,
               count(*) AS n_regs_hit
        FROM direct
    ),
    ue AS (SELECT round({_HLL_EST_SQL}, 3) AS union_est FROM ua),
    de AS (SELECT round({_HLL_EST_SQL}, 3) AS direct_est FROM da),
    base AS (
        SELECT count(DISTINCT CAST(ts AS DATE)) AS n_days,
               count(DISTINCT event_id) AS n_exact
        FROM events
    )
    SELECT CAST(b.n_days AS BIGINT) AS n_days,
           ue.union_est, de.direct_est,
           CAST(CASE WHEN ue.union_est = de.direct_est
                THEN 1 ELSE 0 END AS BIGINT) AS merge_lossless,
           CAST(b.n_exact AS BIGINT) AS n_exact
    FROM base b, ue, de
"""


# --------------------------- histogram-quantile mergeability audit

QMERGE_BINS = 32
QMERGE_PCTS = (50, 90, 99)


def quantile_merge_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeability audit for the histogram-quantile sketch, the HLL
    daily-union's sibling ([[sketch_hll_daily_union]]): per-day
    equi-width histograms merged by bin-count SUM equal the one-pass
    histogram bit-for-bit (count addition is the histogram's algebraic
    combine), so per-day sketches answer any date-range percentile
    without a re-scan.  Reports p50/p90/p99 upper bounds read from the
    MERGED histogram plus the losslessness flag.

    Pure integer arithmetic throughout (cents bins, ceil'd rank
    targets via (p·N + 99) DIV 100, half-open bin bounds).  Scale:
    two map-side bucket passes; state is |days|·B rows.
    """
    ev = load_table(spark, sf_dir, "events")
    c = ev.select(
        F.to_date("ts").alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    # checkpointed: the 1-row range is broadcast into the binning pass
    # AND the final bound projection — two events scans without it
    rng = c.agg(
        F.min("cents").alias("lo"), F.max("cents").alias("hi")
    ).localCheckpoint(eager=False)
    # daily and direct histograms fan from ONE scan+binning pass (the
    # [[sketch_hll_daily_union]] device): the direct branch still folds
    # the full event stream independently of the merge — the audit
    # stays real — but the previous shape scanned and binned events
    # twice; both branches partial-aggregate map-side to ≤ |days|·B + B
    # cells before the shuffle
    cells = (
        c.crossJoin(F.broadcast(rng))
        .selectExpr(
            "explode(array(named_struct('k', 0, 'day', day),"
            " named_struct('k', 1, 'day', CAST(NULL AS DATE)))) AS t",
            f"(cents - lo) * {QMERGE_BINS} DIV (hi - lo + 1) AS bin",
        )
        .groupBy("t.k", "t.day", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    daily = cells.filter(F.col("k") == 0).select("day", "bin", "n")
    merged = daily.groupBy("bin").agg(F.sum("n").alias("n")).cache()
    direct = cells.filter(F.col("k") == 1).select("bin", "n")
    mism = (
        merged.join(direct.selectExpr("bin", "n AS nd"), "bin", "full")
        .filter("n IS DISTINCT FROM nd")
        .agg(F.count(F.lit(1)).alias("bad"))
    )
    tot = merged.agg(F.sum("n").alias("total"))
    w = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = merged.withColumn("cum", F.sum("n").over(w))
    pcts = values_df(
        spark, [(int(p),) for p in QMERGE_PCTS], "p long"
    )
    est = (
        pcts.crossJoin(F.broadcast(tot))
        .join(cum, F.col("cum") >= F.expr("(p * total + 99) DIV 100"))
        .groupBy("p")
        .agg(F.min("bin").alias("qbin"))
    )
    return (
        est.crossJoin(F.broadcast(rng))
        .crossJoin(F.broadcast(mism))
        .selectExpr(
            "p AS pctile",
            "qbin AS bin",
            f"round(CAST(lo + (qbin + 1) * (hi - lo + 1)"
            f" DIV {QMERGE_BINS} AS DOUBLE) / 100, 2)"
            " AS upper_bound_dollars",
            "CAST(CASE WHEN bad = 0 THEN 1 ELSE 0 END AS BIGINT)"
            " AS merge_lossless",
        )
        .orderBy("pctile")
    )


QUERIES["sketch_quantile_merge_audit"] = quantile_merge_audit

ORACLES["sketch_quantile_merge_audit"] = f"""
    WITH c AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    rng AS (SELECT min(cents) AS lo, max(cents) AS hi FROM c),
    binned AS (
        SELECT day, lo, hi,
               (cents - lo) * {QMERGE_BINS} // (hi - lo + 1) AS bin
        FROM c, rng
    ),
    daily AS (
        SELECT day, bin, count(*) AS n FROM binned GROUP BY 1, 2
    ),
    merged AS (SELECT bin, sum(n) AS n FROM daily GROUP BY 1),
    direct AS (SELECT bin, count(*) AS n FROM binned GROUP BY 1),
    mism AS (
        SELECT count(*) AS bad
        FROM merged m FULL JOIN direct d USING (bin)
        WHERE m.n IS DISTINCT FROM d.n
    ),
    tot AS (SELECT sum(n) AS total FROM merged),
    cum AS (
        SELECT bin, sum(n) OVER (ORDER BY bin
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM merged
    ),
    est AS (
        SELECT p.p, min(cum.bin) AS qbin
        FROM (SELECT unnest([{", ".join(str(p) for p in QMERGE_PCTS)}])
              AS p) p, tot,
             cum
        WHERE cum.cum >= (p.p * tot.total + 99) // 100
        GROUP BY p.p
    )
    SELECT CAST(e.p AS BIGINT) AS pctile,
           CAST(e.qbin AS BIGINT) AS bin,
           round(CAST(r.lo + (e.qbin + 1) * (r.hi - r.lo + 1)
                 // {QMERGE_BINS} AS DOUBLE) / 100, 2)
               AS upper_bound_dollars,
           CAST(CASE WHEN m.bad = 0 THEN 1 ELSE 0 END AS BIGINT)
               AS merge_lossless
    FROM est e, rng r, mism m ORDER BY pctile
"""


# ------------------------------------- HLL precision sweep (calibration)

HLL_SWEEP_PS = (4, 6, 8, 10)  # register-count exponents: m = 2^p


def hll_precision_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL register-count calibration: the distinct-USER estimate at
    m = 16 / 64 / 256 / 1024 registers from the SAME hash stream, with
    the exact count, realized relative error, and the analytic standard
    error 1.04/√m alongside — the table that justifies this module's
    HLL_P choice the way ``dedup_band_tradeoff`` justifies the LSH
    banding (more registers buy error ∝ 1/√m at linear sketch cost).

    One pass: the fact table reduces to the distinct 60-bit hash frame
    first (the sweep's candidate set), and all four register files are
    generated from it map-side (a 4-struct explode) into one (p, j)
    max-rank aggregate — registers stay algebraic partials, so the
    whole sweep merges by pairwise max at any scale.  Rank and harmonic
    numerator use the integer devices of ``sketch_hll_distinct``
    (bin-length rank, exact Σ2^((60−p)−M) — every term ≤ 2^55 and ≤ 2^10
    terms, order-free in a long); α(m), the small-range linear-counting
    switch, and the error columns are one fixed double expression per
    of-four row.
    """
    ev = load_table(spark, sf_dir, "events")
    hs = ev.select(_h60(F.col("user_id")).alias("h")).distinct()
    structs = []
    for p in HLL_SWEEP_PS:
        m = 1 << p
        wb = 60 - p
        structs.append(
            f"struct(CAST({p} AS BIGINT) AS p, pmod(h, {m}) AS j,"
            f" CASE WHEN shiftright(h, {p}) = 0 THEN {wb + 1}"
            f" ELSE {wb} - length(bin(shiftright(h, {p}))) + 1 END AS r)"
        )
    regs = (
        hs.selectExpr(f"explode(array({', '.join(structs)})) AS x")
        .selectExpr("x.p AS p", "x.j AS j", "x.r AS r")
        .groupBy("p", "j")
        .agg(F.max("r").alias("mx"))
    )
    agg = regs.groupBy("p").agg(
        F.sum(
            F.expr("shiftleft(CAST(1 AS BIGINT), (60 - p) - mx)")
        ).alias("s_nonzero"),
        F.count(F.lit(1)).alias("hit"),
    )
    exact = hs.agg(F.count(F.lit(1)).alias("n_exact"))
    alpha = (
        "CASE WHEN p = 4 THEN 0.673 WHEN p = 6 THEN 0.709"
        " ELSE 0.7213 / (1.0 + 1.079"
        " / CAST(shiftleft(CAST(1 AS BIGINT), CAST(p AS INT)) AS DOUBLE))"
        " END"
    )
    m_d = "CAST(shiftleft(CAST(1 AS BIGINT), CAST(p AS INT)) AS DOUBLE)"
    w_d = (
        "CAST(shiftleft(CAST(1 AS BIGINT), 60 - CAST(p AS INT))"
        " AS DOUBLE)"
    )
    est_raw = (
        f"(({alpha}) * {m_d} * {m_d} * {w_d})"
        f" / (CAST(s_nonzero AS DOUBLE) + ({m_d} - hit) * {w_d})"
    )
    est = (
        f"CASE WHEN ({est_raw}) <= 2.5 * {m_d} AND hit < "
        f"shiftleft(CAST(1 AS BIGINT), CAST(p AS INT))"
        f" THEN {m_d} * ln({m_d} / ({m_d} - hit))"
        f" ELSE ({est_raw}) END"
    )
    return (
        agg.crossJoin(F.broadcast(exact))
        .selectExpr(
            "p",
            "shiftleft(CAST(1 AS BIGINT), CAST(p AS INT)) AS m_registers",
            "CAST(n_exact AS BIGINT) AS n_exact",
            f"round({est}, 4) AS hll_est",
            f"round((({est}) - n_exact) / n_exact, 6) AS rel_err",
            f"round(1.04 / sqrt({m_d}), 6) AS se_analytic",
        )
        .orderBy("p")
    )


QUERIES["sketch_hll_precision_sweep"] = hll_precision_sweep

_H60_USER = "('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT"


def _hll_sweep_oracle() -> str:
    blocks, selects = [], []
    for p in HLL_SWEEP_PS:
        m = 1 << p
        wb = 60 - p
        blocks.append(f"""
    regs_{p} AS (
        SELECT h % {m} AS j,
               max(CASE WHEN (h // {1 << p}) = 0 THEN {wb + 1}
                        ELSE {wb} - length(bin(h // {1 << p})) + 1
                   END) AS mx
        FROM hs GROUP BY 1
    ),
    agg_{p} AS (
        SELECT CAST({p} AS BIGINT) AS p,
               sum(CAST(1 AS BIGINT) << ({wb} - mx)) AS s_nonzero,
               count(*) AS hit
        FROM regs_{p}
    )""")
        selects.append(f"SELECT * FROM agg_{p}")
    alpha = (
        "CASE WHEN p = 4 THEN 0.673 WHEN p = 6 THEN 0.709"
        " ELSE 0.7213 / (1.0 + 1.079"
        " / CAST(CAST(1 AS BIGINT) << CAST(p AS INT) AS DOUBLE)) END"
    )
    m_d = "CAST(CAST(1 AS BIGINT) << CAST(p AS INT) AS DOUBLE)"
    w_d = "CAST(CAST(1 AS BIGINT) << (60 - CAST(p AS INT)) AS DOUBLE)"
    est_raw = (
        f"(({alpha}) * {m_d} * {m_d} * {w_d})"
        f" / (CAST(s_nonzero AS DOUBLE) + ({m_d} - hit) * {w_d})"
    )
    est = (
        f"CASE WHEN ({est_raw}) <= 2.5 * {m_d} AND hit < "
        f"(CAST(1 AS BIGINT) << CAST(p AS INT))"
        f" THEN {m_d} * ln({m_d} / ({m_d} - hit))"
        f" ELSE ({est_raw}) END"
    )
    return f"""
    WITH hs AS (
        SELECT DISTINCT {_H60_USER} AS h FROM events
    ),
    {",".join(blocks)},
    exact AS (SELECT count(*) AS n_exact FROM hs),
    a AS ({" UNION ALL ".join(selects)})
    SELECT p,
           CAST(1 AS BIGINT) << CAST(p AS INT) AS m_registers,
           CAST(n_exact AS BIGINT) AS n_exact,
           round({est}, 4) AS hll_est,
           round((({est}) - n_exact) / n_exact, 6) AS rel_err,
           round(1.04 / sqrt({m_d}), 6) AS se_analytic
    FROM a, exact
    ORDER BY p
"""


ORACLES["sketch_hll_precision_sweep"] = _hll_sweep_oracle()
