"""Deterministic hash-based sampling for training-data curation.

Three sampling primitives a large-scale training pipeline needs, all
built on the 60-bit md5 hash (bit-identical in Spark, DuckDB and
Python) so each *random* operator is exactly reproducible and exactly
oracle-checkable:

- uniform sample: keep a row iff ``hash(doc_id) % 100 < rate`` — unlike
  ``df.sample()`` / ``rand()`` the decision is a pure function of the
  row key, so reruns, retried tasks, and different engines all select
  the same rows, and the sample composes with dedup (a doc keeps or
  loses membership independent of partitioning).
- stratified sample: per-language rates folded into one CASE
  expression — downsample the dominant language (en) to rebalance the
  corpus without a shuffle; the rate table is a compile-time literal,
  not a join.
- train/val/test split: disjoint hash-mod buckets (80/10/10) assigned
  in the same scan — split assignment is stable forever, so incremental
  re-runs never leak validation docs into train.

Scale design: every operator here is scan → narrow filter/projection →
(for the summaries) one partial-aggregated groupBy on a 5-value key.
No joins, no window, no Python; the sampling predicate is
whole-stage-codegen'd and evaluated next to the parquet reader, so at
100 TB the cost is the scan itself and the selected fraction is all
that crosses the shuffle. This is the property rand()-based sampling
loses: it cannot be pushed into a retryable task deterministically
(Spark re-executes lost tasks, and nondeterministic filters can
produce duplicate or dropped rows on retry).

The reference has no sampling surface (SURVEY §2.4 — its only
aggregates are watermark max()/count(), warehouse/redshift.go:308-315);
this module is part of the beyond-reference training-data surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_table

UNIFORM_PCT = 10

# Rebalance: en is ~40% of the corpus; keep every 'other' doc at 80%
# and downsample en to 30%.
STRATUM_PCT = {"de": 80, "en": 30, "es": 80, "fr": 80, "zh": 80}

TRAIN_PCT, VAL_PCT = 80, 10  # remainder (10) is test


def _h60(col: F.Column) -> F.Column:
    """60-bit md5-derived hash, identical in Spark and DuckDB."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10)
        .cast("long")
    )


def _bucket(col: F.Column) -> F.Column:
    return F.pmod(_h60(col), F.lit(100))


def sample_uniform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% uniform sample of documents (selected rows)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(_bucket(F.col("doc_id")) < UNIFORM_PCT)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language rebalancing sample: achieved counts and rates."""
    docs = load_table(spark, sf_dir, "documents")
    rate = F.lit(None).cast("int")
    expr = None
    for lang, pct in STRATUM_PCT.items():
        clause = (F.col("lang") == lang, F.lit(pct))
        expr = F.when(*clause) if expr is None else expr.when(*clause)
    rate = expr.otherwise(F.lit(0))
    kept = (_bucket(F.col("doc_id")) < rate).cast("long")
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(kept).alias("n_sampled"),
            F.round(
                F.sum(kept).cast("double") / F.count(F.lit(1)), 6
            ).alias("achieved_rate"),
        )
        .orderBy("lang")
    )


def sample_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-mod 80/10/10 train/val/test split, summarized per split+lang."""
    docs = load_table(spark, sf_dir, "documents")
    b = _bucket(F.col("doc_id"))
    split = (
        F.when(b < TRAIN_PCT, F.lit("train"))
        .when(b < TRAIN_PCT + VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                F.sum("n_chars").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_chars"),
        )
        .orderBy("split", "lang")
    )


WEIGHT_THETA = 3000.0  # chars at which inclusion probability saturates at 1


def _u01(col: F.Column) -> F.Column:
    """Deterministic uniform(0,1) draw from the 60-bit hash — the same
    IEEE division in every engine, so the draw is bit-identical."""
    return _h60(col) / F.lit(float(1 << 60))


def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson PPS sample: include doc i with probability
    min(1, n_chars/θ) — longer documents are more likely kept, the
    standard size-biased curation draw. The draw u_i is a pure function
    of doc_id, so the sample is reproducible across runs, engines and
    task retries (same property as sample_uniform)."""
    docs = load_table(spark, sf_dir, "documents")
    pi = F.least(F.lit(1.0), F.col("n_chars") / F.lit(WEIGHT_THETA))
    u = _u01(F.col("doc_id"))
    return (
        docs.filter(u < pi)
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.round(u, 6).alias("u"),
            F.round(pi, 6).alias("pi"),
        )
        .orderBy("doc_id")
    )


def sample_weighted_ht(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Horvitz-Thompson check of the PPS sample: per language, the exact
    corpus char total next to the HT estimate Σ n_chars/π over sampled
    docs — the unbiasedness audit a sampling pipeline ships with. The
    estimate sum uses per-term integer scaling (money_sum-style) so the
    distributed sum is combine-order independent."""
    docs = load_table(spark, sf_dir, "documents")
    pi = F.least(F.lit(1.0), F.col("n_chars") / F.lit(WEIGHT_THETA))
    u = _u01(F.col("doc_id"))
    kept = (u < pi).cast("long")
    ht_term = F.when(
        u < pi, F.col("n_chars") / pi
    ).otherwise(F.lit(0.0))
    return (
        docs.groupBy("lang")
        .agg(
            F.sum("n_chars").alias("exact_chars"),
            F.sum(kept).alias("n_sampled"),
            (
                F.sum(F.round(ht_term * 1000000).cast("long"))
                / F.lit(1000000.0)
            ).alias("ht_estimate"),
        )
        .orderBy("lang")
    )




AES_K = 50


def sample_weighted_aes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k=AES_K [Efraimidis &
    Spirakis 2006, "Weighted random sampling with a reservoir"]: each
    row draws key = ln(u)/w (order-equivalent to the classic u^(1/w))
    and the sample is the top-k keys — inclusion probability tracks the
    weight, and no row appears twice (the gap PPS sampling leaves).

    Scale shape: the draw is a pure per-row function of doc_id (no
    state, retry-safe); top-k compiles to TakeOrderedAndProject — each
    partition keeps k candidates, the driver merges — so there is no
    global sort and no reservoir to synchronize. With well-spread
    continuous keys the ordering is FP-robust; only the final ranking
    window runs, over k rows."""
    docs = load_table(spark, sf_dir, "documents")
    key = F.log(_u01(F.col("doc_id"))) / F.col("n_chars")
    top = (
        docs.select(
            "doc_id", F.col("n_chars").alias("weight"), key.alias("key")
        )
        .orderBy(F.desc("key"), F.asc("doc_id"))
        .limit(AES_K)
    )
    w = Window.orderBy(F.desc("key"), F.asc("doc_id"))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select("rank", "doc_id", "weight", F.round("key", 6).alias("aes_key"))
        .orderBy("rank")
    )


QUERIES = {
    "sample_weighted_aes": sample_weighted_aes,
    "sample_uniform": sample_uniform,
    "sample_stratified": sample_stratified,
    "sample_train_split": sample_train_split,
    "sample_weighted": sample_weighted,
    "sample_weighted_ht": sample_weighted_ht,
}

_H_SQL = "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100"

_RATE_SQL = "CASE " + " ".join(
    f"WHEN lang = '{lang}' THEN {pct}" for lang, pct in STRATUM_PCT.items()
) + " ELSE 0 END"

_H60_SQL = "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT"
_U_SQL = f"({_H60_SQL} / {float(1 << 60)!r})"
_PI_SQL = f"least(1.0, n_chars / {WEIGHT_THETA!r})"

ORACLES = {
    "sample_weighted_aes": f"""
        WITH keyed AS (
            SELECT doc_id, n_chars AS weight,
                   ln({_U_SQL}) / n_chars AS key
            FROM documents
        )
        SELECT ROW_NUMBER() OVER (ORDER BY key DESC, doc_id) AS rank,
               doc_id, weight, ROUND(key, 6) AS aes_key
        FROM keyed
        ORDER BY key DESC, doc_id
        LIMIT {AES_K}
    """,
    "sample_weighted": f"""
        SELECT doc_id, lang, n_chars,
               ROUND({_U_SQL}, 6) AS u,
               ROUND({_PI_SQL}, 6) AS pi
        FROM documents
        WHERE {_U_SQL} < {_PI_SQL}
        ORDER BY doc_id
    """,
    "sample_weighted_ht": f"""
        SELECT lang,
               CAST(sum(n_chars) AS BIGINT) AS exact_chars,
               CAST(sum(CASE WHEN {_U_SQL} < {_PI_SQL} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_sampled,
               sum(CAST(ROUND((CASE WHEN {_U_SQL} < {_PI_SQL}
                                    THEN n_chars / {_PI_SQL}
                                    ELSE 0.0 END) * 1000000) AS BIGINT))
                   / 1000000.0 AS ht_estimate
        FROM documents
        GROUP BY lang ORDER BY lang
    """,
    "sample_uniform": f"""
        SELECT doc_id, lang, source, n_chars
        FROM documents
        WHERE {_H_SQL} < {UNIFORM_PCT}
        ORDER BY doc_id
    """,
    "sample_stratified": f"""
        SELECT lang,
               count(*) AS n_total,
               CAST(sum(CASE WHEN {_H_SQL} < {_RATE_SQL} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_sampled,
               ROUND(CAST(sum(CASE WHEN {_H_SQL} < {_RATE_SQL}
                                   THEN 1 ELSE 0 END) AS DOUBLE)
                     / count(*), 6) AS achieved_rate
        FROM documents
        GROUP BY lang
        ORDER BY lang
    """,
    "sample_train_split": f"""
        WITH tagged AS (
            SELECT CASE WHEN {_H_SQL} < {TRAIN_PCT} THEN 'train'
                        WHEN {_H_SQL} < {TRAIN_PCT + VAL_PCT} THEN 'val'
                        ELSE 'test' END AS split,
                   lang, n_chars
            FROM documents
        )
        SELECT split, lang, count(*) AS n_docs,
               ROUND(CAST(sum(n_chars) AS DOUBLE) / count(*), 6)
                   AS avg_chars
        FROM tagged
        GROUP BY split, lang
        ORDER BY split, lang
    """,
}


def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-split contamination audit: near-duplicate document pairs
    that straddle the train/val/test boundary — the leak that silently
    inflates eval numbers when dedup runs after (or never before) the
    split.  Per ordered split pair: leaky-pair count and the smallest
    offending pair as the reproducible example.

    Scale shape: composes on the MinHash-LSH verified pair frame —
    candidates are banded-signature hash-join matches, so pair volume
    is bounded by the true near-dup count by construction (the exact
    shingle self-join, quadratic in a hot shingle's df, stays oracle-
    only); the split tag is a pure hash expression on each side, so the
    audit adds only a |pairs|-sized aggregation on top."""
    from .dedup import lsh_pairs_cached

    pairs = lsh_pairs_cached(spark, sf_dir).select("d1", "d2")

    def split_of(col):
        b = _bucket(col)
        return (
            F.when(b < TRAIN_PCT, F.lit("train"))
            .when(b < TRAIN_PCT + VAL_PCT, F.lit("val"))
            .otherwise(F.lit("test"))
        )

    tagged = pairs.select(
        "d1",
        "d2",
        F.least(split_of(F.col("d1")), split_of(F.col("d2"))).alias("sa"),
        F.greatest(split_of(F.col("d1")), split_of(F.col("d2"))).alias("sb"),
    ).filter(F.col("sa") != F.col("sb"))
    return (
        tagged.groupBy("sa", "sb")
        .agg(
            F.count(F.lit(1)).alias("n_leaky_pairs"),
            F.min(F.struct("d1", "d2")).alias("__ex"),
        )
        .select(
            F.col("sa").alias("split_a"),
            F.col("sb").alias("split_b"),
            "n_leaky_pairs",
            F.col("__ex.d1").alias("example_d1"),
            F.col("__ex.d2").alias("example_d2"),
        )
        .orderBy("split_a", "split_b")
    )


def _split_leakage_oracle() -> str:
    from .dedup import ORACLES as _DO

    split1 = (
        f"CASE WHEN ('0x' || substr(md5(CAST(d1 AS VARCHAR)), 1, 15))::BIGINT"
        f" % 100 < {TRAIN_PCT} THEN 'train'"
        f" WHEN ('0x' || substr(md5(CAST(d1 AS VARCHAR)), 1, 15))::BIGINT"
        f" % 100 < {TRAIN_PCT + VAL_PCT} THEN 'val' ELSE 'test' END"
    )
    split2 = split1.replace("d1", "d2")
    return f"""
        WITH pairs AS (
            SELECT d1, d2 FROM ({_DO["dedup_minhash_lsh"]})
        ),
        tagged AS (
            SELECT d1, d2,
                   least({split1}, {split2}) AS sa,
                   greatest({split1}, {split2}) AS sb
            FROM pairs
        ),
        leaky AS (SELECT * FROM tagged WHERE sa <> sb)
        SELECT sa AS split_a, sb AS split_b,
               count(*) AS n_leaky_pairs,
               (SELECT d1 FROM leaky x WHERE x.sa = t.sa AND x.sb = t.sb
                ORDER BY d1, d2 LIMIT 1) AS example_d1,
               (SELECT d2 FROM leaky x WHERE x.sa = t.sa AND x.sb = t.sb
                ORDER BY d1, d2 LIMIT 1) AS example_d2
        FROM leaky t
        GROUP BY sa, sb
        ORDER BY split_a, split_b
    """


QUERIES["sample_split_leakage"] = split_leakage_audit
ORACLES["sample_split_leakage"] = _split_leakage_oracle()


def dedup_aware_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-once sampling: keep exactly one document per near-dup
    cluster (the min-id canonical) and carry the cluster size as an
    importance weight — the RefinedWeb/FineWeb-style rule that keeps
    duplicated content from being over-represented while preserving
    corpus statistics through the weights (a Horvitz-Thompson estimator
    over the kept docs with weight w reproduces the full-corpus total).

    Composition: cluster labels come from the same connected-components
    pass as ``dedup_cluster_members`` (LSH near-dup ∪ exact-dup edges);
    singletons join in as their own cluster via a left join, so every
    document gets a verdict.  One label pass + one size aggregate —
    nothing quadratic beyond the already-bounded edge builder."""
    from .graph import cc_labels_cached

    docs = load_table(spark, sf_dir, "documents")
    labels = cc_labels_cached(spark, sf_dir).select(
        F.col("node").alias("doc_id"), F.col("label")
    )
    asg = (
        docs.select("doc_id")
        .join(labels, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("label"), F.col("doc_id")).alias("cluster_id"),
        )
    )
    sizes = asg.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("weight"))
    return (
        asg.join(sizes, "cluster_id")
        .select(
            "doc_id",
            "cluster_id",
            "weight",
            (F.col("doc_id") == F.col("cluster_id")).alias("keep"),
        )
        .orderBy("doc_id")
    )


QUERIES["sample_dedup_aware"] = dedup_aware_sample


def _dedup_aware_oracle() -> str:
    from .graph import _CLUSTERS_CTE

    return f"""
    WITH RECURSIVE {_CLUSTERS_CTE},
    asg AS (
        SELECT d.doc_id,
               COALESCE(l.cluster_id, d.doc_id) AS cluster_id
        FROM documents d LEFT JOIN labels l ON l.doc_id = d.doc_id
    ),
    sz AS (
        SELECT cluster_id, count(*) AS weight FROM asg GROUP BY cluster_id
    )
    SELECT a.doc_id, a.cluster_id, CAST(sz.weight AS BIGINT) AS weight,
           a.doc_id = a.cluster_id AS keep
    FROM asg a JOIN sz ON a.cluster_id = sz.cluster_id
    ORDER BY a.doc_id
"""


ORACLES["sample_dedup_aware"] = _dedup_aware_oracle()


# ---------------------------------------------- class-balanced sample

def balanced_class_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling over the labeled embedding corpus:
    every label keeps exactly min-class-size vectors, chosen by md5
    rank — the deterministic fix for class imbalance before training a
    probe/classifier (the label-skew twin of ``quality_source_cap``'s
    fixed-K rule: here the cap is DATA-derived, the minority size).

    Scale: one cells-only aggregate finds the floor (broadcast back),
    and membership is a per-class md5-rank window — same shapes as the
    source cap; retry-safe because the kept set is a pure function of
    ids.  Output is the per-label scoreboard plus an exact integer
    checksum of kept ids, which pins the SELECTION (not just counts)
    cross-engine.
    """
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    floor_ = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n")).agg(
        F.min("n").alias("target")
    )
    h = F.md5(F.col("vec_id").cast("string"))
    w = Window.partitionBy("label").orderBy(h.asc(), F.col("vec_id").asc())
    ranked = emb.withColumn("rk", F.row_number().over(w)).crossJoin(
        F.broadcast(floor_)
    )
    kept = ranked.filter(F.col("rk") <= F.col("target"))
    before = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n_before"))
    after = kept.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_after"),
        F.sum("vec_id").alias("kept_id_sum"),
    )
    return (
        before.join(after, "label")
        .select(
            F.col("label").cast("long").alias("label"),
            "n_before",
            "n_after",
            F.expr(
                "CAST((2 * n_after * 1000000 + n_before)"
                " DIV (2 * n_before) AS DOUBLE) / 1e6"
            ).alias("frac_kept"),
            F.col("kept_id_sum").cast("long").alias("kept_id_sum"),
        )
        .orderBy("label")
    )


QUERIES["sample_balanced_class"] = balanced_class_sample

ORACLES["sample_balanced_class"] = """
    WITH ranked AS (
        SELECT label, vec_id,
               row_number() OVER (PARTITION BY label
                                  ORDER BY md5(CAST(vec_id AS VARCHAR)),
                                           vec_id) AS rk
        FROM embeddings
    ),
    floor_ AS (
        SELECT min(n) AS target FROM (
            SELECT label, count(*) AS n FROM embeddings GROUP BY label) t
    ),
    kept AS (
        SELECT label, vec_id FROM ranked CROSS JOIN floor_
        WHERE rk <= target
    ),
    before AS (
        SELECT label, count(*) AS n_before FROM embeddings GROUP BY label
    ),
    after AS (
        SELECT label, count(*) AS n_after, sum(vec_id) AS kept_id_sum
        FROM kept GROUP BY label
    )
    SELECT CAST(b.label AS BIGINT) AS label,
           CAST(b.n_before AS BIGINT) AS n_before,
           CAST(a.n_after AS BIGINT) AS n_after,
           CAST((2 * a.n_after * 1000000 + b.n_before)
                // (2 * b.n_before) AS DOUBLE) / 1e6 AS frac_kept,
           CAST(a.kept_id_sum AS BIGINT) AS kept_id_sum
    FROM before b JOIN after a USING (label)
    ORDER BY label
"""


# ------------------------------------------- systematic hash sample

SYSTEMATIC_K = 20  # keep 1-in-K in hash order
SYSTEMATIC_RESIDUE = 7


def systematic_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic 1-in-K sampling in hash order, with the per-source
    representativeness audit: select documents whose 60-bit md5 key
    hash ≡ r (mod K) — the reproducible, coordination-free sampling
    every distributed pipeline uses when "every 20th row" must mean the
    same rows on every run and every engine — and report per source the
    achieved rate against 1/K.

    Exact: the hash is the engine-portable md5 device; rates are ppm
    integer devices.  Scale: pure map-side filter + one per-source
    aggregate; no ordering, no shuffle of the sample itself.
    """
    docs = load_table(spark, sf_dir, "documents")
    h = F.expr(
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15),"
        " 16, 10) AS BIGINT)"
    )
    m = docs.select(
        "source",
        (F.pmod(h, F.lit(SYSTEMATIC_K)) == SYSTEMATIC_RESIDUE)
        .cast("long")
        .alias("picked"),
    )
    return (
        m.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("picked").alias("n_sampled"),
        )
        .selectExpr(
            "source",
            "n_docs",
            "n_sampled",
            "(2*n_sampled*1000000 + n_docs) DIV (2*n_docs)"
            " AS rate_ppm",
            f"abs((2*n_sampled*1000000 + n_docs) DIV (2*n_docs)"
            f" - 1000000 DIV {SYSTEMATIC_K}) AS rate_dev_ppm",
        )
        .orderBy("source")
    )


QUERIES["sample_systematic_hash"] = systematic_hash_sample

ORACLES["sample_systematic_hash"] = f"""
    WITH m AS (
        SELECT source,
               CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                         1, 15))::BIGINT
                         % {SYSTEMATIC_K} = {SYSTEMATIC_RESIDUE}
                    THEN 1 ELSE 0 END AS picked
        FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(picked) AS BIGINT) AS n_sampled,
           CAST((2*sum(picked)*1000000 + count(*)) // (2*count(*))
                AS BIGINT) AS rate_ppm,
           CAST(abs((2*sum(picked)*1000000 + count(*)) // (2*count(*))
                - 1000000 // {SYSTEMATIC_K}) AS BIGINT) AS rate_dev_ppm
    FROM m GROUP BY source ORDER BY source
"""


# ------------------------------- sampler uniformity (chi-square GOF)

GOF_BUCKETS = 20
GOF_CHI2_CRIT_19 = 30.143527  # chi-square(19) 95th percentile


def sample_rate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square goodness-of-fit audit of the deterministic md5
    sampler: fold doc_ids into 20 hash buckets and test the bucket
    counts against uniform — the evidence that hash-based sampling
    (every sample_* operator here) is unbiased, and the canary that
    would catch a broken hash or a skewed id space.

    χ² = Σ(B·o − n)²/(B·n) — an exact rational of integer counts; the
    only doubles are the final division.  Scale: one map-side bucket
    count; the test runs on B rows.
    """
    docs = load_table(spark, sf_dir, "documents")
    b = docs.select(
        F.pmod(
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
                16,
                10,
            ).cast("long"),
            F.lit(GOF_BUCKETS),
        ).alias("bucket")
    )
    o = b.groupBy("bucket").agg(F.count(F.lit(1)).alias("o"))
    B = GOF_BUCKETS
    return (
        o.crossJoin(F.broadcast(o.agg(F.sum("o").alias("n"))))
        .groupBy("n")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.min("o").alias("min_bucket"),
            F.max("o").alias("max_bucket"),
            F.sum(
                (F.lit(float(B)) * F.col("o") - F.col("n"))
                * (F.lit(float(B)) * F.col("o") - F.col("n"))
            ).alias("ss"),
        )
        .selectExpr(
            "CAST(n AS BIGINT) AS n_docs",
            "CAST(n_buckets AS BIGINT) AS n_buckets",
            "CAST(min_bucket AS BIGINT) AS min_bucket",
            "CAST(max_bucket AS BIGINT) AS max_bucket",
            f"round(ss / ({float(B)} * n), 6) AS chi2",
            f"CAST(CASE WHEN ss / ({float(B)} * n) > {GOF_CHI2_CRIT_19}"
            " THEN 1 ELSE 0 END AS BIGINT) AS reject_uniform",
        )
    )


QUERIES["sample_rate_audit"] = sample_rate_audit

ORACLES["sample_rate_audit"] = f"""
    WITH b AS (
        SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
               ::BIGINT % {GOF_BUCKETS} AS bucket
        FROM documents
    ),
    o AS (SELECT bucket, count(*) AS o FROM b GROUP BY 1),
    tot AS (SELECT sum(o) AS n FROM o)
    SELECT CAST(any_value(t.n) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(min(o.o) AS BIGINT) AS min_bucket,
           CAST(max(o.o) AS BIGINT) AS max_bucket,
           round(sum(({GOF_BUCKETS}.0*o.o - t.n)
                     * ({GOF_BUCKETS}.0*o.o - t.n))
                 / ({GOF_BUCKETS}.0*any_value(t.n)), 6) AS chi2,
           CAST(CASE WHEN sum(({GOF_BUCKETS}.0*o.o - t.n)
                              * ({GOF_BUCKETS}.0*o.o - t.n))
                          / ({GOF_BUCKETS}.0*any_value(t.n))
                          > {GOF_CHI2_CRIT_19}
                THEN 1 ELSE 0 END AS BIGINT) AS reject_uniform
    FROM o, tot t
"""


# ------------------------------- leakage-safe group k-fold split

KFOLD_K = 5


def group_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe K-fold assignment: every USER (the leakage group)
    lands in exactly one of 5 folds by deterministic md5 hash, and the
    readout is each fold's user/event/value mass — the split table an
    eval pipeline materializes once and joins everywhere.  Group-level
    hashing is what makes it leakage-safe: no user's events can span a
    train/test boundary, by construction rather than by audit.

    Scale: one distinct-users pass, one broadcast join of the
    user→fold map onto the fact scan (at 100 TB the map is still
    users-sized — bucket or partition it by user_id and the join
    co-locates).
    """
    ev = load_table(spark, sf_dir, "events")
    f = (
        ev.select("user_id")
        .distinct()
        .select(
            "user_id",
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.col("user_id").cast("string")), 1, 15
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(KFOLD_K),
            ).alias("fold"),
        )
    )
    joined = ev.join(F.broadcast(f), "user_id").select(
        "user_id",
        "fold",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    # compute-once: the total is the SUM of the per-fold counts (every
    # event lands in exactly one fold), so aggregate per fold first and
    # derive n from the K-row frame — the old shape re-evaluated the
    # whole events⋈fold-map subtree a second time for the global count.
    # Checkpoint: the K-row aggregate has two consumers (tot + itself).
    per = (
        joined.groupBy("fold")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("value_cents"),
        )
        .localCheckpoint(eager=False)
    )
    tot = per.agg(F.sum("n_events").alias("n"))
    return (
        per.crossJoin(F.broadcast(tot))
        .selectExpr(
            "fold",
            "CAST(n_users AS BIGINT) AS n_users",
            "n_events",
            "(2*n_events*1000000 + n) DIV (2*n) AS event_share_ppm",
            "value_cents",
        )
        .orderBy("fold")
    )


QUERIES["sample_group_kfold"] = group_kfold

ORACLES["sample_group_kfold"] = f"""
    WITH f AS (
        SELECT user_id,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
               ::BIGINT % {KFOLD_K} AS fold
        FROM (SELECT DISTINCT user_id FROM events)
    ),
    ev AS (
        SELECT e.user_id, f.fold,
               CAST(round(e.value * 100) AS BIGINT) AS cents
        FROM events e JOIN f USING (user_id)
    ),
    tot AS (SELECT count(*) AS n FROM ev)
    SELECT fold,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST((2*count(*)*1000000 + t.n) // (2*t.n) AS BIGINT)
               AS event_share_ppm,
           CAST(sum(cents) AS BIGINT) AS value_cents
    FROM ev, tot t GROUP BY fold, t.n ORDER BY fold
"""


# ------------------------------- Neyman optimal stratum allocation


def neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal sample allocation across language strata: the
    share of a fixed sampling budget each stratum should get is
    ∝ N_h·σ_h (stratum size × within-stratum spread of the measure,
    here n_chars) — next to the proportional share, so the table reads
    directly as "which strata are under-sampled by naive allocation".

    σ_h comes from exact integer moments; N_h·σ_h freezes to an
    integer before the cross-stratum normalizer sum (no float sum
    order).  Scale: one map-side moment aggregate per stratum.
    """
    docs = load_table(spark, sf_dir, "documents")
    g = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("s"),
        F.sum(F.expr("n_chars * n_chars")).alias("q"),
    )
    w = g.selectExpr(
        "lang",
        "n",
        "CAST(round(n * sqrt((q - CAST(s AS DOUBLE) * s / n) / (n - 1)))"
        " AS BIGINT) AS nsd",
    )
    tot = w.agg(F.sum("n").alias("nn"), F.sum("nsd").alias("tns"))
    return (
        w.crossJoin(F.broadcast(tot))
        .selectExpr(
            "lang",
            "n AS n_docs",
            "(2*n*1000000 + nn) DIV (2*nn) AS proportional_ppm",
            "(2*nsd*1000000 + tns) DIV (2*tns) AS neyman_ppm",
        )
        .orderBy("lang")
    )


QUERIES["sample_neyman_allocation"] = neyman_allocation

ORACLES["sample_neyman_allocation"] = """
    WITH g AS (
        SELECT lang, count(*) AS n, sum(n_chars) AS s,
               sum(n_chars * n_chars) AS q
        FROM documents GROUP BY 1
    ),
    w AS (
        SELECT lang, n,
               CAST(round(n * sqrt((q - CAST(s AS DOUBLE) * s / n)
                                   / (n - 1))) AS BIGINT) AS nsd
        FROM g
    ),
    tot AS (SELECT sum(n) AS nn, sum(nsd) AS tns FROM w)
    SELECT lang, CAST(n AS BIGINT) AS n_docs,
           CAST((2*n*1000000 + t.nn) // (2*t.nn) AS BIGINT)
               AS proportional_ppm,
           CAST((2*nsd*1000000 + t.tns) // (2*t.tns) AS BIGINT)
               AS neyman_ppm
    FROM w, tot t ORDER BY lang
"""


# ------------------------------------- IPF raking (marginal calibration)

IPF_ROUNDS = 3


def ipf_raking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative-proportional-fitting (raking) weights for the
    (lang × source) grid: the classic survey-calibration / mixture-
    matching step — find per-cell sampling weights so the weighted
    corpus hits a UNIFORM language marginal while preserving each
    source's observed volume.  ``sample_stratified`` rebalances one
    margin with a literal rate table; raking calibrates BOTH margins
    simultaneously, which no single-margin rate table can.

    Determinism: weights live as 1e6-scaled integers and each
    half-round multiplies by an integer target/current ratio with DIV
    (the integer-freeze discipline of ``sim_pca_power_iteration``), so
    all ``IPF_ROUNDS`` unrolled rounds are exact integer arithmetic —
    bit-identical in both engines, no compounding float drift.

    Scale: the fact table reduces to |langs|·|sources| cells at the
    first map-side aggregate; every subsequent round is two tiny
    keyed aggregates + joins on the CELL frame (≤ a few hundred rows
    regardless of corpus size), declared lazily as one plan — the
    100 TB cost is the one scan.
    """
    docs = load_table(spark, sf_dir, "documents")
    # cached: the |langs|·|sources| cell frame feeds tot, src_tot AND
    # the weight iteration; uncached, every round's materialization
    # re-ran the documents scan through the tot/src_tot lineage
    cells = (
        docs.groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n"))
        .cache()
    )
    tot = cells.agg(
        F.sum("n").alias("t_all"),
        F.countDistinct("lang").alias("n_lang"),
    )
    src_tot = cells.groupBy("source").agg(F.sum("n").alias("m_s"))
    # ratio arithmetic in DECIMAL(38,0): w·T·10⁶ passes 2^63 once the
    # corpus passes ~10⁷ docs, and DuckDB's BIGINT sums auto-widen to
    # HUGEINT anyway — decimal DIV keeps both engines exact and
    # identical at any corpus size (w itself always fits a long).
    w = cells.withColumn("w", F.lit(1000000).cast("long"))
    for _ in range(IPF_ROUNDS):
        lang_cur = w.groupBy("lang").agg(
            F.sum(
                (F.col("n") * F.col("w")).cast("decimal(38,0)")
            ).alias("cur_l")
        )
        w = (
            w.join(lang_cur, "lang")
            .crossJoin(F.broadcast(tot))
            .selectExpr(
                "lang",
                "source",
                "n",
                "(CAST(w AS DECIMAL(38,0)) * t_all * 1000000)"
                " DIV (n_lang * cur_l) AS w",
            )
        )
        src_cur = w.groupBy("source").agg(
            F.sum(
                (F.col("n") * F.col("w")).cast("decimal(38,0)")
            ).alias("cur_s")
        )
        w = (
            w.join(src_cur, "source")
            .join(F.broadcast(src_tot), "source")
            .selectExpr(
                "lang",
                "source",
                "n",
                "(CAST(w AS DECIMAL(38,0)) * m_s * 1000000)"
                " DIV (cur_s) AS w",
            )
        )
        # lineage truncation per round (the graph-family device): each
        # half-round references the previous weight frame twice, so the
        # unrolled plan re-expands the cell subtree 2^(2·rounds) times
        # without it (520 exchanges in the round-6 plan audit; the data
        # is a ≤ few-hundred-row cell frame).  localCheckpoint, not
        # cache(): cache leaves the LOGICAL lineage intact (an
        # InMemoryRelation only short-circuits physical planning), so
        # the exponential re-expansion still happens at analysis time —
        # probed in round 12: the cache variant measured ~0.5 s SLOWER
        # than this checkpointed shape.
        w = w.localCheckpoint(eager=False)
    return w.selectExpr(
        "lang",
        "source",
        "CAST(n AS BIGINT) AS n_docs",
        "CAST(w AS BIGINT) AS weight_ppm",
        "CAST(n * w AS BIGINT) AS expected_docs_micro",
    ).orderBy("lang", "source")


QUERIES["sample_ipf_raking"] = ipf_raking


def _ipf_oracle() -> str:
    body = [
        """
    cells AS (
        SELECT lang, source, count(*) AS n FROM documents GROUP BY 1, 2
    ),
    tot AS (
        SELECT sum(n) AS t_all, count(DISTINCT lang) AS n_lang FROM cells
    ),
    src_tot AS (SELECT source, sum(n) AS m_s FROM cells GROUP BY 1),
    w0 AS (SELECT lang, source, n, CAST(1000000 AS BIGINT) AS w
           FROM cells)"""
    ]
    prev = "w0"
    for r in range(IPF_ROUNDS):
        body.append(f"""
    lc_{r} AS (SELECT lang, sum(CAST(n AS HUGEINT) * w) AS cur_l
               FROM {prev} GROUP BY 1),
    wl_{r} AS MATERIALIZED (
        SELECT p.lang, p.source, p.n,
               (CAST(p.w AS HUGEINT) * t.t_all * 1000000)
                 // (t.n_lang * l.cur_l) AS w
        FROM {prev} p JOIN lc_{r} l ON l.lang = p.lang, tot t
    ),
    sc_{r} AS (SELECT source, sum(CAST(n AS HUGEINT) * w) AS cur_s
               FROM wl_{r} GROUP BY 1),
    ws_{r} AS MATERIALIZED (
        SELECT p.lang, p.source, p.n,
               (CAST(p.w AS HUGEINT) * m.m_s * 1000000) // (s.cur_s) AS w
        FROM wl_{r} p JOIN sc_{r} s ON s.source = p.source
        JOIN src_tot m ON m.source = p.source
    )""")
        prev = f"ws_{r}"
    return (
        "\n    WITH "
        + ",".join(body)
        + f"""
    SELECT lang, source,
           CAST(n AS BIGINT) AS n_docs,
           CAST(w AS BIGINT) AS weight_ppm,
           CAST(n * w AS BIGINT) AS expected_docs_micro
    FROM {prev}
    ORDER BY lang, source
"""
    )


ORACLES["sample_ipf_raking"] = _ipf_oracle()


# ----------------------------------- allocation variance comparison

SAMPLE_BUDGET = 100  # total draws split across strata


def allocation_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified-design shootout: the variance of the stratified mean
    estimator Var = Σ W_h²·S_h²/n_h under PROPORTIONAL, NEYMAN, and
    EQUAL allocation of the same budget — the table that says what
    Neyman's N_h·σ_h rule is actually worth on THIS corpus
    ([[sample_neyman_allocation]] emits the optimal shares; this
    prices all three designs in estimator variance and efficiency vs
    proportional, which is the number a sampling-design review asks
    for).

    Exactness: S_h² comes from exact integer moments; every
    per-stratum variance term freezes to a nano integer BEFORE the
    cross-stratum sum (no float sum order); allocations stay
    unrounded doubles inside the term (the design comparison, not an
    integer sampler).  Scale shape: one moment aggregate per stratum,
    a 1-row totals broadcast back, one |strata|-row aggregate stacked
    to 3 scheme rows by inline.
    """
    docs = load_table(spark, sf_dir, "documents")
    g = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("s"),
        F.sum(F.expr("n_chars * n_chars")).alias("q"),
    )
    w = g.selectExpr(
        "lang",
        "n",
        "(q - CAST(s AS DOUBLE) * s / n) / (n - 1) AS s2",
        "CAST(round(n * sqrt((q - CAST(s AS DOUBLE) * s / n) / (n - 1)))"
        " AS BIGINT) AS nsd",
    ).filter(
        # contract: degenerate strata — singletons (S² undefined,
        # n−1 = 0) or zero-variance strata (Neyman share 0, divide by
        # 0) — are EXCLUDED from the design comparison.  Without the
        # guard Spark's NULL-on-0/0 silently drops the term inside
        # sum() while DuckDB propagates inf — divergent failure modes.
        # Mirrored in the oracle's wv CTE.
        "n >= 2 AND nsd > 0"
    )
    tot = w.agg(
        F.sum("n").alias("nn"),
        F.count(F.lit(1)).alias("h"),
        F.sum("nsd").alias("tns"),
    )
    b = SAMPLE_BUDGET
    terms = w.crossJoin(F.broadcast(tot)).selectExpr(
        # W_h^2 S_h^2 / n_h with W_h = n/nn and each scheme's n_h
        "CAST(round((CAST(n AS DOUBLE) / nn) * (CAST(n AS DOUBLE) / nn)"
        f" * s2 / ({b}.0 * n / nn) * 1e9) AS BIGINT) AS t_prop",
        "CAST(round((CAST(n AS DOUBLE) / nn) * (CAST(n AS DOUBLE) / nn)"
        f" * s2 / ({b}.0 * nsd / tns) * 1e9) AS BIGINT) AS t_ney",
        "CAST(round((CAST(n AS DOUBLE) / nn) * (CAST(n AS DOUBLE) / nn)"
        f" * s2 / ({b}.0 / h) * 1e9) AS BIGINT) AS t_eq",
    )
    one = terms.agg(
        F.count(F.lit(1)).alias("n_strata"),
        F.sum("t_prop").alias("v_prop"),
        F.sum("t_ney").alias("v_ney"),
        F.sum("t_eq").alias("v_eq"),
    )
    return (
        one.selectExpr(
            "n_strata",
            "v_prop",
            "inline(array("
            "named_struct('s', 'equal', 'v', v_eq),"
            "named_struct('s', 'neyman', 'v', v_ney),"
            "named_struct('s', 'proportional', 'v', v_prop)))",
        )
        .selectExpr(
            "s AS scheme",
            "CAST(n_strata AS BIGINT) AS n_strata",
            "v AS var_nano",
            "CASE WHEN v = 0 THEN NULL ELSE"
            " (2 * v_prop * 1000000 + v) DIV (2 * v) END"
            " AS efficiency_vs_prop_ppm",
        )
        .orderBy("scheme")
    )


QUERIES["sample_allocation_variance"] = allocation_variance

ORACLES["sample_allocation_variance"] = f"""
    WITH g AS (
        SELECT lang, count(*) AS n, sum(n_chars) AS s,
               sum(n_chars * n_chars) AS q
        FROM documents GROUP BY lang
    ),
    w AS (
        SELECT lang, n,
               (q - CAST(s AS DOUBLE) * s / n) / (n - 1) AS s2,
               CAST(round(n * sqrt((q - CAST(s AS DOUBLE) * s / n)
                    / (n - 1))) AS BIGINT) AS nsd
        FROM g
    ),
    wv AS (
        -- degenerate strata (n < 2 or zero variance) are excluded
        -- from the design comparison; see the Spark-side contract
        SELECT * FROM w WHERE n >= 2 AND nsd > 0
    ),
    tot AS (
        SELECT sum(n) AS nn, count(*) AS h, sum(nsd) AS tns FROM wv
    ),
    terms AS (
        SELECT CAST(round((CAST(n AS DOUBLE) / nn)
                    * (CAST(n AS DOUBLE) / nn)
                    * s2 / ({SAMPLE_BUDGET}.0 * n / nn) * 1e9)
                    AS BIGINT) AS t_prop,
               CAST(round((CAST(n AS DOUBLE) / nn)
                    * (CAST(n AS DOUBLE) / nn)
                    * s2 / ({SAMPLE_BUDGET}.0 * nsd / tns) * 1e9)
                    AS BIGINT) AS t_ney,
               CAST(round((CAST(n AS DOUBLE) / nn)
                    * (CAST(n AS DOUBLE) / nn)
                    * s2 / ({SAMPLE_BUDGET}.0 / h) * 1e9)
                    AS BIGINT) AS t_eq
        FROM wv, tot
    ),
    one AS (
        SELECT count(*) AS n_strata, sum(t_prop) AS v_prop,
               sum(t_ney) AS v_ney, sum(t_eq) AS v_eq
        FROM terms
    )
    SELECT s AS scheme,
           CAST(n_strata AS BIGINT) AS n_strata,
           CAST(v AS BIGINT) AS var_nano,
           CAST(CASE WHEN v = 0 THEN NULL ELSE
               (2 * v_prop * 1000000 + v) // (2 * v) END AS BIGINT)
               AS efficiency_vs_prop_ppm
    FROM one, (
        SELECT 'equal' AS s, v_eq AS v FROM one
        UNION ALL SELECT 'neyman', v_ney FROM one
        UNION ALL SELECT 'proportional', v_prop FROM one
    ) ORDER BY scheme
"""
