"""Stop-shingle document-frequency cap (operators/dedup.py).

The shingle self-join's skew hazard: a shingle present in a large fraction
of documents joins quadratically.  The DF cap drops such shingles before
the join.  Three contracts:

1. Lossless on the test corpus — capped and uncapped pair sets are equal
   at sf0.001 (max observed DF fraction 1.8% < the 10% cap).
2. Under a planted stop-shingle, the cap removes the hot keys, collapsing
   the candidate join from O(n²) to the planted duplicates.
3. True near-duplicates survive the cap (their overlap comes from their
   shared *unique* content, not the stop phrase).
"""

import pytest
from pyspark.sql import functions as F

from hauser_spark.operators.dedup import (
    DF_CAP_FRAC,
    _shingles,
    hot_shingles,
    jaccard_pairs_frame,
)
from hauser_spark.tables import load_table

STOP = "the quick brown fox jumps over the lazy dog again and again"


def _skewed_docs(spark, n=60):
    """Every doc shares a 12-token stop phrase; docs 0 and 1 are planted
    near-duplicates of each other; the rest are pairwise unrelated."""
    rows = []
    for i in range(n):
        if i == 1:
            body = " ".join(f"unique0w{j}" for j in range(30)) + " tail1x"
        else:
            body = " ".join(f"unique{i}w{j}" for j in range(30))
        rows.append((i, f"{STOP} {body}"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cap_lossless_on_fixture(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    capped = {
        tuple(r) for r in jaccard_pairs_frame(docs, DF_CAP_FRAC).collect()
    }
    exact = {tuple(r) for r in jaccard_pairs_frame(docs, None).collect()}
    assert capped == exact
    assert exact, "fixture contains planted near-duplicates"


def test_cap_removes_planted_stop_shingles(spark):
    docs = _skewed_docs(spark)
    n_docs = docs.count()
    sh = _shingles(docs)
    hot = hot_shingles(sh, n_docs, DF_CAP_FRAC)
    # the stop phrase plants shingles shared by all 60 docs -> hot
    assert hot, "planted stop-shingles must exceed the cap"
    filtered = _shingles(docs, drop=hot)
    # after the drop no shingle exceeds the cap...
    max_df = (
        filtered.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("df"))
        .agg(F.max("df").alias("m"))
        .collect()[0]["m"]
    )
    assert max_df <= int(n_docs * DF_CAP_FRAC)
    # ...and the self-join input shrinks: each hot key would have
    # contributed ~n_docs^2/2 candidate rows.
    assert filtered.count() < sh.count()
    # sizes are recomputed post-drop (exact capped-universe Jaccard)
    n_sh_capped = filtered.filter(F.col("doc_id") == 2).agg(
        F.max("n_sh")
    ).collect()[0][0]
    n_sh_full = sh.filter(F.col("doc_id") == 2).agg(
        F.max("n_sh")
    ).collect()[0][0]
    assert n_sh_capped < n_sh_full


def test_true_duplicates_survive_cap(spark):
    docs = _skewed_docs(spark)
    pairs = jaccard_pairs_frame(docs, DF_CAP_FRAC).collect()
    assert [(r.d1, r.d2) for r in pairs] == [(0, 1)]


def test_unrelated_docs_not_paired_by_stop_phrase(spark):
    # without the planted dup, the capped join finds nothing: the stop
    # phrase alone must not manufacture pairs
    docs = _skewed_docs(spark).filter(F.col("doc_id") != 1)
    assert jaccard_pairs_frame(docs, DF_CAP_FRAC).count() == 0


def test_lsh_candidates_bounded_under_planted_stop_shingle(spark):
    """The LSH pair frame (the composition path for split-leakage,
    curation, cross-source) must not fan out on a corpus-wide stop
    phrase: a candidate needs a FULL band of minhashes to match, so 60
    docs sharing one 12-token phrase but otherwise unrelated produce a
    candidate set near the true near-dup count — not ~60²/2 — and the
    verified output is exactly the planted pair."""
    from hauser_spark.operators.dedup import (
        BANDS,
        N_HASHES,
        _minhash_signatures,
        lsh_pairs_frame,
    )

    docs = _skewed_docs(spark)
    n = docs.count()

    # candidate volume (pre-verification): band-key equijoin fan-out
    sh = _shingles(docs)
    sigs = _minhash_signatures(sh)
    rows_per_band = N_HASHES // BANDS
    band_cols = []
    for band in range(BANDS):
        members = [
            F.col(f"mh{band * rows_per_band + r}")
            for r in range(rows_per_band)
        ]
        band_cols.append(
            F.concat_ws(
                "_", F.lit(str(band)), *[m.cast("string") for m in members]
            )
        )
    banded = sigs.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("band_key")
    )
    cand = (
        banded.alias("x")
        .join(
            banded.alias("y"),
            (F.col("x.band_key") == F.col("y.band_key"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select("x.doc_id", "y.doc_id")
        .distinct()
        .count()
    )
    assert cand < n, f"candidate fan-out {cand} ~ quadratic ({n * (n-1) // 2})"

    # verified output: exactly the planted near-dup pair
    pairs = lsh_pairs_frame(docs).collect()
    assert [(r.d1, r.d2) for r in pairs] == [(0, 1)]


def test_absolute_cap_bounds_fanout_independent_of_corpus_size(spark):
    """HOT_ABS_CAP (VERDICT r3): a purely fractional cap admits a
    shingle in up to frac·N documents — (frac·N)² self-join rows for
    that one key, quadratic in corpus size, with nothing downstream to
    bound it (containment_pairs has no length-ratio filter by design).
    The absolute ceiling drops any shingle past a FIXED document
    frequency regardless of N.  Simulated with a shrunken ceiling: a
    phrase planted in 15 of 200 docs passes the 10% fractional cap
    (cap 20) but must be dropped by an absolute ceiling of 10."""
    import unittest.mock as um

    import hauser_spark.operators.dedup as dd

    n = 200
    planted = "alpha beta gamma delta epsilon zeta"
    rows = []
    for i in range(n):
        body = " ".join(f"u{i}w{j}" for j in range(12))
        if i < 15:
            body = f"{planted} {body}"
        rows.append((i, body))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = dd._shingles(docs)

    # fractional cap alone admits the planted hot key (15 <= 20)...
    assert dd.hot_shingles(sh, n, dd.DF_CAP_FRAC) == []
    # ...the absolute ceiling catches it
    with um.patch.object(dd, "HOT_ABS_CAP", 10):
        hot = dd.hot_shingles(sh, n, dd.DF_CAP_FRAC)
    assert hot, "absolute ceiling must catch the planted hot shingle"
    filtered = dd._shingles(docs, drop=hot)
    max_df = (
        filtered.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("df"))
        .agg(F.max("df"))
        .collect()[0][0]
    )
    # per-key self-join fan-out is now <= ceiling², independent of n
    assert max_df <= 10, max_df


def test_simhash_hamming_bucket_fanout_bounded(spark):
    """30-bit bands: unrelated docs must not pile into shared (band, v)
    buckets — the round-2 15-bit scheme had only 32k buckets per band,
    so bucket size grew as N/2^15 and the candidate join as N²/2^15.
    With 2^30 buckets a random pair collides in a band with p ≈ 2^-30:
    300 unrelated docs → expected ~1e-4 collisions.  Planted identical
    docs (hamming 0) must still be found through the bands."""
    from hauser_spark.operators.dedup import simhash_hamming_pairs
    import hauser_spark.operators.dedup as dd

    n = 300
    rows = [
        (i, " ".join(f"doc{i}tok{j}" for j in range(30))) for i in range(n)
    ]
    # plant: doc n and doc n+1 are identical (hamming 0)
    dup = " ".join(f"planted{j}" for j in range(30))
    rows += [(n, dup), (n + 1, dup)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    sigs = dd._simhash_wide_frame(docs)
    half = dd.HAM_WORD_BITS // dd.HAM_BITS
    exprs = []
    for b in range(dd.HAM_BANDS):
        w = f"w{b // half}"
        shift = (b % half) * dd.HAM_BITS
        exprs.append(
            f"named_struct('band', {b}, "
            f"'v', shiftright({w}, {shift}) & {(1 << dd.HAM_BITS) - 1})"
        )
    bands = sigs.selectExpr(
        "doc_id", f"explode(array({', '.join(exprs)})) AS bk"
    ).selectExpr("doc_id", "bk.band AS band", "bk.v AS v")
    bucket_max = (
        bands.groupBy("band", "v")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    # the only shared bucket is the planted identical pair
    assert bucket_max <= 2, bucket_max

    import unittest.mock as um

    with um.patch.object(dd, "load_table", lambda s, d, t: docs):
        out = [(r.d1, r.d2, r.hamming)
               for r in simhash_hamming_pairs(spark, "x").collect()]
    assert out == [(n, n + 1, 0)]
