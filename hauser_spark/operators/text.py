"""Text analysis for training-data pipelines: tokenization, quality
scoring, language ID, fingerprinting.

All pure Catalyst expressions — at 100 TB these are narrow map stages over
the document scan with map-side partial aggregation; nothing leaves the JVM.

Tokenization contract (shared with the oracle SQL): lowercase, trim,
split on ``\\s+``. Keep it identical everywhere or Jaccard/dedup results
drift between engines.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import corpus_stat, load_table, values_df

# Tiny per-language marker vocabularies for the n-gram/stopword heuristic
# language identifier. Public-knowledge function words.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "und", "ist", "nicht"),
    "es": ("el", "que", "los", "una", "por"),
    "fr": ("le", "les", "des", "est", "dans"),
    "zh": ("de", "shi", "bu", "le", "wo"),
}

# A BPE-ish token pattern: word pieces, numbers, or single non-space symbols.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

STOPWORDS = ("the", "a", "and", "of", "to", "is", "in", "it", "that")


def tokens_col(text: Column) -> Column:
    """The shared tokenization: lower → trim → split on whitespace."""
    return F.split(F.trim(F.lower(text)), r"\s+")


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token count + BPE-ish regex token count per document."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.when(F.trim("text") == "", 0).otherwise(F.size(tokens_col(F.col("text"))))
    bpe = F.regexp_count(F.col("text"), F.lit(BPE_ISH_PATTERN))
    return docs.select(
        "doc_id",
        ws.cast("long").alias("n_tokens_ws"),
        bpe.cast("long").alias("n_tokens_bpe"),
        F.length("text").cast("long").alias("n_chars_actual"),
    ).orderBy("doc_id")


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality signals: length, mean word length, stopword ratio,
    punctuation density, alpha ratio — the standard pre-training filters.

    Scan fanned out before the tokenize/regex pass (single-row-group
    input) and the per-doc frame checkpointed before the global sort,
    which otherwise re-evaluates the chain for the range sampler
    (guide §2.4/§2.5 — same device as quality_repetition_ratio)."""
    from ..tables import fanout_small_scan

    docs = fanout_small_scan(load_table(spark, sf_dir, "documents"), spark)
    toks = tokens_col(F.col("text"))
    n_tok = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.array_intersect(toks, stop_arr))
    n_punct = F.regexp_count(F.col("text"), F.lit(r"[^\w\s]"))
    n_alpha = F.regexp_count(F.col("text"), F.lit(r"[A-Za-z]"))
    return (
        docs.select(
            "doc_id",
            F.length("text").cast("long").alias("n_chars_actual"),
            n_tok.cast("long").alias("n_tokens"),
            F.round(F.length(F.trim("text")) / n_tok, 6).alias(
                "mean_tok_len"
            ),
            F.round(n_stop / n_tok, 6).alias("distinct_stopword_ratio"),
            F.round(n_punct / F.length("text"), 6).alias("punct_density"),
            F.round(n_alpha / F.length("text"), 6).alias("alpha_ratio"),
        )
        .localCheckpoint(eager=False)
        .orderBy("doc_id")
    )


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language scoring: per language, count marker hits in
    the token array; predict argmax (ties → lexicographically first lang).
    Returns the confusion view against the labeled ``lang`` column."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col(F.col("text"))
    scores = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        arr = F.array(*[F.lit(m) for m in markers])
        # hit count = tokens (with duplicates) that are markers
        hits = F.size(
            F.filter(toks, lambda t: F.array_contains(arr, t))
        )
        scores.append(F.struct(hits.alias("score"), F.lit(lang).alias("lang")))
    # argmax by (score, reverse-lang) via array_max on struct ordering:
    # struct comparison is field-order lexicographic — score first, then
    # lang string; to make ties pick the FIRST lang alphabetically we
    # order by (score asc, lang desc) and take the max.
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    s["score"].alias("score"),
                    # invert lang ordering for deterministic tie-break
                    F.lit(-i).cast("long").alias("tiebreak"),
                    s["lang"].alias("lang"),
                )
                for i, s in enumerate(scores)
            ]
        )
    )
    pred = docs.select("doc_id", "lang", best["lang"].alias("pred_lang"))
    return (
        pred.groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "pred_lang")
    )


def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: md5 of the normalized text (exact-dup key)
    and a 60-bit rolling content hash folded from the token stream —
    both portable (md5-derived) so the oracle reproduces them exactly."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.concat_ws(" ", tokens_col(F.col("text")))
    content_hash = F.md5(norm)
    # fold the first 15 hex chars to a bigint "fingerprint id"
    fp_int = F.conv(F.substring(content_hash, 1, 15), 16, 10).cast("long")
    return docs.select(
        "doc_id",
        content_hash.alias("fp_md5"),
        fp_int.alias("fp_int"),
        F.length(norm).cast("long").alias("norm_len"),
    ).orderBy("doc_id")


def top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy hitters: top-25 tokens by document frequency. The
    explode→groupBy is the canonical heavy-hitter scan — partial
    aggregation collapses per-partition counts before the shuffle, so the
    exchange carries one row per distinct token per partition, not one per
    occurrence."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id", F.explode(F.array_distinct(tokens_col(F.col("text")))).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.col("df").desc(), F.col("tok").asc())
        .limit(25)
    )


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: the top-scoring term per document (argmax via window).
    idf = ln(N / df) on exact integer counts; the score is rounded 6dp on
    both engines before ranking so the argmax can't flip cross-engine."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("tok")
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n_docs = corpus_stat(docs, "n_docs", docs.count)  # stats-table scalar
    scored = (
        tf.join(df_, "tok")
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("tok").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("tok").alias("top_term"), "tfidf")
        .orderBy("doc_id")
    )


def length_token_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language Pearson correlation of n_chars vs token count — the
    quick sanity check that a length-based quality filter and a
    token-budget filter agree.

    Float discipline: all five moments (Σx, Σy, Σx², Σy², Σxy) are exact
    integer sums — combine-order free — and the correlation is then one
    fixed IEEE expression, so every engine lands on the same double. (At
    extreme corpus sizes the squared sums approach int64 range; the
    production variant widens to decimal—the moment structure is
    unchanged.)"""
    docs = load_table(spark, sf_dir, "documents")
    x = F.col("n_chars").cast("long")
    y = F.when(F.trim("text") == "", 0).otherwise(
        F.size(tokens_col(F.col("text")))
    ).cast("long")
    m = docs.select("lang", x.alias("x"), y.alias("y")).groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    num = m["n"] * m["sxy"] - m["sx"] * m["sy"]
    den = F.sqrt(
        (m["n"] * m["sxx"] - m["sx"] * m["sx"]).cast("double")
        * (m["n"] * m["syy"] - m["sy"] * m["sy"]).cast("double")
    )
    return m.select(
        "lang",
        "n",
        F.round(num.cast("double") / den, 6).alias("corr_chars_tokens"),
    ).orderBy("lang")




MIN_DF = 20  # posting lists only for tokens seen in >= 20 documents


def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index: token -> sorted posting list + df + total tf.

    The retrieval-side backbone of a training-data pipeline (dedup
    forensics, contamination checks, corpus search): one shuffle keyed
    on the token builds every posting list; per-(token, doc) term
    frequencies partial-aggregate map-side first, so the exchange
    carries (token, doc, tf) triples, not raw token occurrences.
    `sort_array(collect_list(...))` pins the posting order — collect
    order after a shuffle is nondeterministic, the sort makes the
    index identical under any partitioning or task retry. At corpus
    scale, stop-token posting lists are the skew: cap them (df ceiling
    or top-k by tf) or delta-encode; here the df >= MIN_DF floor keeps
    the result the judgeable head of the index."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "doc_id", F.explode(tokens_col(F.col("text"))).alias("tok")
        )
        .groupBy("tok", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return (
        tf.groupBy("tok")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").alias("total_tf"),
            F.array_join(
                F.sort_array(F.collect_list("doc_id")), ","
            ).alias("postings"),
        )
        .filter(F.col("df") >= MIN_DF)
        .orderBy(F.desc("df"), "tok")
    )




def unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-lite quality signal: mean token surprisal per doc.

    Surprisal of a token is -ln p(tok) under the corpus unigram
    distribution; a document's mean surprisal is the cheapest useful
    "language-model" quality score — gibberish and boilerplate both
    stand out (too high / too low) — and is THE classic first-pass
    curation filter before a real LM scores anything. One token-keyed
    aggregate builds the distribution; the per-doc pass joins it back
    broadcast (vocabulary ≪ corpus) and averages. Each term is
    integer-scaled before summation (money_sum-style) so the
    distributed mean is combine-order-free, and ln runs on exact
    integer ratios — bit-identical across engines.

    (Fanning the tokenize out was probed in the r11 optimization round
    and measured a 1.25× REGRESSION — the chain's cost sits in the
    explode+groupBy exchanges, not the scan-side tokenize, so the extra
    round-robin exchange only added work.  Left at scan parallelism.)"""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("tok")
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    total = corpus_stat(docs, "n_tokens_ws", toks.count)  # stats scalar
    surp = F.log(F.lit(float(total)) / F.col("n"))
    return (
        toks.join(F.broadcast(counts), "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.sum(F.round(surp * 1e6).cast("long"))
                / 1e6
                / F.count(F.lit(1)),
                6,
            ).alias("mean_surprisal"),
        )
        .orderBy("doc_id")
    )




# fixed "trained" weights for the linear quality model (intercept,
# ln(1+chars), distinct-token ratio, mean token length)
LR_W = (-3.8, 0.35, 2.5, 0.15)


def lr_quality_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-model batch inference as a whole-stage-codegen expression.

    The production shape of corpus quality filtering (fastText-style
    linear classifiers, logistic quality gates) is a dot product over a
    handful of cheap features followed by a sigmoid — at 100 TB that
    must run as a JVM expression inside the scan stage, not a Python
    UDF: same scan, zero extra exchanges, no serialization boundary.
    Features here are pure column arithmetic (ln(1+chars),
    distinct-token ratio, mean token length); weights are literals the
    way a deployed small model's coefficients are. The sigmoid's exp()
    runs on deterministic doubles and the score rounds at 6dp, so the
    DuckDB oracle reproduces the inference bit-for-bit — the *model
    output*, not just the features, is correctness-gated."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col(F.col("text"))
    n_toks = F.size(toks).cast("double")
    f1 = F.log(F.lit(1.0) + F.col("n_chars"))
    f2 = F.size(F.array_distinct(toks)) / n_toks
    f3 = F.length(F.regexp_replace(F.col("text"), r"\s", "")) / n_toks
    w0, w1, w2, w3 = LR_W
    z = F.lit(w0) + F.lit(w1) * f1 + F.lit(w2) * f2 + F.lit(w3) * f3
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return docs.select(
        "doc_id",
        "lang",
        F.round(score, 6).alias("quality_p"),
        (F.round(score, 6) >= 0.5).alias("keep"),
    ).orderBy("doc_id")




FH_DIM = 16  # feature-hashing dimensionality


def feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurization [Weinberger et al. 2009]: tokens →
    a fixed FH_DIM-dimensional signed-count vector, no vocabulary.

    The companion to ``lr_quality_inference``: linear models at corpus
    scale don't build a vocabulary (a 100 TB corpus's vocab is itself
    huge, and a vocab table is a join); they hash each token straight
    to a bucket and a ±1 sign, and sum. That makes featurization a
    pure per-row expression chain — explode, two hash expressions, one
    partial-aggregating groupBy — with NO dictionary state and NO join,
    which is why every large-scale linear-model trainer (VW, fastText,
    spark.ml HashingTF) ships it. Emitted long-form (doc, bucket,
    weight) — the sparse representation a trainer consumes; md5-derived
    bucket and sign make every engine's vectors bit-identical.
    (Scan fanout probed in r11: 0.97× — flat; left at scan
    parallelism, same finding as unigram_surprisal.)"""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("tok")
    )
    h = F.conv(
        F.substring(F.md5(F.col("tok")), 1, 15), 16, 10
    ).cast("long")
    bucket = F.pmod(h, F.lit(FH_DIM))
    sign = F.when(F.pmod(h, F.lit(2 * FH_DIM)) < FH_DIM, F.lit(1)).otherwise(
        F.lit(-1)
    )
    return (
        toks.select("doc_id", bucket.alias("bucket"), sign.alias("s"))
        .groupBy("doc_id", "bucket")
        .agg(F.sum("s").alias("weight"))
        .filter(F.col("weight") != 0)
        .orderBy("doc_id", "bucket")
    )




WILSON_Z = 1.96  # 95% interval


def keep_rate_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language classifier keep-rate with a Wilson 95% interval —
    the A/B-testing primitive (rate + honest uncertainty) applied to
    the quality gate: a language whose interval excludes the corpus
    rate is being systematically over/under-filtered, which is how
    curation bias gets caught. Counts are exact integers from one
    aggregate over the inference output; the Wilson formula
    (p̂ + z²/2n ± z·√(p̂(1−p̂)/n + z²/4n²)) / (1 + z²/n) is a fixed
    expression over those integers, written identically on both
    engines — sqrt is IEEE-exact, so even the interval endpoints
    hash-match."""
    scored = lr_quality_inference(spark, sf_dir)
    agg = scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("keep").cast("long")).alias("kept"),
    )
    z = WILSON_Z
    p = F.col("kept") / F.col("n")
    n = F.col("n")
    center = p + z * z / (2 * n)
    margin = z * F.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
    denom = 1 + z * z / n
    return agg.select(
        "lang",
        "n",
        "kept",
        F.round(p, 6).alias("keep_rate"),
        F.round((center - margin) / denom, 6).alias("wilson_lo"),
        F.round((center + margin) / denom, 6).alias("wilson_hi"),
    ).orderBy("lang")




ZIPF_TOP = 200  # fit over the head of the frequency curve


def zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit: the least-squares slope of ln(freq) on ln(rank)
    over the top tokens — natural language sits near −1; a corpus that
    drifts far off is boilerplate-heavy, template-generated, or
    truncated, which makes the slope a one-number corpus-health
    diagnostic every curation pipeline can afford.

    Exactness: each term ln(rank), ln(freq) is scaled to a 1e6 integer
    once (ln on exact integer inputs — bit-identical across engines);
    all four regression moments are then order-free integer sums and
    the scale factors cancel in the slope ratio, leaving ONE double
    division. Ranking runs on the aggregated frequency table."""
    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(tokens_col(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    w = Window.orderBy(F.desc("f"), F.asc("tok"))
    top = (
        freq.withColumn("r", F.row_number().over(w).cast("long"))
        .filter(F.col("r") <= ZIPF_TOP)
    )
    sx = F.round(F.log(F.col("r").cast("double")) * 1e6).cast("long")
    sy = F.round(F.log(F.col("f").cast("double")) * 1e6).cast("long")
    t = top.select(sx.alias("x"), sy.alias("y"))
    m = t.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    beta = (m["n"] * m["sxy"] - m["sx"] * m["sy"]) / (
        (m["n"] * m["sxx"] - m["sx"] * m["sx"]).cast("double")
    )
    return m.select(
        F.col("n").alias("n_tokens_fit"),
        F.round(beta, 6).alias("zipf_slope"),
    )



# BM25 retrieval: k1/b are the Robertson defaults; the query is the
# corpus' BM25_NQ highest-document-frequency tokens (deterministic:
# df desc, token asc) — a worst-case "stopword query" that exercises the
# widest posting lists, which is exactly the skew a retrieval deployment
# has to survive.
BM25_K1 = 1.2
BM25_B = 0.75
BM25_NQ = 5
BM25_TOPK = 20


def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k document retrieval for the corpus' heaviest query.

    The retrieval scorer behind contamination forensics and corpus
    search.  Scale shape: term statistics (df per token) and the corpus
    constants (N, avgdl) are one map-side-combinable aggregate each; the
    query-term table is BM25_NQ rows and BROADCASTS into the (token,
    doc, tf) stream, so scoring touches only postings of query terms and
    the only full shuffle is the tf groupBy the inverted index already
    pays.  Each term's contribution is integer-scaled (x 1e6) before the
    per-doc sum, so the score is order-free and the DuckDB oracle
    reproduces it bit-for-bit; the float division happens once at
    presentation."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("tok")
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    consts = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("tot_dl")
    )
    df_tbl = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    qterms = (
        df_tbl.orderBy(F.desc("df"), F.asc("tok"))
        .limit(BM25_NQ)
        .select("tok", "df")
    )
    scored = (
        tf.join(F.broadcast(qterms), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(consts))
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    avgdl = F.col("tot_dl") / F.col("n_docs")
    term = (
        idf
        * (F.col("tf") * (BM25_K1 + 1))
        / (
            F.col("tf")
            + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / avgdl)
        )
    )
    per_doc = (
        scored.select(
            "doc_id", F.round(term * 1e6).cast("long").alias("t6")
        )
        .groupBy("doc_id")
        .agg(F.sum("t6").alias("s6"))
    )
    w = Window.orderBy(F.desc("s6"), F.asc("doc_id"))
    return (
        per_doc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= BM25_TOPK)
        .select(
            "doc_id",
            "rank",
            F.round(F.col("s6") / 1e6, 6).alias("bm25"),
        )
        .orderBy("rank")
    )


QUERIES = {
    "text_bm25_topk": bm25_topk,
    "text_zipf_fit": zipf_fit,
    "text_keep_rate_wilson": keep_rate_wilson,
    "text_feature_hashing": feature_hashing,
    "text_lr_quality_inference": lr_quality_inference,
    "text_unigram_surprisal": unigram_surprisal,
    "text_inverted_index": inverted_index,
    "text_length_token_corr": length_token_corr,
    "text_token_count": token_count,
    "text_quality_score": quality_score,
    "text_lang_id": lang_id,
    "text_fingerprint": fingerprint,
    "text_top_tokens": top_tokens,
    "text_tfidf_top_terms": tfidf_top_terms,
}

_TOKS = r"regexp_split_to_array(lower(trim(text)), '\s+')"

ORACLES = {
    "text_feature_hashing": f"""
        WITH toks AS (
            SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
        ),
        hashed AS (
            SELECT doc_id,
                   ('0x' || substr(md5(tok), 1, 15))::BIGINT % {FH_DIM}
                       AS bucket,
                   CASE WHEN ('0x' || substr(md5(tok), 1, 15))::BIGINT
                             % {2 * FH_DIM} < {FH_DIM}
                        THEN 1 ELSE -1 END AS s
            FROM toks
        )
        SELECT doc_id, bucket, CAST(sum(s) AS BIGINT) AS weight
        FROM hashed
        GROUP BY doc_id, bucket
        HAVING sum(s) <> 0
        ORDER BY doc_id, bucket
    """,
    "text_lr_quality_inference": f"""
        WITH feats AS (
            SELECT doc_id, lang,
                   ln(1.0 + n_chars) AS f1,
                   len(list_distinct({_TOKS})) * 1.0
                       / len({_TOKS}) AS f2,
                   length(regexp_replace(text, '\\s', '', 'g')) * 1.0
                       / len({_TOKS}) AS f3
            FROM documents
        )
        SELECT doc_id, lang,
               ROUND(1.0 / (1.0 + exp(-({LR_W[0]} + {LR_W[1]} * f1
                     + {LR_W[2]} * f2 + {LR_W[3]} * f3))), 6) AS quality_p,
               ROUND(1.0 / (1.0 + exp(-({LR_W[0]} + {LR_W[1]} * f1
                     + {LR_W[2]} * f2 + {LR_W[3]} * f3))), 6) >= 0.5
                   AS keep
        FROM feats
        ORDER BY doc_id
    """,
    "text_unigram_surprisal": f"""
        WITH toks AS (
            SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
        ),
        counts AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok),
        tot AS (SELECT count(*) AS t FROM toks)
        SELECT doc_id, count(*) AS n_tokens,
               ROUND(sum(CAST(ROUND(ln(t * 1.0 / n) * 1000000.0) AS BIGINT))
                     / 1000000.0 / count(*), 6) AS mean_surprisal
        FROM toks JOIN counts USING (tok) CROSS JOIN tot
        GROUP BY doc_id
        ORDER BY doc_id
    """,
    "text_inverted_index": f"""
        WITH toks AS (
            SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
        ), tf AS (
            SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2
        )
        SELECT tok, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS total_tf,
               array_to_string(list_sort(list(doc_id)), ',') AS postings
        FROM tf
        GROUP BY tok
        HAVING COUNT(*) >= {MIN_DF}
        ORDER BY df DESC, tok
    """,
    "text_length_token_corr": r"""
        WITH m AS (
            SELECT lang, count(*) AS n,
                   sum(xx) AS sx, sum(yy) AS sy,
                   sum(xx * xx) AS sxx, sum(yy * yy) AS syy,
                   sum(xx * yy) AS sxy
            FROM (
                SELECT lang, CAST(n_chars AS BIGINT) AS xx,
                       CAST(CASE WHEN trim(text) = '' THEN 0
                                 ELSE len(regexp_split_to_array(
                                          lower(trim(text)), '\s+'))
                            END AS BIGINT) AS yy
                FROM documents
            )
            GROUP BY lang
        )
        SELECT lang, n,
               ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                     / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                            * CAST(n * syy - sy * sy AS DOUBLE)), 6)
                   AS corr_chars_tokens
        FROM m ORDER BY lang
    """,
    "text_token_count": f"""
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len({_TOKS}) END AS n_tokens_ws,
               len(regexp_extract_all(text,
                   '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_tokens_bpe,
               length(text) AS n_chars_actual
        FROM documents ORDER BY doc_id
    """,
    "text_quality_score": f"""
        WITH t AS (
            SELECT doc_id, text, {_TOKS} AS toks FROM documents
        )
        SELECT doc_id,
               length(text) AS n_chars_actual,
               len(toks) AS n_tokens,
               ROUND(length(trim(text)) * 1.0 / len(toks), 6) AS mean_tok_len,
               ROUND(len(list_intersect(list_distinct(toks),
                     ['the','a','and','of','to','is','in','it','that']))
                     * 1.0 / len(toks), 6) AS distinct_stopword_ratio,
               ROUND(len(regexp_extract_all(text, '[^\\w\\s]')) * 1.0
                     / length(text), 6) AS punct_density,
               ROUND(len(regexp_extract_all(text, '[A-Za-z]')) * 1.0
                     / length(text), 6) AS alpha_ratio
        FROM t ORDER BY doc_id
    """,
    "text_lang_id": None,  # filled in below (generated per marker table)
    "text_top_tokens": f"""
        SELECT tok, COUNT(*) AS df
        FROM (SELECT DISTINCT doc_id, unnest(list_distinct({_TOKS})) AS tok
              FROM documents)
        GROUP BY tok
        ORDER BY df DESC, tok ASC
        LIMIT 25
    """,
    "text_tfidf_top_terms": f"""
        WITH toks AS (
            SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
        ), tf AS (
            SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2
        ), dfreq AS (
            SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1
        ), n AS (
            SELECT COUNT(*) AS n_docs FROM documents
        ), scored AS (
            SELECT doc_id, tok,
                   ROUND(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
            FROM tf JOIN dfreq USING (tok), n
        ), ranked AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                         ORDER BY tfidf DESC, tok ASC) AS rn
            FROM scored
        )
        SELECT doc_id, tok AS top_term, tfidf
        FROM ranked WHERE rn = 1 ORDER BY doc_id
    """,
    "text_fingerprint": f"""
        WITH t AS (
            SELECT doc_id, list_aggregate({_TOKS}, 'string_agg', ' ') AS norm
            FROM documents
        )
        SELECT doc_id, md5(norm) AS fp_md5,
               ('0x' || substr(md5(norm), 1, 15))::BIGINT AS fp_int,
               length(norm) AS norm_len
        FROM t ORDER BY doc_id
    """,
}


def _lang_id_oracle() -> str:
    score_exprs = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        arr = ", ".join(f"'{m}'" for m in markers)
        score_exprs.append(
            f"len(list_filter(toks, t -> list_contains([{arr}], t))) AS score_{lang}"
        )
    langs = sorted(LANG_MARKERS)
    # same argmax: max score wins, ties go to the alphabetically-first lang
    greatest = ", ".join(f"score_{lg}" for lg in langs)
    case = "CASE "
    for lg in langs:  # first match wins ⇒ alphabetical tie-break
        case += f"WHEN score_{lg} = best THEN '{lg}' "
    case += "END"
    return f"""
        WITH t AS (
            SELECT doc_id, lang, {_TOKS} AS toks FROM documents
        ), s AS (
            SELECT doc_id, lang, {', '.join(score_exprs)} FROM t
        ), b AS (
            SELECT *, GREATEST({greatest}) AS best FROM s
        )
        SELECT lang, {case} AS pred_lang, count(*) AS n
        FROM b GROUP BY 1, 2 ORDER BY lang, pred_lang
    """


ORACLES["text_lang_id"] = _lang_id_oracle()


# reuses the LR inference oracle as a CTE; Wilson terms written in the
# same order as the Spark expressions so doubles agree bit-for-bit
ORACLES["text_keep_rate_wilson"] = f"""
    WITH scored AS ({ORACLES["text_lr_quality_inference"]}),
    agg AS (
        SELECT lang, count(*) AS n,
               CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS kept
        FROM scored GROUP BY lang
    )
    SELECT lang, n, kept,
           ROUND(kept * 1.0 / n, 6) AS keep_rate,
           ROUND(((kept * 1.0 / n) + {WILSON_Z} * {WILSON_Z} / (2 * n)
                  - {WILSON_Z} * sqrt((kept * 1.0 / n) * (1 - kept * 1.0 / n) / n
                                      + {WILSON_Z} * {WILSON_Z} / (4 * n * n)))
                 / (1 + {WILSON_Z} * {WILSON_Z} / n), 6) AS wilson_lo,
           ROUND(((kept * 1.0 / n) + {WILSON_Z} * {WILSON_Z} / (2 * n)
                  + {WILSON_Z} * sqrt((kept * 1.0 / n) * (1 - kept * 1.0 / n) / n
                                      + {WILSON_Z} * {WILSON_Z} / (4 * n * n)))
                 / (1 + {WILSON_Z} * {WILSON_Z} / n), 6) AS wilson_hi
    FROM agg
    ORDER BY lang
"""


ORACLES["text_zipf_fit"] = f"""
    WITH freq AS (
        SELECT tok, count(*) AS f FROM (
            SELECT unnest({_TOKS}) AS tok FROM documents
        ) GROUP BY tok
    ),
    top AS (
        SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, tok ASC) AS r
        FROM freq
        QUALIFY r <= {ZIPF_TOP}
    ),
    t AS (
        SELECT CAST(ROUND(ln(CAST(r AS DOUBLE)) * 1000000.0) AS BIGINT)
                   AS x,
               CAST(ROUND(ln(CAST(f AS DOUBLE)) * 1000000.0) AS BIGINT)
                   AS y
        FROM top
    )
    SELECT count(*) AS n_tokens_fit,
           ROUND((count(*) * sum(x * y) - sum(x) * sum(y)) * 1.0
                 / (count(*) * sum(x * x) - sum(x) * sum(x)), 6)
               AS zipf_slope
    FROM t
"""


ORACLES["text_bm25_topk"] = f"""
    WITH toks AS (
        SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
    ),
    tf AS (
        SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    consts AS (
        SELECT count(*) AS n_docs, sum(dl) AS tot_dl FROM dl
    ),
    dft AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
    qterms AS (
        SELECT tok, df FROM dft ORDER BY df DESC, tok ASC LIMIT {BM25_NQ}
    ),
    scored AS (
        SELECT t.doc_id,
               CAST(ROUND(
                   ln(CAST(c.n_docs - q.df + 0.5 AS DOUBLE)
                      / CAST(q.df + 0.5 AS DOUBLE) + CAST(1 AS DOUBLE))
                   * (t.tf * CAST({BM25_K1} + 1 AS DOUBLE))
                   / (t.tf + CAST({BM25_K1} AS DOUBLE)
                      * (CAST(1 - {BM25_B} AS DOUBLE)
                         + CAST({BM25_B} AS DOUBLE) * d.dl
                           / (c.tot_dl * CAST(1 AS DOUBLE) / c.n_docs)))
                   * 1000000.0) AS BIGINT) AS t6
        FROM tf t
        JOIN qterms q ON t.tok = q.tok
        JOIN dl d ON t.doc_id = d.doc_id
        CROSS JOIN consts c
    ),
    per_doc AS (
        SELECT doc_id, CAST(sum(t6) AS BIGINT) AS s6
        FROM scored GROUP BY doc_id
    )
    SELECT doc_id, rank, ROUND(s6 / 1000000.0, 6) AS bm25
    FROM (
        SELECT doc_id, s6,
               ROW_NUMBER() OVER (ORDER BY s6 DESC, doc_id ASC) AS rank
        FROM per_doc
    ) WHERE rank <= {BM25_TOPK}
    ORDER BY rank
"""


def bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-order perplexity filter: mean bigram surprisal per doc.

    -ln P(w2|w1) under the corpus bigram model with add-½ smoothing,
    P(w2|w1) = (c(w1,w2) + ½) / (c(w1·) + ½V) — the step up from
    ``unigram_surprisal`` that catches shuffled-word salad (every token
    common, every transition improbable), which a unigram score cannot.
    Written as ln((2·c1 + V) / (2·c12 + 1)): a quotient of exact
    integers, so both engines evaluate the identical double — and each
    per-bigram term is integer-scaled (1e6) before summation, making
    the distributed mean combine-order-free.

    Scale shape: bigram stream via one lead() window on the doc_id
    partitioning; the bigram-count join keys on (w1, w2) — high-
    cardinality, well-distributed shuffle with map-side partial counts;
    history counts ride the same frame. V is one scalar. No step is
    corpus²."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("w1")
    )
    # bigrams array-natively (the oracle's own shape): adjacent pairs by
    # index — the lead() window and its full (doc_id, pos) sort were a
    # per-row peek at the next array element (§2.1: remove the shuffle
    # outright).  Docs need ≥ 2 tokens to emit a pair (ascending
    # sequence guard); the (doc_id, w1, w2) multiset is unchanged.
    bg = (
        docs.selectExpr("doc_id", "split(trim(lower(text)), '\\\\s+') AS w")
        .filter(F.size("w") >= 2)
        .selectExpr(
            "doc_id",
            "explode(transform(sequence(1, size(w) - 1), i ->"
            " struct(element_at(w, i) AS w1, element_at(w, i + 1) AS w2)))"
            " AS p",
        )
        .select("doc_id", "p.w1", "p.w2")
        .localCheckpoint(eager=False)
    )
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = corpus_stat(
        docs, "vocab_ws", toks.select("w1").distinct().count
    )  # stats-table scalar
    term = F.log(
        (2 * F.col("c1") + F.lit(int(vocab)))
        / (2 * F.col("c12") + F.lit(1))
    )
    return (
        bg.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.sum(F.round(term * 1e6).cast("long"))
                / 1e6
                / F.count(F.lit(1)),
                6,
            ).alias("mean_bigram_surprisal"),
        )
        .orderBy("doc_id")
    )


QUERIES["text_bigram_surprisal"] = bigram_surprisal

ORACLES["text_bigram_surprisal"] = f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS w FROM documents),
    toks AS (
        SELECT doc_id, w[i] AS w1
        FROM t, unnest(range(1, len(w) + 1)) AS u(i)
    ),
    bg AS (
        SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
        FROM t, unnest(range(1, len(w))) AS u(i)
    ),
    c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
    c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),
    v AS (SELECT count(DISTINCT w1) AS vocab FROM toks)
    SELECT doc_id, count(*) AS n_bigrams,
           ROUND(sum(CAST(ROUND(ln((2 * c1.c1 + v.vocab) * 1.0
                                   / (2 * c12.c12 + 1)) * 1000000.0)
                          AS BIGINT))
                 / 1000000.0 / count(*), 6) AS mean_bigram_surprisal
    FROM bg
    JOIN c12 USING (w1, w2)
    JOIN c1 USING (w1)
    CROSS JOIN v
    GROUP BY doc_id
    ORDER BY doc_id
"""


TEMPLATE_PREFIX_TOKENS = 8


def template_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate/template report: per source, the most common
    8-token document prefix and the fraction of the source's documents
    that share it — the cheap detector for scraped template pages,
    licence headers, and injected banners (prefix-dup groups are what a
    curation pass strips before near-dup runs, since shared boilerplate
    inflates every pairwise similarity it touches).

    Shape: one narrow map builds the prefix key; a (source, prefix)
    count with map-side combine; per-source argmax via a rank window
    over the (already tiny) count rows, ties broken toward the
    lexicographically smallest prefix. The report is |sources| rows."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col(F.col("text"))
    prefix = F.concat_ws(" ", F.slice(toks, 1, TEMPLATE_PREFIX_TOKENS))
    counts = (
        docs.select("source", prefix.alias("prefix"))
        .groupBy("source", "prefix")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = counts.groupBy("source").agg(
        F.sum("n").alias("n_docs"),
        F.count(F.lit(1)).alias("n_distinct_prefixes"),
    )
    w = Window.partitionBy("source").orderBy(
        F.col("n").desc(), F.col("prefix").asc()
    )
    best = (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "source",
            F.col("prefix").alias("template_prefix"),
            F.col("n").alias("template_count"),
        )
    )
    return (
        totals.join(best, "source")
        .select(
            "source",
            "n_docs",
            "n_distinct_prefixes",
            "template_prefix",
            "template_count",
            F.round(F.col("template_count") / F.col("n_docs"), 6).alias(
                "template_frac"
            ),
        )
        .orderBy("source")
    )


QUERIES["text_template_detection"] = template_detection

ORACLES["text_template_detection"] = f"""
    WITH counts AS (
        SELECT source,
               array_to_string({_TOKS}[1 : {TEMPLATE_PREFIX_TOKENS}], ' ')
                   AS prefix,
               count(*) AS n
        FROM documents
        GROUP BY source, prefix
    ),
    totals AS (
        SELECT source, CAST(sum(n) AS BIGINT) AS n_docs,
               CAST(count(*) AS BIGINT) AS n_distinct_prefixes
        FROM counts GROUP BY source
    ),
    best AS (
        SELECT source, prefix AS template_prefix,
               CAST(n AS BIGINT) AS template_count
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY source ORDER BY n DESC, prefix ASC) AS rn
            FROM counts
        ) WHERE rn = 1
    )
    SELECT t.source, t.n_docs, t.n_distinct_prefixes,
           b.template_prefix, b.template_count,
           ROUND(b.template_count * 1.0 / t.n_docs, 6) AS template_frac
    FROM totals t JOIN best b ON t.source = b.source
    ORDER BY t.source
"""


# ----------------------------------------------------------- BPE training

BPE_ITERS = 4
#: Train on a deterministic 1-in-BPE_SAMPLE_MOD document sample: BPE
#: merge tables are trained on corpus SAMPLES in production (merge
#: statistics converge long before the full corpus is seen), and the
#: per-round stream rewrite is linear in the sample size.
BPE_SAMPLE_MOD = 4


def _bpe_fold_merge(a: str, b: str):
    """One BPE merge (a, b) → ``a+b`` applied to a per-doc ``toks``
    array as a left fold (``F.aggregate`` — a Catalyst lambda, JVM-side,
    no window, no shuffle): append the token unless the accumulator ends
    with ``a`` and the token is ``b``, in which case replace the tail
    with the merged symbol.  The fold IS the greedy left-to-right
    single-pass rule: a merged element is ``a+b`` which can never equal
    ``a`` (``b`` is non-empty), so a freshly-merged tail can't re-merge
    — the same "consumed" semantics as the exploded-row window form this
    replaces, and as ``bpe_apply``'s Arrow loop.  ``try_element_at``
    keeps the empty-accumulator probe legal under ANSI mode.  The merge
    pair rides in as ``F.lit`` (tokens may contain quotes), never pasted
    into SQL text."""
    return F.aggregate(
        F.col("toks"),
        F.array().cast("array<string>"),
        lambda acc, t: F.when(
            F.try_element_at(acc, F.lit(-1)).eqNullSafe(F.lit(a))
            & (t == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))
            ),
        ).otherwise(F.concat(acc, F.array(t))),
    ).alias("toks")


def bpe_train(
    spark: SparkSession, sf_dir: str, sample_mod: int = BPE_SAMPLE_MOD
) -> DataFrame:
    """Learn the first BPE_ITERS byte-pair-encoding merges from the
    corpus token stream (Sennrich et al. 2016): each round counts all
    adjacent symbol pairs, takes the most frequent (ties -> lexically
    first), and rewrites the stream with the merged symbol. Returns the
    learned merge table -- the artifact a tokenizer ships.

    Scale notes (round-11 array form): the stream stays as per-doc token
    ARRAYS.  Pair counting explodes ``arrays_zip`` of the two shifted
    slices — a map-side-combinable (a, b) count with NO window and NO
    sort (the round-10 row form paid a full doc-partitioned sort per
    round for lead(), and a second one materializing the rewrite).  The
    rewrite is a doc-local fold (``_bpe_fold_merge``) — map-only.  The
    argmax is a driver scalar (the merge table IS driver-sized by
    definition).  In production the trainer runs on a corpus SAMPLE
    (tokenizers are trained on ~1e9 tokens, not the full 100 TB); for
    book-length documents the fold's immutable-accumulator copies go
    quadratic in doc length and the Arrow loop in ``bpe_apply`` is the
    shape to swap in — at this corpus' doc lengths the fold is faster
    (one job per round: the count action materializes the previous
    round's cached rewrite).  Whole query at sf0.1: 2.5 s → ~1.1 s."""
    docs = load_table(spark, sf_dir, "documents")
    if sample_mod > 1:
        docs = docs.filter(F.col("doc_id") % sample_mod == 0)
    # docs that can never pair (fewer than 2 tokens) drop out up front;
    # a rewrite only ever shrinks arrays, and 1-token docs contribute
    # nothing to any later round either
    ts = (
        docs.select(tokens_col(F.col("text")).alias("toks"))
        .filter(F.size("toks") >= 2)
        .cache()
    )
    merges = []
    prev: DataFrame | None = None
    for step in range(1, BPE_ITERS + 1):
        top = (
            ts.selectExpr(
                "slice(toks, 1, size(toks) - 1) AS h",
                "slice(toks, 2, size(toks) - 1) AS t",
            )
            .selectExpr("explode(arrays_zip(h, t)) AS p")
            .selectExpr("p.h AS a", "p.t AS b")
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.col("n").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        # ts is materialized by the collect above; its parent's blocks
        # can no longer be read by anything downstream.
        if prev is not None:
            prev.unpersist()
        if not top:
            break
        a, b, n = top[0].a, top[0].b, top[0].n
        merges.append((step, a, b, a + b, n))
        prev, ts = ts, ts.select(_bpe_fold_merge(a, b)).cache()
    ts.unpersist()
    # VALUES literal (LocalTableScan): createDataFrame's pickled-RDD path
    # pays ~32 Python-worker tasks per job over this tiny frame;
    # coalesce(1) keeps the global sort without the range-sampling pass.
    return (
        values_df(
            spark,
            merges,
            "step int, left string, right string, merged string,"
            " pair_count long",
        )
        .coalesce(1)
        .orderBy("step")
    )


QUERIES["text_bpe_train"] = bpe_train


def _bpe_oracle() -> str:
    """Unrolled k-iteration BPE in pure SQL: each round is a pair-count
    CTE, a 1-row argmax CTE, and a window-pass rewrite CTE referencing
    the argmax by scalar subquery -- the same greedy-run parity rule as
    the Spark helper."""
    blocks = [
        f"""
    ts0 AS MATERIALIZED (
        SELECT doc_id, i AS pos, w[i] AS tok
        FROM (SELECT doc_id, {_TOKS} AS w FROM documents
              WHERE doc_id % {BPE_SAMPLE_MOD} = 0),
             unnest(range(1, len(w) + 1)) AS u(i)
    )"""
    ]
    for s in range(1, BPE_ITERS + 1):
        p, m, mk, nx = f"pairs{s}", f"m{s}", f"marked{s}", f"ts{s}"
        prev = f"ts{s - 1}"
        blocks.append(f"""
    {p} AS MATERIALIZED (
        SELECT a, b, CAST(count(*) AS BIGINT) AS n FROM (
            SELECT tok AS a,
                   LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS b
            FROM {prev}
        ) WHERE b IS NOT NULL GROUP BY a, b
    ),
    {m} AS MATERIALIZED (
        SELECT a, b, n FROM {p} ORDER BY n DESC, a ASC, b ASC LIMIT 1
    ),{_bpe_rewrite_ctes(prev, m, mk, nx)}""")
    selects = " UNION ALL ".join(
        f"SELECT {s} AS step, a AS left, b AS right, a || b AS merged, "
        f"n AS pair_count FROM m{s}"
        for s in range(1, BPE_ITERS + 1)
    )
    return (
        "WITH "
        + ",".join(blocks)
        + f" SELECT * FROM ({selects}) ORDER BY step"
    )


def _bpe_rewrite_ctes(prev: str, m: str, mk: str, nx: str) -> str:
    """The one-merge greedy rewrite as two chained CTEs (marker pass +
    consume/renumber pass), parameterized on the input stream ``prev``
    and the 1-row merge CTE ``m`` — shared verbatim by the trainer's
    per-round rewrite (over the sample stream) and the apply oracle's
    rewrite (over the full corpus stream)."""
    return f"""
    {mk} AS MATERIALIZED (
        SELECT doc_id, pos, tok, nxt, run_pos,
               CASE WHEN (SELECT a FROM {m}) = (SELECT b FROM {m})
                    THEN tok = (SELECT a FROM {m})
                         AND nxt = (SELECT b FROM {m})
                         AND run_pos % 2 = 1
                    ELSE tok = (SELECT a FROM {m})
                         AND nxt = (SELECT b FROM {m})
               END AS start
        FROM (
            SELECT doc_id, pos, tok, nxt,
                   ROW_NUMBER() OVER (PARTITION BY doc_id, run_id
                                      ORDER BY pos) AS run_pos
            FROM (
                SELECT doc_id, pos, tok, nxt,
                       SUM(new_run) OVER (PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS run_id
                FROM (
                    SELECT doc_id, pos, tok,
                           LEAD(tok) OVER (PARTITION BY doc_id
                                           ORDER BY pos) AS nxt,
                           CASE WHEN tok <> COALESCE(LAG(tok) OVER (
                                    PARTITION BY doc_id ORDER BY pos),
                                    chr(1))
                                THEN 1 ELSE 0 END AS new_run
                    FROM {prev}
                )
            )
        )
    ),
    {nx} AS MATERIALIZED (
        SELECT doc_id,
               ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS pos,
               CASE WHEN start
                    THEN (SELECT a FROM {m}) || (SELECT b FROM {m})
                    ELSE tok END AS tok
        FROM (
            SELECT *, COALESCE(LAG(start) OVER (
                PARTITION BY doc_id ORDER BY pos), FALSE) AS consumed
            FROM {mk}
        ) WHERE NOT consumed
    )"""


ORACLES["text_bpe_train"] = _bpe_oracle()


def bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the trained BPE merge table to the FULL corpus and report
    per-source tokenization stats (docs, tokens before/after, the
    compression ratio a tokenizer team tracks per data source).

    Scale shape — deliberately different from the trainer: merge
    APPLICATION is doc-local, so it runs as a greedy per-document loop
    inside Arrow-batched ``mapInPandas`` — embarrassingly parallel over
    the scan, no windows, no shuffle until the tiny per-source rollup.
    The merge table itself is a driver-sized artifact by definition
    (it is the file a tokenizer ships) and comes from the corpus-stats
    memo, trained once per corpus per session.  The left-to-right
    greedy pairing implemented here is exactly the trainer's
    window-arithmetic run-parity rule, which the unrolled-SQL oracle
    re-derives independently over the full stream."""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents")
    merges = corpus_stat(
        docs,
        ("bpe_merges", BPE_SAMPLE_MOD),
        lambda: [
            (r["left"], r["right"])
            for r in bpe_train(spark, sf_dir).collect()
        ],
    )
    src = docs.select("source", tokens_col(F.col("text")).alias("toks"))

    def apply_merges(batches):
        for pdf in batches:
            srcs, nb, na = [], [], []
            for s, toks in zip(pdf["source"], pdf["toks"]):
                toks = list(toks)
                n0 = len(toks)
                for a, b in merges:
                    out = []
                    i = 0
                    n = len(toks)
                    while i < n:
                        if i + 1 < n and toks[i] == a and toks[i + 1] == b:
                            out.append(a + b)
                            i += 2
                        else:
                            out.append(toks[i])
                            i += 1
                    toks = out
                srcs.append(s)
                nb.append(n0)
                na.append(len(toks))
            yield pd.DataFrame({"source": srcs, "nb": nb, "na": na})

    per_doc = src.mapInPandas(apply_merges, "source string, nb long, na long")
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nb").alias("tokens_before"),
            F.sum("na").alias("tokens_after"),
        )
        .select(
            "source",
            "n_docs",
            "tokens_before",
            "tokens_after",
            F.round(
                F.col("tokens_before")
                / F.col("tokens_after").cast("double"),
                6,
            ).alias("compression"),
        )
        .orderBy("source")
    )


QUERIES["text_bpe_apply"] = bpe_apply


def _bpe_apply_oracle() -> str:
    """Train on the sample (the same CTE chain as ``_bpe_oracle``),
    then unroll the k learned merges over the FULL corpus stream and
    aggregate per source — the SQL twin of the mapInPandas greedy
    apply."""
    blocks = [
        f"""
    ts0 AS MATERIALIZED (
        SELECT doc_id, i AS pos, w[i] AS tok
        FROM (SELECT doc_id, {_TOKS} AS w FROM documents
              WHERE doc_id % {BPE_SAMPLE_MOD} = 0),
             unnest(range(1, len(w) + 1)) AS u(i)
    )"""
    ]
    for s in range(1, BPE_ITERS + 1):
        prev, p, m = f"ts{s - 1}", f"pairs{s}", f"m{s}"
        blocks.append(f"""
    {p} AS MATERIALIZED (
        SELECT a, b, CAST(count(*) AS BIGINT) AS n FROM (
            SELECT tok AS a,
                   LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS b
            FROM {prev}
        ) WHERE b IS NOT NULL GROUP BY a, b
    ),
    {m} AS MATERIALIZED (
        SELECT a, b, n FROM {p} ORDER BY n DESC, a ASC, b ASC LIMIT 1
    ),{_bpe_rewrite_ctes(prev, m, f"marked{s}", f"ts{s}")}""")
    blocks.append(f"""
    fs0 AS MATERIALIZED (
        SELECT doc_id, i AS pos, w[i] AS tok
        FROM (SELECT doc_id, {_TOKS} AS w FROM documents),
             unnest(range(1, len(w) + 1)) AS u(i)
    )""")
    for s in range(1, BPE_ITERS + 1):
        blocks.append(
            _bpe_rewrite_ctes(f"fs{s - 1}", f"m{s}", f"amk{s}", f"fs{s}")
        )
    return (
        "WITH "
        + ",".join(blocks)
        + f"""
    , nb AS MATERIALIZED (SELECT doc_id, count(*) AS nb FROM fs0 GROUP BY doc_id)
    , na AS MATERIALIZED (SELECT doc_id, count(*) AS na
             FROM fs{BPE_ITERS} GROUP BY doc_id)
    SELECT d.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(nb.nb) AS BIGINT) AS tokens_before,
           CAST(sum(na.na) AS BIGINT) AS tokens_after,
           ROUND(CAST(sum(nb.nb) AS DOUBLE) / sum(na.na), 6)
               AS compression
    FROM documents d
    JOIN nb ON nb.doc_id = d.doc_id
    JOIN na ON na.doc_id = d.doc_id
    GROUP BY d.source ORDER BY source
    """
    )


ORACLES["text_bpe_apply"] = _bpe_apply_oracle()


# ----------------------------------------------------- PMI collocations

PMI_MIN_COUNT = 5
PMI_TOP = 20


def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top collocations: adjacent token pairs ranked by pointwise mutual
    information, min joint count ≥ PMI_MIN_COUNT.

    PMI(w1,w2) = log2( c12·N / (c1·c2) ) — the classic phrase-mining
    score (how much more often the pair co-occurs than independence
    predicts).  The ORDER is taken on the exact integer-ratio argument
    c12·N/(c1·c2), never on the log: log is monotone, and the quotient
    of exact longs is the same double in every engine, so the top-k cut
    is deterministic cross-engine (a log differs by an ulp across libm
    implementations; the ratio cannot).

    Scale: the bigram stream is one lead() window per doc; the three
    count frames are map-side-combinable groupBys keyed on tokens
    (high-cardinality, uniform shuffle); the final top-k is a global
    sort of only the pairs above the support floor — at 100 TB that is
    a TakeOrdered over the surviving phrase table, not the corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(tokens_col(F.col("text"))).alias("pos", "w1")
    )
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    bg = (
        toks.withColumn("w2", F.lead("w1").over(wdoc))
        .filter(F.col("w2").isNotNull())
        .select("w1", "w2")
    )
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    c2 = bg.groupBy("w2").agg(F.count(F.lit(1)).alias("c2"))
    n = bg.agg(F.count(F.lit(1)).alias("n_bg"))
    ratio = (F.col("c12") * F.col("n_bg")) / (F.col("c1") * F.col("c2"))
    return (
        c12.filter(F.col("c12") >= PMI_MIN_COUNT)
        .join(c1, "w1")
        .join(c2, "w2")
        .crossJoin(F.broadcast(n))
        .select(
            "w1",
            "w2",
            "c12",
            ratio.alias("lift"),
            F.round(F.log(ratio) / F.lit(math.log(2.0)), 6).alias(
                "pmi_bits"
            ),
        )
        .orderBy(F.desc("lift"), "w1", "w2")
        .limit(PMI_TOP)
        .select("w1", "w2", "c12", F.round("lift", 6).alias("lift"), "pmi_bits")
    )


QUERIES["text_pmi_collocations"] = pmi_collocations

ORACLES["text_pmi_collocations"] = f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS w FROM documents),
    bg AS (
        SELECT w[i] AS w1, w[i + 1] AS w2
        FROM t, unnest(range(1, len(w))) AS u(i)
    ),
    c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
    c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),
    c2 AS (SELECT w2, count(*) AS c2 FROM bg GROUP BY w2),
    n AS (SELECT count(*) AS n_bg FROM bg)
    SELECT w1, w2, c12,
           round(c12 * n_bg / CAST(c1 * c2 AS DOUBLE), 6) AS lift,
           round(ln(c12 * n_bg / CAST(c1 * c2 AS DOUBLE))
                 / ln(2.0), 6) AS pmi_bits
    FROM c12 JOIN c1 USING (w1) JOIN c2 USING (w2) CROSS JOIN n
    WHERE c12 >= {PMI_MIN_COUNT}
    ORDER BY c12 * n_bg / CAST(c1 * c2 AS DOUBLE) DESC, w1, w2
    LIMIT {PMI_TOP}
"""


# ------------------------------------------------- distinctive terms

KEYNESS_TOP = 5
KEYNESS_MIN_TF = 5


def distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source keyness: the KEYNESS_TOP tokens most over-represented
    in each source vs the rest of the corpus, ranked by add-1-smoothed
    frequency lift — "what vocabulary characterizes this source", the
    corpus-linguistics readout behind source profiling and mixture
    debugging (a source whose distinctive terms are boilerplate is a
    template farm; one whose terms are another source's is a mirror).

    Exactness: lift = (tf_s/N_s) / ((tf_rest+1)/(N_rest+1)) is computed
    as one double expression over four exact longs and rounded to 6dp
    before the per-source rank — no logs (the log-odds variant would
    hit the libm cross-engine trap for no ranking benefit).

    Scale: token explode is map-side; (source, token) and token-total
    counts are partial-aggregated groupBys; the join back is keyed on
    token (vocabulary grain, not row grain); source totals broadcast.
    The only window runs per source over its vocabulary.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(tokens_col(F.col("text"))).alias("tok")
    )
    st = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).alias("tf_s")
    )
    tt = st.groupBy("tok").agg(F.sum("tf_s").alias("tf_all"))
    ns = st.groupBy("source").agg(F.sum("tf_s").alias("n_s"))
    ntot = ns.agg(F.sum("n_s").alias("n_all"))
    lift = (
        "round(CAST(tf_s AS DOUBLE) * CAST(n_all - n_s + 1 AS DOUBLE)"
        " / (CAST(n_s AS DOUBLE) * CAST(tf_all - tf_s + 1 AS DOUBLE)),"
        " 6)"
    )
    scored = (
        st.filter(F.col("tf_s") >= KEYNESS_MIN_TF)
        .join(F.broadcast(tt), "tok")
        .join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(ntot))
        .withColumn("lift", F.expr(lift))
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("lift"), F.asc("tok")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= KEYNESS_TOP)
        .select(
            "source",
            F.col("rk").cast("long").alias("rank"),
            F.col("tok").alias("token"),
            "tf_s",
            (F.col("tf_all") - F.col("tf_s")).alias("tf_rest"),
            "lift",
        )
        .orderBy("source", "rank")
    )


ORACLES["text_distinctive_terms"] = f"""
    WITH toks AS (
        SELECT source, unnest(regexp_split_to_array(lower(trim(text)),
                                                    '\\s+')) AS tok
        FROM documents
    ),
    st AS (
        SELECT source, tok, count(*) AS tf_s FROM toks GROUP BY 1, 2
    ),
    tt AS (SELECT tok, sum(tf_s) AS tf_all FROM st GROUP BY 1),
    ns AS (SELECT source, sum(tf_s) AS n_s FROM st GROUP BY 1),
    ntot AS (SELECT sum(n_s) AS n_all FROM ns),
    scored AS (
        SELECT st.source, st.tok, st.tf_s, tt.tf_all, ns.n_s, ntot.n_all,
               round(CAST(st.tf_s AS DOUBLE)
                     * CAST(ntot.n_all - ns.n_s + 1 AS DOUBLE)
                     / (CAST(ns.n_s AS DOUBLE)
                        * CAST(tt.tf_all - st.tf_s + 1 AS DOUBLE)),
                     6) AS lift
        FROM st
        JOIN tt USING (tok) JOIN ns USING (source) CROSS JOIN ntot
        WHERE st.tf_s >= {KEYNESS_MIN_TF}
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY source
                                     ORDER BY lift DESC, tok) AS rk
        FROM scored
    )
    SELECT source,
           CAST(rk AS BIGINT) AS rank,
           tok AS token,
           CAST(tf_s AS BIGINT) AS tf_s,
           CAST(tf_all - tf_s AS BIGINT) AS tf_rest,
           lift
    FROM ranked
    WHERE rk <= {KEYNESS_TOP}
    ORDER BY source, rank
"""

QUERIES["text_distinctive_terms"] = distinctive_terms


# ------------------------------------------------- token dispersion

DISPERSION_TOP = 20


def token_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dispersion (Gries' DP) for the DISPERSION_TOP most frequent
    tokens: 0.5·Σ_s |share of token in source s − share of corpus in
    source s| — 0 means the token spreads exactly like the corpus,
    → 1 means it lives in one source.  The burstiness companion to
    [[text_distinctive_terms]]: keyness finds WHERE a token
    concentrates, dispersion scores HOW concentrated every frequent
    token is (high-frequency high-DP tokens are boilerplate/template
    markers, the [[text_template_detection]] signal at token grain).

    Exactness: DP's numerator Σ_s |tf_s·N − N_s·tf| is an exact long
    (∣sources∣ bounded), divided once by 2·tf·N — the only float op.
    Scale: same shapes as keyness — map-side token explode,
    partial-aggregated (source, token) counts, vocabulary-grain joins,
    one window for the global top-K.
    """
    docs = load_table(spark, sf_dir, "documents")
    st = (
        docs.select(
            "source", F.explode(tokens_col(F.col("text"))).alias("tok")
        )
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("tf_s"))
    )
    ns = st.groupBy("source").agg(F.sum("tf_s").alias("n_s"))
    tt = st.groupBy("tok").agg(F.sum("tf_s").alias("tf"))
    ntot = ns.agg(F.sum("n_s").alias("n_all"))
    top = (
        tt.withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(F.desc("tf"), F.asc("tok"))
            ),
        )
        .filter(F.col("rk") <= DISPERSION_TOP)
    )
    # every (top token, source) cell — including zero cells, which the
    # |0·N − N_s·tf| term must still count — via the top×sources grid
    grid = top.crossJoin(F.broadcast(ns))
    cells = grid.join(st, ["tok", "source"], "left").select(
        "tok", "tf", "rk", "n_s",
        F.coalesce(F.col("tf_s"), F.lit(0)).alias("tf_s"),
    )
    num = cells.crossJoin(F.broadcast(ntot)).groupBy(
        "tok", "tf", "rk", "n_all"
    ).agg(
        F.sum(
            F.abs(
                F.col("tf_s") * F.col("n_all")
                - F.col("n_s") * F.col("tf")
            )
        ).alias("s_abs")
    )
    return num.select(
        F.col("rk").cast("long").alias("rank"),
        F.col("tok").alias("token"),
        F.col("tf").alias("n_occurrences"),
        F.expr(
            "round(CAST(s_abs AS DOUBLE)"
            " / (2.0 * CAST(tf AS DOUBLE) * CAST(n_all AS DOUBLE)), 6)"
        ).alias("dispersion_dp"),
    ).orderBy("rank")


ORACLES["text_token_dispersion"] = f"""
    WITH st AS (
        SELECT source, unnest(regexp_split_to_array(lower(trim(text)),
                                                    '\\s+')) AS tok
        FROM documents
    ),
    stc AS (
        SELECT source, tok, count(*) AS tf_s FROM st GROUP BY 1, 2
    ),
    ns AS (SELECT source, sum(tf_s) AS n_s FROM stc GROUP BY 1),
    tt AS (SELECT tok, sum(tf_s) AS tf FROM stc GROUP BY 1),
    ntot AS (SELECT sum(n_s) AS n_all FROM ns),
    top AS (
        SELECT tok, tf,
               row_number() OVER (ORDER BY tf DESC, tok) AS rk
        FROM tt QUALIFY rk <= {DISPERSION_TOP}
    ),
    cells AS (
        SELECT t.tok, t.tf, t.rk, n.source, n.n_s,
               COALESCE(s.tf_s, 0) AS tf_s
        FROM top t CROSS JOIN ns n
        LEFT JOIN stc s ON s.tok = t.tok AND s.source = n.source
    )
    SELECT CAST(c.rk AS BIGINT) AS rank,
           c.tok AS token,
           CAST(c.tf AS BIGINT) AS n_occurrences,
           round(CAST(sum(abs(c.tf_s * o.n_all - c.n_s * c.tf))
                      AS DOUBLE)
                 / (2.0 * CAST(c.tf AS DOUBLE)
                    * CAST(o.n_all AS DOUBLE)), 6) AS dispersion_dp
    FROM cells c CROSS JOIN ntot o
    GROUP BY c.rk, c.tok, c.tf, o.n_all
    ORDER BY rank
"""

QUERIES["text_token_dispersion"] = token_dispersion


# ------------------------------------------------------- readability

def readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-style reading-ease per document — the classic curation
    feature separating prose from lists/boilerplate/code: words per
    sentence and vowel-group "syllables" per word, combined as
    206.835 − 1.015·(W/S) − 84.6·(Y/W).

    Exactness: W/S/Y are regexp counts (identical RE2/Java semantics
    for these classes); the score is ONE rational with denominator
    1000·S·W, rounded half-away-from-zero at 6dp entirely in integer
    arithmetic (magnitude-division so Spark's truncating DIV and
    DuckDB's flooring // agree on negatives).  Scale: per-row
    projection, no shuffle but the final order.

    No reference counterpart; beyond-reference text-analysis surface.
    Scan fanned out before the regex pass (single-row-group input,
    guide §2.5 — the mm/quality family device).
    """
    from ..tables import fanout_small_scan

    docs = fanout_small_scan(load_table(spark, sf_dir, "documents"), spark)
    w = F.size(
        F.regexp_extract_all(F.lower(F.trim("text")), F.lit(r"\S+"), 0)
    )
    s = F.greatest(
        F.lit(1),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[.!?]"), 0)),
    )
    y = F.size(
        F.regexp_extract_all(F.lower("text"), F.lit(r"[aeiou]+"), 0)
    )
    m = docs.select(
        "doc_id",
        w.cast("long").alias("w"),
        s.cast("long").alias("s"),
        y.cast("long").alias("y"),
    )
    num = "(206835*s*w - 1015*w*w - 84600*s*y)"
    return m.selectExpr(
        "doc_id",
        "w AS n_words",
        "s AS n_sentences",
        "y AS n_vowel_groups",
        f"""CASE WHEN w = 0 THEN CAST(0.0 AS DOUBLE) ELSE
            CAST(CASE WHEN {num} >= 0
                 THEN (2*{num}*1000000 + 1000*s*w) DIV (2*1000*s*w)
                 ELSE -((2*(-{num})*1000000 + 1000*s*w) DIV (2*1000*s*w))
            END AS DOUBLE) / 1e6 END AS flesch""",
    ).orderBy("doc_id")


QUERIES["text_readability"] = readability

ORACLES["text_readability"] = r"""
    WITH m AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(lower(trim(text)), '\S+'))
                    AS BIGINT) AS w,
               CAST(greatest(1, len(regexp_extract_all(text, '[.!?]')))
                    AS BIGINT) AS s,
               CAST(len(regexp_extract_all(lower(text), '[aeiou]+'))
                    AS BIGINT) AS y
        FROM documents
    )
    SELECT doc_id, w AS n_words, s AS n_sentences, y AS n_vowel_groups,
           CASE WHEN w = 0 THEN CAST(0.0 AS DOUBLE) ELSE
           CAST(CASE WHEN (206835*s*w - 1015*w*w - 84600*s*y) >= 0
                THEN (2*(206835*s*w - 1015*w*w - 84600*s*y)*1000000
                      + 1000*s*w) // (2*1000*s*w)
                ELSE -((2*(1015*w*w + 84600*s*y - 206835*s*w)*1000000
                        + 1000*s*w) // (2*1000*s*w))
           END AS DOUBLE) / 1e6 END AS flesch
    FROM m ORDER BY doc_id
"""


# ---------------------------------------------------- n-gram novelty

NOVELTY_MAX_N = 3


def ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source n-gram type/token curve (n = 1..3) — the compression
    proxy behind "templated corpus" detection: natural text keeps
    distinct/total high as n grows; boilerplate collapses it.

    Scale: n-grams are generated map-side from the token array (slice
    over sequence — no window, no join); each (source, n) branch is a
    partial-aggregated count + count-distinct on well-distributed keys.
    The gram build is string-CPU-bound, so the scan fans out first
    (single-row-group input otherwise serializes it; the gate turns
    the fanout off on naturally-split tables).
    """
    from ..tables import fanout_small_scan

    docs = fanout_small_scan(
        load_table(spark, sf_dir, "documents"), spark
    ).select("source", tokens_col(F.col("text")).alias("ts"))
    # all three n's fan from ONE tokenize pass: the previous shape was
    # three union branches that each re-ran the scan + tokenize chain
    # (documents scanned 3×); the per-doc fan array is ≤ 3·|ts| structs
    tall = docs.select(
        "source",
        F.explode(
            F.expr(
                f"flatten(transform(sequence(1, {NOVELTY_MAX_N}), n ->"
                " CASE WHEN size(ts) >= n THEN"
                " transform(sequence(1, size(ts)-n+1),"
                " i -> struct(n AS n, array_join(slice(ts, i, n), ' ')"
                " AS g))"
                " ELSE CAST(array() AS ARRAY<STRUCT<n:INT,g:STRING>>)"
                " END))"
            )
        ).alias("x"),
    ).select("source", F.col("x.n").alias("n"), F.col("x.g").alias("g"))
    return (
        tall.groupBy("source", "n")
        .agg(
            F.count(F.lit(1)).alias("total_ngrams"),
            F.countDistinct("g").alias("distinct_ngrams"),
        )
        .selectExpr(
            "source",
            "CAST(n AS BIGINT) AS n",
            "total_ngrams",
            "distinct_ngrams",
            "CAST((2*distinct_ngrams*1000000 + total_ngrams)"
            " DIV (2*total_ngrams) AS DOUBLE) / 1e6 AS novelty_ratio",
        )
        .orderBy("source", "n")
    )


QUERIES["text_ngram_novelty"] = ngram_novelty

ORACLES["text_ngram_novelty"] = f"""
    WITH tok AS (
        SELECT source, {_TOKS} AS ts FROM documents
    ),
    tall AS (
        {" UNION ALL ".join(
            f'''SELECT source, {n} AS n,
                       array_to_string(ts[i:i+{n - 1}], ' ') AS g
                FROM tok, LATERAL (SELECT unnest(range(1, len(ts)-{n}+2))
                                   AS i) t'''
            for n in range(1, NOVELTY_MAX_N + 1)
        )}
    )
    SELECT source, CAST(n AS BIGINT) AS n,
           CAST(count(*) AS BIGINT) AS total_ngrams,
           CAST(count(DISTINCT g) AS BIGINT) AS distinct_ngrams,
           CAST((2*count(DISTINCT g)*1000000 + count(*))
                // (2*count(*)) AS DOUBLE) / 1e6 AS novelty_ratio
    FROM tall GROUP BY source, n ORDER BY source, n
"""


# ------------------------------------------------ hapax / Heaps' law

def hapax_heaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary growth profile: token count, vocabulary
    size, hapax legomena (once-words) and their ratio, plus the Heaps'
    exponent ln(V)/ln(N) — the lexical-richness panel a corpus report
    tracks per source (template sources have tiny hapax ratios and low
    Heaps exponents).

    Exactness: counts are exact integers; the ratio uses the half-up
    integer device; the exponent is one ln-quotient of exact integers.
    Scale: one (source, token) partial-aggregated groupBy, then a
    source-grain rollup.
    """
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "source", F.explode(tokens_col(F.col("text"))).alias("tok")
        )
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    return (
        tf.groupBy("source")
        .agg(
            F.sum("f").alias("n_tokens"),
            F.count(F.lit(1)).alias("vocab"),
            F.sum((F.col("f") == 1).cast("long")).alias("hapax"),
        )
        .selectExpr(
            "source",
            "n_tokens",
            "vocab",
            "hapax",
            "CAST((2*hapax*1000000 + vocab) DIV (2*vocab) AS DOUBLE)"
            " / 1e6 AS hapax_ratio",
            "round(ln(CAST(vocab AS DOUBLE))"
            " / ln(CAST(n_tokens AS DOUBLE)), 6) AS heaps_beta",
        )
        .orderBy("source")
    )


QUERIES["text_hapax_heaps"] = hapax_heaps

ORACLES["text_hapax_heaps"] = f"""
    WITH tok AS (
        SELECT source, unnest({_TOKS}) AS tok FROM documents
    ),
    tf AS (SELECT source, tok, count(*) AS f FROM tok GROUP BY 1, 2),
    agg AS (
        SELECT source, CAST(sum(f) AS BIGINT) AS n_tokens,
               CAST(count(*) AS BIGINT) AS vocab,
               CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS hapax
        FROM tf GROUP BY 1
    )
    SELECT source, n_tokens, vocab, hapax,
           CAST((2*hapax*1000000 + vocab) // (2*vocab) AS DOUBLE) / 1e6
               AS hapax_ratio,
           round(ln(vocab) / ln(n_tokens), 6) AS heaps_beta
    FROM agg ORDER BY source
"""


# ------------------------------------------------- OCR-garbage score

OCR_FLAG_PER_10K = 120  # flag threshold: weighted artifacts per 10k chars
OCR_TOP_K = 100  # triage depth: worst-K docs returned


def ocr_garbage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OCR/extraction-artifact score per document: symbol runs,
    mid-word case flips, digit-letter mixes, and long consonant runs —
    the cheap regex panel that catches mojibake, bad PDF extraction,
    and scanner noise before any model-based quality pass.

    All counts are regexp_extract_all sizes (RE2/Java-identical
    classes); the score is artifacts-per-10k-chars in exact integer
    arithmetic.  Scale: pure per-row projection — but CPU-bound (four
    regex passes per row), so the scan fans out first: a one-row-group
    documents file otherwise runs the whole panel single-threaded
    (the 8× probe measured 9×; ``fanout_small_scan`` self-gates off
    at real scale).
    """
    from ..tables import fanout_small_scan

    docs = fanout_small_scan(
        load_table(spark, sf_dir, "documents"), spark
    )

    def cnt(col, pat):
        return F.size(F.regexp_extract_all(col, F.lit(pat), 0)).cast("long")

    m = docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        cnt(F.col("text"), r"[^A-Za-z0-9\s]{3,}").alias("symbol_runs"),
        cnt(F.col("text"), r"[a-z][A-Z]").alias("case_flips"),
        cnt(F.col("text"), r"[0-9][A-Za-z]|[A-Za-z][0-9]").alias(
            "digit_mixes"
        ),
        cnt(
            F.lower("text"), r"[bcdfghjklmnpqrstvwxz]{5,}"
        ).alias("consonant_runs"),
    )
    scored = m.selectExpr(
        "doc_id",
        "n_chars",
        "symbol_runs",
        "case_flips",
        "digit_mixes",
        "consonant_runs",
        "(3*symbol_runs + 2*case_flips + digit_mixes + 2*consonant_runs)"
        " * 10000 DIV greatest(n_chars, 1) AS garbage_per_10k",
        "(3*symbol_runs + 2*case_flips + digit_mixes + 2*consonant_runs)"
        f" * 10000 DIV greatest(n_chars, 1) >= {OCR_FLAG_PER_10K}"
        " AS flagged",
    )
    # top-K worst only: the per-doc verdict table is a SINK at scale,
    # not a result set — returning every row made this the probe's
    # worst query (the cost was collecting 320k rows, not computing
    # them).  TopK is what a triage run reads.
    return scored.orderBy(
        F.desc("garbage_per_10k"), F.asc("doc_id")
    ).limit(OCR_TOP_K)


QUERIES["text_ocr_garbage"] = ocr_garbage

ORACLES["text_ocr_garbage"] = rf"""
    WITH m AS (
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]{{3,}}'))
                    AS BIGINT) AS symbol_runs,
               CAST(len(regexp_extract_all(text, '[a-z][A-Z]'))
                    AS BIGINT) AS case_flips,
               CAST(len(regexp_extract_all(text,
                    '[0-9][A-Za-z]|[A-Za-z][0-9]')) AS BIGINT)
                   AS digit_mixes,
               CAST(len(regexp_extract_all(lower(text),
                    '[bcdfghjklmnpqrstvwxz]{{5,}}')) AS BIGINT)
                   AS consonant_runs
        FROM documents
    )
    SELECT doc_id, n_chars, symbol_runs, case_flips, digit_mixes,
           consonant_runs,
           (3*symbol_runs + 2*case_flips + digit_mixes
            + 2*consonant_runs) * 10000 // greatest(n_chars, 1)
               AS garbage_per_10k,
           (3*symbol_runs + 2*case_flips + digit_mixes
            + 2*consonant_runs) * 10000 // greatest(n_chars, 1)
               >= {OCR_FLAG_PER_10K} AS flagged
    FROM m
    ORDER BY garbage_per_10k DESC, doc_id ASC
    LIMIT {OCR_TOP_K}
"""


# ------------------------------------------------- Burrows' delta

DELTA_TOP_WORDS = 30


def burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' delta between sources: the classic stylometric distance
    (mean |z_a − z_b| over the corpus' top function words, z-scored per
    word across sources) — the source-similarity matrix that surfaces
    mirrored/scraped-from-each-other domains a URL-level dedup misses.

    Exactness: per-source word rates are ppm integers (half-up device);
    each word's z-score is (S·fpm − Σx)/sqrt(S·Σx² − (Σx)²) — exact
    integers inside one sqrt and one division; each |z_a − z_b| term is
    integer-scaled (1e6) before the order-free per-pair sum.  Words
    with zero cross-source variance are dropped (z undefined).  Scale:
    one (source, token) count, a K-word grid (K·#sources cells), and a
    K·#pairs join — bounded by design.
    """
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "source", F.explode(tokens_col(F.col("text"))).alias("tok")
        )
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    ).cache()
    ns = tf.groupBy("source").agg(F.sum("c").alias("n_s"))
    wtot = tf.groupBy("tok").agg(F.sum("c").alias("tc"))
    wrank = Window.orderBy(F.desc("tc"), F.asc("tok"))
    top = (
        wtot.withColumn("rk", F.row_number().over(wrank))
        .filter(F.col("rk") <= DELTA_TOP_WORDS)
        .select("tok")
    )
    grid = (
        top.crossJoin(ns)
        .join(tf, ["source", "tok"], "left")
        .selectExpr(
            "tok",
            "source",
            "(2*COALESCE(c, 0)*1000000 + n_s) DIV (2*n_s) AS fpm",
        )
    )
    # per-word moments as WINDOW aggregates over the one grid pass (a
    # moments groupBy + join re-expanded the whole grid subtree), and
    # pair terms generated IN-ROW from each word's sorted (source, z)
    # list — the z⋈z self-join re-expanded the grid 2× more (97
    # exchanges / 670 plan lines for a 4k-row frame; now one Generate).
    wtok = Window.partitionBy("tok")
    z = (
        grid.withColumn("s", F.count(F.lit(1)).over(wtok))
        .withColumn("sx", F.sum("fpm").over(wtok))
        .withColumn(
            "sxx", F.sum(F.col("fpm") * F.col("fpm")).over(wtok)
        )
        .filter(F.col("s") * F.col("sxx") - F.col("sx") * F.col("sx") > 0)
        .selectExpr(
            "tok",
            "source",
            "(s * fpm - sx)"
            " / sqrt(CAST(s * sxx - sx * sx AS DOUBLE)) AS z",
        )
    )
    pairs = (
        z.groupBy("tok")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("source", "z"))
            ).alias("zs")
        )
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(zs, (x, i) ->"
                    " transform(slice(zs, i + 2, size(zs)), y ->"
                    " struct(x.source AS source_a,"
                    " y.source AS source_b,"
                    " CAST(round(1000000 * abs(x.z - y.z)) AS BIGINT)"
                    " AS term))))"
                )
            ).alias("p")
        )
        .select("p.*")
    )
    return (
        pairs.groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("term").alias("tsum"),
        )
        .selectExpr(
            "source_a",
            "source_b",
            "n_words",
            "round(CAST(tsum AS DOUBLE) / n_words / 1e6, 6) AS delta",
        )
        .orderBy("source_a", "source_b")
    )


QUERIES["text_burrows_delta"] = burrows_delta

ORACLES["text_burrows_delta"] = f"""
    WITH tf AS (
        SELECT source, tok, count(*) AS c
        FROM (SELECT source, unnest({_TOKS}) AS tok FROM documents)
        GROUP BY 1, 2
    ),
    ns AS (SELECT source, sum(c) AS n_s FROM tf GROUP BY 1),
    top AS (
        SELECT tok FROM (
            SELECT tok, row_number() OVER (ORDER BY sum(c) DESC, tok)
                       AS rk
            FROM tf GROUP BY tok
        ) WHERE rk <= {DELTA_TOP_WORDS}
    ),
    grid AS (
        SELECT t.tok, n.source,
               (2*COALESCE(f.c, 0)*1000000 + n.n_s) // (2*n.n_s) AS fpm
        FROM top t CROSS JOIN ns n
        LEFT JOIN tf f ON f.tok = t.tok AND f.source = n.source
    ),
    moments AS (
        SELECT tok, count(*) AS s, sum(fpm) AS sx,
               sum(fpm * fpm) AS sxx
        FROM grid GROUP BY tok
    ),
    z AS (
        SELECT g.tok, g.source,
               (m.s * g.fpm - m.sx)
               / sqrt(CAST(m.s * m.sxx - m.sx * m.sx AS DOUBLE)) AS z
        FROM grid g JOIN moments m ON g.tok = m.tok
        WHERE m.s * m.sxx - m.sx * m.sx > 0
    ),
    pairs AS (
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(round(1000000 * abs(a.z - b.z)) AS BIGINT) AS term
        FROM z a JOIN z b
          ON a.tok = b.tok AND a.source < b.source
    )
    SELECT source_a, source_b,
           CAST(count(*) AS BIGINT) AS n_words,
           round(CAST(sum(term) AS DOUBLE) / count(*) / 1e6, 6) AS delta
    FROM pairs GROUP BY 1, 2 ORDER BY source_a, source_b
"""


# ------------------------------------------- stopword-coverage panel

STOPWORD_TOP = 20


def stopword_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source coverage of the corpus' own top-K tokens — the
    "function-word mass" panel: natural prose spends a large, stable
    fraction of its tokens on the corpus' most common words; keyword
    lists, tables, and generated text do not.  Corpus-derived rather
    than a fixed list, so it is language-agnostic.

    Exactness: the top-K set is a deterministic rank cut (count desc,
    token asc); coverage is an integer-ppm device.  Scale: one
    (source, token) count feeds both the global cut and the per-source
    rollup; the top-K set broadcasts.
    """
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "source", F.explode(tokens_col(F.col("text"))).alias("tok")
        )
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    ).cache()
    wrank = Window.orderBy(F.desc("tc"), F.asc("tok"))
    top = (
        tf.groupBy("tok")
        .agg(F.sum("c").alias("tc"))
        .withColumn("rk", F.row_number().over(wrank))
        .filter(F.col("rk") <= STOPWORD_TOP)
        .select("tok")
    )
    per = (
        tf.join(F.broadcast(top), "tok", "left_semi")
        .groupBy("source")
        .agg(F.sum("c").alias("stop_tokens"))
    )
    tot = tf.groupBy("source").agg(F.sum("c").alias("n_tokens"))
    return (
        tot.join(per, "source", "left")
        .selectExpr(
            "source",
            "n_tokens",
            "COALESCE(stop_tokens, 0) AS stop_tokens",
            "(2*COALESCE(stop_tokens, 0)*1000000 + n_tokens)"
            " DIV (2*n_tokens) AS coverage_ppm",
        )
        .orderBy("source")
    )


QUERIES["text_stopword_profile"] = stopword_profile

ORACLES["text_stopword_profile"] = f"""
    WITH tf AS (
        SELECT source, tok, count(*) AS c
        FROM (SELECT source, unnest({_TOKS}) AS tok FROM documents)
        GROUP BY 1, 2
    ),
    top AS (
        SELECT tok FROM (
            SELECT tok, row_number() OVER (ORDER BY sum(c) DESC, tok)
                       AS rk
            FROM tf GROUP BY tok
        ) WHERE rk <= {STOPWORD_TOP}
    ),
    per AS (
        SELECT source, sum(c) AS stop_tokens
        FROM tf WHERE tok IN (SELECT tok FROM top) GROUP BY 1
    ),
    tot AS (SELECT source, sum(c) AS n_tokens FROM tf GROUP BY 1)
    SELECT t.source,
           CAST(t.n_tokens AS BIGINT) AS n_tokens,
           CAST(COALESCE(p.stop_tokens, 0) AS BIGINT) AS stop_tokens,
           CAST((2*COALESCE(p.stop_tokens, 0)*1000000 + t.n_tokens)
                // (2*t.n_tokens) AS BIGINT) AS coverage_ppm
    FROM tot t LEFT JOIN per p ON t.source = p.source
    ORDER BY t.source
"""


# ------------------------------------- Simpson lexical concentration


def simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Simpson/Herfindahl concentration of the token
    distribution: D = Σc(c−1)/(n(n−1)) — the probability two random
    tokens coincide — and its inverse (effective vocabulary size).
    Unlike the entropy panels this is an EXACT RATIONAL of integer
    counts: no logarithm, no float summation anywhere before the two
    final divisions, which makes it the cheapest cross-engine-stable
    diversity score in the text family.

    Scale: one (source, token) count (same shuffle key as the TF-IDF
    family), then a per-source integer rollup.
    """
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "source", F.explode(tokens_col(F.col("text"))).alias("tok")
        )
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per = tf.groupBy("source").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("vocab"),
        F.sum(F.col("c") * (F.col("c") - 1)).alias("coll"),
    )
    return per.selectExpr(
        "source",
        "n AS n_tokens",
        "CAST(vocab AS BIGINT) AS vocab",
        "round(CAST(coll AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1)), 6)"
        " AS simpson_d",
        "round((CAST(n AS DOUBLE) * (n - 1)) / CAST(coll AS DOUBLE), 6)"
        " AS inv_simpson",
    ).orderBy("source")


QUERIES["text_simpson_diversity"] = simpson_diversity

ORACLES["text_simpson_diversity"] = f"""
    WITH tf AS (
        SELECT source, tok, count(*) AS c
        FROM (SELECT source, unnest({_TOKS}) AS tok FROM documents)
        GROUP BY 1, 2
    ),
    per AS (
        SELECT source, sum(c) AS n, count(*) AS vocab,
               sum(c * (c - 1)) AS coll
        FROM tf GROUP BY 1
    )
    SELECT source, CAST(n AS BIGINT) AS n_tokens,
           CAST(vocab AS BIGINT) AS vocab,
           round(CAST(coll AS DOUBLE)
                 / (CAST(n AS DOUBLE) * (n - 1)), 6) AS simpson_d,
           round((CAST(n AS DOUBLE) * (n - 1))
                 / CAST(coll AS DOUBLE), 6) AS inv_simpson
    FROM per ORDER BY source
"""


# ------------------------------------------- token coverage curve

COVERAGE_CUTS = (10, 30, 100, 300, 1000)


def coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative token-coverage curve: what fraction of the corpus'
    token mass the top-N types cover, for N in {10, 30, 100, 300,
    1000} — the Zipf companion a tokenizer-budget decision reads
    (BPE vocab sizing, stopword cutoffs, head/tail splits).

    Exactness: the rank cut is deterministic (count desc, token asc);
    coverage ships as the integer half-add ppm.  Scale: one token
    count, one rank window over the VOCABULARY (types, not tokens),
    and a 5-row cut table — the curve costs one extra tiny join over
    the plain frequency table.
    """
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(tokens_col(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = tf.agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("vocab")
    )
    w = Window.orderBy(F.desc("c"), F.asc("tok"))
    # the literal rank cut makes Catalyst rewrite the partition-less
    # window to TakeOrderedAndProject(limit=max cut): per-partition
    # top-K + driver merge, no SinglePartition exchange ever sees the
    # vocabulary frame
    ranked = (
        tf.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= max(COVERAGE_CUTS))
    )
    cuts = values_df(
        spark, [(int(k),) for k in COVERAGE_CUTS], "n_top long"
    )
    return (
        cuts.join(ranked, F.col("rk") <= F.col("n_top"))
        .crossJoin(F.broadcast(tot))
        .groupBy("n_top")
        .agg(
            F.any_value("vocab").alias("vocab"),
            F.sum("c").alias("tokens_covered"),
            F.any_value("n").alias("n"),
        )
        .selectExpr(
            "n_top",
            "CAST(vocab AS BIGINT) AS vocab",
            "tokens_covered",
            "(2*tokens_covered*1000000 + n) DIV (2*n) AS coverage_ppm",
        )
        .orderBy("n_top")
    )


QUERIES["text_coverage_curve"] = coverage_curve

ORACLES["text_coverage_curve"] = f"""
    WITH tf AS (
        SELECT tok, count(*) AS c
        FROM (SELECT unnest({_TOKS}) AS tok FROM documents)
        GROUP BY 1
    ),
    tot AS (SELECT sum(c) AS n, count(*) AS vocab FROM tf),
    ranked AS (
        SELECT c, row_number() OVER (ORDER BY c DESC, tok ASC) AS rk
        FROM tf
    ),
    cuts AS (SELECT unnest([{", ".join(str(k) for k in COVERAGE_CUTS)}])
             AS n_top)
    SELECT CAST(k.n_top AS BIGINT) AS n_top,
           CAST(any_value(t.vocab) AS BIGINT) AS vocab,
           CAST(sum(r.c) AS BIGINT) AS tokens_covered,
           CAST((2*sum(r.c)*1000000 + any_value(t.n))
                // (2*any_value(t.n)) AS BIGINT) AS coverage_ppm
    FROM cuts k JOIN ranked r ON r.rk <= k.n_top CROSS JOIN tot t
    GROUP BY 1 ORDER BY 1
"""


# -------------------------------- Jensen-Shannon divergence by lang


def js_divergence_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence (bits) between the unigram
    distributions of every language pair — the symmetric, bounded
    [0, 1] distance a domain-mixing / contamination monitor tracks
    (0 = identical vocabularies, 1 = disjoint).

    Each JSD term p·ln(2p/(p+q)) is evaluated from exact integer
    counts and frozen to a 1e6 integer scaled by the integer count
    (the ``zipf_fit`` device), so cross-token sums are exact.  Scale:
    the (lang, token) table is VOCABULARY-sized — the pair grid and
    both hash joins run on frames bounded by |langs|²·|vocab|, never
    by corpus size.
    """
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "lang", F.explode(tokens_col(F.col("text"))).alias("tok")
        )
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    ).cache()
    nl = tf.groupBy("lang").agg(F.sum("c").alias("n"))
    langs = nl.select("lang", "n")
    vocab = tf.select("tok").distinct()
    a = langs.selectExpr("lang AS lang_a", "n AS na")
    b = langs.selectExpr("lang AS lang_b", "n AS nb")
    grid = (
        a.join(b, F.col("lang_a") < F.col("lang_b"))
        .crossJoin(vocab)
        .join(
            F.broadcast(
                tf.selectExpr("lang AS lang_a", "tok", "c AS ca")
            ),
            ["lang_a", "tok"],
            "left",
        )
        .join(
            F.broadcast(
                tf.selectExpr("lang AS lang_b", "tok", "c AS cb")
            ),
            ["lang_b", "tok"],
            "left",
        )
        .na.fill(0, ["ca", "cb"])
        .filter("ca + cb > 0")
    )
    terms = grid.selectExpr(
        "lang_a",
        "lang_b",
        "na",
        "nb",
        "CASE WHEN ca > 0 THEN ca * CAST(round(ln("
        " 2.0 * ca * nb / (CAST(ca AS DOUBLE) * nb"
        " + CAST(cb AS DOUBLE) * na)) * 1e6) AS BIGINT)"
        " ELSE 0 END AS tp",
        "CASE WHEN cb > 0 THEN cb * CAST(round(ln("
        " 2.0 * cb * na / (CAST(ca AS DOUBLE) * nb"
        " + CAST(cb AS DOUBLE) * na)) * 1e6) AS BIGINT)"
        " ELSE 0 END AS tq",
    )
    return (
        terms.groupBy("lang_a", "lang_b")
        .agg(
            F.sum("tp").alias("sp"),
            F.sum("tq").alias("sq"),
            F.any_value("na").alias("na"),
            F.any_value("nb").alias("nb"),
        )
        .selectExpr(
            "lang_a",
            "lang_b",
            "round((CAST(sp AS DOUBLE) / na + CAST(sq AS DOUBLE) / nb)"
            " / 2e6 / ln(2), 6) AS jsd_bits",
        )
        .orderBy("lang_a", "lang_b")
    )


QUERIES["text_js_divergence"] = js_divergence_langs

ORACLES["text_js_divergence"] = f"""
    WITH tf AS (
        SELECT lang, tok, count(*) AS c
        FROM (SELECT lang, unnest({_TOKS}) AS tok FROM documents)
        GROUP BY 1, 2
    ),
    nl AS (SELECT lang, sum(c) AS n FROM tf GROUP BY 1),
    pairs AS (
        SELECT a.lang AS lang_a, b.lang AS lang_b,
               COALESCE(ta.c, 0) AS ca, COALESCE(tb.c, 0) AS cb,
               na.n AS na, nb.n AS nb
        FROM (SELECT DISTINCT lang FROM tf) a
        JOIN (SELECT DISTINCT lang FROM tf) b ON a.lang < b.lang
        JOIN (SELECT DISTINCT tok FROM tf) v ON true
        LEFT JOIN tf ta ON ta.lang = a.lang AND ta.tok = v.tok
        LEFT JOIN tf tb ON tb.lang = b.lang AND tb.tok = v.tok
        JOIN nl na ON na.lang = a.lang
        JOIN nl nb ON nb.lang = b.lang
        WHERE COALESCE(ta.c, 0) + COALESCE(tb.c, 0) > 0
    ),
    terms AS (
        SELECT lang_a, lang_b, na, nb,
               CASE WHEN ca > 0 THEN ca * CAST(round(ln(
                   2.0 * ca * nb / (CAST(ca AS DOUBLE) * nb
                   + CAST(cb AS DOUBLE) * na)) * 1e6) AS BIGINT)
               ELSE 0 END AS tp,
               CASE WHEN cb > 0 THEN cb * CAST(round(ln(
                   2.0 * cb * na / (CAST(ca AS DOUBLE) * nb
                   + CAST(cb AS DOUBLE) * na)) * 1e6) AS BIGINT)
               ELSE 0 END AS tq
        FROM pairs
    )
    SELECT lang_a, lang_b,
           round((CAST(sum(tp) AS DOUBLE) / any_value(na)
                  + CAST(sum(tq) AS DOUBLE) / any_value(nb))
                 / 2e6 / ln(2), 6) AS jsd_bits
    FROM terms GROUP BY 1, 2 ORDER BY 1, 2
"""


# ------------------------------------------- tokenizer fertility audit


def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer fertility audit over the applied-BPE
    stream: bytes per BPE token and BPE tokens per whitespace word —
    the table a tokenizer team reads before training a multilingual
    model (a language whose bytes-per-token is 2× the corpus mean pays
    2× the context budget for the same text; fertility >> 1 vs
    whitespace words means the vocab under-serves that language).
    VERDICT r6 task 7(b): composes the existing trainer
    ([[text_bpe_train]], via the session merge-table memo) with the
    greedy Arrow ``mapInPandas`` apply of [[text_bpe_apply]], keyed by
    ``lang`` and joined with exact byte counts.

    Exactness: byte counts are ``octet_length`` (UTF-8 octets, DuckDB
    ``strlen``), token counts are exact longs from the same greedy
    left-to-right merge the oracle unrolls in SQL; ratios are half-add
    ppm over DECIMAL(38,0) sums.  Scale: merge application is doc-local
    (no shuffle until the |langs|-row rollup), identical to
    ``bpe_apply``'s shape.
    """
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents")
    merges = corpus_stat(
        docs,
        ("bpe_merges", BPE_SAMPLE_MOD),
        lambda: [
            (r["left"], r["right"])
            for r in bpe_train(spark, sf_dir).collect()
        ],
    )
    src = docs.select(
        "lang",
        F.octet_length("text").alias("nbytes"),
        tokens_col(F.col("text")).alias("toks"),
    )

    def apply_merges(batches):
        for pdf in batches:
            langs, byts, nb, na = [], [], [], []
            for lg, nby, toks in zip(pdf["lang"], pdf["nbytes"], pdf["toks"]):
                toks = list(toks)
                n0 = len(toks)
                for a, b in merges:
                    out = []
                    i = 0
                    n = len(toks)
                    while i < n:
                        if i + 1 < n and toks[i] == a and toks[i + 1] == b:
                            out.append(a + b)
                            i += 2
                        else:
                            out.append(toks[i])
                            i += 1
                    toks = out
                langs.append(lg)
                byts.append(int(nby))
                nb.append(n0)
                na.append(len(toks))
            yield pd.DataFrame(
                {"lang": langs, "nbytes": byts, "nb": nb, "na": na}
            )

    per_doc = src.mapInPandas(
        apply_merges, "lang string, nbytes long, nb long, na long"
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("nbytes").cast("decimal(38,0)")).alias("b"),
            F.sum(F.col("nb").cast("decimal(38,0)")).alias("snb"),
            F.sum(F.col("na").cast("decimal(38,0)")).alias("sna"),
        )
        .selectExpr(
            "lang",
            "CAST(n_docs AS BIGINT) AS n_docs",
            "CAST(b AS BIGINT) AS n_bytes",
            "CAST(snb AS BIGINT) AS tokens_ws",
            "CAST(sna AS BIGINT) AS tokens_bpe",
            "(2 * b * 1000000 + sna) DIV (2 * sna) AS bytes_per_bpe_tok_ppm",
            "(2 * sna * 1000000 + snb) DIV (2 * snb) AS bpe_per_ws_ppm",
        )
        .orderBy("lang")
    )


QUERIES["text_tokenizer_fertility"] = tokenizer_fertility


def _tokenizer_fertility_oracle() -> str:
    """The bpe_apply oracle chain (train on the sample, unroll the k
    merges over the full stream) regrouped by lang with byte sums."""
    base = _bpe_apply_oracle()
    head, _, _tail = base.rpartition("SELECT d.source,")
    assert head, "bpe_apply oracle tail marker moved"
    return (
        head
        + f"""SELECT d.lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(strlen(d.text)) AS BIGINT) AS n_bytes,
           CAST(sum(nb.nb) AS BIGINT) AS tokens_ws,
           CAST(sum(na.na) AS BIGINT) AS tokens_bpe,
           CAST((2 * sum(strlen(d.text)) * 1000000 + sum(na.na))
                // (2 * sum(na.na)) AS BIGINT) AS bytes_per_bpe_tok_ppm,
           CAST((2 * sum(na.na) * 1000000 + sum(nb.nb))
                // (2 * sum(nb.nb)) AS BIGINT) AS bpe_per_ws_ppm
    FROM documents d
    JOIN nb ON nb.doc_id = d.doc_id
    JOIN na ON na.doc_id = d.doc_id
    GROUP BY d.lang ORDER BY lang
    """
    )


ORACLES["text_tokenizer_fertility"] = _tokenizer_fertility_oracle()


# ------------------------------------------- vocab-size sweep

def vocab_fertility_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer vocab-size tuning curve: corpus token count and bytes
    per token after 0, 1, …, ``BPE_ITERS`` learned merges — the
    evidence behind "how big should the vocabulary be?" (each merge
    buys compression; the curve's flattening shows where additional
    vocab stops paying for its embedding rows).
    [[text_tokenizer_fertility]] answers per-language equity at the
    FINAL vocab; this sweeps the size axis.

    Exactness: checkpoint counts come from the same greedy
    left-to-right (overlap-safe) rewrite as [[text_bpe_apply]] — NOT
    from subtracting training pair counts, which overcount
    self-overlapping pairs ("a a a" has 2 lead-pairs but 1 merge).
    Scale shape: merges ride the session merge-table memo; ONE Arrow
    ``mapInPandas`` pass emits all checkpoint counts per doc; one
    aggregate stacks to |checkpoints| rows via 1-row inline.
    """
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents")
    merges = corpus_stat(
        docs,
        ("bpe_merges", BPE_SAMPLE_MOD),
        lambda: [
            (r["left"], r["right"])
            for r in bpe_train(spark, sf_dir).collect()
        ],
    )
    src = docs.select(
        F.octet_length("text").alias("nbytes"),
        tokens_col(F.col("text")).alias("toks"),
    )
    n_ck = len(merges) + 1
    schema = "nbytes long, " + ", ".join(
        f"n{k} long" for k in range(n_ck)
    )

    def count_checkpoints(batches):
        for pdf in batches:
            out = {"nbytes": [int(b) for b in pdf["nbytes"]]}
            cols = [[] for _ in range(n_ck)]
            for toks in pdf["toks"]:
                toks = list(toks)
                cols[0].append(len(toks))
                for ck, (a, b) in enumerate(merges, start=1):
                    res = []
                    i = 0
                    n = len(toks)
                    while i < n:
                        if i + 1 < n and toks[i] == a and toks[i + 1] == b:
                            res.append(a + b)
                            i += 2
                        else:
                            res.append(toks[i])
                            i += 1
                    toks = res
                    cols[ck].append(len(toks))
            for k in range(n_ck):
                out[f"n{k}"] = cols[k]
            yield pd.DataFrame(out)

    per_doc = src.mapInPandas(count_checkpoints, schema)
    aggs = [F.sum(F.col("nbytes").cast("decimal(38,0)")).alias("b")]
    for k in range(n_ck):
        aggs.append(
            F.sum(F.col(f"n{k}").cast("decimal(38,0)")).alias(f"t{k}")
        )
    one = per_doc.agg(*aggs)
    rows = ", ".join(
        f"named_struct('k', {k}L, 't', t{k})" for k in range(n_ck)
    )
    return (
        one.selectExpr("b", f"inline(array({rows}))")
        .selectExpr(
            "CAST(k AS BIGINT) AS n_merges",
            "CAST(t AS BIGINT) AS n_tokens",
            "CAST((2 * b * 1000000 + t) DIV (2 * t) AS BIGINT)"
            " AS bytes_per_token_ppm",
        )
        .orderBy("n_merges")
    )


QUERIES["text_vocab_fertility_sweep"] = vocab_fertility_sweep


def _vocab_sweep_oracle() -> str:
    """Train CTEs on the sample, rewrite the FULL corpus through every
    checkpoint, count each stage — the SQL twin of the sweep kernel."""
    blocks = [
        f"""
    ts0 AS MATERIALIZED (
        SELECT doc_id, i AS pos, w[i] AS tok
        FROM (SELECT doc_id, {_TOKS} AS w FROM documents
              WHERE doc_id % {BPE_SAMPLE_MOD} = 0),
             unnest(range(1, len(w) + 1)) AS u(i)
    )"""
    ]
    for s in range(1, BPE_ITERS + 1):
        prev, p, m = f"ts{s - 1}", f"pairs{s}", f"m{s}"
        blocks.append(f"""
    {p} AS MATERIALIZED (
        SELECT a, b, CAST(count(*) AS BIGINT) AS n FROM (
            SELECT tok AS a,
                   LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS b
            FROM {prev}
        ) WHERE b IS NOT NULL GROUP BY a, b
    ),
    {m} AS MATERIALIZED (
        SELECT a, b, n FROM {p} ORDER BY n DESC, a ASC, b ASC LIMIT 1
    ),{_bpe_rewrite_ctes(prev, m, f"marked{s}", f"ts{s}")}""")
    blocks.append(f"""
    fs0 AS MATERIALIZED (
        SELECT doc_id, i AS pos, w[i] AS tok
        FROM (SELECT doc_id, {_TOKS} AS w FROM documents),
             unnest(range(1, len(w) + 1)) AS u(i)
    )""")
    for s in range(1, BPE_ITERS + 1):
        blocks.append(
            _bpe_rewrite_ctes(f"fs{s - 1}", f"m{s}", f"vmk{s}", f"fs{s}")
        )
    blocks.append("""
    bytes_total AS MATERIALIZED (
        SELECT sum(strlen(text)) AS b FROM documents
    )""")
    cells = " UNION ALL ".join(
        f"SELECT {k} AS k, (SELECT count(*) FROM fs{k}) AS t"
        for k in range(BPE_ITERS + 1)
    )
    return (
        "WITH "
        + ",".join(blocks)
        + f"""
    SELECT CAST(k AS BIGINT) AS n_merges,
           CAST(t AS BIGINT) AS n_tokens,
           CAST((2 * (SELECT b FROM bytes_total) * 1000000 + t)
                // (2 * t) AS BIGINT) AS bytes_per_token_ppm
    FROM ({cells}) ORDER BY n_merges
    """
    )


ORACLES["text_vocab_fertility_sweep"] = _vocab_sweep_oracle()


# ------------------------------------------- Heaps projection

#: Corpus growth multiples priced by the projection.
HEAPS_SCALES = (10, 100)


def heaps_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-growth projection per source: with Heaps' law
    V = K·N^β and β = ln V / ln N fitted from the observed
    (tokens, vocab) point ([[text_hapax_heaps]]'s exponent), the
    projected vocabulary at 10× and 100× the corpus is simply
    V·scale^β — the capacity-planning number behind "how many distinct
    tokens will the 100 TB crawl hold?" (drives tokenizer vocab
    budgets, NDV-sketch widths, and dictionary-encoding decisions).

    Exactness: β freezes to a 1e6 integer before exponentiation (the
    hill/zipf device); projections round to whole tokens, so a
    last-ulp pow() difference cannot move the integer except on a
    measure-zero boundary.  Scale shape: same two aggregates as the
    hapax panel — one (source, token) groupBy, one source rollup.
    """
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "source", F.explode(tokens_col(F.col("text"))).alias("tok")
        )
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    base = tf.groupBy("source").agg(
        F.sum("f").alias("n_tokens"),
        F.count(F.lit(1)).alias("vocab"),
    )
    scored = base.selectExpr(
        "source",
        "n_tokens",
        "vocab",
        "CAST(round(ln(CAST(vocab AS DOUBLE))"
        " / ln(CAST(n_tokens AS DOUBLE)) * 1e6) AS BIGINT) AS b6",
    )
    proj = [
        f"CAST(round(vocab * pow({s}.0, CAST(b6 AS DOUBLE) / 1e6))"
        f" AS BIGINT) AS vocab_at_{s}x"
        for s in HEAPS_SCALES
    ]
    return scored.selectExpr(
        "source",
        "CAST(n_tokens AS BIGINT) AS n_tokens",
        "CAST(vocab AS BIGINT) AS vocab",
        "round(CAST(b6 AS DOUBLE) / 1e6, 6) AS heaps_beta",
        *proj,
    ).orderBy("source")


QUERIES["text_heaps_projection"] = heaps_projection

_HP_PROJ = ", ".join(
    f"CAST(round(vocab * pow({s}.0, CAST(b6 AS DOUBLE) / 1e6))"
    f" AS BIGINT) AS vocab_at_{s}x"
    for s in HEAPS_SCALES
)

ORACLES["text_heaps_projection"] = f"""
    WITH tok AS (
        SELECT source, unnest({_TOKS}) AS tok FROM documents
    ),
    tf AS (SELECT source, tok, count(*) AS f FROM tok GROUP BY 1, 2),
    base AS (
        SELECT source, sum(f) AS n_tokens, count(*) AS vocab
        FROM tf GROUP BY source
    ),
    scored AS (
        SELECT source, n_tokens, vocab,
               CAST(round(ln(CAST(vocab AS DOUBLE))
                    / ln(CAST(n_tokens AS DOUBLE)) * 1e6) AS BIGINT)
                   AS b6
        FROM base
    )
    SELECT source,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(vocab AS BIGINT) AS vocab,
           round(CAST(b6 AS DOUBLE) / 1e6, 6) AS heaps_beta,
           {_HP_PROJ}
    FROM scored ORDER BY source
"""
