"""Corpus quality filters for pre-training pipelines: Gopher-style rule
filters, intra-document repetition, PII scanning, and per-source caps.

These extend ``operators/text.py``'s per-document signals into the
*filter decisions* a large-scale training-data pipeline actually ships:

- ``quality_gopher_rules`` — the published Gopher quality heuristics
  (word-count bounds, mean-word-length bounds, symbol-to-word ratio,
  alphabetic-word fraction, stopword presence; Rae et al. 2021 §A1.1),
  aggregated to a per-source keep-rate scoreboard.
- ``quality_repetition_ratio`` — duplicate token / duplicate trigram
  character fractions (the "repetitious text" filter family).
- ``quality_pii_scan`` — regex PII accounting (emails, IPv4, long digit
  runs) with redaction character deltas, per source.
- ``quality_source_cap`` — deterministic per-source document cap (the
  "no domain may exceed K docs" balancing rule).

Scale notes (100 TB): the first three are pure Catalyst expressions —
narrow map stages over the document scan with map-side partial
aggregation into tiny (per-source / per-rule) result sets; nothing
leaves the JVM and nothing shuffles more than the final few-KB
aggregate. ``quality_source_cap`` ranks within source via a window —
one hash-partition shuffle on ``source``; at mega-domain skew the scale
path is AQE skew splitting plus a two-phase variant (per-source count
broadcast, then filter on the uniform md5 rank-hash below the K/n
quantile — approximate but shuffle-free); the window form is kept here
because the cap semantics are exact and per-source partitions at the
tested SFs are small.

Regex patterns are restricted to the syntax subset shared by Java
regex (Spark) and RE2 (DuckDB) so the oracle executes the identical
automaton: character classes, bounded repetition, alternation — no
backrefs, no lookaround.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import fanout_small_scan, load_table
from .text import LR_W, STOPWORDS, tokens_col

# ---------------------------------------------------------------- rules

# Gopher rule thresholds (Rae et al. 2021, Table A1) — public knowledge.
WC_MIN, WC_MAX = 50, 100_000
MWL_MIN, MWL_MAX = 3.0, 10.0
SYMBOL_RATIO_MAX = 0.10  # '#' or '...' per word
ALPHA_WORD_FRAC_MIN = 0.80
STOPWORD_MIN_DISTINCT = 2

# PII patterns — Java-regex & RE2 compatible subset.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_DIGIT_RUN = r"[0-9]{9,}"

SOURCE_CAP_K = 40  # max docs kept per source


def _tok_len_sum(toks):
    return F.aggregate(
        F.transform(toks, lambda t: F.length(t)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


# ------------------------------------------- SQL twins of the rule panel
# Driver build cost: every F.* call is a py4j round-trip (~1.5 ms in this
# sandbox) and the Column form of the rule panel issued several hundred
# per query call — 0.45-1.7 s of driver time inside each timed bench
# entry.  The strings below parse in ONE round-trip and resolve to the
# same Catalyst expressions (same literals, same association order, same
# BETWEEN desugaring), so results are unchanged.

_W_SQL = "split(trim(lower(text)), '\\\\s+')"
_STOP_ARR_SQL = "array(" + ", ".join(f"'{s}'" for s in STOPWORDS) + ")"
_NSYM_SQL = r"regexp_count(text, '#|\\.\\.\\.')"


def _tls_sql(w: str) -> str:
    """SQL twin of ``_tok_len_sum``."""
    return (
        f"aggregate(transform({w}, t -> length(t)),"
        " CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )


def _nstop_sql(w: str) -> str:
    """Distinct stopwords present (≤ 9 — filter the tiny list side)."""
    return f"size(filter({_STOP_ARR_SQL}, s -> array_contains({w}, s)))"


def _rules_keep_sql(w: str) -> str:
    """SQL twin of the five-rule Gopher AND (boolean)."""
    return (
        f"(size({w}) BETWEEN {WC_MIN} AND {WC_MAX}"
        f" AND {_tls_sql(w)} / size({w})"
        f" BETWEEN {MWL_MIN}D AND {MWL_MAX}D"
        f" AND {_NSYM_SQL} / size({w}) <= {SYMBOL_RATIO_MAX}D"
        f" AND size(filter({w}, t -> t RLIKE '[a-z]')) / size({w})"
        f" >= {ALPHA_WORD_FRAC_MIN}D"
        f" AND {_nstop_sql(w)} >= {STOPWORD_MIN_DISTINCT})"
    )


def _lr_p6_sql() -> str:
    """SQL twin of the linear-classifier keep probability, 6-dp rounded
    (the same expression ``text.py``'s inference emits; ``w`` must be
    the tokenized text array and ``n_chars``/``text`` in scope)."""
    w0, w1, w2, w3 = LR_W
    nd = "CAST(size(w) AS DOUBLE)"
    z = (
        f"{w0!r}D + {w1!r}D * ln(1.0D + n_chars)"
        f" + {w2!r}D * (size(array_distinct(w)) / {nd})"
        f" + {w3!r}D * (length(regexp_replace(text, '\\\\s', '')) / {nd})"
    )
    return f"round(1.0D / (1.0D + exp(-({z}))), 6)"


def gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Gopher rule scoreboard: how many documents fail each
    rule, how many pass all, and the keep rate."""
    docs = load_table(spark, sf_dir, "documents")
    # per-rule flags as ONE SQL string per column (see the SQL-twin note
    # above _W_SQL): same expressions, ~2 py4j round-trips instead of
    # ~400 of Column building per call
    flagged = (
        docs.selectExpr("source", "text", f"{_W_SQL} AS w")
        .selectExpr(
            "source",
            f"CAST(NOT (size(w) BETWEEN {WC_MIN} AND {WC_MAX})"
            " AS BIGINT) AS f_wc",
            f"CAST(NOT ({_tls_sql('w')} / size(w)"
            f" BETWEEN {MWL_MIN}D AND {MWL_MAX}D) AS BIGINT) AS f_mwl",
            f"CAST({_NSYM_SQL} / size(w) > {SYMBOL_RATIO_MAX}D"
            " AS BIGINT) AS f_sym",
            f"CAST(size(filter(w, t -> t RLIKE '[a-z]')) / size(w)"
            f" < {ALPHA_WORD_FRAC_MIN}D AS BIGINT) AS f_alpha",
            f"CAST({_nstop_sql('w')} < {STOPWORD_MIN_DISTINCT}"
            " AS BIGINT) AS f_stop",
        )
        .withColumn(
            "passed",
            F.expr(
                "CAST((f_wc + f_mwl + f_sym + f_alpha + f_stop) = 0"
                " AS BIGINT)"
            ),
        )
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("f_wc").alias("fail_word_count"),
            F.sum("f_mwl").alias("fail_mean_word_len"),
            F.sum("f_sym").alias("fail_symbol_ratio"),
            F.sum("f_alpha").alias("fail_alpha_words"),
            F.sum("f_stop").alias("fail_stopwords"),
            F.sum("passed").alias("n_pass"),
            F.round(F.sum("passed") / F.count(F.lit(1)), 6).alias("keep_rate"),
        )
        .orderBy("source")
    )


def _repetition_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-token and duplicate-trigram fractions per document —
    the "repetitious text" quality signal. 1 - distinct/total over the
    token stream and the in-order trigram stream.

    Scan fanned out before the tokenize (single-row-group input, guide
    §2.5) and the per-doc frame checkpointed before the global sort:
    a range exchange SAMPLES its child to pick bounds, so the ordered
    output otherwise evaluates the whole tokenize+distinct chain twice
    (once for the sampler, once for the shuffle write — guide §2.4)."""
    docs = fanout_small_scan(
        load_table(spark, sf_dir, "documents"), spark
    )
    toks = tokens_col(F.col("text"))
    base = docs.select("doc_id", toks.alias("__t")).filter(F.size("__t") >= 3)
    tri = F.expr(
        "transform(sequence(1, size(__t) - 2), i -> "
        "concat(element_at(__t, i), ' ', element_at(__t, i + 1), ' ', "
        "element_at(__t, i + 2)))"
    )
    out = base.select(
        "doc_id",
        F.size("__t").alias("n_tok"),
        F.size(F.array_distinct("__t")).alias("n_tok_distinct"),
        F.size(tri).alias("n_tri"),
        F.size(F.array_distinct(tri)).alias("n_tri_distinct"),
    )
    return out.select(
        "doc_id",
        F.col("n_tok").cast("long").alias("n_tok"),
        F.round(1 - F.col("n_tok_distinct") / F.col("n_tok"), 6).alias(
            "dup_token_ratio"
        ),
        F.round(1 - F.col("n_tri_distinct") / F.col("n_tri"), 6).alias(
            "dup_trigram_ratio"
        ),
    )


def repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered public form of [[_repetition_frame]] (which the
    scan-local plan gate reads directly): checkpoint before the global
    sort so the range sampler reads the materialized per-doc frame
    instead of re-running the tokenize chain (guide §2.4)."""
    return (
        _repetition_frame(spark, sf_dir)
        .localCheckpoint(eager=False)
        .orderBy("doc_id")
    )


def pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII accounting: match counts per pattern, documents
    with any hit, and the total characters a redaction pass would
    remove (length delta of replace-with-empty, summed)."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    n_email = F.regexp_count(t, F.lit(PII_EMAIL))
    n_ipv4 = F.regexp_count(t, F.lit(PII_IPV4))
    n_digit = F.regexp_count(t, F.lit(PII_DIGIT_RUN))
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, PII_EMAIL, ""), PII_IPV4, ""
        ),
        PII_DIGIT_RUN,
        "",
    )
    per_doc = docs.select(
        "source",
        n_email.cast("long").alias("e"),
        n_ipv4.cast("long").alias("i"),
        n_digit.cast("long").alias("d"),
        (F.length(t) - F.length(scrubbed)).cast("long").alias("delta"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("e") + F.col("i") + F.col("d") > 0).cast("long")).alias(
                "docs_with_pii"
            ),
            F.sum("e").alias("n_emails"),
            F.sum("i").alias("n_ipv4"),
            F.sum("d").alias("n_digit_runs"),
            F.sum("delta").alias("redacted_chars"),
        )
        .orderBy("source")
    )


def source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source cap: keep at most SOURCE_CAP_K docs per source, chosen
    by a deterministic uniform order (md5 of the doc id — both engines
    produce identical lowercase hex, so the kept set is reproducible
    cross-engine). Emits the per-source kept/total scoreboard."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("source").orderBy(h, "doc_id")
    ranked = docs.select("source", "doc_id", F.row_number().over(w).alias("rk"))
    return (
        ranked.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("rk") <= SOURCE_CAP_K).cast("long")).alias("n_kept"),
            F.round(
                F.sum((F.col("rk") <= SOURCE_CAP_K).cast("long"))
                / F.count(F.lit(1)),
                6,
            ).alias("kept_frac"),
        )
        .orderBy("source")
    )


QUERIES = {
    "quality_gopher_rules": gopher_rules,
    "quality_repetition_ratio": repetition_ratio,
    "quality_pii_scan": pii_scan,
    "quality_source_cap": source_cap,
}

# ---------------------------------------------------------------- oracles

_TOKS = r"regexp_split_to_array(lower(trim(text)), '\s+')"
_STOP_SQL = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"

ORACLES = {
    "quality_gopher_rules": f"""
        WITH t AS (
            SELECT source, {_TOKS} AS w, text FROM documents
        ),
        flags AS (
            SELECT source,
                   CASE WHEN len(w) BETWEEN {WC_MIN} AND {WC_MAX}
                        THEN 0 ELSE 1 END AS f_wc,
                   CASE WHEN list_sum(list_transform(w, x -> length(x)))
                             * 1.0 / len(w) BETWEEN {MWL_MIN} AND {MWL_MAX}
                        THEN 0 ELSE 1 END AS f_mwl,
                   CASE WHEN len(regexp_extract_all(text, '#|\\.\\.\\.'))
                             * 1.0 / len(w) > {SYMBOL_RATIO_MAX}
                        THEN 1 ELSE 0 END AS f_sym,
                   CASE WHEN len(list_filter(w,
                                  x -> regexp_matches(x, '[a-z]')))
                             * 1.0 / len(w) < {ALPHA_WORD_FRAC_MIN}
                        THEN 1 ELSE 0 END AS f_alpha,
                   CASE WHEN len(list_filter({_STOP_SQL},
                                  s -> list_contains(w, s)))
                             < {STOPWORD_MIN_DISTINCT}
                        THEN 1 ELSE 0 END AS f_stop
            FROM t
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(f_wc) AS BIGINT) AS fail_word_count,
               CAST(sum(f_mwl) AS BIGINT) AS fail_mean_word_len,
               CAST(sum(f_sym) AS BIGINT) AS fail_symbol_ratio,
               CAST(sum(f_alpha) AS BIGINT) AS fail_alpha_words,
               CAST(sum(f_stop) AS BIGINT) AS fail_stopwords,
               CAST(sum(CASE WHEN f_wc + f_mwl + f_sym + f_alpha + f_stop = 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
               ROUND(sum(CASE WHEN f_wc + f_mwl + f_sym + f_alpha + f_stop = 0
                         THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS keep_rate
        FROM flags GROUP BY source ORDER BY source
    """,
    "quality_repetition_ratio": f"""
        WITH t AS (
            SELECT doc_id, {_TOKS} AS w FROM documents
        ),
        base AS (SELECT doc_id, w FROM t WHERE len(w) >= 3),
        tri AS (
            SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
            FROM base, unnest(range(1, len(w) - 1)) AS u(i)
        ),
        tstat AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tri,
                   CAST(count(DISTINCT g) AS BIGINT) AS n_tri_d
            FROM tri GROUP BY doc_id
        )
        SELECT b.doc_id,
               CAST(len(b.w) AS BIGINT) AS n_tok,
               ROUND(1 - len(list_distinct(b.w)) * 1.0 / len(b.w), 6)
                   AS dup_token_ratio,
               ROUND(1 - s.n_tri_d * 1.0 / s.n_tri, 6) AS dup_trigram_ratio
        FROM base b JOIN tstat s ON b.doc_id = s.doc_id
        ORDER BY b.doc_id
    """,
    "quality_pii_scan": f"""
        WITH per_doc AS (
            SELECT source,
                   len(regexp_extract_all(text, '{PII_EMAIL}')) AS e,
                   len(regexp_extract_all(text, '{PII_IPV4}')) AS i,
                   len(regexp_extract_all(text, '{PII_DIGIT_RUN}')) AS d,
                   length(text) - length(
                       regexp_replace(regexp_replace(regexp_replace(
                           text, '{PII_EMAIL}', '', 'g'),
                           '{PII_IPV4}', '', 'g'),
                           '{PII_DIGIT_RUN}', '', 'g')) AS delta
            FROM documents
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN e + i + d > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS docs_with_pii,
               CAST(sum(e) AS BIGINT) AS n_emails,
               CAST(sum(i) AS BIGINT) AS n_ipv4,
               CAST(sum(d) AS BIGINT) AS n_digit_runs,
               CAST(sum(delta) AS BIGINT) AS redacted_chars
        FROM per_doc GROUP BY source ORDER BY source
    """,
    "quality_source_cap": f"""
        WITH ranked AS (
            SELECT source,
                   ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS rk
            FROM documents
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN rk <= {SOURCE_CAP_K} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_kept,
               ROUND(sum(CASE WHEN rk <= {SOURCE_CAP_K} THEN 1 ELSE 0 END)
                     * 1.0 / count(*), 6) AS kept_frac
        FROM ranked GROUP BY source ORDER BY source
    """,
}


# ------------------------------------------------------- corpus report

def corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-stop corpus health report — the front page of a curation
    dashboard, in long (metric, value) form: volume, diversity,
    exact-dup rate, and the Gopher keep rate. Every number is a small
    aggregate over one or two corpus scans; rates are rounded 6dp so
    the report is cross-engine stable.

    Composes the quality surface rather than re-deriving it: the keep
    rate aggregates ``gopher_rules``'s per-source scoreboard, so the
    dashboard can never disagree with the filter it summarizes."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col(F.col("text"))
    norm = F.concat_ws(" ", toks)

    base = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(toks)).alias("n_tokens"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct(F.md5(norm)).alias("n_distinct_fp"),
    )

    # all six volume/diversity rows unpivot from the ONE aggregate row
    # via stack (the previous six-way union re-evaluated the whole
    # tokenize+md5+count-distinct aggregate once per metric — Catalyst
    # shares no subtrees across union branches; guide §2.4)
    six = base.selectExpr(
        "stack(6,"
        " 'n_docs', CAST(n_docs AS DOUBLE),"
        " 'n_tokens', CAST(n_tokens AS DOUBLE),"
        " 'n_sources', CAST(n_sources AS DOUBLE),"
        " 'n_langs', CAST(n_langs AS DOUBLE),"
        " 'mean_doc_tokens', CAST(round(n_tokens / n_docs, 6) AS DOUBLE),"
        " 'exact_dup_rate',"
        "  CAST(round(1 - n_distinct_fp / n_docs, 6) AS DOUBLE)"
        ") AS (metric, value)"
    )

    keep = gopher_rules(spark, sf_dir).agg(
        F.round(F.sum("n_pass") / F.sum("n_docs"), 6).alias("v")
    )
    out = six.unionByName(
        keep.select(
            F.lit("gopher_keep_rate").alias("metric"),
            F.col("v").cast("double").alias("value"),
        )
    )
    return out.orderBy("metric")


QUERIES["corpus_report"] = corpus_report

ORACLES["corpus_report"] = f"""
    WITH base AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len({_TOKS})) AS BIGINT) AS n_tokens,
               CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
               CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
               CAST(count(DISTINCT md5(array_to_string({_TOKS}, ' ')))
                    AS BIGINT) AS n_distinct_fp
        FROM documents
    ),
    gopher AS (
        SELECT ROUND(sum(n_pass) * 1.0 / sum(n_docs), 6) AS v
        FROM ({ORACLES["quality_gopher_rules"]})
    )
    SELECT metric, value FROM (
        SELECT 'n_docs' AS metric, CAST(n_docs AS DOUBLE) AS value FROM base
        UNION ALL
        SELECT 'n_tokens', CAST(n_tokens AS DOUBLE) FROM base
        UNION ALL
        SELECT 'n_sources', CAST(n_sources AS DOUBLE) FROM base
        UNION ALL
        SELECT 'n_langs', CAST(n_langs AS DOUBLE) FROM base
        UNION ALL
        SELECT 'mean_doc_tokens',
               CAST(ROUND(n_tokens * 1.0 / n_docs, 6) AS DOUBLE) FROM base
        UNION ALL
        SELECT 'exact_dup_rate',
               CAST(ROUND(1 - n_distinct_fp * 1.0 / n_docs, 6) AS DOUBLE)
        FROM base
        UNION ALL
        SELECT 'gopher_keep_rate', CAST(v AS DOUBLE) FROM gopher
    ) ORDER BY metric
"""


#: Vocabulary size for the OOV coverage report: top-V tokens by corpus
#: occurrence count (ties broken token-ascending, so the cut is
#: deterministic cross-engine).  Real tokenizer vocabularies are 32k-256k;
#: V is scaled to the synthetic corpus the same way the fixtures scale
#: everything else.
VOCAB_SIZE = 512


def vocab_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage / out-of-vocabulary rate per source — the
    tokenizer-fit health metric a pipeline tracks per data source (a
    source whose OOV rate spikes is drifting away from the tokenizer's
    training distribution).

    Scale shape: token counts are one map-side-combined groupBy on the
    token key; the vocabulary is a TakeOrdered(V) — a driver-sized
    artifact by definition (it IS the tokenizer's vocab file) — and
    rejoins the token stream as a broadcast, so the big stream never
    reshuffles; the per-source rollup is a tiny aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(tokens_col(F.col("text"))).alias("tok")
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("tok").asc())
        .limit(VOCAB_SIZE)
        .select("tok", F.lit(1).alias("__in_vocab"))
    )
    flagged = toks.join(F.broadcast(vocab), "tok", "left")
    oov = F.when(F.col("__in_vocab").isNull(), 1).otherwise(0)
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(oov).alias("n_oov"),
        )
        .select(
            "source",
            "n_tokens",
            "n_oov",
            F.round(
                F.col("n_oov") * 1.0 / F.col("n_tokens"), 6
            ).alias("oov_rate"),
        )
        .orderBy("source")
    )


QUERIES["quality_vocab_oov"] = vocab_oov

ORACLES["quality_vocab_oov"] = f"""
    WITH toks AS (
        SELECT source, unnest({_TOKS}) AS tok FROM documents
    ),
    vocab AS (
        SELECT tok FROM (
            SELECT tok, count(*) AS n FROM toks GROUP BY tok
        ) ORDER BY n DESC, tok ASC LIMIT {VOCAB_SIZE}
    )
    SELECT t.source,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oov,
           ROUND(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS oov_rate
    FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
    GROUP BY t.source ORDER BY source
"""


def lang_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise audit: per source, how often the marker-token
    language identifier agrees with the stored ``lang`` label — a
    source whose agreement rate sags is mislabeled (or code-switched)
    and gets routed to review before its labels train anything.
    Composes the same argmax predictor as ``text_lang_id``; one narrow
    map + a per-source rollup.  Scan fanned out before the marker scan
    (single-row-group input, guide §2.5)."""
    from .text import LANG_MARKERS, tokens_col

    docs = fanout_small_scan(
        load_table(spark, sf_dir, "documents"), spark
    )
    toks = tokens_col(F.col("text"))
    scores = []
    for i, (lang, markers) in enumerate(sorted(LANG_MARKERS.items())):
        arr = F.array(*[F.lit(m) for m in markers])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
        scores.append(
            F.struct(
                hits.alias("score"),
                F.lit(-i).cast("long").alias("tiebreak"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.array_max(F.array(*scores))
    pred = docs.select(
        "source", "lang", best["lang"].alias("pred_lang")
    )
    agree = F.sum(
        F.when(F.col("lang") == F.col("pred_lang"), 1).otherwise(0)
    )
    return (
        pred.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            agree.alias("n_agree"),
        )
        .select(
            "source",
            "n_docs",
            "n_agree",
            F.round(F.col("n_agree") * 1.0 / F.col("n_docs"), 6).alias(
                "agree_rate"
            ),
        )
        .orderBy("source")
    )


QUERIES["quality_lang_agreement"] = lang_agreement


def _lang_agreement_oracle() -> str:
    from .text import LANG_MARKERS

    score_exprs = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        arr = ", ".join(f"'{m}'" for m in markers)
        score_exprs.append(
            f"len(list_filter(toks, t -> list_contains([{arr}], t)))"
            f" AS score_{lang}"
        )
    langs = sorted(LANG_MARKERS)
    greatest = ", ".join(f"score_{lg}" for lg in langs)
    case = "CASE "
    for lg in langs:  # first match wins => alphabetical tie-break
        case += f"WHEN score_{lg} = best THEN '{lg}' "
    case += "END"
    return f"""
        WITH t AS (
            SELECT source, lang, {_TOKS} AS toks FROM documents
        ), s AS (
            SELECT source, lang, {', '.join(score_exprs)} FROM t
        ), b AS (
            SELECT *, GREATEST({greatest}) AS best FROM s
        ), p AS (
            SELECT source, lang, {case} AS pred_lang FROM b
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN lang = pred_lang THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_agree,
               ROUND(sum(CASE WHEN lang = pred_lang THEN 1 ELSE 0 END)
                     * 1.0 / count(*), 6) AS agree_rate
        FROM p GROUP BY source ORDER BY source
    """


ORACLES["quality_lang_agreement"] = _lang_agreement_oracle()


# ------------------------------------------------------- k-anonymity audit

K_ANON = 5
# quasi-identifier columns over `customer`: coarse enough to be a real
# QI set (nation × segment × balance sign)
_QI_BAND = "CAST(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END AS BIGINT)"


def k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the customer quasi-identifier set
    (nation, market segment, balance sign): how many QI
    groups fall below k, how many rows they expose, and the size floor.

    The compliance gate a training corpus with user-derived rows must
    pass before release.  Scale: one groupBy on the QI columns
    (map-side combinable), then a cells-only summary — the shuffled
    payload is QI-group counts, never rows.  Output is a single row per
    k policy, so the audit composes into dashboards/alerts directly.
    """
    cust = load_table(spark, sf_dir, "customer")
    groups = cust.groupBy(
        F.col("c_nationkey"),
        F.col("c_mktsegment"),
        F.expr(_QI_BAND).alias("bal_band"),
    ).agg(F.count(F.lit(1)).alias("n"))
    return groups.agg(
        F.lit(K_ANON).cast("long").alias("k"),
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.when(F.col("n") < K_ANON, 1).otherwise(0))
        .cast("long")
        .alias("n_groups_below_k"),
        F.sum(F.when(F.col("n") < K_ANON, F.col("n")).otherwise(0))
        .cast("long")
        .alias("n_rows_at_risk"),
        F.min("n").alias("min_group_size"),
        F.expr(
            f"CAST((2 * sum(CASE WHEN n < {K_ANON} THEN n ELSE 0 END)"
            " * 1000000 + sum(n)) DIV (2 * sum(n)) AS DOUBLE) / 1e6"
        ).alias("frac_rows_at_risk"),
    )


QUERIES["quality_k_anonymity"] = k_anonymity

ORACLES["quality_k_anonymity"] = f"""
    WITH groups AS (
        SELECT c_nationkey, c_mktsegment, {_QI_BAND} AS bal_band,
               count(*) AS n
        FROM customer GROUP BY 1, 2, 3
    )
    SELECT CAST({K_ANON} AS BIGINT) AS k,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(CASE WHEN n < {K_ANON} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_groups_below_k,
           CAST(sum(CASE WHEN n < {K_ANON} THEN n ELSE 0 END) AS BIGINT)
               AS n_rows_at_risk,
           CAST(min(n) AS BIGINT) AS min_group_size,
           CAST((2 * sum(CASE WHEN n < {K_ANON} THEN n ELSE 0 END) * 1000000
                 + sum(n)) // (2 * sum(n)) AS DOUBLE) / 1e6
               AS frac_rows_at_risk
    FROM groups
"""


# ----------------------------------------------- perplexity filter curve

PPL_THRESHOLDS = (3.39, 3.40, 3.42, 3.45, 3.50)


def perplexity_filter_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The "pick your perplexity cutoff" curve: for each candidate
    mean-surprisal threshold, how many documents and tokens a
    surprisal filter at that cutoff would keep.

    The quality twin of ``sim_dedup_threshold_sweep``: curation teams
    sweep the LM-score cutoff before committing a corpus, because the
    token-retention curve (not the doc count) is what sets training
    budget.  ONE scoring pass (the corpus unigram model from
    ``text.unigram_surprisal``) serves every threshold; the sweep is a
    broadcast threshold join over the per-doc score frame.  Exact
    half-up ratios at 6dp.
    """
    from .text import unigram_surprisal

    scored = unigram_surprisal(spark, sf_dir)  # doc_id, n_tokens, mean_surprisal
    th = F.explode(
        F.array(*[F.lit(t) for t in PPL_THRESHOLDS])
    ).alias("threshold")
    tot = scored.agg(
        F.count(F.lit(1)).alias("t_docs"),
        F.sum("n_tokens").alias("t_toks"),
    )
    banded = scored.select("n_tokens", "mean_surprisal", th)
    per = banded.groupBy("threshold").agg(
        F.sum(
            (F.col("mean_surprisal") <= F.col("threshold")).cast("long")
        ).alias("docs_kept"),
        F.sum(
            F.when(
                F.col("mean_surprisal") <= F.col("threshold"),
                F.col("n_tokens"),
            ).otherwise(0)
        ).alias("tokens_kept"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "threshold",
            "docs_kept",
            F.col("tokens_kept").cast("long").alias("tokens_kept"),
            (
                F.expr(
                    "(2 * docs_kept * 1000000 + t_docs) DIV (2 * t_docs)"
                ).cast("double")
                / 1e6
            ).alias("doc_keep_rate"),
            (
                F.expr(
                    "(2 * tokens_kept * 1000000 + t_toks) DIV (2 * t_toks)"
                ).cast("double")
                / 1e6
            ).alias("token_keep_rate"),
        )
        .orderBy("threshold")
    )


QUERIES["quality_perplexity_filter_curve"] = perplexity_filter_curve


def _ppl_curve_oracle() -> str:
    from .text import ORACLES as TEXT_ORACLES

    scored = TEXT_ORACLES["text_unigram_surprisal"]
    ths = ", ".join(str(t) for t in PPL_THRESHOLDS)
    return f"""
        WITH scored AS ({scored}),
        th AS (SELECT unnest([{ths}]) AS threshold),
        tot AS (SELECT count(*) AS t_docs, sum(n_tokens) AS t_toks
                FROM scored),
        per AS (
            SELECT th.threshold,
                   sum(CASE WHEN s.mean_surprisal <= th.threshold
                            THEN 1 ELSE 0 END) AS docs_kept,
                   sum(CASE WHEN s.mean_surprisal <= th.threshold
                            THEN s.n_tokens ELSE 0 END) AS tokens_kept
            FROM scored s CROSS JOIN th
            GROUP BY th.threshold
        )
        SELECT CAST(threshold AS DOUBLE) AS threshold,
               CAST(docs_kept AS BIGINT) AS docs_kept,
               CAST(tokens_kept AS BIGINT) AS tokens_kept,
               CAST((2 * docs_kept * 1000000 + t_docs) // (2 * t_docs)
                    AS DOUBLE) / 1e6 AS doc_keep_rate,
               CAST((2 * tokens_kept * 1000000 + t_toks) // (2 * t_toks)
                    AS DOUBLE) / 1e6 AS token_keep_rate
        FROM per CROSS JOIN tot
        ORDER BY threshold
    """


ORACLES["quality_perplexity_filter_curve"] = _ppl_curve_oracle()


# --------------------------------------------------- charset profile

def charset_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source byte/charset audit: UTF-8 continuation-byte mass
    (octet − char deltas), documents containing non-ASCII at all,
    control characters (excluding tab/newline), and U+FFFD replacement
    characters — the encoding-health panel that catches mojibake and
    double-encoded sources before tokenization.

    Exactness: every number is an exact integer count or the half-up
    integer-device ratio of two of them.  Scale: per-row byte/char
    lengths + regexp counts, one per-source partial aggregate.
    """
    docs = load_table(spark, sf_dir, "documents")
    octets = F.octet_length("text").cast("long")
    chars = F.length("text").cast("long")
    ctrl = F.size(
        F.regexp_extract_all(
            F.col("text"), F.lit(r"[\x00-\x08\x0b\x0c\x0e-\x1f]"), 0
        )
    ).cast("long")
    repl = F.size(
        F.regexp_extract_all(F.col("text"), F.lit("�"), 0)
    ).cast("long")
    m = docs.select(
        "source",
        octets.alias("b"),
        chars.alias("c"),
        (octets - chars).alias("mb"),
        ctrl.alias("ctrl"),
        repl.alias("repl"),
    )
    return (
        m.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("b").alias("total_bytes"),
            F.sum("c").alias("total_chars"),
            F.sum("mb").alias("continuation_bytes"),
            F.sum((F.col("mb") > 0).cast("long")).alias("non_ascii_docs"),
            F.sum("ctrl").alias("control_chars"),
            F.sum("repl").alias("replacement_chars"),
        )
        .selectExpr(
            "source",
            "n_docs",
            "total_bytes",
            "total_chars",
            "continuation_bytes",
            "non_ascii_docs",
            "control_chars",
            "replacement_chars",
            "CAST((2*continuation_bytes*1000000 + total_bytes)"
            " DIV (2*total_bytes) AS DOUBLE) / 1e6"
            " AS multibyte_frac",
        )
        .orderBy("source")
    )


QUERIES["quality_charset_profile"] = charset_profile

ORACLES["quality_charset_profile"] = r"""
    WITH m AS (
        SELECT source,
               CAST(octet_length(encode(text)) AS BIGINT) AS b,
               CAST(length(text) AS BIGINT) AS c,
               CAST(octet_length(encode(text)) - length(text) AS BIGINT)
                   AS mb,
               CAST(len(regexp_extract_all(text,
                    '[\x00-\x08\x0b\x0c\x0e-\x1f]')) AS BIGINT) AS ctrl,
               CAST(len(regexp_extract_all(text, '�'))
                    AS BIGINT) AS repl
        FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(b) AS BIGINT) AS total_bytes,
           CAST(sum(c) AS BIGINT) AS total_chars,
           CAST(sum(mb) AS BIGINT) AS continuation_bytes,
           CAST(sum(CASE WHEN mb > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS non_ascii_docs,
           CAST(sum(ctrl) AS BIGINT) AS control_chars,
           CAST(sum(repl) AS BIGINT) AS replacement_chars,
           CAST((2*sum(mb)*1000000 + sum(b)) // (2*sum(b)) AS DOUBLE)
               / 1e6 AS multibyte_frac
    FROM m GROUP BY source ORDER BY source
"""


# ----------------------------------- curation mixture-shift audit

MIX_MIN_TOKENS = 25  # mirrors curation.MIN_TOKENS (token-floor stage)


def mixture_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does the quality filter skew the source mixture?  Per source:
    keep rate under the curation token floor and the source's
    contribution to the chi-square of (kept × source) independence —
    the survivorship-bias audit that catches a filter silently
    deleting one domain (large chi2_term = this source's keep rate is
    far from the corpus average).

    All counts exact; each chi-square term is a double built from one
    source's integers (no cross-row float sums — the per-source TERM
    is the deliverable; the judge of "is the total significant" sums
    bounded |sources| rows).  Scale: one map-side verdict projection,
    one |sources|-row rollup.
    """
    docs = load_table(spark, sf_dir, "documents")
    verdict = docs.select(
        "source",
        F.when(
            F.size(tokens_col(F.col("text"))) >= MIX_MIN_TOKENS, 1
        )
        .otherwise(0)
        .alias("kept"),
    )
    per = verdict.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"), F.sum("kept").alias("k")
    )
    tot = per.agg(F.sum("n").alias("nn"), F.sum("k").alias("kk"))
    return (
        per.crossJoin(F.broadcast(tot))
        .selectExpr(
            "source",
            "n AS n_docs",
            "k AS n_kept",
            "(2*k*1000000 + n) DIV (2*n) AS keep_rate_ppm",
            "round(CASE WHEN n * kk > 0 AND nn > kk THEN"
            " (k - CAST(n AS DOUBLE) * kk / nn)"
            " * (k - CAST(n AS DOUBLE) * kk / nn)"
            " / (CAST(n AS DOUBLE) * kk / nn)"
            " / (1.0 - CAST(kk AS DOUBLE) / nn)"
            " ELSE 0 END, 6) AS chi2_term",
        )
        .orderBy("source")
    )


QUERIES["quality_mixture_shift"] = mixture_shift

ORACLES["quality_mixture_shift"] = rf"""
    WITH verdict AS (
        SELECT source,
               CASE WHEN len(regexp_split_to_array(lower(trim(text)),
                                                   '\s+'))
                         >= {MIX_MIN_TOKENS} THEN 1 ELSE 0 END AS kept
        FROM documents
    ),
    per AS (
        SELECT source, count(*) AS n, sum(kept) AS k
        FROM verdict GROUP BY 1
    ),
    tot AS (SELECT sum(n) AS nn, sum(k) AS kk FROM per)
    SELECT per.source, CAST(per.n AS BIGINT) AS n_docs,
           CAST(per.k AS BIGINT) AS n_kept,
           CAST((2*per.k*1000000 + per.n) // (2*per.n) AS BIGINT)
               AS keep_rate_ppm,
           round(CASE WHEN per.n * t.kk > 0 AND t.nn > t.kk THEN
               (per.k - CAST(per.n AS DOUBLE) * t.kk / t.nn)
               * (per.k - CAST(per.n AS DOUBLE) * t.kk / t.nn)
               / (CAST(per.n AS DOUBLE) * t.kk / t.nn)
               / (1.0 - CAST(t.kk AS DOUBLE) / t.nn)
           ELSE 0 END, 6) AS chi2_term
    FROM per, tot t ORDER BY source
"""


# -------------------------------------- classifier calibration curve

CALIB_BINS = 10


def calibration_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram of the linear quality classifier against the
    Gopher rule panel: per score decile, how often does a document the
    model scores p actually pass the expensive rule gate?  The readout
    a curation review uses to decide whether the cheap score can
    REPLACE the rule panel at 100 TB — on this corpus the answer is a
    loud no (pass rate FALLS as the score rises: the verbosity features
    the LR rewards are exactly what the word-count rule penalizes),
    which is the kind of miscalibration the diagram exists to catch.

    Exactness: scores enter as the same 6-dp-rounded micro integers the
    inference query emits, bins are integer ``micro DIV 100000`` (no
    double×10 representability traps at bin edges), and both the mean
    predicted score and the empirical pass rate are half-add ppm over
    DECIMAL(38,0) accumulators (Σmicro over 10¹² docs passes 2⁶³; Spark
    decimal DIV returns exact BIGINT, DuckDB auto-widens to HUGEINT —
    the r6 overflow device).  Scale: ONE scan computes score and rule
    flags side by side (no self-join of two doc-grain frames), then a
    10-group aggregate.
    """
    docs = fanout_small_scan(
        load_table(spark, sf_dir, "documents"), spark
    )
    # score + rule flags as two SQL strings (SQL-twin note above
    # _W_SQL): identical expressions, a handful of py4j round-trips
    # instead of ~800 per call
    per_doc = docs.selectExpr("n_chars", "text", f"{_W_SQL} AS w").selectExpr(
        f"CAST(round({_lr_p6_sql()} * 1e6) AS BIGINT) AS micro",
        f"CAST({_rules_keep_sql('w')} AS BIGINT) AS label",
    )
    return (
        per_doc.groupBy(
            F.least(
                F.expr(f"micro DIV {1_000_000 // CALIB_BINS}"),
                F.lit(CALIB_BINS - 1),
            ).alias("bin")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("micro").cast("decimal(38,0)")).alias("sm"),
            F.sum(F.col("label").cast("decimal(38,0)")).alias("sl"),
        )
        .selectExpr(
            "CAST(bin AS BIGINT) AS bin",
            "CAST(n_docs AS BIGINT) AS n_docs",
            "(2 * sm + n_docs) DIV (2 * n_docs) AS mean_pred_ppm",
            "(2 * sl * 1000000 + n_docs) DIV (2 * n_docs) AS pass_rate_ppm",
            "(2 * sm + n_docs) DIV (2 * n_docs)"
            " - (2 * sl * 1000000 + n_docs) DIV (2 * n_docs) AS gap_ppm",
        )
        .orderBy("bin")
    )


QUERIES["quality_calibration_curve"] = calibration_curve

ORACLES["quality_calibration_curve"] = f"""
    WITH t AS (
        SELECT doc_id, n_chars, text, {_TOKS} AS w FROM documents
    ),
    scored AS (
        SELECT CAST(round(ROUND(1.0 / (1.0 + exp(-(-3.8 + 0.35
                   * ln(1.0 + n_chars)
                   + 2.5 * (len(list_distinct(w)) * 1.0 / len(w))
                   + 0.15 * (length(regexp_replace(text, '\\s', '', 'g'))
                               * 1.0 / len(w))))), 6) * 1e6) AS BIGINT)
                   AS micro,
               CASE WHEN len(w) BETWEEN {WC_MIN} AND {WC_MAX}
                     AND list_sum(list_transform(w, x -> length(x)))
                         * 1.0 / len(w) BETWEEN {MWL_MIN} AND {MWL_MAX}
                     AND len(regexp_extract_all(text, '#|\\.\\.\\.'))
                         * 1.0 / len(w) <= {SYMBOL_RATIO_MAX}
                     AND len(list_filter(w, x -> regexp_matches(x, '[a-z]')))
                         * 1.0 / len(w) >= {ALPHA_WORD_FRAC_MIN}
                     AND len(list_filter({_STOP_SQL},
                             s -> list_contains(w, s)))
                         >= {STOPWORD_MIN_DISTINCT}
               THEN 1 ELSE 0 END AS label
        FROM t
    )
    SELECT CAST(least(micro // {1_000_000 // CALIB_BINS},
                      {CALIB_BINS - 1}) AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST((2 * sum(micro) + count(*)) // (2 * count(*)) AS BIGINT)
               AS mean_pred_ppm,
           CAST((2 * sum(label) * 1000000 + count(*)) // (2 * count(*))
                AS BIGINT) AS pass_rate_ppm,
           CAST((2 * sum(micro) + count(*)) // (2 * count(*))
                - (2 * sum(label) * 1000000 + count(*)) // (2 * count(*))
                AS BIGINT) AS gap_ppm
    FROM scored GROUP BY 1 ORDER BY 1
"""


# ------------------------------------------ rater agreement (kappa)


def rater_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's κ between the corpus's two independent quality raters —
    the rule panel (Gopher) and the linear classifier — the
    inter-annotator-agreement number a labeling/curation effort reports
    before trusting either gate alone.  κ corrects raw agreement for
    chance: two raters that both keep ~50% agree half the time by luck,
    and κ ≈ 0 (or negative, as here — the raters are actively
    anti-correlated on this corpus, the same miscalibration
    [[quality_calibration_curve]] shows as a curve).

    Exactness: the 2×2 confusion counts are one scan's exact integers
    (both raters inline, no join); κ = (pₒ−pₑ)/(1−pₑ) with
    pₒ·n² and pₑ·n² kept as exact integer forms and ONE final double
    division.  Scale: single scan → four counters.
    """
    docs = fanout_small_scan(
        load_table(spark, sf_dir, "documents"), spark
    )
    # both raters as two SQL strings (SQL-twin note above _W_SQL):
    # identical expressions, a handful of py4j round-trips instead of
    # ~800 per call
    conf = docs.selectExpr("n_chars", "text", f"{_W_SQL} AS w").selectExpr(
        f"CAST({_rules_keep_sql('w')} AS BIGINT) AS a",
        f"CAST({_lr_p6_sql()} >= 0.5D AS BIGINT) AS b",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("IF(a = 1 AND b = 1, 1, 0)")).alias("n11"),
        F.sum(F.expr("IF(a = 1 AND b = 0, 1, 0)")).alias("n10"),
        F.sum(F.expr("IF(a = 0 AND b = 1, 1, 0)")).alias("n01"),
        F.sum(F.expr("IF(a = 0 AND b = 0, 1, 0)")).alias("n00"),
    )
    return conf.selectExpr(
        "CAST(n AS BIGINT) AS n_docs",
        "CAST(n11 AS BIGINT) AS n_both_keep",
        "CAST(n10 AS BIGINT) AS n_rules_only",
        "CAST(n01 AS BIGINT) AS n_model_only",
        "CAST(n00 AS BIGINT) AS n_both_drop",
        "round(CAST(n11 + n00 AS DOUBLE) / n, 6) AS p_observed",
        "round(CAST((n11 + n10) * (n11 + n01)"
        " + (n00 + n01) * (n00 + n10) AS DOUBLE) / n / n, 6)"
        " AS p_expected",
        # κ = (po·n² − pe·n²)/(n² − pe·n²), all-integer numerators
        "round(CAST((n11 + n00) * n - ((n11 + n10) * (n11 + n01)"
        " + (n00 + n01) * (n00 + n10)) AS DOUBLE)"
        " / (CAST(n AS DOUBLE) * n - ((n11 + n10) * (n11 + n01)"
        " + (n00 + n01) * (n00 + n10))), 6) AS kappa",
    )


QUERIES["quality_rater_kappa"] = rater_kappa

ORACLES["quality_rater_kappa"] = f"""
    WITH t AS (
        SELECT doc_id, n_chars, text, {_TOKS} AS w FROM documents
    ),
    raters AS (
        SELECT CASE WHEN len(w) BETWEEN {WC_MIN} AND {WC_MAX}
                     AND list_sum(list_transform(w, x -> length(x)))
                         * 1.0 / len(w) BETWEEN {MWL_MIN} AND {MWL_MAX}
                     AND len(regexp_extract_all(text, '#|\\.\\.\\.'))
                         * 1.0 / len(w) <= {SYMBOL_RATIO_MAX}
                     AND len(list_filter(w, x -> regexp_matches(x, '[a-z]')))
                         * 1.0 / len(w) >= {ALPHA_WORD_FRAC_MIN}
                     AND len(list_filter({_STOP_SQL},
                             s -> list_contains(w, s)))
                         >= {STOPWORD_MIN_DISTINCT}
               THEN 1 ELSE 0 END AS a,
               CASE WHEN ROUND(1.0 / (1.0 + exp(-(-3.8 + 0.35
                       * ln(1.0 + n_chars)
                       + 2.5 * (len(list_distinct(w)) * 1.0 / len(w))
                       + 0.15 * (length(regexp_replace(text, '\\s', '',
                                 'g')) * 1.0 / len(w))))), 6) >= 0.5
               THEN 1 ELSE 0 END AS b
        FROM t
    ),
    conf AS (
        SELECT count(*) AS n,
               sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS n11,
               sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS n10,
               sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS n01,
               sum(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END) AS n00
        FROM raters
    )
    SELECT CAST(n AS BIGINT) AS n_docs,
           CAST(n11 AS BIGINT) AS n_both_keep,
           CAST(n10 AS BIGINT) AS n_rules_only,
           CAST(n01 AS BIGINT) AS n_model_only,
           CAST(n00 AS BIGINT) AS n_both_drop,
           round(CAST(n11 + n00 AS DOUBLE) / n, 6) AS p_observed,
           round(CAST((n11 + n10) * (n11 + n01)
                 + (n00 + n01) * (n00 + n10) AS DOUBLE) / n / n, 6)
               AS p_expected,
           round(CAST((n11 + n00) * n - ((n11 + n10) * (n11 + n01)
                 + (n00 + n01) * (n00 + n10)) AS DOUBLE)
                 / (CAST(n AS DOUBLE) * n - ((n11 + n10) * (n11 + n01)
                 + (n00 + n01) * (n00 + n10))), 6) AS kappa
    FROM conf
"""


# --------------------------------- empirical-Bayes shrunk keep rates


def eb_shrunk_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes (beta-binomial, method of moments) shrinkage of
    the per-source Gopher keep rates — the estimator a curation
    dashboard should show instead of raw rates: a 10-doc source with
    0/10 kept is NOT a 0%-quality source, it is a small sample, and
    shrinking toward the corpus prior by α/(α+β) pseudo-counts says
    exactly how much to discount it.  Standard Robinson/James-Stein
    practice for rate leaderboards.

    Exactness: per-source (n, k) are exact integers; raw rates freeze
    to half-add ppm BEFORE the cross-source moment step, so the prior's
    mean/variance derive from exact integer sums (no double-sum order);
    α and β are one fixed double expression, and each shrunk rate is a
    single rounded division.  Degenerate prior variance (≤ 0, all
    sources identical) falls back to the pooled rate.  Scale: doc scan
    → |sources| rows; the moment step is |sources|-grain.
    """
    docs = fanout_small_scan(
        load_table(spark, sf_dir, "documents"), spark
    )
    # the rule gate as one SQL string (SQL-twin note above _W_SQL)
    per = docs.selectExpr("source", "text", f"{_W_SQL} AS w").selectExpr(
        "source", f"CAST({_rules_keep_sql('w')} AS BIGINT) AS k"
    ).groupBy("source").agg(
        F.count(F.lit(1)).alias("nd"), F.sum("k").alias("kd")
    )
    wall = Window.partitionBy()
    frozen = per.withColumn(
        "r_ppm", F.expr("(2 * kd * 1000000 + nd) DIV (2 * nd)")
    )
    mo = (
        frozen.withColumn("ns", F.count(F.lit(1)).over(wall))
        .withColumn("sr", F.sum("r_ppm").over(wall))
        .withColumn("sr2", F.sum(F.expr("r_ppm * r_ppm")).over(wall))
    )
    # prior mean m and variance v from exact ppm integers; ϕ = m(1−m)/v − 1
    return mo.selectExpr(
        "source",
        "CAST(nd AS BIGINT) AS n_docs",
        "CAST(kd AS BIGINT) AS n_kept",
        "round(CAST(kd AS DOUBLE) / nd, 6) AS raw_rate",
        "round(CASE WHEN ns * sr2 - sr * sr <= 0"
        " THEN CAST(sr AS DOUBLE) / ns / 1e6"
        " ELSE (kd + (CAST(sr AS DOUBLE) / ns / 1e6)"
        "   * ((CAST(sr AS DOUBLE) / ns / 1e6)"
        "      * (1.0 - CAST(sr AS DOUBLE) / ns / 1e6)"
        "      / (CAST(ns * sr2 - sr * sr AS DOUBLE) / ns / ns / 1e12)"
        "      - 1.0))"
        " / (nd + (CAST(sr AS DOUBLE) / ns / 1e6)"
        "      * (1.0 - CAST(sr AS DOUBLE) / ns / 1e6)"
        "      / (CAST(ns * sr2 - sr * sr AS DOUBLE) / ns / ns / 1e12)"
        "      - 1.0) END, 6) AS shrunk_rate",
    ).orderBy("source")


QUERIES["quality_eb_shrunk_rates"] = eb_shrunk_rates

ORACLES["quality_eb_shrunk_rates"] = f"""
    WITH t AS (
        SELECT source, {_TOKS} AS w, text FROM documents
    ),
    keepflag AS (
        SELECT source,
               CASE WHEN len(w) BETWEEN {WC_MIN} AND {WC_MAX}
                     AND list_sum(list_transform(w, x -> length(x)))
                         * 1.0 / len(w) BETWEEN {MWL_MIN} AND {MWL_MAX}
                     AND len(regexp_extract_all(text, '#|\\.\\.\\.'))
                         * 1.0 / len(w) <= {SYMBOL_RATIO_MAX}
                     AND len(list_filter(w, x -> regexp_matches(x, '[a-z]')))
                         * 1.0 / len(w) >= {ALPHA_WORD_FRAC_MIN}
                     AND len(list_filter({_STOP_SQL},
                             s -> list_contains(w, s)))
                         >= {STOPWORD_MIN_DISTINCT}
               THEN 1 ELSE 0 END AS k
        FROM t
    ),
    per AS (
        SELECT source, count(*) AS nd, sum(k) AS kd FROM keepflag
        GROUP BY source
    ),
    frozen AS (
        SELECT *, (2 * kd * 1000000 + nd) // (2 * nd) AS r_ppm FROM per
    ),
    mo AS (
        SELECT *, count(*) OVER () AS ns, sum(r_ppm) OVER () AS sr,
               sum(r_ppm * r_ppm) OVER () AS sr2
        FROM frozen
    )
    SELECT source,
           CAST(nd AS BIGINT) AS n_docs,
           CAST(kd AS BIGINT) AS n_kept,
           round(CAST(kd AS DOUBLE) / nd, 6) AS raw_rate,
           round(CASE WHEN ns * sr2 - sr * sr <= 0
             THEN CAST(sr AS DOUBLE) / ns / 1e6
             ELSE (kd + (CAST(sr AS DOUBLE) / ns / 1e6)
               * ((CAST(sr AS DOUBLE) / ns / 1e6)
                  * (1.0 - CAST(sr AS DOUBLE) / ns / 1e6)
                  / (CAST(ns * sr2 - sr * sr AS DOUBLE) / ns / ns / 1e12)
                  - 1.0))
             / (nd + (CAST(sr AS DOUBLE) / ns / 1e6)
                  * (1.0 - CAST(sr AS DOUBLE) / ns / 1e6)
                  / (CAST(ns * sr2 - sr * sr AS DOUBLE) / ns / ns / 1e12)
                  - 1.0) END, 6) AS shrunk_rate
    FROM mo ORDER BY source
"""


# ------------------------------------------- filter ablation grid

#: The three rules in the ablation basis.  Chosen because they fire
#: independently on the fixture corpus (word-count fails ~45%, missing
#: stopwords ~37%, heavy token repetition ~56%, with every cell of the
#: 2³ cross-tab populated) — an ablation over rules that never fire
#: reads 1.0 everywhere and certifies nothing.
ABLATION_RULES = ("wc", "stop", "rep")
REP_DUP_MAX = 0.5  # duplicate-token ratio above this fails the rep rule


def _ablation_flags(docs: DataFrame) -> DataFrame:
    """Per-doc (n_tok, f_wc, f_stop, f_rep) — the shared flag frame for
    the ablation grid and the threshold sweep; one narrow map stage."""
    # flags as SQL strings (SQL-twin note above _W_SQL)
    return docs.selectExpr("text", f"{_W_SQL} AS w").selectExpr(
        "size(w) AS n_tok",
        f"CAST(NOT (size(w) BETWEEN {WC_MIN} AND {WC_MAX})"
        " AS BIGINT) AS f_wc",
        f"CAST({_nstop_sql('w')} < {STOPWORD_MIN_DISTINCT}"
        " AS BIGINT) AS f_stop",
        # dup-token ratio 1 - distinct/total > ½  ⇔  2·distinct < total
        "CAST(size(array_distinct(w)) * 2 < size(w) AS BIGINT) AS f_rep",
    )


def filter_ablation_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-ablation scoreboard: for every subset of the three quality
    rules {word-count bounds, stopword presence, token repetition}, the
    documents and tokens surviving that subset — the table a curation
    run reads to learn which filters are redundant (their marginal cost
    is already paid by another rule) and which carve unique mass.

    Scale shape: ONE aggregate over the flag frame computes all 8
    subsets as conditional sums (map-side combinable, no row
    multiplication), then a 1-row explode stacks the 8 result rows —
    the ``band_tradeoff`` config-tagged pattern.  Masks are bit-coded:
    bit0 = wc, bit1 = stop, bit2 = rep.
    """
    docs = load_table(spark, sf_dir, "documents")
    flags = _ablation_flags(docs)
    aggs = [
        F.sum(F.lit(1)).alias("nd"),
        F.sum("n_tok").alias("nt"),
    ]
    for m in range(8):
        # the mask condition with its m-constant legs pre-folded (the
        # Column form built the fold input per mask; Catalyst folded it
        # to exactly this)
        keep = (
            f"(({m} & 1) = 0 OR f_wc = 0)"
            f" AND (({m} & 2) = 0 OR f_stop = 0)"
            f" AND (({m} & 4) = 0 OR f_rep = 0)"
        )
        aggs.append(
            F.expr(f"sum(CASE WHEN {keep} THEN 1 ELSE 0 END)").alias(f"d{m}")
        )
        aggs.append(
            F.expr(
                f"sum(CASE WHEN {keep} THEN n_tok ELSE 0 END)"
            ).alias(f"t{m}")
        )
    one = flags.agg(*aggs)
    rows = ", ".join(
        f"named_struct('m', {m}L, 'd', d{m}, 't', t{m})" for m in range(8)
    )
    return (
        one.selectExpr("nd", "nt", f"inline(array({rows}))")
        .selectExpr(
            "CAST(m AS BIGINT) AS mask_id",
            "CAST(m & 1 AS BIGINT) AS use_wc",
            "CAST(IF(m & 2 > 0, 1, 0) AS BIGINT) AS use_stop",
            "CAST(IF(m & 4 > 0, 1, 0) AS BIGINT) AS use_rep",
            "CAST(d AS BIGINT) AS docs_kept",
            "CAST(t AS BIGINT) AS tokens_kept",
            "(2 * d * 1000000 + nd) DIV (2 * nd) AS doc_keep_ppm",
            "(2 * t * 1000000 + nt) DIV (2 * nt) AS token_keep_ppm",
        )
        .orderBy("mask_id")
    )


QUERIES["quality_filter_ablation_grid"] = filter_ablation_grid

ORACLES["quality_filter_ablation_grid"] = f"""
    WITH t AS (SELECT {_TOKS} AS w, text FROM documents),
    flags AS (
        SELECT len(w) AS n_tok,
               CASE WHEN len(w) BETWEEN {WC_MIN} AND {WC_MAX}
                    THEN 0 ELSE 1 END AS f_wc,
               CASE WHEN len(list_filter({_STOP_SQL},
                              s -> list_contains(w, s)))
                         < {STOPWORD_MIN_DISTINCT}
                    THEN 1 ELSE 0 END AS f_stop,
               CASE WHEN len(list_distinct(w)) * 2 < len(w)
                    THEN 1 ELSE 0 END AS f_rep
        FROM t
    ),
    grid AS (SELECT m FROM unnest(range(0, 8)) AS u(m)),
    cell AS (
        SELECT m,
               sum(CASE WHEN (m & 1 = 0 OR f_wc = 0)
                         AND (m & 2 = 0 OR f_stop = 0)
                         AND (m & 4 = 0 OR f_rep = 0)
                   THEN 1 ELSE 0 END) AS d,
               sum(CASE WHEN (m & 1 = 0 OR f_wc = 0)
                         AND (m & 2 = 0 OR f_stop = 0)
                         AND (m & 4 = 0 OR f_rep = 0)
                   THEN n_tok ELSE 0 END) AS tk,
               count(*) AS nd, sum(n_tok) AS nt
        FROM flags, grid GROUP BY m
    )
    SELECT CAST(m AS BIGINT) AS mask_id,
           CAST(m & 1 AS BIGINT) AS use_wc,
           CAST(CASE WHEN m & 2 > 0 THEN 1 ELSE 0 END AS BIGINT)
               AS use_stop,
           CAST(CASE WHEN m & 4 > 0 THEN 1 ELSE 0 END AS BIGINT)
               AS use_rep,
           CAST(d AS BIGINT) AS docs_kept,
           CAST(tk AS BIGINT) AS tokens_kept,
           CAST((2 * d * 1000000 + nd) // (2 * nd) AS BIGINT)
               AS doc_keep_ppm,
           CAST((2 * tk * 1000000 + nt) // (2 * nt) AS BIGINT)
               AS token_keep_ppm
    FROM cell ORDER BY mask_id
"""


# --------------------------------------- length-threshold sweep

#: Candidate minimum-token thresholds.  The fixture corpus spans 10–99
#: tokens/doc (quartiles 32/56/76), so this ladder brackets the whole
#: decision range; a production sweep would ladder 32→512 the same way.
LENGTH_THRESHOLDS = (10, 20, 40, 60, 80)


def length_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-document-length tuning curve: for each candidate
    min-token threshold, the doc and token retention — the knob-tuning
    table behind every corpus's length filter (C4 used 3 sentences,
    Gopher 50 words; this is the evidence one picks a number with:
    where does token retention fall off a cliff?).

    Scale shape: identical to the ablation grid — one conditional
    aggregate over one scan, stacked to |thresholds| rows via a 1-row
    inline.  No row multiplication, map-side combinable.
    """
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(F.size(tokens_col(F.col("text"))).alias("n_tok"))
    aggs = [F.sum(F.lit(1)).alias("nd"), F.sum("n_tok").alias("nt")]
    for th in LENGTH_THRESHOLDS:
        keep = F.col("n_tok") >= th
        aggs.append(F.sum(F.when(keep, 1).otherwise(0)).alias(f"d{th}"))
        aggs.append(
            F.sum(F.when(keep, F.col("n_tok")).otherwise(0)).alias(f"t{th}")
        )
    one = base.agg(*aggs)
    rows = ", ".join(
        f"named_struct('th', {th}L, 'd', d{th}, 't', t{th})"
        for th in LENGTH_THRESHOLDS
    )
    return (
        one.selectExpr("nd", "nt", f"inline(array({rows}))")
        .selectExpr(
            "CAST(th AS BIGINT) AS min_tokens",
            "CAST(d AS BIGINT) AS docs_kept",
            "CAST(t AS BIGINT) AS tokens_kept",
            "(2 * d * 1000000 + nd) DIV (2 * nd) AS doc_keep_ppm",
            "(2 * t * 1000000 + nt) DIV (2 * nt) AS token_keep_ppm",
        )
        .orderBy("min_tokens")
    )


QUERIES["quality_length_threshold_sweep"] = length_threshold_sweep

ORACLES["quality_length_threshold_sweep"] = f"""
    WITH t AS (SELECT len({_TOKS}) AS n FROM documents),
    cfg AS (SELECT th
            FROM unnest({list(LENGTH_THRESHOLDS)}) AS u(th)),
    cell AS (
        SELECT th,
               sum(CASE WHEN n >= th THEN 1 ELSE 0 END) AS d,
               sum(CASE WHEN n >= th THEN n ELSE 0 END) AS tk,
               count(*) AS nd, sum(n) AS nt
        FROM t, cfg GROUP BY th
    )
    SELECT CAST(th AS BIGINT) AS min_tokens,
           CAST(d AS BIGINT) AS docs_kept,
           CAST(tk AS BIGINT) AS tokens_kept,
           CAST((2 * d * 1000000 + nd) // (2 * nd) AS BIGINT)
               AS doc_keep_ppm,
           CAST((2 * tk * 1000000 + nt) // (2 * nt) AS BIGINT)
               AS token_keep_ppm
    FROM cell ORDER BY min_tokens
"""
