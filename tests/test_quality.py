"""Planted-scenario tests for the quality-filter operators: corpora
where the right answer is known by construction."""

from pyspark.sql import functions as F

import hauser_spark.operators.quality as q


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )


def test_gopher_rules_flags_each_rule(spark, monkeypatch):
    good = "the cat and the dog ran to the park " * 8  # 72 words, stopwords
    rows = [
        (0, good, "s"),                                # passes all
        (1, "the cat and dog", "s"),                   # fails word count
        (2, " ".join(["abcdefghijklmno"] * 60), "s"),  # fails mwl>10 + stopwords
        (3, ("the of " + "### ## # " * 30).strip(), "s"),  # fails symbol ratio
        (4, "the of " + "1 2 3 4 5 6 7 8 9 0 " * 6, "s"),  # fails alpha frac
        (5, " ".join(f"word{i}" for i in range(60)), "s"),  # fails stopwords
    ]
    docs = _docs(spark, rows)
    monkeypatch.setattr(q, "load_table", lambda s, d, n: docs)
    out = q.gopher_rules(spark, "x").collect()[0]
    assert out.n_docs == 6
    assert out.n_pass == 1
    assert out.fail_word_count >= 1
    assert out.fail_mean_word_len >= 1
    assert out.fail_symbol_ratio >= 1
    assert out.fail_alpha_words >= 1
    assert out.fail_stopwords >= 2


def test_repetition_ratio_detects_planted_loop(spark, monkeypatch):
    distinct = " ".join(f"w{i}" for i in range(30))
    looped = "a b c " * 10  # 30 tokens, 3 distinct, 28 trigrams 3 distinct
    docs = _docs(spark, [(0, distinct, "s"), (1, looped.strip(), "s")])
    monkeypatch.setattr(q, "load_table", lambda s, d, n: docs)
    out = {r.doc_id: r for r in q.repetition_ratio(spark, "x").collect()}
    assert out[0].dup_token_ratio == 0.0
    assert out[0].dup_trigram_ratio == 0.0
    assert out[1].dup_token_ratio == 0.9
    assert out[1].dup_trigram_ratio == round(1 - 3 / 28, 6)


def test_pii_scan_counts_and_redaction_delta(spark, monkeypatch):
    text = "mail a.user@example.com ip 10.0.0.1 card 1234567890 end"
    docs = _docs(spark, [(0, text, "s"), (1, "clean text here", "s")])
    monkeypatch.setattr(q, "load_table", lambda s, d, n: docs)
    out = q.pii_scan(spark, "x").collect()[0]
    assert out.n_docs == 2
    assert out.docs_with_pii == 1
    assert out.n_emails == 1
    assert out.n_ipv4 == 1
    assert out.n_digit_runs == 1
    assert out.redacted_chars == len("a.user@example.com") + len(
        "10.0.0.1"
    ) + len("1234567890")


def test_source_cap_keeps_exactly_k(spark, monkeypatch):
    rows = [(i, f"doc {i}", "big") for i in range(q.SOURCE_CAP_K + 17)]
    rows += [(1000 + i, f"doc {i}", "small") for i in range(5)]
    docs = _docs(spark, rows)
    monkeypatch.setattr(q, "load_table", lambda s, d, n: docs)
    out = {r.source: r for r in q.source_cap(spark, "x").collect()}
    assert out["big"].n_kept == q.SOURCE_CAP_K
    assert out["big"].n_docs == q.SOURCE_CAP_K + 17
    assert out["small"].n_kept == 5


def test_source_cap_choice_is_deterministic(spark, monkeypatch):
    rows = [(i, f"doc {i}", "s") for i in range(60)]
    docs = _docs(spark, rows)
    monkeypatch.setattr(q, "load_table", lambda s, d, n: docs)
    a = q.source_cap(spark, "x").collect()
    b = q.source_cap(spark, "x").collect()
    assert a == b


def test_bpe_train_learns_planted_merges(spark, monkeypatch):
    """Corpus engineered so the merge sequence is hand-computable,
    including the a==b run-parity case: 'x x x x' merges greedily to
    'xx xx', and the learned pair feeds the next round."""
    import hauser_spark.operators.text as t

    rows = [
        # 6 docs of 'lo rem' -> (lo, rem) is the top pair, merged 'lorem'
        (i, "lo rem sep%d" % i, "s") for i in range(6)
    ] + [
        # 4 docs of 'x x x x': run parity -> 2 (x,x) pairs per doc
        (10 + i, "x x x x", "s") for i in range(4)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    monkeypatch.setattr(t, "load_table", lambda s, d, n: docs)
    out = {r.step: r for r in t.bpe_train(spark, "x", sample_mod=1).collect()}
    # step 1: (lo, rem) appears 6x; (x, x) has 12 adjacencies but greedy
    # BPE counts ALL adjacent pairs -> (x,x) count is 12 (3 per doc).
    # So step 1 merges (x, x) with count 12.
    assert (out[1].left, out[1].right, out[1].pair_count) == ("x", "x", 12)
    # after rewrite each 'x x x x' doc is 'xx xx' -> (xx, xx) count 4,
    # (lo, rem) count 6 -> step 2 merges (lo, rem)
    assert (out[2].left, out[2].right, out[2].merged, out[2].pair_count) == (
        "lo",
        "rem",
        "lorem",
        6,
    )
    # step 3: (xx, xx) is now the top remaining pair with count 4
    assert (out[3].left, out[3].right, out[3].pair_count) == ("xx", "xx", 4)


def test_bpe_run_parity_on_odd_runs(spark):
    """A 5-run 'y y y y y' merges to 'yy yy y' — two merges, the
    trailing symbol survives (greedy left-to-right, fold form)."""
    import hauser_spark.operators.text as t

    docs = spark.createDataFrame(
        [(0, "y y y y y", "s")], "doc_id long, text string, source string"
    )
    ts = docs.select(t.tokens_col(F.col("text")).alias("toks"))
    toks = ts.select(t._bpe_fold_merge("y", "y")).collect()[0]["toks"]
    assert toks == ["yy", "yy", "y"]


def test_bpe_apply_matches_window_rewrite(spark, monkeypatch):
    """The mapInPandas greedy apply must agree with the trainer's
    window-arithmetic rewrite on the run-parity cases: per doc,
    applying the learned merges via the trainer's _bpe_fold_merge
    yields the same final token count the apply report aggregates."""
    import hauser_spark.operators.text as t

    # every doc_id is a multiple of BPE_SAMPLE_MOD, so the apply path's
    # default sample-trained merge table sees the whole corpus and the
    # hand-computed expectations below hold
    rows = [
        (i * t.BPE_SAMPLE_MOD, "lo rem sep%d" % i, "s1") for i in range(6)
    ] + [
        ((10 + i) * t.BPE_SAMPLE_MOD, "x x x x x", "s2") for i in range(4)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    monkeypatch.setattr(t, "load_table", lambda s, d, n: docs)
    merges = [
        (r["left"], r["right"])
        for r in t.bpe_train(spark, "x").collect()
    ]
    # fold-rewrite ground truth: apply each merge via the trainer's
    # helper and count the surviving tokens per source
    ts = docs.select(
        "doc_id", t.tokens_col(F.col("text")).alias("toks")
    )
    for a, b in merges:
        ts = ts.select("doc_id", t._bpe_fold_merge(a, b))
    ts = ts.select(
        "doc_id", F.explode("toks").alias("tok")
    )
    # 4 learned merges: (x,x) -> (lo,rem) -> (xx,xx) -> (xxxx,x), so each
    # s2 doc collapses 'x x x x x' -> 'xx xx x' -> 'xxxx x' -> 'xxxxx'
    expected = {
        ("s1", 6 * 3 - 6),   # each s1 doc: 3 toks, one (lo,rem) merge
        ("s2", 4 * 1),       # fully collapsed to a single token
    }
    got_counts = (
        ts.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .count()
    )
    assert {(r["source"], r["count"]) for r in got_counts.collect()} == expected
    # the apply report agrees
    rep = {r["source"]: r for r in t.bpe_apply(spark, "x").collect()}
    assert rep["s1"]["tokens_after"] == 6 * 3 - 6
    assert rep["s2"]["tokens_after"] == 4 * 1
    assert rep["s2"]["tokens_before"] == 4 * 5


def test_image_phash_is_content_keyed(spark, monkeypatch):
    """Identical text (= identical decoded pixels) must hash to the
    same bucket; differing content must not collide on this fixture."""
    import hauser_spark.operators.multimodal as mm

    same = "pixel source text shared by two documents exactly!"
    rows = [
        (0, same, "en", "s", len(same)),
        (1, same, "en", "s", len(same)),
        (2, "completely different pixel material here you see", "en", "s", 48),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    monkeypatch.setattr(mm, "load_table", lambda s, d, n: docs)
    out = {r.doc_id: r for r in mm.image_phash(spark, "x").collect()}
    assert out[0].phash == out[1].phash
    assert out[0].bucket_size == 2 and out[2].bucket_size == 1
    assert out[2].phash != out[0].phash
