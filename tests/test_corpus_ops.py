"""Planted-scenario tests for the corpus-control operators: each test
constructs a corpus where the right answer is known by construction —
stronger than oracle parity (which only proves both engines agree)."""

import pytest
from pyspark.sql import functions as F

import hauser_spark.operators.decontam as dc
import hauser_spark.operators.dedup as dd


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# --- benchmark decontamination ----------------------------------------------


def test_exact_benchmark_copy_is_fully_flagged(spark, monkeypatch):
    """A training doc that IS a benchmark doc verbatim: hit_frac 1.0."""
    bench_text = " ".join(f"bench{i}" for i in range(20))
    rows = [(0, bench_text)]            # doc 0: benchmark (0 % 37 == 0)
    rows += [(1, bench_text)]           # doc 1: verbatim copy in training
    rows += [(i, " ".join(f"clean{i}w{j}" for j in range(20)))
             for i in range(2, 30)]     # unrelated training docs
    docs = _docs(spark, rows)
    monkeypatch.setattr(dc, "load_table", lambda s, d, n: docs)
    out = {r.doc_id: r for r in dc.benchmark_contamination(spark, "x").collect()}
    assert set(out) == {1}
    assert out[1].hit_frac == 1.0 and out[1].flagged


def test_partial_leak_hits_proportionally(spark, monkeypatch):
    """A training doc embedding a benchmark passage is flagged once the
    shared 5-grams clear the 1/5 threshold; clean docs never appear."""
    bench = " ".join(f"b{i}" for i in range(12))  # 8 distinct 5-grams
    rows = [(0, bench)]
    # doc 1 = benchmark passage + unique tail (passage dominates)
    rows += [(1, bench + " " + " ".join(f"t1x{j}" for j in range(4)))]
    # doc 2 = tiny overlap: last 4 benchmark tokens then unique text
    rows += [(2, "b8 b9 b10 b11 " + " ".join(f"t2x{j}" for j in range(40)))]
    rows += [(3, " ".join(f"c3w{j}" for j in range(30)))]
    docs = _docs(spark, rows)
    monkeypatch.setattr(dc, "load_table", lambda s, d, n: docs)
    out = {r.doc_id: r for r in dc.benchmark_contamination(spark, "x").collect()}
    assert 1 in out and out[1].flagged
    assert 3 not in out
    if 2 in out:  # 0 shared 5-grams of the 4-token stub -> really absent
        assert not out[2].flagged


# --- concat-and-chunk packing -----------------------------------------------


def test_packing_conserves_tokens_and_chunks_are_contiguous(spark, monkeypatch):
    rows = [(i, " ".join(f"s{i}w{j}" for j in range(137))) for i in range(40)]
    docs = spark.createDataFrame(
        [(i, t, "srcA" if i % 2 == 0 else "srcB") for i, t in rows],
        "doc_id long, text string, source string",
    )
    monkeypatch.setattr(dc, "load_table", lambda s, d, n: docs)
    out = dc.concat_chunk_packing(spark, "x").collect()
    per_source = {}
    for r in out:
        per_source.setdefault(r.source, []).append(r)
    for src, chunks in per_source.items():
        ids = sorted(c.chunk_id for c in chunks)
        assert ids == list(range(len(ids))), f"{src}: gaps in chunk ids"
        total = sum(c.n_tokens for c in chunks)
        assert total == 20 * 137  # every token lands in exactly one chunk
        # every doc is 137 tokens < 512 budget, so each chunk holds
        # docs starting inside it and boundary docs split at most once
        assert all(c.n_split_docs <= c.n_docs for c in chunks)


# --- substring-run dedup ----------------------------------------------------


def test_planted_passage_run_length_exact(spark, monkeypatch):
    """Two docs sharing one L-token passage (unique elsewhere) produce
    exactly one diagonal with run_len = L - 8 + 1."""
    L = 30
    passage = " ".join(f"p{i}" for i in range(L))
    rows = [
        (1, " ".join(f"a{j}" for j in range(10)) + " " + passage),
        (2, passage + " " + " ".join(f"b{j}" for j in range(10))),
    ]
    rows += [(i, " ".join(f"c{i}w{j}" for j in range(25))) for i in range(3, 20)]
    docs = _docs(spark, rows)
    monkeypatch.setattr(dd, "load_table", lambda s, d, n: docs)
    out = dd.substring_run_pairs(spark, "x").collect()
    assert [(r.d1, r.d2) for r in out] == [(1, 2)]
    r = out[0]
    assert r.run_len == L - dd.SUBSTR_N + 1
    # doc 1 starts the passage at pos 10, doc 2 at pos 0
    assert r.delta == -10


def test_no_shared_passage_no_pairs(spark, monkeypatch):
    rows = [(i, " ".join(f"u{i}w{j}" for j in range(40))) for i in range(12)]
    docs = _docs(spark, rows)
    monkeypatch.setattr(dd, "load_table", lambda s, d, n: docs)
    assert dd.substring_run_pairs(spark, "x").count() == 0


# --- multimodal byte entropy -------------------------------------------------


def test_byte_entropy_empty_payload_emits_no_phantom_rows(spark, monkeypatch):
    """Spark's sequence(1, 0) is the DESCENDING [1, 0], not the empty
    array — an empty payload once fabricated two ''-byte rows (byte_len 2,
    entropy 0) where the oracle's range(1, 1) yields none (ADVICE r2).
    Empty docs must simply be absent from the output."""
    import hauser_spark.operators.multimodal as mm

    rows = [(3, ""), (7, "abab")]  # doc_id % 4 == 3 → raw-text payload
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    monkeypatch.setattr(mm, "load_table", lambda s, d, n: docs)
    out = {r.doc_id: r for r in mm.byte_entropy(spark, "x").collect()}
    assert set(out) == {7}
    assert out[7].byte_len == 4


# --- real BMP decode ---------------------------------------------------------


def test_decode_bmp_strips_padding_and_flips_rows():
    """Hand-built 2x2 24-bit BMP (stride 8 = 6 pixel bytes + 2 pad):
    the decoder must read rows at the stride, drop the padding, and
    return top-down order (BMP stores bottom-up for positive height)."""
    import struct

    from hauser_spark.operators.multimodal import decode_bmp

    top = bytes([1, 2, 3, 4, 5, 6])       # top image row (BGR, BGR)
    bot = bytes([7, 8, 9, 10, 11, 12])    # bottom image row
    pad = b"\xff\xff"                     # poison: must never leak out
    pixel_array = bot + pad + top + pad   # file order: bottom row first
    header = (
        b"BM"
        + struct.pack("<I", 54 + len(pixel_array))
        + b"\x00" * 4
        + struct.pack("<I", 54)
        + struct.pack("<I", 40)
        + struct.pack("<ii", 2, 2)
        + struct.pack("<HH", 1, 24)
        + struct.pack("<I", 0)
        + struct.pack("<I", len(pixel_array))
        + b"\x00" * 16
    )
    w, h, pixels = decode_bmp(header + pixel_array)
    assert (w, h) == (2, 2)
    assert pixels == top + bot
    assert b"\xff" not in pixels


def test_decode_bmp_rejects_non_bmp_and_unsupported():
    import pytest as _pytest

    from hauser_spark.operators.multimodal import decode_bmp

    with _pytest.raises(ValueError):
        decode_bmp(b"\x89PNG" + b"\x00" * 60)
    # 8-bpp header: parseable but outside the stdlib decoder's contract
    import struct

    hdr = (
        b"BM" + struct.pack("<I", 54) + b"\x00" * 4 + struct.pack("<I", 54)
        + struct.pack("<I", 40) + struct.pack("<ii", 1, 1)
        + struct.pack("<HH", 1, 8) + struct.pack("<I", 0) + b"\x00" * 20
    )
    with _pytest.raises(NotImplementedError):
        decode_bmp(hdr)


def test_bmp_table_payloads_are_valid_bmps(spark, monkeypatch):
    """End-to-end: the JVM-built payload column must be decodable by the
    stdlib decoder and give back exactly the cycled text bytes."""
    import hauser_spark.operators.multimodal as mm

    rows = [(1, "abcdefg"), (2, "x" * 61)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    monkeypatch.setattr(mm, "load_table", lambda s, d, n: docs)
    got = {r.doc_id: bytes(r.payload) for r in mm.bmp_table(spark, "x").collect()}
    for doc_id, text in rows:
        w, h, pixels = mm.decode_bmp(got[doc_id])
        assert (w, h) == (mm.BMP_W, mm.BMP_H)
        src = (text * (60 // len(text) + 2))[:60].encode()
        # decoded rows are top-down = reversed 15-byte file rows
        file_rows = [src[i : i + 15] for i in range(0, 60, 15)]
        assert pixels == b"".join(reversed(file_rows))


def test_contamination_span_bounds_planted_passage(spark, monkeypatch):
    """A training doc embedding a benchmark passage at a known offset:
    the span report must bound exactly the copied region."""
    import hauser_spark.operators.decontam as dcm

    bench_toks = [f"bm{i}" for i in range(14)]     # 14-token benchmark
    prefix = [f"pre{i}" for i in range(5)]
    suffix = [f"suf{i}" for i in range(6)]
    rows = [
        (0, " ".join(bench_toks)),                 # 0 % 37 == 0: benchmark
        (1, " ".join(prefix + bench_toks + suffix)),  # passage at pos 5
        (2, " ".join(f"c{i}" for i in range(25))),    # clean
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    monkeypatch.setattr(dcm, "load_table", lambda s, d, n: docs)
    out = dcm.contamination_spans(spark, "x").collect()
    assert len(out) == 1
    r = out[0]
    # 14-token passage -> 7 aligned 8-grams starting at train pos 5
    assert (r.doc_id, r.bench_id) == (1, 0)
    assert r.run_len == 7
    assert r.span_start == 5
    assert r.span_end == 5 + 14 - 1
    assert r.span_tokens == 14


def test_audio_pcm_stats_decodes_planted_samples(spark, monkeypatch):
    """PCM16 decode on a payload whose samples are hand-computable:
    doc_id % 4 == 2 gets the RIFF header; the text bytes after it parse
    as little-endian int16."""
    import math
    import struct

    import hauser_spark.operators.multimodal as mmod

    text = "ABCDEFgh"  # 8 bytes -> 4 samples, all ASCII
    docs = spark.createDataFrame(
        [(2, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    monkeypatch.setattr(mmod, "load_table", lambda s, d, n: docs)
    out = mmod.audio_pcm_stats(spark, "x").collect()
    assert len(out) == 1
    r = out[0]
    samples = struct.unpack("<4h", text.encode())
    assert r.n_samples == 4
    assert r.peak_abs == max(abs(s) for s in samples)
    assert r.rms == mmod._round_half_up(
        math.sqrt(sum(s * s for s in samples) / 4), 6
    )
    assert r.zero_crossings == sum(
        1
        for i in range(1, 4)
        if (samples[i] < 0) != (samples[i - 1] < 0)
    )


def test_containment_catches_excerpt_that_jaccard_misses(spark, monkeypatch):
    """A short doc fully contained in a long one: Jaccard is diluted by
    the union (and the Jaccard path's length-ratio pre-filter drops the
    asymmetric pair outright), but containment of the excerpt is 1.0."""
    quote = " ".join(f"q{i}" for i in range(12))         # 10 shingles
    long_doc = quote + " " + " ".join(f"body{j}" for j in range(120))
    rows = [(0, quote), (1, long_doc)]
    rows += [(i, " ".join(f"c{i}w{j}" for j in range(25)))
             for i in range(2, 12)]
    docs = _docs(spark, rows)
    monkeypatch.setattr(dd, "load_table", lambda s, d, n: docs)
    jac = {(r.d1, r.d2) for r in dd.ngram_jaccard_pairs(spark, "x").collect()}
    assert (0, 1) not in jac
    cont = {(r.d1, r.d2): r for r in dd.containment_pairs(spark, "x").collect()}
    assert (0, 1) in cont
    r = cont[(0, 1)]
    assert r.c_1_in_2 == 1.0          # every quote shingle is in the article
    assert r.n1 == 10 and r.n_common == 10
    # no false pairs among the unrelated docs
    assert all(k == (0, 1) for k in cont)


def test_containment_lsh_equals_exact_and_bounds_candidates(
    spark, monkeypatch
):
    """The candidate-verify containment path must (a) find the planted
    excerpt pair the exact path finds — the bottom-s sketch misses a
    C>=0.9 pair with p<=0.1^s — and (b) generate candidates bounded by
    s·DF, never the doc-count square: 40 docs sharing nothing emit zero
    candidates."""
    quote = " ".join(f"q{i}" for i in range(12))
    long_doc = quote + " " + " ".join(f"body{j}" for j in range(120))
    rows = [(0, quote), (1, long_doc)]
    rows += [(i, " ".join(f"c{i}w{j}" for j in range(25)))
             for i in range(2, 42)]
    docs = _docs(spark, rows)
    monkeypatch.setattr(dd, "load_table", lambda s, d, n: docs)
    exact = {tuple(r) for r in dd.containment_pairs(spark, "x").collect()}
    lsh = {tuple(r) for r in dd.containment_lsh_pairs(spark, "x").collect()}
    assert lsh == exact
    assert any(p[:2] == (0, 1) for p in lsh)


def test_containment_bounds_jaccard(spark, monkeypatch):
    """Structural invariant: for any pair, containment of the smaller
    side is >= Jaccard (union >= smaller set), so every Jaccard-qualified
    pair is containment-qualified at the same tau."""
    rows = [(0, " ".join(f"a{i}" for i in range(30)))]
    rows += [(1, " ".join(f"a{i}" for i in range(30)) + " tail1")]
    rows += [(2, " ".join(f"b{i}" for i in range(25)))]
    docs = _docs(spark, rows)
    monkeypatch.setattr(dd, "load_table", lambda s, d, n: docs)
    jac = {(r.d1, r.d2) for r in dd.ngram_jaccard_pairs(spark, "x").collect()}
    cont = {(r.d1, r.d2) for r in dd.containment_pairs(spark, "x").collect()}
    assert jac and jac <= cont
