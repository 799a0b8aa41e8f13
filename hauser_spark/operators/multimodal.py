"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The image-decode step is REAL for uncompressed 24-bit BMP: payloads are
planted as honest BMP files (file+info header, BGR pixel rows stored
bottom-up with 4-byte row padding) and ``decode_bmp`` — pure stdlib,
no imaging library — parses the header, strips the stride padding, and
restores top-down row order inside the ``mapInPandas`` batch path.
``mm_feature_summary`` and ``mm_image_decode`` aggregate genuinely
decoded pixels, and their DuckDB oracles recompute the same statistics
from the pixel-source bytes directly — a decoder that mishandled the
data offset, stride, or channel layout would hash-mismatch.  Formats
the container truly cannot decode (JPEG/PNG/audio/video) remain
declared stubs (``decode_image_stub``, ``resize_image_stub``); their
distributed plumbing (schema contract, Arrow batch shape, partitioning)
is identical and tested.

The synthetic ``documents`` table stands in for a blob store: metadata
extraction (byte length, content digest) treats the UTF-8 text bytes as
the payload and is pure SQL; the BMP queries cycle those bytes into the
pixel array.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..tables import load_table

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("header_hex", T.StringType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def decode_image_stub(payload: bytes) -> "object":
    """Placeholder for a real image decode (PIL.Image.open etc.).

    Raises NotImplementedError by design: the container has no imaging
    libraries for compressed formats.  Uncompressed 24-bit BMP decode is
    real — see ``decode_bmp``.
    """
    raise NotImplementedError(
        "image decode requires an imaging library not present in this "
        "container; wire PIL/torchvision here in production"
    )


def _round_half_up(x: float, scale: int = 6) -> float:
    """SQL ROUND semantics (half away from zero) — Python's round() is
    banker's rounding and disagrees with Spark/DuckDB exactly on .5
    boundaries, which byte-means of power-of-two-length payloads hit.

    This replica targets the ORACLE's arithmetic: DuckDB ROUND(double, s)
    is `std::round(x * 10^s) / 10^s` in doubles, emulated here exactly
    (floor + exact-by-Sterbenz fractional compare, ties away from zero).
    Three plausible alternatives are all falsified by the hypothesis
    property test: Python round() (banker's), Decimal(x).quantize (exact
    binary expansion rounds 0.0062035 down where the double multiply
    carries it up), Decimal(repr(x)).quantize (shortest-repr misses the
    multiply's ulp drift at |x|·10^s > 2^53)."""
    import math

    unit = float(10**scale)
    y = x * unit
    if y >= 0:
        f = math.floor(y)
        r = f + 1 if (y - f) >= 0.5 else f
    else:
        c = math.ceil(y)
        r = c - 1 if (c - y) >= 0.5 else c
    return r / unit


# ---- real BMP plumbing (pure stdlib, no imaging library) ---------------
#
# Planted payloads are honest uncompressed 24-bit BI_RGB BMPs: 14-byte
# file header + 40-byte BITMAPINFOHEADER + pixel array.  Width 5 makes
# the row stride 15 → padded to 16, so every decode exercises the
# 4-byte row-padding rule; positive height means rows are stored
# bottom-up, so every decode exercises the row flip.  Pixel bytes cycle
# the document's UTF-8 text, which is what lets a SQL oracle recompute
# the decoded statistics without a decoder.

BMP_W = 5
BMP_H = 4
_BMP_ROW_BYTES = BMP_W * 3                 # 15: BGR triplets per row
_BMP_STRIDE = (_BMP_ROW_BYTES + 3) & ~3    # 16: rows pad to 4 bytes
_BMP_SRC_BYTES = _BMP_ROW_BYTES * BMP_H    # 60 pixel bytes per image
_BMP_PIXEL_ARRAY = _BMP_STRIDE * BMP_H     # 64 incl. padding
_BMP_DATA_OFFSET = 14 + 40
_BMP_FILE_SIZE = _BMP_DATA_OFFSET + _BMP_PIXEL_ARRAY  # 118


def _le_hex(value: int, nbytes: int) -> str:
    return value.to_bytes(nbytes, "little").hex()


_BMP_HEADER_HEX = (
    "424d"                              # 'BM'
    + _le_hex(_BMP_FILE_SIZE, 4)
    + "00000000"                        # reserved
    + _le_hex(_BMP_DATA_OFFSET, 4)
    + _le_hex(40, 4)                    # BITMAPINFOHEADER size
    + _le_hex(BMP_W, 4)
    + _le_hex(BMP_H, 4)                 # positive: bottom-up rows
    + _le_hex(1, 2)                     # planes
    + _le_hex(24, 2)                    # bpp
    + _le_hex(0, 4)                     # BI_RGB (uncompressed)
    + _le_hex(_BMP_PIXEL_ARRAY, 4)
    + "00000000" * 4                    # ppm x/y, colors used/important
)


def decode_bmp(payload: bytes) -> tuple[int, int, bytes]:
    """Decode an uncompressed 24-bit BMP → (width, height, pixels).

    Pure stdlib: header fields via ``struct`` at their fixed offsets,
    pixel rows read at ``data_offset`` honoring the 4-byte row stride,
    padding stripped, bottom-up storage flipped to top-down.  Returned
    ``pixels`` is height×width BGR triplets in reading order.  Raises
    ``ValueError`` for non-BMP bytes and ``NotImplementedError`` for
    compressed / non-24-bit variants (the honest boundary of a
    stdlib-only decoder)."""
    import struct

    if len(payload) < _BMP_DATA_OFFSET or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    width, height = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if compression != 0 or bpp != 24:
        raise NotImplementedError(
            "stdlib decoder handles uncompressed 24-bit BI_RGB only"
        )
    h = abs(height)
    stride = (width * 3 + 3) & ~3
    if len(payload) < data_off + stride * h:
        raise ValueError("truncated BMP pixel array")
    rows = [
        payload[data_off + r * stride: data_off + r * stride + width * 3]
        for r in range(h)
    ]
    if height > 0:  # bottom-up storage → top-down reading order
        rows.reverse()
    return width, h, b"".join(rows)


def binary_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal table shape: opaque payload + typed metadata."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.col("source").alias("origin"),
            F.col("lang").alias("lang"),
            F.lit("text/plain").alias("mime"),
        ).alias("meta"),
    )


def metadata_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-only metadata path: byte length + md5 digest of the payload —
    the audit/selection scan that never needs to decode."""
    bt = binary_table(spark, sf_dir)
    return bt.select(
        "doc_id",
        F.octet_length("payload").cast("long").alias("byte_len"),
        F.md5("payload").alias("digest"),
        F.col("meta.mime").alias("mime"),
    ).orderBy("doc_id")


def bmp_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, payload): an honest 24-bit BMP per document, pixel bytes
    cycled from the document's UTF-8 text.  Built entirely JVM-side
    (hex-literal header + binary substring slices + per-row pad bytes) —
    the payload column is real bytes, not a parallel representation."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") > 0
    )
    rep = F.expr(
        f"substring(repeat(text, CAST({_BMP_SRC_BYTES} / length(text) AS INT)"
        f" + 1), 1, {_BMP_SRC_BYTES})"
    )
    pix = F.encode(rep, "UTF-8")
    parts = [F.unhex(F.lit(_BMP_HEADER_HEX))]
    pad = F.unhex(F.lit("00" * (_BMP_STRIDE - _BMP_ROW_BYTES)))
    for r in range(BMP_H):
        parts.append(
            F.substring(pix, r * _BMP_ROW_BYTES + 1, _BMP_ROW_BYTES)
        )
        parts.append(pad)
    return docs.select("doc_id", F.concat(*parts).alias("payload"))


def feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mapInPandas decode/feature path: Arrow batches of real BMP
    payloads in, one feature row of DECODED-pixel moments out. This is
    the pattern a real image pipeline uses — batch-at-a-time Python,
    schema declared up front, decode inside the batch loop."""
    bt = bmp_table(spark, sf_dir).repartition(8, "doc_id")

    def extract(batches: Iterator["object"]) -> Iterator["object"]:
        import numpy as np
        import pandas as pd

        def moments(payload: bytes) -> list[float]:
            _w, _h, pixels = decode_bmp(bytes(payload))
            arr = np.frombuffer(pixels, dtype=np.uint8)
            mean = arr.sum() / arr.size
            var = float(np.square(arr - mean).sum()) / arr.size
            return [
                _round_half_up(float(mean)),
                _round_half_up(var),
                float(arr.min()),
                float(arr.max()),
            ]

        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": payloads.map(len),
                    "header_hex": payloads.map(lambda b: bytes(b[:4]).hex()),
                    "feature": payloads.map(moments),
                }
            )

    return bt.mapInPandas(extract, FEATURE_SCHEMA)


def feature_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over genuinely decoded pixels — forces the full
    build-BMP → mapInPandas-decode path and reduces to a deterministic,
    engine-independent summary (the oracle recomputes the mean from the
    cycled text bytes, so header/stride/flip mistakes mismatch)."""
    feats = feature_extract(spark, sf_dir)
    return (
        feats.select(
            "doc_id",
            "byte_len",
            F.round(F.element_at("feature", 1), 6).alias("mean_byte"),
        )
        .orderBy("doc_id")
    )


DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_r", T.DoubleType()),
    ]
)


def image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image channel statistics from the real BMP decode: width and
    height read from the header, per-channel (BGR) means over the
    decoded pixel array.  Channel means are the stride-padding canary:
    if the decoder left the 1-byte row padding in (or misread the data
    offset), every byte after the first row would land in the wrong
    channel and the means would diverge from the oracle, which assigns
    channels arithmetically (position mod 3) over the pixel-source
    bytes."""
    bt = bmp_table(spark, sf_dir).repartition(8, "doc_id")

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import numpy as np
        import pandas as pd

        def stats(payload: bytes) -> tuple:
            w, h, pixels = decode_bmp(bytes(payload))
            arr = np.frombuffer(pixels, dtype=np.uint8)
            n = w * h
            return (
                w,
                h,
                n,
                _round_half_up(float(arr[0::3].sum()) / n),
                _round_half_up(float(arr[1::3].sum()) / n),
                _round_half_up(float(arr[2::3].sum()) / n),
            )

        for pdf in batches:
            rows = pdf["payload"].map(stats)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": rows.map(lambda t: t[0]),
                    "height": rows.map(lambda t: t[1]),
                    "n_pixels": rows.map(lambda t: t[2]),
                    "mean_b": rows.map(lambda t: t[3]),
                    "mean_g": rows.map(lambda t: t[4]),
                    "mean_r": rows.map(lambda t: t[5]),
                }
            )

    # checkpoint before the global sort: the range exchange samples its
    # child, so the ordered output otherwise runs the Arrow kernel twice
    # (guide §2.4 - the phash-frame finding)
    return (
        bt.mapInPandas(run, DECODE_SCHEMA)
        .localCheckpoint(eager=False)
        .orderBy("doc_id")
    )


def resize_image_stub(payload: bytes, width: int, height: int) -> bytes:
    """Placeholder for a real image resize (PIL.Image.resize / cv2).
    Raises by design — no imaging libs in this container; the distributed
    shape is identical to ``feature_extract``'s mapInPandas path."""
    raise NotImplementedError(
        "image resize requires an imaging library not present in this "
        "container; wire PIL/opencv here in production"
    )


FRAME_BYTES = 16  # stand-in "frame" size for the sampling plumbing
FRAME_STRIDE = 7  # sample every 7th frame


def frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing (video → every k-th frame): the payload is
    treated as a stream of fixed-size frames; mapInPandas emits the frame
    count, sampled count, and first frame digest per blob. In production
    the frame iterator comes from ffmpeg/pyav; the batch shape, schema,
    and partitioning are exactly this."""
    import pandas as pd

    bt = binary_table(spark, sf_dir)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_frames", T.LongType()),
            T.StructField("n_sampled", T.LongType()),
            T.StructField("first_frame_hex", T.StringType()),
        ]
    )

    def sample(batches) -> "object":
        for pdf in batches:
            payloads = pdf["payload"]
            n_frames = payloads.map(lambda b: len(b) // FRAME_BYTES)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_frames": n_frames,
                    "n_sampled": n_frames.map(
                        lambda n: (n + FRAME_STRIDE - 1) // FRAME_STRIDE
                    ),
                    "first_frame_hex": payloads.map(
                        lambda b: bytes(b[:FRAME_BYTES]).hex()
                    ),
                }
            )

    # checkpoint before the global sort: the range exchange samples its
    # child, so the ordered output otherwise runs the Arrow kernel twice
    # (guide §2.4 - the phash-frame finding)
    return (
        bt.mapInPandas(sample, schema)
        .localCheckpoint(eager=False)
        .orderBy("doc_id")
    )


# -------- format sniffing + byte entropy: REAL binary ops (no stub) ----
#
# Magic-byte headers planted deterministically by doc_id give the sniffer
# a non-vacuous input: payload = header(doc_id % 4) ++ utf8(text).

_MAGICS = [
    ("ffd8ffe0", "image/jpeg"),
    ("89504e47", "image/png"),
    ("52494646", "audio/wav"),  # RIFF
    ("", "text/plain"),
]


def _planted_payload() -> F.Column:
    """payload with a deterministic magic header per doc."""
    cases = None
    for i, (hexhdr, _mime) in enumerate(_MAGICS):
        hdr = (
            F.concat(F.unhex(F.lit(hexhdr)), F.encode("text", "UTF-8"))
            if hexhdr
            else F.encode("text", "UTF-8")
        )
        cond = F.col("doc_id") % len(_MAGICS) == i
        cases = F.when(cond, hdr) if cases is None else cases.when(cond, hdr)
    return cases


def format_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-type sniffing from magic bytes — the first gate of any
    multimodal ingest (metadata lies; bytes do not). Pure expression
    work over the binary column: hex the 4-byte header, map known magics
    to a mime, compare against the claimed type."""
    docs = load_table(spark, sf_dir, "documents")
    payload = _planted_payload()
    claimed = F.element_at(
        F.array(*[F.lit(m) for _h, m in _MAGICS]),
        (F.col("doc_id") % len(_MAGICS) + 1).cast("int"),
    )
    bt = docs.select("doc_id", payload.alias("payload"), claimed.alias("claimed_mime"))
    hdr = F.lower(F.hex(F.substring("payload", 1, 4)))
    sniffed = F.when(hdr.startswith("ffd8ff"), "image/jpeg")
    for hexhdr, mime in _MAGICS[1:3]:
        sniffed = sniffed.when(hdr.startswith(hexhdr), mime)
    sniffed = sniffed.otherwise("text/plain")
    return bt.select(
        "doc_id",
        hdr.alias("header_hex"),
        sniffed.alias("sniffed_mime"),
        "claimed_mime",
        (sniffed == F.col("claimed_mime")).alias("mime_ok"),
    ).orderBy("doc_id")


def byte_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon byte entropy per payload — the cheap corruption /
    already-compressed detector (≈0 bits: stuck bytes; ≈8 bits: random =
    compressed or encrypted; natural text sits in between).

    Exact at scale: entropy is assembled from per-byte-value counts with
    the integer-scaled-log trick (⌊ln(c/n)·10⁶⌉ per term), so the sum is
    order-free and cross-engine identical — same device as the surprisal
    operator. Shape: the per-byte histogram is a vectorized
    ``np.bincount`` inside Arrow-batched ``mapInPandas`` — counting is
    integer-exact, so nothing changes versus the former hex-explode
    formulation except the work: no per-byte interpreted HOF, no
    byte-stream-sized explode feeding the shuffle, and the stage output
    is ≤256 rows per doc before the (doc) groupBy (embarrassingly
    parallel over the scan; an empty payload yields no rows, matching
    the oracle's empty range). The log/entropy math stays in Spark so
    cross-engine float semantics are untouched."""
    import pandas as pd

    from ..tables import fanout_small_scan

    docs = fanout_small_scan(load_table(spark, sf_dir, "documents"), spark)
    payload = _planted_payload()
    bt = docs.select("doc_id", payload.alias("payload"))

    def count_bytes(batches):
        import numpy as np

        for pdf in batches:
            ids, cs = [], []
            for did, buf in zip(pdf["doc_id"], pdf["payload"]):
                if buf is None or len(buf) == 0:
                    continue
                cnt = np.bincount(
                    np.frombuffer(bytes(buf), dtype=np.uint8), minlength=256
                )
                nz = cnt[cnt > 0]
                ids.extend([did] * len(nz))
                cs.extend(int(x) for x in nz)
            yield pd.DataFrame({"doc_id": ids, "c": cs}).astype(
                {"doc_id": "int64", "c": "int64"}
            )

    b = bt.mapInPandas(count_bytes, "doc_id long, c long")
    per_doc = b.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.sum(
            F.col("c")
            * F.round(F.log(F.col("c") * F.lit(1.0)) * 1e6).cast("long")
        ).alias("s_ln_c"),
    )
    # H = ln(n) - (Σ c·ln c)/n, in nats → bits via /ln 2; the Σ term is
    # integer-exact, ln(n) is one double op on both engines
    import math

    ent_bits = (
        F.log("n") - F.col("s_ln_c") / 1e6 / F.col("n")
    ) / math.log(2)
    return per_doc.select(
        "doc_id",
        F.col("n").alias("byte_len"),
        F.round(ent_bits, 6).alias("entropy_bits"),
    ).orderBy("doc_id")


QUERIES = {
    "mm_metadata_extract": metadata_extract,
    "mm_feature_summary": feature_summary,
    "mm_image_decode": image_decode,
    "mm_frame_sample": frame_sample,
    "mm_format_sniff": format_sniff,
    "mm_byte_entropy": byte_entropy,
}

# pixel-source bytes: the document text cycled to 60 bytes (what
# bmp_table packs into the BMP rows); the oracles recompute decoded-pixel
# statistics from this directly — no decoder on the oracle side, which is
# exactly what makes the Spark-side decode falsifiable
_BMP_SRC_CTE = f"""
    src AS (
        SELECT doc_id,
               substring(repeat(text,
                         CAST({_BMP_SRC_BYTES} / length(text) AS INT) + 1),
                         1, {_BMP_SRC_BYTES}) AS s
        FROM documents WHERE length(text) > 0
    ),
    pix AS (
        SELECT doc_id, i - 1 AS pos, ascii(substring(s, i, 1)) AS v
        FROM src, unnest(range(1, {_BMP_SRC_BYTES} + 1)) AS t(i)
    )
"""

ORACLES = {
    "mm_metadata_extract": """
        SELECT doc_id,
               octet_length(CAST(text AS BLOB)) AS byte_len,
               md5(text) AS digest,
               'text/plain' AS mime
        FROM documents ORDER BY doc_id
    """,
    # mm_feature_summary: mean decoded-pixel value — recomputed from the
    # cycled text bytes the BMP packs (corpus is ASCII: byte == codepoint);
    # byte_len is the fixed BMP file size (header + padded pixel array).
    "mm_feature_summary": None,  # filled below (needs _BMP_SRC_CTE)
    # frame math is plain arithmetic on byte length + a prefix digest, so
    # even the sampling plumbing has an exact oracle (corpus is ASCII:
    # 1 char == 1 byte).
    "mm_frame_sample": f"""
        SELECT doc_id,
               CAST(length(text) // {FRAME_BYTES} AS BIGINT) AS n_frames,
               CAST((length(text) // {FRAME_BYTES} + {FRAME_STRIDE} - 1)
                    // {FRAME_STRIDE} AS BIGINT) AS n_sampled,
               lower(hex(CAST(substr(text, 1, {FRAME_BYTES}) AS BLOB)))
                   AS first_frame_hex
        FROM documents ORDER BY doc_id
    """,
}


ORACLES["mm_feature_summary"] = f"""
    WITH {_BMP_SRC_CTE}
    SELECT doc_id, CAST({_BMP_FILE_SIZE} AS BIGINT) AS byte_len,
           ROUND(CAST(SUM(v) AS DOUBLE) / {_BMP_SRC_BYTES}, 6) AS mean_byte
    FROM pix GROUP BY doc_id ORDER BY doc_id
"""

ORACLES["mm_image_decode"] = f"""
    WITH {_BMP_SRC_CTE}
    SELECT doc_id,
           CAST({BMP_W} AS BIGINT) AS width,
           CAST({BMP_H} AS BIGINT) AS height,
           CAST({BMP_W * BMP_H} AS BIGINT) AS n_pixels,
           ROUND(CAST(SUM(CASE WHEN pos % 3 = 0 THEN v END) AS DOUBLE)
                 / {BMP_W * BMP_H}, 6) AS mean_b,
           ROUND(CAST(SUM(CASE WHEN pos % 3 = 1 THEN v END) AS DOUBLE)
                 / {BMP_W * BMP_H}, 6) AS mean_g,
           ROUND(CAST(SUM(CASE WHEN pos % 3 = 2 THEN v END) AS DOUBLE)
                 / {BMP_W * BMP_H}, 6) AS mean_r
    FROM pix GROUP BY doc_id ORDER BY doc_id
"""


_PAYLOAD_HEX_CTE = """
    p AS (
        SELECT doc_id,
               CASE CAST(doc_id % 4 AS INTEGER)
                    WHEN 0 THEN 'ffd8ffe0' || lower(hex(encode(text)))
                    WHEN 1 THEN '89504e47' || lower(hex(encode(text)))
                    WHEN 2 THEN '52494646' || lower(hex(encode(text)))
                    ELSE lower(hex(encode(text)))
               END AS hx
        FROM documents
    )
"""

ORACLES["mm_format_sniff"] = f"""
    WITH {_PAYLOAD_HEX_CTE},
    s AS (
        SELECT doc_id, substring(hx, 1, 8) AS header_hex,
               CASE WHEN substring(hx, 1, 6) = 'ffd8ff' THEN 'image/jpeg'
                    WHEN substring(hx, 1, 8) = '89504e47' THEN 'image/png'
                    WHEN substring(hx, 1, 8) = '52494646' THEN 'audio/wav'
                    ELSE 'text/plain' END AS sniffed_mime,
               CASE CAST(doc_id % 4 AS INTEGER)
                    WHEN 0 THEN 'image/jpeg' WHEN 1 THEN 'image/png'
                    WHEN 2 THEN 'audio/wav' ELSE 'text/plain'
               END AS claimed_mime
        FROM p
    )
    SELECT doc_id, header_hex, sniffed_mime, claimed_mime,
           sniffed_mime = claimed_mime AS mime_ok
    FROM s ORDER BY doc_id
"""

ORACLES["mm_byte_entropy"] = f"""
    WITH {_PAYLOAD_HEX_CTE},
    b AS (
        SELECT doc_id, substring(hx, i * 2 - 1, 2) AS byte,
               count(*) AS c
        FROM p, unnest(range(1, len(hx) // 2 + 1)) AS t(i)
        GROUP BY 1, 2
    ),
    per_doc AS (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
               CAST(sum(c * CAST(ROUND(ln(c * 1.0) * 1000000.0) AS BIGINT))
                    AS BIGINT) AS s_ln_c
        FROM b GROUP BY doc_id
    )
    SELECT doc_id, n AS byte_len,
           ROUND((ln(n) - s_ln_c / 1000000.0 / n) / ln(2), 6)
               AS entropy_bits
    FROM per_doc ORDER BY doc_id
"""


# ----------------------------------------------------- PCM16 audio stats

def audio_pcm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real audio-path decode: the RIFF-tagged payloads' bodies parsed
    as little-endian PCM16 and reduced to the waveform stats an audio
    curation pass filters on — sample count, peak amplitude, RMS, zero
    crossings (silence ≈ zero RMS, clipping ≈ peak at 32767, noise ≈
    high crossing rate).

    Like the BMP decoder, the decode is REAL (stdlib struct.unpack on
    the actual bytes inside the Arrow ``mapInPandas`` path — no audio
    library needed for PCM) and the oracle recomputes the identical
    integer arithmetic from the payload hex, so the decoded stats are
    hash-checked cross-engine. Batch shape: one narrow Arrow pass over
    the audio slice of the corpus; all stats are per-row, no shuffle
    until the (bounded) result."""
    import pandas as pd

    from pyspark.sql import types as T

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % len(_MAGICS) == 2  # the 'audio/wav' slice
    )
    bt = docs.select("doc_id", _planted_payload().alias("payload"))
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("peak_abs", T.LongType()),
            T.StructField("rms", T.DoubleType()),
            T.StructField("zero_crossings", T.LongType()),
        ]
    )

    def decode(batches):
        import math
        import struct

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                body = bytes(payload)[4:]  # strip the RIFF magic
                n = len(body) // 2
                samples = struct.unpack(f"<{n}h", body[: 2 * n])
                if n:
                    peak = max(abs(s) for s in samples)
                    ss = sum(s * s for s in samples)
                    rms = _round_half_up(math.sqrt(ss / n), 6)
                    zc = sum(
                        1
                        for i in range(1, n)
                        if (samples[i] < 0) != (samples[i - 1] < 0)
                    )
                else:
                    peak, rms, zc = 0, 0.0, 0
                rows.append((int(doc_id), n, peak, rms, zc))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_samples",
                    "peak_abs",
                    "rms",
                    "zero_crossings",
                ],
            )

    # checkpoint before the global sort: the range exchange samples its
    # child, so the ordered output otherwise runs the Arrow kernel twice
    # (guide §2.4 - the phash-frame finding)
    return (
        bt.mapInPandas(decode, out_schema)
        .localCheckpoint(eager=False)
        .orderBy("doc_id")
    )


QUERIES["mm_audio_pcm_stats"] = audio_pcm_stats

ORACLES["mm_audio_pcm_stats"] = f"""
    WITH {_PAYLOAD_HEX_CTE},
    audio AS (
        SELECT doc_id, substring(hx, 9) AS body
        FROM p WHERE doc_id % 4 = 2
    ),
    samples AS (
        SELECT doc_id, i,
               CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS s
        FROM (
            SELECT doc_id, i,
                   ('0x' || substring(body, i * 4 - 3, 2))::BIGINT
                   + 256 * ('0x' || substring(body, i * 4 - 1, 2))::BIGINT
                       AS u
            FROM audio, unnest(range(1, len(body) // 4 + 1)) AS t(i)
        )
    ),
    flags AS (
        SELECT doc_id,
               CASE WHEN (s < 0) <>
                    (LAG(s) OVER (PARTITION BY doc_id ORDER BY i) < 0)
                    THEN 1 ELSE 0 END AS f
        FROM samples
    ),
    zc AS (
        SELECT doc_id, CAST(sum(f) AS BIGINT) AS zero_crossings
        FROM flags GROUP BY doc_id
    ),
    agg AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_samples,
               CAST(max(abs(s)) AS BIGINT) AS peak_abs,
               ROUND(sqrt(CAST(sum(s * s) AS BIGINT) * 1.0 / count(*)), 6)
                   AS rms
        FROM samples GROUP BY doc_id
    )
    SELECT a.doc_id, a.n_samples, a.peak_abs, a.rms,
           COALESCE(z.zero_crossings, 0) AS zero_crossings
    FROM agg a LEFT JOIN zc z ON a.doc_id = z.doc_id
    ORDER BY a.doc_id
"""


def _phash_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, phash) — the decoded-pixel average-hash per image; the
    shared kernel behind ``image_phash`` and ``phash_near_dup``."""
    import pandas as pd

    bt = bmp_table(spark, sf_dir).repartition(8, "doc_id")

    def hash_batch(batches: Iterator["object"]) -> Iterator["object"]:
        import numpy as np

        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                _w, _h, pixels = decode_bmp(bytes(payload))
                arr = np.frombuffer(pixels, dtype=np.uint8).astype(np.int64)
                s3 = arr.reshape(-1, 3).sum(axis=1)
                total = int(arr.sum())
                bits = (s3 * len(s3) > total)
                out.append(int(sum(1 << p for p, b in enumerate(bits) if b)))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "phash": out}
            ).astype({"doc_id": "int64", "phash": "int64"})

    # checkpointed per call: the decode kernel is the expensive leg and
    # the frame is two longs per image; the radius search reads it from
    # both band sides and the sweep adds a probe count — without the
    # barrier each consumer re-ran the whole Arrow decode (guide §2.4)
    return bt.mapInPandas(
        hash_batch, "doc_id long, phash long"
    ).localCheckpoint(eager=False)


def image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual (average-) hash dedup over DECODED image pixels — the
    content-based image near-dup key a multimodal pipeline runs after
    byte-level dedup (same image re-encoded or differently padded hashes
    identically here, where the md5 of the payload does not).

    Per image: luminance proxy per pixel = channel sum; hash bit p is
    "pixel p brighter than the image mean", folded into one 20-bit int.
    Comparison is INTEGER-exact (bit_p ⇔ 20·sum3_p > Σbytes — no float
    division), so Spark's decoded-pixel hash and the oracle's
    recomputation from the source bytes agree bit-for-bit; a decoder
    header/stride/flip mistake flips bits and mismatches.  Shape: the
    decode is the same Arrow mapInPandas scan as feature_extract (one
    row out per image), and bucket sizes are one window over the tiny
    (doc, hash) table — content dedup without any pairwise work."""
    ph = _phash_frame(spark, sf_dir)
    w = Window.partitionBy("phash")
    return (
        ph.select(
            "doc_id",
            "phash",
            F.count(F.lit(1)).over(w).alias("bucket_size"),
        ).orderBy("doc_id")
    )


QUERIES["mm_image_phash"] = image_phash

_PHASH_CTE = f"""
    {_BMP_SRC_CTE.lstrip()},
    -- pixel index in DECODED (top-down reading) order: the builder
    -- writes text row 0 first, which BMP stores as the BOTTOM row, so
    -- the decoder's row flip maps text row r to image row H-1-r
    p3 AS (
        SELECT doc_id,
               ({BMP_H - 1} - t.pxt // {BMP_W}) * {BMP_W}
                   + t.pxt % {BMP_W} AS px,
               s3
        FROM (
            SELECT doc_id, pos // 3 AS pxt, sum(v) AS s3
            FROM pix GROUP BY doc_id, pos // 3
        ) t
    ),
    tot AS (
        SELECT doc_id, sum(v) AS total FROM pix GROUP BY doc_id
    ),
    ph AS (
        SELECT p3.doc_id,
               CAST(sum(CASE WHEN {BMP_W * BMP_H} * s3 > total
                        THEN (CAST(1 AS BIGINT) << px) ELSE 0 END)
                    AS BIGINT) AS phash
        FROM p3 JOIN tot ON p3.doc_id = tot.doc_id
        GROUP BY p3.doc_id
    )
"""

ORACLES["mm_image_phash"] = f"""
    WITH {_PHASH_CTE.lstrip()}
    SELECT doc_id, phash,
           CAST(count(*) OVER (PARTITION BY phash) AS BIGINT)
               AS bucket_size
    FROM ph ORDER BY doc_id
"""


# ------------------------------------------------------- scene-cut detect

SCENE_LEVEL_DIV = 4  # mean-byte quantization step for the frame signature


def _scene_cuts_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut detection plumbing (video → shot boundaries): frames are
    fixed-size payload blocks; each frame's signature is its quantized
    mean byte level, and a cut is any frame whose signature differs from
    its predecessor.  In production the signature would be a perceptual
    frame histogram from the decoder; the batch shape, doc-local
    sequential scan, and integer-exact output are exactly this.

    Scale: frames never leave their document, so the kernel is a
    doc-local Arrow pass (numpy reshape + diff per payload — no byte
    explode, no shuffle); output is one bounded row per blob.  All
    arithmetic is integer (byte sums, integer division), so the oracle's
    byte-explode SQL reproduces it bit-for-bit.
    """
    import numpy as np
    import pandas as pd

    bt = binary_table(spark, sf_dir)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_frames", T.LongType()),
            T.StructField("n_cuts", T.LongType()),
            T.StructField("cut_ratio", T.DoubleType()),
        ]
    )

    def detect(batches):
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                nf = len(b) // FRAME_BYTES
                if nf == 0:
                    out.append((doc_id, 0, 0, 0.0))
                    continue
                arr = np.frombuffer(
                    b[: nf * FRAME_BYTES], dtype=np.uint8
                ).reshape(nf, FRAME_BYTES)
                # integer mean level: sum DIV FRAME_BYTES DIV step
                lvl = (
                    arr.sum(axis=1, dtype=np.int64) // FRAME_BYTES
                ) // SCENE_LEVEL_DIV
                cuts = int((lvl[1:] != lvl[:-1]).sum())
                # exact half-up ratio at 6dp (cuts / (nf-1)); nf==1 → 0
                denom = nf - 1
                ratio = (
                    float((2 * cuts * 1000000 + denom) // (2 * denom)) / 1e6
                    if denom > 0
                    else 0.0
                )
                out.append((doc_id, nf, cuts, ratio))
            yield pd.DataFrame(
                out, columns=["doc_id", "n_frames", "n_cuts", "cut_ratio"]
            )

    return bt.mapInPandas(detect, schema)


def scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered public form of [[_scene_cuts_frame]] (which the
    single-Arrow-pass plan gate reads directly): checkpoint before the
    global sort — the range exchange samples its child, so the ordered
    output otherwise runs the Arrow kernel twice (guide §2.4, the
    phash-frame finding)."""
    return (
        _scene_cuts_frame(spark, sf_dir)
        .localCheckpoint(eager=False)
        .orderBy("doc_id")
    )


QUERIES["mm_scene_cuts"] = scene_cuts

ORACLES["mm_scene_cuts"] = f"""
    WITH p AS (
        SELECT doc_id, lower(hex(encode(text))) AS hx FROM documents
    ),
    frames AS (
        -- byte-exact frames from the UTF-8 payload hex (the kernel
        -- frames on bytes, not characters; ascii(substring(text, ...))
        -- would drift on any non-ASCII document)
        SELECT doc_id, f,
               (sum(('0x' || substr(hx,
                                    (f * {FRAME_BYTES} + i - 1) * 2 + 1,
                                    2))::BIGINT)
                // {FRAME_BYTES}) // {SCENE_LEVEL_DIV} AS lvl
        FROM p,
             unnest(range(0, (len(hx) // 2) // {FRAME_BYTES})) AS t(f),
             unnest(range(1, {FRAME_BYTES} + 1)) AS u(i)
        GROUP BY doc_id, f
    ),
    cuts AS (
        SELECT doc_id, count(*) AS nf,
               sum(CASE WHEN prev IS NOT NULL AND lvl != prev
                        THEN 1 ELSE 0 END) AS c
        FROM (
            SELECT doc_id, lvl,
                   lag(lvl) OVER (PARTITION BY doc_id ORDER BY f) AS prev
            FROM frames) t
        GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(c.nf, 0) AS BIGINT) AS n_frames,
           CAST(coalesce(c.c, 0) AS BIGINT) AS n_cuts,
           CASE WHEN coalesce(c.nf, 0) > 1 THEN
               CAST((2 * c.c * 1000000 + (c.nf - 1)) // (2 * (c.nf - 1))
                    AS DOUBLE) / 1e6
           ELSE CAST(0.0 AS DOUBLE) END AS cut_ratio
    FROM documents d LEFT JOIN cuts c ON c.doc_id = d.doc_id
    ORDER BY d.doc_id
"""


# ------------------------------------------------- audio energy flux

AUDIO_FRAME_SAMPLES = 64  # PCM16 samples per analysis frame


def audio_energy_flux(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-energy flux over the PCM16 audio slice — the onset/activity
    detector an audio curation pass runs (speech/music have high
    inter-frame energy variation; tones and silence have none): the
    waveform is cut into AUDIO_FRAME_SAMPLES-sample frames, each frame's
    energy is the exact integer Σs², and the flux is Σ|eᵢ−eᵢ₋₁|.

    All integer arithmetic (energies ≤ 64·32768² ≈ 7e10, flux sums fit
    a long), decoded REAL (struct.unpack) inside one doc-local Arrow
    pass — no shuffle, frames never leave their document; the oracle
    re-derives the identical integers from the payload hex.
    """
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % len(_MAGICS) == 2
    )
    bt = docs.select("doc_id", _planted_payload().alias("payload"))
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_frames", T.LongType()),
            T.StructField("energy_flux", T.LongType()),
            T.StructField("mean_frame_energy", T.DoubleType()),
        ]
    )

    def analyze(batches):
        import struct

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                body = bytes(payload)[4:]
                n = len(body) // 2
                nf = n // AUDIO_FRAME_SAMPLES
                if nf == 0:
                    rows.append((int(doc_id), 0, 0, 0.0))
                    continue
                m = nf * AUDIO_FRAME_SAMPLES
                samples = struct.unpack(f"<{m}h", body[: 2 * m])
                energies = [
                    sum(
                        s * s
                        for s in samples[
                            f * AUDIO_FRAME_SAMPLES:(f + 1) * AUDIO_FRAME_SAMPLES
                        ]
                    )
                    for f in range(nf)
                ]
                flux = sum(
                    abs(energies[i] - energies[i - 1])
                    for i in range(1, nf)
                )
                tot = sum(energies)
                mean_e = float((2 * tot * 1000000 + nf) // (2 * nf)) / 1e6
                rows.append((int(doc_id), nf, flux, mean_e))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_frames", "energy_flux", "mean_frame_energy",
                ],
            )

    # checkpoint before the global sort: the range exchange samples its
    # child, so the ordered output otherwise runs the Arrow kernel twice
    # (guide §2.4 - the phash-frame finding)
    return (
        bt.mapInPandas(analyze, out_schema)
        .localCheckpoint(eager=False)
        .orderBy("doc_id")
    )


QUERIES["mm_audio_energy_flux"] = audio_energy_flux

ORACLES["mm_audio_energy_flux"] = f"""
    WITH {_PAYLOAD_HEX_CTE},
    audio AS (
        SELECT doc_id, substring(hx, 9) AS body
        FROM p WHERE doc_id % 4 = 2
    ),
    samples AS (
        SELECT doc_id, i,
               CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS s
        FROM (
            SELECT doc_id, i,
                   ('0x' || substring(body, i * 4 - 3, 2))::BIGINT
                   + 256 * ('0x' || substring(body, i * 4 - 1, 2))::BIGINT
                       AS u
            FROM audio, unnest(range(1, len(body) // 4 + 1)) AS t(i)
        )
    ),
    lens AS (SELECT doc_id, count(*) AS len_samples FROM samples
             GROUP BY doc_id),
    framed2 AS (
        SELECT s.doc_id, (s.i - 1) // {AUDIO_FRAME_SAMPLES} AS f,
               CAST(sum(s.s * s.s) AS BIGINT) AS e
        FROM samples s JOIN lens l ON l.doc_id = s.doc_id
        WHERE s.i <= (l.len_samples // {AUDIO_FRAME_SAMPLES})
                     * {AUDIO_FRAME_SAMPLES}
        GROUP BY s.doc_id, (s.i - 1) // {AUDIO_FRAME_SAMPLES}
    ),
    flux AS (
        SELECT doc_id, count(*) AS nf,
               CAST(sum(abs(e - prev_e)) AS BIGINT) AS fl,
               CAST(sum(e) AS BIGINT) AS tot
        FROM (
            SELECT doc_id, e,
                   LAG(e) OVER (PARTITION BY doc_id ORDER BY f) AS prev_e
            FROM framed2) t
        GROUP BY doc_id
    )
    SELECT a.doc_id,
           CAST(coalesce(x.nf, 0) AS BIGINT) AS n_frames,
           CAST(coalesce(x.fl, 0) AS BIGINT) AS energy_flux,
           CASE WHEN coalesce(x.nf, 0) > 0 THEN
               CAST((2 * x.tot * 1000000 + x.nf) // (2 * x.nf) AS DOUBLE)
               / 1e6
           ELSE CAST(0.0 AS DOUBLE) END AS mean_frame_energy
    FROM audio a LEFT JOIN flux x ON x.doc_id = a.doc_id
    ORDER BY a.doc_id
"""


# ------------------------------------------------ phash near-dup pairs

PHASH_HAM_MAX = 4
PHASH_BANDS = 5          # 5 bands × 4 bits cover the 20-bit hash
_PHASH_BAND_BITS = 4
PHASH_N_PROBES = 50      # probe images: doc_id < 50


def phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash RADIUS SEARCH: for each probe image (the first
    PHASH_N_PROBES doc ids), every corpus image within Hamming
    distance ≤ PHASH_HAM_MAX of its phash — visual content lookup,
    the multimodal twin of the ANN family's query-driven shape (an
    all-pairs form at a 20-bit hash over a content-clustered corpus
    pairs quadratically; the probe-driven form is what an image-dedup
    service actually answers).

    Candidates come from banded hash buckets — LOSSLESS by pigeonhole:
    5 bands of 4 bits against ≤ 4 differing bits guarantees a clean
    band, so the bucket join proposes every qualifying pair; the exact
    ``bit_count(xor)`` verify filters false candidates.  Scale: probe
    band keys broadcast into the corpus-side index; fan-out is bounded
    by probes × bucket sizes.  The decode runs once in the shared
    Arrow kernel.
    """
    return _phash_pairs(_phash_frame(spark, sf_dir)).orderBy(
        "q_doc", "match_doc"
    )


def _phash_pairs(ph: DataFrame) -> DataFrame:
    """The verified radius-search pair frame over a (doc_id, phash)
    frame — unordered, so aggregate consumers (the threshold sweep)
    skip the global sort's sampling pass."""

    def banded(df):
        return df.select(
            "doc_id",
            "phash",
            F.explode(
                F.array(
                    *[
                        F.concat_ws(
                            "_",
                            F.lit(str(b)),
                            F.shiftright(
                                F.col("phash"), b * _PHASH_BAND_BITS
                            ).bitwiseAND(
                                F.lit((1 << _PHASH_BAND_BITS) - 1)
                            ).cast("string"),
                        )
                        for b in range(PHASH_BANDS)
                    ]
                )
            ).alias("bk"),
        )

    probes = banded(ph.filter(F.col("doc_id") < PHASH_N_PROBES))
    corpus = banded(ph)
    cand = (
        corpus.alias("c")
        .join(
            F.broadcast(probes).alias("q"),
            (F.col("q.bk") == F.col("c.bk"))
            & (F.col("q.doc_id") != F.col("c.doc_id")),
        )
        .select(
            F.col("q.doc_id").alias("q_doc"),
            F.col("c.doc_id").alias("match_doc"),
            F.col("q.phash").alias("p1"),
            F.col("c.phash").alias("p2"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.expr("bit_count(p1 ^ p2)").cast("long")
        )
        .filter(F.col("hamming") <= PHASH_HAM_MAX)
        .select("q_doc", "match_doc", "hamming")
    )


QUERIES["mm_phash_near_dup"] = phash_near_dup

ORACLES["mm_phash_near_dup"] = f"""
    WITH {_PHASH_CTE.lstrip()}
    SELECT a.doc_id AS q_doc, b.doc_id AS match_doc,
           CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
    FROM ph a JOIN ph b ON a.doc_id != b.doc_id
    WHERE a.doc_id < {PHASH_N_PROBES}
      AND bit_count(xor(a.phash, b.phash)) <= {PHASH_HAM_MAX}
    ORDER BY q_doc, match_doc
"""


# ------------------------------------------------- tile contrast map

TILE_GRID = 2  # 2x2 tile grid


def image_tile_contrast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-tile luminance/contrast map over DECODED pixels: the image is
    cut into a 2×2 tile grid and each tile reports pixel count, total
    luminance (channel-sum), mean level, and contrast (max−min) — the
    spatial-statistics pass behind borders/letterbox/watermark detection
    that a whole-image mean cannot see.

    Integer-exact end to end (channel sums, half-up device mean), so the
    oracle's recomputation from the source bytes — including the BMP
    bottom-up row flip — checks the decoder's spatial layout, not just
    its totals.  Shape: same Arrow decode scan as the phash, 4 bounded
    rows out per image.
    """
    import pandas as pd

    bt = bmp_table(spark, sf_dir).repartition(8, "doc_id")

    def tiles(batches: Iterator["object"]) -> Iterator["object"]:
        import numpy as np

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, pixels = decode_bmp(bytes(payload))
                arr = np.frombuffer(pixels, dtype=np.uint8).astype(
                    np.int64
                )
                s3 = arr.reshape(-1, 3).sum(axis=1)
                px = np.arange(len(s3))
                tile = (
                    (px // w) * TILE_GRID // h * TILE_GRID
                    + (px % w) * TILE_GRID // w
                )
                for t in range(TILE_GRID * TILE_GRID):
                    vals = s3[tile == t]
                    out.append(
                        (
                            int(doc_id),
                            t,
                            len(vals),
                            int(vals.sum()),
                            int(vals.max() - vals.min()),
                        )
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "tile", "n_px", "sum_s3", "contrast"
                ],
            )

    # pre-sort checkpoint (the wave-14 device): a global orderBy SAMPLES
    # its child for range bounds, so the decode kernel directly under it
    # would run twice per invocation
    raw = bt.mapInPandas(
        tiles,
        "doc_id long, tile long, n_px long, sum_s3 long, contrast long",
    ).localCheckpoint(eager=False)
    return raw.selectExpr(
        "doc_id",
        "tile",
        "n_px",
        "sum_s3",
        "CAST((2*sum_s3*1000000 + n_px) DIV (2*n_px) AS DOUBLE) / 1e6"
        " AS mean_s3",
        "contrast",
    ).orderBy("doc_id", "tile")


QUERIES["mm_image_tile_contrast"] = image_tile_contrast

ORACLES["mm_image_tile_contrast"] = f"""
    WITH {_BMP_SRC_CTE.lstrip()},
    p3 AS (
        SELECT doc_id,
               ({BMP_H - 1} - t.pxt // {BMP_W}) * {BMP_W}
                   + t.pxt % {BMP_W} AS px,
               s3
        FROM (
            SELECT doc_id, pos // 3 AS pxt, sum(v) AS s3
            FROM pix GROUP BY doc_id, pos // 3
        ) t
    ),
    tiled AS (
        SELECT doc_id,
               (px // {BMP_W}) * {TILE_GRID} // {BMP_H} * {TILE_GRID}
                   + (px % {BMP_W}) * {TILE_GRID} // {BMP_W} AS tile,
               s3
        FROM p3
    )
    SELECT doc_id, CAST(tile AS BIGINT) AS tile,
           CAST(count(*) AS BIGINT) AS n_px,
           CAST(sum(s3) AS BIGINT) AS sum_s3,
           CAST((2*sum(s3)*1000000 + count(*)) // (2*count(*))
                AS DOUBLE) / 1e6 AS mean_s3,
           CAST(max(s3) - min(s3) AS BIGINT) AS contrast
    FROM tiled GROUP BY doc_id, tile ORDER BY doc_id, tile
"""


# ------------------------------------------------ audio silence runs

AUDIO_QUIET_T = 20000  # |sample| below this counts as quiet
AUDIO_MIN_RUN = 4      # runs at least this long are reported


def audio_silence_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quiet-segment detection over the PCM16 audio slice: count samples
    under the amplitude threshold, the number of quiet RUNS of at least
    AUDIO_MIN_RUN consecutive samples, and the longest run — the
    silence/VAD-style segmentation an audio curation pass uses to drop
    dead air and split long recordings.

    The decode is the same real stdlib PCM16 path as
    [[mm_audio_pcm_stats]]; run-length logic is numpy in the Arrow
    kernel and gaps-and-islands SQL in the oracle — integer-exact, so
    the hash match certifies the run segmentation itself.
    """
    import pandas as pd

    from pyspark.sql import types as T

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % len(_MAGICS) == 2
    )
    bt = docs.select("doc_id", _planted_payload().alias("payload"))
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("n_quiet", T.LongType()),
            T.StructField("n_runs", T.LongType()),
            T.StructField("longest_run", T.LongType()),
        ]
    )

    def detect(batches):
        import struct

        import numpy as np

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                body = bytes(payload)[4:]  # drop the RIFF magic
                n = len(body) // 2
                if n == 0:
                    out.append((doc_id, 0, 0, 0, 0))
                    continue
                s = np.array(
                    struct.unpack(f"<{n}h", body[: 2 * n]), dtype=np.int64
                )
                quiet = np.abs(s) < AUDIO_QUIET_T
                # run-length encode the quiet mask
                edges = np.flatnonzero(
                    np.diff(np.concatenate(([0], quiet.view(np.int8), [0])))
                )
                starts, ends = edges[::2], edges[1::2]
                lens = ends - starts
                big = lens[lens >= AUDIO_MIN_RUN]
                out.append(
                    (
                        doc_id,
                        n,
                        int(quiet.sum()),
                        len(big),
                        int(lens.max()) if len(lens) else 0,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "n_samples",
                    "n_quiet",
                    "n_runs",
                    "longest_run",
                ],
            )

    # checkpoint before the global sort: the range exchange samples its
    # child, so the ordered output otherwise runs the Arrow kernel twice
    # (guide §2.4 - the phash-frame finding)
    return (
        bt.mapInPandas(detect, schema)
        .localCheckpoint(eager=False)
        .orderBy("doc_id")
    )


QUERIES["mm_audio_silence_runs"] = audio_silence_runs

ORACLES["mm_audio_silence_runs"] = f"""
    WITH {_PAYLOAD_HEX_CTE},
    audio AS (
        SELECT doc_id, substring(hx, 9) AS body
        FROM p WHERE doc_id % 4 = 2
    ),
    samples AS (
        SELECT doc_id, i,
               CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS s
        FROM (
            SELECT doc_id, i,
                   ('0x' || substring(body, i * 4 - 3, 2))::BIGINT
                   + 256 * ('0x' || substring(body, i * 4 - 1, 2))::BIGINT
                       AS u
            FROM audio, unnest(range(1, len(body) // 4 + 1)) AS t(i)
        )
    ),
    quiet AS (
        SELECT doc_id, i FROM samples WHERE abs(s) < {AUDIO_QUIET_T}
    ),
    isl AS (
        SELECT doc_id,
               i - row_number() OVER (PARTITION BY doc_id ORDER BY i)
                   AS g
        FROM quiet
    ),
    runs AS (
        SELECT doc_id, g, count(*) AS len FROM isl GROUP BY 1, 2
    ),
    per AS (
        SELECT doc_id,
               CAST(sum(CASE WHEN len >= {AUDIO_MIN_RUN}
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_runs,
               CAST(max(len) AS BIGINT) AS longest_run,
               CAST(sum(len) AS BIGINT) AS n_quiet
        FROM runs GROUP BY doc_id
    ),
    base AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_samples
        FROM samples GROUP BY doc_id
    )
    SELECT b.doc_id, b.n_samples,
           COALESCE(p2.n_quiet, 0) AS n_quiet,
           COALESCE(p2.n_runs, 0) AS n_runs,
           COALESCE(p2.longest_run, 0) AS longest_run
    FROM base b LEFT JOIN per p2 ON b.doc_id = p2.doc_id
    ORDER BY b.doc_id
"""


# ------------------------------------- phash radius sweep

#: Radii swept; bounded by PHASH_HAM_MAX — the banded candidate
#: generation is pigeonhole-lossless only up to the band guarantee, so
#: the sweep prices exactly the radii the index can serve losslessly.
PHASH_SWEEP_RADII = (0, 1, 2, 3, 4)


def phash_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Visual-dedup radius tuning curve: for every Hamming radius the
    banded phash index serves losslessly (0..PHASH_HAM_MAX), the match
    count and the share of probe images with at least one match — the
    knob table behind "how similar is a duplicate image?" (radius 0 is
    re-encodes only; each +1 admits more aggressive crops/re-
    compressions AND more false matches; this is the evidence one
    picks the production radius with).

    Scale shape: rides [[mm_phash_near_dup]]'s verified pair frame
    (bounded banded candidates, decode in the shared Arrow kernel) —
    the sweep itself is ONE conditional aggregate over the pair frame
    stacked by a 1-row inline, plus the 1-row probe count broadcast.
    """
    # ONE decode: the checkpointed phash frame feeds the pair build
    # (both band sides) AND the probe count; the unordered pair frame
    # skips mm_phash_near_dup's global sort (this consumer aggregates)
    ph = _phash_frame(spark, sf_dir)
    pairs = _phash_pairs(ph)
    probes = ph.filter(F.col("doc_id") < PHASH_N_PROBES).agg(
        F.count(F.lit(1)).alias("n_probes")
    )
    aggs = []
    for r in PHASH_SWEEP_RADII:
        aggs.append(
            F.sum(F.when(F.col("hamming") <= r, 1).otherwise(0)).alias(
                f"m{r}"
            )
        )
        aggs.append(
            F.countDistinct(
                F.when(F.col("hamming") <= r, F.col("q_doc"))
            ).alias(f"p{r}")
        )
    one = pairs.agg(*aggs)
    rows = ", ".join(
        f"named_struct('r', {r}L, 'm', m{r}, 'p', p{r})"
        for r in PHASH_SWEEP_RADII
    )
    return (
        one.crossJoin(F.broadcast(probes))
        .selectExpr("n_probes", f"inline(array({rows}))")
        .selectExpr(
            "CAST(r AS BIGINT) AS radius",
            "CAST(m AS BIGINT) AS n_pairs",
            "CAST(p AS BIGINT) AS probes_matched",
            "(2 * p * 1000000 + n_probes) DIV (2 * n_probes)"
            " AS probes_matched_ppm",
        )
        .orderBy("radius")
    )


QUERIES["mm_phash_threshold_sweep"] = phash_threshold_sweep

_PHASH_SWEEP_CELLS = " UNION ALL ".join(
    f"""SELECT {r} AS r,
        sum(CASE WHEN hamming <= {r} THEN 1 ELSE 0 END) AS m,
        count(DISTINCT CASE WHEN hamming <= {r} THEN q_doc END) AS p
        FROM pairs"""
    for r in PHASH_SWEEP_RADII
)

ORACLES["mm_phash_threshold_sweep"] = f"""
    WITH {_PHASH_CTE.lstrip()},
    pairs AS (
        SELECT a.doc_id AS q_doc,
               CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT)
                   AS hamming
        FROM ph a JOIN ph b ON a.doc_id != b.doc_id
        WHERE a.doc_id < {PHASH_N_PROBES}
          AND bit_count(xor(a.phash, b.phash)) <= {PHASH_HAM_MAX}
    ),
    probes AS (
        SELECT count(*) AS n_probes FROM ph
        WHERE doc_id < {PHASH_N_PROBES}
    )
    SELECT CAST(r AS BIGINT) AS radius,
           CAST(m AS BIGINT) AS n_pairs,
           CAST(p AS BIGINT) AS probes_matched,
           CAST((2 * p * 1000000 + n_probes) // (2 * n_probes)
                AS BIGINT) AS probes_matched_ppm
    FROM ({_PHASH_SWEEP_CELLS}), probes
    ORDER BY radius
"""


# ---------------------------------------------- REAL image resize (NN)

RESIZE_W = 3
RESIZE_H = 2


def image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL nearest-neighbor image resize — the op the brief enumerates
    between decode and frame-sample, and the one place this family
    still leaned on a declared stub (``resize_image_stub`` remains the
    documented boundary for PIL-grade resampling; nearest-neighbor
    needs nothing beyond the stdlib decoder + numpy indexing, so the
    Spark-side plumbing AND the pixel math are real here).  Each BMP
    payload is decoded (``decode_bmp``), the (h, w, 3) array is
    index-mapped ``src = (dst * src_dim) DIV dst_dim`` per axis — the
    standard floor-NN convention — and the resized BGR bytes ship out
    as hex plus their integer-exact mean.

    Shape: Arrow-batched ``mapInPandas``, O(1) work per image, schema
    declared up front — identical contract to ``feature_extract``; at
    100 TB this is a pure map stage with no shuffle at all.  The
    oracle recomputes the same bytes from the generator formula (text
    cycled into bottom-up BMP rows) without any decoder — which is
    exactly what makes the decode+resize falsifiable."""
    import pandas as pd

    bt = bmp_table(spark, sf_dir).repartition(8, "doc_id")
    schema = (
        "doc_id long, src_w long, src_h long, dst_w long, dst_h long,"
        " resized_hex string, mean_px double"
    )

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import numpy as np

        def nn(payload: bytes):
            w, h, pixels = decode_bmp(bytes(payload))
            arr = np.frombuffer(pixels, dtype=np.uint8).reshape(h, w, 3)
            rows = (np.arange(RESIZE_H) * h) // RESIZE_H
            cols = (np.arange(RESIZE_W) * w) // RESIZE_W
            out = arr[rows][:, cols, :].tobytes()
            s, n = int(sum(out)), len(out)
            return (
                w,
                h,
                RESIZE_W,
                RESIZE_H,
                out.hex(),
                (2 * s * 1000000 + n) // (2 * n) / 1e6,
            )

        for pdf in batches:
            res = pdf["payload"].map(nn)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "src_w": res.map(lambda t: t[0]),
                    "src_h": res.map(lambda t: t[1]),
                    "dst_w": res.map(lambda t: t[2]),
                    "dst_h": res.map(lambda t: t[3]),
                    "resized_hex": res.map(lambda t: t[4]),
                    "mean_px": res.map(lambda t: t[5]),
                }
            )

    # checkpoint before the global sort: the range exchange samples its
    # child, so the ordered output otherwise runs the Arrow kernel twice
    # (guide §2.4 - the phash-frame finding)
    return (
        bt.mapInPandas(run, schema)
        .localCheckpoint(eager=False)
        .orderBy("doc_id")
    )


QUERIES["mm_image_resize"] = image_resize


def _resize_oracle() -> str:
    # dst (r, c, k) -> source byte position in the cycled-text stream:
    # reading-order src row (dst_r * H) DIV RH is packed bottom-up, so
    # packed row = H-1-row; pos = packed_row * ROW_BYTES + col*3 + k.
    terms = []
    for dr in range(RESIZE_H):
        sr = (dr * BMP_H) // RESIZE_H
        pr = BMP_H - 1 - sr
        for dc in range(RESIZE_W):
            sc = (dc * BMP_W) // RESIZE_W
            for k in range(3):
                terms.append(pr * _BMP_ROW_BYTES + sc * 3 + k)
    hexcat = " || ".join(f"printf('%02x', p{i})" for i in range(len(terms)))
    sumcat = " + ".join(f"p{i}" for i in range(len(terms)))
    cols = ", ".join(
        f"ascii(substring(s, {pos + 1}, 1)) AS p{i}"
        for i, pos in enumerate(terms)
    )
    n = len(terms)
    return f"""
    WITH src AS (
        SELECT doc_id,
               substring(repeat(text,
                         CAST({_BMP_SRC_BYTES} / length(text) AS INT) + 1),
                         1, {_BMP_SRC_BYTES}) AS s
        FROM documents WHERE length(text) > 0
    ),
    b AS (SELECT doc_id, {cols} FROM src)
    SELECT doc_id,
           CAST({BMP_W} AS BIGINT) AS src_w,
           CAST({BMP_H} AS BIGINT) AS src_h,
           CAST({RESIZE_W} AS BIGINT) AS dst_w,
           CAST({RESIZE_H} AS BIGINT) AS dst_h,
           {hexcat} AS resized_hex,
           CAST((2 * CAST({sumcat} AS BIGINT) * 1000000 + {n})
                // (2 * {n})
                AS DOUBLE) / 1e6 AS mean_px
    FROM b ORDER BY doc_id
    """


ORACLES["mm_image_resize"] = _resize_oracle()
