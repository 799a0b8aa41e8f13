"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode step itself is STUBBED (this container ships no image/audio
libs — see ``decode_image_stub``); what's real and tested is everything
Spark-side: the schema contract, the Pandas-UDF batch shape, partitioning,
and the metadata path. A production deployment swaps ``_fake_decode`` for
PIL/torchaudio/ffmpeg calls without touching the plan.

The synthetic ``documents`` table stands in for a blob store: we treat the
UTF-8 text bytes as the binary payload. Metadata extraction (byte length,
content digest) is pure SQL and oracle-checked; the mapInPandas feature
extractor is deterministic (rows-only checked) so its plumbing is testable.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
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
    libraries. ``_fake_decode`` below provides the deterministic stand-in
    used to exercise the distributed plumbing.
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


def _fake_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in 'feature extractor': 4 moments of the byte
    histogram. Stable across runs/engines; cheap; shape-compatible with a
    real embedding."""
    if not payload:
        return [0.0, 0.0, 0.0, 0.0]
    n = float(len(payload))
    s = sum(payload)
    mean = s / n
    var = sum((b - mean) ** 2 for b in payload) / n
    mn, mx = float(min(payload)), float(max(payload))
    return [_round_half_up(mean), _round_half_up(var), mn, mx]


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


def feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mapInPandas decode/feature path: Arrow batches in, one feature
    row per payload out. This is the pattern a real image/audio pipeline
    uses — batch-at-a-time Python, schema declared up front."""
    bt = binary_table(spark, sf_dir).repartition(8, "doc_id")

    def extract(batches: Iterator["object"]) -> Iterator["object"]:
        import numpy as np
        import pandas as pd

        import math

        def r6(x: float) -> float:
            # SQL ROUND (half away from zero), matching Spark/DuckDB —
            # Python round() is half-to-even and flips .5 boundaries
            return math.floor(abs(x) * 1e6 + 0.5) / 1e6 * (1 if x >= 0 else -1)

        def decode_batch(payload: bytes) -> list[float]:
            # vectorized version of _fake_decode
            arr = np.frombuffer(payload, dtype=np.uint8)
            if arr.size == 0:
                return [0.0, 0.0, 0.0, 0.0]
            mean = arr.sum() / arr.size
            var = float(np.square(arr - mean).sum()) / arr.size
            return [
                r6(float(mean)),
                r6(var),
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
                    "feature": payloads.map(decode_batch),
                }
            )

    return bt.mapInPandas(extract, FEATURE_SCHEMA)


def feature_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over extracted features — forces the full mapInPandas
    path and reduces to a deterministic, engine-independent summary."""
    feats = feature_extract(spark, sf_dir)
    return (
        feats.select(
            "doc_id",
            "byte_len",
            F.round(F.element_at("feature", 1), 6).alias("mean_byte"),
        )
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

    return bt.mapInPandas(sample, schema).orderBy("doc_id")


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
    operator. Shape: hex-decode → explode byte pairs → one (doc, byte)
    groupBy with map-side combine; state ≤ 256 rows per doc."""
    from ..tables import fanout_small_scan

    docs = fanout_small_scan(load_table(spark, sf_dir, "documents"), spark)
    payload = _planted_payload()
    hx = F.lower(F.hex(payload))
    pairs = F.expr(
        "transform(sequence(1, length(__hx) DIV 2), "
        "i -> substring(__hx, i * 2 - 1, 2))"
    )
    b = (
        docs.select("doc_id", hx.alias("__hx"))
        # Spark's sequence(1, 0) is the DESCENDING [1, 0], not empty —
        # an empty payload would fabricate two ''-byte rows while the
        # oracle's range(1, 1) correctly yields none; drop empties first
        .filter(F.length("__hx") > 0)
        .select("doc_id", F.explode(pairs).alias("byte"))
        .groupBy("doc_id", "byte")
        .agg(F.count(F.lit(1)).alias("c"))
    )
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
    "mm_frame_sample": frame_sample,
    "mm_format_sniff": format_sniff,
    "mm_byte_entropy": byte_entropy,
}

ORACLES = {
    "mm_metadata_extract": """
        SELECT doc_id,
               octet_length(CAST(text AS BLOB)) AS byte_len,
               md5(text) AS digest,
               'text/plain' AS mime
        FROM documents ORDER BY doc_id
    """,
    # mm_feature_summary: mean byte value of the UTF-8 payload — the fake
    # decode is plain arithmetic, so even the Pandas-UDF path has an
    # oracle. The corpus is ASCII, so byte value == codepoint.
    "mm_feature_summary": """
        SELECT doc_id, length(text) AS byte_len,
               ROUND(AVG(ascii(c)), 6) AS mean_byte
        FROM (SELECT doc_id, text, unnest(string_split(text, '')) AS c
              FROM documents)
        GROUP BY doc_id, length(text) ORDER BY doc_id
    """,
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
