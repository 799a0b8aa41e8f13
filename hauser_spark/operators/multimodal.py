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


QUERIES = {
    "mm_metadata_extract": metadata_extract,
    "mm_feature_summary": feature_summary,
    "mm_frame_sample": frame_sample,
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
