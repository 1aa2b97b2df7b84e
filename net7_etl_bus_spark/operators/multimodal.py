"""Multimodal (image/audio/video) column plumbing (BASELINE.json north
star: "multimodal columns").

Media travels as opaque ``binary`` columns with a typed metadata
struct; decode / feature-extraction / resize / frame-sampling run as
Arrow-batched ``mapInPandas`` stages. The decode kernels themselves
need codec libraries (PIL/ffmpeg/torchaudio) that are NOT in this
container — they are STUBBED behind ``require_real_codecs()`` with a
deterministic fake keyed on the content hash, so the Spark-side
plumbing (schema, batch shape, partitioning, UDF signatures, null
passthrough) is real and fully tested while the kernel swap is a
one-function change in production.

Scale notes baked into the design:
* binary payloads stay in executor memory only per-batch (Arrow
  record batches); never collected, never shuffled unless the caller
  repartitions — feature extraction is a narrow map.
* metadata is a separate small struct column so metadata-only queries
  prune the (huge) binary column at the parquet scan.
* ``spark.sql.files.maxPartitionBytes`` + per-file row-group layout
  govern batch memory; features (small arrays) are what downstream
  joins/aggregations touch.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), nullable=False),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType()),
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("duration_ms", IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 8

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), nullable=False),
        StructField("media_type", StringType()),
        StructField("content_sha256", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)


class CodecsUnavailableError(NotImplementedError):
    """Raised when a real decode is requested in an environment
    without codec libraries."""


def require_real_codecs() -> None:
    """Gate for the real decode path. Production installs PIL/ffmpeg
    and flips REAL_CODECS; this container never does."""
    raise CodecsUnavailableError(
        "image/audio codecs are not installed in this environment; "
        "use deterministic_fake=True (the default) for the plumbing path"
    )


def _fake_feature(content: bytes) -> list[float]:
    """Deterministic stand-in for an embedding: 8 doubles derived from
    the content digest. Stable across runs/machines, so tests can pin
    golden values."""
    digest = hashlib.sha256(content or b"").digest()
    return [
        int.from_bytes(digest[4 * i : 4 * i + 4], "big") / 2**32 for i in range(FEATURE_DIM)
    ]


def synthesize_media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a media table from the documents fixture: the text bytes
    stand in for encoded image payloads. Exercises the exact
    binary-column read/write path real media uses."""
    from ..data import load_table

    d = load_table(spark, sf_dir, "documents")
    # A media record's key is REQUIRED (FEATURES_SCHEMA declares
    # media_id non-nullable; the Arrow writer hard-fails on a null in
    # a non-nullable field, and the frame-sampler kernel would crash
    # on int(None) — both fuzz-found). Same contract as the dedup and
    # CDC state keys.
    d = d.filter(F.col("doc_id").isNotNull())
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.encode("text", "UTF-8").alias("content"),
        F.struct(
            F.lit("application/x-fake").alias("mime"),
            (F.col("n_chars") % 1920).cast("int").alias("width"),
            (F.col("n_chars") % 1080).cast("int").alias("height"),
            F.when(  # try-cast posture: int32 overflow -> NULL (Spark
                # wraps silently, a strict engine errors; fuzz-found)
                F.abs(F.col("n_chars").cast("bigint") * 10) < F.lit(2**31),
                (F.col("n_chars").cast("bigint") * 10).cast("int"),
            ).alias("duration_ms"),
        ).alias("meta"),
    )


def extract_features(
    media: DataFrame, deterministic_fake: bool = True, batch_hint: int | None = None
) -> DataFrame:
    """Decode + feature-extract as a narrow mapInPandas stage.

    Real path: decode content (PIL/ffmpeg), run the feature model per
    Arrow batch. Fake path (this container): digest-derived features —
    identical plumbing, deterministic outputs. Null/empty content
    passes through with a null feature (per-row tolerance, same policy
    as the enrichment stage).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not deterministic_fake:
            require_real_codecs()
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "content_sha256": [
                        hashlib.sha256(c or b"").hexdigest() if c is not None else None
                        for c in pdf["content"]
                    ],
                    "n_bytes": [len(c) if c is not None else None for c in pdf["content"]],
                    "feature": [
                        _fake_feature(c) if c is not None else None for c in pdf["content"]
                    ],
                }
            )
            yield out

    return media.mapInPandas(run, FEATURES_SCHEMA)


def sample_frames(
    media: DataFrame, every_ms: int = 1000, deterministic_fake: bool = True
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame
    (media_id, frame_no, frame_sha256). The real kernel seeks the
    container stream; the fake derives per-frame digests from
    sha256(content + b"-" + frame_no) — same fan-out shape, same
    schema, and SQL-expressible so the oracle can check the plumbing."""
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_no", IntegerType()),
            StructField("frame_sha256", StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not deterministic_fake:
            require_real_codecs()
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                if r["media_type"] != "video" or r["content"] is None:
                    continue
                n_frames = max(1, int(r["meta"]["duration_ms"] or 0) // every_ms)
                for k in range(min(n_frames, 16)):
                    h = hashlib.sha256(
                        bytes(r["content"]) + b"-" + str(k).encode()
                    ).hexdigest()
                    rows.append((int(r["media_id"]), k, h))
            yield pd.DataFrame(rows, columns=["media_id", "frame_no", "frame_sha256"])

    return media.mapInPandas(run, schema)


# --- registry entries -------------------------------------------------
# The synthesized media table derives from `documents` (text bytes as
# payload), so everything except the fake feature vector is
# SQL-expressible and the mapInPandas plumbing gets a full oracle
# check, not just a rows-only one.

from ..plans.registry import register  # noqa: E402

_MEDIA_TYPE_SQL = """
CASE WHEN doc_id % 3 = 0 THEN 'image'
     WHEN doc_id % 3 = 1 THEN 'audio'
     ELSE 'video' END
"""


@register(
    "mm_features",
    oracle=f"""
    SELECT doc_id AS media_id,
           {_MEDIA_TYPE_SQL} AS media_type,
           sha256(text) AS content_sha256,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
    FROM documents
    WHERE doc_id IS NOT NULL
    """,
)
def mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column decode/feature plumbing, oracle-checked: the
    mapInPandas stage's hash + byte-count outputs must match DuckDB
    recomputing them from the source text. The feature vector column
    is exercised by tests/test_multimodal.py (digest-derived, not SQL)."""
    media = synthesize_media_from_documents(spark, sf_dir)
    return extract_features(media).select(
        "media_id", "media_type", "content_sha256", "n_bytes"
    )


@register(
    "mm_frame_sample",
    oracle=f"""
    SELECT media_id, CAST(k AS INT) AS frame_no,
           sha256(text || '-' || k) AS frame_sha256
    FROM (
      SELECT doc_id AS media_id, text,
             unnest(range(0, least(greatest(1, COALESCE(CASE WHEN abs(CAST(n_chars AS BIGINT) * 10) < 2147483648 THEN CAST(n_chars * 10 AS INT) END, 0) // 1000), 16))) AS k
      FROM documents
      WHERE doc_id % 3 = 2 AND text IS NOT NULL
    )
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling fan-out (1 row -> up to 16 frames),
    oracle-checked end to end: per-frame digests recomputed by DuckDB
    from (text, frame_no) must match the mapInPandas kernel's output."""
    media = synthesize_media_from_documents(spark, sf_dir)
    return sample_frames(media, every_ms=1000)


# --- perceptual-hash near-dup detection -------------------------------

_PHASH_ROWS = 4
_PHASH_COLS = 4  # 4x4 "pixel" grid -> 4 rows x 3 horizontal gradients


def _fake_pixels(content: bytes) -> list[int]:
    """Deterministic stand-in for a decoded, downscaled grayscale
    image: the first 16 digest bytes as a 4x4 grid. The real kernel
    decodes + resizes with PIL; only this function changes."""
    digest = hashlib.sha256(content or b"").digest()
    return list(digest[: _PHASH_ROWS * _PHASH_COLS])


def _dhash(pixels: list[int]) -> int:
    """Difference hash: one bit per horizontal gradient, row-major."""
    bits = 0
    idx = 0
    for r in range(_PHASH_ROWS):
        for c in range(_PHASH_COLS - 1):
            if pixels[r * _PHASH_COLS + c] > pixels[r * _PHASH_COLS + c + 1]:
                bits |= 1 << idx
            idx += 1
    return bits


def _phash_sql() -> str:
    """DuckDB twin: recompute the dHash from the sha256 hex digest —
    byte i is hex pair [2i+1, 2i+2]."""

    def byte(i: int) -> str:
        return f"CAST(concat('0x', substring(sha256(text), {2 * i + 1}, 2)) AS INT)"

    terms = []
    idx = 0
    for r in range(_PHASH_ROWS):
        for c in range(_PHASH_COLS - 1):
            a = byte(r * _PHASH_COLS + c)
            b = byte(r * _PHASH_COLS + c + 1)
            terms.append(f"(CASE WHEN {a} > {b} THEN {1 << idx} ELSE 0 END)")
            idx += 1
    return " + ".join(terms)


@register(
    "mm_phash_dedup",
    oracle=f"""
    WITH hashed AS (
      SELECT doc_id AS media_id,
             CASE WHEN text IS NULL THEN NULL
                  ELSE CAST({_phash_sql()} AS BIGINT) END AS phash
      FROM documents WHERE doc_id IS NOT NULL)
    SELECT phash,
           CAST(COUNT(*) AS BIGINT) AS n_media,
           MIN(media_id) AS keeper_id
    FROM hashed GROUP BY phash
    """,
)
def mm_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash (dHash) near-duplicate detection for media: the
    hash is computed INSIDE the decode stage (mapInPandas, beside the
    codec — resized pixels never leave the Python worker), and
    deduplication is then a plain JVM hash-groupBy on the 64-bit-max
    hash — the image-dedup shape used on LAION-scale corpora (crops,
    re-encodes, and watermarks of one image share a dHash; byte hashes
    don't).

    The fake decode derives its 4x4 "pixel" grid from the content
    digest, so the oracle recomputes the exact same gradients from
    sha256 hex in SQL — kernel plumbing AND dedup are value-checked,
    not just row-counted. Production swaps _fake_pixels for
    PIL decode+resize; nothing else changes.

    Scale shape: narrow Arrow-batched map (no shuffle of pixels or
    payloads), then a groupBy carrying (8-byte hash, media_id). For
    Hamming-distance-k matching, group by rotated hash prefixes like
    dedup_simhash — same plumbing.
    """
    media = synthesize_media_from_documents(spark, sf_dir)

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("phash", LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "phash": [
                        _dhash(_fake_pixels(bytes(c))) if c is not None else None
                        for c in pdf["content"]
                    ],
                }
            )

    hashed = media.mapInPandas(run, schema)
    return hashed.groupBy("phash").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_media"),
        F.min("media_id").alias("keeper_id"),
    )
