"""Multimodal column plumbing: image/audio/video as opaque binary.

The Spark-side machinery (schemas, partition-aware batching, Arrow UDF
signatures, metadata typing) is real and tested; the codec step itself
is STUBBED because no image/audio libraries exist in this container —
``decode_images(..., codec="real")`` raises NotImplementedError, and
``codec="fake"`` produces a deterministic hash-derived feature vector
with the exact shapes/dtypes a real decoder would emit, so downstream
operators (dedup, ANN over the features) are fully exercisable.

Media schema convention:

    media(media_id: long, kind: string ('image'|'audio'|'video'),
          payload: binary, meta: struct<width:int, height:int,
          sample_rate:int, n_frames:int, mime:string>)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

META_TYPE = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("mime", T.StringType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", META_TYPE, True),
    ]
)


def synthetic_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic opaque-binary media table (no external data):
    payload bytes derive from sha2 of the id — stable across runs.

    ``kind`` is ``id % 3`` (not a seeded hash) so an ANSI-SQL oracle
    can reproduce the table exactly (``CASE media_id % 3 ...``)."""
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
    )
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        kinds.alias("kind"),
        F.to_binary(F.sha2(F.concat(F.lit("payload"), F.col("id").cast("string")), 256), F.lit("hex")).alias(
            "payload"
        ),
        F.struct(
            (F.pmod(F.xxhash64("id", F.lit(seed + 1)), F.lit(1920)) + 1).cast("int").alias("width"),
            (F.pmod(F.xxhash64("id", F.lit(seed + 2)), F.lit(1080)) + 1).cast("int").alias("height"),
            F.lit(16_000).alias("sample_rate"),
            (F.pmod(F.xxhash64("id", F.lit(seed + 3)), F.lit(300)) + 1).cast("int").alias("n_frames"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("meta"),
    )
    return df


_FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload_sha", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def extract_features(df: DataFrame, codec: str = "fake") -> DataFrame:
    """Decode + feature-extract.

    codec="real" is the mapInPandas (Arrow-batched) decode skeleton a
    real PIL/torchaudio/ffmpeg codec would plug into — it raises
    NotImplementedError AT EXECUTION (no media libs in this container)
    so the batch flow, schema, and UDF signature stay exercised by
    tests. codec="fake" emits a deterministic 16-dim feature vector
    derived from the payload hash as PURE Column expressions — fully
    codegen'd JVM, no Python workers, no fresh-Arrow allocation (the
    round-3 bench recorded this path at ~100× its clean cost purely
    from host page-fault-path collapse hitting Arrow buffer allocation;
    a hash chain never needed Python in the first place).
    """
    if codec not in ("real", "fake"):
        raise ValueError(f"unknown codec {codec!r}")

    if codec == "real":

        def compute(it):
            for pdf in it:  # noqa: B007 — skeleton for a real decoder
                raise NotImplementedError(
                    "real media decoding needs PIL/torchaudio/ffmpeg — "
                    "not available in this container; use codec='fake'"
                )
                yield pdf  # pragma: no cover — keeps this a generator

        return df.select("media_id", "kind", "payload").mapInPandas(
            compute, schema=FEATURES_SCHEMA
        )

    # fake codec, JVM-side. Hash the lowercase-hex rendering of the
    # payload (not raw bytes): the chain stays inside valid UTF-8 so an
    # ANSI-SQL oracle (sha256(lower(hex(payload)))) reproduces it
    # exactly. Feature i is the i-th LITTLE-ENDIAN uint16 of the digest
    # scaled to [0,1] — byte pair (2i, 2i+1) = hex chars (4i..4i+2,
    # 4i+2..4i+4), low byte first. Double-divide-then-cast-to-float is
    # bit-identical to numpy float32(v)/float32(65535) for all 65536
    # lattice values (verified exhaustively), and round(f*65535)
    # recovers v exactly — features_fingerprint stays sha256(digest).
    sha = F.sha2(F.lower(F.hex(F.coalesce(F.col("payload"), F.lit(b"")))), 256)
    dig = F.col("payload_sha")
    feats = F.array(
        *[
            (
                (
                    F.conv(F.substring(dig, 4 * i + 1, 2), 16, 10).cast("double")
                    + F.conv(F.substring(dig, 4 * i + 3, 2), 16, 10).cast("double")
                    * 256.0
                )
                / 65535.0
            ).cast("float")
            for i in range(_FEATURE_DIM)
        ]
    )
    return (
        df.select("media_id", "kind", sha.alias("payload_sha"))
        .withColumn("features", feats)
    )


@F.pandas_udf(T.StringType())
def features_fingerprint(features: pd.Series) -> pd.Series:
    """Stable scalar digest of a float feature vector (Arrow-batched).

    Reconstructs the quantised uint16 lattice the fake codec emits
    (round(f * 65535)), renders it as lowercase hex, and sha256-hashes
    that string — so the digest is exact (no float-formatting drift)
    and an ANSI-SQL oracle can reproduce it. Lets array-valued feature
    columns flow through scalar-only comparison harnesses."""

    def _fp(vec) -> str:
        arr = np.asarray(vec, dtype=np.float64)
        quantised = np.round(arr * 65535.0).astype("<u2").tobytes()
        return hashlib.sha256(quantised.hex().encode()).hexdigest()

    return features.map(_fp)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", META_TYPE),
    ]
)


def resize_images(
    df: DataFrame, width: int, height: int, codec: str = "fake"
) -> DataFrame:
    """Resize image payloads via mapInPandas (Arrow-batched).

    codec="real" is a stub (needs PIL — not in this container);
    codec="fake" emits a deterministic payload of width*height//256
    hash-cycled bytes with the metadata updated to the target size, so
    the batch flow, binary round-trip, and metadata typing are real.
    """
    if codec not in ("real", "fake"):
        raise ValueError(f"unknown codec {codec!r}")

    def compute(it):
        for pdf in it:
            if codec == "real":
                raise NotImplementedError(
                    "real image resize needs PIL — use codec='fake'"
                )
            outs = []
            size = max(width * height // 256, 16)
            for payload in pdf["payload"]:
                digest = hashlib.sha256(bytes(payload or b"")).digest()
                reps = -(-size // len(digest))
                outs.append((digest * reps)[:size])
            meta = pd.DataFrame(
                {
                    "width": np.full(len(pdf), width, dtype=np.int32),
                    "height": np.full(len(pdf), height, dtype=np.int32),
                    "sample_rate": pdf["meta"].map(lambda m: m["sample_rate"]),
                    "n_frames": pdf["meta"].map(lambda m: m["n_frames"]),
                    "mime": pdf["meta"].map(lambda m: m["mime"]),
                }
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "payload": outs,
                    "meta": meta.to_dict("records"),
                }
            )

    return df.filter(F.col("kind") == "image").select(
        "media_id", "payload", "meta"
    ).mapInPandas(compute, schema=RESIZED_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling plan: one row per sampled frame index —
    pure Column math on metadata (the decode itself is the stubbed
    step above). Demonstrates explode-based fan-out partitioning."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0), F.greatest(F.col("meta.n_frames") - 1, F.lit(0)), F.lit(every_n)
                )
            ).alias("frame_idx"),
        )
    )
