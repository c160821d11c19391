"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas
functions over ``mapInPandas``.

The decode step is STUBBED (image/audio libraries are not in this
container): ``decode_image_stub`` produces a deterministic fake
"decoded" feature row so the Spark-side plumbing — schema, batch
shape, partitioning, UDF signature — is real and tested. Swap the
stub body for PIL/librosa/etc. in a real deployment; everything else
stands.

Scale notes: binary payloads ride in parquet binary columns; the
``mapInPandas`` path streams Arrow record batches (no per-row Python
round-trip), and ``spark.sql.files.maxPartitionBytes`` bounds batch
memory. Metadata-only transforms (type sniffing, byte stats) stay
JVM-side.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Magic-byte prefixes for cheap JVM-side type sniffing (hex strings).
_MAGIC = {
    "png": "89504E47",
    "jpeg": "FFD8FF",
    "gif": "47494638",
    "wav": "52494646",  # RIFF
    "mp3": "494433",  # ID3
}


def attach_binary_metadata(df: DataFrame, bin_col: str = "payload") -> DataFrame:
    """JVM-side metadata over an opaque binary column: byte length,
    md5 digest, and magic-byte media-type sniff. No Python involved."""
    col = F.col(bin_col)
    hexhead = F.upper(F.hex(F.substring(col, 1, 8)))
    sniff = F.lit("unknown")
    for name, magic in reversed(_MAGIC.items()):
        sniff = F.when(hexhead.startswith(magic), F.lit(name)).otherwise(sniff)
    return (
        df.withColumn("n_bytes", F.length(col))
        .withColumn("content_digest", F.md5(col))
        .withColumn("media_type", sniff)
    )


DECODED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, int, list[float]]:
    """Deterministic fake decode: dimensions and an 8-dim feature
    derived from the byte content. Replace with a real decoder
    (PIL.Image.open etc.) outside this container."""
    n = len(payload)
    width = 16 + (n % 64)
    height = 16 + ((n // 64) % 64)
    feature = [float((payload[i % n] if n else 0) / 255.0) for i in range(8)]
    return width, height, 3, feature


def decode_image_stub(
    df: DataFrame, bin_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """'Decode' images via mapInPandas with Arrow batches — the real
    plumbing for a decode/feature-extract stage (STUB decoder inside).
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": pdf[id_col].astype("int64"),
                "media_type": [],
                "n_bytes": [],
                "width": [],
                "height": [],
                "channels": [],
                "feature": [],
            }
            for payload in pdf[bin_col]:
                raw = bytes(payload) if payload is not None else b""
                w, h, c, feat = _fake_decode(raw)
                out["media_type"].append("stub")
                out["n_bytes"].append(len(raw))
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(c)
                out["feature"].append(feat)
            yield pd.DataFrame(out)

    return df.select(id_col, bin_col).mapInPandas(decode_batches, DECODED_IMAGE_SCHEMA)


RESIZED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("target_width", T.IntegerType()),
        T.StructField("target_height", T.IntegerType()),
        T.StructField("n_bytes_in", T.LongType()),
        T.StructField("n_bytes_out", T.LongType()),
        T.StructField("resized", T.BinaryType()),
    ]
)


def resize_image_stub(
    df: DataFrame,
    target_width: int = 64,
    target_height: int = 64,
    bin_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """'Resize' stage plumbing via mapInPandas: binary in → binary out
    at a fixed target geometry (STUB resampler: deterministic
    byte-stride subsample/pad to exactly w*h*3 bytes — swap for a real
    resampler outside this container). The schema/batch shape is what a
    real resize stage ships: bounded output row size regardless of
    input payload size, which is what makes the downstream shuffle
    plannable at 100 TB."""
    out_len = target_width * target_height * 3

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "doc_id": pdf[id_col].astype("int64"),
                "target_width": target_width,
                "target_height": target_height,
                "n_bytes_in": [],
                "n_bytes_out": [],
                "resized": [],
            }
            for payload in pdf[bin_col]:
                raw = bytes(payload) if payload is not None else b""
                if raw:
                    stride = max(len(raw) // out_len, 1)
                    sampled = raw[::stride][:out_len]
                else:
                    sampled = b""
                resized = sampled + b"\x00" * (out_len - len(sampled))
                rows["n_bytes_in"].append(len(raw))
                rows["n_bytes_out"].append(len(resized))
                rows["resized"].append(resized)
            yield pd.DataFrame(rows)

    return df.select(id_col, bin_col).mapInPandas(resize_batches, RESIZED_IMAGE_SCHEMA)


def frame_sample_plan(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "doc_id",
    every_n_bytes: int = 1024,
    max_frames: int = 8,
) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: emit one row
    per sampled offset (JVM-side; an actual frame decoder would be a
    mapInPandas over these offsets). Demonstrates the explode-to-frames
    shape without any media library."""
    col = F.col(bin_col)
    n_frames = F.least(
        F.greatest((F.length(col) / every_n_bytes).cast("int"), F.lit(1)),
        F.lit(max_frames),
    )
    return df.select(
        F.col(id_col),
        F.length(col).alias("n_bytes"),
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx", "byte_offset_idx"),
    ).select(
        id_col,
        "n_bytes",
        "frame_idx",
        (F.col("byte_offset_idx") * every_n_bytes).alias("byte_offset"),
    )
