"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as `binary` columns with a typed
metadata struct; heavy per-item work (decode, resize, frame-sample,
feature-extract) runs as Arrow-batched `mapInPandas` so each Python
worker sees columnar batches, never rows.

The decode step itself is STUBBED (the container ships no image/audio
libraries): `decode_image_features` raises NotImplementedError unless
`fake=True`, in which case it emits a deterministic md5-derived feature
vector so the Spark-side plumbing (schema, batching, partitioning) is
fully exercisable in tests.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = "struct<media_type:string,width:int,height:int,sample_rate:int>"


def to_media_table(
    df: DataFrame, id_col: str, payload_text_col: str, media_type: str = "image"
) -> DataFrame:
    """Build a media table from a text column (test harness: the payload
    is the utf-8 bytes; real pipelines read binary files or parquet BLOBs).

    Output: (id, payload binary, meta struct) — the canonical multimodal
    row shape.
    """
    return df.select(
        F.col(id_col),
        F.encode(F.col(payload_text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def payload_stats(df: DataFrame, id_col: str) -> DataFrame:
    """Cheap JVM-side byte-level stats — no Python involved."""
    return df.select(
        F.col(id_col),
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.lower(F.substring(F.hex("payload"), 1, 8)).alias("header_hex"),
        F.col("meta.media_type").alias("media_type"),
    )


def _fake_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder: md5-seeded floats."""
    h = hashlib.md5(payload).digest()
    return [h[i % 16] / 255.0 for i in range(dim)]


def decode_image_features(
    df: DataFrame, id_col: str, dim: int = 8, fake: bool = False
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    `fake=False` raises NotImplementedError inside the task (no decode
    libraries in this environment); `fake=True` produces the
    deterministic md5 features so tests exercise the real mapInPandas
    plumbing end-to-end.
    """

    out_schema = f"{id_col} long, features array<double>"

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image decoding requires pillow/ffmpeg — not available in this container; "
                    "pass fake=True for the deterministic test decoder"
                )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "features": [_fake_features(p, dim) for p in pdf["payload"]],
                }
            )

    return df.select(id_col, "payload").mapInPandas(extract, out_schema)


def resize_images(df: DataFrame, id_col: str, width: int, height: int, fake: bool = False) -> DataFrame:
    """Resize stage (stub): same Arrow-batched shape as decode. With
    fake=True emits a deterministic truncated payload standing in for the
    resized bytes, so the pipeline plumbing is testable end-to-end."""

    out_schema = f"{id_col} long, payload binary, width int, height int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("image resize requires pillow — not in this container")
            n = max(4, (width * height) % 64)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "payload": [bytes(p[:n]) for p in pdf["payload"]],
                    "width": width,
                    "height": height,
                }
            )

    return df.select(id_col, "payload").mapInPandas(run, out_schema)


def sample_frames(
    df: DataFrame, id_col: str, every_nth_byte: int = 16, fake: bool = False
) -> DataFrame:
    """Frame-sampling stage (stub for video): emits one row per sampled
    "frame" (byte offset in the fake decoder) — demonstrates the
    one-to-many mapInPandas shape real frame extraction uses."""

    out_schema = f"{id_col} long, frame_idx int, frame binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("frame sampling requires ffmpeg — not in this container")
            ids, idxs, frames = [], [], []
            for _id, payload in zip(pdf[id_col], pdf["payload"]):
                for i, off in enumerate(range(0, len(payload), every_nth_byte)):
                    ids.append(_id)
                    idxs.append(i)
                    frames.append(bytes(payload[off : off + every_nth_byte]))
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, "payload").mapInPandas(run, out_schema)
