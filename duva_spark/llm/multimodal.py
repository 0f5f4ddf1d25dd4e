"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as `binary` columns with a typed
metadata struct; heavy per-item work (decode, resize, frame-sample,
feature-extract) runs as Arrow-batched `mapInPandas` so each Python
worker sees columnar batches, never rows.

Decoder selection happens AT TASK LEVEL inside each worker: the real
library (pillow for images, PyAV for video) is imported if present and
used; otherwise the behavior is governed by the call:

- ``fake=True``  → the deterministic md5-derived stand-in (oracle-checked
  via q_multimodal_features — DuckDB recomputes the same bytes);
- ``fake=False`` → real decoder when importable, else
  ``fallback="raise"`` (default) raises NotImplementedError inside the
  task, ``fallback="fake"`` degrades to the deterministic stand-in.

The per-batch kernels are plain functions taking the loader as an
argument, so decoder selection is unit-testable driver-side with a
monkeypatched module (workers are separate processes — a driver-side
monkeypatch can't reach a real task).
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


# ---------------------------------------------------------------------------
# Decoder loaders (called inside the task; monkeypatch-injectable in tests)
# ---------------------------------------------------------------------------


def import_pillow():
    """PIL.Image when pillow is installed in the worker, else None."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def import_pyav():
    """The av module (ffmpeg bindings) when installed, else None."""
    try:
        import av  # noqa: PLC0415

        return av
    except ImportError:
        return None


def _fake_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder: md5-seeded floats."""
    h = hashlib.md5(payload).digest()
    return [h[i % 16] / 255.0 for i in range(dim)]


def _unavailable(what: str, lib: str):
    return NotImplementedError(
        f"{what} requires {lib} — not importable in this worker; "
        f"pass fake=True for the deterministic test decoder or fallback='fake'"
    )


# ---------------------------------------------------------------------------
# Per-batch kernels (plain pandas-in/pandas-out; unit-testable driver-side)
# ---------------------------------------------------------------------------


def decode_features_batch(
    pdf: pd.DataFrame, id_col: str, dim: int, fake: bool, fallback: str, loader
) -> pd.DataFrame:
    image_mod = None if fake else loader()
    if not fake and image_mod is None and fallback != "fake":
        raise _unavailable("image decoding", "pillow")

    def features(payload: bytes) -> list[float]:
        if image_mod is None:
            return _fake_features(payload, dim)
        import io  # noqa: PLC0415

        img = image_mod.open(io.BytesIO(bytes(payload))).convert("L").resize((dim, 1))
        return [v / 255.0 for v in img.getdata()]

    return pd.DataFrame({id_col: pdf[id_col], "features": [features(p) for p in pdf["payload"]]})


def resize_batch(
    pdf: pd.DataFrame, id_col: str, width: int, height: int, fake: bool, fallback: str, loader
) -> pd.DataFrame:
    image_mod = None if fake else loader()
    if not fake and image_mod is None and fallback != "fake":
        raise _unavailable("image resize", "pillow")

    def resize(payload: bytes) -> bytes:
        if image_mod is None:
            n = max(4, (width * height) % 64)
            return bytes(payload[:n])
        import io  # noqa: PLC0415

        img = image_mod.open(io.BytesIO(bytes(payload))).resize((width, height))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    return pd.DataFrame(
        {
            id_col: pdf[id_col],
            "payload": [resize(p) for p in pdf["payload"]],
            "width": width,
            "height": height,
        }
    )


def sample_frames_batch(
    pdf: pd.DataFrame, id_col: str, every_nth_byte: int, fake: bool, fallback: str, loader
) -> pd.DataFrame:
    av_mod = None if fake else loader()
    if not fake and av_mod is None and fallback != "fake":
        raise _unavailable("frame sampling", "PyAV/ffmpeg")
    ids, idxs, frames = [], [], []
    for _id, payload in zip(pdf[id_col], pdf["payload"]):
        if av_mod is not None:
            import io  # noqa: PLC0415

            with av_mod.open(io.BytesIO(bytes(payload))) as container:
                for i, frame in enumerate(container.decode(video=0)):
                    ids.append(_id)
                    idxs.append(i)
                    frames.append(bytes(frame.to_image().tobytes()))
        else:
            for i, off in enumerate(range(0, len(payload), every_nth_byte)):
                ids.append(_id)
                idxs.append(i)
                frames.append(bytes(payload[off : off + every_nth_byte]))
    return pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})


# ---------------------------------------------------------------------------
# DataFrame-level operators (Arrow-batched mapInPandas over the kernels)
# ---------------------------------------------------------------------------


def decode_image_features(
    df: DataFrame,
    id_col: str,
    dim: int = 8,
    fake: bool = False,
    fallback: str = "raise",
    loader=import_pillow,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads: real pillow
    decode (grayscale → dim×1 resize → normalized pixels) when the
    library is importable in the worker, fake/fallback otherwise."""
    out_schema = f"{id_col} long, features array<double>"

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield decode_features_batch(pdf, id_col, dim, fake, fallback, loader)

    return df.select(id_col, "payload").mapInPandas(extract, out_schema)


def resize_images(
    df: DataFrame,
    id_col: str,
    width: int,
    height: int,
    fake: bool = False,
    fallback: str = "raise",
    loader=import_pillow,
) -> DataFrame:
    """Resize stage: real pillow resize (PNG re-encode) when importable;
    deterministic truncated payload otherwise."""
    out_schema = f"{id_col} long, payload binary, width int, height int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield resize_batch(pdf, id_col, width, height, fake, fallback, loader)

    return df.select(id_col, "payload").mapInPandas(run, out_schema)


def sample_frames(
    df: DataFrame,
    id_col: str,
    every_nth_byte: int = 16,
    fake: bool = False,
    fallback: str = "raise",
    loader=import_pyav,
) -> DataFrame:
    """Frame-sampling stage: real PyAV decode (one row per video frame)
    when importable; byte-offset fake frames otherwise — the one-to-many
    mapInPandas shape either way."""
    out_schema = f"{id_col} long, frame_idx int, frame binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield sample_frames_batch(pdf, id_col, every_nth_byte, fake, fallback, loader)

    return df.select(id_col, "payload").mapInPandas(run, out_schema)


def dhash_batch(
    pdf: pd.DataFrame, id_col: str, fake: bool, fallback: str, loader
) -> pd.DataFrame:
    """Per-batch dHash kernel (difference hash, Krawetz's perceptual
    image hash): decode to an 8x8 grayscale grid, then bit j = r*7+c is
    set iff grid[r][c] < grid[r][c+1] — 56 bits, kept under 2^63 so the
    hash rides as a plain signed BIGINT on both engines.

    Real path: pillow grayscale -> resize((8, 8)) -> pixel bytes. Fake
    path (deterministic, oracle-replayable): nearest-neighbor
    DOWNSAMPLE of the payload bytes — pixel i = payload[(i*n)//64] —
    i.e. the same resize semantics applied to the byte stream, so
    near-duplicate payloads yield near-equal grids and the hash behaves
    perceptually (unlike an md5-derived fake, which would only ever
    match exact duplicates)."""
    image_mod = None if fake else loader()
    if not fake and image_mod is None and fallback != "fake":
        raise _unavailable("perceptual hashing", "pillow")

    def grid(payload: bytes) -> list[int]:
        if image_mod is None:
            n = len(payload)
            if n == 0:
                return [0] * 64
            return [payload[(i * n) // 64] for i in range(64)]
        import io  # noqa: PLC0415

        img = image_mod.open(io.BytesIO(bytes(payload))).convert("L").resize((8, 8))
        return list(img.getdata())

    def dhash(payload: bytes) -> int:
        g = grid(bytes(payload))
        h = 0
        for r in range(8):
            for c in range(7):
                if g[r * 8 + c] < g[r * 8 + c + 1]:
                    h |= 1 << (r * 7 + c)
        return h

    return pd.DataFrame(
        {id_col: pdf[id_col], "dhash": [dhash(p) for p in pdf["payload"]]}
    )


def image_dhash(
    df: DataFrame,
    id_col: str,
    fake: bool = False,
    fallback: str = "raise",
    loader=import_pillow,
) -> DataFrame:
    """Arrow-batched perceptual hash over binary payloads: (id, dhash
    long). Same task-level decoder selection as the other multimodal
    ops."""
    out_schema = f"{id_col} long, dhash long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield dhash_batch(pdf, id_col, fake, fallback, loader)

    return df.select(id_col, "payload").mapInPandas(run, out_schema)


def ahash_batch(
    pdf: pd.DataFrame, id_col: str, fake: bool, fallback: str, loader
) -> pd.DataFrame:
    """Per-batch aHash kernel (average hash, the pHash family member
    suited to SPARSE grids): decode to an 8x8 grid, then bit i (i < 63)
    is set iff grid[i]*64 > sum(grid) — the above-the-mean test kept in
    exact cross-multiplied integers so both engines decide identically.
    63 bits (pixel 63 unused) so the packed hash stays positive in a
    signed BIGINT.

    Real path: pillow grayscale -> resize((8, 8)) pixels. Fake path
    (deterministic, oracle-replayable): the grid is a 64-bin histogram
    of the payload's word-BIGRAM hashes (split on 0x20; bin =
    md5-60bit % 64). Bigram bins are the perceptual choice for text
    payloads over a small shared vocabulary: unigram occupancy is
    near-identical across ALL docs (every doc draws the same words) so
    any unigram-bag grid collapses — measured hamming ~0-8 for
    unrelated pairs — while bigram occupancy separates cleanly
    (near-dup pairs <= 1 bit, unrelated pairs >= 9 bits on the sf0.01
    corpus)."""
    image_mod = None if fake else loader()
    if not fake and image_mod is None and fallback != "fake":
        raise _unavailable("perceptual hashing", "pillow")

    def grid(payload: bytes) -> list[int]:
        if image_mod is None:
            toks = bytes(payload).split(b" ")
            g = [0] * 64
            for i in range(len(toks) - 1):
                bg = toks[i] + b" " + toks[i + 1]
                h = int(hashlib.md5(bg).hexdigest()[:15], 16)
                g[h % 64] += 1
            return g
        import io  # noqa: PLC0415

        img = image_mod.open(io.BytesIO(bytes(payload))).convert("L").resize((8, 8))
        return list(img.getdata())

    def ahash(payload: bytes) -> int:
        g = grid(payload)
        tot = sum(g)
        h = 0
        for i in range(63):
            if g[i] * 64 > tot:
                h |= 1 << i
        return h

    return pd.DataFrame(
        {id_col: pdf[id_col], "ahash": [ahash(p) for p in pdf["payload"]]}
    )


def image_ahash(
    df: DataFrame,
    id_col: str,
    fake: bool = False,
    fallback: str = "raise",
    loader=import_pillow,
) -> DataFrame:
    """Arrow-batched average-hash over binary payloads: (id, ahash
    long). Same task-level decoder selection as the other multimodal
    ops."""
    out_schema = f"{id_col} long, ahash long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield ahash_batch(pdf, id_col, fake, fallback, loader)

    return df.select(id_col, "payload").mapInPandas(run, out_schema)
