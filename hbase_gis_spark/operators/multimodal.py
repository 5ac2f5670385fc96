"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Real decode/resize kernels are implemented against PIL behind an
import guard; where no image library exists (this container) they
raise a clearly-marked NotImplementedError and the deterministic fake
kernels keep the plumbing testable. Everything Spark-side is real and
tested either way: the schema convention, Arrow batch flow through
mapInPandas, partition-sized batching, and metadata extraction shape —
the parts that have to be right at 100 TB.

Schema convention for a media table:
    id        bigint
    media     binary            -- opaque payload
    media_meta struct<mime:string, n_bytes:bigint>

Decode steps add typed columns next to the payload rather than nested
structs, keeping Parquet column pruning useful (a downstream job that
needs only `width` never reads `media`).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # decode backends are optional; absent in this container
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except Exception:  # pragma: no cover - import guard
    _HAS_PIL = False


def attach_fake_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic binary payload fabricated from a text column —
    stands in for real image bytes so the plumbing is testable."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("media", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit("application/x-fake").alias("mime"),
            F.length(payload).cast("bigint").alias("n_bytes"),
        ),
    )


_DECODE_SCHEMA = (
    "id bigint, width int, height int, channels int, mean_byte double"
)


def _decode_real(buf: bytes) -> tuple[int, int, int, float]:
    """Real decoder: PIL open → (width, height, channels, mean byte
    over the raw pixel buffer). Raises NotImplementedError when no
    image library is present (this container lacks PIL/opencv — the
    deterministic fake keeps the plumbing testable there)."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decode requires PIL/opencv; not present in this container"
        )
    import io

    with Image.open(io.BytesIO(buf)) as im:
        im.load()
        px = im.tobytes()
        channels = len(im.getbands())
        mean_byte = (sum(px) / len(px)) if px else 0.0
        return im.width, im.height, channels, mean_byte


def _decode_fake(buf: bytes) -> tuple[int, int, int, float]:
    """Deterministic fake decode: derive (width, height, channels,
    mean_byte) purely from the payload bytes."""
    n = len(buf)
    width = (n % 64) + 1
    height = (n % 48) + 1
    channels = 3
    mean_byte = (sum(buf) / n) if n else 0.0
    return width, height, channels, mean_byte


def decode_media(
    df: DataFrame,
    id_col: str = "id",
    media_col: str = "media",
    fake: bool = True,
) -> DataFrame:
    """Decode the binary payload into typed feature columns via
    mapInPandas (Arrow-batched; one python worker per partition).

    ``fake=False`` uses the real decoder (NotImplementedError here —
    the Spark-side contract is identical)."""
    decode = _decode_fake if fake else _decode_real

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [decode(b) for b in pdf[media_col]]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].values,
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "channels": [d[2] for d in decoded],
                    "mean_byte": [d[3] for d in decoded],
                }
            )

    return df.select(id_col, media_col).mapInPandas(batches, _DECODE_SCHEMA)


def _resize_real(buf: bytes, size: tuple[int, int]) -> bytes:
    """Real resize kernel: decode → bilinear resample to ``size`` →
    re-encode PNG. Requires PIL (absent in this container)."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image resize requires PIL/opencv; not present in this container"
        )
    import io

    with Image.open(io.BytesIO(buf)) as im:
        out = io.BytesIO()
        im.resize(size, Image.BILINEAR).save(out, format="PNG")
        return out.getvalue()


def resize_media(
    df: DataFrame,
    target_bytes: int,
    id_col: str = "id",
    media_col: str = "media",
    fake: bool = True,
    size: tuple[int, int] = (32, 32),
) -> DataFrame:
    """Resize each payload via mapInPandas — the image-resize shape
    (binary in, binary out, 1:1 rows). Output schema:
    (id, media binary, n_bytes).

    ``fake=True`` (default, oracle-checkable): truncate or cycle-pad
    the raw bytes to ``target_bytes``. ``fake=False``:
    decode → bilinear resample to ``size`` → PNG encode with PIL, same
    batch loop and schema — raises NotImplementedError where no image
    library exists."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for buf in pdf[media_col]:
                if buf is None or len(buf) == 0:
                    out.append(b"")
                    continue
                if fake:
                    reps = -(-target_bytes // len(buf))  # ceil
                    out.append((bytes(buf) * reps)[:target_bytes])
                else:
                    out.append(_resize_real(bytes(buf), size))
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].values,
                    "media": out,
                    "n_bytes": [len(b) for b in out],
                }
            )

    return df.select(id_col, media_col).mapInPandas(
        batches, "id bigint, media binary, n_bytes bigint"
    )


_FRAME_SCHEMA = "id bigint, frame_idx int, frame bytes".replace("bytes", "binary")


def frame_sample(
    df: DataFrame,
    n_frames: int,
    id_col: str = "id",
    media_col: str = "media",
) -> DataFrame:
    """Sample ``n_frames`` evenly spaced chunks from each payload —
    the video-frame-sampling shape (explode to one row per frame).

    Chunking is a deterministic fake for the codec; the row explosion,
    schema, and batch flow match a real frame sampler."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for rid, buf in zip(pdf[id_col], pdf[media_col]):
                if buf is None or len(buf) == 0:
                    continue
                step = max(len(buf) // n_frames, 1)
                for k in range(min(n_frames, len(buf))):
                    ids.append(rid)
                    idxs.append(k)
                    frames.append(bytes(buf[k * step : k * step + step]))
            yield pd.DataFrame({"id": ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, media_col).mapInPandas(batches, _FRAME_SCHEMA)
