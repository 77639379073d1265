"""Multimodal column plumbing (north-star extension).

Images/audio/video are opaque ``binary`` columns with typed metadata
alongside. The Spark-side plumbing — schema, partition-friendly batch
shape, Arrow-batched UDF signatures — is real and tested; the actual
media decoding is stubbed (the image/audio libraries are not in this
container) behind ``NotImplementedError`` or a clearly-marked
deterministic fake, so swapping in PIL/torchaudio later changes one
function body, not the pipeline.

Pattern: ``mapInPandas`` over batches keeps Arrow transfer amortized and
lets a decode step hold per-batch state (model, codec) — the correct shape
for GPU/codec work at 100 TB.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "with_binary_payload",
    "binary_metadata",
    "decode_image_batch",
    "extract_features",
    "resize_image",
    "frame_sample",
]

# Canonical multimodal record: opaque payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("mime_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("sha256", T.StringType(), False),
    ]
)


def with_binary_payload(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Build a multimodal-shaped table from the documents fixture: UTF-8
    bytes stand in for a real media payload (deterministic fake)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("mime_type"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.sha2(payload, 256).alias("sha256"),
    )


def binary_metadata(media: DataFrame) -> DataFrame:
    """Pure-metadata pass over binary payloads — size + content hash.
    Runs entirely JVM-side; no decode."""
    return media.select(
        "media_id",
        "mime_type",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.sha2(F.col("payload"), 256).alias("sha256"),
    )


_DECODED_SCHEMA = "media_id long, height int, width int, n_channels int"


def decode_image_batch(media: DataFrame, fake: bool = True) -> DataFrame:
    """Decode image payloads to (height, width, channels) metadata.

    STUB: real decoding needs an image library not present in this
    container. ``fake=True`` derives deterministic pseudo-dimensions from
    the payload bytes (so the distributed plumbing is testable end-to-end);
    ``fake=False`` raises NotImplementedError inside the workers' batches.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image decode requires PIL/opencv — not in this image"
                )
            sizes = pdf["payload"].map(len)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "height": (sizes % 512 + 16).astype("int32"),
                    "width": (sizes % 768 + 16).astype("int32"),
                    "n_channels": 3,
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        _decode, schema=_DECODED_SCHEMA
    )


_FEATURE_SCHEMA = "media_id long, feature array<float>"


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Feature-extraction stub: deterministic byte-histogram 'embedding'.

    Shape-compatible with a real encoder (Arrow batches in, fixed-dim
    float vectors out); swap the body for a model call on a GPU cluster.
    """

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                hist, _ = np.histogram(arr % dim, bins=dim, range=(0, dim))
                total = max(1, int(hist.sum()))
                feats.append((hist / total).astype("float32"))
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return media.select("media_id", "payload").mapInPandas(
        _feat, schema=_FEATURE_SCHEMA
    )


_FRAME_SCHEMA = "media_id long, frame_idx int, frame_bytes binary"


def frame_sample(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 4) -> DataFrame:
    """Video frame-sampling stub: emits every Nth byte-slice as a 'frame'
    (1-to-many, demonstrates the exploding batch shape of real frame
    extraction without a codec)."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_bytes = [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                for i in range(min(max_frames, max(1, len(raw) // every_n_bytes))):
                    out_ids.append(media_id)
                    out_idx.append(i)
                    out_bytes.append(raw[i * every_n_bytes : (i + 1) * every_n_bytes])
            yield pd.DataFrame(
                {"media_id": out_ids, "frame_idx": out_idx, "frame_bytes": out_bytes}
            )

    return media.select("media_id", "payload").mapInPandas(
        _frames, schema=_FRAME_SCHEMA
    )


_RESIZED_SCHEMA = "media_id long, height int, width int, resized binary"


def resize_image(
    media: DataFrame, height: int = 32, width: int = 32, fake: bool = True
) -> DataFrame:
    """Resize stub: emits a fixed-size payload per image.

    ``fake=True`` strided-samples exactly height*width bytes from the
    payload (deterministic, so the batch shape — constant-size outputs
    from variable-size inputs, the property real resize gives a training
    pipeline — is testable end-to-end); ``fake=False`` raises inside the
    workers' batches until a real image library is swapped in.
    """

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        n_out = height * width
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image resize requires PIL/opencv — not in this image"
                )
            outs = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                if len(arr) == 0:
                    arr = np.zeros(1, dtype=np.uint8)
                idx = (np.arange(n_out) * len(arr)) // n_out
                outs.append(arr[idx].tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "height": height,
                    "width": width,
                    "resized": outs,
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        _resize, schema=_RESIZED_SCHEMA
    )
