"""Multimodal column plumbing (north-star extension).

Images/audio/video are opaque ``binary`` columns with typed metadata
alongside, processed as Arrow batches via ``mapInPandas`` — the batch
shape that amortizes transfer and lets a decode step hold per-batch state
(model, codec), the correct shape for GPU/codec work at 100 TB.

Decoding is REAL for the self-describing uncompressed formats a
pure-Python/numpy parser can own: BMP (24-bit BI_RGB, bottom-up or
top-down, row padding handled), binary PPM ("P6"), RIFF/WAVE PCM audio
(8/16-bit, any channel count, chunk-walked so files with LIST/fact
chunks parse too), and YUV4MPEG2 ("Y4M") uncompressed video (C444/Cmono,
per-frame parameter lines handled). Compressed formats (JPEG/PNG/H.264)
would need libraries not present in this container; those paths keep the
clearly-marked deterministic ``fake`` byte-derived stand-ins so the
distributed plumbing stays testable end-to-end, and swapping in
PIL/opencv/soundfile later changes one function body, not the pipeline.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "audio_energy_fingerprint_batch",
    "video_framehash_fingerprint_batch",
    "image_dhash_batch",
    "MEDIA_SCHEMA",
    "with_binary_payload",
    "binary_metadata",
    "encode_bmp",
    "decode_image",
    "synthetic_bmp_media",
    "decode_image_batch",
    "encode_wav",
    "decode_wav",
    "synthetic_wav_media",
    "decode_audio_batch",
    "encode_y4m",
    "decode_y4m",
    "synthetic_y4m_media",
    "decode_video_batch",
    "sample_video_frames",
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


# --- real codecs: BMP (24-bit BI_RGB) + binary PPM (P6) ---------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a standard 24-bit BMP file.

    Windows BITMAPINFOHEADER, BI_RGB (uncompressed), rows stored
    bottom-up with 4-byte alignment padding, pixels in BGR byte order —
    i.e. a file any image viewer opens, not a private container.
    """
    h, w, c = pixels.shape
    if c != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_bmp wants (h, w, 3) uint8 RGB")
    stride = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    data = rows.tobytes()
    header = struct.pack(
        "<2sIHHI"  # BITMAPFILEHEADER
        "IiiHHIIiiII",  # BITMAPINFOHEADER
        b"BM", 54 + len(data), 0, 0, 54,
        40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0,
    )
    return header + data


def decode_image(raw: bytes) -> np.ndarray:
    """Parse BMP (24-bit BI_RGB) or binary PPM (P6) bytes -> (h, w, 3)
    uint8 RGB array, top-down row order. Raises ValueError on anything
    else — decode errors should be loud, then quarantined by the caller's
    filter, not silently faked."""
    if raw[:2] == b"BM":
        off, = struct.unpack_from("<I", raw, 10)
        w, h_signed = struct.unpack_from("<ii", raw, 18)
        planes, bpp = struct.unpack_from("<HH", raw, 26)
        compression, = struct.unpack_from("<I", raw, 30)
        if bpp != 24 or compression != 0:
            raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
        h = abs(h_signed)
        stride = (w * 3 + 3) // 4 * 4
        rows = np.frombuffer(raw, dtype=np.uint8, count=h * stride, offset=off)
        px = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR->RGB
        return px if h_signed < 0 else px[::-1]  # bottom-up unless negative height
    if raw[:2] == b"P6":
        # header: "P6" <ws> width <ws> height <ws> maxval <single ws> data
        fields, i = [], 2
        while len(fields) < 3:
            while i < len(raw) and raw[i : i + 1].isspace():
                i += 1
            if raw[i : i + 1] == b"#":  # comment line
                i = raw.index(b"\n", i) + 1
                continue
            j = i
            while j < len(raw) and not raw[j : j + 1].isspace():
                j += 1
            fields.append(int(raw[i:j]))
            i = j
        i += 1  # single whitespace after maxval
        w, h, maxval = fields
        if maxval != 255:
            raise ValueError(f"unsupported PPM maxval {maxval}")
        return np.frombuffer(raw, dtype=np.uint8, count=h * w * 3, offset=i).reshape(
            h, w, 3
        )
    raise ValueError(f"unrecognized image magic {raw[:2]!r}")


def synthetic_bmp_media(
    docs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic REAL-format image corpus: one valid 24-bit BMP per
    input row, sized (4 + id%13) x (4 + id%11) with pixel channels
    (r, g, b) = ((x*7+id)%256, (y*11+id)%256, (x+y+id)%256).

    The generation rule is closed-form in (id, x, y), so a foreign engine
    can compute expected decode outputs (dimensions, channel sums) in
    pure SQL without a BMP codec — which is what gives the real-decode
    catalog query a full value oracle.
    """

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid in pdf[id_col]:
                mid = int(mid)
                w, h = 4 + mid % 13, 4 + mid % 11
                x = np.arange(w, dtype=np.int64)[None, :]
                y = np.arange(h, dtype=np.int64)[:, None]
                px = np.empty((h, w, 3), dtype=np.uint8)
                px[:, :, 0] = (x * 7 + mid) % 256
                px[:, :, 1] = (y * 11 + mid) % 256
                px[:, :, 2] = (x + y + mid) % 256
                payloads.append(encode_bmp(px))
            yield pd.DataFrame(
                {"media_id": pdf[id_col].astype("int64"), "payload": payloads}
            )

    from data_algorithms_with_pyspark_spark.operators.dedup import (
        spread_partitions,
    )

    # encode+decode are CPU-bound per row: a small parquet scan arrives as
    # 1 partition, which would serialize the whole corpus onto one core
    return spread_partitions(docs.select(id_col)).mapInPandas(
        _gen, schema="media_id long, payload binary"
    )


_DECODED_SCHEMA = (
    "media_id long, height int, width int, n_channels int, pixel_sum long"
)


def decode_image_batch(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode image payloads to (height, width, channels, pixel byte sum).

    The default path REALLY decodes — BMP (24-bit BI_RGB) and binary PPM
    via ``decode_image``, pure numpy inside the Arrow batches; unsupported
    bytes raise ValueError loudly. ``pixel_sum`` is the sum of every
    decoded channel byte — a cheap engine-reproducible content checksum.
    ``fake=True`` keeps the historical byte-derived stand-in for payloads
    that are not images at all (e.g. text bytes standing in for media in
    pipeline-shape tests).
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if fake:
                sizes = pdf["payload"].map(len)
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "height": (sizes % 512 + 16).astype("int32"),
                        "width": (sizes % 768 + 16).astype("int32"),
                        "n_channels": 3,
                        "pixel_sum": [
                            int(np.frombuffer(bytes(p), dtype=np.uint8).sum())
                            for p in pdf["payload"]
                        ],
                    }
                )
                continue
            heights, widths, chans, sums = [], [], [], []
            for payload in pdf["payload"]:
                px = decode_image(bytes(payload))
                heights.append(px.shape[0])
                widths.append(px.shape[1])
                chans.append(px.shape[2])
                sums.append(int(px.sum(dtype=np.int64)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "height": pd.Series(heights, dtype="int32"),
                    "width": pd.Series(widths, dtype="int32"),
                    "n_channels": pd.Series(chans, dtype="int32"),
                    "pixel_sum": pd.Series(sums, dtype="int64"),
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        _decode, schema=_DECODED_SCHEMA
    )


# --- real audio codec: RIFF/WAVE PCM (8/16-bit) -----------------------------


def image_dhash_batch(
    media: DataFrame, grid: int = 8
) -> DataFrame:
    """56-bit difference-hash (dHash) per image — the standard perceptual
    fingerprint image pipelines dedup on at scale (resize to a tiny grid,
    hash the horizontal luminance GRADIENT signs; near-identical images
    collide, re-encodes and minor crops land within a small hamming
    distance).

    Really decodes (``decode_image``: BMP/PPM pure-numpy) inside Arrow
    batches, then: luma = r+g+b per pixel (integer), nearest-neighbor
    sample at ``x_j = j*w // grid``, ``y_i = i*h // grid``, bit(i, j) =
    luma(x_{j+1}, y_i) > luma(x_j, y_i) for j < grid-1 — grid*(grid-1)
    = 56 bits packed little-endian into a BIGINT (fits signed 63). All
    arithmetic is integer, so a foreign engine replays the hash in pure
    SQL from the synthetic corpus's closed-form pixel rule while THIS
    side hashes the actually-decoded bytes — the oracle cross-checks the
    codec and the hash at once.

    Scale shape: one mapInPandas scan emitting (media_id, dhash); exact
    dedup is then one hash aggregate on dhash. Banded hamming candidates
    (the simhash machinery) apply unchanged when near-miss grouping is
    wanted; exact-collision grouping is the production default for
    re-encode dedup.
    """
    if grid < 2:
        raise ValueError("grid must be >= 2")

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_image(bytes(payload))
                h, w = px.shape[0], px.shape[1]
                luma = px.sum(axis=2, dtype=np.int64)
                xs = (np.arange(grid, dtype=np.int64) * w) // grid
                ys = (np.arange(grid, dtype=np.int64) * h) // grid
                sampled = luma[np.ix_(ys, xs)]
                bits = sampled[:, 1:] > sampled[:, :-1]  # (grid, grid-1)
                weights = np.left_shift(
                    np.uint64(1),
                    np.arange(grid * (grid - 1), dtype=np.uint64),
                )
                hashes.append(
                    int((bits.flatten().astype(np.uint64) * weights).sum())
                )
                ids.append(int(mid))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "dhash": pd.Series(hashes, dtype="int64"),
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        _hash, schema="media_id long, dhash long"
    )


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode an (n_samples, n_channels) int16 array as a canonical
    RIFF/WAVE PCM file (format tag 1, interleaved frames) — a file any
    audio player opens, not a private container."""
    if samples.ndim != 2 or samples.dtype != np.int16:
        raise ValueError("encode_wav wants (n_samples, n_channels) int16")
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    byte_rate = sample_rate * ch * 2
    header = struct.pack(
        "<4sI4s"  # RIFF size WAVE
        "4sIHHIIHH"  # fmt  chunk: PCM, channels, rate, byte rate, align, bits
        "4sI",  # data chunk header
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, ch, sample_rate, byte_rate, ch * 2, 16,
        b"data", len(data),
    )
    return header + data


def decode_wav(raw: bytes) -> tuple[int, np.ndarray]:
    """Parse RIFF/WAVE PCM bytes -> (sample_rate, (n_samples, n_channels)
    int16 array). Walks the chunk list (LIST/fact/cue chunks are skipped,
    odd-sized chunks consume their pad byte), so real-world files parse,
    not just our own encoder's output. 8-bit PCM (unsigned) is widened to
    int16; anything non-PCM raises ValueError loudly."""
    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError(f"unrecognized audio magic {raw[:4]!r}")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(raw):
        cid, size = struct.unpack_from("<4sI", raw, pos)
        body = raw[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # odd chunks carry a pad byte
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    tag, ch, rate, _byte_rate, _align, bits = fmt
    if tag != 1 or bits not in (8, 16):
        raise ValueError(f"unsupported WAV (format tag={tag}, bits={bits})")
    if bits == 8:  # 8-bit PCM is unsigned; center then widen
        arr = (np.frombuffer(data, dtype=np.uint8).astype(np.int16) - 128) * 256
    else:
        arr = np.frombuffer(data, dtype="<i2", count=len(data) // 2)
    n = len(arr) // ch
    return rate, arr[: n * ch].reshape(n, ch)


def synthetic_wav_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL-format audio corpus: one valid PCM16 WAV per
    input row — n_samples = 200 + id%57, channels = 1 + id%2, rate =
    8000 + (id%3)*4000, sample(i, c) = ((i*37 + c*11 + id*7) % 4001) - 2000.

    The sample rule is closed-form in (id, i, c), so a foreign engine can
    compute expected decode outputs (frame counts, sample sums) in pure
    SQL without a WAV codec — which gives the real-decode catalog query a
    full value oracle (same trick as ``synthetic_bmp_media``).
    """

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid in pdf[id_col]:
                mid = int(mid)
                n, ch = 200 + mid % 57, 1 + mid % 2
                rate = 8000 + (mid % 3) * 4000
                i = np.arange(n, dtype=np.int64)[:, None]
                c = np.arange(ch, dtype=np.int64)[None, :]
                samples = ((i * 37 + c * 11 + mid * 7) % 4001 - 2000).astype(
                    np.int16
                )
                payloads.append(encode_wav(samples, rate))
            yield pd.DataFrame(
                {"media_id": pdf[id_col].astype("int64"), "payload": payloads}
            )

    from data_algorithms_with_pyspark_spark.operators.dedup import (
        spread_partitions,
    )

    return spread_partitions(docs.select(id_col)).mapInPandas(
        _gen, schema="media_id long, payload binary"
    )


_AUDIO_SCHEMA = (
    "media_id long, sample_rate int, n_channels int, n_samples long, "
    "duration_ms long, sample_sum long, abs_peak int"
)


def decode_audio_batch(media: DataFrame) -> DataFrame:
    """Decode WAV payloads to (sample_rate, n_channels, n_samples,
    duration_ms, sample_sum, abs_peak) — the metadata+checksum pass of an
    audio ingest pipeline, really parsing RIFF bytes inside the Arrow
    batches. ``duration_ms`` floors n_samples*1000/rate so it is exact
    integer arithmetic on every engine."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rates, chans, counts, durs, sums, peaks = [], [], [], [], [], []
            for payload in pdf["payload"]:
                rate, samples = decode_wav(bytes(payload))
                n = samples.shape[0]
                rates.append(rate)
                chans.append(samples.shape[1])
                counts.append(n)
                durs.append(n * 1000 // rate)
                sums.append(int(samples.sum(dtype=np.int64)))
                peaks.append(int(np.abs(samples.astype(np.int64)).max()) if n else 0)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": pd.Series(rates, dtype="int32"),
                    "n_channels": pd.Series(chans, dtype="int32"),
                    "n_samples": pd.Series(counts, dtype="int64"),
                    "duration_ms": pd.Series(durs, dtype="int64"),
                    "sample_sum": pd.Series(sums, dtype="int64"),
                    "abs_peak": pd.Series(peaks, dtype="int32"),
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        _decode, schema=_AUDIO_SCHEMA
    )


# --- real video codec: YUV4MPEG2 (C444 / Cmono) -----------------------------


def audio_energy_fingerprint_batch(
    media: DataFrame, frames: int = 33
) -> DataFrame:
    """32-bit audio fingerprint per clip — the shazam-family shape
    reduced to its integer core: mix to mono, slice into ``frames``
    balanced frames (boundaries ``k*n // frames``), take each frame's
    ENERGY (sum of squared samples — exact int64), and hash the signs of
    the frame-to-frame energy gradient: bit k = E_{k+1} > E_k, giving
    ``frames - 1`` bits. Re-encodes and level-preserving copies collide;
    the energy envelope is what survives transcoding.

    Really decodes (``decode_wav``: chunk-walking RIFF/WAVE parser)
    inside Arrow batches; every step is integer arithmetic, so a foreign
    engine replays the fingerprint in pure SQL from the synthetic
    corpus's closed-form sample rule (the balanced-partition inverse
    ``k = (frames*(i+1) - 1) // n`` assigns samples to frames without
    materializing boundaries) while THIS side fingerprints the
    actually-decoded bytes — codec and hash cross-checked at once, the
    ``image_dhash_batch`` discipline.

    Scale shape: one mapInPandas scan emitting (media_id, fp); dedup is
    one 8-bytes-per-clip hash aggregate.
    """
    if frames < 2:
        raise ValueError("frames must be >= 2")

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _rate, samples = decode_wav(bytes(payload))
                n = samples.shape[0]
                if n < frames:
                    raise ValueError(
                        f"clip {int(mid)} has {n} samples < {frames} frames"
                    )
                mono = samples.astype(np.int64).sum(axis=1)
                bounds = (np.arange(frames, dtype=np.int64) * n) // frames
                energy = np.add.reduceat(mono * mono, bounds)
                bits = (energy[1:] > energy[:-1]).astype(np.uint64)
                weights = np.left_shift(
                    np.uint64(1), np.arange(frames - 1, dtype=np.uint64)
                )
                fps.append(int((bits * weights).sum()))
                ids.append(int(mid))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "fp": pd.Series(fps, dtype="int64"),
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        _fp, schema="media_id long, fp long"
    )


def encode_y4m(
    frames: np.ndarray, fps_num: int = 30, fps_den: int = 1
) -> bytes:
    """Encode an (n_frames, n_planes, h, w) uint8 array as a standard
    YUV4MPEG2 stream — plain-text stream header, ``FRAME\\n`` markers,
    raw planes — i.e. a file ffmpeg/mpv open, not a private container.
    3 planes write ``C444`` (full-resolution Y/U/V, no subsampling
    arithmetic to fake), 1 plane writes ``Cmono``."""
    if frames.ndim != 4 or frames.dtype != np.uint8:
        raise ValueError("encode_y4m wants (n_frames, n_planes, h, w) uint8")
    n, p, h, w = frames.shape
    if p == 3:
        cs = "C444"
    elif p == 1:
        cs = "Cmono"
    else:
        raise ValueError(f"encode_y4m supports 1 or 3 planes, got {p}")
    out = [f"YUV4MPEG2 W{w} H{h} F{fps_num}:{fps_den} Ip A1:1 {cs}\n".encode()]
    for t in range(n):
        out.append(b"FRAME\n")
        out.append(frames[t].tobytes())
    return b"".join(out)


def decode_y4m(raw: bytes) -> tuple[int, int, np.ndarray]:
    """Parse YUV4MPEG2 bytes -> (fps_num, fps_den, (n_frames, n_planes,
    h, w) uint8 array). Handles C444 (3 full planes) and Cmono (1 plane);
    unknown header tags (X...) and per-frame parameter lines are skipped,
    per the spec. C420/C422 would need subsample-aware plane shapes and
    raise ValueError loudly — decode errors should be quarantined by the
    caller's filter, not silently faked."""
    eol = raw.index(b"\n")
    fields = raw[:eol].split(b" ")
    if fields[0] != b"YUV4MPEG2":
        raise ValueError(f"unrecognized video magic {raw[:9]!r}")
    w = h = 0
    fps_num, fps_den, cs = 30, 1, b"C420jpeg"  # spec default colourspace
    for tag in fields[1:]:
        if not tag:
            continue
        key, val = tag[:1], tag[1:]
        if key == b"W":
            w = int(val)
        elif key == b"H":
            h = int(val)
        elif key == b"F":
            num, den = val.split(b":")
            fps_num, fps_den = int(num), int(den)
        elif key == b"C":
            cs = tag
    if cs == b"C444":
        n_planes = 3
    elif cs == b"Cmono":
        n_planes = 1
    else:
        raise ValueError(f"unsupported Y4M colourspace {cs!r}")
    if w <= 0 or h <= 0:
        raise ValueError("Y4M header missing W/H")
    frame_bytes = n_planes * h * w
    frames, pos = [], eol + 1
    while pos < len(raw):
        if raw[pos : pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at byte {pos}")
        pos = raw.index(b"\n", pos) + 1  # frame params (if any) end at \n
        plane = np.frombuffer(raw, dtype=np.uint8, count=frame_bytes, offset=pos)
        frames.append(plane.reshape(n_planes, h, w))
        pos += frame_bytes
    return fps_num, fps_den, np.stack(frames) if frames else np.zeros(
        (0, n_planes, h, w), dtype=np.uint8
    )


def synthetic_y4m_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL-format video corpus: one valid Y4M C444 clip per
    input row — w = 4 + id%9, h = 4 + id%7, n_frames = 2 + id%5, fps =
    (24 + (id%2)*6):1, plane value(t, p, y, x) =
    (x*3 + y*5 + t*17 + p*29 + id) % 256.

    The plane rule is closed-form in (id, t, p, y, x), so a foreign
    engine can compute expected decode outputs (frame counts, plane sums)
    in pure SQL without a video parser — which gives the real-decode
    catalog query a full value oracle (same trick as
    ``synthetic_bmp_media`` / ``synthetic_wav_media``)."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid in pdf[id_col]:
                mid = int(mid)
                w, h = 4 + mid % 9, 4 + mid % 7
                n = 2 + mid % 5
                t = np.arange(n, dtype=np.int64)[:, None, None, None]
                p = np.arange(3, dtype=np.int64)[None, :, None, None]
                y = np.arange(h, dtype=np.int64)[None, None, :, None]
                x = np.arange(w, dtype=np.int64)[None, None, None, :]
                frames = ((x * 3 + y * 5 + t * 17 + p * 29 + mid) % 256).astype(
                    np.uint8
                )
                payloads.append(
                    encode_y4m(frames, fps_num=24 + (mid % 2) * 6, fps_den=1)
                )
            yield pd.DataFrame(
                {"media_id": pdf[id_col].astype("int64"), "payload": payloads}
            )

    from data_algorithms_with_pyspark_spark.operators.dedup import (
        spread_partitions,
    )

    return spread_partitions(docs.select(id_col)).mapInPandas(
        _gen, schema="media_id long, payload binary"
    )


_VIDEO_SCHEMA = (
    "media_id long, n_frames int, height int, width int, fps_num int, "
    "duration_ms long, pixel_sum long, y_sum long"
)


def decode_video_batch(media: DataFrame) -> DataFrame:
    """Decode Y4M payloads to (n_frames, height, width, fps_num,
    duration_ms, pixel_sum, y_sum) — the metadata+checksum pass of a
    video ingest pipeline, really walking FRAME markers inside the Arrow
    batches. ``duration_ms`` floors n_frames*1000*fps_den/fps_num so it
    is exact integer arithmetic on every engine; ``y_sum`` checksums the
    luma plane alone (what a perceptual-dedup stage would hash)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ns, hs, ws, fps, durs, sums, ysums = [], [], [], [], [], [], []
            for payload in pdf["payload"]:
                fps_num, fps_den, frames = decode_y4m(bytes(payload))
                n = frames.shape[0]
                ns.append(n)
                hs.append(frames.shape[2])
                ws.append(frames.shape[3])
                fps.append(fps_num)
                durs.append(n * 1000 * fps_den // fps_num)
                sums.append(int(frames.sum(dtype=np.int64)))
                ysums.append(int(frames[:, 0].sum(dtype=np.int64)) if n else 0)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_frames": pd.Series(ns, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "width": pd.Series(ws, dtype="int32"),
                    "fps_num": pd.Series(fps, dtype="int32"),
                    "duration_ms": pd.Series(durs, dtype="int64"),
                    "pixel_sum": pd.Series(sums, dtype="int64"),
                    "y_sum": pd.Series(ysums, dtype="int64"),
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        _decode, schema=_VIDEO_SCHEMA
    )


_SAMPLED_FRAME_SCHEMA = (
    "media_id long, frame_idx int, height int, width int, frame_bytes binary"
)


def video_framehash_fingerprint_batch(
    media: DataFrame, grid: int = 8
) -> DataFrame:
    """Per-clip video fingerprint: the ORDERED SEQUENCE of per-frame
    56-bit spatial dHashes (``image_dhash_batch`` applied to every
    frame, luma = sum of planes) — the frame-hash-sequence key video
    dedup pipelines group on: re-containered or re-tagged copies
    collide, re-edits (dropped / reordered frames) do not.

    Really decodes (``decode_y4m``) inside Arrow batches; all-integer,
    so a foreign engine replays every frame hash from the synthetic
    corpus's closed-form plane rule and rebuilds the sequence with an
    ordered list aggregate. Output: (media_id, fp_seq array<long>);
    dedup is one hash aggregate on the (tiny) sequence.
    """
    if grid < 2:
        raise ValueError("grid must be >= 2")

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, seqs = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _fn, _fd, frames = decode_y4m(bytes(payload))
                h, w = frames.shape[2], frames.shape[3]
                xs = (np.arange(grid, dtype=np.int64) * w) // grid
                ys = (np.arange(grid, dtype=np.int64) * h) // grid
                weights = np.left_shift(
                    np.uint64(1),
                    np.arange(grid * (grid - 1), dtype=np.uint64),
                )
                seq = []
                for t in range(frames.shape[0]):
                    luma = frames[t].astype(np.int64).sum(axis=0)
                    sampled = luma[np.ix_(ys, xs)]
                    bits = sampled[:, 1:] > sampled[:, :-1]
                    seq.append(
                        int((bits.flatten().astype(np.uint64) * weights).sum())
                    )
                ids.append(int(mid))
                seqs.append(seq)
            yield pd.DataFrame({"media_id": ids, "fp_seq": seqs})

    return media.select("media_id", "payload").mapInPandas(
        _fp, schema="media_id long, fp_seq array<long>"
    )


def sample_video_frames(
    media: DataFrame, stride: int = 2, max_frames: int = 4
) -> DataFrame:
    """REAL video frame sampling: decode Y4M, keep every ``stride``-th
    frame (at most ``max_frames``), and emit each kept frame as a
    standalone P6 PPM image whose (R, G, B) bytes are the frame's
    (Y, U, V) planes verbatim (mono replicates Y) — lossless, integer-
    only, and directly decodable by ``decode_image``, so a sampled frame
    can flow into the image pipeline (resize/feature-extract) unchanged.
    1-to-many Arrow batches: the exploding shape real frame extraction
    has, with real bytes."""
    if stride < 1:
        raise ValueError("stride must be >= 1")

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_h, out_w, out_bytes = [], [], [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                _, _, frames = decode_y4m(bytes(payload))
                n, n_planes, h, w = frames.shape
                for frame_idx in range(0, n, stride)[:max_frames]:
                    fr = frames[frame_idx]
                    if n_planes == 1:
                        fr = np.repeat(fr, 3, axis=0)
                    # planes (3, h, w) -> interleaved (h, w, 3) PPM body
                    body = np.ascontiguousarray(
                        fr.transpose(1, 2, 0)
                    ).tobytes()
                    out_ids.append(media_id)
                    out_idx.append(frame_idx)
                    out_h.append(h)
                    out_w.append(w)
                    out_bytes.append(f"P6 {w} {h} 255\n".encode() + body)
            yield pd.DataFrame(
                {
                    "media_id": out_ids,
                    "frame_idx": pd.Series(out_idx, dtype="int32"),
                    "height": pd.Series(out_h, dtype="int32"),
                    "width": pd.Series(out_w, dtype="int32"),
                    "frame_bytes": out_bytes,
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        _frames, schema=_SAMPLED_FRAME_SCHEMA
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
    media: DataFrame, height: int = 32, width: int = 32, fake: bool = False
) -> DataFrame:
    """Resize images to a fixed (height, width); constant-size outputs
    from variable-size inputs — the property a training pipeline needs.

    Default path REALLY resizes: ``decode_image`` (BMP/P6) + nearest-
    neighbor resampling, emitting the resized image re-encoded as a BMP
    payload (still a valid, viewable file). ``fake=True`` keeps the
    byte-strided stand-in for non-image payloads (text bytes in
    pipeline-shape tests): it samples exactly height*width bytes.
    """

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_out = height * width
        for pdf in batches:
            outs = []
            for payload in pdf["payload"]:
                if fake:
                    arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                    if len(arr) == 0:
                        arr = np.zeros(1, dtype=np.uint8)
                    idx = (np.arange(n_out) * len(arr)) // n_out
                    outs.append(arr[idx].tobytes())
                    continue
                px = decode_image(bytes(payload))
                h0, w0 = px.shape[:2]
                yi = (np.arange(height) * h0) // height
                xi = (np.arange(width) * w0) // width
                outs.append(encode_bmp(px[yi][:, xi]))
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
