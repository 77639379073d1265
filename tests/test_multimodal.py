"""Multimodal tests: the mapInPandas batch plumbing AND the real BMP/PPM
decode path (pure-numpy codec — no image libraries involved)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_algorithms_with_pyspark_spark.operators.multimodal import (
    binary_metadata,
    decode_image,
    decode_image_batch,
    encode_bmp,
    extract_features,
    frame_sample,
    resize_image,
    synthetic_bmp_media,
    with_binary_payload,
)
from data_algorithms_with_pyspark_spark.sources.readers import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def media(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(20)
    return with_binary_payload(docs).cache()


@pytest.fixture(scope="module")
def bmp_media(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(20)
    return synthetic_bmp_media(docs).cache()


def test_payload_schema_and_metadata(spark, media):
    assert dict(media.dtypes)["payload"] == "binary"
    meta = binary_metadata(media)
    rows = meta.collect()
    assert len(rows) == 20
    assert all(len(r["sha256"]) == 64 for r in rows)
    assert all(r["n_bytes"] > 0 for r in rows)


def test_bmp_roundtrip_local():
    rng = np.random.default_rng(7)
    for h, w in [(1, 1), (5, 7), (11, 13)]:
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert (decode_image(encode_bmp(px)) == px).all()


def test_ppm_decode_local():
    ppm = b"P6\n# comment\n7 5\n255\n" + bytes(range(7 * 5 * 3))
    px = decode_image(ppm)
    assert px.shape == (5, 7, 3)
    assert px.flatten().tolist() == list(range(105))


def test_decode_image_rejects_garbage():
    with pytest.raises(ValueError):
        decode_image(b"not an image at all")


def test_real_decode_distributed(spark, bmp_media):
    decoded = decode_image_batch(bmp_media, fake=False)
    rows = {r["media_id"]: r for r in decoded.collect()}
    assert len(rows) == 20
    assert dict(decoded.dtypes) == {
        "media_id": "bigint",
        "height": "int",
        "width": "int",
        "n_channels": "int",
        "pixel_sum": "bigint",
    }
    for mid, r in rows.items():
        w, h = 4 + mid % 13, 4 + mid % 11
        assert (r["width"], r["height"], r["n_channels"]) == (w, h, 3)
        x = np.arange(w, dtype=np.int64)[None, :]
        y = np.arange(h, dtype=np.int64)[:, None]
        expect = int(
            (((x * 7 + mid) % 256) + ((y * 11 + mid) % 256)).sum()
            + ((x + y + mid) % 256).sum()
        )
        assert r["pixel_sum"] == expect


def test_decode_fake_path_still_runs(spark, media):
    decoded = decode_image_batch(media, fake=True)
    rows = decoded.collect()
    assert len(rows) == 20
    assert all(r["height"] >= 16 and r["width"] >= 16 for r in rows)


def test_feature_extraction_shape(spark, media):
    feats = extract_features(media, dim=8)
    rows = feats.collect()
    assert len(rows) == 20
    assert all(len(r["feature"]) == 8 for r in rows)
    # deterministic fake: histogram normalized to ~1
    assert all(abs(sum(r["feature"]) - 1.0) < 1e-3 for r in rows)


def test_frame_sampling_one_to_many(spark, media):
    frames = frame_sample(media, every_n_bytes=64, max_frames=3)
    per_media = (
        frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    )
    assert len(per_media) == 20
    assert all(1 <= r["n"] <= 3 for r in per_media)


def test_resize_fake_constant_output_size(spark, media):
    out = resize_image(media, height=8, width=4, fake=True).collect()
    assert len(out) == 20
    for r in out:
        assert r["height"] == 8 and r["width"] == 4
        assert len(r["resized"]) == 32  # constant-size regardless of input


def test_resize_real_decodes_and_reencodes(spark, bmp_media):
    out = resize_image(bmp_media, height=6, width=5, fake=False).collect()
    assert len(out) == 20
    for r in out:
        px = decode_image(bytes(r["resized"]))
        assert px.shape == (6, 5, 3)
    # nearest-neighbor of the synthetic rule is checkable exactly
    mid = out[0]["media_id"]
    w0, h0 = 4 + mid % 13, 4 + mid % 11
    yi = (np.arange(6) * h0) // 6
    xi = (np.arange(5) * w0) // 5
    x = np.arange(w0, dtype=np.int64)[None, :]
    y = np.arange(h0, dtype=np.int64)[:, None]
    src = np.empty((h0, w0, 3), dtype=np.uint8)
    src[:, :, 0] = (x * 7 + mid) % 256
    src[:, :, 1] = (y * 11 + mid) % 256
    src[:, :, 2] = (x + y + mid) % 256
    got = decode_image(bytes(out[0]["resized"]))
    assert (got == src[yi][:, xi]).all()


# --- audio: RIFF/WAVE PCM ---------------------------------------------------


def test_wav_roundtrip_local():
    from data_algorithms_with_pyspark_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    rng = np.random.default_rng(11)
    for n, ch, rate in [(1, 1, 8000), (240, 2, 44100), (97, 3, 16000)]:
        samples = rng.integers(-32768, 32768, (n, ch)).astype(np.int16)
        rate_out, decoded = decode_wav(encode_wav(samples, rate))
        assert rate_out == rate
        assert (decoded == samples).all()


def test_wav_chunk_walk_and_8bit():
    """Files with extra chunks (LIST before data, odd-sized, padded) and
    8-bit PCM must parse — the parser walks chunks, it doesn't assume our
    encoder's canonical layout."""
    import struct

    from data_algorithms_with_pyspark_spark.operators.multimodal import decode_wav

    pcm8 = bytes([0, 128, 255])  # -> centered int16: -32768, 0, 32512
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, 8000, 8000, 1, 8)
    info = struct.pack("<4sI", b"LIST", 5) + b"INFOx" + b"\x00"  # odd + pad
    data = struct.pack("<4sI", b"data", len(pcm8)) + pcm8 + b"\x00"
    body = b"WAVE" + fmt + info + data
    raw = struct.pack("<4sI", b"RIFF", len(body)) + body
    rate, samples = decode_wav(raw)
    assert rate == 8000
    assert samples[:, 0].tolist() == [-32768, 0, 32512]


def test_wav_rejects_garbage_and_nonpcm():
    import struct

    from data_algorithms_with_pyspark_spark.operators.multimodal import decode_wav

    with pytest.raises(ValueError):
        decode_wav(b"not audio")
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 3, 1, 8000, 32000, 4, 32)
    body = b"WAVE" + fmt + struct.pack("<4sI", b"data", 0)
    with pytest.raises(ValueError):
        decode_wav(struct.pack("<4sI", b"RIFF", len(body)) + body)


# --- video: YUV4MPEG2 -------------------------------------------------------


def test_y4m_roundtrip_local():
    from data_algorithms_with_pyspark_spark.operators.multimodal import (
        decode_y4m,
        encode_y4m,
    )

    rng = np.random.default_rng(13)
    for n, p, h, w in [(1, 3, 2, 2), (4, 3, 5, 7), (3, 1, 6, 4)]:
        frames = rng.integers(0, 256, (n, p, h, w), dtype=np.uint8)
        num, den, decoded = decode_y4m(encode_y4m(frames, 25, 2))
        assert (num, den) == (25, 2)
        assert decoded.shape == (n, p, h, w)
        assert (decoded == frames).all()


def test_y4m_frame_params_and_unknown_tags():
    """Per-frame parameter lines (FRAME Ixyz\\n) and unknown stream tags
    (Xfoo) must parse — the parser follows the spec, not just our own
    encoder's canonical output."""
    from data_algorithms_with_pyspark_spark.operators.multimodal import decode_y4m

    plane = bytes(range(6))  # 3x2 mono frame
    raw = (
        b"YUV4MPEG2 W3 H2 F30000:1001 Ip A1:1 Cmono Xcustom\n"
        + b"FRAME Ixyz\n" + plane
        + b"FRAME\n" + plane[::-1]
    )
    num, den, frames = decode_y4m(raw)
    assert (num, den) == (30000, 1001)
    assert frames.shape == (2, 1, 2, 3)
    assert frames[0].flatten().tolist() == list(range(6))
    assert frames[1].flatten().tolist() == list(range(5, -1, -1))


def test_y4m_rejects_garbage_and_subsampled():
    from data_algorithms_with_pyspark_spark.operators.multimodal import decode_y4m

    with pytest.raises(ValueError):
        decode_y4m(b"not a video")
    with pytest.raises(ValueError):  # C420 default needs subsample support
        decode_y4m(b"YUV4MPEG2 W4 H4 F30:1\nFRAME\n" + bytes(24))


def test_real_video_decode_distributed(spark):
    from data_algorithms_with_pyspark_spark.operators.multimodal import (
        decode_video_batch,
        synthetic_y4m_media,
    )

    docs = load_table(spark, SF_SMOKE, "documents").limit(20)
    decoded = decode_video_batch(synthetic_y4m_media(docs))
    rows = {r["media_id"]: r for r in decoded.collect()}
    assert len(rows) == 20
    for mid, r in rows.items():
        w, h, n = 4 + mid % 9, 4 + mid % 7, 2 + mid % 5
        fps = 24 + (mid % 2) * 6
        assert (r["n_frames"], r["height"], r["width"], r["fps_num"]) == (
            n, h, w, fps,
        )
        assert r["duration_ms"] == n * 1000 // fps
        t = np.arange(n, dtype=np.int64)[:, None, None, None]
        p = np.arange(3, dtype=np.int64)[None, :, None, None]
        y = np.arange(h, dtype=np.int64)[None, None, :, None]
        x = np.arange(w, dtype=np.int64)[None, None, None, :]
        vals = (x * 3 + y * 5 + t * 17 + p * 29 + mid) % 256
        assert r["pixel_sum"] == int(vals.sum())
        assert r["y_sum"] == int(vals[:, 0].sum())


def test_video_frames_feed_image_pipeline(spark):
    """Sampled frames are REAL P6 images: stride/max caps hold, and the
    image decoder reproduces the frame planes exactly (video -> frame ->
    image-pipeline composition, all real bytes)."""
    from data_algorithms_with_pyspark_spark.operators.multimodal import (
        sample_video_frames,
        synthetic_y4m_media,
    )

    docs = load_table(spark, SF_SMOKE, "documents").limit(20)
    frames = sample_video_frames(
        synthetic_y4m_media(docs), stride=2, max_frames=2
    ).collect()
    by_media: dict[int, list] = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r)
    assert len(by_media) == 20
    for mid, rs in by_media.items():
        n = 2 + mid % 5
        assert sorted(r["frame_idx"] for r in rs) == list(range(0, n, 2))[:2]
        for r in rs:
            px = decode_image(bytes(r["frame_bytes"]))  # (h, w, 3) = Y/U/V
            w, h, t = 4 + mid % 9, 4 + mid % 7, r["frame_idx"]
            assert px.shape == (h, w, 3)
            p = np.arange(3, dtype=np.int64)[None, None, :]
            y = np.arange(h, dtype=np.int64)[:, None, None]
            x = np.arange(w, dtype=np.int64)[None, :, None]
            assert (px == (x * 3 + y * 5 + t * 17 + p * 29 + mid) % 256).all()


def test_real_audio_decode_distributed(spark):
    from data_algorithms_with_pyspark_spark.operators.multimodal import (
        decode_audio_batch,
        synthetic_wav_media,
    )

    docs = load_table(spark, SF_SMOKE, "documents").limit(20)
    decoded = decode_audio_batch(synthetic_wav_media(docs))
    rows = {r["media_id"]: r for r in decoded.collect()}
    assert len(rows) == 20
    for mid, r in rows.items():
        n, ch = 200 + mid % 57, 1 + mid % 2
        rate = 8000 + (mid % 3) * 4000
        assert (r["sample_rate"], r["n_channels"], r["n_samples"]) == (rate, ch, n)
        assert r["duration_ms"] == n * 1000 // rate
        i = np.arange(n, dtype=np.int64)[:, None]
        c = np.arange(ch, dtype=np.int64)[None, :]
        samples = (i * 37 + c * 11 + mid * 7) % 4001 - 2000
        assert r["sample_sum"] == int(samples.sum())
        assert r["abs_peak"] == int(np.abs(samples).max())


def test_image_dhash_known_answer(spark):
    import numpy as np

    from data_algorithms_with_pyspark_spark.operators.multimodal import (
        encode_bmp,
        image_dhash_batch,
    )

    # 8x8 image with luma strictly increasing in x: every gradient bit
    # fires -> all 56 bits set.
    x = np.arange(8, dtype=np.int64)[None, :]
    inc = np.zeros((8, 8, 3), dtype=np.uint8)
    inc[:, :, 0] = (x * 3).astype(np.uint8)
    # constant image: no strict increase anywhere -> hash 0
    flat = np.full((8, 8, 3), 77, dtype=np.uint8)
    media = spark.createDataFrame(
        [(1, encode_bmp(inc)), (2, encode_bmp(flat)), (3, encode_bmp(inc))],
        "media_id long, payload binary",
    )
    got = {r["media_id"]: r["dhash"] for r in image_dhash_batch(media).collect()}
    assert got[1] == (1 << 56) - 1
    assert got[2] == 0
    assert got[3] == got[1]  # identical bytes -> identical hash


def test_image_dhash_rejects_bad_grid(spark):
    import pytest as _pytest

    from data_algorithms_with_pyspark_spark.operators.multimodal import (
        image_dhash_batch,
    )

    media = spark.createDataFrame([(1, b"")], "media_id long, payload binary")
    with _pytest.raises(ValueError):
        image_dhash_batch(media, grid=1)


def test_audio_fingerprint_known_answer(spark):
    import numpy as np

    from data_algorithms_with_pyspark_spark.operators.multimodal import (
        audio_energy_fingerprint_batch,
        encode_wav,
    )

    # 8 samples, 4 frames of 2: energies [2, 200, 2, 20000] -> gradient
    # signs (up, down, up) -> bits 0b101 = 5
    s = np.array(
        [[1], [1], [10], [10], [1], [1], [100], [100]], dtype=np.int16
    )
    quiet = np.zeros((8, 1), dtype=np.int16)  # flat envelope -> fp 0
    media = spark.createDataFrame(
        [(1, encode_wav(s, 8000)), (2, encode_wav(quiet, 8000)),
         (3, encode_wav(s, 16000))],
        "media_id long, payload binary",
    )
    got = {
        r["media_id"]: r["fp"]
        for r in audio_energy_fingerprint_batch(media, frames=4).collect()
    }
    assert got[1] == 0b101
    assert got[2] == 0
    assert got[3] == got[1]  # rate does not change the envelope hash


def test_audio_fingerprint_guards(spark):
    import numpy as np
    import pytest as _pytest

    from data_algorithms_with_pyspark_spark.operators.multimodal import (
        audio_energy_fingerprint_batch,
        encode_wav,
    )

    tiny = np.zeros((3, 1), dtype=np.int16)
    media = spark.createDataFrame(
        [(1, encode_wav(tiny, 8000))], "media_id long, payload binary"
    )
    with _pytest.raises(ValueError):
        audio_energy_fingerprint_batch(media, frames=1)
    with _pytest.raises(Exception):  # 3 samples < 4 frames surfaces loudly
        audio_energy_fingerprint_batch(media, frames=4).collect()


def test_video_framehash_sequence_known_answer(spark):
    import numpy as np

    from data_algorithms_with_pyspark_spark.operators.multimodal import (
        encode_y4m,
        video_framehash_fingerprint_batch,
    )

    x = np.arange(8, dtype=np.int64)[None, None, :]
    inc = np.zeros((1, 8, 8), dtype=np.uint8)
    inc[0] = (x * 3).astype(np.uint8)  # luma increasing in x -> all bits
    flat = np.full((1, 8, 8), 9, dtype=np.uint8)
    clip_a = encode_y4m(np.stack([inc, flat]), 24, 1)  # frames: inc, flat
    clip_b = encode_y4m(np.stack([flat, inc]), 24, 1)  # reversed order
    clip_c = encode_y4m(np.stack([inc, flat]), 30, 1)  # fps must not matter
    media = spark.createDataFrame(
        [(1, clip_a), (2, clip_b), (3, clip_c)],
        "media_id long, payload binary",
    )
    got = {
        r["media_id"]: tuple(r["fp_seq"])
        for r in video_framehash_fingerprint_batch(media).collect()
    }
    full = (1 << 56) - 1
    assert got[1] == (full, 0)
    assert got[2] == (0, full)  # ORDER matters: re-edit does not collide
    assert got[3] == got[1]  # container metadata does not matter


def test_video_framehash_rejects_bad_grid(spark):
    import pytest as _pytest

    from data_algorithms_with_pyspark_spark.operators.multimodal import (
        video_framehash_fingerprint_batch,
    )

    media = spark.createDataFrame([(1, b"")], "media_id long, payload binary")
    with _pytest.raises(ValueError):
        video_framehash_fingerprint_batch(media, grid=0)
