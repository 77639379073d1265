"""Multimodal plumbing tests: schema/batch shapes of the mapInPandas
pipeline are real even though decode is stubbed."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_algorithms_with_pyspark_spark.operators.multimodal import (
    binary_metadata,
    decode_image_batch,
    extract_features,
    frame_sample,
    with_binary_payload,
)
from data_algorithms_with_pyspark_spark.sources.readers import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def media(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(20)
    return with_binary_payload(docs).cache()


def test_payload_schema_and_metadata(spark, media):
    assert dict(media.dtypes)["payload"] == "binary"
    meta = binary_metadata(media)
    rows = meta.collect()
    assert len(rows) == 20
    assert all(len(r["sha256"]) == 64 for r in rows)
    assert all(r["n_bytes"] > 0 for r in rows)


def test_decode_stub_runs_distributed(spark, media):
    decoded = decode_image_batch(media, fake=True)
    rows = decoded.collect()
    assert len(rows) == 20
    assert all(r["height"] >= 16 and r["width"] >= 16 for r in rows)
    assert dict(decoded.dtypes) == {
        "media_id": "bigint",
        "height": "int",
        "width": "int",
        "n_channels": "int",
    }


def test_decode_unstubbed_raises(spark, media):
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception) as exc_info:
        decode_image_batch(media, fake=False).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, Py4JJavaError
    )


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


def test_resize_image_constant_output_size(spark):
    from data_algorithms_with_pyspark_spark.operators.multimodal import (
        resize_image,
        with_binary_payload,
    )
    from data_algorithms_with_pyspark_spark.sources.readers import load_table

    docs = load_table(spark, SF_SMOKE, "documents").limit(20)
    media = with_binary_payload(docs)
    out = resize_image(media, height=8, width=4).collect()
    assert len(out) == 20
    for r in out:
        assert r["height"] == 8 and r["width"] == 4
        assert len(r["resized"]) == 32  # constant-size regardless of input


def test_resize_image_real_decode_stub_raises(spark):
    from data_algorithms_with_pyspark_spark.operators.multimodal import (
        resize_image,
        with_binary_payload,
    )
    from data_algorithms_with_pyspark_spark.sources.readers import load_table

    import pytest as _pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import PythonException

    docs = load_table(spark, SF_SMOKE, "documents").limit(2)
    media = with_binary_payload(docs)
    with _pytest.raises((PythonException, Py4JJavaError)):
        resize_image(media, fake=False).collect()
