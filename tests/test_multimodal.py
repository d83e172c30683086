"""Multimodal binary-column plumbing (stubbed decode, real Spark paths)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jde_to_datalake_spark.multimodal import binary_ops as M
from jde_to_datalake_spark.session import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def media(spark):
    docs = load_table(spark, SF_DIR, "documents")
    return M.synthesize_media(docs)


def test_media_schema(media):
    assert dict(media.dtypes)["content"] == "binary"
    assert media.count() > 0


def test_decode_stub_raises_without_decoder(media):
    with pytest.raises(NotImplementedError):
        M.decode_image(media)


def test_fake_decode_deterministic(media, spark):
    a = {r["media_id"]: (r["width"], r["height"], r["content_sha"])
         for r in M.fake_decode_image(media).collect()}
    b = {r["media_id"]: (r["width"], r["height"], r["content_sha"])
         for r in M.fake_decode_image(media.repartition(7)).collect()}
    assert a == b  # partitioning-independent
    w, h, _ = next(iter(a.values()))
    assert 1 <= w <= 1920 and 1 <= h <= 1080


def test_feature_extraction_shape(media):
    out = M.extract_features(media, dim=8)
    row = out.limit(1).collect()[0]
    assert len(row["features"]) == 8
    assert all(0.0 <= v <= 1.0 for v in row["features"])


def test_frame_sampling(media):
    out = M.frame_sample(media.limit(10), every_n=2, n_frames=6)
    per_media = out.groupBy("media_id").count().collect()
    assert all(r["count"] == 3 for r in per_media)  # ceil(6/2)
    assert dict(out.dtypes)["frame_bytes"] == "binary"


def test_resize_fits_bounds_and_preserves_aspect(media, spark):
    decoded = {r["media_id"]: (r["width"], r["height"])
               for r in M.fake_decode_image(media).collect()}
    resized = M.resize_image(media, max_w=224, max_h=224).collect()
    assert len(resized) == len(decoded)
    for r in resized:
        w0, h0 = decoded[r["media_id"]]
        assert 1 <= r["width"] <= 224 and 1 <= r["height"] <= 224
        # aspect preserved within integer truncation
        scale = min(224 / w0, 224 / h0, 1.0)
        assert r["width"] == max(1, int(w0 * scale))
        assert r["height"] == max(1, int(h0 * scale))
        assert isinstance(r["content"], (bytes, bytearray))
    # output stays an opaque binary column for downstream ops
    assert dict(M.resize_image(media).dtypes)["content"] == "binary"
