"""Multimodal plumbing gates: the binary-column → Arrow batch → feature
pipeline is deterministic, partitioning-invariant, and the strict mode
fails exactly at the decoder hook."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from search_engine_spark.operators.multimodal import (FEATURE_DIM,
                                                      decode_features,
                                                      frame_sample,
                                                      media_stats,
                                                      synthetic_media)


@pytest.fixture(scope="module")
def media(spark):
    return synthetic_media(spark, n=48).cache()


def test_decode_features_shape_and_determinism(spark, media):
    f1 = decode_features(media).collect()
    assert len(f1) == 48
    for r in f1:
        assert r.decode_ok and len(r.features) == FEATURE_DIM
        assert r.n_bytes > 0
    # partitioning-invariant: same rows under a different layout
    f2 = decode_features(media.repartition(7)).collect()
    k = lambda rows: sorted((r.media_id, tuple(r.features)) for r in rows)  # noqa: E731
    assert k(f1) == k(f2)


def test_strict_mode_raises_at_decoder_hook(spark, media):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException
    with pytest.raises((PythonException, Py4JJavaError)) as ei:
        decode_features(media, strict=True).collect()
    assert "NotImplementedError" in str(ei.value)


def test_frame_sample_only_touches_video_metadata(spark, media):
    fs = frame_sample(media, every_n_bytes=64, max_frames=4)
    rows = fs.collect()
    assert len(rows) > 0
    n_video = media.where(F.col("mime").startswith("video")).count()
    assert {r.media_id for r in rows} == set(
        r.media_id for r in media.where(F.col("mime").startswith("video")).collect())
    assert all(0 <= r.frame_no < 4 and r.byte_offset == r.frame_no * 64 for r in rows)
    assert len(rows) <= n_video * 4


def test_media_stats_metadata_only(spark, media):
    st = {r.mime: r for r in media_stats(media).collect()}
    assert set(st) == {"image/png", "image/jpeg", "audio/wav", "video/mp4"}
    assert all(r.n == 12 and r.total_bytes > 0 for r in st.values())
    assert st["image/png"].max_width is not None
    assert st["audio/wav"].max_width is None
