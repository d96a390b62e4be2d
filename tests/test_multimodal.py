import numpy as np
import pytest
from pyspark.sql import functions as F

from imagery_utils_spark.sources import multimodal as MM


@pytest.fixture(scope="module")
def media(spark):
    return MM.synthesize_media(spark, n=16, partitions=4).cache()


def test_blob_roundtrip():
    blob = MM.encode_fake_blob(8, 6, 3, seed=5)
    arr = MM.decode_fake_blob(blob)
    assert arr.shape == (6, 8, 3)
    blob2 = MM.encode_fake_blob(8, 6, 3, seed=5)
    assert blob == blob2  # deterministic


def test_media_table(spark, media):
    rows = media.collect()
    assert len(rows) == 16
    kinds = {r.media_id: r.kind for r in rows}
    assert kinds[0] == "video" and kinds[1] == "image"
    r0 = next(r for r in rows if r.media_id == 0)
    assert r0.meta.n_frames == 4
    assert len(r0.blob) == 4 * (16 + r0.meta.width * r0.meta.height * 3)


def test_extract_features_matches_numpy(spark, media):
    feats = {r.media_id: r for r in MM.extract_features(media).collect()}
    r = media.filter("media_id = 1").first()
    frame = MM.decode_fake_blob(bytes(r.blob))
    exp_mean = frame.reshape(-1, 3).mean(axis=0)
    got = feats[1]
    assert np.allclose(got.channel_means, exp_mean)
    assert sum(got.histogram) == frame.size


def test_resize(spark, media):
    out = MM.resize(media, 8, 8)
    r = out.filter("media_id = 3").first()
    assert r.meta.width == 8 and r.meta.height == 8
    arr = MM.decode_fake_blob(bytes(r.blob))
    assert arr.shape == (8, 8, 3)


def test_sample_frames(spark, media):
    frames = MM.sample_frames(media, every=2).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r.media_id, []).append(r.frame_idx)
    assert sorted(by_media[0]) == [0, 2]   # video: frames 0,2 of 4
    assert by_media[1] == [0]              # image: single frame
    f2 = next(r for r in frames if r.media_id == 0 and r.frame_idx == 2)
    assert MM.decode_fake_blob(bytes(f2.blob)).shape[2] == 3


def test_unimplemented_backend_raises(spark, media):
    with pytest.raises(Exception) as exc:
        MM.extract_features(media, backend="pillow").collect()
    assert "NotImplementedError" in str(exc.value) or "decode backend" in str(exc.value)
