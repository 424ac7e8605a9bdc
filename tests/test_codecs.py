"""Pure-numpy codecs (operators/codecs.py) + the now-real fake=False path of
the multimodal operators: container-free formats decode genuinely; the
entropy-coded boundary still raises (honest seam for PIL/ffmpeg)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.operators import codecs
from graph_data_science_spark.operators.multimodal import (
    extract_features,
    resize_stub,
    synth_decodable_media,
    synth_media,
)


def test_ppm_roundtrip():
    img = np.random.RandomState(0).randint(0, 256, size=(13, 17, 3), dtype=np.uint8)
    assert np.array_equal(codecs.decode_ppm(codecs.encode_ppm(img)), img)


def test_ppm_with_comment_header():
    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    payload = b"P6\n# a comment\n3 2\n255\n" + img.tobytes()
    assert np.array_equal(codecs.decode_ppm(payload), img)


def test_bmp_roundtrip_includes_row_padding():
    # width 3 -> 9-byte rows padded to 12: exercises the stride logic
    img = np.random.RandomState(1).randint(0, 256, size=(5, 3, 3), dtype=np.uint8)
    assert np.array_equal(codecs.decode_bmp(codecs.encode_bmp(img)), img)


def test_wav_roundtrip_mono_and_stereo():
    x = np.linspace(-0.9, 0.9, 1000)
    y, rate = codecs.decode_wav(codecs.encode_wav(x, 16000))
    assert rate == 16000 and y.shape == (1000, 1)
    assert np.allclose(y[:, 0], x, atol=1.0 / 32768)
    st = np.stack([x, -x], axis=1)
    y2, _ = codecs.decode_wav(codecs.encode_wav(st, 8000))
    assert y2.shape == (1000, 2)
    assert np.allclose(y2, st, atol=1.0 / 32768)


def test_resize_nearest_shapes_and_identity():
    img = np.random.RandomState(2).randint(0, 256, size=(10, 20, 3), dtype=np.uint8)
    assert codecs.resize_nearest(img, 40, 5).shape == (5, 40, 3)
    assert np.array_equal(codecs.resize_nearest(img, 20, 10), img)


def test_entropy_coded_boundary_raises():
    with pytest.raises(NotImplementedError, match="JPEG"):
        codecs.decode_image(b"\xff\xd8\xff\xe0fakejpeg", "image/jpeg")


def test_extract_features_real_decode(spark):
    media = synth_decodable_media(spark, n=9)
    out = extract_features(media, dim=12, fake=False).collect()
    assert len(out) == 9
    for r in out:
        assert len(r["feature"]) == 12
        assert all(np.isfinite(v) for v in r["feature"])
    # image features: mean channels in [0,1]; audio rows have rms >= 0
    by_mime = {r["media_id"]: r for r in out}
    assert 0.0 <= by_mime[0]["feature"][0] <= 1.0  # ppm mean R
    assert by_mime[2]["feature"][0] >= 0.0  # wav rms


def test_extract_features_fake_rejects_nothing_but_real_rejects_fakes(spark):
    media = synth_media(spark, n=3)  # hash-payloads, not decodable
    assert extract_features(media, dim=8, fake=True).count() == 3
    with pytest.raises(Exception):
        extract_features(media, dim=8, fake=False).collect()


def test_resize_real_repaints_payload(spark):
    media = synth_decodable_media(spark, n=2).where(F.col("media_id") == 0)
    out = resize_stub(media, width=8, height=6, fake=False).collect()[0]
    img = codecs.decode_image(bytes(out["payload"]))
    assert img.shape == (6, 8, 3)
    assert out["width"] == 8 and out["height"] == 6
