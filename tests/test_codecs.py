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


# -- PNG (stdlib zlib + numpy unfilter) ---------------------------------------

def test_png_roundtrip_every_filter_type():
    rng = np.random.RandomState(7)
    for shape in [(1, 1, 3), (5, 9, 3), (17, 23, 3)]:
        img = rng.randint(0, 256, shape).astype(np.uint8)
        for ft in range(5):
            got = codecs.decode_png(codecs.encode_png(img, filter_type=ft))
            assert got.shape == img.shape and (got == img).all(), (shape, ft)


def test_png_gradient_stresses_predictors():
    # smooth gradients are where Sub/Up/Average/Paeth predictors actually
    # predict (residuals near 0) — a decoder bug shifts values visibly
    y, x = np.mgrid[0:32, 0:40]
    img = np.stack([(y * 3) % 256, (x * 5) % 256, (x + y) % 256], axis=2).astype(np.uint8)
    for ft in range(5):
        assert (codecs.decode_png(codecs.encode_png(img, ft)) == img).all(), ft


def _png_fixture(w, h, color_type, raw_rows, extra=b""):
    import struct, zlib

    def chunk(t, b):
        return (
            struct.pack(">I", len(b)) + t + b
            + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF)
        )

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return sig + chunk(b"IHDR", ihdr) + extra + chunk(b"IDAT", zlib.compress(raw_rows)) + chunk(b"IEND", b"")


def test_png_grayscale_rgba_palette_expand_to_rgb():
    import struct, zlib

    g = np.array([[10, 20, 30], [200, 100, 0]], dtype=np.uint8)
    png = _png_fixture(3, 2, 0, b"".join(b"\x00" + g[r].tobytes() for r in range(2)))
    out = codecs.decode_png(png)
    assert out.shape == (2, 3, 3) and (out[:, :, 0] == g).all() and (out[:, :, 2] == g).all()

    rgba = np.random.RandomState(3).randint(0, 256, (2, 2, 4)).astype(np.uint8)
    png = _png_fixture(2, 2, 6, b"".join(b"\x00" + rgba[r].tobytes() for r in range(2)))
    assert (codecs.decode_png(png) == rgba[:, :, :3]).all()

    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]], dtype=np.uint8)
    idx = np.array([[0, 3, 1, 2]], dtype=np.uint8)

    def chunk(t, b):
        return (
            struct.pack(">I", len(b)) + t + b
            + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF)
        )

    png = _png_fixture(4, 1, 3, b"\x00" + idx.tobytes(), extra=chunk(b"PLTE", pal.tobytes()))
    assert (codecs.decode_png(png) == pal[idx[0]][None]).all()


def test_png_honest_boundaries():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    payload = bytearray(codecs.encode_png(img))
    # bit depth 16 -> NotImplementedError, interlace -> NotImplementedError
    import struct, zlib

    def fixture(depth=8, interlace=0):
        def chunk(t, b):
            return (
                struct.pack(">I", len(b)) + t + b
                + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF)
            )
        ihdr = struct.pack(">IIBBBBB", 2, 2, depth, 2, 0, 0, interlace)
        raw = zlib.compress(b"\x00" * (2 * (1 + 6)))
        return b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"IDAT", raw) + chunk(b"IEND", b"")

    with pytest.raises(NotImplementedError, match="depth"):
        codecs.decode_png(fixture(depth=16))
    with pytest.raises(NotImplementedError, match="interlaced"):
        codecs.decode_png(fixture(interlace=1))
    with pytest.raises(ValueError, match="not a PNG"):
        codecs.decode_png(b"BM123456")


def test_png_decode_image_dispatch_and_distributed_decode(spark):
    from graph_data_science_spark.operators.multimodal import synth_png_media

    img = np.random.RandomState(1).randint(0, 256, (8, 8, 3)).astype(np.uint8)
    assert (codecs.decode_image(codecs.encode_png(img, 4)) == img).all()

    media = synth_png_media(spark, n=10, size=16)
    out = extract_features(media, dim=8, fake=False).collect()
    assert len(out) == 10
    for r in out:
        i = r["media_id"]
        # pixel law: mean of channel 0 = (i*37)%170 + 15, scaled by 1/255
        assert abs(r["feature"][0] * 255.0 - ((i * 37) % 170 + 15)) < 1e-3, i
