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
    # baseline JPEG is now real; the honest boundary moved to progressive
    # JPEG / formats beyond JFIF (WebP, AVIF, ...)
    with pytest.raises(NotImplementedError, match="WebP"):
        codecs.decode_image(b"RIFF\x00\x00\x00\x00WEBPVP8 ", "image/webp")


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


# -- JPEG (baseline, pure numpy) ----------------------------------------------


def test_jpeg_idct_matches_naive_dct_definition():
    """The batched matrix IDCT equals the ITU T.81 A.3.3 closed-form double
    sum, computed here term by term — an independent implementation of the
    transform, not a reuse of _DCT8."""
    rng = np.random.RandomState(3)
    F8 = rng.uniform(-200, 200, size=(8, 8))

    def alpha(u):
        return np.sqrt(1.0 / 8.0) if u == 0 else np.sqrt(2.0 / 8.0)

    naive = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    s += (
                        alpha(u) * alpha(v) * F8[u, v]
                        * np.cos((2 * y + 1) * u * np.pi / 16)
                        * np.cos((2 * x + 1) * v * np.pi / 16)
                    )
            naive[y, x] = s
    fast = codecs._DCT8.T @ F8 @ codecs._DCT8
    np.testing.assert_allclose(fast, naive, atol=1e-9)
    # and the matrix is orthonormal (perfect-reconstruction transform)
    np.testing.assert_allclose(codecs._DCT8 @ codecs._DCT8.T, np.eye(8), atol=1e-12)


def test_jpeg_handcrafted_stream_decodes_per_spec():
    """A minimal stream assembled byte-by-byte from ITU T.81 rules — not via
    encode_jpeg — so the decoder is checked against the spec itself:
    8x8 grayscale, identity quant table, 1-bit huffman codes, single block
    with DC=26 and an EOB.  Expected pixels: IDCT of F[0,0]=26 is a constant
    26/8 = 3.25, +128 level shift -> rint(131.25) = 131 everywhere."""
    import struct

    def seg(marker, body):
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    dqt = bytes([0x00]) + bytes([1] * 64)  # table 0, all ones (zigzag)
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    # DC table: one 1-bit code '0' -> symbol 5 (category of 26)
    dht_dc = bytes([0x00]) + bytes([1] + [0] * 15) + bytes([5])
    # AC table: one 1-bit code '0' -> symbol 0x00 (EOB)
    dht_ac = bytes([0x10]) + bytes([1] + [0] * 15) + bytes([0x00])
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    # entropy bits: DC code '0', magnitude 26 = '11010' (5 bits), EOB '0',
    # then 1-bit '1' padding -> 0b01101001 = 0x69
    payload = (
        b"\xff\xd8"
        + seg(0xDB, dqt)
        + seg(0xC0, sof)
        + seg(0xC4, dht_dc)
        + seg(0xC4, dht_ac)
        + seg(0xDA, sos)
        + bytes([0x69])
        + b"\xff\xd9"
    )
    out = codecs.decode_jpeg(payload)
    assert out.shape == (8, 8, 3)
    assert (out == 131).all()


def test_jpeg_roundtrip_gradient():
    h, w = 40, 56
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [xx * 255 / w, yy * 255 / h, (xx + yy) * 255 / (h + w)], axis=2
    ).astype(np.uint8)
    for q, sub, tol in ((95, "4:4:4", 4), (85, "4:4:4", 6), (85, "4:2:0", 12)):
        out = codecs.decode_jpeg(codecs.encode_jpeg(img, quality=q, subsampling=sub))
        assert out.shape == img.shape
        err = np.abs(out.astype(int) - img.astype(int))
        assert err.max() <= tol, (q, sub, err.max())


def test_jpeg_flat_color_exact():
    flat = np.full((24, 24, 3), 137, dtype=np.uint8)
    out = codecs.decode_jpeg(codecs.encode_jpeg(flat, quality=90))
    assert (out == flat).all()


def test_jpeg_restart_markers():
    rng = np.random.RandomState(5)
    img = np.clip(
        rng.normal(128, 20, size=(24, 40, 3)).cumsum(axis=1) / 40, 0, 255
    ).astype(np.uint8)
    base = codecs.decode_jpeg(codecs.encode_jpeg(img, quality=90))
    rst = codecs.decode_jpeg(codecs.encode_jpeg(img, quality=90, restart_interval=2))
    # restart markers change framing, not content
    assert np.array_equal(base, rst)


def test_jpeg_odd_dimensions_and_chroma_subsampling():
    h, w = 37, 41  # forces edge-padded partial MCUs in both axes
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([xx * 5 % 200, yy * 3 % 200, (xx * yy) % 200], axis=2).astype(
        np.uint8
    )
    for sub in ("4:4:4", "4:2:0"):
        out = codecs.decode_jpeg(codecs.encode_jpeg(img, quality=90, subsampling=sub))
        assert out.shape == (h, w, 3)


def test_jpeg_optimal_huffman_is_valid_prefix_code():
    rng = np.random.RandomState(11)
    for trial in range(4):
        freq = np.zeros(256, dtype=np.int64)
        used = rng.choice(256, size=rng.randint(1, 80), replace=False)
        freq[used] = rng.randint(1, 10_000, size=len(used))
        counts, symbols = codecs._optimal_huffman(freq)
        assert sorted(symbols) == sorted(used.tolist())
        codes = codecs._huff_codes(counts, symbols)
        # Kraft inequality strictly < 1: the all-ones code stays unassigned
        kraft = sum(2.0 ** -L for _, L in codes.values())
        assert kraft < 1.0 or len(codes) == 1
        assert max(L for _, L in codes.values()) <= 16
        # prefix-free: no code is a prefix of another
        bits = sorted(format(c, f"0{L}b") for c, L in codes.values())
        for a, b in zip(bits, bits[1:]):
            assert not b.startswith(a)
        # and the decoder LUT inverts every code exactly
        lut_sym, lut_len = codecs._huff_lut(counts, symbols)
        for sym, (c, L) in codes.items():
            peek = c << (16 - L)
            assert int(lut_sym[peek]) == sym and int(lut_len[peek]) == L


def test_jpeg_boundaries_and_dispatch():
    img = np.full((8, 8, 3), 99, dtype=np.uint8)
    payload = codecs.encode_jpeg(img)
    assert (codecs.decode_image(payload, "image/jpeg") == img).all()
    with pytest.raises(ValueError, match="SOI"):
        codecs.decode_jpeg(b"notajpeg")
    # arithmetic coding (SOF9) is the honest remaining boundary
    arith = payload.replace(b"\xff\xc0", b"\xff\xc9", 1)
    with pytest.raises(NotImplementedError, match="SOF9"):
        codecs.decode_jpeg(arith)
    # a baseline full-band scan is invalid under a progressive frame header
    prog = payload.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="Se=0"):
        codecs.decode_jpeg(prog)


def test_jpeg_decode_image_dispatch_and_distributed_decode(spark):
    from graph_data_science_spark.operators.multimodal import synth_jpeg_media

    media = synth_jpeg_media(spark, n=12)
    out = extract_features(media, dim=8, fake=False).collect()
    assert len(out) == 12
    for r in out:
        i = r["media_id"]
        vals = [2 * ((i * 37 + k * 53) % 100) + 20 for k in range(4)]
        # bit-exact reconstruction => channel mean is the exact block average
        assert abs(r["feature"][0] * 255.0 - sum(vals) / 4.0) < 1e-3, i


# -- Video containers (AVI / MP4, Motion-JPEG) --------------------------------


def _jpeg_frames(n=7, seed=1):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        img = np.clip(
            rng.normal(128, 30, (24, 32, 3)).cumsum(axis=1) / 32, 0, 255
        ).astype(np.uint8)
        out.append(codecs.encode_jpeg(img, quality=90))
    return out


def test_avi_mjpeg_roundtrip():
    frames = _jpeg_frames()
    blob = codecs.encode_avi_mjpeg(frames, fps=12.0)
    v = codecs.decode_avi(blob)
    assert v["frames"] == frames  # demux is byte-exact
    assert (v["fps"], v["width"], v["height"], v["codec"]) == (12.0, 32, 24, "MJPG")
    assert codecs.decode_video(blob)["frames"] == frames  # magic dispatch
    assert codecs.decode_jpeg(v["frames"][3]).shape == (24, 32, 3)


def test_mp4_mjpeg_roundtrip():
    frames = _jpeg_frames(seed=2)
    blob = codecs.encode_mp4_mjpeg(frames, fps=25.0)
    v = codecs.decode_mp4(blob)
    assert v["frames"] == frames
    assert (v["fps"], v["width"], v["height"], v["codec"]) == (25.0, 32, 24, "jpeg")
    assert codecs.decode_video(blob)["frames"] == frames


def test_mp4_demux_multi_sample_chunks_and_co64():
    """Spec-crafted sample table our muxer never emits: TWO stsc runs
    (chunk 1 holds 3 samples, chunk 2 holds the remaining 2) and a co64
    (64-bit) chunk-offset box — the demuxer must walk the real
    stsc-expansion logic, not assume one-sample-per-chunk."""
    import struct

    samples = [bytes([65 + i]) * (10 + i) for i in range(5)]
    mdat_payload = b"".join(samples)
    ftyp = codecs._box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2")
    base = len(ftyp) + 8
    chunk_offsets = [base, base + sum(len(s) for s in samples[:3])]

    entry = (
        b"\x00" * 6 + struct.pack(">H", 1)
        + struct.pack(">HH", 0, 0) + b"\x00" * 12
        + struct.pack(">HH", 8, 8)
        + struct.pack(">II", 0x00480000, 0x00480000)
        + struct.pack(">I", 0) + struct.pack(">H", 1)
        + b"\x00" * 32 + struct.pack(">Hh", 24, -1)
    )
    stbl = codecs._box(
        b"stbl",
        codecs._full(b"stsd", 0, 0, struct.pack(">I", 1) + codecs._box(b"jpeg", entry))
        + codecs._full(b"stts", 0, 0, struct.pack(">III", 1, 5, 60))
        + codecs._full(
            b"stsc", 0, 0,
            struct.pack(">I", 2)
            + struct.pack(">III", 1, 3, 1)
            + struct.pack(">III", 2, 2, 1),
        )
        + codecs._full(
            b"stsz", 0, 0,
            struct.pack(">II", 0, 5)
            + b"".join(struct.pack(">I", len(s)) for s in samples),
        )
        + codecs._full(
            b"co64", 0, 0,
            struct.pack(">I", 2) + b"".join(struct.pack(">Q", o) for o in chunk_offsets),
        ),
    )
    minf = codecs._box(
        b"minf",
        codecs._full(b"vmhd", 0, 1, b"\x00" * 8)
        + codecs._box(
            b"dinf",
            codecs._full(b"dref", 0, 0, struct.pack(">I", 1) + codecs._full(b"url ", 0, 1, b"")),
        )
        + stbl,
    )
    mdia = codecs._box(
        b"mdia",
        codecs._full(b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, 600, 300, 0x55C4, 0))
        + codecs._full(b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"V\x00")
        + minf,
    )
    moov = codecs._box(b"moov", codecs._box(b"trak", mdia))
    blob = ftyp + codecs._box(b"mdat", mdat_payload) + moov
    v = codecs.decode_mp4(blob)
    assert v["frames"] == samples
    assert v["fps"] == 10.0  # timescale 600 / delta 60
    assert (v["width"], v["height"]) == (8, 8)


def test_video_boundary_raises_for_intercoded():
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        codecs.decode_video(b"\x1a\x45\xdf\xa3webmdata", "video/webm")


def test_frame_sample_distributed_exact(spark):
    from graph_data_science_spark.operators.multimodal import (
        frame_sample,
        synth_video_media,
    )

    media = synth_video_media(spark, n=6, n_frames=8, fps=10.0)
    rows = frame_sample(media, every_n=3).collect()
    # 6 videos x frames {0, 3, 6}
    assert len(rows) == 18
    for r in rows:
        assert r["frame_idx"] in (0, 3, 6)
        assert abs(r["pts_s"] - r["frame_idx"] / 10.0) < 1e-9
        img = codecs.decode_jpeg(bytes(r["frame"]))
        i, f = r["media_id"], r["frame_idx"]
        vals = [2 * ((i * 37 + f * 17 + k * 53) % 100) + 20 for k in range(4)]
        # bit-exact frames: pixel mean IS the block average
        assert abs(img.astype(float).mean() - sum(vals) / 4.0) < 1e-9


# -- Progressive JPEG (SOF2) ---------------------------------------------------


def test_jpeg_progressive_decode_identical_to_baseline():
    """Progression transmits the same quantized coefficients, so decoding a
    progressive encoding must be BIT-IDENTICAL to decoding the baseline
    encoding — across subsampling, quality, and content (noise stresses the
    ZRL / EOBRUN / correction-bit paths)."""
    rng = np.random.RandomState(9)
    cases = [
        (rng.randint(0, 256, (41, 67, 3)).astype(np.uint8), 75, "4:4:4"),
        (rng.randint(0, 256, (24, 24, 3)).astype(np.uint8), 30, "4:2:0"),
        (np.clip(rng.normal(128, 60, (33, 50, 3)), 0, 255).astype(np.uint8), 92, "4:2:0"),
        (np.full((16, 16, 3), 137, dtype=np.uint8), 90, "4:4:4"),
    ]
    for img, q, sub in cases:
        base = codecs.decode_jpeg(codecs.encode_jpeg(img, quality=q, subsampling=sub))
        prog_blob = codecs.encode_jpeg(img, quality=q, subsampling=sub, progressive=True)
        assert np.array_equal(codecs.decode_jpeg(prog_blob), base), (q, sub)


def test_jpeg_progressive_handcrafted_spec_stream():
    """A 4-scan progressive stream assembled byte-by-byte from ITU T.81 G.2
    rules — independent of encode_jpeg — covering DC first (Al=1), AC first
    with EOB, DC refinement, and AC refinement with a correction bit:
    8x8 gray, identity quant, true coefficients DC=26 and zigzag-2 AC=3."""
    import struct

    def seg(marker, body):
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    dqt = bytes([0x00]) + bytes([1] * 64)
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    # DC table: '0' -> 4 (category of 13)
    dht_dc = bytes([0x00]) + bytes([1] + [0] * 15) + bytes([4])
    # AC table A: '0' -> 0x11 (run 1, size 1), '1' -> 0x00 (EOB)
    dht_ac_a = bytes([0x10]) + bytes([2] + [0] * 15) + bytes([0x11, 0x00])
    # AC table B (refinement scan): '0' -> 0x00 (EOB0)
    dht_ac_b = bytes([0x10]) + bytes([1] + [0] * 15) + bytes([0x00])

    def sos(ss, se, ah, al):
        return bytes([1, 1, 0x00, ss, se, (ah << 4) | al])

    payload = (
        b"\xff\xd8"
        + seg(0xDB, dqt)
        + seg(0xC2, sof)
        + seg(0xC4, dht_dc)
        # scan 1: DC first, Al=1, diff = 26>>1 = 13 = '1101': bits 0 1101 -> 0b01101111
        + seg(0xDA, sos(0, 0, 0, 1)) + bytes([0b01101111])
        # scan 2: AC first, Al=1, zig-2 coef 3>>1=1: sym 0x11 ('0'), sign '1', EOB ('1')
        + seg(0xC4, dht_ac_a)
        + seg(0xDA, sos(1, 63, 0, 1)) + bytes([0b01111111])
        # scan 3: DC refine to Al=0: bit 26&1 = 0
        + seg(0xDA, sos(0, 0, 1, 0)) + bytes([0b01111111])
        # scan 4: AC refine to Al=0: EOB0 ('0') then correction bit 3&1 = 1
        + seg(0xC4, dht_ac_b)
        + seg(0xDA, sos(1, 63, 1, 0)) + bytes([0b01111111])
        + b"\xff\xd9"
    )
    out = codecs.decode_jpeg(payload)
    F8 = np.zeros((8, 8))
    F8[0, 0] = 26.0
    F8[1, 0] = 3.0  # zigzag index 2 -> raster (1, 0)
    want = np.clip(np.rint(codecs._DCT8.T @ F8 @ codecs._DCT8 + 128.0), 0, 255)
    assert (out[:, :, 0] == want.astype(np.uint8)).all()
    assert (out[:, :, 0] == out[:, :, 1]).all() and (out[:, :, 0] == out[:, :, 2]).all()


def test_jpeg_progressive_in_synth_media(spark):
    """synth_jpeg_media's i%4==1 rows are progressive; the bit-exact oracle
    must keep holding through the distributed decode path."""
    from graph_data_science_spark.operators.multimodal import synth_jpeg_media

    media = synth_jpeg_media(spark, n=12)
    payloads = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    # SOF2 marker present exactly for i % 4 == 1
    for i, p in payloads.items():
        assert (b"\xff\xc2" in p) == (i % 4 == 1), i
    out = extract_features(media, dim=8, fake=False).collect()
    for r in out:
        i = r["media_id"]
        vals = [2 * ((i * 37 + k * 53) % 100) + 20 for k in range(4)]
        assert abs(r["feature"][0] * 255.0 - sum(vals) / 4.0) < 1e-3, i


def test_audio_spectral_features_pure_tone():
    """A pure sine at f0 must put its spectral centroid at f0/Nyquist and
    its band energy in f0's band — the rfft block is real, not a stub."""
    rate = 8000
    t = np.arange(4096) / rate
    for f0, band_idx in ((100.0, 0), (400.0, 1), (1500.0, 2), (3000.0, 3)):
        x = np.sin(2 * np.pi * f0 * t)
        feat = codecs.audio_features(x[:, None], rate, dim=16)
        centroid = feat[4] * (rate / 2.0)
        assert abs(centroid - f0) < 5.0, (f0, centroid)
        bands = feat[5:9]
        assert bands[band_idx] > 0.99, (f0, bands)
        assert abs(sum(bands) - 1.0) < 1e-6
