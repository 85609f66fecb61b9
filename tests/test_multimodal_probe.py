"""Real container parsing: PNG/WAV headers from pure-stdlib bytes."""

from __future__ import annotations

from omniparser_spark.operators.multimodal import (
    make_png,
    make_wav,
    parse_png_header,
    parse_wav_header,
    probe_media,
)


def test_parse_helpers_roundtrip():
    png = make_png(320, 200, seed=3)
    assert parse_png_header(png) == {
        "width": 320, "height": 200, "bit_depth": 8
    }
    wav = make_wav(sample_rate=8000, duration_ms=125, channels=2)
    got = parse_wav_header(wav)
    assert got == {
        "channels": 2, "sample_rate": 8000, "bit_depth": 16,
        "audio_format": 1, "duration_ms": 125,
    }


def test_probe_media_sniffs_and_quarantines(spark):
    rows = [
        (1, make_png(64, 48)),
        (2, make_wav(16000, 250)),
        (3, b"\x89PNG\r\n\x1a\n" + b"junkjunkjunkjunkjunkjunkjunkjunk"),
        (4, b"not media at all"),
    ]
    media = spark.createDataFrame(rows, "media_id long, blob binary")
    got = {r.media_id: r for r in probe_media(media).collect()}
    assert (got[1].container, got[1].width, got[1].height, got[1].valid) == (
        "png", 64, 48, True
    )
    assert (
        got[2].container, got[2].sample_rate, got[2].duration_ms, got[2].valid
    ) == ("wav", 16000, 250, True)
    assert got[3].valid is False and "IHDR" in got[3].error
    assert got[4].valid is False and "unknown container" in got[4].error


def test_probe_media_quarantines_truncated_wav(spark):
    import struct

    # RIFF/WAVE with an fmt chunk that claims 16 bytes but is cut short
    trunc = (
        b"RIFF" + struct.pack("<I", 20) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + b"\x01\x00"
    )
    media = spark.createDataFrame(
        [(1, trunc)], "media_id long, blob binary"
    )
    (r,) = probe_media(media).collect()
    assert r.valid is False and r.error  # quarantined, not a task crash


# ---------------------------------------------------------------- pixels
def _crafted_png(rows, channels=1, color_type=0, filters=None):
    """Encode `rows` (list of scanlines, each a flat list of channel
    bytes) using an explicit per-row filter type — exercises the
    decoder's unfilter paths, which make_png (always filter 0) does
    not."""
    import struct
    import zlib

    width = len(rows[0]) // channels

    def chunk(t, b):
        return (
            struct.pack(">I", len(b)) + t + b
            + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF)
        )

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    raw = bytearray()
    prev = [0] * len(rows[0])
    for y, r in enumerate(rows):
        ft = filters[y]
        raw.append(ft)
        for i, cur in enumerate(r):
            left = r[i - channels] if i >= channels else 0
            up = prev[i]
            ul = prev[i - channels] if i >= channels else 0
            enc = {
                0: cur,
                1: (cur - left) & 0xFF,
                2: (cur - up) & 0xFF,
                3: (cur - ((left + up) >> 1)) & 0xFF,
                4: (cur - paeth(left, up, ul)) & 0xFF,
            }[ft]
            raw.append(enc)
        prev = r
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", width, len(rows), 8, color_type, 0, 0, 0)
    return (
        sig + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_decode_reverses_all_filters():
    from omniparser_spark.operators.multimodal import decode_png_pixels

    rows = [[(x * 7 + y * 13) % 256 for x in range(6)] for y in range(5)]
    png = _crafted_png(rows, filters=[0, 1, 2, 3, 4])
    w, h, ch, pix = decode_png_pixels(png)
    assert (w, h, ch) == (6, 5, 1)
    assert pix == bytes(v for r in rows for v in r)


def test_png_decode_rgb_sub_filter_uses_bpp_offset():
    from omniparser_spark.operators.multimodal import decode_png_pixels

    # RGB: Sub/Paeth 'left' is 3 bytes back, not 1 — a bpp bug shows here
    rows = [
        [(x * 11 + c * 5 + y * 29) % 256
         for x in range(4) for c in range(3)]
        for y in range(3)
    ]
    png = _crafted_png(rows, channels=3, color_type=2, filters=[1, 4, 3])
    w, h, ch, pix = decode_png_pixels(png)
    assert (w, h, ch) == (4, 3, 3)
    assert pix == bytes(v for r in rows for v in r)


def test_make_png_pixels_match_generator_formula():
    from omniparser_spark.operators.multimodal import (
        decode_png_pixels,
        make_png,
    )

    w, h, ch, pix = decode_png_pixels(make_png(9, 7, seed=3))
    assert (w, h, ch) == (9, 7, 1)
    assert pix == bytes(
        (x * 31 + y * 17 + 3) % 256 for y in range(7) for x in range(9)
    )


def test_wav_decode_yields_pcm_samples():
    from omniparser_spark.operators.multimodal import (
        decode_wav_samples,
        make_wav,
    )

    rate, ch, samples = decode_wav_samples(make_wav(8000, 50))
    assert (rate, ch, len(samples)) == (8000, 1, 400)
    assert samples[:3] == [
        ((i * 797) % 20000) - 10000 for i in range(3)
    ]


def test_image_features_are_pixel_derived():
    """Recompressing the same pixels (different zlib level => different
    bytes) must yield IDENTICAL features — the byte-histogram stand-in
    could not pass this."""
    import struct
    import zlib

    from omniparser_spark.operators.multimodal import (
        _decode_image,
        make_png,
    )

    png = make_png(16, 16, seed=5)
    # re-encode the IDAT at a different compression level
    def chunk(t, b):
        return (
            struct.pack(">I", len(b)) + t + b
            + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF)
        )

    sig_ihdr = png[:33]
    length, = struct.unpack(">I", png[33:37])
    idat_body = png[41:41 + length]
    raw = zlib.decompress(idat_body)
    png2 = (
        sig_ihdr + chunk(b"IDAT", zlib.compress(raw, level=1))
        + chunk(b"IEND", b"")
    )
    assert png2 != png
    assert _decode_image(png, None) == _decode_image(png2, None)


def test_gif_lzw_roundtrip_and_decode():
    """REAL GIF codec: _lzw_encode/_lzw_decode round-trip (incl. KwKwK
    and >4096-entry table reset) and end-to-end pixel decode against
    the closed-form generator formula."""
    from omniparser_spark.operators.multimodal import (
        _lzw_decode,
        _lzw_encode,
        decode_gif_pixels,
        make_gif,
        parse_gif_header,
    )

    for data in (b"abab" * 200, bytes(range(256)) * 200, b"", b"\x07" * 9999):
        assert _lzw_decode(_lzw_encode(data, 8), 8) == data
    g = make_gif(33, 17, seed=5)
    info = parse_gif_header(g)
    assert (info["width"], info["height"], info["bit_depth"]) == (33, 17, 8)
    w, h, idx, pal = decode_gif_pixels(g)
    assert (w, h) == (33, 17)
    assert idx == bytes(
        (x * 31 + y * 17 + 5) % 256 for y in range(17) for x in range(33)
    )
    assert pal[200] == (200, (200 * 7) % 256, (200 * 13) % 256)


def test_probe_gif_and_truncated_gif(spark):
    from omniparser_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        make_gif,
        probe_media,
    )

    good = make_gif(12, 9, seed=1)
    rows = [
        (0, "image", bytearray(good), ("image/gif", 12, 9, 0)),
        (1, "image", bytearray(good[:20]), ("image/gif", 0, 0, 0)),
    ]
    out = {
        r.media_id: r
        for r in probe_media(
            spark.createDataFrame(rows, MEDIA_SCHEMA)
        ).collect()
    }
    assert out[0].container == "gif" and out[0].valid
    assert (out[0].width, out[0].height) == (12, 9)
    assert not out[1].valid and "truncated" in out[1].error


def test_bmp_roundtrip_padding_and_topdown():
    import struct

    from omniparser_spark.operators.multimodal import (
        decode_bmp_pixels,
        make_bmp,
        parse_bmp_header,
    )

    for w, h, seed in [(5, 3, 0), (13, 4, 42), (1, 1, 9), (16, 7, 3)]:
        blob = make_bmp(w, h, seed)
        info = parse_bmp_header(blob)
        assert (info["width"], info["height"], info["bit_depth"]) == (
            w, h, 24,
        )
        W, H, rgb = decode_bmp_pixels(blob)
        assert (W, H) == (w, h)
        for y in range(h):
            for x in range(w):
                o = (y * w + x) * 3
                assert tuple(rgb[o : o + 3]) == (
                    (x * 31 + y * 17 + seed) % 256,
                    (x * 5 + seed) % 256,
                    (y * 11 + seed) % 256,
                )

    # top-down variant (negative height, rows in natural order) must
    # decode to the same image as the bottom-up original
    w, h, seed = 6, 4, 5
    up = make_bmp(w, h, seed)
    stride = (w * 3 + 3) & ~3
    px = up[54:]
    rows = [px[i * stride : (i + 1) * stride] for i in range(h)]
    td = (
        up[:14]
        + struct.pack("<Iii", 40, w, -h)
        + up[26:54]
        + b"".join(reversed(rows))
    )
    assert decode_bmp_pixels(td) == decode_bmp_pixels(up)


def test_probe_media_sniffs_bmp(spark):
    from omniparser_spark.operators.multimodal import make_bmp

    media = spark.createDataFrame(
        [(1, make_bmp(12, 5, seed=2)), (2, b"BMtruncated")],
        "media_id long, blob binary",
    )
    got = {r.media_id: r for r in probe_media(media).collect()}
    assert (got[1].container, got[1].width, got[1].height,
            got[1].bit_depth, got[1].valid) == ("bmp", 12, 5, 24, True)
    assert got[2].valid is False and got[2].error


def test_jpeg_mosaic_roundtrip_is_exact():
    """make_jpeg's constant 8x8 tiles are exactly representable
    (DC-only blocks, even offsets, q00=16): the full decode — marker
    parse, Huffman, differential DC, dequant, IDCT, level shift — must
    reproduce the closed-form mosaic bit-for-bit."""
    from omniparser_spark.operators.multimodal import (
        decode_jpeg_pixels,
        make_jpeg,
    )

    for seed, (w, h) in [(0, (8, 8)), (3, (24, 16)), (11, (16, 24))]:
        width, height, pix = decode_jpeg_pixels(make_jpeg(w, h, seed))
        assert (width, height) == (w, h)
        for y in range(h):
            for x in range(w):
                v = 128 + 2 * ((((x // 8) * 31 + (y // 8) * 17 + seed) % 64) - 32)
                assert pix[y * w + x] == v, (x, y, seed)


def test_jpeg_entropy_layer_roundtrips_arbitrary_coefficients():
    """The lossless half (Huffman AC runs incl. ZRL, EOB, differential
    DC, zigzag, byte stuffing) must invert exactly for arbitrary
    quantized blocks — including ones engineered to emit 0xFF entropy
    bytes (stuffing) and >15 zero runs (ZRL)."""
    import random

    from omniparser_spark.operators.multimodal import (
        decode_jpeg_quantized,
        encode_jpeg_blocks,
    )

    rng = random.Random(7)
    blocks = []
    for _ in range(6):
        blk = [0] * 64
        blk[0] = rng.randint(-200, 200)
        for _ in range(rng.randint(0, 12)):
            blk[rng.randint(1, 63)] = rng.randint(-80, 80)
        blocks.append(blk)
    # adversarial shapes: ZRL (lone coefficient at index 63), max-run
    # tail, and an all-zero block (pure EOB)
    zrl = [0] * 64
    zrl[63] = 5
    blocks.append(zrl)
    blocks.append([0] * 64)
    dense = [((i * 37) % 13) - 6 for i in range(64)]  # no EOB at all
    blocks.append(dense)
    quant = [16] + [2 + (i % 7) for i in range(63)]
    blob = encode_jpeg_blocks(8 * len(blocks), 8, blocks, quant)
    w, h, q, got = decode_jpeg_quantized(blob)
    assert (w, h) == (8 * len(blocks), 8)
    assert q == quant
    assert got == blocks
    # stuffing actually occurred somewhere in the corpus (a 0xFF00 pair
    # inside the entropy segment) — otherwise this test is too gentle
    sos = blob.find(b"\xff\xda")
    entropy = blob[sos + 2 + 12 :]
    assert b"\xff\x00" in entropy


def test_jpeg_idct_matches_direct_formula():
    """Dequant+IDCT against the textbook T.81 A.3.3 double sum,
    computed independently here — catches basis/transpose mistakes the
    exact-mosaic test cannot see (its blocks are DC-only)."""
    import math

    from omniparser_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg_blocks,
    )

    blk = [0] * 64
    blk[0], blk[1], blk[8], blk[9], blk[18] = 4, 3, -2, 1, -1
    quant = [16] * 64
    blob = encode_jpeg_blocks(8, 8, [blk], quant)
    _w, _h, pix = decode_jpeg_pixels(blob)

    def a(u):
        return math.sqrt(0.125) if u == 0 else math.sqrt(0.25)

    for y in range(8):
        for x in range(8):
            s = 0.0
            for v in range(8):
                for u in range(8):
                    s += (
                        a(u) * a(v) * blk[v * 8 + u] * 16
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            want = min(255, max(0, round(s + 128)))
            assert pix[y * 8 + x] == want, (x, y)


def test_jpeg_honest_gates():
    """Unsupported JPEG shapes must refuse loudly, never decode wrong;
    the grayscale quantized API refuses color (decode_jpeg_pixels is
    the color path). Restart intervals and progressive (SOF2) are
    SUPPORTED as of r7 — see test_jpeg_restart_intervals /
    test_jpeg_progressive_*."""
    import pytest as _pytest

    from omniparser_spark.operators.multimodal import (
        decode_jpeg_pixels,
        decode_jpeg_quantized,
        make_jpeg,
        make_jpeg_color,
    )

    good = bytearray(make_jpeg(8, 8, 1))
    sof = good.find(b"\xff\xc0")
    # SOF1 extended-sequential / SOF3 lossless stay gated
    for m in (0xC1, 0xC3):
        bad = bytearray(good)
        bad[sof + 1] = m
        with _pytest.raises(NotImplementedError, match="SOF"):
            decode_jpeg_quantized(bytes(bad))
    # a baseline scan relabeled SOF2 is a MALFORMED progressive stream
    # (its single scan spans Ss=0..Se=63) — refuse, don't misparse
    prog = bytearray(good)
    prog[sof + 1] = 0xC2
    with _pytest.raises(ValueError, match="DC scan"):
        decode_jpeg_quantized(bytes(prog))
    # 12-bit precision gates on either SOF kind
    deep = bytearray(good)
    deep[sof + 4] = 12
    with _pytest.raises(NotImplementedError, match="12-bit"):
        decode_jpeg_quantized(bytes(deep))
    # decode_jpeg_quantized stays the grayscale half by contract
    with _pytest.raises(NotImplementedError, match="multi-component"):
        decode_jpeg_quantized(make_jpeg_color(16, 16, 1))
    # 4:2:2 / 4:1:1 decode as of r7 (test_jpeg_color_sampling_grids);
    # a NON-divisible sampling mix (Y 3x2 with Cb 2x1 — T.81-legal,
    # emitted by no real encoder) must still gate at SOF parse, not
    # mis-tile the MCUs
    cbad = bytearray(make_jpeg_color(16, 16, 1))
    sof = cbad.find(b"\xff\xc0")
    assert cbad[sof + 11] == 0x22  # Y sampling byte
    cbad[sof + 11] = 0x32
    cbad[sof + 14] = 0x21  # Cb: h=2 does not divide hmax=3
    with _pytest.raises(NotImplementedError, match="sampling"):
        decode_jpeg_pixels(bytes(cbad))
    with _pytest.raises(ValueError):
        decode_jpeg_quantized(b"\x00\x01not a jpeg")


def test_jpeg_color_roundtrip_exact():
    """4:2:0 YCbCr decode — interleaved MCUs, per-component DC
    predictors, chroma upsample, JFIF conversion — equals the closed
    form on every pixel (the mosaic quantizes losslessly)."""
    import numpy as np

    from omniparser_spark.operators.multimodal import (
        decode_jpeg_pixels,
        make_jpeg_color,
    )

    for w, h, seed in ((16, 16, 0), (48, 32, 7), (32, 48, 11)):
        gw, gh, rgb = decode_jpeg_pixels(make_jpeg_color(w, h, seed))
        assert (gw, gh, len(rgb)) == (w, h, 3 * w * h)
        a = np.frombuffer(rgb, np.uint8).reshape(h, w, 3)
        for my in range(h // 16):
            for mx in range(w // 16):
                yv = 128 + 2 * (((mx * 31 + my * 17 + seed) % 64) - 32)
                cb = 128 + 2 * (((mx * 13 + my * 7 + seed) % 64) - 32)
                cr = 128 + 2 * (((mx * 5 + my * 23 + seed) % 64) - 32)

                def px(v):
                    return min(max(int(np.floor(v + 0.5)), 0), 255)

                want = (
                    px(yv + 1.402 * (cr - 128.0)),
                    px(yv - 0.344136 * (cb - 128.0)
                       - 0.714136 * (cr - 128.0)),
                    px(yv + 1.772 * (cb - 128.0)),
                )
                tile = a[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16]
                assert np.all(tile == want), (mx, my, want)


def test_jpeg_color_sampling_grids():
    """4:2:2 (Y 2x1), 4:1:1 (Y 4x1) and 4:4:4 (Y 1x1) decode — the
    general interleaved-MCU loop + integer chroma upsample — equal the
    closed form on every pixel, with and without restart intervals
    (the DC-only mosaic quantizes losslessly at every grid)."""
    import numpy as np

    from omniparser_spark.operators.multimodal import (
        decode_jpeg_pixels,
        make_jpeg_color,
    )

    for hy, vy, w, h, seed, rst in (
        (2, 1, 32, 16, 3, 0),    # 4:2:2
        (2, 1, 48, 24, 9, 3),    # 4:2:2 + RSTn
        (4, 1, 64, 16, 5, 0),    # 4:1:1
        (4, 1, 32, 8, 21, 2),    # 4:1:1 + RSTn
        (1, 1, 24, 16, 7, 0),    # 4:4:4
    ):
        blob = make_jpeg_color(
            w, h, seed=seed, restart_interval=rst, sampling=(hy, vy)
        )
        gw, gh, rgb = decode_jpeg_pixels(blob)
        assert (gw, gh, len(rgb)) == (w, h, 3 * w * h)
        a = np.frombuffer(rgb, np.uint8).reshape(h, w, 3)
        tw, th = 8 * hy, 8 * vy
        for my in range(h // th):
            for mx in range(w // tw):
                yv = 128 + 2 * (((mx * 31 + my * 17 + seed) % 64) - 32)
                cb = 128 + 2 * (((mx * 13 + my * 7 + seed) % 64) - 32)
                cr = 128 + 2 * (((mx * 5 + my * 23 + seed) % 64) - 32)

                def px(v):
                    return min(max(int(np.floor(v + 0.5)), 0), 255)

                want = (
                    px(yv + 1.402 * (cr - 128.0)),
                    px(yv - 0.344136 * (cb - 128.0)
                       - 0.714136 * (cr - 128.0)),
                    px(yv + 1.772 * (cb - 128.0)),
                )
                tile = a[my * th : my * th + th, mx * tw : mx * tw + tw]
                assert np.all(tile == want), (hy, vy, mx, my, want)


def test_jpeg_progressive_roundtrip_grayscale():
    """Progressive (SOF2) grayscale: encoding arbitrary quantized
    blocks through a successive-approximation scan script and decoding
    must reproduce the blocks bit-exactly — spectral bands, EOB runs,
    ZRL-with-correction-bit interleave, DC point transform, deep Al
    ladders, every path. Shapes chosen adversarially: band-end
    singletons (long zero runs), corrections straddling runs, dense
    blocks, magnitude-1 coefficients that only appear in the last
    refinement."""
    import random

    from omniparser_spark.operators.multimodal import (
        decode_jpeg_quantized,
        encode_jpeg_progressive,
    )

    rng = random.Random(2026)
    scripts = [
        None,
        ((0, 0, 0, 3), (1, 63, 0, 3), (1, 63, 3, 2), (1, 63, 2, 1),
         (1, 63, 1, 0), (0, 0, 1, 2), (0, 0, 1, 1), (0, 0, 1, 0)),
        ((0, 0, 0, 0), (1, 2, 0, 0), (3, 63, 0, 1), (3, 63, 1, 0)),
    ]
    quant = [16] * 64
    for trial in range(60):
        nbx, nby = rng.choice([(1, 1), (2, 2), (5, 1), (4, 3)])
        blocks = []
        for _ in range(nbx * nby):
            blk = [0] * 64
            blk[0] = rng.choice([0, 1, -1, 255, -256,
                                 rng.randint(-500, 500)])
            shape = rng.randint(0, 5)
            if shape == 1:
                blk[63] = rng.choice([1, -1, 3, -3])
            elif shape == 2:
                blk[1] = rng.randint(-7, 7)
                blk[40] = rng.choice([1, -1])
            elif shape == 3:
                for k in range(1, 64):
                    blk[k] = rng.randint(-3, 3)
            elif shape == 4:
                blk[20] = rng.choice([4, -4, 5, -5])
                blk[62] = rng.choice([1, -1])
            elif shape == 5:
                for _ in range(rng.randint(1, 8)):
                    blk[rng.randint(1, 63)] = rng.randint(-1000, 1000)
            blocks.append(blk)
        sc = rng.choice(scripts)
        kw = {} if sc is None else {"scans": sc}
        blob = encode_jpeg_progressive(
            nbx * 8, nby * 8, blocks, quant, **kw
        )
        gw, gh, q, got = decode_jpeg_quantized(blob)
        assert (gw, gh, q) == (nbx * 8, nby * 8, quant)
        assert got == blocks, (trial, sc)


def test_jpeg_progressive_color_equals_baseline():
    """Progressive color streams (interleaved DC first + DC refine +
    per-component AC scans) decode to the SAME pixels as the baseline
    encoding of the same mosaic, across sampling grids — the scan
    structure changes, the image must not."""
    from omniparser_spark.operators.multimodal import (
        decode_jpeg_pixels,
        make_jpeg_color,
    )

    for hy, vy, w, h, seed in (
        (2, 2, 32, 32, 4), (2, 1, 32, 16, 9),
        (1, 1, 16, 16, 3), (4, 1, 64, 8, 13),
    ):
        base = decode_jpeg_pixels(
            make_jpeg_color(w, h, seed, sampling=(hy, vy))
        )
        prog = decode_jpeg_pixels(
            make_jpeg_color(
                w, h, seed, sampling=(hy, vy), progressive=True
            )
        )
        assert base == prog, (hy, vy, w, h)


def test_png_gif_interlaced_decode():
    """Adam7 PNG (seven independently filtered sub-images) and GIF89a
    four-pass interlace must decode to the SAME pixels as the
    non-interlaced encodings — including sizes whose Adam7 passes are
    empty (1x1, 5x3) or degenerate in one axis (2x9, 9x2)."""
    from omniparser_spark.operators.multimodal import (
        decode_gif_pixels,
        decode_png_pixels,
        make_gif,
        make_png,
    )

    for w, h, seed in (
        (8, 8, 0), (5, 3, 7), (1, 1, 2), (17, 9, 11),
        (16, 16, 5), (2, 9, 3), (9, 2, 4), (7, 7, 6),
    ):
        assert decode_png_pixels(make_png(w, h, seed)) == (
            decode_png_pixels(make_png(w, h, seed, interlaced=True))
        ), ("png", w, h)
        assert decode_gif_pixels(make_gif(w, h, seed)) == (
            decode_gif_pixels(make_gif(w, h, seed, interlaced=True))
        ), ("gif", w, h)


def test_png_palette_decode():
    """Color type 3 (palette) PNG: indices defilter like grayscale and
    resolve through PLTE to RGB — closed form (v, v*7%256, v*13%256)
    per pixel, in both plain and Adam7-interlaced layouts. A palette
    image without a PLTE chunk must refuse."""
    import pytest as _pytest

    from omniparser_spark.operators.multimodal import (
        decode_png_pixels,
        make_png,
    )

    for w, h, seed in ((8, 8, 0), (5, 3, 7), (17, 9, 11), (1, 1, 2)):
        for inter in (False, True):
            gw, gh, ch, pix = decode_png_pixels(
                make_png(w, h, seed, interlaced=inter, palette=True)
            )
            assert (gw, gh, ch) == (w, h, 3)
            for y in range(h):
                for x in range(w):
                    v = (x * 31 + y * 17 + seed) % 256
                    want = bytes((v, (v * 7) % 256, (v * 13) % 256))
                    at = (y * w + x) * 3
                    assert pix[at : at + 3] == want, (w, h, inter, x, y)
    # strip the PLTE chunk -> must refuse, not decode indices as gray
    blob = bytearray(make_png(8, 8, 1, palette=True))
    i = blob.find(b"PLTE") - 4
    ln = int.from_bytes(blob[i : i + 4], "big")
    del blob[i : i + 12 + ln]
    with _pytest.raises(ValueError, match="PLTE"):
        decode_png_pixels(bytes(blob))


def test_bmp_palette_decode():
    """8-bit palette BMP: indices stored bottom-up with 4-byte row
    padding resolve through the BGRX color table to RGB — closed form
    (v, v*7%256, v*13%256) per pixel; 16-bit depth stays gated."""
    import pytest as _pytest

    from omniparser_spark.operators.multimodal import (
        decode_bmp_pixels,
        make_bmp,
    )

    for w, h, seed in ((8, 8, 0), (5, 3, 7), (17, 9, 11), (1, 1, 2)):
        gw, gh, pix = decode_bmp_pixels(make_bmp(w, h, seed, palette=True))
        assert (gw, gh) == (w, h)
        for y in range(h):
            for x in range(w):
                v = (x * 31 + y * 17 + seed) % 256
                o = (y * w + x) * 3
                assert pix[o : o + 3] == bytes(
                    (v, (v * 7) % 256, (v * 13) % 256)
                ), (w, h, x, y)
    bad = bytearray(make_bmp(8, 8, 1))
    bad[28] = 16  # biBitCount
    with _pytest.raises(NotImplementedError, match="16-bit"):
        decode_bmp_pixels(bytes(bad))


def test_bmp_rle8_decode():
    """BI_RLE8 BMP: the escape-coded stream (encoded runs, absolute
    mode with word alignment, EOL/EOB, delta skips defaulting skipped
    pixels to palette 0) decodes to the same pixels as the
    uncompressed 8-bit palette encoding; a stream without the
    end-of-bitmap escape refuses."""
    import struct

    import pytest as _pytest

    from omniparser_spark.operators.multimodal import (
        decode_bmp_pixels,
        make_bmp,
    )

    for w, h, seed in ((8, 8, 0), (5, 3, 7), (17, 9, 11), (1, 1, 2)):
        assert decode_bmp_pixels(
            make_bmp(w, h, seed, palette=True)
        ) == decode_bmp_pixels(
            make_bmp(w, h, seed, palette=True, rle=True)
        ), (w, h, seed)

    def with_stream(stream: bytes) -> bytes:
        blob = bytearray(make_bmp(4, 3, 0, palette=True))
        start = struct.unpack("<I", blob[10:14])[0]
        blob = blob[:start] + stream
        blob[30:34] = struct.pack("<I", 1)  # BI_RLE8
        blob[34:38] = struct.pack("<I", len(stream))
        blob[2:6] = struct.pack("<I", start + len(stream))
        return bytes(blob)

    # encoded run + early EOL + delta skip past the edge + EOB:
    # storage row 0 all index 5; row 1 starts [7,7] then everything
    # the delta skips stays palette index 0
    w, h, pix = decode_bmp_pixels(
        with_stream(bytes([4, 5, 0, 0, 2, 7, 0, 2, 2, 1, 3, 9, 0, 1]))
    )
    v = 5
    assert pix[(2 * 4) * 3 : (2 * 4 + 1) * 3] == bytes(
        (v, v * 7 % 256, v * 13 % 256)
    )
    assert pix[(1 * 4 + 2) * 3 : (1 * 4 + 3) * 3] == b"\x00\x00\x00"
    with _pytest.raises(ValueError, match="end-of-bitmap"):
        decode_bmp_pixels(with_stream(bytes([4, 5, 0, 0])))


def test_wav_pcm_depth_matrix():
    """8/16/24/32-bit integer PCM, mono and stereo, decode to the
    closed-form sample values (8-bit is stored unsigned and returned
    centered); float WAV (format 3) gates loudly instead of decoding
    its bit pattern as integers."""
    import struct

    import pytest as _pytest

    from omniparser_spark.operators.multimodal import (
        decode_wav_samples,
        make_wav,
    )

    forms = {
        8: lambda i: ((i * 797) % 200) - 100,
        16: lambda i: ((i * 797) % 20000) - 10000,
        24: lambda i: (((i * 797) % 20000) - 10000) << 8,
        32: lambda i: (((i * 797) % 20000) - 10000) << 16,
    }
    for bd, form in forms.items():
        for ch in (1, 2):
            rate, c, s = decode_wav_samples(
                make_wav(8000, 50, channels=ch, bit_depth=bd)
            )
            n = 8000 * 50 // 1000 * ch
            assert (rate, c, len(s)) == (8000, ch, n)
            assert all(s[i] == form(i) for i in range(n)), (bd, ch)
    blob = bytearray(make_wav(8000, 10, bit_depth=32))
    i = blob.find(b"fmt ") + 8
    blob[i : i + 2] = struct.pack("<H", 3)  # IEEE float tag
    with _pytest.raises(NotImplementedError, match="integer PCM"):
        decode_wav_samples(bytes(blob))


def test_jpeg_features_are_pixel_derived(spark):
    """extract_features on JPEG media: the feature vector must be the
    decoded pixel-value histogram (counts reconstruct exactly), not a
    byte histogram of the compressed stream."""
    from omniparser_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
        make_jpeg,
    )

    rows = []
    for i in range(6):
        w, h = 8 * (1 + i % 3), 8 * (1 + (i * 2) % 3)
        rows.append(
            (i, "image", bytearray(make_jpeg(w, h, seed=i)),
             ("image/jpeg", w, h, 0))
        )
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {r.media_id: r for r in extract_features(media).collect()}
    for i in range(6):
        w, h = 8 * (1 + i % 3), 8 * (1 + (i * 2) % 3)
        want = [0] * 16
        for by in range(h // 8):
            for bx in range(w // 8):
                v = 128 + 2 * (((bx * 31 + by * 17 + i) % 64) - 32)
                want[v * 16 // 256] += 64
        got = [round(f * (w * h)) for f in feats[i].features]
        assert got == want, i


def test_jpeg_restart_intervals():
    """DRI/RSTn (T.81 E.2.4): restart markers change the entropy
    stream — byte-aligned 1-fill padding, cycling RST0..RST7, per-
    component DC predictor resets — but NOT the decoded pixels. Both
    the grayscale (MCU = 1 block) and interleaved-color (MCU = 2x2 Y +
    Cb + Cr) paths must decode restart streams bit-identically to the
    restart-free encoding of the same image, and corrupted restart
    sequences must refuse loudly, never resync silently."""
    import pytest as _pytest

    from omniparser_spark.operators.multimodal import (
        decode_jpeg_pixels,
        decode_jpeg_quantized,
        encode_jpeg_blocks,
        make_jpeg,
        make_jpeg_color,
    )

    # grayscale: re-encode the same quantized blocks at several
    # intervals (1 forces a restart after EVERY block — the maximal
    # predictor-reset stress) and the pixels must be unchanged
    w0, h0, quant, blocks = decode_jpeg_quantized(make_jpeg(32, 24, 5))
    want = decode_jpeg_pixels(make_jpeg(32, 24, 5))
    for ri in (1, 3, 7, 100):
        blob = encode_jpeg_blocks(32, 24, blocks, quant,
                                  restart_interval=ri)
        if ri < len(blocks):
            assert b"\xff\xd0" in blob  # markers actually present
        assert decode_jpeg_pixels(blob) == want

    # interleaved 4:2:0 color: > 8 MCUs so the RSTn sequence wraps
    # past RST7 and the cycle check is exercised
    want_c = decode_jpeg_pixels(make_jpeg_color(80, 48, seed=9))
    blob_c = make_jpeg_color(80, 48, seed=9, restart_interval=1)
    assert blob_c.count(b"\xff\xd0") >= 2  # RST0 occurs twice (wrap)
    assert decode_jpeg_pixels(blob_c) == want_c

    # corrupted sequence number: refuse, don't resync
    bad = bytearray(blob_c)
    i = bad.find(b"\xff\xd0", 2)
    bad[i + 1] = 0xD4
    with _pytest.raises(ValueError, match="RST sequence out of order"):
        decode_jpeg_pixels(bytes(bad))

    # truncated restart (marker replaced by entropy-looking bytes):
    # the reader must not invent data past the boundary
    gone = bytearray(blob_c)
    gone[i] = 0x00
    gone[i + 1] = 0x00
    with _pytest.raises(ValueError):
        decode_jpeg_pixels(bytes(gone))
