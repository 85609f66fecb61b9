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
        "duration_ms": 125,
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
