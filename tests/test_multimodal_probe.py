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
