"""Pure-numpy media codecs: PPM/BMP/WAV decode for real, strict-mode
raise only for formats that genuinely need external libraries."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from setsm_postprocessing_python_spark.operators.multimodal import (
    attach_media, decode_bmp, decode_features, decode_media, decode_ppm,
    decode_wav)


def _ppm(w, h, seed=3):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, w * h * 3, dtype=np.uint8)
    return (b"P6\n# comment\n" + f"{w} {h}\n255\n".encode()
            + px.tobytes()), px


def _bmp(w, h, seed=4):
    rng = np.random.default_rng(seed)
    rows = [rng.integers(0, 256, w * 3, dtype=np.uint8) for _ in range(h)]
    stride = (w * 3 + 3) & ~3
    body = b"".join(r.tobytes() + b"\0" * (stride - w * 3)
                    for r in reversed(rows))  # bottom-up
    off = 54
    header = (b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                            2835, 2835, 0, 0))
    return header + body, np.concatenate(rows)


def _wav(n_samples, n_ch=2, seed=5):
    rng = np.random.default_rng(seed)
    samples = rng.integers(-32768, 32768, n_samples * n_ch, dtype=np.int16)
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, n_ch, 8000, 8000 * n_ch * 2, n_ch * 2, 16)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body, samples


def _hist(values):
    h, _ = np.histogram(values, bins=16, range=(0, 256))
    return (h / max(int(h.sum()), 1)).astype(np.float32)


def test_ppm_decode_exact():
    buf, px = _ppm(13, 7)
    w, h, fmt, feat = decode_ppm(buf)
    assert (w, h, fmt) == (13, 7, "ppm")
    assert np.array_equal(feat, _hist(px))


def test_bmp_decode_exact():
    buf, px = _bmp(10, 6)
    w, h, fmt, feat = decode_bmp(buf)
    assert (w, h, fmt) == (10, 6, "bmp")
    assert np.array_equal(feat, _hist(px))


def test_wav_decode_exact():
    buf, samples = _wav(500, n_ch=2)
    n, ch, fmt, feat = decode_wav(buf)
    assert (n, ch, fmt) == (500, 2, "wav-pcm16")
    scaled = ((samples.astype(np.int32) + 32768) >> 8).astype(np.uint8)
    assert np.array_equal(feat, _hist(scaled))


def test_sniff_rejects_unknown():
    assert decode_media(b"\x89PNG\r\n\x1a\nxxxx") is None
    assert decode_media(b"<html><body>hi</body></html>") is None


def test_spark_decode_real_and_strict(spark):
    """End-to-end through mapInPandas: real formats decode with exact
    dims/features; strict mode raises only on non-built-in payloads."""
    ppm, ppm_px = _ppm(9, 5)
    bmp, _ = _bmp(8, 4)
    wav, _ = _wav(200, n_ch=1)
    rows = [("u_ppm", bytearray(ppm)), ("u_bmp", bytearray(bmp)),
            ("u_wav", bytearray(wav))]
    df = spark.createDataFrame(rows, "url string, html binary")
    out = {r.url: r for r in
           decode_features(attach_media(df), strict=True).collect()}
    assert (out["u_ppm"].width, out["u_ppm"].height,
            out["u_ppm"].format) == (9, 5, "ppm")
    assert np.allclose(out["u_ppm"].feature, _hist(ppm_px))
    assert out["u_bmp"].format == "bmp"
    assert out["u_wav"].format == "wav-pcm16" and out["u_wav"].height == 1

    bad = spark.createDataFrame(
        [("u_png", bytearray(b"\x89PNG....payload"))],
        "url string, html binary")
    with pytest.raises(Exception, match="NotImplementedError|PIL/ffmpeg"):
        decode_features(attach_media(bad), strict=True).collect()
    # non-strict falls back to the deterministic fake
    fb = decode_features(attach_media(bad), strict=False).collect()[0]
    assert fb.format == "stub" and len(fb.feature) == 16


def test_malformed_known_magic_falls_back_not_crashes():
    """Truncated/corrupt payloads of a KNOWN magic must yield None from
    decode_media (the caller's strict/fake policy decides) — never an
    exception out of the decoder."""
    from setsm_postprocessing_python_spark.operators.multimodal import (
        _fake_decode)

    ppm_full, _ = _ppm(6, 4)
    bmp_full, _ = _bmp(6, 4)
    wav_full, _ = _wav(50)
    malformed = [
        b"P6",                      # header alone
        b"P6\nxx yy zz\n",          # non-numeric dims
        ppm_full[:20],              # truncated pixels
        b"BM" + b"\0" * 40,         # undersized header
        bmp_full[:40],
        b"RIFF\x04\x00\x00\x00WAVE",    # no fmt/data chunks
        wav_full[:30],
    ]
    for buf in malformed:
        assert decode_media(buf) is None, buf[:12]
        w, h, fmt, feat = _fake_decode(buf)  # the strict=False fallback
        assert fmt == "stub" and len(feat) == 16
