"""Real image decode (from-scratch PNG/PNM codecs) + the Arrow-batched
multimodal feature surface."""

from __future__ import annotations

import zlib

import pytest

from aide_spark.operators.image_codec import (
    decode_image, decode_png, decode_pnm, encode_png, encode_pnm,
)


def _pixels(w: int, h: int, nch: int) -> bytes:
    return bytes((x * 7 + 13) % 256 for x in range(w * h * nch))


@pytest.mark.parametrize("nch", [1, 2, 3, 4])
def test_png_round_trip_all_channel_counts(nch):
    w, h = 9, 5  # odd width exercises stride math
    px = _pixels(w, h, nch)
    assert decode_png(encode_png(w, h, nch, px)) == (w, h, nch, px)


def test_png_foreign_filters_decode():
    """The encoder only emits filter 0 — hand-build scanlines with filters
    1-4 (Sub/Up/Average/Paeth) so the decoder is proven against the spec,
    not just its own output."""
    w, h, nch = 6, 5, 3
    px = _pixels(w, h, nch)
    stride = w * nch

    rows = [bytearray(px[r * stride : (r + 1) * stride]) for r in range(h)]

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    filtered = bytearray()
    prev = bytes(stride)
    for r, ftype in zip(range(h), [0, 1, 2, 3, 4]):
        cur = rows[r]
        out = bytearray(cur)
        if ftype == 1:
            for x in range(stride - 1, nch - 1, -1):
                out[x] = (cur[x] - cur[x - nch]) & 0xFF
        elif ftype == 2:
            for x in range(stride):
                out[x] = (cur[x] - prev[x]) & 0xFF
        elif ftype == 3:
            for x in range(stride):
                a = cur[x - nch] if x >= nch else 0
                out[x] = (cur[x] - ((a + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:
            for x in range(stride):
                a = cur[x - nch] if x >= nch else 0
                c = prev[x - nch] if x >= nch else 0
                out[x] = (cur[x] - paeth(a, prev[x], c)) & 0xFF
        filtered += bytes([ftype]) + out
        prev = bytes(cur)

    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
    )

    def chunk(typ, data):
        return (
            len(data).to_bytes(4, "big") + typ + data
            + zlib.crc32(typ + data).to_bytes(4, "big")
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(filtered)))
        + chunk(b"IEND", b"")
    )
    assert decode_png(png) == (w, h, nch, px)


def test_png_palette_expands_to_rgb():
    # 2x2 palette image: indices 0..3 → distinct RGB triples
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])
    raw = b"\x00" + bytes([0, 1]) + b"\x00" + bytes([2, 3])
    ihdr = (2).to_bytes(4, "big") + (2).to_bytes(4, "big") + bytes([8, 3, 0, 0, 0])

    def chunk(typ, data):
        return (
            len(data).to_bytes(4, "big") + typ + data
            + zlib.crc32(typ + data).to_bytes(4, "big")
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert decode_png(png) == (
        2, 2, 3, bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])
    )


@pytest.mark.parametrize("nch", [1, 3])
def test_pnm_round_trip(nch):
    w, h = 7, 4
    px = _pixels(w, h, nch)
    assert decode_pnm(encode_pnm(w, h, nch, px)) == (w, h, nch, px)


def test_image_decoders_reject_malformed():
    assert decode_png(b"not a png") is None
    assert decode_png(b"\x89PNG\r\n\x1a\n truncated") is None
    assert decode_pnm(b"P6\n3 3\n65535\n" + bytes(27)) is None  # 16-bit maxval
    assert decode_pnm(b"P6\n4 4\n255\n" + bytes(5)) is None  # short pixels
    assert decode_image(b"\xff\xd8\xff JPEG soi") is None  # unsupported → stub path
    # Adam7-interlaced PNG decodes since r4 (1×1 = single pass-1 pixel)
    ihdr = (1).to_bytes(4, "big") * 2 + bytes([8, 0, 0, 0, 1])

    def chunk(typ, data):
        return (
            len(data).to_bytes(4, "big") + typ + data
            + zlib.crc32(typ + data).to_bytes(4, "big")
        )

    png = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00\x00")) + chunk(b"IEND", b"")
    )
    assert decode_png(png) == (1, 1, 1, b"\x00")
    # truncated interlaced pass data still quarantines
    short = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00")) + chunk(b"IEND", b"")
    )
    assert decode_png(short) is None


def test_wav_round_trip_and_formats():
    import struct as _struct

    from aide_spark.operators.audio_codec import decode_wav, encode_wav

    samples = [0.0, 0.5, -0.5, 0.25, -1.0, 0.999, 0.1, -0.1]
    rate, nch, n_frames, got = decode_wav(encode_wav(8000, 2, samples))
    assert (rate, nch, n_frames) == (8000, 2, 4)
    assert all(abs(a - b) < 1e-4 for a, b in zip(got, samples))
    # float32 WAV (format 3)
    pcm = _struct.pack("<4f", 0.5, -0.25, 1.0, -1.0)
    fmt = _struct.pack("<HHIIHH", 3, 1, 44100, 44100 * 4, 4, 32)
    wav = (
        b"RIFF" + (4 + 8 + len(fmt) + 8 + len(pcm)).to_bytes(4, "little")
        + b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + len(pcm).to_bytes(4, "little") + pcm
    )
    rate, nch, n_frames, got = decode_wav(wav)
    assert (rate, nch, n_frames, got) == (44100, 1, 4, [0.5, -0.25, 1.0, -1.0])
    # 8-bit unsigned PCM
    fmt8 = _struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    wav8 = (
        b"RIFF" + (4 + 8 + len(fmt8) + 8 + 2).to_bytes(4, "little")
        + b"WAVE" + b"fmt " + len(fmt8).to_bytes(4, "little") + fmt8
        + b"data" + (2).to_bytes(4, "little") + bytes([128, 255])
    )
    assert decode_wav(wav8)[3] == [0.0, 127 / 128.0]
    assert decode_wav(b"RIFF\x00\x00\x00\x00AVI LIST") is None  # not WAVE
    assert decode_wav(b"garbage") is None


def test_decode_image_features_arrow_path(spark):
    """(doc_id, payload) → real features through mapInPandas; undecodable
    rows get NULL dims, real images exact width/height/channels/mean."""
    from aide_spark.operators.multimodal import decode_features, decode_image_features

    px = bytes([0, 255, 0, 255])  # mean 127.5/255 = 0.5
    rows = [
        (1, bytearray(encode_png(2, 2, 1, px))),
        (2, bytearray(encode_pnm(2, 2, 1, px))),
        (3, bytearray(b"unknown payload bytes")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in decode_image_features(df).collect()}
    assert (got[1].width, got[1].height, got[1].channels) == (2, 2, 1)
    assert got[1].mean_luma == 0.5 and got[1].codec == "png"
    assert got[2].codec == "pnm" and got[2].mean_luma == 0.5
    assert got[3].codec == "undecodable" and got[3].width is None

    # the generic feature surface uses the REAL decode for image magics and
    # the deterministic stub otherwise (codec column tells)
    from aide_spark.operators.audio_codec import encode_wav

    df = df.unionByName(
        spark.createDataFrame(
            [(4, bytearray(encode_wav(8000, 1, [0.5, -0.5, 0.25, -0.25])))],
            "doc_id long, payload binary",
        )
    )
    feats = {r.doc_id: r for r in decode_features(df).collect()}
    assert feats[1].codec == "png" and feats[1].n_frames == 1
    assert feats[1].feature_0 == 0.5
    assert feats[3].codec == "stub/v1"
    assert feats[4].codec == "wav" and feats[4].n_frames == 4
    assert abs(feats[4].feature_0 - 0.375) < 1e-4


def test_dhash_reference_values(spark):
    """dhash_py vs a hand-computed case + gradient/checker sanity."""
    import numpy as np

    from aide_spark.operators.multimodal import dhash_py

    # horizontal ramp: every left block mean < right block mean -> no bits
    w, h = 18, 16
    ramp = bytes(min(255, x * 14) for _y in range(h) for x in range(w))
    assert dhash_py(w, h, 1, ramp) == 0
    # reversed ramp: every comparison true -> all 64 bits set -> signed -1
    rramp = bytes(min(255, (w - 1 - x) * 14) for _y in range(h) for x in range(w))
    assert dhash_py(w, h, 1, rramp) == -1
    # multi-channel: luma average across channels must match the gray twin
    gray = np.random.RandomState(7).randint(0, 256, size=(h, w), dtype=np.uint8)
    rgb = np.repeat(gray[:, :, None], 3, axis=2)
    assert dhash_py(w, h, 3, rgb.tobytes()) == dhash_py(w, h, 1, gray.tobytes())


def test_image_dhash_arrow_path(spark):
    """Undecodable and too-small payloads yield NULL dhash; real PNGs round-trip."""
    import pandas as pd

    from aide_spark.operators.image_codec import encode_png
    from aide_spark.operators.multimodal import dhash_py, image_dhash

    px = bytes((x * 7 + y * 3) % 256 for y in range(16) for x in range(18))
    good = encode_png(18, 16, 1, px)
    tiny = encode_png(4, 4, 1, bytes(16))
    rows = [(0, good), (1, b"not an image"), (2, tiny), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in image_dhash(df).collect()}
    assert out[0]["dhash"] == dhash_py(18, 16, 1, px)
    assert out[0]["width"] == 18 and out[0]["height"] == 16
    for bad in (1, 2, 3):
        assert out[bad]["dhash"] is None


def test_audio_ahash_properties(spark):
    """Gain invariance, length gates, and the Arrow path."""
    import numpy as np

    from aide_spark.operators.audio_codec import encode_wav
    from aide_spark.operators.multimodal import ahash_py, audio_ahash

    rng = np.random.RandomState(3)
    sig = rng.uniform(-0.9, 0.9, size=650)
    h = ahash_py(sig)
    assert h == ahash_py(sig * 0.5)  # uniform gain preserves the hash
    assert h == ahash_py(list(sig))  # list input equals array input
    assert ahash_py([0.1] * 64) is None  # shorter than 65 samples

    rows = [
        (0, encode_wav(8000, 1, list(sig))),
        (1, b"not audio"),
        (2, encode_wav(8000, 1, [0.5] * 10)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in audio_ahash(df).collect()}
    # decode quantizes to 16-bit; hash the quantized twin for equality
    quant = [max(-32768, min(32767, round(s * 32768.0))) / 32768.0 for s in sig]
    assert out[0]["ahash"] == ahash_py(quant)
    assert out[0]["n_samples"] == 650
    assert out[1]["ahash"] is None and out[2]["ahash"] is None
