"""From-scratch WAV (RIFF PCM) decode — the audio twin of
:mod:`aide_spark.operators.image_codec`, stdlib only.

Covers integer PCM (8/16/24/32-bit) and float32 (format 3), the formats a
training-data pipeline actually ingests in bulk; compressed codecs (MP3,
AAC, …) need native libs this environment lacks and keep falling to the
multimodal stub. Returns ``None`` for malformed/unsupported payloads."""

from __future__ import annotations

import struct


def decode_wav(data: bytes) -> tuple[int, int, int, list[float]] | None:
    """WAV bytes → (sample_rate, channels, n_frames, samples in [-1, 1],
    channel-interleaved)."""
    if not isinstance(data, (bytes, bytearray)) or len(data) < 12:
        return None
    data = bytes(data)
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    pos = 12
    fmt = None
    samples: list[float] | None = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        ln = int.from_bytes(data[pos + 4 : pos + 8], "little")
        if pos + 8 + ln > len(data):
            # truncated / over-declared chunk: reject rather than silently
            # decoding a partial sample buffer (r4 advisory; matches the
            # PNG codec's short-pixel-data quarantine convention)
            return None
        body = data[pos + 8 : pos + 8 + ln]
        if cid == b"fmt " and len(body) >= 16:
            audio_fmt, nch, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            fmt = (audio_fmt, nch, rate, bits)
        elif cid == b"data" and fmt is not None:
            audio_fmt, nch, rate, bits = fmt
            if audio_fmt == 1:  # integer PCM
                if bits == 8:  # unsigned
                    samples = [(b - 128) / 128.0 for b in body]
                elif bits == 16:
                    n = len(body) // 2
                    samples = [
                        v / 32768.0
                        for v in struct.unpack("<%dh" % n, body[: 2 * n])
                    ]
                elif bits == 24:
                    samples = [
                        int.from_bytes(body[i : i + 3], "little", signed=True)
                        / 8388608.0
                        for i in range(0, len(body) - 2, 3)
                    ]
                elif bits == 32:
                    n = len(body) // 4
                    samples = [
                        v / 2147483648.0
                        for v in struct.unpack("<%di" % n, body[: 4 * n])
                    ]
                else:
                    return None
            elif audio_fmt == 3 and bits == 32:  # IEEE float
                n = len(body) // 4
                samples = list(struct.unpack("<%df" % n, body[: 4 * n]))
            else:
                return None
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if fmt is None or samples is None or fmt[1] == 0:
        return None
    return fmt[2], fmt[1], len(samples) // fmt[1], samples


def encode_wav(
    sample_rate: int, channels: int, samples: list[float], bits: int = 16
) -> bytes:
    """Inverse (integer PCM only) for round-trip tests."""
    if bits != 16:
        raise ValueError("encoder emits 16-bit PCM only")
    pcm = struct.pack(
        "<%dh" % len(samples),
        *[max(-32768, min(32767, round(s * 32768.0))) for s in samples],
    )
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate,
        sample_rate * channels * 2, channels * 2, 16,
    )
    return (
        b"RIFF" + (4 + 8 + len(fmt) + 8 + len(pcm)).to_bytes(4, "little")
        + b"WAVE"
        + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + len(pcm).to_bytes(4, "little") + pcm
    )
