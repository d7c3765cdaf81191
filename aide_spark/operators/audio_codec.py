"""From-scratch WAV (RIFF) decode — the audio twin of
:mod:`aide_spark.operators.image_codec`, stdlib only.

Covers integer PCM (8/16/24/32-bit), float32 (format 3), and — r5 — the
classic COMPRESSED wave codecs that need no native libs because they are
pure table/bit math: **G.711 A-law (format 6) / µ-law (format 7)**
(telephony, 2:1) and **IMA ADPCM (format 0x11)** (4:1, block-structured
nibble deltas). Perceptual codecs (MP3, AAC, …) genuinely need native
decoders this environment lacks and keep falling to the multimodal stub.
Returns ``None`` for malformed/unsupported payloads."""

from __future__ import annotations

import struct

# IMA ADPCM constants (IMA Digital Audio Pack 1992 / Microsoft
# WAVE_FORMAT_IMA_ADPCM; same tables every implementation uses)
_IMA_INDEX = (-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)
_IMA_STEP = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)


def _ulaw_to_linear(b: int) -> int:
    """G.711 µ-law byte → 16-bit linear sample (standard bias-0x84 form)."""
    u = ~b & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    return (0x84 - t) if (u & 0x80) else (t - 0x84)


def _alaw_to_linear(b: int) -> int:
    """G.711 A-law byte → 16-bit linear sample (even-bit-inverted form)."""
    a = b ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if (a & 0x80) else -t


def linear_to_ulaw(s: int) -> int:
    """Inverse of :func:`_ulaw_to_linear` (encode side, for tests)."""
    sign = 0 if s >= 0 else 0x80
    if s < 0:
        s = -s
    s = min(s, 32635) + 0x84
    exp = 7
    mask = 0x4000
    while exp > 0 and not (s & mask):
        exp -= 1
        mask >>= 1
    mant = (s >> (exp + 3)) & 0x0F
    return ~(sign | (exp << 4) | mant) & 0xFF


def linear_to_alaw(s: int) -> int:
    """Inverse of :func:`_alaw_to_linear` (encode side, for tests)."""
    sign = 0x80 if s >= 0 else 0
    if s < 0:
        s = -s - 1
    s = min(s, 32767)
    if s < 0x100:
        out = s >> 4
    else:
        exp = 7
        mask = 0x4000
        while exp > 1 and not (s & mask):
            exp -= 1
            mask >>= 1
        out = (exp << 4) | ((s >> (exp + 3)) & 0x0F)
    return (sign | out) ^ 0x55


def _ima_decode_block(
    body: bytes, nch: int, out: list[float]
) -> bool:
    """One IMA ADPCM block (per-channel 4-byte header + interleaved 4-byte
    nibble groups) → appended normalized samples. False on malformed."""
    if len(body) < 4 * nch:
        return False
    pred = [0] * nch
    index = [0] * nch
    for c in range(nch):
        pred[c] = struct.unpack_from("<h", body, 4 * c)[0]
        index[c] = body[4 * c + 2]
        if index[c] > 88 or body[4 * c + 3] != 0:
            return False
        out.append(pred[c] / 32768.0)  # header carries the first sample
    pos = 4 * nch
    # data: one 4-byte group per channel, repeating; 8 nibbles per group,
    # low nibble of each byte first
    chans: list[list[float]] = [[] for _ in range(nch)]
    while pos + 4 * nch <= len(body):
        for c in range(nch):
            group = body[pos + 4 * c : pos + 4 * c + 4]
            for byte in group:
                for nib in (byte & 0x0F, byte >> 4):
                    step = _IMA_STEP[index[c]]
                    diff = step >> 3
                    if nib & 1:
                        diff += step >> 2
                    if nib & 2:
                        diff += step >> 1
                    if nib & 4:
                        diff += step
                    if nib & 8:
                        diff = -diff
                    pred[c] = max(-32768, min(32767, pred[c] + diff))
                    index[c] = max(0, min(88, index[c] + _IMA_INDEX[nib]))
                    chans[c].append(pred[c] / 32768.0)
        pos += 4 * nch
    for i in range(len(chans[0])):  # re-interleave channel-major groups
        for c in range(nch):
            out.append(chans[c][i])
    return True


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
            block_align, bits = struct.unpack("<HH", body[12:16])
            fmt = (audio_fmt, nch, rate, bits, block_align)
        elif cid == b"data" and fmt is not None:
            audio_fmt, nch, rate, bits, block_align = fmt
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
            elif audio_fmt == 6 and bits == 8:  # G.711 A-law
                samples = [_alaw_to_linear(b) / 32768.0 for b in body]
            elif audio_fmt == 7 and bits == 8:  # G.711 µ-law
                samples = [_ulaw_to_linear(b) / 32768.0 for b in body]
            elif audio_fmt == 0x11 and bits == 4:  # IMA ADPCM
                if block_align < 4 * nch:
                    return None
                samples = []
                for off in range(0, len(body) - block_align + 1, block_align):
                    if not _ima_decode_block(
                        body[off : off + block_align], nch, samples
                    ):
                        return None
            else:
                return None
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if fmt is None or samples is None or fmt[1] == 0:
        return None
    return fmt[2], fmt[1], len(samples) // fmt[1], samples


_FMT_NAMES = {1: "pcm", 3: "float", 6: "alaw", 7: "ulaw", 0x11: "adpcm"}


def sniff_wav_fmt(data: bytes) -> str | None:
    """RIFF/WAVE payload → codec name ('pcm'/'float'/'alaw'/'ulaw'/'adpcm'),
    None if not a WAV or an unknown format tag."""
    if (
        not isinstance(data, (bytes, bytearray))
        or len(data) < 12
        or bytes(data[:4]) != b"RIFF"
        or bytes(data[8:12]) != b"WAVE"
    ):
        return None
    data = bytes(data)
    pos = 12
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        ln = int.from_bytes(data[pos + 4 : pos + 8], "little")
        if cid == b"fmt " and ln >= 2 and pos + 10 <= len(data):
            return _FMT_NAMES.get(struct.unpack_from("<H", data, pos + 8)[0])
        pos += 8 + ln + (ln & 1)
    return None


def _wav_container(fmt: bytes, data: bytes) -> bytes:
    return (
        b"RIFF" + (4 + 8 + len(fmt) + 8 + len(data) + (len(data) & 1)).to_bytes(4, "little")
        + b"WAVE"
        + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + len(data).to_bytes(4, "little") + data
        + (b"\x00" if len(data) & 1 else b"")
    )


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
    return _wav_container(fmt, pcm)


def encode_wav_g711(
    sample_rate: int, channels: int, samples: list[float], law: str = "ulaw"
) -> bytes:
    """16-bit-equivalent samples → G.711 WAV (format 7 µ-law / 6 A-law);
    round-trip fixture for the compressed-audio decode arm."""
    enc = linear_to_ulaw if law == "ulaw" else linear_to_alaw
    tag = 7 if law == "ulaw" else 6
    data = bytes(
        enc(max(-32768, min(32767, round(s * 32768.0)))) for s in samples
    )
    fmt = struct.pack(
        "<HHIIHH", tag, channels, sample_rate,
        sample_rate * channels, channels, 8,
    )
    return _wav_container(fmt, data)


def encode_wav_ima_adpcm(
    sample_rate: int,
    channels: int,
    samples: list[float],
    block_align: int | None = None,
) -> bytes:
    """16-bit-equivalent samples → IMA ADPCM WAV (format 0x11). Standard
    encoder: per block, per channel, header = (first sample, running step
    index); remaining samples as 4-bit deltas in interleaved 4-byte groups.
    Partial final blocks are padded by replicating the last sample."""
    nch = channels
    if block_align is None:
        block_align = 256 * nch
    groups = (block_align - 4 * nch) // (4 * nch)
    spb = 1 + 8 * groups  # samples per block per channel
    ints = [max(-32768, min(32767, round(s * 32768.0))) for s in samples]
    n_frames = len(ints) // nch
    index = [0] * nch
    out = bytearray()
    f = 0
    while f < n_frames:
        block_frames = [
            ints[min(f + i, n_frames - 1) * nch : min(f + i, n_frames - 1) * nch + nch]
            for i in range(spb)
        ]
        pred = [block_frames[0][c] for c in range(nch)]
        for c in range(nch):
            out += struct.pack("<hBB", pred[c], index[c], 0)
        nibs: list[list[int]] = [[] for _ in range(nch)]
        for i in range(1, spb):
            for c in range(nch):
                step = _IMA_STEP[index[c]]
                diff = block_frames[i][c] - pred[c]
                n = 0
                if diff < 0:
                    n = 8
                    diff = -diff
                if diff >= step:
                    n |= 4
                    diff -= step
                if diff >= step >> 1:
                    n |= 2
                    diff -= step >> 1
                if diff >= step >> 2:
                    n |= 1
                # reconstruct exactly as the decoder will
                d = step >> 3
                if n & 1:
                    d += step >> 2
                if n & 2:
                    d += step >> 1
                if n & 4:
                    d += step
                if n & 8:
                    d = -d
                pred[c] = max(-32768, min(32767, pred[c] + d))
                index[c] = max(0, min(88, index[c] + _IMA_INDEX[n]))
                nibs[c].append(n)
        for g in range(groups):
            for c in range(nch):
                for k in range(4):
                    lo = nibs[c][g * 8 + 2 * k]
                    hi = nibs[c][g * 8 + 2 * k + 1]
                    out.append(lo | (hi << 4))
        f += spb
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, nch, sample_rate,
        sample_rate * block_align // (spb * nch) if spb else 0,
        block_align, 4, 2, spb,
    )
    return _wav_container(fmt, bytes(out))
