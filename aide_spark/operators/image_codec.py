"""From-scratch image codecs — PNG and binary PNM — using only the stdlib.

The north star treats media as opaque binary columns with decode /
feature-extract as vectorized UDF stages; this module makes the decode REAL
for the two formats expressible without native image libraries (which this
environment lacks): PNG (zlib inflate + scanline unfilter, spec ISO 15948
§9: filters None/Sub/Up/Average/Paeth; 8-bit gray, gray+alpha, RGB, RGBA
and palette color) and binary PNM (P5 gray / P6 RGB). Anything else (JPEG,
video, audio) still falls to the deterministic stub in
:mod:`aide_spark.operators.multimodal` — honestly labeled there.

Decoders return ``None`` for malformed/unsupported payloads (the quarantine
convention shared with the PDF codec), never raise.
"""

from __future__ import annotations

import re
import zlib

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type → samples/pixel


def decode_png(data: bytes) -> tuple[int, int, int, bytes] | None:
    """PNG bytes → (width, height, channels, interleaved 8-bit pixels).

    Supports bit depth 8, color types 0/2/3/4/6, non-interlaced. Palette
    images are expanded to RGB. Returns None otherwise."""
    if not isinstance(data, (bytes, bytearray)) or data[:8] != PNG_MAGIC:
        return None
    data = bytes(data)
    i, idat, plte = 8, [], None
    w = h = ct = None
    bd = interlace = -1
    while i + 8 <= len(data):
        ln = int.from_bytes(data[i : i + 4], "big")
        typ = data[i + 4 : i + 8]
        chunk = data[i + 8 : i + 8 + ln]
        if typ == b"IHDR":
            if ln < 13:
                return None
            w = int.from_bytes(chunk[0:4], "big")
            h = int.from_bytes(chunk[4:8], "big")
            bd, ct, interlace = chunk[8], chunk[9], chunk[12]
        elif typ == b"PLTE":
            plte = chunk
        elif typ == b"IDAT":
            idat.append(chunk)
        elif typ == b"IEND":
            break
        i += 12 + ln
    nch = _CHANNELS.get(ct)
    if not w or not h or bd != 8 or interlace != 0 or nch is None:
        return None
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    stride = w * nch
    if len(raw) < h * (stride + 1):
        return None
    out = bytearray()
    prev = bytes(stride)
    pos = 0
    for _row in range(h):
        f = raw[pos]
        cur = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += stride + 1
        if f == 1:  # Sub
            for x in range(nch, stride):
                cur[x] = (cur[x] + cur[x - nch]) & 0xFF
        elif f == 2:  # Up
            for x in range(stride):
                cur[x] = (cur[x] + prev[x]) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                a = cur[x - nch] if x >= nch else 0
                cur[x] = (cur[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = cur[x - nch] if x >= nch else 0
                b = prev[x]
                c = prev[x - nch] if x >= nch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
        elif f != 0:
            return None
        out += cur
        prev = bytes(cur)
    if ct == 3:  # palette → RGB
        if plte is None:
            return None
        px = bytearray()
        for b_ in out:
            if 3 * b_ + 3 > len(plte):
                return None
            px += plte[3 * b_ : 3 * b_ + 3]
        return w, h, 3, bytes(px)
    return w, h, nch, bytes(out)


def encode_png(w: int, h: int, channels: int, pixels: bytes) -> bytes:
    """(width, height, channels, 8-bit pixels) → PNG (filter 0 scanlines)."""
    ct = {1: 0, 2: 4, 3: 2, 4: 6}[channels]

    def chunk(typ: bytes, payload: bytes) -> bytes:
        return (
            len(payload).to_bytes(4, "big") + typ + payload
            + zlib.crc32(typ + payload).to_bytes(4, "big")
        )

    stride = w * channels
    if len(pixels) != h * stride:
        raise ValueError("pixel buffer does not match dimensions")
    raw = b"".join(
        b"\x00" + pixels[r * stride : (r + 1) * stride] for r in range(h)
    )
    return (
        PNG_MAGIC
        + chunk(b"IHDR", w.to_bytes(4, "big") + h.to_bytes(4, "big")
                + bytes([8, ct, 0, 0, 0]))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


_PNM_HDR = re.compile(rb"^(P[56])\s+(?:#[^\n]*\n\s*)?(\d+)\s+(\d+)\s+(\d+)\s")


def decode_pnm(data: bytes) -> tuple[int, int, int, bytes] | None:
    """Binary PNM (P5 gray / P6 RGB) → (width, height, channels, pixels)."""
    if not isinstance(data, (bytes, bytearray)):
        return None
    m = _PNM_HDR.match(bytes(data))
    if not m or int(m.group(4)) != 255:
        return None
    w, h = int(m.group(2)), int(m.group(3))
    nch = 1 if m.group(1) == b"P5" else 3
    px = bytes(data[m.end() : m.end() + w * h * nch])
    return (w, h, nch, px) if len(px) == w * h * nch else None


def encode_pnm(w: int, h: int, channels: int, pixels: bytes) -> bytes:
    magic = b"P5" if channels == 1 else b"P6"
    return magic + b"\n%d %d\n255\n" % (w, h) + pixels


def sniff_codec(data: bytes) -> str | None:
    """Magic-byte format sniff: 'png' / 'pnm' / 'jpeg' / None."""
    if not isinstance(data, (bytes, bytearray)):
        return None
    head = bytes(data[:8])
    if head == PNG_MAGIC:
        return "png"
    if head[:2] in (b"P5", b"P6"):
        return "pnm"
    if head[:2] == b"\xff\xd8":
        return "jpeg"
    return None


def decode_image(data: bytes) -> tuple[int, int, int, bytes] | None:
    """Magic-byte dispatch over the supported formats (PNG, PNM, baseline
    JPEG — the JPEG decoder is from-scratch too, operators/jpeg_codec)."""
    codec = sniff_codec(data)
    if codec == "png":
        return decode_png(data)
    if codec == "pnm":
        return decode_pnm(data)
    if codec == "jpeg":
        from .jpeg_codec import decode_jpeg

        return decode_jpeg(data)
    return None
