"""From-scratch AVI (RIFF) video container decode — the video member of the
codec family (:mod:`image_codec` / :mod:`jpeg_codec` / :mod:`audio_codec`),
stdlib only.

Real video decode WITHOUT native libs is possible for exactly the codecs
whose picture layer we already implement from scratch: **MJPEG** (each frame
is a baseline JPEG — ``jpeg_codec.decode_jpeg``) and **uncompressed DIB**
(``BI_RGB`` bottom-up BGR frames). That covers the web's
motion-JPEG AVIs and raw capture dumps; inter-frame codecs (H.264, VP9, …)
genuinely require native decoders this environment lacks and keep falling
to the labeled multimodal stub.

Container walk: ``RIFF..AVI `` → ``LIST hdrl`` (``avih`` main header,
``LIST strl``/``strh``/``strf`` per stream) → ``LIST movi`` whose
``##dc``/``##db`` chunks (optionally wrapped in ``LIST rec ``) carry one
frame each for stream ``##``. The optional ``idx1`` index is ignored — a
sequential parse never needs it. The north star treats video as an opaque
binary column (SURVEY.md §2.12); this makes the decode leg real.

Encoders (:func:`encode_avi_mjpeg`, :func:`encode_avi_dib`) exist to
property-test the decoder, same convention as the GIF/JPEG test encoders.
"""

from __future__ import annotations

import struct

from .jpeg_codec import decode_jpeg, encode_jpeg


def _chunks(buf: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_len) for each RIFF chunk in
    ``buf[pos:end]``; chunk bodies are word-aligned."""
    while pos + 8 <= end:
        cid = buf[pos : pos + 4]
        ln = int.from_bytes(buf[pos + 4 : pos + 8], "little")
        if pos + 8 + ln > end:
            return  # over-declared chunk: stop rather than mis-slice
        yield cid, pos + 8, ln
        pos += 8 + ln + (ln & 1)


def _decode_dib(body: bytes, w: int, h: int, bitcount: int) -> tuple[int, int, int, bytes] | None:
    """BI_RGB device-independent bitmap frame → (w, h, channels, RGB/gray
    pixels). DIB rows are bottom-up and padded to 4-byte boundaries;
    24-bit rows are BGR order, 8-bit rows are gray."""
    if bitcount not in (8, 24):
        return None
    bpp = bitcount // 8
    stride = (w * bpp + 3) & ~3
    if len(body) < stride * h:
        return None
    out = bytearray(w * h * (3 if bpp == 3 else 1))
    for y in range(h):
        row = body[(h - 1 - y) * stride :]
        if bpp == 1:
            out[y * w : (y + 1) * w] = row[:w]
        else:
            for x in range(w):
                b, g, r = row[3 * x], row[3 * x + 1], row[3 * x + 2]
                o = (y * w + x) * 3
                out[o], out[o + 1], out[o + 2] = r, g, b
    return w, h, (3 if bpp == 3 else 1), bytes(out)


def decode_avi_frames(
    data: bytes,
) -> tuple[int, int, float, list[tuple[int, int, int, bytes]]] | None:
    """AVI bytes → (width, height, fps, frames), each frame
    ``(w, h, channels, pixels)`` from the real MJPEG or DIB picture layer.
    ``None`` for malformed payloads or codecs outside the from-scratch
    envelope (callers fall back to the labeled stub, same quarantine
    convention as :func:`image_codec.decode_image`)."""
    if not isinstance(data, (bytes, bytearray)) or len(data) < 12:
        return None
    data = bytes(data)
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        return None
    width = height = 0
    fps = 0.0
    vids_stream = -1
    handler = b""
    bitcount = 24
    n_streams = 0
    frames: list[tuple[int, int, int, bytes]] = []

    def walk_strl(pos: int, end: int) -> None:
        nonlocal vids_stream, handler, fps, bitcount, n_streams
        stream_no = n_streams
        n_streams += 1
        is_vids = False
        for cid, b, ln in _chunks(data, pos, end):
            body = data[b : b + ln]
            if cid == b"strh" and ln >= 36:
                fcc_type, fcc_handler = body[0:4], body[4:8]
                scale, rate = struct.unpack("<II", body[20:28])
                if fcc_type == b"vids" and vids_stream < 0:
                    is_vids = True
                    vids_stream = stream_no
                    handler = fcc_handler
                    if scale:
                        fps = rate / scale
            elif cid == b"strf" and is_vids and ln >= 40:
                # BITMAPINFOHEADER: biBitCount at offset 14
                bitcount = struct.unpack("<H", body[14:16])[0]

    def walk(pos: int, end: int) -> bool:
        nonlocal width, height
        for cid, b, ln in _chunks(data, pos, end):
            if cid == b"LIST":
                ltype = data[b : b + 4]
                if ltype == b"hdrl":
                    if not walk(b + 4, b + ln):
                        return False
                elif ltype == b"strl":
                    walk_strl(b + 4, b + ln)
                elif ltype in (b"movi", b"rec "):
                    if not walk(b + 4, b + ln):
                        return False
            elif cid == b"avih" and ln >= 40:
                width, height = struct.unpack("<II", data[b + 32 : b + 40])
            elif (
                len(cid) == 4
                and cid[:2].isdigit()
                and cid[2:4] in (b"dc", b"db")
                and int(cid[:2]) == vids_stream
            ):
                body = data[b : b + ln]
                if not ln:
                    # zero-length frame chunk = dropped frame marker; skip
                    continue
                if cid[2:4] == b"dc" or handler in (b"MJPG", b"mjpg"):
                    frame = decode_jpeg(body)
                else:
                    frame = _decode_dib(body, width, height, bitcount)
                if frame is None:
                    return False  # corrupt frame: quarantine whole payload
                frames.append(frame)
        return True

    if not walk(12, min(len(data), 8 + int.from_bytes(data[4:8], "little"))):
        return None
    if vids_stream < 0 or not frames:
        return None
    if not width or not height:
        width, height = frames[0][0], frames[0][1]
    return width, height, fps, frames


def sniff_video(data: bytes) -> str | None:
    """'avi' for RIFF AVI payloads, else None (audio RIFF is 'WAVE')."""
    if (
        isinstance(data, (bytes, bytearray))
        and len(data) >= 12
        and bytes(data[:4]) == b"RIFF"
        and bytes(data[8:12]) == b"AVI "
    ):
        return "avi"
    return None


# ---------------------------------------------------------------------------
# Test encoders (round-trip oracles for the decoder, per codec convention)
# ---------------------------------------------------------------------------


def _list(ltype: bytes, body: bytes) -> bytes:
    return b"LIST" + (4 + len(body)).to_bytes(4, "little") + ltype + body


def _chunk(cid: bytes, body: bytes) -> bytes:
    return cid + len(body).to_bytes(4, "little") + body + (b"\x00" if len(body) & 1 else b"")


def _headers(
    w: int, h: int, n_frames: int, fps: float, handler: bytes, bitcount: int,
    compression: bytes,
) -> bytes:
    usec = int(round(1_000_000 / fps)) if fps else 0
    avih = struct.pack(
        "<IIIIIIIIII4I",
        usec, 0, 0, 0x10, n_frames, 0, 1, 0, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + handler
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, int(round(fps)) or 1, 0,
                      n_frames, 0, 10_000, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, bitcount, compression,
        ((w * (bitcount // 8) + 3) & ~3) * h, 0, 0, 0, 0,
    )
    strl = _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))
    return _list(b"hdrl", _chunk(b"avih", avih) + strl)


def _riff(hdrl: bytes, movi_body: bytes) -> bytes:
    movi = _list(b"movi", movi_body)
    return b"RIFF" + (4 + len(hdrl) + len(movi)).to_bytes(4, "little") + b"AVI " + hdrl + movi


def encode_avi_mjpeg(
    w: int,
    h: int,
    frames: list[bytes],
    fps: float = 10.0,
    channels: int = 1,
    quant: int = 1,
) -> bytes:
    """Frames of raw pixels → MJPEG AVI (each '00dc' chunk is one baseline
    JPEG from :func:`jpeg_codec.encode_jpeg`). Test fixture; quant=1 keeps
    constant blocks bit-exact, same property the image oracle relies on."""
    movi = b"".join(
        _chunk(b"00dc", encode_jpeg(w, h, channels, px, quant=quant))
        for px in frames
    )
    return _riff(_headers(w, h, len(frames), fps, b"MJPG", 24, b"MJPG"), movi)


def encode_avi_dib(
    w: int, h: int, frames_rgb: list[bytes], fps: float = 10.0
) -> bytes:
    """Frames of RGB pixels → uncompressed BI_RGB AVI ('00db' chunks,
    bottom-up BGR rows padded to 4 bytes). Exercises the DIB arm."""
    stride_pad = b"\x00" * (((w * 3 + 3) & ~3) - w * 3)
    movi = b""
    for px in frames_rgb:
        rows = []
        for y in range(h - 1, -1, -1):
            row = bytearray()
            for x in range(w):
                o = (y * w + x) * 3
                row += bytes((px[o + 2], px[o + 1], px[o]))
            rows.append(bytes(row) + stride_pad)
        movi += _chunk(b"00db", b"".join(rows))
    return _riff(_headers(w, h, len(frames_rgb), fps, b"DIB ", 24, b"\x00\x00\x00\x00"), movi)
