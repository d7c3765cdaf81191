"""From-scratch baseline JPEG codec (ITU T.81 / JFIF), stdlib only.

Closes the r3 VERDICT gap #2: JPEG is the single most common image format in
a real 100 TB corpus and previously fell to the labeled multimodal stub.
This implements the baseline sequential DCT process — marker parse, DQT /
SOF0 / DHT / DRI / SOS, canonical Huffman entropy decode with byte
de-stuffing and restart intervals, dequantize + inverse zigzag, 8×8 float
IDCT, chroma upsampling for 4:2:0 / 4:2:2 / 4:4:4, YCbCr→RGB — and a
minimal encoder (4:4:4, flat quant table, fixed spec-legal Huffman tables)
whose purpose is property-testing the decoder round-trip without fixtures.

Out of scope, returns ``None`` (quarantine convention shared with
image_codec/audio_codec): progressive DCT (SOF2), arithmetic coding,
12-bit precision, CMYK (4-component), hierarchical. The reference consumes
decoded images through the same opaque-binary column contract
(SURVEY.md §2 multimodal row); no reference code models this codec.
"""

from __future__ import annotations

import math
import struct

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# orthonormal 8-point DCT-II basis: M[u][x] = c(u)/2 · cos((2x+1)uπ/16)
_M = [
    [
        (math.sqrt(0.5) if u == 0 else 1.0) * 0.5 * math.cos((2 * x + 1) * u * math.pi / 16)
        for x in range(8)
    ]
    for u in range(8)
]


def _idct8x8(F: list[float]) -> list[float]:
    """64 coefficients (row-major u,v) → 64 samples, f = Mᵀ·F·M."""
    tmp = [0.0] * 64
    for u in range(8):  # rows: for each u, transform over v
        base = u * 8
        for y in range(8):
            tmp[base + y] = sum(F[base + v] * _M[v][y] for v in range(8))
    out = [0.0] * 64
    for x in range(8):
        for y in range(8):
            out[x * 8 + y] = sum(_M[u][x] * tmp[u * 8 + y] for u in range(8))
    return out


def _fdct8x8(f: list[float]) -> list[float]:
    """64 samples → 64 coefficients, F = M·f·Mᵀ."""
    tmp = [0.0] * 64
    for x in range(8):
        for v in range(8):
            tmp[x * 8 + v] = sum(f[x * 8 + y] * _M[v][y] for y in range(8))
    out = [0.0] * 64
    for u in range(8):
        for v in range(8):
            out[u * 8 + v] = sum(_M[u][x] * tmp[x * 8 + v] for x in range(8))
    return out


def _build_huffman(counts: list[int], symbols: bytes) -> dict[tuple[int, int], int]:
    """Canonical Huffman (T.81 Annex C): (code length, code) → symbol."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            if k >= len(symbols):
                return table
            table[(length, code)] = symbols[k]
            k += 1
            code += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over a de-stuffed entropy segment."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.buf = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            # past the segment end: pad with 1s (T.81 F.1.2.3 allows the
            # final EOB run to complete off padding)
            b = self.data[self.pos] if self.pos < len(self.data) else 0xFF
            self.pos += 1
            self.buf = b
            self.n = 8
        self.n -= 1
        return (self.buf >> self.n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table: dict[tuple[int, int], int]) -> int | None:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        return None


def _extend(v: int, s: int) -> int:
    """T.81 F.12: s-bit magnitude → signed value."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def _clamp(x: float) -> int:
    v = int(round(x))
    return 0 if v < 0 else (255 if v > 255 else v)


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes] | None:
    """Baseline JPEG bytes → (width, height, channels, interleaved 8-bit
    pixels); grayscale → 1 channel, YCbCr → RGB. None if malformed or a
    non-baseline process."""
    if not isinstance(data, (bytes, bytearray)) or data[:2] != b"\xff\xd8":
        return None
    data = bytes(data)
    qt: dict[int, list[int]] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[dict] = []  # {id, h, v, tq, dc, ac}
    w = h = 0
    restart = 0
    i = 2
    scan_start = -1
    try:
        while i + 4 <= len(data):
            if data[i] != 0xFF:
                return None
            marker = data[i + 1]
            if marker == 0xD9:  # EOI before SOS
                return None
            ln = struct.unpack(">H", data[i + 2 : i + 4])[0]
            seg = data[i + 4 : i + 2 + ln]
            if marker == 0xDB:  # DQT
                p = 0
                while p < len(seg):
                    pq, tq = seg[p] >> 4, seg[p] & 0xF
                    p += 1
                    if pq == 0:
                        qt[tq] = list(seg[p : p + 64])
                        p += 64
                    else:
                        qt[tq] = [
                            struct.unpack(">H", seg[p + 2 * k : p + 2 * k + 2])[0]
                            for k in range(64)
                        ]
                        p += 128
            elif marker == 0xC0:  # SOF0 baseline
                prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
                if prec != 8 or nc not in (1, 3):
                    return None
                for c in range(nc):
                    cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                    comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                            0xCD, 0xCE, 0xCF):
                return None  # non-baseline process
            elif marker == 0xC4:  # DHT
                p = 0
                while p + 17 <= len(seg):
                    tc, th = seg[p] >> 4, seg[p] & 0xF
                    counts = list(seg[p + 1 : p + 17])
                    n = sum(counts)
                    syms = seg[p + 17 : p + 17 + n]
                    (huff_dc if tc == 0 else huff_ac)[th] = _build_huffman(counts, syms)
                    p += 17 + n
            elif marker == 0xDD:  # DRI
                restart = struct.unpack(">H", seg[:2])[0]
            elif marker == 0xDA:  # SOS
                ns = seg[0]
                if not comps or (ns != len(comps) and not (ns == 1 and len(comps) == 1)):
                    return None  # multi-scan (progressive-style) unsupported
                for c in range(ns):
                    cid, tt = seg[1 + 2 * c : 3 + 2 * c]
                    for comp in comps:
                        if comp["id"] == cid:
                            comp["dc"], comp["ac"] = tt >> 4, tt & 0xF
                scan_start = i + 2 + ln
                break
            i += 2 + ln
        if scan_start < 0 or not w or not h:
            return None

        # de-stuff the entropy-coded data into restart segments
        segments: list[bytearray] = [bytearray()]
        p = scan_start
        while p < len(data):
            b = data[p]
            if b == 0xFF:
                nxt = data[p + 1] if p + 1 < len(data) else 0xD9
                if nxt == 0x00:
                    segments[-1].append(0xFF)
                    p += 2
                elif 0xD0 <= nxt <= 0xD7:
                    segments.append(bytearray())
                    p += 2
                else:
                    break
            else:
                segments[-1].append(b)
                p += 1

        hmax = max(c["h"] for c in comps)
        vmax = max(c["v"] for c in comps)
        if hmax < 1 or vmax < 1 or any(c["h"] < 1 or c["v"] < 1 for c in comps):
            return None
        if w * h > 50_000_000:  # 50 MP sanity cap: garbage headers must not
            return None  # trigger multi-GB plane allocations in the executor
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        planes = []
        for c in comps:
            c["pw"] = mcux * 8 * c["h"]
            planes.append(bytearray(c["pw"] * mcuy * 8 * c["v"]))
        preds = [0] * len(comps)

        seg_i = 0
        reader = _BitReader(bytes(segments[0]))
        for m in range(mcux * mcuy):
            if restart and m and m % restart == 0:
                seg_i += 1  # RST: byte-align, reset DC predictors
                if seg_i >= len(segments):
                    return None
                reader = _BitReader(bytes(segments[seg_i]))
                preds = [0] * len(comps)
            my, mx = divmod(m, mcux)
            for ci, c in enumerate(comps):
                q = qt.get(c["tq"])
                dct = huff_dc.get(c.get("dc", 0))
                act = huff_ac.get(c.get("ac", 0))
                if q is None or dct is None or act is None:
                    return None
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        t = reader.huff(dct)
                        if t is None or t > 15:
                            return None
                        diff = _extend(reader.bits(t), t)
                        preds[ci] += diff
                        coeffs = [0.0] * 64
                        coeffs[0] = preds[ci] * q[0]
                        k = 1
                        while k < 64:
                            rs = reader.huff(act)
                            if rs is None:
                                return None
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                return None
                            coeffs[ZIGZAG[k]] = _extend(reader.bits(s), s) * q[k]
                            k += 1
                        block = _idct8x8(coeffs)
                        pw = c["pw"]
                        ox = (mx * c["h"] + bx) * 8
                        oy = (my * c["v"] + by) * 8
                        plane = planes[ci]
                        for yy in range(8):
                            row = (oy + yy) * pw + ox
                            for xx in range(8):
                                plane[row + xx] = _clamp(block[yy * 8 + xx] + 128)

        if len(comps) == 1:
            pw = comps[0]["pw"]
            out = bytearray(w * h)
            for y in range(h):
                out[y * w : (y + 1) * w] = planes[0][y * pw : y * pw + w]
            return w, h, 1, bytes(out)

        out = bytearray(w * h * 3)
        pws = [c["pw"] for c in comps]
        for y in range(h):
            for x in range(w):
                yy = planes[0][(y * comps[0]["v"] // vmax) * pws[0] + (x * comps[0]["h"] // hmax)]
                cb = planes[1][(y * comps[1]["v"] // vmax) * pws[1] + (x * comps[1]["h"] // hmax)]
                cr = planes[2][(y * comps[2]["v"] // vmax) * pws[2] + (x * comps[2]["h"] // hmax)]
                o = (y * w + x) * 3
                out[o] = _clamp(yy + 1.402 * (cr - 128))
                out[o + 1] = _clamp(yy - 0.344136 * (cb - 128) - 0.714136 * (cr - 128))
                out[o + 2] = _clamp(yy + 1.772 * (cb - 128))
        return w, h, 3, bytes(out)
    except (IndexError, struct.error, ValueError):
        return None


# ---------------------------------------------------------------------------
# minimal encoder (tests the decoder without binary fixtures)
# ---------------------------------------------------------------------------

# spec-legal fixed tables: 12 DC categories at 4 bits; the 178 AC symbols
# baseline actually uses (EOB, ZRL, run 0-15 × size 1-11) at 9 bits —
# canonical codes 0..177 (DHT counts are single bytes, so ≤255 per length;
# the all-ones 9-bit code stays unused)
_DC_COUNTS = [0, 0, 0, 12] + [0] * 12
_DC_SYMS = bytes(range(12))
_AC_SYMS = bytes([0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 12)])
_AC_COUNTS = [0] * 8 + [len(_AC_SYMS)] + [0] * 7
_ENC_DC = {sym: (4, code) for (_l, code), sym in _build_huffman(_DC_COUNTS, _DC_SYMS).items()}
_ENC_AC = {sym: (9, code) for (_l, code), sym in _build_huffman(_AC_COUNTS, _AC_SYMS).items()}


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        for k in range(nbits - 1, -1, -1):
            self.buf = (self.buf << 1) | ((value >> k) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.buf)
                if self.buf == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.buf = 0
                self.n = 0

    def flush(self) -> bytes:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s
        return bytes(self.out)


def _category(v: int) -> int:
    return abs(v).bit_length()


def encode_jpeg(w: int, h: int, channels: int, pixels: bytes, quant: int = 1) -> bytes:
    """(w, h, 1|3, 8-bit pixels) → baseline JFIF bytes (4:4:4, flat quant
    table of ``quant``; quant=1 makes the round trip near-lossless — DCT
    rounding only — which is what the decoder property tests pin)."""
    if channels not in (1, 3) or len(pixels) != w * h * channels:
        raise ValueError("bad pixel buffer")
    nc = channels
    # component planes, level-shifted; RGB → YCbCr first
    planes: list[list[float]] = [[0.0] * (w * h) for _ in range(nc)]
    for p in range(w * h):
        if nc == 1:
            planes[0][p] = pixels[p] - 128.0
        else:
            r, g, b = pixels[3 * p], pixels[3 * p + 1], pixels[3 * p + 2]
            planes[0][p] = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
            planes[1][p] = -0.168736 * r - 0.331264 * g + 0.5 * b
            planes[2][p] = 0.5 * r - 0.418688 * g - 0.081312 * b

    out = bytearray(b"\xff\xd8")  # SOI
    qtab = [quant] * 64
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(qtab)  # DQT
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for c in range(nc):
        sof += bytes([c + 1, 0x11, 0])  # 1×1 sampling, quant table 0
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for tc, counts, syms in ((0, _DC_COUNTS, _DC_SYMS), (1, _AC_COUNTS, _AC_SYMS)):
        body = bytes([tc << 4]) + bytes(counts) + syms
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    sos = bytes([nc]) + b"".join(bytes([c + 1, 0x00]) for c in range(nc)) + b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    bw = _BitWriter()
    preds = [0] * nc
    bx_n, by_n = -(-w // 8), -(-h // 8)
    for by in range(by_n):
        for bx in range(bx_n):
            for ci in range(nc):
                block = [0.0] * 64
                for yy in range(8):
                    sy = min(by * 8 + yy, h - 1)  # edge replication
                    for xx in range(8):
                        sx = min(bx * 8 + xx, w - 1)
                        block[yy * 8 + xx] = planes[ci][sy * w + sx]
                F = _fdct8x8(block)
                qz = [int(round(F[ZIGZAG[k]] / qtab[k])) for k in range(64)]
                diff = qz[0] - preds[ci]
                preds[ci] = qz[0]
                s = _category(diff)
                ln, code = _ENC_DC[s]
                bw.write(code, ln)
                if s:
                    bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
                run = 0
                last = max((k for k in range(1, 64) if qz[k]), default=0)
                for k in range(1, last + 1):
                    if qz[k] == 0:
                        run += 1
                        continue
                    while run > 15:
                        ln, code = _ENC_AC[0xF0]  # ZRL
                        bw.write(code, ln)
                        run -= 16
                    s = _category(qz[k])
                    ln, code = _ENC_AC[(run << 4) | s]
                    bw.write(code, ln)
                    v = qz[k]
                    bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                    run = 0
                if last < 63:
                    ln, code = _ENC_AC[0x00]  # EOB
                    bw.write(code, ln)
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)
