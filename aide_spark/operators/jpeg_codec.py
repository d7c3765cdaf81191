"""From-scratch JPEG codec (ITU T.81 / JFIF) — baseline AND progressive,
stdlib only.

Closes the r3 VERDICT gap #2 and its round-4 extension: JPEG is the single
most common image format in a real 100 TB corpus (and a large share of web
JPEGs are progressive). Implemented here:

* marker parse in document order (DQT / DHT may be redefined between scans),
* SOF0/SOF1 sequential and SOF2 progressive frames through ONE unified scan
  decoder — a baseline scan is the degenerate progressive scan
  (Ss=0, Se=63, Ah=Al=0, interleaved),
* progressive spectral selection (DC-only and per-component AC scans with
  EOBRUN run-length coding) and successive approximation (DC/AC first +
  refinement scans, correction-bit algorithm),
* canonical Huffman entropy decode with byte de-stuffing and restart
  intervals (DC predictors and EOBRUN reset per RST),
* dequantize + inverse zigzag + 8×8 float IDCT at render time, chroma
  upsampling for 4:2:0 / 4:2:2 / 4:4:4, YCbCr→RGB,
* a minimal encoder (4:4:4, flat quant table, fixed spec-legal Huffman
  tables) that can emit baseline, spectral-progressive, and successive-
  approximation files — its purpose is property-testing the decoder
  round-trip without binary fixtures; the strongest invariant tested is
  progressive-decode == baseline-decode of the same pixels (identical
  coefficients through a different scan script).

Out of scope, returns ``None`` (quarantine convention shared with
image_codec/audio_codec): arithmetic coding, 12-bit precision, CMYK
(4-component), hierarchical. The reference consumes decoded images through
the same opaque-binary column contract (SURVEY.md §2 multimodal row); no
reference code models this codec.
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
    for u in range(8):
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


# ITU T.81 Annex K "typical" Huffman tables. MJPEG-in-AVI frames routinely
# omit DHT segments entirely (the OpenDML AVI spec says decoders should
# assume these); install them lazily when a scan references a table no DHT
# defined.
_K_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], bytes(range(12)))
_K_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], bytes(range(12)))
_K_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    bytes([
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ]),
)
_K_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    bytes([
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ]),
)


def _default_huff(kind: str, tid: int) -> dict[tuple[int, int], int]:
    if kind == "dc":
        counts, syms = _K_DC_CHROMA if tid == 1 else _K_DC_LUMA
    else:
        counts, syms = _K_AC_CHROMA if tid == 1 else _K_AC_LUMA
    return _build_huffman(counts, syms)


def _extend(v: int, s: int) -> int:
    """T.81 F.12: s-bit magnitude → signed value."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def _clamp(x: float) -> int:
    v = int(round(x))
    return 0 if v < 0 else (255 if v > 255 else v)


def _destuff(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """Entropy-coded bytes from ``pos`` → (restart segments, next-marker
    offset). 0xFF00 unstuffs to 0xFF; RSTn starts a new segment."""
    segments: list[bytearray] = [bytearray()]
    p = pos
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
    return [bytes(s) for s in segments], p


def _scan_units(scan_comps, comps, mcux, mcuy, w, h, hmax, vmax):
    """Decode order: interleaved scans yield one MCU's blocks per unit;
    non-interleaved (single-component) scans yield one block per unit,
    raster over the COMPONENT's own (non-MCU-padded) block grid."""
    if len(scan_comps) > 1:
        for m in range(mcux * mcuy):
            my, mx = divmod(m, mcux)
            unit = []
            for ci in scan_comps:
                c = comps[ci]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        unit.append((ci, my * c["v"] + by, mx * c["h"] + bx))
            yield unit
    else:
        ci = scan_comps[0]
        c = comps[ci]
        cw = -(-(w * c["h"]) // hmax)
        ch = -(-(h * c["v"]) // vmax)
        for by in range(-(-ch // 8)):
            for bx in range(-(-cw // 8)):
                yield [(ci, by, bx)]


def _refine_nonzero(reader: _BitReader, coef: list[int], k: int, p1: int) -> None:
    """AC refinement correction bit for an already-nonzero coefficient:
    bit 1 grows the magnitude by p1 (if that bit isn't already present)."""
    if reader.bit() and (abs(coef[k]) & p1) == 0:
        coef[k] += p1 if coef[k] > 0 else -p1


def _decode_scan(
    segments, comps, scan_comps, ss, se, ah, al, restart, units, huff_dc, huff_ac
) -> bool:
    """One entropy-coded scan into the components' zigzag-domain coefficient
    store. Returns False on malformed data."""
    seg_i = 0
    reader = _BitReader(segments[0])
    preds = {ci: 0 for ci in scan_comps}
    eobrun = 0
    for u_i, unit in enumerate(units):
        if restart and u_i and u_i % restart == 0:
            seg_i += 1
            if seg_i >= len(segments):
                return False
            reader = _BitReader(segments[seg_i])
            preds = {ci: 0 for ci in scan_comps}
            eobrun = 0
        for ci, by, bx in unit:
            c = comps[ci]
            try:
                coef = c["coef"][by][bx]
            except IndexError:
                return False
            if ss == 0:  # DC band
                if ah == 0:
                    dct = huff_dc.get(c.get("dc", 0))
                    if dct is None:
                        return False
                    t = reader.huff(dct)
                    if t is None or t > 15:
                        return False
                    preds[ci] += _extend(reader.bits(t), t)
                    coef[0] = preds[ci] << al
                else:  # DC refinement: one bit per block
                    if reader.bit():
                        coef[0] |= 1 << al
            if se >= 1:  # AC band
                act = huff_ac.get(c.get("ac", 0))
                if act is None:
                    return False
                k = max(ss, 1)
                if ah == 0:  # first AC scan (or baseline AC)
                    if eobrun > 0:
                        eobrun -= 1
                        continue
                    while k <= se:
                        rs = reader.huff(act)
                        if rs is None:
                            return False
                        r, s2 = rs >> 4, rs & 0xF
                        if s2 == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += reader.bits(r)
                            break  # EOBn ends this block too
                        k += r
                        if k > se:
                            return False
                        coef[k] = _extend(reader.bits(s2), s2) << al
                        k += 1
                else:  # AC refinement scan
                    p1 = 1 << al
                    if eobrun == 0:
                        while k <= se:
                            rs = reader.huff(act)
                            if rs is None:
                                return False
                            r, s2 = rs >> 4, rs & 0xF
                            newval = 0
                            if s2 == 0:
                                if r != 15:
                                    eobrun = 1 << r
                                    if r:
                                        eobrun += reader.bits(r)
                                    break
                                # r == 15: pass over 16 zero-history coeffs
                            elif s2 == 1:
                                newval = p1 if reader.bit() else -p1
                            else:
                                return False  # refinement sizes are 0 or 1
                            while k <= se:
                                if coef[k] != 0:
                                    _refine_nonzero(reader, coef, k, p1)
                                else:
                                    if r == 0:
                                        break
                                    r -= 1
                                k += 1
                            if k > se and newval:
                                return False
                            if newval:
                                coef[k] = newval
                            k += 1
                    if eobrun > 0:
                        # this block (and eobrun-1 more) end here: refine the
                        # remaining established coefficients in the band
                        while k <= se:
                            if coef[k] != 0:
                                _refine_nonzero(reader, coef, k, p1)
                            k += 1
                        eobrun -= 1
    return True


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes] | None:
    """JPEG bytes (baseline SOF0/SOF1 or progressive SOF2) → (width, height,
    channels, interleaved 8-bit pixels); grayscale → 1 channel, YCbCr → RGB.
    None if malformed or an unsupported process."""
    if not isinstance(data, (bytes, bytearray)) or data[:2] != b"\xff\xd8":
        return None
    data = bytes(data)
    qt: dict[int, list[int]] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[dict] = []
    w = h = 0
    hmax = vmax = 1
    mcux = mcuy = 0
    restart = 0
    seen_sos = False
    i = 2
    try:
        while i + 2 <= len(data):
            if data[i] != 0xFF:
                return None
            marker = data[i + 1]
            if marker == 0xD9:  # EOI
                break
            if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / stray RST
                i += 2
                continue
            if i + 4 > len(data):
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
            elif marker in (0xC0, 0xC1, 0xC2):  # baseline / ext seq / progressive
                if comps:
                    return None  # multi-frame unsupported
                prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
                if prec != 8 or nc not in (1, 3):
                    return None
                for c in range(nc):
                    cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                    comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
                if any(c["h"] < 1 or c["v"] < 1 for c in comps):
                    return None
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                if w * h > 50_000_000:  # garbage headers must not trigger
                    return None  # multi-GB allocations in the executor
                mcux = -(-w // (8 * hmax))
                mcuy = -(-h // (8 * vmax))
                for c in comps:
                    rows, cols = mcuy * c["v"], mcux * c["h"]
                    c["coef"] = [
                        [[0] * 64 for _ in range(cols)] for _ in range(rows)
                    ]
            elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE,
                            0xCF):
                return None  # lossless / arithmetic / hierarchical
            elif marker == 0xC4:  # DHT (may be redefined between scans)
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
                if not comps:
                    return None
                ns = seg[0]
                scan_comps: list[int] = []
                for c_i in range(ns):
                    cid, tt = seg[1 + 2 * c_i : 3 + 2 * c_i]
                    for idx, comp in enumerate(comps):
                        if comp["id"] == cid:
                            comp["dc"], comp["ac"] = tt >> 4, tt & 0xF
                            scan_comps.append(idx)
                if len(scan_comps) != ns or not scan_comps:
                    return None
                ss, se, a = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
                ah, al = a >> 4, a & 0xF
                if se > 63 or ss > se:
                    return None
                for idx in scan_comps:  # table-less MJPEG: Annex K defaults
                    if ss == 0 and comps[idx]["dc"] not in huff_dc:
                        huff_dc[comps[idx]["dc"]] = _default_huff("dc", comps[idx]["dc"])
                    if se > 0 and comps[idx]["ac"] not in huff_ac:
                        huff_ac[comps[idx]["ac"]] = _default_huff("ac", comps[idx]["ac"])
                segments, end = _destuff(data, i + 2 + ln)
                units = _scan_units(scan_comps, comps, mcux, mcuy, w, h, hmax, vmax)
                if not _decode_scan(
                    segments, comps, scan_comps, ss, se, ah, al, restart, units,
                    huff_dc, huff_ac,
                ):
                    return None
                seen_sos = True
                i = end
                continue
            i += 2 + ln
        if not seen_sos or not w or not comps:
            return None
        return _render(comps, w, h, hmax, vmax, qt, mcux, mcuy)
    except (IndexError, struct.error, ValueError):
        return None


def _render(comps, w, h, hmax, vmax, qt, mcux, mcuy):
    """Coefficient store → pixels: dequant + inverse zigzag + IDCT per
    block, then crop/upsample/color-convert."""
    planes = []
    for c in comps:
        q = qt.get(c["tq"])
        if q is None:
            return None
        pw = mcux * 8 * c["h"]
        c["pw"] = pw
        plane = bytearray(pw * mcuy * 8 * c["v"])
        for by in range(mcuy * c["v"]):
            for bx in range(mcux * c["h"]):
                zz = c["coef"][by][bx]
                coeffs = [0.0] * 64
                for k in range(64):
                    if zz[k]:
                        coeffs[ZIGZAG[k]] = zz[k] * q[k]
                block = _idct8x8(coeffs)
                ox, oy = bx * 8, by * 8
                for yy in range(8):
                    row = (oy + yy) * pw + ox
                    for xx in range(8):
                        plane[row + xx] = _clamp(block[yy * 8 + xx] + 128)
        planes.append(plane)

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


def _emit_rs(bw: _BitWriter, rs: int) -> None:
    ln, code = _ENC_AC[rs]
    bw.write(code, ln)


def _point(v: int, al: int) -> int:
    """AC point transform: arithmetic shift of the MAGNITUDE (truncation
    toward zero), sign preserved — T.81 G.1.2.2."""
    return (abs(v) >> al) * (1 if v >= 0 else -1)


def _encode_dc_scan(bw: _BitWriter, blocks_per_comp, al: int) -> None:
    """Interleaved first DC scan: category-coded diffs of dc >> al. The DC
    point transform is an ARITHMETIC shift (two's complement — G.1.2.1),
    unlike AC's magnitude shift: the decoder reconstructs with (pred << al)
    and ORs refinement bits in, which is exact under arithmetic shift."""
    preds = [0] * len(blocks_per_comp)
    n_blocks = len(blocks_per_comp[0])
    for b in range(n_blocks):
        for ci, blocks in enumerate(blocks_per_comp):
            dc = blocks[b][0] >> al  # Python >> on ints IS arithmetic
            diff = dc - preds[ci]
            preds[ci] = dc
            s = _category(diff)
            ln, code = _ENC_DC[s]
            bw.write(code, ln)
            if s:
                bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)


def _encode_dc_refine(bw: _BitWriter, blocks_per_comp, al: int) -> None:
    n_blocks = len(blocks_per_comp[0])
    for b in range(n_blocks):
        for blocks in blocks_per_comp:
            # two's-complement bit al of the DC value (decoder ORs it in)
            bw.write((blocks[b][0] >> al) & 1, 1)


def _encode_ac_first(bw: _BitWriter, blocks, al: int) -> None:
    """Per-component first AC scan (Ss=1, Se=63): baseline run-length with
    per-block EOB (EOBRUN = 1 — r=0 carries no extra bits)."""
    for zz in blocks:
        vals = [_point(zz[k], al) for k in range(64)]
        last = max((k for k in range(1, 64) if vals[k]), default=0)
        run = 0
        for k in range(1, last + 1):
            v = vals[k]
            if v == 0:
                run += 1
                continue
            while run > 15:
                _emit_rs(bw, 0xF0)
                run -= 16
            s = _category(v)
            _emit_rs(bw, (run << 4) | s)
            bw.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if last < 63:
            _emit_rs(bw, 0x00)


def _encode_ac_refine(bw: _BitWriter, blocks, al: int) -> None:
    """Per-component AC refinement scan (Ah=al+1, Al=al): newly-nonzero
    coefficients as (run, 1) symbols + sign bit; correction bits for
    already-established coefficients interleave in exactly the positions
    the decoder's walk consumes them (a faithful mirror of the jdphuff-
    style advance: a ZRL covers 16 zero-history positions and only the
    established bits BEFORE its 16th zero; trailing corrections ride the
    per-block EOB)."""
    p_hi = al + 1
    for zz in blocks:
        t = [abs(zz[k]) >> al for k in range(64)]
        hist = [abs(zz[k]) >> p_hi for k in range(64)]  # nonzero before scan
        newpos = [k for k in range(1, 64) if hist[k] == 0 and t[k] == 1]
        k = 1
        for np_ in newpos:
            r = sum(1 for j in range(k, np_) if hist[j] == 0)
            while r > 15:
                _emit_rs(bw, 0xF0)
                zeros = 0
                while k < np_:  # consume 16 zero-history positions
                    if hist[k]:
                        bw.write(t[k] & 1, 1)
                    else:
                        zeros += 1
                        if zeros == 16:
                            k += 1
                            break
                    k += 1
                r -= 16
            _emit_rs(bw, (r << 4) | 1)
            bw.write(1 if zz[np_] > 0 else 0, 1)
            for j in range(k, np_):
                if hist[j]:
                    bw.write(t[j] & 1, 1)
            k = np_ + 1
        if k <= 63:  # band tail: EOB(run=1) + remaining correction bits
            _emit_rs(bw, 0x00)
            for j in range(k, 64):
                if hist[j]:
                    bw.write(t[j] & 1, 1)


def encode_jpeg(
    w: int,
    h: int,
    channels: int,
    pixels: bytes,
    quant: int = 1,
    progressive: bool = False,
    refine: bool = False,
) -> bytes:
    """(w, h, 1|3, 8-bit pixels) → JFIF bytes (4:4:4, flat quant table of
    ``quant``). ``progressive=True`` emits SOF2 with a spectral-selection
    scan script (interleaved DC scan + one AC scan per component);
    ``refine=True`` additionally splits each band into a first scan at
    Al=1 and a refinement scan (successive approximation). quant=1 keeps
    the round trip near-lossless (DCT rounding only), which is what the
    decoder property tests pin."""
    if channels not in (1, 3) or len(pixels) != w * h * channels:
        raise ValueError("bad pixel buffer")
    if refine and not progressive:
        raise ValueError("refine requires progressive")
    nc = channels
    planes: list[list[float]] = [[0.0] * (w * h) for _ in range(nc)]
    for p in range(w * h):
        if nc == 1:
            planes[0][p] = pixels[p] - 128.0
        else:
            r, g, b = pixels[3 * p], pixels[3 * p + 1], pixels[3 * p + 2]
            planes[0][p] = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
            planes[1][p] = -0.168736 * r - 0.331264 * g + 0.5 * b
            planes[2][p] = 0.5 * r - 0.418688 * g - 0.081312 * b

    qtab = [quant] * 64
    bx_n, by_n = -(-w // 8), -(-h // 8)
    blocks_per_comp: list[list[list[int]]] = []
    for ci in range(nc):
        blocks = []
        for by in range(by_n):
            for bx in range(bx_n):
                block = [0.0] * 64
                for yy in range(8):
                    sy = min(by * 8 + yy, h - 1)  # edge replication
                    for xx in range(8):
                        sx = min(bx * 8 + xx, w - 1)
                        block[yy * 8 + xx] = planes[ci][sy * w + sx]
                F = _fdct8x8(block)
                blocks.append([int(round(F[ZIGZAG[k]] / qtab[k])) for k in range(64)])
        blocks_per_comp.append(blocks)

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(qtab)  # DQT
    sof_marker = b"\xff\xc2" if progressive else b"\xff\xc0"
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for c in range(nc):
        sof += bytes([c + 1, 0x11, 0])  # 1×1 sampling, quant table 0
    out += sof_marker + struct.pack(">H", 2 + len(sof)) + sof
    for tc, counts, syms in ((0, _DC_COUNTS, _DC_SYMS), (1, _AC_COUNTS, _AC_SYMS)):
        body = bytes([tc << 4]) + bytes(counts) + syms
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    def sos(comp_ids: list[int], ss: int, se: int, ah: int, al: int, bits: bytes):
        head = bytes([len(comp_ids)]) + b"".join(
            bytes([cid + 1, 0x00]) for cid in comp_ids
        ) + bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(head)) + head + bits

    if not progressive:
        bw = _BitWriter()
        preds = [0] * nc
        for b in range(bx_n * by_n):
            for ci in range(nc):
                zz = blocks_per_comp[ci][b]
                diff = zz[0] - preds[ci]
                preds[ci] = zz[0]
                s = _category(diff)
                ln, code = _ENC_DC[s]
                bw.write(code, ln)
                if s:
                    bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
                last = max((k for k in range(1, 64) if zz[k]), default=0)
                run = 0
                for k in range(1, last + 1):
                    if zz[k] == 0:
                        run += 1
                        continue
                    while run > 15:
                        _emit_rs(bw, 0xF0)
                        run -= 16
                    s = _category(zz[k])
                    _emit_rs(bw, (run << 4) | s)
                    v = zz[k]
                    bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                    run = 0
                if last < 63:
                    _emit_rs(bw, 0x00)
        out += sos(list(range(nc)), 0, 63, 0, 0, bw.flush())
    else:
        first_al = 1 if refine else 0
        bw = _BitWriter()
        _encode_dc_scan(bw, blocks_per_comp, first_al)
        out += sos(list(range(nc)), 0, 0, 0, first_al, bw.flush())
        if refine:
            bw = _BitWriter()
            _encode_dc_refine(bw, blocks_per_comp, 0)
            out += sos(list(range(nc)), 0, 0, 1, 0, bw.flush())
        for ci in range(nc):
            bw = _BitWriter()
            _encode_ac_first(bw, blocks_per_comp[ci], first_al)
            out += sos([ci], 1, 63, 0, first_al, bw.flush())
        if refine:
            for ci in range(nc):
                bw = _BitWriter()
                _encode_ac_refine(bw, blocks_per_comp[ci], 0)
                out += sos([ci], 1, 63, 1, 0, bw.flush())
    out += b"\xff\xd9"  # EOI
    return bytes(out)
