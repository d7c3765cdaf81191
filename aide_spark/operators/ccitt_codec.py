"""From-scratch CCITT Group 4 (ITU-T T.6 MMR) fax codec — the compression
real scanners put behind ``/CCITTFaxDecode`` in scanned-statement PDFs.

Group 4 codes each scan line against the previous (reference) line using
three modes — pass, horizontal, vertical(±3) — with horizontal run lengths
in the ITU-T T.4 modified-Huffman white/black tables (terminating 0–63,
make-up 64–1728, shared extended make-up 1792–2560). Pure table/bit math,
stdlib only, same envelope argument as G.711/ADPCM in
:mod:`audio_codec`.

Convention: bitmaps are row-packed 1-bit, MSB-first, **1 = black ink**
(the :mod:`ocr` renderer's layout). :func:`encode_g4` exists to
property-test the decoder and to build fax-compressed PDF fixtures
(``/BlackIs1 true`` matches this polarity); prefix-freeness of the
transcribed tables is pinned by tests/test_codec_properties.py.

Reference behavior parity: pypdf (the reference's PDF engine) does NOT
decode CCITTFaxDecode image data — this goes beyond it, completing the
scanned-branch codec family (image_codec/jpeg_codec/ocr).
"""

from __future__ import annotations

# --- ITU-T T.4 modified Huffman run-length tables ("(bits, code)" pairs) ---

_WHITE_TERM = {
    0: (8, 0b00110101), 1: (6, 0b000111), 2: (4, 0b0111), 3: (4, 0b1000),
    4: (4, 0b1011), 5: (4, 0b1100), 6: (4, 0b1110), 7: (4, 0b1111),
    8: (5, 0b10011), 9: (5, 0b10100), 10: (5, 0b00111), 11: (5, 0b01000),
    12: (6, 0b001000), 13: (6, 0b000011), 14: (6, 0b110100),
    15: (6, 0b110101), 16: (6, 0b101010), 17: (6, 0b101011),
    18: (7, 0b0100111), 19: (7, 0b0001100), 20: (7, 0b0001000),
    21: (7, 0b0010111), 22: (7, 0b0000011), 23: (7, 0b0000100),
    24: (7, 0b0101000), 25: (7, 0b0101011), 26: (7, 0b0010011),
    27: (7, 0b0100100), 28: (7, 0b0011000), 29: (8, 0b00000010),
    30: (8, 0b00000011), 31: (8, 0b00011010), 32: (8, 0b00011011),
    33: (8, 0b00010010), 34: (8, 0b00010011), 35: (8, 0b00010100),
    36: (8, 0b00010101), 37: (8, 0b00010110), 38: (8, 0b00010111),
    39: (8, 0b00101000), 40: (8, 0b00101001), 41: (8, 0b00101010),
    42: (8, 0b00101011), 43: (8, 0b00101100), 44: (8, 0b00101101),
    45: (8, 0b00000100), 46: (8, 0b00000101), 47: (8, 0b00001010),
    48: (8, 0b00001011), 49: (8, 0b01010010), 50: (8, 0b01010011),
    51: (8, 0b01010100), 52: (8, 0b01010101), 53: (8, 0b00100100),
    54: (8, 0b00100101), 55: (8, 0b01011000), 56: (8, 0b01011001),
    57: (8, 0b01011010), 58: (8, 0b01011011), 59: (8, 0b01001010),
    60: (8, 0b01001011), 61: (8, 0b00110010), 62: (8, 0b00110011),
    63: (8, 0b00110100),
}
_WHITE_MAKEUP = {
    64: (5, 0b11011), 128: (5, 0b10010), 192: (6, 0b010111),
    256: (7, 0b0110111), 320: (8, 0b00110110), 384: (8, 0b00110111),
    448: (8, 0b01100100), 512: (8, 0b01100101), 576: (8, 0b01101000),
    640: (8, 0b01100111), 704: (9, 0b011001100), 768: (9, 0b011001101),
    832: (9, 0b011010010), 896: (9, 0b011010011), 960: (9, 0b011010100),
    1024: (9, 0b011010101), 1088: (9, 0b011010110), 1152: (9, 0b011010111),
    1216: (9, 0b011011000), 1280: (9, 0b011011001), 1344: (9, 0b011011010),
    1408: (9, 0b011011011), 1472: (9, 0b010011000), 1536: (9, 0b010011001),
    1600: (9, 0b010011010), 1664: (6, 0b011000), 1728: (9, 0b010011011),
}
_BLACK_TERM = {
    0: (10, 0b0000110111), 1: (3, 0b010), 2: (2, 0b11), 3: (2, 0b10),
    4: (3, 0b011), 5: (4, 0b0011), 6: (4, 0b0010), 7: (5, 0b00011),
    8: (6, 0b000101), 9: (6, 0b000100), 10: (7, 0b0000100),
    11: (7, 0b0000101), 12: (7, 0b0000111), 13: (8, 0b00000100),
    14: (8, 0b00000111), 15: (9, 0b000011000), 16: (10, 0b0000010111),
    17: (10, 0b0000011000), 18: (10, 0b0000001000),
    19: (11, 0b00001100111), 20: (11, 0b00001101000),
    21: (11, 0b00001101100), 22: (11, 0b00000110111),
    23: (11, 0b00000101000), 24: (11, 0b00000010111),
    25: (11, 0b00000011000), 26: (12, 0b000011001010),
    27: (12, 0b000011001011), 28: (12, 0b000011001100),
    29: (12, 0b000011001101), 30: (12, 0b000001101000),
    31: (12, 0b000001101001), 32: (12, 0b000001101010),
    33: (12, 0b000001101011), 34: (12, 0b000011010010),
    35: (12, 0b000011010011), 36: (12, 0b000011010100),
    37: (12, 0b000011010101), 38: (12, 0b000011010110),
    39: (12, 0b000011010111), 40: (12, 0b000001101100),
    41: (12, 0b000001101101), 42: (12, 0b000011011010),
    43: (12, 0b000011011011), 44: (12, 0b000001010100),
    45: (12, 0b000001010101), 46: (12, 0b000001010110),
    47: (12, 0b000001010111), 48: (12, 0b000001100100),
    49: (12, 0b000001100101), 50: (12, 0b000001010010),
    51: (12, 0b000001010011), 52: (12, 0b000000100100),
    53: (12, 0b000000110111), 54: (12, 0b000000111000),
    55: (12, 0b000000100111), 56: (12, 0b000000101000),
    57: (12, 0b000001011000), 58: (12, 0b000001011001),
    59: (12, 0b000000101011), 60: (12, 0b000000101100),
    61: (12, 0b000001011010), 62: (12, 0b000001100110),
    63: (12, 0b000001100111),
}
_BLACK_MAKEUP = {
    64: (10, 0b0000001111), 128: (12, 0b000011001000),
    192: (12, 0b000011001001), 256: (12, 0b000001011011),
    320: (12, 0b000000110011), 384: (12, 0b000000110100),
    448: (12, 0b000000110101), 512: (13, 0b0000001101100),
    576: (13, 0b0000001101101), 640: (13, 0b0000001001010),
    704: (13, 0b0000001001011), 768: (13, 0b0000001001100),
    832: (13, 0b0000001001101), 896: (13, 0b0000001110010),
    960: (13, 0b0000001110011), 1024: (13, 0b0000001110100),
    1088: (13, 0b0000001110101), 1152: (13, 0b0000001110110),
    1216: (13, 0b0000001110111), 1280: (13, 0b0000001010010),
    1344: (13, 0b0000001010011), 1408: (13, 0b0000001010100),
    1472: (13, 0b0000001010101), 1536: (13, 0b0000001011010),
    1600: (13, 0b0000001011011), 1664: (13, 0b0000001100100),
    1728: (13, 0b0000001100101),
}
# extended make-ups (T.4 §2 "EXTENDED"): shared by both colors
_EXT_MAKEUP = {
    1792: (11, 0b00000001000), 1856: (11, 0b00000001100),
    1920: (11, 0b00000001101), 1984: (12, 0b000000010010),
    2048: (12, 0b000000010011), 2112: (12, 0b000000010100),
    2176: (12, 0b000000010101), 2240: (12, 0b000000010110),
    2304: (12, 0b000000010111), 2368: (12, 0b000000011100),
    2432: (12, 0b000000011101), 2496: (12, 0b000000011110),
    2560: (12, 0b000000011111),
}

RUN_TABLES = (
    (dict(_WHITE_TERM), {**_WHITE_MAKEUP, **_EXT_MAKEUP}),  # white
    (dict(_BLACK_TERM), {**_BLACK_MAKEUP, **_EXT_MAKEUP}),  # black
)

# decode maps: (bits, code) → run
_DEC = tuple(
    {(b, c): run for run, (b, c) in {**term, **makeup}.items()}
    for term, makeup in RUN_TABLES
)


class _Writer:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, bits: int, code: int) -> None:
        self.acc = (self.acc << bits) | code
        self.n += bits
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)

    def done(self) -> bytes:
        if self.n:
            self.buf.append((self.acc << (8 - self.n)) & 0xFF)
        return bytes(self.buf)


class _Reader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def bit(self) -> int | None:
        if self.pos >= len(self.data) * 8:
            return None
        b = (self.data[self.pos >> 3] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b


def _row_transitions(row_bits: int, w: int) -> list[int]:
    """Row as an int (bit w-1-x = pixel x, 1 = black) → ascending positions
    where the color changes, starting from white."""
    out = []
    prev = 0
    for x in range(w):
        px = (row_bits >> (w - 1 - x)) & 1
        if px != prev:
            out.append(x)
            prev = px
    return out


def _put_run(wr: _Writer, run: int, color: int) -> None:
    term, makeup = RUN_TABLES[color]
    while run >= 64:
        step = min(run - run % 64, 2560)
        while step not in makeup:  # align to an existing make-up code
            step -= 64
        wr.put(*makeup[step])
        run -= step
    wr.put(*term[run])


def encode_g4(width: int, height: int, bitmap: bytes) -> bytes:
    """Row-packed 1-bit bitmap (1 = black) → Group 4 (T.6) codes, EOFB
    terminated. Test/fixture encoder for :func:`decode_g4`."""
    stride = (width + 7) // 8
    wr = _Writer()
    ref = [width, width]
    for y in range(height):
        row = int.from_bytes(bitmap[y * stride : (y + 1) * stride], "big") >> (
            stride * 8 - width
        )
        cur = _row_transitions(row, width)
        ct = cur + [width, width]
        a0 = -1
        ci = 0  # index of a1 in ct
        while a0 < width:
            a1 = ct[ci] if ci < len(ct) else width
            # b1: first reference transition > a0 with color opposite the
            # current color (= same parity as ci, both lines start white)
            ri = 0
            while ri < len(ref) and (ref[ri] <= a0 or (ri & 1) != (ci & 1)):
                ri += 1
            b1 = ref[ri] if ri < len(ref) else width
            b2 = ref[ri + 1] if ri + 1 < len(ref) else width
            if b2 < a1:
                wr.put(4, 0b0001)  # pass
                a0 = b2
            elif -3 <= a1 - b1 <= 3:
                wr.put(*_V_CODES[a1 - b1])
                a0 = a1
                ci += 1
            else:
                a2 = ct[ci + 1] if ci + 1 < len(ct) else width
                wr.put(3, 0b001)  # horizontal
                _put_run(wr, a1 - (a0 if a0 > 0 else 0), ci & 1)
                _put_run(wr, a2 - a1, ~ci & 1)
                a0 = a2
                ci += 2
        ref = cur + [width, width]
    wr.put(24, 0b000000000001000000000001)  # EOFB
    return wr.done()


_V_CODES = {
    0: (1, 0b1),
    1: (3, 0b011), 2: (6, 0b000011), 3: (7, 0b0000011),
    -1: (3, 0b010), -2: (6, 0b000010), -3: (7, 0b0000010),
}


def _read_run(rd: _Reader, color: int) -> int | None:
    """One MH-coded run (make-ups accumulate until a terminating code)."""
    total = 0
    while True:
        bits = 0
        code = 0
        while bits < 14:
            b = rd.bit()
            if b is None:
                return None
            code = (code << 1) | b
            bits += 1
            run = _DEC[color].get((bits, code))
            if run is not None:
                total += run
                if run < 64:
                    return total
                break  # make-up: continue with the next code
        else:
            return None


def decode_g4(data: bytes, width: int, height: int | None = None) -> bytes | None:
    """Group 4 codes → row-packed 1-bit bitmap (1 = black), decoding until
    ``height`` rows (or EOFB / data exhaustion when ``None``). ``None`` on
    malformed input."""
    if width <= 0:
        return None
    stride = (width + 7) // 8
    rd = _Reader(data)
    rows: list[bytes] = []
    ref = [width, width]
    while height is None or len(rows) < height:
        cur: list[int] = []
        a0 = -1
        eofb = False
        while a0 < width:
            # mode code: longest is 7 bits (V±3); EOL prefix 0000000 means
            # EOFB on G4
            bits = 0
            code = 0
            mode = None
            while bits < 8:
                b = rd.bit()
                if b is None:
                    return bytes(b"".join(rows)) if height is None and not cur else None
                code = (code << 1) | b
                bits += 1
                if bits == 1 and code == 1:
                    mode = ("v", 0)
                elif bits == 3 and code == 0b011:
                    mode = ("v", 1)
                elif bits == 3 and code == 0b010:
                    mode = ("v", -1)
                elif bits == 3 and code == 0b001:
                    mode = ("h",)
                elif bits == 4 and code == 0b0001:
                    mode = ("p",)
                elif bits == 6 and code == 0b000011:
                    mode = ("v", 2)
                elif bits == 6 and code == 0b000010:
                    mode = ("v", -2)
                elif bits == 7 and code == 0b0000011:
                    mode = ("v", 3)
                elif bits == 7 and code == 0b0000010:
                    mode = ("v", -3)
                elif bits == 8 and code == 0:
                    mode = ("eofb",)
                if mode:
                    break
            if mode is None:
                return None
            if mode[0] == "eofb":
                eofb = True
                break
            ci = len(cur)
            ri = 0
            while ri < len(ref) and (ref[ri] <= a0 or (ri & 1) != (ci & 1)):
                ri += 1
            b1 = ref[ri] if ri < len(ref) else width
            b2 = ref[ri + 1] if ri + 1 < len(ref) else width
            if mode[0] == "p":
                a0 = b2
            elif mode[0] == "v":
                a1 = b1 + mode[1]
                # transitions must be non-decreasing: a garbage stream can
                # step a1 BELOW the last transition (negative run length)
                if not max(0, cur[-1] if cur else 0) <= a1 <= width:
                    return None
                cur.append(a1)
                a0 = a1
            else:  # horizontal: two runs, current color then opposite
                r1 = _read_run(rd, ci & 1)
                r2 = _read_run(rd, (~ci) & 1)
                if r1 is None or r2 is None:
                    return None
                t1 = (a0 if a0 > 0 else 0) + r1
                t2 = t1 + r2
                if t2 > width:
                    return None
                cur.append(t1)
                cur.append(t2)
                a0 = t2
        if eofb and not cur:
            break
        # transitions → packed row (runs alternate starting white)
        row = 0
        color = 0
        prev = 0
        for t in cur + [width]:
            if color:
                row |= ((1 << (t - prev)) - 1) << (width - t)
            color ^= 1
            prev = t
        rows.append((row << (stride * 8 - width)).to_bytes(stride, "big"))
        ref = [t for t in cur if t < width] + [width, width]
        if eofb:
            break
    if height is not None and len(rows) < height:
        return None
    return b"".join(rows)
