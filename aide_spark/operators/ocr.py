"""From-scratch fixed-font page rendering and OCR — makes the *scanned*
branch of the V6 text/scanned/hybrid ladder real end-to-end.

The reference sends scanned statement pages to a cloud OCR service
(`/root/reference/api/lambdas/textract_processor.py` invocation path); this
sandbox has no OCR model, but the statements the reference ingests are
MACHINE-PRINTED form documents (dot-matrix / laser printers, fixed pitch),
and recognizing machine-printed fixed-pitch text is classic template-match
OCR — the technique OCR-A/OCR-B fonts were designed for. This module
implements both directions from scratch, stdlib only:

* :func:`render_page` — rasterize text lines in an inline 5×7 dot-matrix
  font (the HD44780-style public-domain glyph patterns) onto a 1-bit,
  row-packed bitmap: the synthetic "scan".
* :func:`ocr_page` / :func:`ocr_gray` — recognize a bitmap back to text:
  locate the print origin, sample the fixed-pitch cell grid, match each
  5×7 cell against the glyph table by Hamming distance (nearest template,
  reject threshold → ``?``). Tolerates per-cell bit noise up to half the
  minimum pairwise glyph distance of the alphabet in use — pinned by a
  self-calibrating property test (tests/test_ocr.py).

Combined with :func:`pdf_codec.encode_pdf` image embedding and
:func:`pdf_codec.extract_pdf_images`, a scanned statement round-trips:
render → embed as 1-bit image XObject → classify ``scanned`` (V6) →
extract the image → OCR → the SAME parser expressions as the text path —
the ``e2e_scanned_ocr_extract`` query runs this under the text path's
full-strength DuckDB oracle.

At 100 TB: rendering/OCR is per-document Python inside ``mapInPandas``
(Arrow-batched, partition-parallel, zero shuffle) — the same fan-out shape
as the codec family; a 1000-executor cluster OCRs 1000 scans concurrently.
"""

from __future__ import annotations

GLYPH_W, GLYPH_H = 5, 7
X_PITCH, Y_PITCH = 6, 9  # 1 blank col between glyphs, 2 blank rows between lines
MARGIN = 4

# Classic 5×7 dot-matrix glyph patterns (HD44780-style, public domain).
_GLYPHS_ART: dict[str, list[str]] = {
    "0": [".###.", "#...#", "#..##", "#.#.#", "##..#", "#...#", ".###."],
    "1": ["..#..", ".##..", "..#..", "..#..", "..#..", "..#..", ".###."],
    "2": [".###.", "#...#", "....#", "...#.", "..#..", ".#...", "#####"],
    "3": [".###.", "#...#", "....#", "..##.", "....#", "#...#", ".###."],
    "4": ["...#.", "..##.", ".#.#.", "#..#.", "#####", "...#.", "...#."],
    "5": ["#####", "#....", "####.", "....#", "....#", "#...#", ".###."],
    "6": ["..##.", ".#...", "#....", "####.", "#...#", "#...#", ".###."],
    "7": ["#####", "....#", "...#.", "..#..", ".#...", ".#...", ".#..."],
    "8": [".###.", "#...#", "#...#", ".###.", "#...#", "#...#", ".###."],
    "9": [".###.", "#...#", "#...#", ".####", "....#", "...#.", ".##.."],
    "A": [".###.", "#...#", "#...#", "#####", "#...#", "#...#", "#...#"],
    "B": ["####.", "#...#", "#...#", "####.", "#...#", "#...#", "####."],
    "C": [".###.", "#...#", "#....", "#....", "#....", "#...#", ".###."],
    "D": ["###..", "#..#.", "#...#", "#...#", "#...#", "#..#.", "###.."],
    "E": ["#####", "#....", "#....", "####.", "#....", "#....", "#####"],
    "F": ["#####", "#....", "#....", "####.", "#....", "#....", "#...."],
    "G": [".###.", "#...#", "#....", "#.###", "#...#", "#...#", ".####"],
    "H": ["#...#", "#...#", "#...#", "#####", "#...#", "#...#", "#...#"],
    "I": [".###.", "..#..", "..#..", "..#..", "..#..", "..#..", ".###."],
    "J": ["..###", "...#.", "...#.", "...#.", "...#.", "#..#.", ".##.."],
    "K": ["#...#", "#..#.", "#.#..", "##...", "#.#..", "#..#.", "#...#"],
    "L": ["#....", "#....", "#....", "#....", "#....", "#....", "#####"],
    "M": ["#...#", "##.##", "#.#.#", "#.#.#", "#...#", "#...#", "#...#"],
    "N": ["#...#", "##..#", "#.#.#", "#..##", "#...#", "#...#", "#...#"],
    "O": [".###.", "#...#", "#...#", "#...#", "#...#", "#...#", ".###."],
    "P": ["####.", "#...#", "#...#", "####.", "#....", "#....", "#...."],
    "Q": [".###.", "#...#", "#...#", "#...#", "#.#.#", "#..#.", ".##.#"],
    "R": ["####.", "#...#", "#...#", "####.", "#.#..", "#..#.", "#...#"],
    "S": [".####", "#....", "#....", ".###.", "....#", "....#", "####."],
    "T": ["#####", "..#..", "..#..", "..#..", "..#..", "..#..", "..#.."],
    "U": ["#...#", "#...#", "#...#", "#...#", "#...#", "#...#", ".###."],
    "V": ["#...#", "#...#", "#...#", "#...#", "#...#", ".#.#.", "..#.."],
    "W": ["#...#", "#...#", "#...#", "#.#.#", "#.#.#", "##.##", "#...#"],
    "X": ["#...#", "#...#", ".#.#.", "..#..", ".#.#.", "#...#", "#...#"],
    "Y": ["#...#", "#...#", ".#.#.", "..#..", "..#..", "..#..", "..#.."],
    "Z": ["#####", "....#", "...#.", "..#..", ".#...", "#....", "#####"],
    "a": [".....", ".....", ".###.", "....#", ".####", "#...#", ".####"],
    "b": ["#....", "#....", "####.", "#...#", "#...#", "#...#", "####."],
    "c": [".....", ".....", ".###.", "#....", "#....", "#...#", ".###."],
    "d": ["....#", "....#", ".####", "#...#", "#...#", "#...#", ".####"],
    "e": [".....", ".....", ".###.", "#...#", "#####", "#....", ".###."],
    "f": ["..##.", ".#..#", ".#...", "###..", ".#...", ".#...", ".#..."],
    "g": [".....", ".####", "#...#", "#...#", ".####", "....#", ".###."],
    "h": ["#....", "#....", "####.", "#...#", "#...#", "#...#", "#...#"],
    "i": ["..#..", ".....", ".##..", "..#..", "..#..", "..#..", ".###."],
    "j": ["...#.", ".....", "..##.", "...#.", "...#.", "#..#.", ".##.."],
    "k": ["#....", "#....", "#..#.", "#.#..", "##...", "#.#..", "#..#."],
    "l": [".##..", "..#..", "..#..", "..#..", "..#..", "..#..", "..###"],
    "m": [".....", ".....", "##.#.", "#.#.#", "#.#.#", "#.#.#", "#.#.#"],
    "n": [".....", ".....", "####.", "#...#", "#...#", "#...#", "#...#"],
    "o": [".....", ".....", ".###.", "#...#", "#...#", "#...#", ".###."],
    "p": [".....", ".....", "####.", "#...#", "####.", "#....", "#...."],
    "q": [".....", ".....", ".####", "#...#", ".####", "....#", "....#"],
    "r": [".....", ".....", "#.###", "##...", "#....", "#....", "#...."],
    "s": [".....", ".....", ".####", "#....", ".###.", "....#", "####."],
    "t": [".#...", ".#...", "###..", ".#...", ".#...", ".#..#", "..##."],
    "u": [".....", ".....", "#...#", "#...#", "#...#", "#..##", ".##.#"],
    "v": [".....", ".....", "#...#", "#...#", "#...#", ".#.#.", "..#.."],
    "w": [".....", ".....", "#...#", "#...#", "#.#.#", "#.#.#", ".#.#."],
    "x": [".....", ".....", "#...#", ".#.#.", "..#..", ".#.#.", "#...#"],
    "y": [".....", ".....", "#...#", "#...#", ".####", "....#", ".###."],
    "z": [".....", ".....", "#####", "...#.", "..#..", ".#...", "#####"],
    ".": [".....", ".....", ".....", ".....", ".....", ".##..", ".##.."],
    ",": [".....", ".....", ".....", ".....", ".##..", "..#..", ".#..."],
    "/": ["....#", "...#.", "..#..", "..#..", ".#...", "#....", "....."],
    ":": [".....", ".##..", ".##..", ".....", ".##..", ".##..", "....."],
    "-": [".....", ".....", ".....", "#####", ".....", ".....", "....."],
    "(": ["...#.", "..#..", ".#...", ".#...", ".#...", "..#..", "...#."],
    ")": [".#...", "..#..", "...#.", "...#.", "...#.", "..#..", ".#..."],
    "+": [".....", "..#..", "..#..", "#####", "..#..", "..#..", "....."],
}


def _sig(art: list[str]) -> int:
    """7×5 art → 35-bit signature, row-major, leftmost pixel = MSB."""
    v = 0
    for row in art:
        for ch in row:
            v = (v << 1) | (ch == "#")
    return v


GLYPH_SIG: dict[str, int] = {c: _sig(a) for c, a in _GLYPHS_ART.items()}
# recognition order is deterministic: sorted by char
_TEMPLATES: list[tuple[int, str]] = sorted(
    (sig, ch) for ch, sig in GLYPH_SIG.items()
)

CHARSET = "".join(sorted(_GLYPHS_ART)) + " "


def min_pairwise_distance(chars: str) -> int:
    """Smallest Hamming distance between any two glyphs of ``chars`` —
    noise below half this is provably recoverable by nearest-template."""
    sigs = [GLYPH_SIG[c] for c in chars if c != " "]
    best = GLYPH_W * GLYPH_H
    for i in range(len(sigs)):
        for j in range(i + 1, len(sigs)):
            best = min(best, (sigs[i] ^ sigs[j]).bit_count())
    return best


def render_page(
    lines: list[str], margin: int = MARGIN, width: int | None = None
) -> tuple[int, int, bytes]:
    """Text lines → (width, height, 1-bit bitmap), ink=1, rows packed
    MSB-first and padded to a whole byte — the layout a 1-bit
    ``/DeviceGray`` PDF image XObject uses (inverted: PDF 0=black).
    Characters outside the font render blank (as does space)."""
    ncols = max((len(ln) for ln in lines), default=0)
    w = width if width is not None else 2 * margin + max(ncols * X_PITCH, 1)
    h = 2 * margin + max(len(lines) * Y_PITCH, 1)
    stride = (w + 7) // 8
    bm = bytearray(stride * h)
    for li, ln in enumerate(lines):
        y0 = margin + li * Y_PITCH
        for ci, ch in enumerate(ln):
            art = _GLYPHS_ART.get(ch)
            if art is None:
                continue
            x0 = margin + ci * X_PITCH
            if x0 + GLYPH_W > w:
                break  # clip at the right edge, like a real printer
            for r, row in enumerate(art):
                for c, px in enumerate(row):
                    if px == "#":
                        x = x0 + c
                        bm[(y0 + r) * stride + (x >> 3)] |= 0x80 >> (x & 7)
    return w, h, bytes(bm)


def _cell_sig(
    bits: list[int], w: int, x0: int, y0: int
) -> int:
    """35-bit signature of the 5×7 cell at (x0, y0); ``bits`` is one int of
    row bits per scanline (bit (w-1-x) = pixel x)."""
    v = 0
    for r in range(GLYPH_H):
        row = bits[y0 + r] if 0 <= y0 + r < len(bits) else 0
        for c in range(GLYPH_W):
            x = x0 + c
            px = (row >> (w - 1 - x)) & 1 if 0 <= x < w else 0
            v = (v << 1) | px
    return v


def _fit_grid(
    bits: list[int],
    w: int,
    col_anchors: list[int],
    row_anchors: list[int],
    max_cells: int = 24,
) -> tuple[int, int]:
    """Refine detected ink bounds to the true grid origin. Each anchor
    (the first row/column with ≥2 ink pixels, and with ≥1 — a thin first
    glyph like '/' never reaches 2 in any single row) bounds the origin
    from below by at most one glyph extent, so candidates are every offset
    within that window. Score = mean nearest-template distance of the
    candidate's first-line non-blank cells (0 for the true grid on a clean
    render; a misaligned grid mismatches every cell). Candidates are tried
    top-left first and ties keep the earliest — a perfect-scoring band
    lower down must not shadow a thin real first line above it."""
    xcands = sorted(
        {x for a in col_anchors for x in range(max(a - GLYPH_W + 1, 0), a + 1)}
    )
    ycands = sorted(
        {y for a in row_anchors for y in range(max(a - GLYPH_H + 1, 0), a + 1)}
    )
    h = len(bits)
    best = (float("inf"), ycands[0], xcands[0])
    for y0 in ycands:
        for x0 in xcands:
            # score = template mismatch of the band's cells PLUS stray ink
            # in the grid's blank zones (the 1-px column between glyphs and
            # the 2 rows below the glyph band) — a shifted grid can fluke a
            # cheap sparse-glyph match, but it cannot hide the ink it
            # pushes into the gaps
            total = cnt = ci = 0
            while x0 + ci * X_PITCH + GLYPH_W <= w and cnt < max_cells:
                cx = x0 + ci * X_PITCH
                sig = _cell_sig(bits, w, cx, y0)
                pc = sig.bit_count()
                if pc > 1:
                    total += min(
                        (sig ^ t).bit_count() for t, _ in _TEMPLATES
                    )
                    cnt += 1
                else:
                    # a space cell renders blank: a lone speckle is 1 bit of
                    # unexplained ink, NOT free — a shifted grid must not
                    # hide stray pixels in "speckle" cells
                    total += pc
                gx = cx + GLYPH_W
                if gx < w:
                    for r in range(GLYPH_H):
                        if 0 <= y0 + r < h:
                            total += (bits[y0 + r] >> (w - 1 - gx)) & 1
                ci += 1
            span_mask = ((1 << (ci * X_PITCH)) - 1) << max(
                w - x0 - ci * X_PITCH, 0
            )
            for r in (y0 + GLYPH_H, y0 + GLYPH_H + 1):
                if 0 <= r < h:
                    total += (bits[r] & span_mask).bit_count()
            if x0:
                # ink LEFT of the candidate origin is also unexplained — a
                # grid must not dodge a damaged first glyph by starting at
                # the second one
                left_mask = ((1 << x0) - 1) << (w - x0)
                for r in range(y0, min(y0 + GLYPH_H + 2, h)):
                    if r >= 0:
                        total += (bits[r] & left_mask).bit_count()
            score = total if cnt else float("inf")
            if score == 0:
                return x0, y0  # earliest perfect grid wins outright
            if score < best[0]:
                best = (score, y0, x0)
    return best[2], best[1]


def ocr_page(
    w: int,
    h: int,
    bitmap: bytes,
    origin: tuple[int, int] | None = None,
    reject: int = 12,
) -> list[str]:
    """1-bit bitmap (ink=1, packed rows) → recognized text lines.

    ``origin`` is the top-left of the first glyph cell; ``None``
    auto-detects it: the first row/column containing ≥2 ink pixels (≥2 so
    an isolated noise speckle in the margin cannot shift the grid) bounds
    the origin from below by at most one glyph extent — a first character
    like ``1`` or ``.`` has blank leading cell columns/rows — so the exact
    origin is recovered by a grid-fit search over that GLYPH_W×GLYPH_H
    window, keeping the offset whose first-line cells have the smallest
    total nearest-template distance (0 on a clean render; a misaligned
    grid scores ≫0 on every cell). From the origin, cells are sampled on
    the fixed X_PITCH×Y_PITCH grid — the form-document geometry — and each
    cell resolves to the nearest glyph by Hamming distance over the 35
    cell pixels: blank → space, distance > ``reject`` → ``?``. Trailing
    spaces and trailing empty lines are trimmed."""
    stride = (w + 7) // 8
    bits = [
        int.from_bytes(bitmap[r * stride : (r + 1) * stride], "big")
        >> (stride * 8 - w)
        for r in range(h)
    ]
    if origin is None:
        # anchors: first row/col with ≥2 ink pixels (resists lone margin
        # speckles) AND with ≥1 (a thin first line like '/' never puts 2
        # pixels in one row) — the grid-fit scores both windows
        row_ge1 = next((r for r in range(h) if bits[r]), None)
        if row_ge1 is None:
            return []
        row_ge2 = next((r for r in range(h) if bits[r].bit_count() >= 2), row_ge1)
        colcount = [0] * w
        for r in range(h):
            row = bits[r]
            for x in range(w):
                colcount[x] += (row >> (w - 1 - x)) & 1
        col_ge1 = next(x for x in range(w) if colcount[x])
        col_ge2 = next((x for x in range(w) if colcount[x] >= 2), col_ge1)
        col0, row0 = _fit_grid(
            bits, w, [col_ge1, col_ge2], [row_ge1, row_ge2]
        )
    else:
        col0, row0 = origin
    out: list[str] = []
    li = 0
    while row0 + li * Y_PITCH + GLYPH_H <= h:
        y0 = row0 + li * Y_PITCH
        chars: list[str] = []
        ci = 0
        while col0 + ci * X_PITCH + GLYPH_W <= w:
            sig = _cell_sig(bits, w, col0 + ci * X_PITCH, y0)
            if sig.bit_count() <= 1:
                # blank or a lone speckle — every real glyph has ≥4 ink
                # pixels, so ≤1 is noise on a space cell
                chars.append(" ")
            else:
                best_d, best_c = 99, "?"
                for tsig, tch in _TEMPLATES:
                    d = (sig ^ tsig).bit_count()
                    if d < best_d:
                        best_d, best_c = d, tch
                chars.append(best_c if best_d <= reject else "?")
            ci += 1
        out.append("".join(chars).rstrip())
        li += 1
    while out and not out[-1]:
        out.pop()
    return out


def ocr_gray(
    w: int, h: int, pixels: bytes, threshold: int = 128, **kw
) -> list[str]:
    """8-bit grayscale page (one byte per pixel, as
    :func:`pdf_codec.extract_pdf_images` returns) → text lines. Pixels
    darker than ``threshold`` are ink — scans are dark-on-light."""
    stride = (w + 7) // 8
    bm = bytearray(stride * h)
    for y in range(h):
        base = y * w
        for x in range(w):
            if pixels[base + x] < threshold:
                bm[y * stride + (x >> 3)] |= 0x80 >> (x & 7)
    return ocr_page(w, h, bytes(bm), **kw)
