"""Fixed-font OCR (operators/ocr.py) + embedded-image extraction
(pdf_codec.extract_pdf_images) + the scanned-branch operators
(operators/scanned.py).

The load-bearing properties:
* render → ocr is EXACT for any text over the font charset (including
  grid-origin recovery when the first character has blank leading cell
  columns — '1', '.', 'j'…);
* noise below half the alphabet's minimum pairwise glyph distance is
  provably recoverable, asserted self-calibrated (no magic thresholds);
* a multi-page scanned PDF round-trips through extract_pdf_images +
  ocr_gray to the original lines — the scanned twin of the text path.
"""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from aide_spark.operators.ocr import (
    CHARSET,
    GLYPH_H,
    GLYPH_SIG,
    GLYPH_W,
    MARGIN,
    X_PITCH,
    Y_PITCH,
    min_pairwise_distance,
    ocr_gray,
    ocr_page,
    render_page,
)

SETTINGS = dict(max_examples=40, deadline=None)

# leading spaces are inherently unobservable to auto-origin OCR (no
# reference margin) and trailing spaces are rstripped — strip both
_txt = st.text(alphabet=CHARSET, min_size=1, max_size=30).map(
    lambda s: s.strip() or "x"
)


def test_font_glyphs_distinct_with_margin():
    assert min_pairwise_distance("".join(c for c in CHARSET if c != " ")) >= 2
    # the form-document subset (what statements actually print) separates
    # enough to correct 1-bit noise per cell
    assert min_pairwise_distance("0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ./-:()+,") >= 3


@settings(**SETTINGS)
@given(lines=st.lists(_txt, min_size=1, max_size=6))
def test_render_ocr_round_trip_exact(lines):
    w, h, bm = render_page(lines)
    assert ocr_page(w, h, bm) == [ln.rstrip() for ln in lines]


_FORM_CHARSET = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ./-:()+, "
_form_txt = st.text(alphabet=_FORM_CHARSET, min_size=1, max_size=30).map(
    lambda s: s.strip() or "X"
)


@settings(**SETTINGS)
@given(text=_form_txt, seed=st.integers(0, 2**32 - 1))
def test_ocr_recovers_under_self_calibrated_noise(text, seed):
    """Flip up to floor((d_min-1)/2) bits inside every glyph cell, where
    d_min is the distance from the text's glyphs to their nearest neighbor
    among ALL templates INCLUDING blank (space) — a space cell and '.'
    are only popcount('.') apart, so texts containing spaces calibrate to
    k=1. Nearest-template matching must then recover the exact text."""
    targets = list(GLYPH_SIG.values()) + [0]  # 0 = blank (space cell)
    d_min = min(
        (GLYPH_SIG.get(c, 0) ^ t).bit_count()
        for c in set(text)
        for t in targets
        if t != GLYPH_SIG.get(c, 0)
    )
    k = (d_min - 1) // 2
    w, h, bm = render_page([text])
    bm = bytearray(bm)
    rng = random.Random(seed)
    stride = (w + 7) // 8
    for ci in range(len(text)):
        x0, y0 = MARGIN + ci * X_PITCH, MARGIN
        for _ in range(k):
            x = x0 + rng.randrange(GLYPH_W)
            y = y0 + rng.randrange(GLYPH_H)
            bm[y * stride + (x >> 3)] ^= 0x80 >> (x & 7)
    assert ocr_page(w, h, bytes(bm)) == [text.rstrip()]


def test_ocr_origin_recovery_for_blank_leading_columns():
    # '1' has no ink in its cell's first column, '.' none in its first rows
    for ln in ["1 2 3", ". . .", "jjj", ", leading comma", "111 lll III"]:
        w, h, bm = render_page([ln])
        assert ocr_page(w, h, bm) == [ln.rstrip()], ln


def test_leading_space_page_dedents():
    """A page whose every line is indented loses only the COMMON indent —
    the grid locks to the leftmost inked cell; relative indentation
    survives."""
    w, h, bm = render_page(["  A 1", "   B"])
    assert ocr_page(w, h, bm) == ["A 1", " B"]


def test_ocr_empty_and_garbage():
    assert ocr_page(8, 8, bytes(8)) == []
    w, h, bm = render_page([""])
    assert ocr_page(w, h, bm) == []
    # random speckle never raises
    rng = random.Random(7)
    noise = bytes(rng.randrange(256) for _ in range(40 * 5))
    ocr_page(40, 5, noise)


def test_unknown_glyph_rejects_to_question_mark():
    w, h, bm = render_page(["AB"])
    # overwrite B's cell with a dense unknown pattern
    stride = (w + 7) // 8
    bm = bytearray(bm)
    x0 = MARGIN + X_PITCH
    for r in range(GLYPH_H):
        for c in range(GLYPH_W):
            x = x0 + c
            if (r * GLYPH_W + c) % 2 == 0:
                bm[(MARGIN + r) * stride + (x >> 3)] |= 0x80 >> (x & 7)
            else:
                bm[(MARGIN + r) * stride + (x >> 3)] &= ~(0x80 >> (x & 7)) & 0xFF
    got = ocr_page(w, h, bytes(bm), origin=(MARGIN, MARGIN), reject=6)
    assert got[0][0] == "A" and got[0][1] == "?"


# ---------------------------------------------------------------------------
# scanned-PDF round trip (extract_pdf_images + ocr_gray)
# ---------------------------------------------------------------------------


def test_scanned_pdf_multipage_round_trip():
    from aide_spark.operators.scanned import render_scanned_pdf
    from aide_spark.sources.pdf_codec import extract_pdf_images

    lines = [f"LINE {i} AMOUNT {i * 111}.{i % 100:02d} (Cr)" for i in range(25)]
    pdf = render_scanned_pdf(lines, page_size=10)
    imgs = extract_pdf_images(pdf)
    assert [im["page"] for im in imgs] == [0, 1, 2]  # per-page resources: no dupes
    got: list[str] = []
    for im in imgs:
        assert im["bits"] == 1 and im["codec"] == "flate"
        got.extend(ocr_gray(im["width"], im["height"], im["pixels"]))
    assert got == lines


def test_extract_pdf_images_placeholder_and_native_filters():
    from aide_spark.sources.pdf_codec import encode_pdf, extract_pdf_images

    # placeholder 1×1 (no images= argument) still enumerates
    pdf = encode_pdf([("media", "", "m1", 0)])
    imgs = extract_pdf_images(pdf)
    assert len(imgs) == 1 and imgs[0]["width"] == 1 and imgs[0]["pixels"] == b"\x00"
    # a CCITT-labeled stream is reported but not decoded
    pdf2 = encode_pdf(
        [("media", "", "fax", 0)],
        images={"fax": {"width": 4, "height": 4, "bits": 1, "filter": "raw",
                        "data": b"\x00" * 4}},
    ).replace(b"/BitsPerComponent 1", b"/BitsPerComponent 1 /Filter /CCITTFaxDecode")
    im = extract_pdf_images(pdf2)[0]
    assert im["codec"] == "ccitt" and im["pixels"] is None
    assert extract_pdf_images(b"not a pdf") is None


def test_extract_pdf_images_encrypted():
    from aide_spark.sources.pdf_codec import encode_pdf, extract_pdf_images

    data = bytes(range(16))  # 4×4 gray
    pdf = encode_pdf(
        [("media", "", "img", 0)],
        password="pw",
        cipher="aesv2",
        images={"img": {"width": 4, "height": 4, "bits": 8, "filter": "flate",
                        "data": data}},
    )
    im = extract_pdf_images(pdf, "pw")[0]
    assert im["pixels"] == data
    assert extract_pdf_images(pdf, "wrong") is None


def test_scanned_fax_g4_round_trip():
    """The Group 4 fax variant of the scan: render → T.6-compress →
    /CCITTFaxDecode XObject → extract (from-scratch G4 decode) → OCR."""
    from aide_spark.operators.scanned import render_scanned_pdf
    from aide_spark.sources.pdf_codec import extract_pdf_images

    lines = ["FAX 1 99/99/9999 TXN0 123.45 (Dr)", "Name RAVI KUMAR"]
    imgs = extract_pdf_images(render_scanned_pdf(lines, filter="ccitt"))
    assert imgs[0]["codec"] == "ccitt" and imgs[0]["pixels"] is not None
    assert ocr_gray(imgs[0]["width"], imgs[0]["height"], imgs[0]["pixels"]) == lines


def test_scanned_path_matches_text_path_on_bank_grammar():
    """Cross-path equivalence on the REAL statement grammars: every text
    line a generated Union/Canara/APGVB document contains survives the
    scanned round trip (render → 1-bit XObject PDF → extract → OCR)
    byte-exactly — the property that lets the scanned branch feed the SAME
    parsers as the text branch."""
    import random

    from aide_spark import generator as g
    from aide_spark.operators.scanned import render_scanned_pdf
    from aide_spark.schemas import PAGE_BREAK
    from aide_spark.sources.pdf_codec import extract_pdf_images

    for seed, fn in enumerate((g._union_doc, g._canara_doc, g._apgvb_doc)):
        spans = fn(random.Random(seed), f"doc{seed}")
        lines = [t for k, t, *_ in spans if k == "text" and t != PAGE_BREAK]
        imgs = extract_pdf_images(render_scanned_pdf(lines, page_size=30))
        got: list[str] = []
        for im in imgs:
            got.extend(ocr_gray(im["width"], im["height"], im["pixels"]))
        assert got == [ln.rstrip() for ln in lines], fn.__name__


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def scanned_docs(spark):
    from aide_spark.operators.scanned import render_scanned_pdf

    rows = [
        (i, render_scanned_pdf(
            [f"DOC {i} ROW {j} VALUE {j * 7}.{j:02d} (Dr)" for j in range(8)],
            page_size=5,
        ))
        for i in range(6)
    ]
    return spark.createDataFrame(rows, "doc_id long, payload binary").repartition(3)


def test_ocr_scanned_lines_operator(spark, scanned_docs):
    from aide_spark.operators.scanned import ocr_scanned_lines

    out = ocr_scanned_lines(scanned_docs).collect()
    assert len(out) == 6 * 8
    by_doc: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r.doc_id, r.page, r.line_no)):
        by_doc.setdefault(r.doc_id, []).append(r.line)
    for i, lines in by_doc.items():
        assert lines == [f"DOC {i} ROW {j} VALUE {j * 7}.{j:02d} (Dr)" for j in range(8)]


def test_pdf_image_features_operator(spark, scanned_docs):
    from aide_spark.operators.scanned import pdf_image_features

    out = pdf_image_features(scanned_docs).collect()
    # 8 lines at page_size=5 → 2 pages per doc
    assert len(out) == 6 * 2
    for r in out:
        assert r.bits == 1 and r.codec == "flate" and 0.0 < r.mean_luma < 1.0
