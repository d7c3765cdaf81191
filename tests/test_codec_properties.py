"""Hypothesis property tests for the from-scratch codecs (PDF, PNG, PNM,
WAV, crypto primitives) — adversarial inputs the fixture corpus can't
enumerate. No Spark session needed; pure codec surface."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from aide_spark.schemas import PAGE_BREAK

SETTINGS = dict(max_examples=40, deadline=None)

# PDF string/name escaping must survive arbitrary unicode (minus the two
# characters the span model reserves structurally: PAGE_BREAK splits pages,
# and '\n'/'\r' are line-structure in the container format — the generator
# never emits them inside a single span's text)
_text = st.text(
    alphabet=st.characters(blacklist_characters="\f\r\n", codec="utf-8"),
    max_size=60,
)
_ref = st.text(
    alphabet=st.characters(blacklist_characters="\r\n", codec="utf-8"),
    min_size=1,
    max_size=40,
)


def _spans(texts: list[str], refs: list[str], breaks: list[bool]) -> list[tuple]:
    rows, i = [], 0
    for t in texts:
        rows.append(("text", t, "", i))
        i += 1
    for r, br in zip(refs, breaks):
        if br:
            rows.append(("text", PAGE_BREAK, "", i))
            i += 1
        rows.append(("media", "", r, i))
        i += 1
    return rows


@settings(**SETTINGS)
@given(
    texts=st.lists(_text, min_size=1, max_size=6),
    refs=st.lists(_ref, max_size=3),
    breaks=st.lists(st.booleans(), min_size=3, max_size=3),
    compress=st.booleans(),
    objstm=st.booleans(),
)
def test_pdf_round_trip_arbitrary_unicode(texts, refs, breaks, compress, objstm):
    from aide_spark.sources.pdf_codec import decode_pdf_bytes, encode_pdf

    spans = _spans(texts, refs, breaks)
    want = [
        {"kind": k, "text": t, "media_ref": m, "offset": i}
        for i, (k, t, m, _o) in enumerate(spans)
    ]
    got = decode_pdf_bytes(
        encode_pdf(spans, compress=compress, object_streams=objstm)
    )
    assert got == want


@settings(max_examples=10, deadline=None)  # pure-python AES cost
@given(
    texts=st.lists(_text, min_size=1, max_size=4),
    password=st.text(min_size=1, max_size=20).filter(lambda p: p.strip() != ""),
    cipher=st.sampled_from(["rc4", "aesv2", "aesv3"]),
)
def test_pdf_encrypted_round_trip_arbitrary_password(texts, password, cipher):
    from aide_spark.sources.pdf_codec import decode_pdf_bytes_ex, encode_pdf

    spans = _spans(texts, [], [])
    pdf = encode_pdf(spans, password=password, cipher=cipher)
    got, status = decode_pdf_bytes_ex(pdf, password)
    assert status == "OK"
    assert [s["text"] for s in got] == [t for _k, t, _m, _o in spans]
    wrong = password + "x"
    assert decode_pdf_bytes_ex(pdf, wrong)[1] == "WRONG_PASSWORD"


@settings(**SETTINGS)
@given(ref=_ref)
def test_pdf_name_escaping_round_trip(ref):
    from aide_spark.sources.pdf_codec import _escape_name, _unescape_name

    escaped = _escape_name(ref)
    # escaped form is plain ASCII with no PDF delimiters or whitespace
    assert all(32 < ord(c) < 127 for c in escaped)
    assert not set(escaped) & set("()<>[]{}/%\\ \t")
    assert _unescape_name(escaped.encode("ascii")) == ref


@settings(**SETTINGS)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    nch=st.sampled_from([1, 2, 3, 4]),
    data=st.data(),
)
def test_png_round_trip_random_pixels(w, h, nch, data):
    from aide_spark.operators.image_codec import decode_png, encode_png

    px = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=w * h * nch, max_size=w * h * nch
            )
        )
    )
    assert decode_png(encode_png(w, h, nch, px)) == (w, h, nch, px)


@settings(**SETTINGS)
@given(
    rate=st.integers(800, 96000),
    nch=st.integers(1, 2),
    frames=st.lists(
        st.floats(min_value=-1.0, max_value=1.0, allow_nan=False), max_size=64
    ),
)
def test_wav_round_trip_random_samples(rate, nch, frames):
    from aide_spark.operators.audio_codec import decode_wav, encode_wav

    samples = frames[: len(frames) - len(frames) % nch]
    if not samples:
        samples = [0.0] * nch
    got = decode_wav(encode_wav(rate, nch, samples))
    assert got is not None
    grate, gch, gframes, gsamples = got
    assert (grate, gch, gframes) == (rate, nch, len(samples) // nch)
    assert all(abs(a - b) < 1e-4 for a, b in zip(gsamples, samples))


@settings(**SETTINGS)
@given(key=st.binary(min_size=1, max_size=32), data=st.binary(max_size=200))
def test_rc4_involution(key, data):
    from aide_spark.sources.pdf_codec import _rc4

    assert _rc4(key, _rc4(key, data)) == data


@settings(max_examples=20, deadline=None)
@given(
    key=st.sampled_from([16, 24, 32]).flatmap(
        lambda n: st.binary(min_size=n, max_size=n)
    ),
    iv=st.binary(min_size=16, max_size=16),
    data=st.binary(max_size=100),
)
def test_aes_cbc_involution(key, iv, data):
    from aide_spark.operators import image_codec  # noqa: F401 (import check)
    from aide_spark.sources.aes import cbc_decrypt, cbc_encrypt

    assert cbc_decrypt(cbc_encrypt(data, key, iv), key, iv) == data


@settings(max_examples=30, deadline=None)
@given(payload=st.binary(max_size=300))
def test_decoders_never_raise_on_garbage(payload):
    """Quarantine contract: every decoder returns None/status on arbitrary
    bytes, never raises."""
    from aide_spark.operators.audio_codec import decode_wav
    from aide_spark.operators.image_codec import decode_image
    from aide_spark.sources.pdf_codec import decode_pdf_bytes_ex

    decode_image(payload)
    decode_wav(payload)
    spans, status = decode_pdf_bytes_ex(payload, "pw")
    assert status in ("OK", "NOT_PDF", "CORRUPTED")
    # prefix with magics to drive deeper paths
    decode_pdf_bytes_ex(b"%PDF-1.4\n" + payload)
    decode_image(b"\x89PNG\r\n\x1a\n" + payload)
    decode_image(b"P6\n" + payload)
    decode_wav(b"RIFF" + payload[:4] + b"WAVE" + payload)


@settings(max_examples=8, deadline=None)  # pure-python AES cost
@given(
    password=st.text(min_size=1, max_size=12).filter(lambda p: p.strip() != ""),
    owner=st.text(min_size=1, max_size=12).filter(lambda p: p.strip() != ""),
    cipher=st.sampled_from(["rc4", "aesv2", "aesv3"]),
)
def test_pdf_owner_password_opens_document(password, owner, cipher):
    """Algorithm 7 (r4 advisory): a document encrypted with DISTINCT user and
    owner passwords must open with either; a third password still fails."""
    from hypothesis import assume

    from aide_spark.sources.pdf_codec import decode_pdf_bytes_ex, encode_pdf

    assume(owner != password and owner != password.strip())
    spans = [("text", "owner auth body", "", 0)]
    pdf = encode_pdf(spans, password=password, owner_password=owner, cipher=cipher)
    for pw in (password, owner):
        got, status = decode_pdf_bytes_ex(pdf, pw)
        assert status == "OK", (cipher, pw)
        assert got[0]["text"] == "owner auth body"
    assert decode_pdf_bytes_ex(pdf, password + owner + "x")[1] == "WRONG_PASSWORD"


def test_pdf_owner_password_rc4_rev3_and_foreign_cf_dict_order():
    from aide_spark.sources.pdf_codec import decode_pdf_bytes_ex, encode_pdf

    spans = [("text", "hello", "", 0)]
    pdf = encode_pdf(spans, password="user", owner_password="boss", security_rev=3)
    assert decode_pdf_bytes_ex(pdf, "boss")[1] == "OK"
    assert decode_pdf_bytes_ex(pdf, "user")[1] == "OK"

    # foreign V4 dict ordering (r4 advisory): the crypt filter's /Length 16
    # (BYTES) precedes the top-level /Length 128 (bits) — keylen must still
    # resolve to 16 bytes, not 2
    pdf2 = encode_pdf(spans, password="user", owner_password="boss", cipher="aesv2")
    before = b"/V 4 /R 4 /Length 128 /CF << /StdCF << /CFM /AESV2 /Length 16 >> >>"
    after = b"/V 4 /R 4 /CF << /StdCF << /CFM /AESV2 /Length 16 >> >> /Length 128"
    assert before in pdf2 and len(before) == len(after)
    reordered = pdf2.replace(before, after)
    assert decode_pdf_bytes_ex(reordered, "user")[1] == "OK"
    assert decode_pdf_bytes_ex(reordered, "boss")[1] == "OK"


def test_wav_truncated_chunk_rejected():
    """r4 advisory: an over-declared/truncated data chunk must quarantine
    (None), never silently decode a partial sample buffer."""
    from aide_spark.operators.audio_codec import decode_wav, encode_wav

    wav = encode_wav(8000, 1, [0.1, -0.2, 0.3, -0.4])
    assert decode_wav(wav) is not None
    assert decode_wav(wav[:-3]) is None            # truncated payload
    over = bytearray(wav)
    pos = wav.index(b"data") + 4
    over[pos:pos + 4] = (2**16).to_bytes(4, "little")  # over-declared length
    assert decode_wav(bytes(over)) is None


def test_pdf_info_metadata_round_trip_all_container_variants():
    """/Info document-information dict (V7's raw-bytes source): UTF-16BE
    values round-trip through plain, ObjStm, and every encrypted variant
    (strings individually encrypted when top-level; plaintext inside an
    encrypted ObjStm per spec 7.5.7)."""
    from aide_spark.sources.pdf_codec import decode_pdf_metadata_ex, encode_pdf

    meta = {
        "/Title": "Última relación – ważne 報告",
        "/Author": "plain ascii",
        "/Producer": "aide-spark",
        "/CreationDate": "D:20260817030000Z",
    }
    spans = [("text", "body", "", 0)]
    variants = [
        dict(),
        dict(object_streams=True),
        dict(password="pw", cipher="rc4"),
        dict(password="pw", cipher="rc4", security_rev=3),
        dict(password="pw", cipher="aesv2"),
        dict(password="pw", cipher="aesv3"),
        dict(password="pw", cipher="aesv2", object_streams=True),
    ]
    for kw in variants:
        pdf = encode_pdf(spans, metadata=meta, **kw)
        got, status = decode_pdf_metadata_ex(pdf, kw.get("password"))
        assert status == "OK" and got == meta, (kw, status, got)
    assert decode_pdf_metadata_ex(encode_pdf(spans)) == ({}, "OK")
    locked = encode_pdf(spans, metadata=meta, password="pw")
    assert decode_pdf_metadata_ex(locked)[1] == "ENCRYPTED_NO_PASSWORD"
    assert decode_pdf_metadata_ex(locked, "nope")[1] == "WRONG_PASSWORD"


def test_pdf_utf16_content_string_decodes():
    """A foreign PDF carrying UTF-16BE text strings (BOM FE FF) must extract
    the same text pypdf yields, not mojibake (r3 VERDICT #5)."""
    from aide_spark.sources.pdf_codec import decode_pdf_bytes

    want = "Отчёт"
    hx = ("feff" + want.encode("utf-16-be").hex()).encode()
    content = b"BT <" + hx + b"> Tj ET"
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length " + str(len(content)).encode() + b" >>\n"
        b"stream\n" + content + b"\nendstream\nendobj\n"
        b"trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF\n"
    )
    spans = decode_pdf_bytes(pdf)
    assert spans is not None and spans[0]["text"] == want


@settings(max_examples=12, deadline=None)
@given(
    w=st.integers(1, 17),
    h=st.integers(1, 13),
    nch=st.sampled_from([1, 3]),
    data=st.binary(min_size=1, max_size=17 * 13 * 3),
)
def test_jpeg_round_trip_random_pixels(w, h, nch, data):
    """Baseline JPEG round-trip on a flat quant table: exact up to DCT
    rounding (gray) + YCbCr transform rounding (color)."""
    from aide_spark.operators.jpeg_codec import decode_jpeg, encode_jpeg

    need = w * h * nch
    px = (data * (need // len(data) + 1))[:need]
    got = decode_jpeg(encode_jpeg(w, h, nch, px))
    assert got is not None
    gw, gh, gc, gp = got
    assert (gw, gh, gc) == (w, h, nch)
    tol = 4 if nch == 1 else 6
    assert max(abs(a - b) for a, b in zip(gp, px)) <= tol


@settings(**SETTINGS)
@given(payload=st.binary(max_size=300))
def test_jpeg_decoder_never_raises_on_garbage(payload):
    from aide_spark.operators.jpeg_codec import decode_jpeg

    decode_jpeg(payload)
    decode_jpeg(b"\xff\xd8" + payload)
    decode_jpeg(b"\xff\xd8\xff\xdb" + payload)


def test_pdf_cid_tounicode_text_decodes():
    """CID/Type0 text (2-byte codes + /ToUnicode CMap, the pypdf-compatible
    path): bfchar and bfrange entries both resolve; a font switch via Tf
    changes the active mapping; unmapped codes yield U+FFFD."""
    from aide_spark.sources.pdf_codec import decode_pdf_bytes

    cmap = (
        b"/CIDInit /ProcSet findresource begin\n"
        b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
        b"2 beginbfchar <0041> <0416> <0042> <0436> endbfchar\n"  # Zh, zh
        b"1 beginbfrange <0100> <0102> <0440> endbfrange\n"       # r, s, t (cyr)
        b"endcmap end\n"
    )
    # codes: 0041 0042 0100 0101 0102 -> "Жж" + "рст"
    content = b"BT /F9 12 Tf <00410042> Tj <010001010102> Tj ET"

    def obj(n, body):
        return b"%d 0 obj\n" % n + body + b"\nendobj\n"

    pdf = (
        b"%PDF-1.4\n"
        + obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
        + obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
        + obj(3, b"<< /Type /Page /Parent 2 0 R "
                 b"/Resources << /Font << /F9 5 0 R >> >> /Contents 4 0 R >>")
        + obj(4, b"<< /Length %d >>\nstream\n" % len(content) + content + b"\nendstream")
        + obj(5, b"<< /Type /Font /Subtype /Type0 /BaseFont /Fake-Identity-H "
                 b"/Encoding /Identity-H /ToUnicode 6 0 R >>")
        + obj(6, b"<< /Length %d >>\nstream\n" % len(cmap) + cmap + b"\nendstream")
        + b"trailer\n<< /Size 7 /Root 1 0 R >>\n%%EOF\n"
    )
    spans = decode_pdf_bytes(pdf)
    assert spans is not None
    assert spans[0]["text"] == "Жжрст"

    # unmapped code → replacement char
    bad = pdf.replace(b"<010001010102>", b"<011101010102>")
    spans = decode_pdf_bytes(bad)
    assert spans[0]["text"] == "Жж�ст"

    # a page WITHOUT the Tf switch keeps the default decode (no cmap leak)
    plain = pdf.replace(b"/F9 12 Tf ", b"")
    spans = decode_pdf_bytes(plain)
    assert "Ж" not in spans[0]["text"]


@settings(max_examples=10, deadline=None)
@given(
    w=st.integers(1, 17),
    h=st.integers(1, 13),
    nch=st.sampled_from([1, 3]),
    refine=st.booleans(),
    data=st.binary(min_size=1, max_size=17 * 13 * 3),
)
def test_jpeg_progressive_decodes_identical_to_baseline(w, h, nch, refine, data):
    """The strongest progressive invariant: a progressive scan script
    (spectral selection; with refine also successive approximation Al=1→0)
    carries the IDENTICAL coefficients as the baseline encoding of the same
    pixels, so the decoded output must be byte-identical — exercising SOF2,
    multi-scan parsing, DC/AC first + refinement scans, and EOBRUN."""
    from aide_spark.operators.jpeg_codec import decode_jpeg, encode_jpeg

    need = w * h * nch
    px = (data * (need // len(data) + 1))[:need]
    base = decode_jpeg(encode_jpeg(w, h, nch, px))
    prog = decode_jpeg(encode_jpeg(w, h, nch, px, progressive=True, refine=refine))
    assert base is not None and prog is not None
    assert base == prog


@settings(**SETTINGS)
@given(
    w=st.integers(1, 20),
    h=st.integers(1, 14),
    nch=st.sampled_from([1, 2, 3, 4]),
    data=st.binary(min_size=1, max_size=20 * 14 * 4),
)
def test_png_adam7_round_trip(w, h, nch, data):
    """Adam7-interlaced PNG must decode to the identical pixel buffer: the
    7 passes are independently filtered and scattered back into place."""
    from aide_spark.operators.image_codec import decode_png, encode_png

    need = w * h * nch
    px = (data * (need // len(data) + 1))[:need]
    assert decode_png(encode_png(w, h, nch, px, interlace=True)) == (w, h, nch, px)


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 16),
    h=st.integers(1, 12),
    interlace=st.booleans(),
    data=st.binary(min_size=3, max_size=24),
)
def test_gif_round_trip(w, h, interlace, data):
    """GIF87a/89a LZW decode: a palette image round-trips exactly, plain and
    4-pass interlaced (palette drawn from ≤8 distinct colors)."""
    from aide_spark.operators.image_codec import decode_gif, encode_gif

    palette = [bytes(data[i : i + 3].ljust(3, b"\x01")) for i in range(0, len(data), 3)]
    px = b"".join(palette[(x * 7 + y * 3) % len(palette)]
                  for y in range(h) for x in range(w))
    assert decode_gif(encode_gif(w, h, px, interlace=interlace)) == (w, h, 3, px)


@settings(**SETTINGS)
@given(payload=st.binary(max_size=200))
def test_gif_decoder_never_raises_on_garbage(payload):
    from aide_spark.operators.image_codec import decode_gif

    decode_gif(payload)
    decode_gif(b"GIF89a" + payload)


def test_container_decode_is_gzip_transparent():
    """A gzipped container payload (1f 8b magic — the WARC convention)
    decodes to the same spans as the plain bytes; truncated gzip
    quarantines (None)."""
    import gzip

    from aide_spark.sources.binary_ingest import decode_container, encode_spans

    spans = [("text", "hello web", "", 0), ("media", "", "img://x/1", 1)]
    raw = encode_spans(spans)
    assert decode_container(gzip.compress(raw)) == decode_container(raw)
    assert decode_container(gzip.compress(raw)[:-4]) is None
    # corrupted deflate BODY behind a valid header raises zlib.error (not an
    # OSError subclass) — must quarantine, not raise (ADVICE r4, high)
    gz = bytearray(gzip.compress(raw))
    gz[12:16] = b"\xff\x00\xff\x00"  # stomp the deflate stream, keep the magic
    assert decode_container(bytes(gz)) is None


def test_gif_lzw_dictionary_growth_and_runs():
    """Real-LZW streams (not clear-per-pixel): large images force dictionary
    growth across several code widths; long runs hit the KwKwK case; a
    128×128 four-band image crosses thousands of dictionary entries."""
    from aide_spark.operators.image_codec import decode_gif, encode_gif

    px = b"".join(bytes([(i // 64) % 4 * 80, 0, 0]) for i in range(128 * 128))
    assert decode_gif(encode_gif(128, 128, px)) == (128, 128, 3, px)
    pal = [bytes([c, 255 - c, (c * 7) % 256]) for c in range(0, 199, 2)]
    px = b"".join(pal[(x * x + y) % len(pal)] for y in range(30) for x in range(40))
    for inter in (False, True):
        assert decode_gif(encode_gif(40, 30, px, interlace=inter)) == (40, 30, 3, px)


def test_gif_animation_frames_round_trip():
    """Multi-frame GIF: full-canvas frames with delays decode to the exact
    input pixels per frame, delays preserved (r4 VERDICT #8)."""
    from aide_spark.operators.image_codec import decode_gif_frames, encode_gif_frames

    w = h = 6
    f1 = b"".join(bytes([200, 0, 0]) for _ in range(w * h))
    f2 = b"".join(bytes([0, 200, 0]) if i % 2 else bytes([0, 0, 200]) for i in range(w * h))
    f3 = b"".join(bytes([(i * 8) % 250, 0, 60]) for i in range(w * h))
    gif = encode_gif_frames(
        w, h,
        [(10, 0, 0, w, h, f1, None, 0),
         (20, 0, 0, w, h, f2, None, 0),
         (30, 0, 0, w, h, f3, None, 0)],
    )
    got = decode_gif_frames(gif)
    assert got is not None
    cw, ch, frames = got
    assert (cw, ch) == (w, h)
    assert [d for d, _px in frames] == [10, 20, 30]
    assert [px for _d, px in frames] == [f1, f2, f3]


def test_gif_transparency_composites_over_previous_frame():
    """GCE transparency: transparent pixels of a patch frame leave the
    underlying canvas visible; opaque patch pixels overwrite it."""
    from aide_spark.operators.image_codec import decode_gif_frames, encode_gif_frames

    w = h = 4
    red, blue = bytes([255, 0, 0]), bytes([0, 0, 255])
    base = red * (w * h)
    patch = blue * 4  # 2x2 at (1,1)
    mask = [False, True, False, False]  # pixel (2,1) of the patch transparent
    gif = encode_gif_frames(
        w, h,
        [(0, 0, 0, w, h, base, None, 0),
         (5, 1, 1, 2, 2, patch, mask, 1)],
    )
    cw, ch, frames = decode_gif_frames(gif)
    assert len(frames) == 2
    want = bytearray(base)
    for (px, py) in [(1, 1), (1, 2), (2, 2)]:  # (2,1) stays red
        o = 3 * (py * w + px)
        want[o:o + 3] = blue
    assert frames[1][1] == bytes(want)


def test_gif_disposal_background_and_previous():
    """Disposal 2 restores the frame rect to the background color before the
    next frame; disposal 3 restores the pre-frame canvas."""
    from aide_spark.operators.image_codec import decode_gif_frames, encode_gif_frames

    w = h = 4
    bg = bytes([9, 9, 9])
    red, green, blue = bytes([255, 0, 0]), bytes([0, 255, 0]), bytes([0, 0, 255])
    base = red * (w * h)
    allt = [True] * (w * h)  # fully-transparent probe frame: shows the canvas
    gif = encode_gif_frames(
        w, h,
        [(0, 0, 0, w, h, base, None, 0),
         (0, 1, 1, 2, 2, green * 4, None, 2),   # shown, then rect -> background
         (0, 0, 0, w, h, red * (w * h), allt, 0),  # probe: canvas after disposal 2
         (0, 0, 0, 2, 2, blue * 4, None, 3),    # shown, then restore previous
         (0, 0, 0, w, h, red * (w * h), allt, 0)],  # probe: canvas after disposal 3
        bg_color=bg,
    )
    cw, ch, frames = decode_gif_frames(gif)
    assert len(frames) == 5
    # frame 2 shows the green patch over red
    shown = bytearray(base)
    for (px, py) in [(1, 1), (2, 1), (1, 2), (2, 2)]:
        o = 3 * (py * w + px)
        shown[o:o + 3] = green
    assert frames[1][1] == bytes(shown)
    # after disposal 2 the patch rect is background color
    after2 = bytearray(base)
    for (px, py) in [(1, 1), (2, 1), (1, 2), (2, 2)]:
        o = 3 * (py * w + px)
        after2[o:o + 3] = bg
    assert frames[2][1] == bytes(after2)
    # frame 4 draws blue at (0,0)-(1,1) over that canvas...
    shown4 = bytearray(after2)
    for (px, py) in [(0, 0), (1, 0), (0, 1), (1, 1)]:
        o = 3 * (py * w + px)
        shown4[o:o + 3] = blue
    assert frames[3][1] == bytes(shown4)
    # ...and disposal 3 rolls the canvas back for the final probe
    assert frames[4][1] == bytes(after2)


def _glyph_id_pdf(text: str, use_glyph_array: bool = False, tweak=None) -> bytes:
    """Hand-built Type0 PDF with NO /ToUnicode: text written as raw 2-byte
    glyph ids, unicode recoverable only via the embedded TrueType cmap."""
    from aide_spark.sources.truetype import build_minimal_font

    chars = sorted(set(text))
    charmap = {ord(c): i + 1 for i, c in enumerate(chars)}  # gid 0 = .notdef
    ttf = build_minimal_font(charmap, use_glyph_array=use_glyph_array)
    gids = b"".join(charmap[ord(c)].to_bytes(2, "big") for c in text)
    content = b"BT /F1 12 Tf <" + gids.hex().encode() + b"> Tj ET"

    def obj(n, body):
        return b"%d 0 obj\n" % n + body + b"\nendobj\n"

    desc_font = (
        b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Fake "
        b"/CIDToGIDMap /Identity /FontDescriptor 7 0 R >>"
    )
    if tweak == "no_identity":
        desc_font = desc_font.replace(b"/CIDToGIDMap /Identity ", b"/CIDToGIDMap 9 0 R ")
    pdf = (
        b"%PDF-1.4\n"
        + obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
        + obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
        + obj(3, b"<< /Type /Page /Parent 2 0 R "
                 b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>")
        + obj(4, b"<< /Length %d >>\nstream\n" % len(content) + content + b"\nendstream")
        + obj(5, b"<< /Type /Font /Subtype /Type0 /BaseFont /Fake "
                 b"/Encoding /Identity-H /DescendantFonts [6 0 R] >>")
        + obj(6, desc_font)
        + obj(7, b"<< /Type /FontDescriptor /FontName /Fake /FontFile2 8 0 R >>")
        + obj(8, b"<< /Length %d >>\nstream\n" % len(ttf) + ttf + b"\nendstream")
        + b"trailer\n<< /Size 9 /Root 1 0 R >>\n%%EOF\n"
    )
    return pdf


def test_pdf_cid_glyph_id_text_via_embedded_cmap():
    """r4 VERDICT missing #3: a Type0 font with NO /ToUnicode — text as raw
    glyph ids — decodes through the embedded TrueType cmap inverted (both
    format-4 branches). pypdf loses this text entirely."""
    from aide_spark.sources.pdf_codec import decode_pdf_bytes

    text = "Жирный текст 123"
    for uga in (False, True):
        spans = decode_pdf_bytes(_glyph_id_pdf(text, use_glyph_array=uga))
        assert spans is not None and spans[0]["text"] == text, uga


def test_pdf_cid_glyph_id_scope_limits():
    """Non-identity stream /CIDToGIDMap stays out of scope (default string
    decode, no crash); so does a descendant without /FontFile2."""
    from aide_spark.sources.pdf_codec import decode_pdf_bytes

    spans = decode_pdf_bytes(_glyph_id_pdf("abc", tweak="no_identity"))
    assert spans is not None  # decodes structurally; glyph text not mapped
    assert spans[0]["text"] != "abc"


@settings(max_examples=25, deadline=None)
@given(
    text=st.text(
        alphabet=st.characters(
            min_codepoint=0x21, max_codepoint=0x2FFF, codec="utf-8"
        ),
        min_size=1,
        max_size=30,
    ),
    uga=st.booleans(),
)
def test_pdf_glyph_id_round_trip_property(text, uga):
    """Property form: arbitrary BMP text survives the glyph-id encode →
    embedded-cmap decode round trip."""
    from aide_spark.sources.pdf_codec import decode_pdf_bytes

    spans = decode_pdf_bytes(_glyph_id_pdf(text, use_glyph_array=uga))
    assert spans is not None and spans[0]["text"] == text


@settings(max_examples=30, deadline=None)
@given(payload=st.binary(max_size=200))
def test_truetype_parser_never_raises(payload):
    from aide_spark.sources.truetype import gid_to_unicode, parse_cmap

    parse_cmap(payload)
    gid_to_unicode(b"\x00\x01\x00\x00" + payload)
    gid_to_unicode(b"ttcf" + payload)


@settings(max_examples=30, deadline=None)
@given(data=st.data())
def test_truetype_cmap_round_trip_property(data):
    """build_minimal_font → parse_cmap is the identity over random charmaps
    in all three emitted layouts (format-4 delta, format-4 glyphIdArray,
    format-12 groups)."""
    from aide_spark.sources.truetype import build_minimal_font, parse_cmap

    n = data.draw(st.integers(1, 25))
    cps = data.draw(
        st.lists(
            st.integers(0x21, 0xFFFE), min_size=n, max_size=n, unique=True
        )
    )
    gids = data.draw(
        st.lists(st.integers(1, 0xFFFF), min_size=n, max_size=n)
    )
    cm = dict(zip(cps, gids))
    assert parse_cmap(build_minimal_font(cm)) == cm
    assert parse_cmap(build_minimal_font(cm, use_glyph_array=True)) == cm
    assert parse_cmap(build_minimal_font(cm, format12=True)) == cm
