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
