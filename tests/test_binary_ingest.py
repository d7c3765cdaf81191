"""S1 raw-binary ingest: spans → bytes → spans round-trip through the
Arrow-batched decoder, feeding the normal pipeline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aide_spark.generator import corpus, local_corpus_df
from aide_spark.plans import pipeline
from aide_spark.sources.binary_ingest import decode_pdf, encode_spans, ingest_binary


def test_round_trip_and_pipeline(spark):
    docs = [d for d in corpus(24) if d["spans"] is not None]
    binary = spark.createDataFrame(
        [(d["doc_id"], bytearray(encode_spans(d["spans"]))) for d in docs],
        "doc_id string, content binary",
    )
    decoded = ingest_binary(binary)
    got = {
        r.doc_id: [(s.kind, s.text, s.media_ref, s.offset) for s in r.spans]
        for r in decoded.collect()
    }
    for d in docs:
        assert got[d["doc_id"]] == [tuple(s) for s in d["spans"]], d["doc_id"]


def test_undecodable_payload_quarantined(spark):
    from aide_spark.operators.validation import validate

    binary = spark.createDataFrame(
        [("ok", bytearray("hello\nworld".encode())),
         ("bad", bytearray(b"\xff\xfe\x00\x9c invalid utf8 \x80"))],
        "doc_id string, content binary",
    )
    decoded = ingest_binary(binary).withColumn("bank_id", F.lit(None).cast("string")) \
        .withColumn("password", F.lit(None).cast("string")) \
        .withColumn("encrypted", F.lit(False)) \
        .withColumn("declared_size_mb", F.lit(0.1))
    val = {r.doc_id: r for r in validate(decoded).collect()}
    assert val["bad"].error_code == "CORRUPTED"
    assert val["ok"].is_valid or val["ok"].error_code == "VALID"


@pytest.mark.parametrize("compress", [True, False])
def test_pdf_codec_round_trip(compress):
    """decode_pdf(encode_pdf(spans)) == spans over the whole generator corpus
    (text lines incl. parens/backslashes, multi-page, media XObjects), both
    FlateDecode and raw streams."""
    from aide_spark.sources.pdf_codec import encode_pdf

    checked = 0
    for d in corpus(96):
        if d["spans"] is None:
            continue
        want = [
            {"kind": k, "text": t, "media_ref": m, "offset": i}
            for i, (k, t, m, _o) in enumerate(d["spans"])
        ]
        assert decode_pdf(encode_pdf(d["spans"], compress=compress)) == want, d["doc_id"]
        checked += 1
    assert checked > 60


def test_pdf_codec_escapes_and_structure():
    from aide_spark.schemas import PAGE_BREAK
    from aide_spark.sources.pdf_codec import encode_pdf

    spans = [
        ("text", r"paren ( and ) and \ backslash", "", 0),
        ("text", "", "", 1),  # empty line survives
        ("media", "", "img://a b/(1)/x", 2),  # ref needs #xx name escapes
        ("text", PAGE_BREAK, "", 3),
        ("text", "page two", "", 4),
    ]
    got = decode_pdf(encode_pdf(spans))
    assert [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in got] == spans


def test_pdf_codec_rejects_garbage():
    assert decode_pdf(b"not a pdf") is None
    assert decode_pdf(b"%PDF-1.4\njunk without objects") is None
    # truncated stream: structurally broken -> quarantine, not crash
    from aide_spark.generator import gen_doc
    from aide_spark.sources.pdf_codec import encode_pdf

    pdf = encode_pdf(gen_doc(0)["spans"])
    assert decode_pdf(pdf[: len(pdf) // 3]) in (None, [])


def test_pdf_codec_stream_tail_bytes():
    """r2 advisory (high): stream data whose last byte is 0x0d must not be
    trimmed by the EOL-before-endstream heuristic — /Length slices exactly."""
    import zlib

    from aide_spark.sources.pdf_codec import _stream_data

    payload = b"raw data ending in CR\r"
    body = (b"<< /Length %d >>\nstream\n" % len(payload)) + payload + b"\nendstream"
    assert _stream_data(body, {}) == payload

    z = zlib.compress(b"content stream bytes")
    body = (
        b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(z)
    ) + z + b"\nendstream"
    assert _stream_data(body, {}) == b"content stream bytes"
    # no /Length at all: Flate data is never EOL-trimmed (zlib tolerates tail)
    body = b"<< /Filter /FlateDecode >>\nstream\n" + z + b"\nendstream"
    assert _stream_data(body, {}) == b"content stream bytes"
    # indirect /Length resolves through the object table
    body = b"<< /Length 9 0 R >>\nstream\n" + payload + b"\nendstream"
    assert _stream_data(body, {9: b" %d " % len(payload)}) == payload


def test_unescape_name_truncated_escape():
    """r2 advisory (low): a truncated one-digit '#x' at end-of-name must pass
    through literally, not parse as a 1-digit hex byte."""
    from aide_spark.sources.pdf_codec import _unescape_name

    assert _unescape_name(b"abc#4") == "abc#4"
    assert _unescape_name(b"abc#") == "abc#"
    assert _unescape_name(b"a#20b") == "a b"


@pytest.mark.parametrize("password", [None, "pw x"])
def test_pdf_codec_object_streams_round_trip(password):
    """PDF 1.5: non-stream objects packed in /Type /ObjStm + binary /XRef
    stream (no classic trailer) must round-trip, plain and encrypted."""
    from aide_spark.sources.pdf_codec import decode_pdf_bytes_ex, encode_pdf

    checked = 0
    for d in corpus(24):
        if d["spans"] is None:
            continue
        want = [
            {"kind": k, "text": t, "media_ref": m, "offset": i}
            for i, (k, t, m, _o) in enumerate(d["spans"])
        ]
        pdf = encode_pdf(d["spans"], password=password, object_streams=True)
        assert pdf.startswith(b"%PDF-1.5") and b"trailer" not in pdf
        got, status = decode_pdf_bytes_ex(pdf, password)
        assert (status, got) == ("OK", want), d["doc_id"]
        checked += 1
    assert checked > 12


def test_pdf_codec_foreign_object_stream_fixture():
    """Hand-built ObjStm fixture with a layout the encoder never produces
    (objects out of numeric order inside the stream, multi-space pair
    separators, catalog itself packed) — proves the decoder parses the spec
    shape, not just its own output."""
    import zlib

    from aide_spark.sources.pdf_codec import decode_pdf_bytes

    # packed objects: 1=catalog, 2=pages, 4=page (content stays top-level 3)
    page = b"<< /Type /Page /Parent 2 0 R /Contents 3 0 R >>"
    pages = b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>"
    catalog = b"<< /Type /Catalog /Pages 2 0 R >>"
    bodies = [(4, page), (1, catalog), (2, pages)]  # deliberately unordered
    offs, cur = [], 0
    for _n, b_ in bodies:
        offs.append(cur)
        cur += len(b_) + 1
    header = b"  ".join(  # double-space separators are legal whitespace
        b"%d  %d" % (n, o) for (n, _), o in zip(bodies, offs)
    )
    payload = header + b"\n" + b"\n".join(b_ for _n, b_ in bodies)
    stm = zlib.compress(payload)
    content = b"BT (from objstm fixture) Tj ET"
    out = bytearray(b"%PDF-1.5\n")
    out += (
        b"3 0 obj\n<< /Length %d >>\nstream\n" % len(content)
        + content + b"\nendstream\nendobj\n"
    )
    out += (
        b"5 0 obj\n<< /Type /ObjStm /N 3 /First %d /Filter /FlateDecode "
        b"/Length %d >>\nstream\n" % (len(header) + 1, len(stm))
        + stm + b"\nendstream\nendobj\n"
    )
    out += b"startxref\n0\n%%EOF\n"  # no classic trailer at all
    got = decode_pdf_bytes(bytes(out))
    assert got == [
        {"kind": "text", "text": "from objstm fixture", "media_ref": "", "offset": 0}
    ]


def test_rc4_known_answer_vectors():
    """Pin the hand-rolled RC4 against published test vectors (no crypto
    library in the sandbox, so the primitive is verified by known answers)."""
    from aide_spark.sources.pdf_codec import _rc4

    assert _rc4(b"Key", b"Plaintext") == bytes.fromhex("BBF316E8D940AF0AD3")
    assert _rc4(b"Wiki", b"pedia") == bytes.fromhex("1021BF0420")
    assert _rc4(b"Secret", b"Attack at dawn") == bytes.fromhex(
        "45A01F645FC35B383552544B9BF5"
    )
    # RC4 is its own inverse
    assert _rc4(b"Key", _rc4(b"Key", b"round trip")) == b"round trip"


def test_aes_known_answer_vectors():
    """Pin the from-scratch AES against FIPS-197 appendix C and NIST SP
    800-38A F.2 (CBC) known answers."""
    from aide_spark.sources.aes import (
        cbc_decrypt, cbc_encrypt, decrypt_block, encrypt_block,
    )

    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    k128 = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    k256 = bytes.fromhex(
        "000102030405060708090a0b0c0d0e0f101112131415161718191a1b1c1d1e1f"
    )
    assert encrypt_block(pt, k128) == bytes.fromhex(
        "69c4e0d86a7b0430d8cdb78070b4c55a"
    )  # FIPS-197 C.1
    assert encrypt_block(pt, k256) == bytes.fromhex(
        "8ea2b7ca516745bfeafc49904b496089"
    )  # FIPS-197 C.3
    assert decrypt_block(encrypt_block(pt, k128), k128) == pt
    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    iv = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    data = bytes.fromhex("6bc1bee22e409f96e93d7e117393172a")
    ct = cbc_encrypt(data, key, iv, pad=False)
    assert ct == bytes.fromhex("7649abac8119b246cee98e9b12e9197d")  # F.2.1
    assert cbc_decrypt(ct, key, iv, unpad=False) == data
    for n in (0, 1, 15, 16, 17, 33):  # PKCS#7 round trip incl. boundaries
        assert cbc_decrypt(cbc_encrypt(bytes(range(n)), key, iv), key, iv) == bytes(
            range(n)
        )
    assert cbc_decrypt(b"short", key, iv) is None  # malformed → quarantine


@pytest.mark.parametrize(
    "cipher,rev,compress",
    [
        ("rc4", 2, True),
        ("rc4", 2, False),
        ("rc4", 3, True),
        ("aesv2", 4, True),
        ("aesv3", 6, True),
    ],
)
def test_pdf_codec_encrypted_round_trip(cipher, rev, compress):
    """decode(encode(spans, password)) == spans across the generator corpus
    for every standard-security-handler variant — RC4 revisions 2 (40-bit)
    and 3 (128-bit), AESV2 (V=4/R=4, AES-128-CBC) and AESV3 (V=5/R=6,
    AES-256 + SHA-2 hardened hash); wrong/missing passwords report the
    reference's quarantine codes."""
    from aide_spark.sources.pdf_codec import decode_pdf_bytes_ex, encode_pdf

    checked = 0
    for d in corpus(36):
        if d["spans"] is None:
            continue
        want = [
            {"kind": k, "text": t, "media_ref": m, "offset": i}
            for i, (k, t, m, _o) in enumerate(d["spans"])
        ]
        pdf = encode_pdf(
            d["spans"], compress=compress, password="pw-" + d["doc_id"],
            security_rev=rev if cipher == "rc4" else 2, cipher=cipher,
        )
        got, status = decode_pdf_bytes_ex(pdf, "pw-" + d["doc_id"])
        assert (status, got) == ("OK", want), d["doc_id"]
        # trimmed-password retry (pdf_validator.py:113-134)
        got_t, status_t = decode_pdf_bytes_ex(pdf, "  pw-" + d["doc_id"] + " ")
        assert (status_t, got_t) == ("OK", want)
        assert decode_pdf_bytes_ex(pdf)[1] == "ENCRYPTED_NO_PASSWORD"
        assert decode_pdf_bytes_ex(pdf, "")[1] == "ENCRYPTED_NO_PASSWORD"
        assert decode_pdf_bytes_ex(pdf, "nope")[1] == "WRONG_PASSWORD"
        checked += 1
        if checked >= (4 if cipher != "rc4" else 8):  # pure-python AES cost
            break
    assert checked == (4 if cipher != "rc4" else 8)


def test_pdf_codec_encrypted_no_plaintext_leak():
    from aide_spark.sources.pdf_codec import encode_pdf

    spans = [("text", "TOP SECRET BALANCE 12,345.67", "", 0)]
    assert b"TOP SECRET" not in encode_pdf(spans, password="x", compress=False)
    # owner password differing from user password still authenticates user
    from aide_spark.sources.pdf_codec import decode_pdf_bytes_ex

    pdf = encode_pdf(spans, password="user", owner_password="owner")
    got, status = decode_pdf_bytes_ex(pdf, "user")
    assert status == "OK" and got[0]["text"] == spans[0][1]


def test_encrypted_pdf_e2e_quarantine(spark):
    """binaryFile-shaped REAL encrypted bytes → ingest_binary_pdf → validate:
    correct password extracts, wrong password / no password quarantine with
    the reference's codes — V4 exercised on actual RC4-encrypted PDFs."""
    from aide_spark.operators.validation import validate
    from aide_spark.sources.binary_ingest import ingest_binary_pdf
    from aide_spark.sources.pdf_codec import encode_pdf

    doc = next(d for d in corpus(8) if d["spans"] is not None)
    pdf = encode_pdf(doc["spans"], password="hunter2")
    rows = [
        ("good", bytearray(pdf), "hunter2"),
        ("padded", bytearray(pdf), " hunter2  "),  # trimmed retry
        ("wrong", bytearray(pdf), "letmein"),
        ("missing", bytearray(pdf), None),
        ("plain", bytearray(encode_pdf(doc["spans"])), None),
        ("garbage", bytearray(b"%PDF-1.4 not really"), None),
        ("notpdf", bytearray(b"GIF89a definitely an image"), None),
    ]
    binary = spark.createDataFrame(
        rows, "doc_id string, content binary, password string"
    )
    decoded = ingest_binary_pdf(binary, password_col="password").withColumn(
        "declared_size_mb", F.lit(0.1)
    )
    val = {r.doc_id: r for r in validate(decoded).collect()}
    assert val["good"].error_code == "VALID" and val["good"].is_valid
    assert val["padded"].error_code == "VALID"
    assert val["wrong"].error_code == "WRONG_PASSWORD"
    assert val["missing"].error_code == "ENCRYPTED_NO_PASSWORD"
    assert val["plain"].error_code == "VALID"
    assert val["garbage"].error_code == "CORRUPTED"  # %PDF magic, broken inside
    assert val["notpdf"].error_code == "NOT_PDF"  # magic-bytes gate (V1)
    spans = {
        r.doc_id: [(s.kind, s.text, s.media_ref, s.offset) for s in r.spans]
        for r in decoded.collect()
        if r.spans is not None
    }
    assert spans["good"] == [tuple(s) for s in doc["spans"]]
    assert spans["padded"] == spans["good"] == spans["plain"]


def test_build_raw_docs_real_files(spark, tmp_path):
    """spark-submit entry's binaryFile branch: real .pdf files on disk,
    declared_size_mb from the ACTUAL file length (r2 advisory: the 25 MB
    gate must be able to fire), passwords joined from a side parquet,
    encrypted docs really decrypted / quarantined through the pipeline."""
    import sys

    sys.path.insert(0, "/root/repo/scripts")
    from run_extraction import build_raw_docs

    from aide_spark.operators.validation import validate
    from aide_spark.sources.pdf_codec import encode_pdf

    doc = next(d for d in corpus(8) if d["spans"] is not None)
    pdf_dir = tmp_path / "pdfs"
    pdf_dir.mkdir()
    (pdf_dir / "UNION-enc.pdf").write_bytes(encode_pdf(doc["spans"], password="pw1"))
    (pdf_dir / "UNION-plain.pdf").write_bytes(encode_pdf(doc["spans"]))
    (pdf_dir / "CANARA-nopw.pdf").write_bytes(encode_pdf(doc["spans"], password="pw2"))
    pw_path = str(tmp_path / "pw.parquet")
    spark.createDataFrame(
        [("UNION-enc", "pw1")], "doc_id string, password string"
    ).write.parquet(pw_path)

    docs = build_raw_docs(spark, str(pdf_dir), pw_path)
    rows = {r.doc_id: r for r in docs.collect()}
    real_mb = len(encode_pdf(doc["spans"], password="pw1")) / 1048576.0
    assert abs(rows["UNION-enc"].declared_size_mb - real_mb) < 1e-9
    assert rows["UNION-enc"].decode_status == "OK"
    assert rows["CANARA-nopw"].decode_status == "ENCRYPTED_NO_PASSWORD"
    val = {r.doc_id: r for r in validate(docs).collect()}
    assert val["UNION-enc"].error_code == "VALID"
    assert val["UNION-plain"].error_code == "VALID"
    assert val["CANARA-nopw"].error_code == "ENCRYPTED_NO_PASSWORD"
    # oversized declared size trips the gate now that it is real
    big = docs.sparkSession.createDataFrame(
        [("big", [{"kind": "text", "text": "x", "media_ref": "", "offset": 0}],
          "OK", 26.0)],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>, decode_status string, "
        "declared_size_mb double",
    )
    assert validate(big).collect()[0].error_code == "FILE_TOO_LARGE"


def test_pdf_ingest_through_pipeline(spark):
    """binaryFile-shaped input of REAL PDFs → decode_pdf → validate → parse:
    spans_out must equal the direct span-table path end-to-end."""
    from aide_spark.sources.pdf_codec import encode_pdf

    docs = [d for d in corpus(24) if d["spans"] is not None]
    binary = spark.createDataFrame(
        [(d["doc_id"], bytearray(encode_pdf(d["spans"]))) for d in docs],
        "doc_id string, content binary",
    )
    aux = local_corpus_df(spark, 24).select(
        "doc_id", "bank_id", "password", "encrypted", "declared_size_mb", "pdf_meta"
    )
    decoded = ingest_binary(binary, decoder=decode_pdf).join(aux, "doc_id")
    via_pdf = pipeline.run(decoded)["spans_out"]
    direct = pipeline.run(local_corpus_df(spark, 24).where(F.col("spans").isNotNull()))[
        "spans_out"
    ]
    assert via_pdf.exceptAll(direct).count() == 0
    assert direct.exceptAll(via_pdf).count() == 0


def test_passthrough_column_missing_fails_on_driver(spark):
    """r4 advisory: a passthrough name absent from the input must raise a
    clear driver-side ValueError naming it — not a KeyError inside the
    Arrow worker at execution time."""
    import pytest

    from aide_spark.sources.binary_ingest import ingest_binary_pdf
    from aide_spark.sources.pdf_codec import encode_pdf

    df = spark.createDataFrame(
        [("d1", bytearray(encode_pdf([("text", "x", "", 0)])))],
        "doc_id string, content binary",
    )
    with pytest.raises(ValueError, match="no_such_col"):
        ingest_binary_pdf(df, passthrough=["no_such_col"])


def test_v7_metadata_probe_on_raw_bytes(spark):
    """r3 VERDICT #5 closed end-to-end: an ENCRYPTED PDF with a UTF-16BE
    /Info dict → ingest_binary_pdf(with_metadata=True) → the V7 probe
    (pdf_metadata_struct) — title decodes, the empty /Author truthy-drops."""
    from aide_spark.operators.validation import extract_pdf_metadata
    from aide_spark.sources.binary_ingest import ingest_binary_pdf
    from aide_spark.sources.pdf_codec import encode_pdf

    meta = {"/Title": "Última relación 報告", "/Author": "", "/Producer": "aide"}
    pdf = encode_pdf(
        [("text", "x", "", 0)], metadata=meta, password="pw", cipher="aesv2"
    )
    df = spark.createDataFrame(
        [("d1", bytearray(pdf), "pw")],
        "doc_id string, content binary, password string",
    )
    decoded = ingest_binary_pdf(df, password_col="password", with_metadata=True)
    assert decoded.select("decode_status").first()[0] == "OK"
    row = extract_pdf_metadata(decoded).collect()[0]
    assert row.title == "Última relación 報告"
    assert row.author is None  # truthy-drop: '' → NULL (pdf_validator.py:258)
    assert row.producer == "aide"
    assert row.subject is None


def test_build_raw_docs_carries_real_info_metadata(spark, tmp_path):
    """The spark-submit raw branch now fills pdf_meta from the real /Info
    dict (decrypted), so the V7 probe works on deployed raw files."""
    import sys

    sys.path.insert(0, "/root/repo/scripts")
    from run_extraction import build_raw_docs

    from aide_spark.operators.validation import extract_pdf_metadata
    from aide_spark.sources.pdf_codec import encode_pdf

    doc = next(d for d in corpus(8) if d["spans"] is not None)
    pdf_dir = tmp_path / "pdfs"
    pdf_dir.mkdir()
    meta = {"/Title": "Relevé – 報告", "/Author": ""}
    (pdf_dir / "UNION-m.pdf").write_bytes(
        encode_pdf(doc["spans"], metadata=meta, password="pw", cipher="aesv2")
    )
    pw_path = str(tmp_path / "pw.parquet")
    spark.createDataFrame(
        [("UNION-m", "pw")], "doc_id string, password string"
    ).write.parquet(pw_path)

    docs = build_raw_docs(spark, str(pdf_dir), pw_path)
    row = extract_pdf_metadata(docs).collect()[0]
    assert row.title == "Relevé – 報告"
    assert row.author is None  # truthy-drop


def test_incremental_update_inherits_info_from_prev_trailer():
    """Incrementally-updated PDFs append a new trailer that may omit /Info,
    relying on the /Prev chain; /Info must come from the newest trailer that
    defines one instead of silently vanishing (ADVICE r4)."""
    from aide_spark.sources.pdf_codec import decode_pdf_metadata, encode_pdf

    meta = {"/Title": "Quarterly Report", "/Author": "Ops"}
    base = encode_pdf([("text", "hello", "", 0)], metadata=meta)
    update = (
        b"\nxref\n0 0\ntrailer\n<< /Size 9 /Root 1 0 R /Prev "
        + str(base.rfind(b"startxref")).encode()
        + b" >>\nstartxref\n"
        + str(len(base) + 1).encode()
        + b"\n%%EOF\n"
    )
    assert b"/Info" not in update  # the final trailer really omits it
    got = decode_pdf_metadata(base + update)
    assert got is not None
    assert got["/Title"] == "Quarterly Report" and got["/Author"] == "Ops"
