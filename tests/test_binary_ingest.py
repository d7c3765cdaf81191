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
