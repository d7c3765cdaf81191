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


def test_pdf_codec_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        decode_pdf(b"%PDF-1.4 ...")
