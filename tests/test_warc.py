"""WARC reader/writer tests: round-trip across all three compression forms,
malformed-input quarantine behavior, HTTP message splitting, and the Spark
ingest path (file → records → dispatched spans). The cross-engine oracle for
the full fixture lives in test_oracle_queries (e2e_warc_ingest)."""

from __future__ import annotations

import gzip

from hypothesis import given, settings
from hypothesis import strategies as st

from aide_spark.sources.warc_codec import encode_warc, parse_warc

RECS = [
    {
        "rec_type": "response", "url": "http://a.test/x",
        "http_status": 200, "content_type": "text/html",
        "body": b"<html><body><p>hi</p></body></html>",
    },
    {
        "rec_type": "response", "url": "http://b.test/y",
        "http_status": 404, "content_type": "application/pdf",
        "body": b"%PDF-1.4 stub",
    },
    {"rec_type": "resource", "url": "http://c.test/z", "body": b"plain body"},
]


def test_roundtrip_all_compression_forms():
    for form in (None, "file", "record"):
        got = parse_warc(encode_warc(RECS, compress=form))
        assert [r["url"] for r in got] == [r["url"] for r in RECS]
        assert [r["body"] for r in got] == [r["body"] for r in RECS]
        assert got[0]["http_status"] == 200 and got[1]["http_status"] == 404
        assert got[0]["content_type"] == "text/html"
        assert got[2]["http_status"] is None and got[2]["content_type"] == ""
        assert [r["rec_idx"] for r in got] == [0, 1, 2]


def test_truncation_keeps_good_prefix_and_never_raises():
    for form in (None, "record"):
        full = encode_warc(RECS, compress=form)
        for cut in range(len(full)):
            got = parse_warc(full[:cut])
            assert len(got) <= 3
            for r in got:  # every returned record is complete and correct
                assert r["body"] == RECS[r["rec_idx"]]["body"]


def test_desync_stops_at_garbage_not_raises():
    good = encode_warc(RECS[:1], compress=None)
    assert len(parse_warc(good + b"GARBAGE NOT A RECORD\r\n\r\n")) == 1
    assert parse_warc(b"not a warc at all") == []
    assert parse_warc(b"") == []
    assert parse_warc(None) == []


def test_corrupt_gzip_member_keeps_prefix():
    members = [gzip.compress(encode_warc([r], compress=None)) for r in RECS]
    blob = members[0] + b"\x1f\x8b\x08CORRUPT" + members[2]
    got = parse_warc(blob)
    assert len(got) == 1 and got[0]["url"] == "http://a.test/x"


def test_http_split_edge_cases():
    # non-HTTP body passes through; headerless HTTP keeps raw
    recs = [{"rec_type": "resource", "url": "u", "body": b"HTTP/1.1 garbage"}]
    got = parse_warc(encode_warc(recs, compress=None))
    assert got[0]["http_status"] is None and got[0]["body"] == b"HTTP/1.1 garbage"


@settings(max_examples=50, deadline=None)
@given(st.binary(max_size=400))
def test_parse_never_raises_on_garbage(payload):
    for r in parse_warc(payload):
        assert isinstance(r["body"], bytes)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.fixed_dictionaries(
            {
                "rec_type": st.sampled_from(["response", "resource"]),
                "url": st.text(
                    alphabet=st.characters(min_codepoint=33, max_codepoint=126),
                    max_size=30,
                ),
                "body": st.binary(max_size=200),
            }
        ),
        max_size=5,
    ),
    st.sampled_from([None, "file", "record"]),
)
def test_property_roundtrip(recs, form):
    got = parse_warc(encode_warc(recs, compress=form))
    assert [r["body"] for r in got] == [bytes(r["body"]) for r in recs]
    assert [r["url"] for r in got] == [r["url"] for r in recs]


def test_ingest_warc_spark_dispatch_and_quarantine(spark):
    from aide_spark.sources.binary_ingest import encode_spans, ingest_warc

    recs = [
        {
            "rec_type": "response", "url": "http://a.test/1",
            "http_status": 200, "content_type": "text/html",
            "body": b"<html><body><p>"
            + " ".join(f"w{i}" for i in range(45)).encode()
            + b"</p></body></html>",
        },
        {
            "rec_type": "resource", "url": "http://a.test/2",
            "body": encode_spans([("text", "hello", "", 0)]),
        },
        {
            "rec_type": "response", "url": "http://a.test/3",
            "http_status": 200, "content_type": "application/pdf",
            "body": b"%PDF-1.4 but totally corrupt",
        },
    ]
    df = spark.createDataFrame(
        [("w0", encode_warc(recs, compress="record"))], "warc_id string, content binary"
    )
    rows = {r.url: r for r in ingest_warc(df).collect()}
    assert rows["http://a.test/1"].fmt == "html"
    assert [s.text for s in rows["http://a.test/1"].spans][0].startswith("w0 w1")
    assert rows["http://a.test/2"].fmt == "container"
    assert [s.text for s in rows["http://a.test/2"].spans] == ["hello"]
    assert rows["http://a.test/3"].fmt == "pdf"
    assert rows["http://a.test/3"].spans is None  # quarantine-by-null
