"""Generator invariants: pure determinism (the whole correctness story rests
on gen_doc being a pure function of the index) and taxonomy coverage."""

from __future__ import annotations

from aide_spark.generator import CORRECT_PASSWORD, corpus, gen_doc, spans_to_pages


def test_gen_doc_is_pure():
    for i in (0, 1, 2, 3, 7, 11, 40, 999, 123456):
        assert gen_doc(i) == gen_doc(i), i


def test_taxonomy_and_banks_covered():
    docs = corpus(72)
    ids = [d["doc_id"] for d in docs]
    for prefix in ("UNION-", "CANARA-", "APGVB-", "BAD-CORRUPTED", "BAD-SCANNED",
                   "BAD-HYBRID", "BAD-ENCRYPTEDOK", "BAD-ENCRYPTEDWRONGPW",
                   "BAD-ENCRYPTEDNOPW", "BAD-LARGEFILE", "BAD-EMPTY", "BAD-MANYPAGES"):
        assert any(i.startswith(prefix) for i in ids), prefix


def test_span_offsets_dense_and_kinds_valid():
    for d in corpus(48):
        if d["spans"] is None:
            continue
        assert [s[3] for s in d["spans"]] == list(range(len(d["spans"])))
        assert all(s[0] in ("text", "media") for s in d["spans"])
        for kind, text, media, _ in d["spans"]:
            assert (kind == "media") == (media != "")


def test_encrypted_docs_carry_expected_passwords():
    for d in corpus(144):
        if d["doc_id"].startswith("BAD-ENCRYPTEDOK"):
            assert d["encrypted"] and d["password"] == CORRECT_PASSWORD
        if d["doc_id"].startswith("BAD-ENCRYPTEDNOPW"):
            assert d["encrypted"] and d["password"] is None


def test_pages_round_trip():
    d = gen_doc(0)
    pages = spans_to_pages(d["spans"])
    assert len(pages) >= 1
    assert all("\f" not in p for p in pages)
    n_breaks = sum(1 for s in d["spans"] if s[0] == "text" and s[1] == "\f")
    assert len(pages) == n_breaks + 1
