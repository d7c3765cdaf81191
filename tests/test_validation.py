"""V1-V10: the validator taxonomy (FIXTURES.md §1.1 — mirrors the reference's
8-fixture corpus, /root/reference/tests/test_pdf_validator.py:37-46) must
yield the same error codes / pdf types as pdf_validator.py."""

from __future__ import annotations

import pytest

from aide_spark.generator import local_corpus_df
from aide_spark.operators.validation import validate

EXPECTED = {
    "BAD-CORRUPTED": ("CORRUPTED", "invalid", False),
    "BAD-SCANNED": ("NO_TEXT_CONTENT", "scanned", False),
    "BAD-HYBRID": ("VALID", "hybrid", True),
    "BAD-ENCRYPTEDOK": ("VALID", "text", True),
    "BAD-ENCRYPTEDWRONGPW": ("WRONG_PASSWORD", "invalid", False),
    "BAD-ENCRYPTEDNOPW": ("ENCRYPTED_NO_PASSWORD", "invalid", False),
    "BAD-LARGEFILE": ("FILE_TOO_LARGE", "invalid", False),
    "BAD-EMPTY": ("EMPTY_PDF", "invalid", False),
    "BAD-MANYPAGES": ("TOO_MANY_PAGES", "invalid", False),
}


@pytest.fixture(scope="module")
def results(spark):
    docs = local_corpus_df(spark, 72)
    return {r.doc_id: r for r in validate(docs).collect()}


def test_taxonomy_error_codes(results):
    checked = 0
    for doc_id, r in results.items():
        for prefix, (code, pdf_type, is_valid) in EXPECTED.items():
            if doc_id.startswith(prefix + "-"):
                assert (r.error_code, r.pdf_type, r.is_valid) == (
                    code, pdf_type, is_valid,
                ), doc_id
                checked += 1
    assert checked >= 9  # two taxonomy cycles in 72 docs


def test_bank_docs_all_valid(results):
    for doc_id, r in results.items():
        if not doc_id.startswith("BAD-"):
            assert r.is_valid and r.error_code == "VALID", doc_id
            assert r.pdf_type == "text", doc_id


def test_page_and_text_metrics(results):
    many = next(r for d, r in results.items() if d.startswith("BAD-MANYPAGES"))
    assert many.page_count == 251
    empty = next(r for d, r in results.items() if d.startswith("BAD-EMPTY"))
    assert empty.page_count == 0
    scanned = next(r for d, r in results.items() if d.startswith("BAD-SCANNED"))
    assert scanned.text_length < 100
