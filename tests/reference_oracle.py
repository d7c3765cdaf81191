"""Test oracle: run the REFERENCE extractors (from /root/reference, read-only)
directly on synthesized page text, and render their output through the shared
canonical span serializer.

The reference imports ``pypdf`` at module level but all of its parsing logic
operates on extracted page TEXT; we stub ``pypdf`` with a no-op module and
feed a fake reader whose pages return our generator's text. This runs the
reference's own code as the golden oracle without copying any of it.

A FRESH extractor instance is used per document, pinning the APGVB
``_previous_balance`` state to the documented fresh-instance behavior
(apgvb_extractor.py:821-824,856-859 — first record compares against 0.0),
which is exactly what ``lag(balance, 1, 0.0)`` reproduces.
"""

from __future__ import annotations

import sys
import types

from aide_spark.generator import spans_to_pages
from aide_spark.serialize import reference_spans


def _install_pypdf_stub() -> None:
    if "pypdf" in sys.modules:
        return
    mod = types.ModuleType("pypdf")
    errors = types.ModuleType("pypdf.errors")

    class PdfReadError(Exception):
        pass

    errors.PdfReadError = PdfReadError
    mod.errors = errors
    mod.PdfReader = object  # never constructed by the oracle path
    sys.modules["pypdf"] = mod
    sys.modules["pypdf.errors"] = errors


def _import_reference():
    _install_pypdf_stub()
    if "/root/reference/api" not in sys.path:
        sys.path.insert(0, "/root/reference/api")
    import extractors  # noqa: F401  (package __init__ pulls in all three)

    return sys.modules["extractors"]


class FakePage:
    def __init__(self, text: str):
        self._text = text

    def extract_text(self) -> str:
        return self._text


class FakeReader:
    is_encrypted = False

    def __init__(self, pages: list[str]):
        self.pages = [FakePage(t) for t in pages]


def run_reference(bank_id: str, pages: list[str]) -> dict:
    """Mirror extract_complete_statement's post-decrypt body per bank
    (union:76-93, canara:76-94, apgvb:367-385) on a fresh instance."""
    ext_pkg = _import_reference()
    if bank_id == "UNION":
        ext = ext_pkg.UnionBankExtractor()
        ext.statement_metadata = ext._extract_statement_metadata(
            pages[0] if pages else ""
        )
    elif bank_id == "CANARA":
        ext = ext_pkg.CanaraBankExtractor()
        ext.statement_metadata = ext._extract_statement_metadata(
            pages[0] if pages else ""
        )
    elif bank_id == "APGVB":
        ext = ext_pkg.APGVBExtractor()
        ext.statement_metadata = ext._extract_statement_metadata(FakeReader(pages))
    else:
        raise ValueError(bank_id)
    ext.transactions = ext._extract_all_transactions(FakeReader(pages))
    ext.financial_summary = ext._calculate_financial_summary()
    return {
        "total_transactions": len(ext.transactions),
        "statement_metadata": ext.statement_metadata,
        "financial_summary": ext.financial_summary,
        "transactions": ext.transactions,
    }


def expected_spans(doc: dict) -> list[tuple]:
    """Golden span sequence [(seq, kind, text, media_ref)] for one generator
    document, per the shared canonical serialization."""
    pages = spans_to_pages(doc["spans"])
    result = run_reference(doc["bank_id"], pages)
    media = [(m, off) for (k, _t, m, off) in doc["spans"] if k == "media"]
    return reference_spans(result, media)
