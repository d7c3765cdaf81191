"""Formatter parity: the Spark formatted_* columns must equal the REFERENCE's
format_transactions_for_ui output on the same parsed transactions (the module
is pure Python — imported directly as the oracle)."""

from __future__ import annotations

import sys

import pytest

from aide_spark.generator import corpus, local_corpus_df
from aide_spark.operators.formatters import format_transactions_for_ui
from aide_spark.plans import pipeline

from .reference_oracle import _import_reference, run_reference
from aide_spark.generator import spans_to_pages

FIELDS = [
    "formatted_txn_date", "formatted_value_date", "formatted_debit",
    "formatted_credit", "formatted_balance", "formatted_amount",
    "debit_amount", "credit_amount",
]


def _reference_formatter():
    _import_reference()  # ensures /root/reference/api on sys.path
    from formatters.transaction_formatter import format_transactions_for_ui as f

    return f


@pytest.fixture(scope="module")
def spark_formatted(spark):
    docs = local_corpus_df(spark, 24)
    txns = pipeline.run(docs)["transactions"]
    rows = format_transactions_for_ui(txns).collect()
    return {(r.doc_id, r.order): r for r in rows}


def test_formatted_fields_match_reference(spark_formatted):
    ref_fmt = _reference_formatter()
    checked = 0
    for d in corpus(24):
        if d["bank_id"] is None or (
            d["doc_id"].startswith("BAD-")
            and not d["doc_id"].startswith(("BAD-HYBRID", "BAD-ENCRYPTEDOK"))
        ):
            continue
        result = run_reference(d["bank_id"], spans_to_pages(d["spans"]))
        for order, txn in enumerate(ref_fmt(result["transactions"]), start=1):
            got = spark_formatted[(d["doc_id"], order)]
            for f in FIELDS:
                assert getattr(got, f) == txn[f], (d["doc_id"], order, f)
            checked += 1
    assert checked > 50
