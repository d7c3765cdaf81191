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


def test_py_float_str_matches_python(spark):
    """serialize.py f-tag: Spark rendering == str(float) across the full
    plain-decimal band and both scientific boundaries (ADVICE r1: the old
    cast(double as string) emitted 1.0E7 for >=1e7)."""
    from pyspark.sql import functions as F

    from aide_spark.serialize import py_float_str

    vals = [
        0.0, 1.0, -1.0, 123.45, 9999999.99, 1e7, 10000000.5, -12345678.9,
        12345678901.23, 1e8 + 0.01, 123456789012345.6, 999999999999999.9,
        1e15, 1.5e15, 1e16, 1.5e16, 1e22,
        0.001, 0.0001, 0.00015, 9.999e-05, 1e-05, 1.5e-07, -2.5e-08,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    rows = df.select("v", py_float_str(F.col("v")).alias("s")).collect()
    for r in rows:
        assert r.s == str(r.v), (r.v, r.s)
