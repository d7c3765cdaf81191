"""Formatter projections (§2.9 / lifecycle E2 — the read path's UI fields).

Re-expresses ``/root/reference/api/formatters/transaction_formatter.py``:

* :func:`convert_date_format` — DD/MM/YYYY ↔ DD-MM-YYYY by string surgery
  with zfill (transaction_formatter.py:11-55; deliberately NOT ``to_date`` —
  the malformed-input fallback is plain separator replacement);
* :func:`clean_amount` — strip (Dr)/(Cr)/(De) decorations
  (transaction_formatter.py:58-83; the reference's float-parse guard returns
  the cleaned string on BOTH branches, so it is a no-op — reproduced by
  simply not guarding);
* :func:`format_transactions_for_ui` — adds the formatted_* columns
  (transaction_formatter.py:118-162), handling the "new format" (Debit/Credit
  fields present ⇒ Canara/APGVB rows) vs "legacy" (Amount + Transaction_Type
  ⇒ Union rows) split via NULL-ness of the Debit/Credit columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .lines import py_strip

_CLEAN_RE = r"\s*\(?\s*(DR|dr|Dr|De|DE|de|CR|cr|Cr)\s*\)?\s*"


def convert_date_format(date: Column, sep_from: str = "/", sep_to: str = "-") -> Column:
    parts = F.split(date, "[" + sep_from + "]")
    converted = F.concat(
        F.lpad(F.element_at(parts, 1), 2, "0"), F.lit(sep_to),
        F.lpad(F.element_at(parts, 2), 2, "0"), F.lit(sep_to),
        F.element_at(parts, 3),
    )
    return (
        F.when(date.isNull() | (date == ""), F.lit(""))
        .when(F.size(parts) == 3, converted)
        .otherwise(F.replace(date, F.lit(sep_from), F.lit(sep_to)))
    )


def clean_amount(amount: Column) -> Column:
    return F.when(amount.isNull() | (amount == ""), F.lit("")).otherwise(
        py_strip(F.regexp_replace(amount, _CLEAN_RE, ""))
    )


def format_transactions_for_ui(txns: DataFrame) -> DataFrame:
    """TRANSACTIONS_OUT rows → + formatted_* columns (exact field set of
    transaction_formatter.py:140-160)."""
    new_format = F.col("Debit").isNotNull() | F.col("Credit").isNotNull()
    nz = lambda c: c.isNotNull() & (c != "")  # noqa: E731 — Python truthiness

    debit_amount = F.when(
        new_format,
        F.when(nz(F.col("Debit")), clean_amount(F.col("Debit"))).otherwise(F.lit("")),
    ).otherwise(
        F.when(F.col("Transaction_Type") == "Debit", clean_amount(F.col("Amount")))
        .otherwise(F.lit(""))
    )
    credit_amount = F.when(
        new_format,
        F.when(nz(F.col("Credit")), clean_amount(F.col("Credit"))).otherwise(F.lit("")),
    ).otherwise(
        F.when(F.col("Transaction_Type") == "Credit", clean_amount(F.col("Amount")))
        .otherwise(F.lit(""))
    )
    formatted_amount = F.when(
        new_format,
        # debit_amount or credit_amount or '' (Python string `or`)
        F.when(debit_amount != "", debit_amount)
        .when(credit_amount != "", credit_amount)
        .otherwise(F.lit("")),
    ).otherwise(clean_amount(F.col("Amount")))

    fdate = convert_date_format(F.col("Date"), "/", "-")
    return (
        txns.withColumn("formatted_txn_date", fdate)
        .withColumn("formatted_value_date", fdate)
        .withColumn("formatted_debit", debit_amount)
        .withColumn("formatted_credit", credit_amount)
        .withColumn("formatted_balance", clean_amount(F.col("Balance")))
        .withColumn("formatted_amount", formatted_amount)
        .withColumn("debit_amount", debit_amount)
        .withColumn("credit_amount", credit_amount)
    )
