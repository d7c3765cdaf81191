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


# S6 — the Excel export surface (excel_formatter.py) as data, not bytes.
# The workbook's single sheet is re-expressed as CSV-writable rows carrying
# exactly the strings create_excel_workbook writes into cells; fonts become
# boolean styling flags. Presentation bytes (openpyxl) are out of scope —
# not in this environment, and styling is not data.

WORKBOOK_HEADERS = ["Txn Date", "Value Date", "Description", "Debit", "Credit", "Balance"]


def workbook_view(txns: DataFrame) -> DataFrame:
    """S6 — the worksheet of ``create_excel_workbook``
    (excel_formatter.py:65-162) as rows: ``row_num`` starts at 2 (row 1 is
    the header, exposed as :data:`WORKBOOK_HEADERS`); cell values are the
    ``format_transaction_for_display`` strings with the reference's
    ``value if value else ''`` empty-cell branch; ``debit_red`` /
    ``credit_green`` carry the conditional font styling
    (excel_formatter.py:126-136)."""
    f = format_transactions_for_ui(txns)
    return f.select(
        "doc_id",
        (F.col("order") + 1).cast("int").alias("row_num"),
        F.col("formatted_txn_date").alias("txn_date"),
        F.col("formatted_value_date").alias("value_date"),
        F.coalesce(F.col("Remarks"), F.lit("")).alias("description"),
        F.col("formatted_debit").alias("debit"),
        F.col("formatted_credit").alias("credit"),
        F.col("formatted_balance").alias("balance"),
        (F.col("formatted_debit") != "").alias("debit_red"),
        (F.col("formatted_credit") != "").alias("credit_green"),
    )


def statement_filename(
    meta: Column, job_id: Column, extension: str = "xlsx", today: Column | None = None
) -> Column:
    """``get_statement_filename`` (excel_formatter.py:13-63) as one
    expression: bank name cleaned (non-word chars dropped, spaces → '_'),
    statement period rendered ``%Y-%m-%d`` via parse-with-fallback (a date
    that fails ``%d/%m/%Y`` falls back to plain '/'→'-' replacement), last-4
    account suffix, and the reference's catch-all fallback
    ``bank_statement_<job_id>`` when there is no metadata at all.
    ``today`` pins the no-period branch (reference: ``datetime.now()``)."""
    bank = F.coalesce(meta.getField("bank_name"), F.lit("Bank"))
    # (?U): Java \w/\s are ASCII-only by default, Python's re are Unicode —
    # without the flag an accented bank name would lose letters the
    # reference keeps (r2 advisory)
    bank_clean = F.regexp_replace(
        py_strip(F.regexp_replace(bank, r"(?U)[^\w\s-]", "")), r"(?U)\s+", "_"
    )
    acct = meta.getField("account_number")
    fd = meta.getField("statement_period").getField("from_date")
    td = meta.getField("statement_period").getField("to_date")

    def _ymd(c: Column) -> Column:
        return F.date_format(F.try_to_date(c, "d/M/yyyy"), "yyyy-MM-dd")

    both = fd.isNotNull() & (fd != "") & td.isNotNull() & (td != "")
    date_range = (
        F.when(
            both & _ymd(fd).isNotNull() & _ymd(td).isNotNull(),
            F.concat(_ymd(fd), F.lit("_to_"), _ymd(td)),
        )
        .when(
            both,
            F.concat(
                F.replace(fd, F.lit("/"), F.lit("-")),
                F.lit("_to_"),
                F.replace(td, F.lit("/"), F.lit("-")),
            ),
        )
        .otherwise(
            F.date_format(
                today if today is not None else F.current_date(), "yyyy-MM-dd"
            )
        )
    )
    suffix = F.when(F.length(acct) >= 4, F.substring(acct, -4, 4)).otherwise(acct)
    named = F.when(
        acct.isNotNull() & (acct != ""),
        F.concat(
            bank_clean, F.lit("_Statement_AC_"), suffix, F.lit("_"),
            date_range, F.lit("." + extension),
        ),
    ).otherwise(
        F.concat(bank_clean, F.lit("_Statement_"), date_range, F.lit("." + extension))
    )
    return F.when(
        meta.isNull(), F.concat(F.lit("bank_statement_"), job_id, F.lit("." + extension))
    ).otherwise(named)
