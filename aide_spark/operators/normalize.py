"""Text normalization for web-corpus dedup: NFC, control strip, ws collapse.

Exact-dedup and shingle-based near-dup keys are only meaningful after the
text is brought to one canonical Unicode form — the same rendered page
arrives as precomposed ``café`` from one crawler and ``cafe`` + U+0301
from another, and every hash downstream diverges unless NFC runs first.

* :func:`nfc_normalize_table` is the one Arrow-batched step (Unicode
  normalization has no Spark SQL builtin): ``mapInPandas`` over the
  vectorized ``Series.str.normalize('NFC')`` — no per-row Python, no
  shuffle, schema-preserving on the text column.
* :func:`strip_controls` / :func:`clean_whitespace` stay columnar
  (single ``regexp_replace`` each, whole-stage codegen).

Scale shape: a narrow map stage; pipelines into the scan with zero data
movement. The normalize pass is where a 100 TB corpus wants Arrow batch
sizes left to Spark's default (10k rows) — text rows are small and the
pandas call is C-backed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# C0 controls except \t \n \r, plus DEL
_CONTROL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"


def strip_controls(text: Column) -> Column:
    """Remove C0 control characters (keeping tab/newline/CR) and DEL."""
    return F.regexp_replace(text, _CONTROL_RE, "")


def clean_whitespace(text: Column) -> Column:
    """Collapse whitespace runs to single spaces and trim."""
    return F.trim(F.regexp_replace(text, r"\s+", " "))


def nfc_normalize_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Return ``docs`` with ``text_col`` NFC-normalized (same schema).

    Arrow-batched: each pandas batch normalizes the whole column with the
    vectorized ``str.normalize``; null-safe (nulls pass through).
    """
    schema = docs.schema

    def norm(it):
        for pdf in it:
            pdf[text_col] = pdf[text_col].str.normalize("NFC")
            yield pdf

    return docs.mapInPandas(norm, schema=schema)
