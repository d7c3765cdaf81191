"""PII detection and redaction — columnar, Luhn-gated card matching.

Training-data pipelines scrub personally-identifying strings before
anything ships to a model. The detectors here are the standard public
regex shapes (emails, IPv4, E.164-ish phones, payment-card digit runs)
plus the Luhn mod-10 check (ISO/IEC 7812, public since 1960) so that
arbitrary 16-digit numbers (order ids, timestamps) are NOT redacted —
only checksum-valid card numbers are.

Everything is a single JVM projection per document:

* the regexes run in ``regexp_extract_all`` / ``regexp_replace``
  (whole-stage codegen, no Python);
* the Luhn check is a higher-order fold over the digit array
  (``transform`` with the (element, index) two-argument lambda — the
  index IS the second lambda variable in Spark's HOF calculus — then
  ``aggregate``);
* card redaction replaces each *validated* candidate via an
  ``aggregate`` fold of literal ``replace`` calls, so invalid digit
  runs survive untouched.

No lookaround anywhere (kept RE2-compatible so the same patterns can run
in DuckDB oracles and in any RE2-based scanner at the edge).

Scale shape: pure per-row projection — no shuffle, no state; prunes to
the text column; pipelines into whatever scan precedes it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"(?:\d{1,3}\.){3}\d{1,3}"
# international form only (leading +): domestic forms collide with card /
# id digit runs too often to redact unconditionally
PHONE_RE = r"\+\d{7,15}"
# 4x4 grouped (space/dash) or a bare 13-19 digit run; candidates are only
# redacted after the Luhn gate passes
CARD_RE = r"(?:\d{4}[ -]){3}\d{4}|\d{13,19}"


def luhn_valid(candidate: Column) -> Column:
    """Boolean Column: does the digit run (separators allowed) pass the
    Luhn mod-10 checksum? Pure expression — fold over the reversed digit
    array, doubling every second digit (index odd, 0-based from the
    right) and subtracting 9 when the double exceeds 9."""
    digits = F.filter(
        F.split(F.regexp_replace(candidate, r"[ -]", ""), ""), lambda c: c != ""
    )
    rev = F.reverse(digits)
    vals = F.transform(
        rev,
        lambda c, i: F.when(
            i % 2 == 1,
            F.when(c.cast("int") * 2 > 9, c.cast("int") * 2 - 9).otherwise(
                c.cast("int") * 2
            ),
        ).otherwise(c.cast("int")),
    )
    total = F.aggregate(vals, F.lit(0), lambda acc, x: acc + x)
    return (F.size(digits) >= 12) & (total % 10 == 0)


def valid_cards(text: Column) -> Column:
    """array<string> of Luhn-valid card candidates found in ``text``."""
    return F.filter(
        F.regexp_extract_all(text, F.lit(CARD_RE), 0), lambda c: luhn_valid(c)
    )


def pii_counts(text: Column) -> Column:
    """struct<n_emails, n_ips, n_phones, n_cards> of detector hit counts
    (cards = Luhn-valid only)."""
    return F.struct(
        F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), 0))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(text, F.lit(IPV4_RE), 0))
        .cast("long")
        .alias("n_ips"),
        F.size(F.regexp_extract_all(text, F.lit(PHONE_RE), 0))
        .cast("long")
        .alias("n_phones"),
        F.size(valid_cards(text)).cast("long").alias("n_cards"),
    )


def redact_pii(text: Column) -> Column:
    """Redacted copy of ``text``: emails → ``[EMAIL]``, Luhn-valid cards →
    ``[CARD]``, IPv4 → ``[IP]``, +phones → ``[PHONE]``.

    Order matters and is fixed: emails first (their local parts may
    contain digit runs), then cards (validated against the email-redacted
    text via a literal-``replace`` fold — regexp_replace cannot condition
    on the checksum), then IPs (dots keep them out of the card pattern),
    then phones (the ``+`` keeps them out of everything prior).
    """
    t1 = F.regexp_replace(text, EMAIL_RE, "[EMAIL]")
    t2 = F.aggregate(
        valid_cards(t1),
        t1,
        lambda acc, c: F.replace(acc, c, F.lit("[CARD]")),
    )
    t3 = F.regexp_replace(t2, IPV4_RE, "[IP]")
    return F.regexp_replace(t3, PHONE_RE, "[PHONE]")


def scan_documents(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_emails, n_ips, n_phones, n_cards, redacted) over a
    document table — one narrow projection, no shuffle."""
    c = pii_counts(F.col(text_col))
    return docs.select(
        "doc_id",
        c["n_emails"].alias("n_emails"),
        c["n_ips"].alias("n_ips"),
        c["n_phones"].alias("n_phones"),
        c["n_cards"].alias("n_cards"),
        redact_pii(F.col(text_col)).alias("redacted"),
    )
