"""Portable hashing primitives for dedup/fingerprinting, built ONLY from
``md5`` + array higher-order functions so every operator has a bit-identical
DuckDB oracle (both engines return the same lowercase-hex md5).

MinHash here uses the hex STRING ordering of ``md5(seed || ':' || shingle)``
as the permutation — taking the minimum over the 128-bit hash value is the
standard min-wise independent permutation trick, and lexicographic order on
fixed-width hex equals numeric order.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column) -> Column:
    """Whitespace word tokens of lowercased text."""
    return F.split(F.lower(text), r"\s+")


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct n-word shingles (space-joined)."""
    toks = tokens(text)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - n + 1, F.lit(1))),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )
    )


# NB (perf): MinHash signatures are deliberately NOT provided as a single
# array expression — CollapseProject inlines such an expression into every
# consumer (band keys, join sides), re-evaluating the whole shingle transform
# N×H times. The scalable form is explode(shingles) + H min() aggregates; see
# queries.dedup_minhash_lsh. Array-expression lambdas must also be 1-arg —
# a 2-arg lambda (even via default args) receives the array INDEX as the
# second lambda variable.


def token_hash32(tok: Column) -> Column:
    """First 8 hex chars of md5 as a 32-bit integer (portable: DuckDB
    ``CAST('0x'||substr(md5(t),1,8) AS BIGINT)``)."""
    return F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")


def simhash32(toks: Column) -> Column:
    """32-bit SimHash over word tokens: per-bit majority vote of the tokens'
    32-bit hashes. Pure higher-order expressions, zero UDF."""
    vals = F.transform(toks, token_hash32)
    # (v >> b) & 1 expressed arithmetically — F.shiftright needs a literal
    # shift, but the shift is the lambda variable here; exact for v < 2^32
    bit_of = lambda v, b: (  # noqa: E731
        (v / F.pow(F.lit(2.0), b.cast("double"))).cast("long") % 2
    )
    bit_scores = F.transform(
        F.sequence(F.lit(0), F.lit(31)),
        lambda b: F.aggregate(
            vals,
            F.lit(0).cast("long"),
            lambda acc, v: acc + bit_of(v, b) * 2 - 1,
        ),
    )
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(31)),
        F.lit(0).cast("long"),
        lambda acc, b: acc
        + F.when(
            F.element_at(bit_scores, (b + 1).cast("int")) > 0,
            F.pow(F.lit(2.0), b.cast("double")).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )


def normalized_fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of lowercased, whitespace-collapsed text."""
    return F.md5(F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")))


def simhash32_table(docs, text_col: str = "text", id_col: str = "doc_id"):
    """(id, simhash) as a DataFrame — the SCALE form of :func:`simhash32`:
    explode tokens, hash each ONCE, then 32 per-bit sum aggregates and a
    final fingerprint assembly. The single-expression form above re-hashes
    every token per bit under CollapseProject (the same trap as MinHash —
    measured ~6× slower end-to-end); this form is one shuffle on the doc id
    with map-side partial aggregation. Bit-identical output — including
    NULL-text docs: ``explode`` of a null array emits no rows (the doc would
    silently vanish), so ``explode_outer`` keeps one null-token row whose
    null hash makes every per-bit sum NULL → fingerprint 0, exactly what the
    expression form returns for null text."""
    toks = docs.select(id_col, F.explode_outer(tokens(F.col(text_col))).alias("t"))
    hashed = toks.select(id_col, token_hash32(F.col("t")).alias("hv"))
    # r6: the 32 per-bit aggregates and the fingerprint CASE chain are built
    # as F.expr SQL text — the per-bit Column construction cost ~1 s of py4j
    # round trips per call; identical expressions (same coercions: hv is
    # BIGINT, so & and the *2-1 stay BIGINT; an all-NULL doc sums to NULL
    # per bit and the CASE's NULL>0 branch yields fingerprint 0, as before)
    # one struct-valued aggregate expression = ONE SQL parse + py4j round
    # trip for all 32 bit sums (32 separate F.expr calls cost ~0.16 s of
    # construction per query; identical rows, A/B-verified)
    agg_sql = (
        "struct("
        + ", ".join(
            f"sum((shiftright(hv, {b}) & 1) * 2 - 1) as b{b}" for b in range(32)
        )
        + ")"
    )
    fp_sql = " + ".join(
        f"(CASE WHEN bs.b{b} > 0 THEN CAST({1 << b} AS BIGINT)"
        " ELSE CAST(0 AS BIGINT) END)"
        for b in range(32)
    )
    return (
        hashed.groupBy(id_col)
        .agg(F.expr(agg_sql).alias("bs"))
        .select(id_col, F.expr(fp_sql).alias("simhash"))
    )
