"""Byte-pair-encoding subword tokenizer — learned merges, columnar encode.

Token *counting* for training-data budgeting needs a real subword
tokenizer, not a whitespace split: LLM corpus reports are in BPE tokens
(Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
Subword Units"; the GPT-2 merge formulation in Radford et al. 2019 —
public methods). This module trains a merge table at import time from an
inline seed corpus and encodes *columnarly* — no UDF, no Python in the
hot path, and an exact DuckDB oracle.

The trick that makes BPE a DataFrame expression
-----------------------------------------------
Encoding applies merges in learned rank order; merge k's pattern
components are produced only by merges < k, and merging two adjacent
symbols can never create a NEW adjacency for an earlier pair (it only
destroys adjacencies), so applying each merge exhaustively in rank order
is exactly the greedy lowest-rank-first loop of the reference
implementations. One merge applied exhaustively = one **literal**
replace-all over a delimited symbol string:

    word  →  "<h><e><l><l><o>"      (every symbol bracket-wrapped)
    merge (l,l):   replace("<l><l>", "<ll>")
    merge (ll,o):  replace("<ll><o>", "<llo>")

``replace`` scans left-to-right over non-overlapping occurrences in both
Spark (``F.replace``) and DuckDB (``replace``) — identical semantics,
no regex anchors, no capture groups, no lookaround. Tokens are
normalized to ``[a-z0-9]`` first, so ``<``/``>`` can never collide with
symbol text. An end-of-word marker ``$`` is appended (inside its own
bracket) so the model learns suffixes, as in Sennrich et al.

Scale shape
-----------
Encoding cost is per *distinct* token, not per occurrence:
``token_table`` → hash-aggregate on the token (map-side combining, same
key shape as every shingle pipeline here) → the ``N_MERGES``-deep
replace chain runs once per vocabulary word → counts join back by
equi-join. At 100 TB the distinct-token table is orders of magnitude
smaller than the corpus; the merge chain is a single JVM projection
(wide but shallow — Catalyst folds 60 nested replaces into one
whole-stage-codegen'd expression; if codegen ever exceeded the JIT
method limit Spark falls back to interpreted projection, still JVM).

Reference scope: beyond-reference LLM-data surface (SURVEY.md §2.13);
the reference has no tokenizer of any kind.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_MERGES = 60
EOW = "$"  # end-of-word marker symbol (normalized text is [a-z0-9] only)

# Inline seed corpus for merge training — original everyday prose plus a
# few high-frequency web/corpus words; enough for the classic merges
# (th, he, in, er, ing, the, and, ...) to emerge with stable ranks.
SEED_CORPUS = (
    "the quick brown fox jumps over the lazy dog and the dog runs back "
    "to the house where the children are reading their books in the "
    "evening light while their mother is cooking dinner and thinking "
    "about the morning train that was running late again because the "
    "winter storm had covered the northern line with snow and ice "
    "the committee is meeting on thursday to discuss the planning of "
    "the new building and the funding that the council is providing "
    "she was walking along the river looking at the boats and wondering "
    "whether the weather would be holding for the weekend sailing "
    "people are sharing pictures and writing comments about everything "
    "they are seeing and doing and the servers are storing all of it "
    "reading writing counting thinking learning teaching working playing "
    "the data processing system is handling the incoming documents and "
    "extracting the interesting content from the pages of the archive"
)


def _normalize_py(text: str) -> list[str]:
    import re

    return re.sub(r"[^a-z0-9]+", " ", text.lower()).split()


def _train_merges() -> list[tuple[str, str]]:
    """Standard BPE training (Sennrich et al. 2016 alg. 1): repeatedly
    merge the most frequent adjacent symbol pair over the seed vocabulary.
    Deterministic: ties break lexicographically."""
    vocab: Counter[tuple[str, ...]] = Counter()
    for w in _normalize_py(SEED_CORPUS):
        vocab[tuple(w) + (EOW,)] += 1

    merges: list[tuple[str, str]] = []
    for _ in range(N_MERGES):
        pairs: Counter[tuple[str, str]] = Counter()
        for sym, cnt in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += cnt
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0][0], kv[0][1]))
        a, b = best[0]
        merges.append((a, b))
        merged: Counter[tuple[str, ...]] = Counter()
        for sym, cnt in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            merged[tuple(out)] += cnt
        vocab = merged
    return merges


MERGES: list[tuple[str, str]] = _train_merges()


def encode_py(word: str) -> list[str]:
    """Python twin (tests + training parity): greedy rank-order merges."""
    sym = list(word) + [EOW]
    for a, b in MERGES:
        out: list[str] = []
        i = 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def _wrap(symbol_chars: Column) -> Column:
    """array<char> → '<c1><c2>...<cN><$>'."""
    return F.concat(
        F.array_join(
            F.transform(
                symbol_chars, lambda c: F.concat(F.lit("<"), c, F.lit(">"))
            ),
            "",
        ),
        F.lit("<" + EOW + ">"),
    )


def encode_expr(word: Column) -> Column:
    """The bracket-wrapped encoded form of a ``[a-z0-9]``-only word — the
    full merge chain as one nested literal-replace expression."""
    seq = _wrap(F.split(word, ""))
    for a, b in MERGES:
        seq = F.replace(
            seq, F.lit(f"<{a}><{b}>"), F.lit(f"<{a}{b}>")
        )
    return seq


def token_count_expr(encoded: Column) -> Column:
    """Number of BPE symbols in a wrapped encoding = count of '<'."""
    return (
        F.length(encoded) - F.length(F.replace(encoded, F.lit("<"), F.lit("")))
    ).cast("long")


def normalize_text(col) -> Column:
    return F.trim(F.regexp_replace(F.lower(col), "[^a-z0-9]+", " "))


def bpe_token_counts(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_words BIGINT, n_bpe_tokens BIGINT) per document.

    The merge chain runs once per DISTINCT token (vocabulary-sized work),
    then per-token subword counts join back to the occurrence table by
    equi-join and aggregate per doc. Null/empty docs survive with zeros.
    """
    toks = docs.select(
        id_col,
        F.explode(
            F.filter(
                F.split(normalize_text(F.col(text_col)), " "),
                lambda w: F.length(w) > 0,
            )
        ).alias("tok"),
    )
    vocab = (
        toks.select("tok")
        .distinct()
        .withColumn("n_sub", token_count_expr(encode_expr(F.col("tok"))))
    )
    per = (
        toks.join(vocab, "tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sub").cast("long").alias("n_bpe_tokens"),
        )
    )
    base = docs.select(id_col).join(per, id_col, "left")
    return base.select(
        id_col,
        F.coalesce(F.col("n_words"), F.lit(0)).cast("long").alias("n_words"),
        F.coalesce(F.col("n_bpe_tokens"), F.lit(0))
        .cast("long")
        .alias("n_bpe_tokens"),
    )


# ---------------------------------------------------------------------------
# DuckDB oracle fragments
# ---------------------------------------------------------------------------


def oracle_encode_sql(word_expr: str) -> str:
    """The identical merge chain over the identical wrapped form."""
    wrapped = (
        "list_aggregate(list_transform(string_split("
        + word_expr
        + ", ''), c -> '<' || c || '>'), 'string_agg', '')"
        + f" || '<{EOW}>'"
    )
    expr = wrapped
    for a, b in MERGES:
        expr = f"replace({expr}, '<{a}><{b}>', '<{a}{b}>')"
    return expr


def oracle_count_sql(encoded_expr: str) -> str:
    return (
        f"CAST(length({encoded_expr}) - "
        f"length(replace({encoded_expr}, '<', '')) AS BIGINT)"
    )
