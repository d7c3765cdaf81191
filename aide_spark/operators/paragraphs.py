"""Paragraph-level deduplication (the CCNet shape).

Web corpora repeat *passages* far more than whole pages: navigation
blurbs, cookie banners, license boilerplate, syndicated intros. CCNet
(Wenzek et al. 2020, "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data", §3 — public paper) therefore hashes every
paragraph across the corpus and drops all but the first occurrence of
each duplicate, *before* any document-level dedup. This module is that
operator, Spark-first.

Semantics
---------
* a paragraph is one ``sep``-delimited chunk of ``text`` (default
  newline, the CCNet definition);
* its identity is the whitespace-collapsed, trimmed, lower-cased form
  (CCNet normalizes before hashing for the same reason);
* the *first* occurrence corpus-wide survives, ordered by
  ``(doc_id, position)`` — deterministic under any parallelism;
* paragraphs whose normalized form is empty are structure, not content:
  always kept, never counted as duplicates of each other;
* null/absent text behaves as one empty paragraph (the document must
  NOT vanish — the simhash32_table null-explode regression taught us
  that; see functions/hashing.py).

Scale shape (the part that matters at 100 TB)
---------------------------------------------
Three shuffles, all on keys whose cardinality grows with the corpus:

1. hash-aggregate on the normalized paragraph key computing the packed
   ``min(doc_id*POS_LIMIT + pos)`` winner — partial aggregation combines
   map-side, so the one paragraph that appears on a billion pages costs
   one long per map task, not a hot reduce partition;
2. sort-merge join of the paragraph table back to the winners on the
   same key (Spark reuses the exchange on the aggregate side);
3. hash-aggregate on ``doc_id`` to reassemble surviving paragraphs in
   original order (``array_sort`` of ``collect_list(struct(pos, ...))``
   — per-doc arrays, bounded by document size).

No window over the corpus, no driver collection, no Python. The winner
is a packed BIGINT rather than a struct ``min`` so a DuckDB oracle
reproduces it with plain integer arithmetic (DuckDB's ``arg_min``
rejects struct keys).

Reference scope note: the reference engine (ALabs-coder/aide) has no
corpus-level operators at all — each Lambda sees one document
(api/lambdas/processor/handler.py:72-135). Paragraph dedup is part of
the beyond-reference LLM-data surface (SURVEY.md §2.13).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Positions are packed as doc_id * POS_LIMIT + pos; documents with more
# paragraphs than this are rejected loudly rather than mis-ranked.
POS_LIMIT = 1_000_000


def normalize_paragraph(para: Column) -> Column:
    """CCNet-style paragraph identity: collapse runs of whitespace, trim,
    lower-case. Pure JVM string ops."""
    return F.lower(F.trim(F.regexp_replace(para, r"\s+", " ")))


def explode_paragraphs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """(id, pos, para, k) — one paragraph per row, 0-based position.

    ``coalesce(text, '')`` keeps null-text documents alive as a single
    empty paragraph instead of silently dropping them in the explode.
    """
    return docs.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), sep)
        ).alias("pos", "para"),
    ).withColumn("k", normalize_paragraph(F.col("para")))


def dedup_paragraphs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """Corpus-wide duplicated-paragraph removal with doc reassembly.

    Returns one row per input document:

    ``(id_col, n_paras BIGINT, n_kept BIGINT, text_deduped STRING)``

    where ``text_deduped`` is the surviving paragraphs re-joined with
    ``sep`` in their original order. Requires ``id_col`` to be integral
    (the winner rank packs it with the position).
    """
    paras = explode_paragraphs(docs, text_col, id_col, sep)
    packed = F.col(id_col).cast("long") * POS_LIMIT + F.col("pos")
    eligible = F.length("k") > 0

    winners = (
        paras.where(eligible)
        .groupBy("k")
        .agg(F.min(packed).alias("winner"))
    )

    kept_flag = (~eligible) | (packed == F.col("winner"))
    kept = (
        paras.join(winners, "k", "left")
        .withColumn("kept", kept_flag)
        .drop("winner", "k")
    )

    ordered = F.array_sort(
        F.collect_list(F.struct("pos", "kept", "para"))
    )
    return kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_paras"),
        F.sum(F.col("kept").cast("long")).alias("n_kept"),
        F.array_join(
            F.transform(
                F.filter(ordered, lambda x: x["kept"]),
                lambda x: x["para"],
            ),
            sep,
        ).alias("text_deduped"),
    )


def paragraph_duplication_profile(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """Per-document duplication profile WITHOUT rewriting the text: how
    much of each doc is corpus-duplicated paragraphs (chars in paragraphs
    whose normalized form occurs >1 times anywhere), as floor-ppm.

    The gate form of the operator — cheap to compute (no reassembly, no
    join back of the full text) and what a filtering pipeline actually
    thresholds on. Two hash aggregates: (k) then (doc).
    """
    paras = explode_paragraphs(docs, text_col, id_col, sep)
    counts = (
        paras.where(F.length("k") > 0)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("occ"))
    )
    joined = paras.join(counts, "k", "left")
    dup_chars = F.sum(
        F.when(F.col("occ") > 1, F.length("para")).otherwise(F.lit(0))
    )
    tot_chars = F.sum(F.length("para"))
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_paras"),
        F.sum(F.when(F.col("occ") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_dup_paras"),
        F.floor(
            dup_chars.cast("double")
            * 1_000_000.0
            / F.greatest(tot_chars, F.lit(1)).cast("double")
        )
        .cast("long")
        .alias("dup_char_ppm"),
    )
