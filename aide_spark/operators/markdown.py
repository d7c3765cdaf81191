"""Span → Markdown serialization (the extraction pipeline's export format).

LLM training corpora want extracted documents as *markdown*, not span
structs: every public extraction stack (trafilatura's output modes,
IBM Docling, Common Crawl derivatives) serializes main content to
markdown because downstream tokenizers treat it as plain text with
cheap structure. This module renders the engine's canonical span model
— the north rule's ``(doc_id, offset, kind, text, media_ref)`` rows —
into one markdown string per document, plus a GFM table renderer for
the structured-cell output of ``layout.table_cells``.

Rendering rules (deterministic, order-preserving):

* ``kind='text'``  → the span text as its own paragraph;
* ``kind='media'`` → a GFM image reference ``![](media_ref)``;
* spans join with one blank line (``\\n\\n``) in ``offset`` order —
  the markdown paragraph separator;
* table cells become a GFM pipe table: header row, ``| --- |``
  delimiter row, then body rows, cells in column order.

No escaping pass: span text comes out of the engine's own extractors
(word tokens, not user markup); a corpus that needs ``|``/``#`` escaping
would add one ``regexp_replace`` in the same projection.

Scale shape: per-document ``collect_list`` + ``array_sort`` — the same
bounded-by-document-size aggregate the span assembly stage already does
(plans/pipeline.py); one shuffle on ``doc_id`` (or on
``(doc_id, row)`` then ``doc_id`` for tables), no window over the
corpus, no UDF, no driver collection.

Reference scope: the reference's only export formats are JSON and an
Excel workbook (api/formatters/excel_formatter.py:65-162); markdown is
part of the beyond-reference LLM-data surface (SURVEY.md §2.13).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def span_to_markdown(kind: Column, text: Column, media_ref: Column) -> Column:
    """One span's markdown fragment — a single ``when`` ladder."""
    return (
        F.when(kind == "media", F.concat(F.lit("!["), F.lit("]("), media_ref, F.lit(")")))
        .otherwise(F.coalesce(text, F.lit("")))
    )


def render_markdown(
    spans: DataFrame,
    id_col: str = "doc_id",
    offset_col: str = "offset",
) -> DataFrame:
    """Exploded span rows → ``(id_col, n_spans BIGINT, markdown STRING)``.

    Spans are re-ordered by ``offset`` inside the per-doc aggregate
    (``array_sort`` of ``struct(offset, fragment)``), so the input may
    arrive in any partition order — determinism under parallelism is the
    same contract the span-assembly stage pins in test_plans.
    """
    frag = span_to_markdown(
        F.col("kind"), F.col("text"), F.col("media_ref")
    )
    rows = spans.select(
        id_col,
        F.struct(
            F.col(offset_col).alias("o"), frag.alias("md")
        ).alias("s"),
    )
    ordered = F.array_sort(F.collect_list("s"))
    return rows.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.array_join(
            F.transform(ordered, lambda s: s["md"]), "\n\n"
        ).alias("markdown"),
    )


def render_markdown_table(
    cells: DataFrame,
    id_col: str = "doc_id",
    row_col: str = "row",
    col_col: str = "col",
    text_col: str = "cell_text",
) -> DataFrame:
    """Structured cells → ``(id_col, n_rows BIGINT, n_cols BIGINT,
    markdown STRING)`` as a GFM pipe table.

    Two bounded aggregates: ``(doc, row)`` assembles each line with cells
    in column order, then ``doc`` assembles lines in row order and splices
    the ``| --- |`` delimiter after the header. Ragged rows are padded
    implicitly by whatever columns exist — GFM renderers accept it.
    """
    line = (
        cells.select(
            id_col,
            F.col(row_col).alias("r"),
            F.struct(
                F.col(col_col).alias("c"),
                F.coalesce(F.col(text_col), F.lit("")).alias("t"),
            ).alias("cell"),
        )
        .groupBy(id_col, "r")
        .agg(
            F.count(F.lit(1)).alias("nc"),
            F.concat(
                F.lit("| "),
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list("cell")),
                        lambda c: c["t"],
                    ),
                    " | ",
                ),
                F.lit(" |"),
            ).alias("md_row"),
        )
    )
    ordered = F.array_sort(F.collect_list(F.struct("r", "md_row")))
    delim = F.concat(
        F.lit("|"), F.repeat(F.lit(" --- |"), F.col("n_cols").cast("int"))
    )
    assembled = line.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.max("nc").alias("n_cols"),
        ordered.alias("lines"),
    )
    header = F.element_at(F.col("lines"), 1)["md_row"]
    body = F.transform(
        F.slice(F.col("lines"), 2, F.greatest(F.size("lines") - 1, F.lit(0))),
        lambda s: s["md_row"],
    )
    markdown = F.concat(
        header,
        F.lit("\n"),
        delim,
        F.when(
            F.size("lines") > 1,
            F.concat(F.lit("\n"), F.array_join(body, "\n")),
        ).otherwise(F.lit("")),
    )
    return assembled.select(
        id_col,
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_cols").cast("long").alias("n_cols"),
        markdown.alias("markdown"),
    )
