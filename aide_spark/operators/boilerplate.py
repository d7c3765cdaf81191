"""HTML main-content extraction: boilerplate strip as pure columnar Spark.

The north rule's HTML leg.  Pipeline shape (one shuffle end-to-end):

1. ``segment_html`` — Arrow-batched ``mapInPandas`` over raw HTML payloads
   running the from-scratch tokenizer (sources/html_codec.py): linear
   per-doc byte work, zero shuffle, variable fan-out to one row per
   text/media block.
2. ``classify_blocks`` — the boilerpipe *NumWordsRulesClassifier*
   (Kohlschütter, Fankhauser, Nejdl, "Boilerplate Detection using Shallow
   Text Features", WSDM 2010 — public method; the published decision-tree
   thresholds are the constants below) expressed entirely in Spark SQL:
   link density per block, previous/next text-block features via
   IGNORE-NULLS window frames (media rows sit in the same ordered frame
   without breaking the text chain), plus the DOM heuristic
   (``skip_ancestor`` from nav/aside/footer/header/form).  One
   ``hash(doc_id)`` exchange + one sort; no UDF, no self-join.
3. ``main_content_spans`` — keeps content text blocks and non-furniture
   media rows, assigns ordinal offsets with a ``row_number`` over the SAME
   partitioning+ordering (the filter preserves the sort, so Catalyst reuses
   the exchange — no second shuffle), and emits the interleaved span schema
   ``(doc_id, offset, kind, text, media_ref)``.

At 100 TB: the tokenizer fan-out is bounded by bytes (blocks ≪ bytes), the
single exchange partitions by doc_id (no skew beyond document size itself —
a pathological one-doc giant is bounded upstream by the V2-style size gate),
and the window state per doc is O(1) rows in flight.  The reference engine
(api/, PDF-only) has no HTML surface; constants and method are from the
public boilerpipe paper.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Published NumWordsRulesClassifier thresholds (boilerpipe, WSDM 2010).
MAX_LINK_DENSITY = 0.33     # denser-linked blocks are always boilerplate
PREV_LINK_DENSITY = 0.555   # switches between the two word-count branches
CURR_WORDS_LO, NEXT_WORDS_LO, PREV_WORDS_LO = 16, 15, 4   # low-LD branch
CURR_WORDS_HI, NEXT_WORDS_HI = 40, 17                     # high-LD branch

BLOCK_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("block_idx", LongType()),
        StructField("kind", StringType()),
        StructField("text", StringType()),
        StructField("n_words", LongType()),
        StructField("n_anchor_words", LongType()),
        StructField("skip_ancestor", BooleanType()),
        StructField("media_ref", StringType()),
    ]
)


def segment_html(pages: DataFrame) -> DataFrame:
    """(doc_id, payload binary) -> flat block table (BLOCK_SCHEMA).

    Arrow-batched; executors need PYTHONPATH to import aide_spark (same
    deployment contract as every mapInPandas operator in this engine).
    """

    def run(batches):
        import pandas as pd

        from ..sources.html_codec import tokenize_blocks

        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                for b in tokenize_blocks(bytes(payload)):
                    rows.append(
                        (
                            int(did), b["block_idx"], b["kind"], b["text"],
                            b["n_words"], b["n_anchor_words"],
                            b["skip_ancestor"], b["media_ref"],
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in BLOCK_SCHEMA.fields])

    return pages.mapInPandas(run, schema=BLOCK_SCHEMA)


LINK_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("link_idx", LongType()),
        StructField("href", StringType()),
        StructField("anchor_text", StringType()),
    ]
)


def extract_outlinks(pages: DataFrame) -> DataFrame:
    """(doc_id, payload binary) -> outlink table (LINK_SCHEMA): the
    web-graph primitive over the same from-scratch scanner rules as
    ``segment_html`` (html_codec.extract_links).  Arrow-batched, zero
    shuffle — link extraction parallelism is scan parallelism, and the
    downstream graph aggregations (outdegree, host joins) are plain
    groupBy/joins on the emitted table."""

    def run(batches):
        import pandas as pd

        from ..sources.html_codec import extract_links

        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                for li in extract_links(bytes(payload)):
                    rows.append(
                        (int(did), li["link_idx"], li["href"], li["anchor_text"])
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in LINK_SCHEMA.fields])

    return pages.mapInPandas(run, schema=LINK_SCHEMA)


def classify_blocks(blocks: DataFrame) -> DataFrame:
    """Add link_density / prev-next features / is_content, fully columnar.

    Media rows keep their slot in the per-doc ordering but are transparent
    to the text chain: the prev/next features use IGNORE-NULLS frames over
    text-only values, so ``<p>…</p><img…><p>…</p>`` classifies exactly like
    the img-free sequence (boilerpipe's behavior, which looks only at text
    blocks).  Media is_content = NOT skip_ancestor (furniture images — nav
    icons, footer badges — are boilerplate; in-flow figures are content).
    """
    w = Window.partitionBy("doc_id").orderBy("block_idx")
    prev_f = w.rowsBetween(Window.unboundedPreceding, -1)
    next_f = w.rowsBetween(1, Window.unboundedFollowing)

    is_text = F.col("kind") == "text"
    ld = F.when(
        is_text & (F.col("n_words") > 0),
        F.round(F.col("n_anchor_words") / F.col("n_words"), 6),
    )  # NULL on media rows keeps them out of the IGNORE-NULLS chain
    out = (
        blocks.withColumn("link_density", ld)
        .withColumn("_tw", F.when(is_text, F.col("n_words")))
        .withColumn("prev_nw", F.coalesce(F.last("_tw", True).over(prev_f), F.lit(0)))
        .withColumn("next_nw", F.coalesce(F.first("_tw", True).over(next_f), F.lit(0)))
        .withColumn(
            "prev_ld",
            F.coalesce(F.last("link_density", True).over(prev_f), F.lit(0.0)),
        )
    )
    dense = F.when(
        F.col("prev_ld") <= F.lit(PREV_LINK_DENSITY),
        (F.col("n_words") > CURR_WORDS_LO)
        | (F.col("next_nw") > NEXT_WORDS_LO)
        | (F.col("prev_nw") > PREV_WORDS_LO),
    ).otherwise(
        (F.col("n_words") > CURR_WORDS_HI) | (F.col("next_nw") > NEXT_WORDS_HI)
    )
    is_content = F.when(
        is_text,
        (~F.col("skip_ancestor"))
        & (F.col("link_density") <= F.lit(MAX_LINK_DENSITY))
        & dense,
    ).otherwise(~F.col("skip_ancestor"))
    return out.withColumn("is_content", is_content).drop("_tw")


def label_blocks_py(blocks: list[dict]) -> list[bool]:
    """Pure-Python twin of :func:`classify_blocks` for the per-document
    paths (mixed-format ingest, streaming) — same published constants, same
    media-transparent text chain. Batch/local agreement is property-pinned
    by tests/test_html.py::test_py_twin_matches_columnar, the engine's
    standard twin contract (cf. the P10 streaming classifier)."""
    text_blocks = [b for b in blocks if b["kind"] == "text"]
    lds = [
        round(b["n_anchor_words"] / b["n_words"], 6) if b["n_words"] else 0.0
        for b in text_blocks
    ]
    labels: dict[int, bool] = {}
    for i, b in enumerate(text_blocks):
        prev_nw = text_blocks[i - 1]["n_words"] if i else 0
        next_nw = text_blocks[i + 1]["n_words"] if i + 1 < len(text_blocks) else 0
        prev_ld = lds[i - 1] if i else 0.0
        if prev_ld <= PREV_LINK_DENSITY:
            dense = (
                b["n_words"] > CURR_WORDS_LO
                or next_nw > NEXT_WORDS_LO
                or prev_nw > PREV_WORDS_LO
            )
        else:
            dense = b["n_words"] > CURR_WORDS_HI or next_nw > NEXT_WORDS_HI
        labels[id(b)] = (
            not b["skip_ancestor"] and lds[i] <= MAX_LINK_DENSITY and dense
        )
    return [
        labels[id(b)] if b["kind"] == "text" else not b["skip_ancestor"]
        for b in blocks
    ]


def main_content_spans(blocks: DataFrame) -> DataFrame:
    """Classified blocks -> interleaved spans (doc_id, offset, kind, text,
    media_ref), offset = 0-based ordinal among kept spans per doc."""
    kept = classify_blocks(blocks).where(F.col("is_content"))
    w = Window.partitionBy("doc_id").orderBy("block_idx")
    return kept.select(
        "doc_id",
        (F.row_number().over(w) - 1).cast("long").alias("offset"),
        "kind",
        "text",
        "media_ref",
    )
