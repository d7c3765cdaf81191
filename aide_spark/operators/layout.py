"""Page-layout reconstruction: reading order + table/figure regions,
as columnar Spark over positioned runs.

The north star names both legs explicitly — "an interval-tree/bbox-sort
reading-order algorithm and a rules-based boilerplate classifier expressed
as batched columnar ops" plus "table/figure region detection".  The HTML
half lives in operators/boilerplate.py; this module is the PDF-layout half,
built on :func:`pdf_codec.extract_positioned_runs` (the from-scratch text-
matrix tracker).

Everything after the per-doc decode is DataFrame expressions:

* **Column detection** is the projection-profile method (the horizontal
  step of the classic recursive XY-cut, Nagy & Seth 1984 — public method):
  each run's x-extent is exploded into coarse bins, covered bins are
  deduplicated, and a ``lag`` over bin order finds vertical whitespace
  gaps wider than ``min_gap_bins`` — each gap's midpoint is a column
  boundary.  The "interval tree" of the bbox-sort formulation degenerates
  to exactly this binned sweep when expressed set-at-a-time: explode +
  distinct + lag IS the interval overlap query, shared across all pages in
  one pass instead of per-page tree walks.
* **Run → column assignment** joins each page's (tiny) sorted boundary
  array back and counts boundaries left of the run origin with a
  higher-order ``filter`` — no per-row Python, no fan-out join.
* **Reading order** is then one ``row_number`` per page ordered by
  (column, -y, x) — top-to-bottom within the left column, then the next
  column, the Manhattan-layout contract.
* **Table detection** groups runs into lines (rounded y), collects each
  line's sorted x-origin grid, and calls a line tabular when it has ≥
  ``min_cols`` aligned origins shared with an adjacent line
  (``array_intersect`` against ``lag``/``lead``) — consecutive tabular
  lines merge into regions by the gaps-and-islands rank difference.  This
  is the alignment-graph table heuristic of pdfplumber/Tabula ("lattice of
  shared x-positions"), set-at-a-time.
* **Figure regions** pair media runs with the nearest caption-looking text
  line below (``Figure``/``Table``/``Fig.`` prefix) via an IGNORE-NULLS
  window — the same frame trick as the boilerplate classifier.

Scale shape: decode is mapInPandas (zero shuffle); every operator after it
is ONE hash(doc_id[, page]) exchange reused by its windows.  The bin
explode fans out ~(page width / bin_w) rows per run — a bounded constant
(~50), far below the shingle explodes the engine already runs at 100 TB.

Width estimate: runs carry origins + font size but no glyph metrics, so
x-extents use ``char_w × size × len(text)`` with the monospace-ish default
0.6 — an explicit, tunable heuristic (exact metrics would need embedded
font width tables; pdfplumber reads the same tables, which is why its
bboxes are exact).  Column GAPS at body-text scale are an order of
magnitude wider than the estimate's error, which is what detection
actually depends on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RUN_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("page", IntegerType()),
        StructField("x", DoubleType()),
        StructField("y", DoubleType()),
        StructField("size", DoubleType()),
        StructField("kind", StringType()),
        StructField("text", StringType()),
        StructField("media_ref", StringType()),
    ]
)

CHAR_W = 0.6  # width-per-char as a fraction of font size (heuristic, above)


def positioned_runs(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """(doc_id, pdf payload) → RUN_SCHEMA rows via the from-scratch
    text-matrix tracker. Arrow-batched; undecodable docs emit nothing."""
    import pandas as pd

    from ..sources.pdf_codec import extract_positioned_runs

    def batches(it):
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                for r in extract_positioned_runs(bytes(payload)):
                    rows.append(
                        (
                            int(doc_id), r["page"], r["x"], r["y"], r["size"],
                            r["kind"], r["text"], r["media_ref"],
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in RUN_SCHEMA.fields])

    return df.mapInPandas(batches, schema=RUN_SCHEMA)


def run_width():
    """Estimated run width: CHAR_W × font size × char count (module note)."""
    return F.lit(CHAR_W) * F.col("size") * F.length("text")


def column_boundaries(
    runs: DataFrame,
    bin_w: float = 12.0,
    min_gap_bins: int = 2,
    keys: tuple = ("doc_id", "page"),
) -> DataFrame:
    """Projection-profile column split: (*keys, boundary_x) rows, one per
    vertical whitespace gap wider than ``min_gap_bins`` bins.  ``keys``
    widens to (doc_id, page, band) for the banded XY-cut variant."""
    ks = list(keys)
    ext = runs.where(F.col("kind") == "text").select(
        *ks,
        F.floor(F.col("x") / bin_w).cast("long").alias("b0"),
        F.floor((F.col("x") + run_width()) / bin_w).cast("long").alias("b1"),
    )
    cov = ext.select(*ks, F.explode(F.sequence("b0", "b1")).alias("bin")).distinct()
    w = Window.partitionBy(*ks).orderBy("bin")
    return (
        cov.withColumn("prev_bin", F.lag("bin").over(w))
        .where(F.col("bin") - F.col("prev_bin") > min_gap_bins)
        .select(
            *ks,
            ((F.col("prev_bin") + 1 + F.col("bin")) / 2.0 * bin_w).alias("boundary_x"),
        )
    )


def reading_order(
    runs: DataFrame, bin_w: float = 12.0, min_gap_bins: int = 2
) -> DataFrame:
    """Assign each run its Manhattan reading position: column index (count
    of boundaries left of the run origin), then row_number over
    (column, -y, x) per page → ``reading_idx`` (0-based)."""
    bounds = (
        column_boundaries(runs, bin_w, min_gap_bins)
        .groupBy("doc_id", "page")
        .agg(F.sort_array(F.collect_list("boundary_x")).alias("bnds"))
    )
    joined = runs.join(bounds, ["doc_id", "page"], "left").withColumn(
        "col",
        F.coalesce(
            F.size(F.filter("bnds", lambda b: b < F.col("x"))), F.lit(0)
        ).cast("int"),
    )
    w = Window.partitionBy("doc_id", "page").orderBy(
        "col", F.col("y").desc(), "x"
    )
    return joined.withColumn(
        "reading_idx", (F.row_number().over(w) - 1).cast("long")
    ).drop("bnds")


def reading_order_banded(
    runs: DataFrame,
    bin_w: float = 12.0,
    min_gap_bins: int = 2,
    span_frac: float = 0.55,
) -> DataFrame:
    """One-level recursive XY-cut: full-width runs (titles, footers — width
    estimate > ``span_frac`` of the page's occupied width) are horizontal
    CUTS that split the page into vertical bands; column detection then
    runs independently per band, and reading order is (band top-down,
    column, -y, x).  This is the case the flat :func:`reading_order`
    cannot express — a spanning title bridges the inter-column whitespace,
    so a page-level projection profile sees no gap; cutting at spanners
    first restores it.  (Full XY-cut recurses further; one level covers the
    dominant title/columns/footer composition — documented limit.)

    Still fully columnar: page width and the spanner cumsum are windows
    over the SAME hash(doc_id, page) exchange; per-band boundaries reuse
    :func:`column_boundaries` with the band in the key."""
    wp = Window.partitionBy("doc_id", "page")
    wy = wp.orderBy(F.col("y").desc(), "x")
    is_text = F.col("kind") == "text"
    ext = F.col("x") + run_width()
    tagged = (
        runs.withColumn("_pw", F.max(F.when(is_text, ext)).over(wp))
        .withColumn(
            "is_span", is_text & (run_width() > F.lit(span_frac) * F.col("_pw"))
        )
        .withColumn(
            "_c",
            F.sum(F.col("is_span").cast("int")).over(
                wy.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        # spanner rows sit in their OWN band between the neighbors' bands
        .withColumn(
            "band",
            (F.col("_c") * 2 - F.col("is_span").cast("int")).cast("long"),
        )
    )
    bounds = (
        column_boundaries(
            tagged.where(~F.col("is_span")),
            bin_w,
            min_gap_bins,
            keys=("doc_id", "page", "band"),
        )
        .groupBy("doc_id", "page", "band")
        .agg(F.sort_array(F.collect_list("boundary_x")).alias("bnds"))
    )
    joined = tagged.join(bounds, ["doc_id", "page", "band"], "left").withColumn(
        "col",
        F.coalesce(
            F.size(F.filter("bnds", lambda b: b < F.col("x"))), F.lit(0)
        ).cast("int"),
    )
    wr = Window.partitionBy("doc_id", "page").orderBy(
        "band", "col", F.col("y").desc(), "x"
    )
    return (
        joined.withColumn("reading_idx", (F.row_number().over(wr) - 1).cast("long"))
        .drop("bnds", "_pw", "_c")
    )


def _tabular_lines(
    runs: DataFrame, min_cols: int = 3, y_grid: float = 1.0
) -> DataFrame:
    """Shared front half of table detection: snap runs into lines (rounded
    y), flag a line tabular when it has ≥ ``min_cols`` x-origins and shares
    ≥ ``min_cols`` of them with the previous OR next line (array_intersect
    on lag/lead — alignment must repeat to be a table, one wide line is
    not), then merge consecutive tabular lines into islands via the
    rank-difference trick.  Returns one row per TABULAR line:
    (doc_id, page, yl, xs, y, line_text, grp)."""
    lines = (
        runs.where(F.col("kind") == "text")
        .groupBy(
            "doc_id", "page", F.round(F.col("y") / y_grid).cast("long").alias("yl")
        )
        .agg(
            F.sort_array(F.collect_set(F.round("x", 1))).alias("xs"),
            F.max("y").alias("y"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("x", "text"))),
                    lambda s: s["text"],
                ),
                " ",
            ).alias("line_text"),
        )
    )
    w = Window.partitionBy("doc_id", "page").orderBy(F.col("yl").desc())
    empty = F.array().cast("array<double>")
    prev_xs = F.coalesce(F.lag("xs").over(w), empty)
    next_xs = F.coalesce(F.lead("xs").over(w), empty)
    shared_prev = F.size(F.array_intersect("xs", prev_xs))
    shared_next = F.size(F.array_intersect("xs", next_xs))
    core = (F.size("xs") >= min_cols) & (
        (shared_prev >= min_cols) | (shared_next >= min_cols)
    )
    # a short line (missing cells) still belongs when EVERY origin it has
    # aligns with an adjacent full-width line — a 2-origin row inside a
    # 4-column table attaches; a free paragraph line (1 origin, or origins
    # off the grid) does not
    attach = (F.size("xs") >= 2) & (
        ((shared_prev == F.size("xs")) & (F.size(prev_xs) >= min_cols))
        | ((shared_next == F.size("xs")) & (F.size(next_xs) >= min_cols))
    )
    flagged = lines.withColumn("is_tab", core | attach)
    # gaps-and-islands: consecutive tabular lines share (rn_all - rn_tab)
    rn_all = F.row_number().over(w)
    rn_tab = F.row_number().over(
        Window.partitionBy("doc_id", "page", "is_tab").orderBy(F.col("yl").desc())
    )
    return (
        flagged.withColumn("grp", rn_all - rn_tab)
        .where(F.col("is_tab"))
        .drop("is_tab")
    )


def table_regions(
    runs: DataFrame, min_cols: int = 3, y_grid: float = 1.0
) -> DataFrame:
    """Detect tabular regions (see :func:`_tabular_lines` for the method).

    Returns one row per region: (doc_id, page, region_id within page,
    n_rows, n_cols = max aligned origins, y_top, y_bottom)."""
    grouped = _tabular_lines(runs, min_cols, y_grid)
    regions = grouped.groupBy("doc_id", "page", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.max(F.size("xs")).cast("long").alias("n_cols"),
        F.max("y").alias("y_top"),
        F.min("y").alias("y_bottom"),
    )
    wr = Window.partitionBy("doc_id", "page").orderBy(F.col("y_top").desc())
    return regions.select(
        "doc_id",
        "page",
        (F.row_number().over(wr) - 1).cast("long").alias("region_id"),
        "n_rows",
        "n_cols",
        "y_top",
        "y_bottom",
    )


def table_cells(
    runs: DataFrame,
    min_cols: int = 3,
    y_grid: float = 1.0,
    x_tol: float = 0.05,
    x_cluster: float = 10.0,
) -> DataFrame:
    """Structured cell extraction: region detection (:func:`_tabular_lines`)
    followed by cell assignment —

    1. each region's COLUMN GRID is the sorted distinct union of its lines'
       x-origins (so a row with a missing cell still lands its survivors in
       the right columns — positional rank within the line would not),
       with origins closer than ``x_cluster`` merged into one column (a
       wrapped or slightly-indented run keeps its cell);
    2. row index = dense_rank of the line's snapped y, top-down within the
       region;
    3. every run on a tabular line joins back by (doc, page, yl) and takes
       ``col`` = count of grid origins ≤ x + ``x_tol``, minus 1;
    4. runs sharing a cell (wrapped text) concatenate left-to-right.

    Returns (doc_id, page, region_id, row, col, cell_text) — region_id
    numbered top-down per page exactly as :func:`table_regions`, so cells
    join to regions on (doc_id, page, region_id).

    Scale shape: the lines aggregate, the grid aggregate and the runs
    join all hash on (doc_id, page[, yl]) — no new wide shuffle; the grid
    array is per-region-tiny (n_cols) so the HOF count is O(n_cols)."""
    tab = _tabular_lines(runs, min_cols, y_grid)
    wg = Window.partitionBy("doc_id", "page", "grp")
    tab = tab.withColumn(
        "row", (F.dense_rank().over(wg.orderBy(F.col("yl").desc())) - 1).cast("long")
    )
    origins = F.sort_array(F.array_distinct(F.flatten(F.collect_list("xs"))))
    # cluster fold: keep an origin only when it sits > x_cluster right of
    # the last kept one (arrays are n_cols-tiny; the fold is O(n_cols))
    grid = F.aggregate(
        origins,
        F.array().cast("array<double>"),
        lambda acc, o: F.when(
            (F.size(acc) == 0) | (o - F.element_at(acc, -1) > F.lit(x_cluster)),
            F.concat(acc, F.array(o)),
        ).otherwise(acc),
    )
    grids = tab.groupBy("doc_id", "page", "grp").agg(
        grid.alias("grid"),
        F.max("y").alias("y_top"),
    )
    # region_id: top-down rank of the region within its page (== table_regions)
    wr = Window.partitionBy("doc_id", "page").orderBy(F.col("y_top").desc())
    grids = grids.withColumn(
        "region_id", (F.row_number().over(wr) - 1).cast("long")
    )
    cells = (
        runs.where(F.col("kind") == "text")
        .withColumn("yl", F.round(F.col("y") / y_grid).cast("long"))
        .join(
            tab.select("doc_id", "page", "yl", "grp", "row"),
            ["doc_id", "page", "yl"],
        )
        .join(grids.select("doc_id", "page", "grp", "region_id", "grid"),
              ["doc_id", "page", "grp"])
        .withColumn(
            "col",
            (
                F.size(F.filter("grid", lambda g: g <= F.col("x") + F.lit(x_tol)))
                - 1
            ).cast("long"),
        )
    )
    return (
        cells.groupBy("doc_id", "page", "region_id", "row", "col")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("x", "text"))),
                    lambda s: s["text"],
                ),
                " ",
            ).alias("cell_text")
        )
    )


def layout_spans(runs: DataFrame, bin_w: float = 12.0, min_gap_bins: int = 2) -> DataFrame:
    """Reading-ordered runs → the engine's canonical interleaved span
    schema (doc_id, offset, kind, text, media_ref): the north rule's
    per-row invariant (span-sequence equality over kind, text, media_ref,
    order) emitted from the LAYOUT path — pages concatenate in page order,
    text and media interleave at their reading positions, offset is the
    0-based ordinal per doc (cf. boilerplate.main_content_spans, the HTML
    twin of this emission)."""
    ordered = reading_order(runs, bin_w, min_gap_bins)
    w = Window.partitionBy("doc_id").orderBy("page", "reading_idx")
    return ordered.select(
        "doc_id",
        (F.row_number().over(w) - 1).cast("long").alias("offset"),
        "kind",
        F.coalesce("text", F.lit("")).alias("text"),
        F.coalesce("media_ref", F.lit("")).alias("media_ref"),
    )


def figure_captions(runs: DataFrame) -> DataFrame:
    """Pair each media run with the nearest caption-shaped text line below
    it on the same page (text starting ``Figure``/``Fig.``/``Table``), via
    one IGNORE-NULLS window — media rows stay transparent to the text
    chain exactly as in the boilerplate classifier."""
    w = (
        Window.partitionBy("doc_id", "page")
        .orderBy(F.col("y").desc(), "x")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    cap = F.when(
        (F.col("kind") == "text")
        & F.col("text").rlike(r"^(Figure|Fig\.|Table)\b"),
        F.col("text"),
    )
    out = runs.withColumn("caption", F.first(cap, True).over(w))
    return out.where(F.col("kind") == "media").select(
        "doc_id", "page", "media_ref", "x", "y",
        F.coalesce("caption", F.lit("")).alias("caption"),
    )
