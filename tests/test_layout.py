"""PDF layout reconstruction tests: positioned-run extraction (text-matrix
state machine), projection-profile reading order, table-region detection,
figure-caption pairing. The cross-engine oracles for the full fixtures live
in test_oracle_queries (pdf_reading_order / pdf_table_detect /
pdf_figure_captions); these pin the state machine and each operator's edge
behavior directly."""

from __future__ import annotations

import zlib

from aide_spark.sources.pdf_codec import encode_pdf, extract_positioned_runs


def _pdf_with_content(ops: bytes) -> bytes:
    """Wrap raw content-stream ops in a minimal one-page PDF."""
    stream = zlib.compress(ops)
    return (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length " + str(len(stream)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + stream + b"\nendstream\nendobj\n"
        b"5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n"
        b"trailer\n<< /Size 6 /Root 1 0 R >>\n%%EOF\n"
    )


def runs_of(ops: bytes):
    return [
        (r["x"], r["y"], r["text"])
        for r in extract_positioned_runs(_pdf_with_content(ops))
        if r["kind"] == "text"
    ]


def test_td_relative_advance():
    assert runs_of(b"BT /F1 10 Tf 72 700 Td (a) Tj 0 -16 Td (b) Tj ET") == [
        (72.0, 700.0, "a"), (72.0, 684.0, "b"),
    ]


def test_tm_scale_affects_td():
    # Td translation happens in TEXT space: with Tm scale 2, Td(5,5) lands
    # at (5*2+10, 5*2+10)
    assert runs_of(b"BT /F1 10 Tf 2 0 0 2 10 10 Tm (a) Tj 5 5 Td (b) Tj ET") == [
        (10.0, 10.0, "a"), (20.0, 20.0, "b"),
    ]


def test_tstar_and_quote_use_leading():
    assert runs_of(b"BT /F1 10 Tf 72 700 Td 16 TL (a) Tj T* (b) Tj (c) ' ET") == [
        (72.0, 700.0, "a"), (72.0, 684.0, "b"), (72.0, 668.0, "c"),
    ]


def test_TD_sets_negative_leading():
    # TD tx ty == -ty TL + Td; the following T* advances by that leading
    assert runs_of(b"BT /F1 10 Tf 72 700 Td (a) Tj 0 -20 TD (b) Tj T* (c) Tj ET") == [
        (72.0, 700.0, "a"), (72.0, 680.0, "b"), (72.0, 660.0, "c"),
    ]


def test_bt_resets_matrix():
    assert runs_of(b"BT /F1 10 Tf 9 9 Td (a) Tj ET BT 1 1 Td (b) Tj ET") == [
        (9.0, 9.0, "a"), (1.0, 1.0, "b"),
    ]


def test_cm_q_Q_media_position():
    ops = (
        b"q 1 0 0 1 100 400 cm /figA Do Q "
        b"q 2 0 0 2 50 50 cm q 1 0 0 1 10 10 cm /figB Do Q Q"
    )
    media = [
        (r["x"], r["y"], r["media_ref"])
        for r in extract_positioned_runs(_pdf_with_content(ops))
        if r["kind"] == "media"
    ]
    # figB: inner cm (10,10) composed with the outer scale-2 cm →
    # (10*2+50, 10*2+50); the Q after figA restored the identity first
    assert media == [(100.0, 400.0, "figA"), (70.0, 70.0, "figB")]


def test_malformed_content_never_raises():
    for ops in (b"BT (open", b"Td Tj TJ", b"1 2 3 Tm", b"Q Q Q", b"T*"):
        extract_positioned_runs(_pdf_with_content(ops))


def test_encode_positioned_roundtrip_all_modes():
    # 4 runs cycle Td / Tm / T* / Td encodings inside encode_pdf
    page = [("text", 72, 720 - 16 * i, f"line {i}") for i in range(4)]
    got = [
        (r["x"], r["y"], r["text"])
        for r in extract_positioned_runs(encode_pdf([], positioned_pages=[page]))
    ]
    assert got == [(72.0, 720.0 - 16 * i, f"line {i}") for i in range(4)]


# ---------------------------------------------------------------------------
# columnar operators (synthetic runs, no PDF)
# ---------------------------------------------------------------------------


def _runs_df(spark, rows):
    from aide_spark.operators.layout import RUN_SCHEMA

    return spark.createDataFrame(
        [
            (0, 0, float(x), float(y), 10.0, kind, text, ref)
            for x, y, kind, text, ref in rows
        ],
        RUN_SCHEMA,
    )


def test_reading_order_two_columns(spark):
    from aide_spark.operators.layout import reading_order

    rows = [
        (72, 700, "text", "L0 aaaa aaaa", ""),
        (340, 700, "text", "R0 bbbb bbbb", ""),
        (72, 684, "text", "L1 cccc cccc", ""),
        (340, 684, "text", "R1 dddd dddd", ""),
    ]
    got = [
        r.text
        for r in reading_order(_runs_df(spark, rows)).orderBy("reading_idx").collect()
    ]
    assert got == ["L0 aaaa aaaa", "L1 cccc cccc", "R0 bbbb bbbb", "R1 dddd dddd"]


def test_reading_order_single_column_top_down(spark):
    from aide_spark.operators.layout import column_boundaries, reading_order

    rows = [(72, 700 - 16 * i, "text", f"l{i} words here", "") for i in range(4)]
    df = _runs_df(spark, rows)
    assert column_boundaries(df).count() == 0
    got = [r.text for r in reading_order(df).orderBy("reading_idx").collect()]
    assert got == [f"l{i} words here" for i in range(4)]


def test_table_two_regions_and_islands(spark):
    from aide_spark.operators.layout import table_regions

    rows = []
    for r in range(3):  # table 1 at y 700..668
        for x in (72, 180, 288):
            rows.append((x, 700 - 16 * r, "text", "c", ""))
    rows.append((72, 640, "text", "separator paragraph line", ""))
    for r in range(2):  # table 2 at y 600..584
        for x in (90, 200, 310, 420):
            rows.append((x, 600 - 16 * r, "text", "d", ""))
    got = (
        table_regions(_runs_df(spark, rows))
        .orderBy("region_id")
        .select("region_id", "n_rows", "n_cols", "y_top", "y_bottom")
        .collect()
    )
    assert [tuple(r) for r in got] == [
        (0, 3, 3, 700.0, 668.0),
        (1, 2, 4, 600.0, 584.0),
    ]


def test_single_wide_line_is_not_a_table(spark):
    from aide_spark.operators.layout import table_regions

    rows = [(x, 700, "text", "w", "") for x in (72, 180, 288, 396)]
    rows.append((72, 684, "text", "normal paragraph", ""))
    assert table_regions(_runs_df(spark, rows)).count() == 0


def test_table_cells_missing_cell_lands_by_grid(spark):
    """A row missing its middle cell must keep its survivors in columns
    0 and 2 — the region grid (union of all line origins) decides the
    column, not positional rank within the line."""
    from aide_spark.operators.layout import table_cells

    rows = []
    for r in range(2):
        for c, x in enumerate((72, 180, 288)):
            rows.append((x, 700 - 16 * r, "text", f"r{r}c{c}", ""))
    rows.append((72, 668, "text", "r2c0", ""))
    rows.append((288, 668, "text", "r2c2", ""))  # col 1 missing
    got = {
        (r.row, r.col): r.cell_text
        for r in table_cells(_runs_df(spark, rows)).collect()
    }
    assert got[(2, 0)] == "r2c0"
    assert got[(2, 2)] == "r2c2"
    assert (2, 1) not in got
    assert got[(0, 1)] == "r0c1"
    assert len(got) == 8


def test_table_cells_wrapped_text_concatenates(spark):
    """Two runs landing in the same cell concatenate left-to-right."""
    from aide_spark.operators.layout import table_cells

    rows = []
    for r in range(2):
        for c, x in enumerate((72, 180, 288)):
            rows.append((x, 700 - 16 * r, "text", f"r{r}c{c}", ""))
    rows.append((185, 700, "text", "extra", ""))  # same cell as r0c1
    got = {
        (r.row, r.col): r.cell_text
        for r in table_cells(_runs_df(spark, rows)).collect()
    }
    assert got[(0, 1)] == "r0c1 extra"


def test_layout_spans_interleaves_media_in_reading_order(spark):
    """Span emission: media between two left-column lines takes the offset
    between them; right column follows; media_ref/text coalesce to ''."""
    from aide_spark.operators.layout import layout_spans

    rows = [
        (100, 692, "media", None, "img9"),  # emitted first, y between L0/L1
        (72, 700, "text", "L0 aaaa bbbb", ""),
        (340, 700, "text", "R0 cccc dddd", ""),
        (72, 684, "text", "L1 eeee ffff", ""),
        (340, 684, "text", "R1 gggg hhhh", ""),
    ]
    got = [
        (r["offset"], r.kind, r.text, r.media_ref)
        for r in layout_spans(_runs_df(spark, rows)).orderBy("offset").collect()
    ]
    assert got == [
        (0, "text", "L0 aaaa bbbb", ""),
        (1, "media", "", "img9"),
        (2, "text", "L1 eeee ffff", ""),
        (3, "text", "R0 cccc dddd", ""),
        (4, "text", "R1 gggg hhhh", ""),
    ]


def test_figure_caption_pairing(spark):
    from aide_spark.operators.layout import figure_captions

    rows = [
        (100, 600, "media", "", "figA"),
        (72, 592, "text", "interleaved body text", ""),
        (72, 584, "text", "Figure 1 first", ""),
        (100, 400, "media", "", "figB"),
        (72, 384, "text", "Figure 2 second", ""),
        (100, 200, "media", "", "figC"),  # nothing below: empty caption
    ]
    got = {
        r.media_ref: r.caption
        for r in figure_captions(_runs_df(spark, rows)).collect()
    }
    assert got == {"figA": "Figure 1 first", "figB": "Figure 2 second", "figC": ""}


def test_banded_xycut_title_spanner(spark):
    """A full-width title bridges the column gap: flat reading_order cannot
    split the columns (single-column fallback), the banded variant can."""
    from aide_spark.operators.layout import reading_order, reading_order_banded

    rows = [("TITLE " + "t " * 30, 72, 760)]  # ~66 chars: spanner
    for i in range(2):
        rows.append((f"L{i} aa bb cc", 72, 720 - 16 * i))
        rows.append((f"R{i} dd ee ff", 340, 720 - 16 * i))
    rows.append(("footer " + "f " * 30, 72, 80))
    df = _runs_df(spark, [(x, y, "text", t, "") for t, x, y in rows])

    banded = [r.text for r in reading_order_banded(df).orderBy("reading_idx").collect()]
    assert banded[0].startswith("TITLE")
    assert banded[1:5] == ["L0 aa bb cc", "L1 aa bb cc", "R0 dd ee ff", "R1 dd ee ff"]
    assert banded[5].startswith("footer")

    flat = [r.text for r in reading_order(df).orderBy("reading_idx").collect()]
    assert flat != banded  # the title kills the page-level gap: flat interleaves


def test_banded_no_spanner_matches_flat(spark):
    """Without spanners the banded variant degenerates to the flat order."""
    from aide_spark.operators.layout import reading_order, reading_order_banded

    rows = []
    for i in range(3):
        rows.append((72, 700 - 16 * i, "text", f"L{i} aaaa bbbb", ""))
        rows.append((340, 700 - 16 * i, "text", f"R{i} cccc dddd", ""))
    df = _runs_df(spark, rows)
    a = [r.text for r in reading_order(df).orderBy("reading_idx").collect()]
    b = [r.text for r in reading_order_banded(df).orderBy("reading_idx").collect()]
    assert a == b
