"""Span → Markdown rendering (operators/markdown.py)."""

from aide_spark.operators.markdown import render_markdown, render_markdown_table


def _spans(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, offset long, kind string, text string, media_ref string"
    )


def test_render_interleaved_spans_in_offset_order(spark):
    # deliberately shuffled input order: offset drives the output
    rows = [
        (0, 2, "text", "after the image", ""),
        (0, 0, "text", "intro paragraph", ""),
        (0, 1, "media", "", "img/cat.png"),
    ]
    out = render_markdown(_spans(spark, rows)).collect()
    assert len(out) == 1
    assert out[0]["n_spans"] == 3
    assert (
        out[0]["markdown"]
        == "intro paragraph\n\n![](img/cat.png)\n\nafter the image"
    )


def test_render_null_text_and_single_span(spark):
    rows = [(1, 0, "text", None, ""), (2, 0, "media", None, "m")]
    out = {r["doc_id"]: r for r in render_markdown(_spans(spark, rows)).collect()}
    assert out[1]["markdown"] == ""
    assert out[2]["markdown"] == "![](m)"


def test_render_deterministic_under_partitioning(spark):
    rows = [(d, o, "text", f"p{d}-{o}", "") for d in range(8) for o in range(5)]
    a = render_markdown(_spans(spark, rows).repartition(2)).collect()
    b = render_markdown(_spans(spark, rows).repartition(7)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    one = {r["doc_id"]: r["markdown"] for r in a}[3]
    assert one == "p3-0\n\np3-1\n\np3-2\n\np3-3\n\np3-4"


def _cells(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, row long, col long, cell_text string"
    )


def test_gfm_table_rendering(spark):
    rows = [
        (0, 0, 0, "name"), (0, 0, 1, "age"),
        (0, 1, 0, "ada"), (0, 1, 1, "36"),
        (0, 2, 0, "bob"), (0, 2, 1, "41"),
    ]
    out = render_markdown_table(_cells(spark, rows)).collect()[0]
    assert out["n_rows"] == 3 and out["n_cols"] == 2
    assert out["markdown"] == (
        "| name | age |\n| --- | --- |\n| ada | 36 |\n| bob | 41 |"
    )


def test_gfm_table_header_only_and_ragged(spark):
    rows = [
        (0, 0, 0, "h1"), (0, 0, 1, "h2"),
        # doc 1: ragged — body row missing a cell, header missing another
        (1, 0, 1, "b"), (1, 1, 0, "x"), (1, 1, 1, "y"), (1, 1, 2, "z"),
    ]
    out = {
        r["doc_id"]: r
        for r in render_markdown_table(_cells(spark, rows)).collect()
    }
    assert out[0]["markdown"] == "| h1 | h2 |\n| --- | --- |"
    assert out[1]["n_cols"] == 3
    assert out[1]["markdown"] == "| b |\n| --- | --- | --- |\n| x | y | z |"


def test_table_cells_sorted_within_row(spark):
    rows = [(0, 0, 2, "c"), (0, 0, 0, "a"), (0, 0, 1, "b")]
    out = render_markdown_table(_cells(spark, rows)).collect()[0]
    assert out["markdown"].startswith("| a | b | c |")
