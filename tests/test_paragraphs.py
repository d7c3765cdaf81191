"""Paragraph-level dedup (operators/paragraphs.py — the CCNet shape)."""

import pytest
from pyspark.sql import functions as F

from aide_spark.operators.paragraphs import (
    dedup_paragraphs,
    explode_paragraphs,
    paragraph_duplication_profile,
)


def _docs(spark, rows, partitions=None):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return df.repartition(partitions) if partitions else df


def test_first_occurrence_survives(spark):
    out = dedup_paragraphs(
        _docs(
            spark,
            [
                (0, "shared intro\nalpha body"),
                (1, "shared intro\nbeta body"),
                (2, "gamma body\nshared intro"),
            ],
        )
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[0]["text_deduped"] == "shared intro\nalpha body"
    assert by_id[1]["text_deduped"] == "beta body"
    assert by_id[2]["text_deduped"] == "gamma body"
    assert [by_id[i]["n_paras"] for i in (0, 1, 2)] == [2, 2, 2]
    assert [by_id[i]["n_kept"] for i in (0, 1, 2)] == [2, 1, 1]


def test_normalization_merges_whitespace_and_case(spark):
    out = dedup_paragraphs(
        _docs(spark, [(0, "Cookie  Notice"), (1, "cookie notice")])
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    # doc 0 wins; doc 1's differently-cased copy is the same paragraph
    assert by_id[0]["text_deduped"] == "Cookie  Notice"
    assert by_id[1]["text_deduped"] == ""
    assert by_id[1]["n_kept"] == 0


def test_empty_paragraphs_are_structure_not_content(spark):
    # blank lines must neither dedup against each other nor vanish
    out = dedup_paragraphs(
        _docs(spark, [(0, "a\n\nb"), (1, "c\n\nd")])
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[0]["text_deduped"] == "a\n\nb"
    assert by_id[1]["text_deduped"] == "c\n\nd"
    assert by_id[0]["n_kept"] == 3


def test_null_text_doc_survives(spark):
    # the simhash32_table regression: explode of null must not drop the doc
    out = dedup_paragraphs(_docs(spark, [(0, None), (1, "x")])).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[0]["n_paras"] == 1 and by_id[0]["text_deduped"] == ""
    assert by_id[1]["text_deduped"] == "x"


def test_deterministic_under_partitioning(spark):
    rows = [
        (i, f"common header\nbody {i % 5}\ntail {i}") for i in range(40)
    ]
    a = dedup_paragraphs(_docs(spark, rows, partitions=2)).collect()
    b = dedup_paragraphs(_docs(spark, rows, partitions=7)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    by_id = {r["doc_id"]: r for r in a}
    # doc 0 wins "common header" and "body 0"; docs 1-4 win their bodies
    assert by_id[0]["n_kept"] == 3
    assert by_id[4]["n_kept"] == 2
    assert by_id[9]["n_kept"] == 1  # only its unique tail


def test_explode_positions_are_zero_based_and_ordered(spark):
    rows = explode_paragraphs(_docs(spark, [(7, "x\ny\nz")])).collect()
    assert [(r["pos"], r["para"]) for r in sorted(rows)] == [
        (0, "x"),
        (1, "y"),
        (2, "z"),
    ]


def test_duplication_profile_matches_python(spark):
    rows = [(0, "aa\nbb"), (1, "aa\ncc"), (2, "dd")]
    out = {
        r["doc_id"]: r
        for r in paragraph_duplication_profile(_docs(spark, rows)).collect()
    }
    # "aa" occurs twice → docs 0,1 have 2 dup chars of 4 total
    expect_ppm = int(2 * 1_000_000.0 / 4)
    assert out[0]["n_dup_paras"] == 1
    assert out[0]["dup_char_ppm"] == expect_ppm
    assert out[1]["dup_char_ppm"] == expect_ppm
    assert out[2]["n_dup_paras"] == 0 and out[2]["dup_char_ppm"] == 0


def test_reassembly_roundtrip_when_no_duplicates(spark):
    rows = [(i, f"only {i}\nsecond {i}") for i in range(10)]
    out = dedup_paragraphs(_docs(spark, rows)).collect()
    assert all(r["text_deduped"] == f"only {r['doc_id']}\nsecond {r['doc_id']}" for r in out)
