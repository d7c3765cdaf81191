"""Training-sequence packing (operators/packing.py)."""

import pytest
from pyspark.sql import functions as F

from aide_spark.operators.packing import pack_sequences


def _docs(spark, sizes, partitions=None):
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(sizes)], "doc_id long, n_tokens long"
    )
    return df.repartition(partitions) if partitions else df


def _check_invariants(rows, sizes, window):
    total = sum(n for n in sizes if n > 0)
    # 1. every window except the last is exactly full
    by_win = {}
    for r in rows:
        by_win.setdefault(r["window_id"], []).append(r)
    assert set(by_win) == set(range((total + window - 1) // window))
    for wid, members in by_win.items():
        fill = sum(r["n_toks"] for r in members)
        if wid < max(by_win):
            assert fill == window, (wid, fill)
        # 2. slices tile the window without overlap
        members.sort(key=lambda r: r["win_offset"])
        pos = 0
        for r in members:
            assert r["win_offset"] == pos, (wid, r)
            pos += r["n_toks"]
    # 3. each doc's slices tile [0, n)
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for did, members in by_doc.items():
        members.sort(key=lambda r: r["doc_offset"])
        pos = 0
        for r in members:
            assert r["doc_offset"] == pos, (did, r)
            pos += r["n_toks"]
        assert pos == sizes[did], did


def test_packing_invariants_small(spark):
    sizes = [5, 100, 3000, 1, 1024, 7, 0, 2048, 511]
    rows = pack_sequences(_docs(spark, sizes), 1024).collect()
    _check_invariants(rows, sizes, 1024)
    # the zero-token doc emits nothing
    assert all(r["doc_id"] != 6 for r in rows)


def test_packing_deterministic_under_partitioning(spark):
    sizes = [((i * 131) % 700) + 1 for i in range(300)]
    a = sorted(map(tuple, pack_sequences(_docs(spark, sizes, 3), 512).collect()))
    b = sorted(map(tuple, pack_sequences(_docs(spark, sizes, 13), 512).collect()))
    assert a == b
    _check_invariants([dict(zip(["doc_id", "window_id", "win_offset", "doc_offset", "n_toks"], t)) for t in a], sizes, 512)


def test_giant_doc_spans_many_windows(spark):
    rows = pack_sequences(_docs(spark, [10_000]), 1024).collect()
    assert len(rows) == 10  # ceil(10000/1024)
    assert sum(r["n_toks"] for r in rows) == 10_000


def test_rejects_bad_window(spark):
    with pytest.raises(ValueError):
        pack_sequences(_docs(spark, [5]), 0)
