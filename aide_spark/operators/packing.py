"""Training-sequence packing — corpus → fixed-length example windows.

The last stage of a training-data pipeline turns filtered, deduped
documents into fixed-length token windows (e.g. 2048 tokens) with no
padding waste. The standard batch recipe (GPT-2/T5 style, "pack with
splitting") concatenates all documents in a deterministic pseudo-random
order and cuts the stream at window boundaries; a document spans one or
more windows, each window is exactly full (except the tail).

The distributed problem is the global token offset — a running sum over
the whole corpus. A single global window would serialize on one
partition; instead this is the classic **two-level prefix sum**, fully
columnar:

1. a deterministic md5 order key (operators/sampling.py coin — stable
   under any parallelism and resume) assigns each doc a shuffle-order
   position and a group ``g = coin % n_groups``;
2. per-group exclusive prefix sums run as a window PARTITIONED by
   group — ``n_groups`` independent partitions, no global sort;
3. group base offsets come from one tiny aggregate (``n_groups`` rows)
   windowed on the driver-sized frame and broadcast back.

``global_offset = group_base + local_prefix``. Window spans then emit
per-(doc, window) rows with an ``explode(sequence(first_w, last_w))`` —
a doc crossing k windows yields k rows, each with its in-window slice.

Every value is an integer; the DuckDB oracle reproduces the exact
assignment. Zero-token docs are dropped (nothing to pack — callers
filter empties long before packing).

Reference scope: beyond-reference LLM-data surface (SURVEY.md §2.13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import hash_coin


def pack_sequences(
    docs: DataFrame,
    window_tokens: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    n_groups: int = 64,
    salt: str = "pack-v1",
) -> DataFrame:
    """Assign every document its window slices:

    ``(id_col, window_id BIGINT, win_offset BIGINT, doc_offset BIGINT,
    n_toks BIGINT)``

    where window ``window_id`` holds ``n_toks`` tokens of the doc
    starting at ``doc_offset`` within the doc and ``win_offset`` within
    the window. Deterministic for a fixed corpus, salt and group count.
    """
    if window_tokens <= 0:
        raise ValueError("window_tokens must be positive")
    toks = F.col(token_col).cast("long")
    d = docs.where(toks > 0).select(
        F.col(id_col),
        toks.alias("_n"),
        hash_coin(F.col(id_col), salt).alias("_ok"),
    )
    d = d.withColumn("_g", (F.col("_ok") % n_groups).cast("int"))

    w_local = (
        Window.partitionBy("_g")
        .orderBy("_ok", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("_local", F.sum("_n").over(w_local) - F.col("_n"))

    totals = d.groupBy("_g").agg(F.sum("_n").alias("_gt"))
    # n_groups rows: the single-partition window here is over a frame the
    # size of the GROUP COUNT, never the data
    w_base = (
        Window.orderBy("_g")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bases = totals.withColumn(
        "_base", F.sum("_gt").over(w_base) - F.col("_gt")
    ).select("_g", "_base")

    d = d.join(F.broadcast(bases), "_g")
    start = F.col("_base") + F.col("_local")
    end = start + F.col("_n")
    first_w = F.floor(start / window_tokens).cast("long")
    last_w = F.floor((end - 1) / window_tokens).cast("long")

    d = d.select(
        id_col,
        F.col("_n"),
        start.alias("_s"),
        F.explode(F.sequence(first_w, last_w)).alias("window_id"),
    )
    wstart = F.col("window_id") * window_tokens
    slice_start = F.greatest(F.col("_s"), wstart)
    slice_end = F.least(F.col("_s") + F.col("_n"), wstart + window_tokens)
    return d.select(
        F.col(id_col),
        F.col("window_id"),
        (slice_start - wstart).alias("win_offset"),
        (slice_start - F.col("_s")).alias("doc_offset"),
        (slice_end - slice_start).alias("n_toks"),
    )
