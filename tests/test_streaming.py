"""Structured Streaming surface: file-source micro-batch extraction through
the SAME batch pipeline, watermarked windows, and the stateful
balance-classifier — streaming results must equal their batch twins."""

from __future__ import annotations

import pytest

from aide_spark.generator import local_corpus_df
from aide_spark.plans import pipeline
from aide_spark.plans.checkpoint import SnapshotStore
from aide_spark.streaming.stream import (
    classify_balance_stream,
    extract_stream,
    stream_documents,
    windowed_event_counts,
)


def test_streaming_extraction_equals_batch(spark, tmp_path):
    docs_path = str(tmp_path / "docs")
    # write with multiple files so maxFilesPerTrigger yields >1 micro-batch
    local_corpus_df(spark, 18).repartition(12).write.parquet(docs_path)

    store = SnapshotStore(str(tmp_path / "store"))
    stream = stream_documents(spark, docs_path)
    q = extract_stream(stream, store, str(tmp_path / "ckpt")).trigger(
        availableNow=True
    ).start()
    q.awaitTermination(300)

    streamed = {
        (r.doc_id, r.seq, r.kind, r.text, r.media_ref)
        for r in store.read(spark, "spans").collect()
    }
    batch = {
        (r.doc_id, r.seq, r.kind, r.text, r.media_ref)
        for r in pipeline.run(local_corpus_df(spark, 18))["spans_out"].collect()
    }
    assert streamed == batch


def test_windowed_counts_match_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    events_path = str(tmp_path / "events")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.write.parquet(events_path)

    stream = spark.readStream.schema(ev.schema).parquet(events_path)
    agg = windowed_event_counts(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {
        (str(r.window_start), r.event_type, r.n)
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    want = {
        (str(r.ws), r.event_type, r.n)
        for r in ev.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "event_type", "n")
        .collect()
    }
    assert got == want


def test_stateful_balance_classifier_matches_lag(spark, tmp_path):
    """The applyInPandasWithState operator must classify exactly like the
    batch lag() window (the P10 equivalence)."""
    from pyspark.sql import Window, functions as F

    txns = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .where("event_id < 400")
        .select(
            F.col("user_id").alias("account"),
            F.col("event_id"),
            F.round(F.col("value"), 2).alias("balance"),
        )
    )
    path = str(tmp_path / "txns")
    txns.write.parquet(path)

    stream = spark.readStream.schema(txns.schema).parquet(path)
    classified = classify_balance_stream(stream)
    q = (
        classified.writeStream.format("memory")
        .queryName("classified")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r.account, r.event_id): r.txn_type
        for r in spark.sql("SELECT * FROM classified").collect()
    }

    w = Window.partitionBy("account").orderBy("event_id")
    change = F.col("balance") - F.lag("balance", 1, 0.0).over(w)
    want = {
        (r.account, r.event_id): r.txn_type
        for r in txns.select(
            "account", "event_id",
            F.when(change < 0, "Debit").otherwise("Credit").alias("txn_type"),
        ).collect()
    }
    assert got == want


def test_streaming_near_dup_filter_matches_sequential_reference(spark, tmp_path):
    """near_dup_stream must flag exactly what an order-aware sequential scan
    flags: for each arriving doc, dup iff some EARLIER doc shares a band and
    sits within Hamming distance 3 — across micro-batch boundaries (state
    carries), with the identical canonical-match rule."""
    from aide_spark.streaming.stream import collapse_band_verdicts, near_dup_stream

    rng_fps = []
    base = 0x5A5A_1234
    for i in range(60):
        if i % 7 == 3:
            fp = rng_fps[i - 3][2] ^ (1 << (i % 32))        # near-dup of an earlier doc
        elif i % 11 == 5:
            fp = rng_fps[i - 5][2]                          # exact dup
        else:
            fp = (base * (i + 13) * 2654435761) & 0xFFFF_FFFF
        rng_fps.append((i, 1000 + i, fp))
    df = spark.createDataFrame(rng_fps, "seq long, doc_id long, simhash long")

    # two parquet files => at least two micro-batch splits under availableNow
    path = str(tmp_path / "fps")
    df.where("seq < 30").coalesce(1).write.mode("append").parquet(path)
    df.where("seq >= 30").coalesce(1).write.mode("append").parquet(path)

    stream = spark.readStream.schema(df.schema).option("maxFilesPerTrigger", 1).parquet(path)
    q = (
        near_dup_stream(stream).writeStream.format("memory")
        .queryName("neardup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r.doc_id): (r.is_dup, r.dup_of)
        for r in collapse_band_verdicts(spark.sql("SELECT * FROM neardup")).collect()
    }

    # sequential reference: same banding, same first-hit-in-seq-order rule,
    # canonical = smallest matching id across bands
    state: dict[tuple[int, int], list[tuple[int, int]]] = {}
    want = {}
    for seq, did, fp in sorted(rng_fps):
        hits = []
        for b in range(4):
            bucket = state.setdefault((b, (fp >> (b * 8)) & 255), [])
            hit = next((i for f, i in bucket if bin(fp ^ f).count("1") <= 3), None)
            if hit is not None:
                hits.append(hit)
            bucket.append((fp, did))
        want[did] = (bool(hits), min(hits) if hits else None)
    assert got == want
    assert sum(1 for d, _ in got.values() if d) > 0  # dups actually exercised


def test_session_windows_match_batch(spark, tmp_path):
    """Streaming session windows (dynamic extents, merging state) must equal
    the batch session_window aggregation over the same events."""
    from pyspark.sql import functions as F

    from aide_spark.streaming.stream import sessionized_event_counts

    events_path = str(tmp_path / "events_sess")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.write.parquet(events_path)

    stream = spark.readStream.schema(ev.schema).parquet(events_path)
    agg = sessionized_event_counts(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("sess_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {
        (str(r.session_start), str(r.session_end), r.event_type, r.n)
        for r in spark.sql("SELECT * FROM sess_counts").collect()
    }
    want = {
        (str(r.ss), str(r.se), r.event_type, r.n)
        for r in ev.withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("ss"),
            F.col("w.end").alias("se"),
            "event_type",
            "n",
        )
        .collect()
    }
    assert got == want
    assert len(got) > 0
