"""Structured Streaming surface (SURVEY.md §2.11).

The reference is queue-driven (SQS → Lambda, batch size 1) — not a stream
processor — so the streaming layer offers the queue semantics as a proper
stream: documents arrive as files (micro-batches), extraction runs per batch
through the SAME batch pipeline via ``foreachBatch`` (code reuse — the
batch/stream unification Spark gives for free), and committed state rides on
the SnapshotStore checkpoint, mirroring SQS at-least-once + idempotent
processing.

Also provided, beyond the reference (first-class streaming ops a production
engine needs):

* watermarked event-time tumbling aggregation (late-data policy), and
* a custom stateful operator via ``transformWithStateInPandas``-style
  ``applyInPandasWithState`` — the APGVB running-balance classifier as a
  per-key stateful stream (the streaming twin of the batch ``lag()`` window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
)

from ..schemas import DOCUMENTS
from ..plans import pipeline
from ..plans.checkpoint import SnapshotStore


def stream_documents(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of documents: every parquet file that lands under
    ``path`` becomes part of a micro-batch (the SQS-message analogue;
    ``maxFilesPerTrigger`` bounds batch size like the queue's batch_size)."""
    return (
        spark.readStream.schema(DOCUMENTS)
        .option("maxFilesPerTrigger", 8)
        .parquet(path)
    )


def extract_stream(docs_stream: DataFrame, store: SnapshotStore, checkpoint_dir: str):
    """Streaming extraction: each micro-batch runs the full batch pipeline
    and commits atomically to the SnapshotStore. Spark's checkpoint gives
    at-least-once batch delivery; the store's committed-doc anti-join makes
    it effectively exactly-once (same as the batch resume path)."""
    from ..plans.checkpoint import run_with_resume

    def process(batch_df: DataFrame, batch_id: int) -> None:
        run_with_resume(
            batch_df.sparkSession, batch_df, store, batch_id=f"stream-{batch_id:08d}"
        )

    return (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )


def windowed_event_counts(events_stream: DataFrame) -> DataFrame:
    """Watermarked tumbling-window aggregation: 1-hour windows, events later
    than 10 minutes past the watermark are dropped (late-data policy)."""
    return (
        # watermarks require TIMESTAMP (tz); parquet often carries NTZ
        events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n", "total",
        )
    )


_BALANCE_STATE = StructType([StructField("prev_balance", DoubleType(), True)])
_CLASSIFIED = StructType(
    [
        StructField("account", LongType(), False),
        StructField("event_id", LongType(), False),
        StructField("balance", DoubleType(), False),
        StructField("txn_type", StringType(), False),
    ]
)


def classify_balance_stream(txns_stream: DataFrame) -> DataFrame:
    """Custom stateful operator: the APGVB balance-change classifier
    (apgvb_extractor.py:894-907) over an unbounded stream — per-account state
    carries the previous balance across micro-batches; first record compares
    against 0.0 exactly like the batch ``lag(balance, 1, 0.0)``.

    Input: stream with (account long, event_id long, balance double),
    in event order within each micro-batch per account.
    """
    import pandas as pd

    def classify(key, pdfs, state: GroupState):
        (account,) = key
        prev = state.get[0] if state.exists else 0.0
        # a group's rows may span several Arrow chunks within one micro-batch:
        # concat FIRST, sort once globally by event_id — per-chunk sorting
        # would apply state in chunk order and misclassify across boundaries
        chunks = list(pdfs)
        pdf = (
            pd.concat(chunks, ignore_index=True).sort_values("event_id")
            if chunks
            else pd.DataFrame(columns=["account", "event_id", "balance"])
        )
        rows = []
        for _, r in pdf.iterrows():
            bal = float(r["balance"])
            change = bal - prev
            rows.append(
                (int(account), int(r["event_id"]), bal,
                 "Debit" if change < 0 else "Credit")
            )
            prev = bal
        state.update((prev,))
        yield pd.DataFrame(rows, columns=["account", "event_id", "balance", "txn_type"])

    return txns_stream.groupBy("account").applyInPandasWithState(
        classify,
        outputStructType=_CLASSIFIED,
        stateStructType=_BALANCE_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
