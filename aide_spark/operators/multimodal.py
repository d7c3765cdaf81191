"""Multimodal columns: opaque binary payloads + typed metadata, processed by
Arrow-batched vectorized UDFs over ``mapInPandas`` (SURVEY.md §2.12(a) — the
only place Python touches row data, and only in Arrow batches).

The actual byte→pixels/samples decode is a STUB: image/audio libraries are
not available in this environment, so :func:`_fake_decode` derives
deterministic pseudo-features from the bytes. Everything Spark-side — the
schema contract, the Arrow batch shape, partition-parallel execution — is
real and what matters at 100 TB: decode parallelism scales with partitions,
and the per-batch loop amortizes Python dispatch over thousands of rows.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType, IntegerType, LongType, StringType, StructField, StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("n_frames", IntegerType(), False),
        StructField("feature_0", DoubleType(), False),
        StructField("codec", StringType(), False),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, float, str]:
    """Deterministic stand-in for a real media decode.

    Real implementation would be e.g. PIL.Image.open / av.open here —
    gated behind an import-try; see decode_features().
    """
    n = len(payload)
    checksum = sum(payload[:256]) if n else 0
    n_frames = 1 + checksum % 30
    feature_0 = round((checksum % 1000) / 1000.0, 6)
    return n_frames, feature_0, "stub/v1"


def decode_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """(doc_id, payload binary) → decoded feature rows, one per document.

    Arrow-batched: each partition streams pandas batches; the decode loop is
    per-batch Python over raw bytes (unavoidable for codec work), never a
    row-at-a-time ``udf()``.
    """
    import pandas as pd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [_fake_decode(b if b is not None else b"") for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": [len(b) if b is not None else 0 for b in pdf[payload_col]],
                    "n_frames": [d[0] for d in decoded],
                    "feature_0": [d[1] for d in decoded],
                    "codec": [d[2] for d in decoded],
                }
            )

    return df.mapInPandas(batches, schema=FEATURE_SCHEMA)
