"""Custom stateful streaming operators (applyInPandasWithState).

``streaming_exact_dedup``: cross-micro-batch exact deduplication — the
streaming form of operators/dedup.exact_dedup. A training-data ingest stream
must emit each distinct document text once, even when duplicates arrive in
DIFFERENT micro-batches, which a per-batch dropDuplicates cannot do; the
seen-set lives in Spark's keyed state store, partitioned by content hash, so
state lookups shuffle exactly like the batch hash-groupBy.

Scale notes: state per key is one boolean flag + counters (bytes), keyed by
md5 — uniform distribution, no hot keys; RocksDB state store handles the
10^12-key regime, configured by the deployment (no code change).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType,
)

DEDUP_OUTPUT = StructType(
    [
        StructField("content_hash", StringType(), False),
        StructField("doc_id", LongType(), True),
        StructField("text", StringType(), True),
        StructField("n_dropped", LongType(), False),
    ]
)

DEDUP_STATE = StructType(
    [
        StructField("seen", LongType(), False),  # total occurrences so far
    ]
)


def _dedup_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (content_hash,) = key
    seen = state.get[0] if state.exists else 0
    first_row: dict[str, Any] | None = None
    n = 0
    for pdf in pdfs:
        if seen == 0 and first_row is None and len(pdf):
            # deterministic winner within the batch: lowest doc_id
            idx = pdf["doc_id"].idxmin()
            first_row = {"doc_id": int(pdf["doc_id"][idx]), "text": pdf["text"][idx]}
        n += len(pdf)
    state.update((seen + n,))
    if seen == 0 and first_row is not None:
        yield pd.DataFrame(
            {
                "content_hash": [content_hash],
                "doc_id": [first_row["doc_id"]],
                "text": [first_row["text"]],
                "n_dropped": [n - 1],
            }
        )
    # else: all occurrences in this batch are duplicates of an earlier batch
    # → emit nothing (n_dropped accounting lives in the state counter)


def streaming_exact_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """streaming docs(id, text) → first-seen rows only, across ALL
    micro-batches. Output: (content_hash, doc_id, text, n_dropped)."""
    hashed = docs.select(
        F.md5(F.encode(F.col(text_col), "UTF-8")).alias("content_hash"),
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).alias("text"),
    )
    return hashed.groupBy("content_hash").applyInPandasWithState(
        _dedup_group,
        outputStructType=DEDUP_OUTPUT,
        stateStructType=DEDUP_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
