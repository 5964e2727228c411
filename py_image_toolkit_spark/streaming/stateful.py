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


def _make_dedup_group(ttl_ms: int | None):
    def _dedup_group(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (content_hash,) = key
        if ttl_ms is not None and state.hasTimedOut:
            # TTL eviction: drop the seen-flag for keys idle past the TTL.
            # Retention contract: a duplicate arriving AFTER eviction
            # re-emits as first-seen — callers choose a TTL wider than the
            # duplicate-arrival window they must suppress.
            state.remove()
            return
        seen = state.get[0] if state.exists else 0
        first_row: dict[str, Any] | None = None
        n = 0
        for pdf in pdfs:
            if seen == 0 and len(pdf):
                # deterministic winner: lowest doc_id across the WHOLE batch
                # — a key's rows can span multiple Arrow chunks of `pdfs`,
                # so the per-chunk minimum must be compared against the
                # running winner (first-chunk-only picks a chunk-order-
                # dependent row)
                idx = pdf["doc_id"].idxmin()
                cand_id = int(pdf["doc_id"][idx])
                if first_row is None or cand_id < first_row["doc_id"]:
                    first_row = {"doc_id": cand_id, "text": pdf["text"][idx]}
            n += len(pdf)
        state.update((seen + n,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        if seen == 0 and first_row is not None:
            yield pd.DataFrame(
                {
                    "content_hash": [content_hash],
                    "doc_id": [first_row["doc_id"]],
                    "text": [first_row["text"]],
                    "n_dropped": [n - 1],
                }
            )
        # else: all occurrences in this batch are duplicates of an earlier
        # batch → emit nothing (n_dropped accounting lives in the counter)

    return _dedup_group


def streaming_exact_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    state_ttl_minutes: int | None = None,
) -> DataFrame:
    """streaming docs(id, text) → first-seen rows only, across ALL
    micro-batches. Output: (content_hash, doc_id, text, n_dropped).

    ``state_ttl_minutes`` bounds state growth: without it the store holds
    one entry per distinct hash forever (O(distinct docs) — fine for a
    bounded backfill, unbounded on a perpetual stream). With a TTL, keys
    idle longer than the window are evicted via ProcessingTimeTimeout and a
    later duplicate re-emits — the standard streaming-dedup retention
    trade; pick the TTL ≥ the duplicate-arrival window to suppress.

    TTL mode is for CONTINUOUS triggers: with processing-time timeouts the
    engine keeps scheduling micro-batches to service future timeout
    callbacks, so the query never self-terminates — a Trigger.AvailableNow
    drain would hang at shutdown. For bounded backfills use the default
    (no TTL); for TTL streams stop() the query explicitly."""
    hashed = docs.select(
        F.md5(F.encode(F.col(text_col), "UTF-8")).alias("content_hash"),
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).alias("text"),
    )
    ttl_ms = None if state_ttl_minutes is None else state_ttl_minutes * 60_000
    return hashed.groupBy("content_hash").applyInPandasWithState(
        _make_dedup_group(ttl_ms),
        outputStructType=DEDUP_OUTPUT,
        stateStructType=DEDUP_STATE,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if ttl_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )
