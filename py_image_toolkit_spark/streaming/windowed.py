"""Event-time windowed aggregation with watermarked late-data handling.

The crawl-monitoring view of an extraction stream: per-host document counts
over tumbling event-time (warc_ts) windows. The watermark bounds aggregation
state — without it, every window ever seen stays in the state store forever
(unbounded at 10^12 docs); with it, windows older than the watermark are
finalized, emitted exactly once (append mode), and their state dropped.
Rows arriving later than the watermark are discarded by the engine — the
documented late-data contract, demonstrated by test_streaming_windowed.py
across two AvailableNow drains sharing a checkpoint (the watermark persists
in the commit log, so a restart cannot resurrect an already-final window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from py_image_toolkit_spark.operators.web import host_of


def dedup_within_watermark(
    pages: DataFrame,
    key_cols: tuple[str, ...] = ("url",),
    watermark: str = "10 minutes",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Streaming exact dedup via the BUILT-IN dropDuplicatesWithinWatermark:
    state for a key is held only within the watermark horizon, so re-crawls
    of the same url inside the window are suppressed and state is bounded
    by construction — the engine-native complement to
    streaming/stateful.py's applyInPandasWithState dedup (which adds
    custom winner election and TTL semantics the built-in cannot express).
    Use this form when "first arrival wins within a bounded horizon" is the
    whole requirement: no Python state function, full Tungsten path."""
    return pages.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def windowed_host_counts(
    pages: DataFrame,
    window: str = "10 minutes",
    watermark: str = "5 minutes",
    ts_col: str = "warc_ts",
    url_col: str = "url",
) -> DataFrame:
    """Streaming (or batch) DataFrame → per-(event-time window, host) doc
    counts. On a stream, pair with ``outputMode("append")``: a window row is
    emitted exactly once, when the watermark passes its end."""
    return (
        pages.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window).alias("w"),
            host_of(F.col(url_col)).alias("host"),
        )
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "host",
            "n_docs",
        )
    )
