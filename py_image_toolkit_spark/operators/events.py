"""Event-stream operators over the driver's events table — the classic
web-analytics shapes (time-gap sessionization) as pure Window/agg code.

Timestamps are compared and reported in exact int64 epoch MICROseconds
(`unix_micros` / DuckDB `epoch_us` — parquet's native timestamp unit), so
every derived quantity is integer arithmetic and bit-identical across
engines; no float seconds, no timezone rendering in the compare path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize_gaps(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_s: int = 1800,
) -> DataFrame:
    """Time-gap sessionization (the 30-minute web session): a user's new
    session starts when the gap since their previous event exceeds
    ``gap_s``. Returns the per-session rollup:

        user, session_id (user-local ordinal from 1),
        n_events, session_start_us, session_end_us, duration_s

    Ties on equal timestamps break by the event id, so session numbering
    is deterministic.

    Scale posture (10^12 events): one user-keyed window (lag + running
    sum — both over the SAME partitioning/ordering, one shuffle) and one
    (user, session) groupBy that reuses the partitioning; all aggregates
    algebraic. Sessions never materialize event lists.
    """
    # parquet timestamps read as TIMESTAMP_NTZ; the engine pins the session
    # zone to UTC (session.py), so this cast makes unix_micros ≡ DuckDB's
    # epoch_us on the same naive values
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = events.select(F.col(user_col), us.alias("_us"), F.col(id_col))
    w = Window.partitionBy(user_col).orderBy("_us", id_col)
    prev = F.lag("_us").over(w)
    new_s = (
        prev.isNull() | ((F.col("_us") - prev) > int(gap_s) * 1_000_000)
    ).cast("long")
    s = base.withColumn("session_id", F.sum(new_s).over(w))
    return (
        s.groupBy(user_col, "session_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min("_us").alias("session_start_us"),
            F.max("_us").alias("session_end_us"),
        )
        .withColumn(
            "duration_s",
            F.expr("(session_end_us - session_start_us) DIV 1000000"),
        )
        .select(
            user_col,
            F.col("session_id").cast("long").alias("session_id"),
            "n_events",
            "session_start_us",
            "session_end_us",
            "duration_s",
        )
    )
