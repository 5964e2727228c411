"""As-of (point-in-time) join — the training-data assembly primitive.

For every left row, attach the payload of the LATEST right row with
``right.ts <= left.ts`` for the same key (feature-store semantics: "the
newest feature/snapshot known at event time", e.g. the robots.txt or host
reputation snapshot in force when a page was crawled).

Spark has no native as-of join; the naive encodings are a range join
(O(L×R) per key worst-case explosion) or a per-key collect+search UDF
(Python on the hot path). This implementation is the union-window trick:

  1. tag left rows side=1 and right rows side=0 and union them;
  2. one window per key ordered by (ts, side, right-order column), taking
     ``last(right_payload_struct, ignorenulls=True)`` over the preceding
     frame — each left row sees exactly the most recent right row at or
     before its timestamp (ties: a right row at the SAME ts wins, because
     side 0 sorts first);
  3. keep the side=1 rows.

Scale posture (100 TB): ONE shuffle of |L|+|R| rows keyed on the join key,
one sort inside each partition — no row multiplication ever, skewed keys
handled by AQE like any other keyed window. The payload travels as a
single struct so every attached column provably comes from the SAME
matched right row.

Among right rows sharing (key, ts), the one greatest under ``right_order``
wins — pass a unique column (an id) for deterministic, engine-independent
output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    right_order: str | None = None,
    prefix: str = "r_",
) -> DataFrame:
    """Left as-of join. Returns every ``left`` row plus ``prefix``-named
    copies of ``right_cols`` (NULL when no right row precedes it).

    ``right_order``: tie-break column among right rows with equal
    (key, ts) — the greatest value wins. Defaults to the first payload
    column."""
    on = [on] if isinstance(on, str) else list(on)
    right_cols = right_cols or [
        c for c in right.columns if c not in on and c != ts_col
    ]
    right_order = right_order or right_cols[0]

    payload = F.struct(*[F.col(c).alias(c) for c in right_cols])
    r = right.select(
        *on,
        F.col(ts_col),
        F.lit(0).alias("_side"),
        F.col(right_order).alias("_rord"),
        payload.alias("_r"),
    )
    l_cols = [c for c in left.columns]
    l = left.select(
        *l_cols,
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_rord"].dataType).alias("_rord"),
        F.lit(None).cast(r.schema["_r"].dataType).alias("_r"),
    )
    u = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc(), F.col("_rord").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("_m", F.last("_r", ignorenulls=True).over(w))
    out = matched.filter(F.col("_side") == 1).select(
        *l_cols,
        *[F.col("_m")[c].alias(f"{prefix}{c}") for c in right_cols],
    )
    return out
