"""The full extraction pipeline: pages → per-(url, rule) extraction records.

Equivalent of the reference's batch-driver call graph (SURVEY.md §3.2 Spark
recast): scan → [repartition by url-hash] → mapInPandas(parse) → Column-only
layout/selection/geometry → span slice → token labeling → record assembly,
with per-row error containment (J6) — a failed document yields a status row,
never a task failure.

Row contract: exactly ``len(cfg.rules)`` output rows per input url
(success or typed failure), matching the oracle byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from py_image_toolkit_spark.config import ExtractConfig
from py_image_toolkit_spark.functions import vocab as V
from py_image_toolkit_spark.operators.extract_fields import extract_fields_df
from py_image_toolkit_spark.operators.segment import segment_pages
from py_image_toolkit_spark.operators.select import (
    compute_windows_df,
    extract_window_text_df,
    layout_blocks_df,
    select_main_df,
)

SPAN_TYPE = "array<struct<field:string,start:bigint,end:bigint>>"

_META_COLS = [
    "n_blocks", "canvas_w", "canvas_h", "main_block_id",
    "crop_x1", "crop_y1", "crop_x2", "crop_y2",
]
_FIELD_COLS = list(V.OUTPUT_FIELDS)


def _fan_rules(df: DataFrame, cfg: ExtractConfig) -> DataFrame:
    return df.withColumn("rule", F.explode(F.array(*[F.lit(r) for r in cfg.rules])))


def _as_failure(df: DataFrame, message_col, cfg: ExtractConfig, keep_meta: bool) -> DataFrame:
    out = _fan_rules(df, cfg).withColumn("success", F.lit(False)).withColumn(
        "message", message_col
    )
    if not keep_meta:
        out = (
            out.withColumn("n_blocks", F.lit(0).cast("long"))
            .withColumn("canvas_w", F.lit(0).cast("long"))
            .withColumn("canvas_h", F.lit(0).cast("long"))
            .withColumn("main_block_id", F.lit(None).cast("long"))
        )
    for c in ["crop_x1", "crop_y1", "crop_x2", "crop_y2", "main_start", "main_end"]:
        if c not in out.columns:
            out = out.withColumn(c, F.lit(None).cast("long"))
    out = out.withColumn("extracted_text", F.lit(None).cast("string"))
    for f in _FIELD_COLS:
        out = out.withColumn(f, F.lit(None).cast("string"))
    return out.withColumn("spans", F.lit(None).cast(SPAN_TYPE)).withColumn(
        "spans", F.coalesce(F.col("spans"), F.array().cast(SPAN_TYPE))
    )


def _span_struct(field: str, start, end):
    return F.struct(
        F.lit(field).alias("field"),
        start.cast("long").alias("start"),
        end.cast("long").alias("end"),
    )


def extract(pages: DataFrame, cfg: ExtractConfig | None = None, persist: bool = True) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → extraction records.

    ``persist=True`` (default) caches the parse output and the per-url
    window table: both are consumed by several downstream branches (success
    rows + three failure branches) — without it the expensive mapInPandas
    parse re-runs once per branch, and predicate pushdown re-inlines the
    geometry expressions into megabyte-scale filter trees.
    """
    cfg = cfg or ExtractConfig()

    blocks = segment_pages(pages)
    if persist:
        blocks = blocks.persist()
    laid = layout_blocks_df(blocks, cfg)
    main = select_main_df(laid, cfg)
    windows = compute_windows_df(main, cfg)
    if persist:
        windows = windows.persist()
    assembled = extract_window_text_df(laid, windows, cfg)
    if persist:
        assembled = assembled.persist()
    fields = extract_fields_df(assembled, keys=("url", "rule"))

    ok = (
        windows.filter(F.col("crop_x1").isNotNull())
        .join(assembled, ["url", "rule"])
        .join(fields, ["url", "rule"], "left")
        .withColumn("success", F.lit(True))
        .withColumn("message", F.coalesce(F.col("dec_message"), F.lit("")))
    )

    # spans: the main-content window span + first-occurrence field spans
    span_cols = [_span_struct("main", F.col("main_start"), F.col("main_end"))]
    for f in _FIELD_COLS:
        first_tok = F.split(F.col(f), " ", -1)[0]
        pos = F.instr(F.col("extracted_text"), first_tok)
        span_cols.append(
            F.when(
                F.col(f).isNotNull() & (pos > 0),
                _span_struct(f, pos - 1, pos - 1 + F.length(F.col(f))),
            )
        )
    ok = ok.withColumn(
        "spans", F.filter(F.array(*span_cols), lambda x: x.isNotNull())
    )

    # failure branches (typed, per-url → fanned per rule; J6 taxonomy)
    degenerate = _as_failure(
        windows.filter(F.col("crop_x1").isNull()).drop(
            "crop_x1", "crop_y1", "crop_x2", "crop_y2"
        ),
        F.lit("degenerate window"),
        cfg,
        keep_meta=True,
    )

    dec_fail = _as_failure(
        blocks.filter((F.col("block_id") == -1) & ~F.col("dec_success"))
        .select("url", "encoding", F.col("dec_message")),
        F.col("dec_message"),
        cfg,
        keep_meta=False,
    )

    doc_enc = (
        blocks.filter(F.col("dec_success"))
        .groupBy("url")
        .agg(F.min_by("encoding", "block_id").alias("encoding"))
    )
    no_cand = _as_failure(
        doc_enc.join(main.select("url"), "url", "left_anti"),
        F.lit("no blocks detected"),
        cfg,
        keep_meta=False,
    )

    out_cols = (
        ["url", "rule", "success", "message", "encoding"]
        + _META_COLS
        + ["main_start", "main_end", "extracted_text"]
        + _FIELD_COLS
        + ["spans"]
    )
    result = (
        ok.select(*out_cols)
        .unionByName(degenerate.select(*out_cols))
        .unionByName(dec_fail.select(*out_cols))
        .unionByName(no_cand.select(*out_cols))
    )
    return result
