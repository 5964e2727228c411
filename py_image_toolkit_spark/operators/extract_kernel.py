"""Fused H16+E3 Arrow kernel: crop-window text slicing + field extraction
in one vectorized Python stage (the production default).

Why: the Column form of H16 slices every wrapped line with
``transform(sequence, i -> substring(...))`` — higher-order lambdas are
evaluated *interpreted* by Catalyst (stack samples show
``Substring.nullSafeEval`` dominating) and the allocation storm scales
badly across cores. Per-doc string work is exactly what the CPython/C string
machinery is fastest at; the kernel applies the oracle's own pure functions
(byte-identical by construction). The Column implementations remain in
operators/select.py + extract_fields.py, parity-tested and SQL-verified.

Dataflow: laid blocks → groupBy(url) collect (ONE shuffle) → join with the
per-url window rects → mapInPandas emitting one row per (url, rule).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType, TimestampType,
)

from py_image_toolkit_spark.config import ExtractConfig
from py_image_toolkit_spark.functions import vocab as V
from py_image_toolkit_spark.oracle.extractor import char_span, crop_text
from py_image_toolkit_spark.oracle.labeling import extract_fields

FUSED_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("rule", StringType(), False),
        # doc-level meta rides through the kernel so success rows come out
        # COMPLETE — no join-back of the text-bearing output to the window
        # table (which would shuffle every extracted byte a second time)
        StructField("warc_ts", TimestampType(), True),
        StructField("lang", StringType(), True),
        StructField("encoding", StringType(), True),
        StructField("dec_message", StringType(), True),
        StructField("n_blocks", LongType(), True),
        StructField("canvas_w", LongType(), True),
        StructField("canvas_h", LongType(), True),
        StructField("main_block_id", LongType(), True),
        StructField("crop_x1", LongType(), True),
        StructField("crop_y1", LongType(), True),
        StructField("crop_x2", LongType(), True),
        StructField("crop_y2", LongType(), True),
        StructField("extracted_text", StringType(), True),
        StructField("main_start", LongType(), True),
        StructField("main_end", LongType(), True),
    ]
    + [StructField(f, StringType(), True) for f in V.OUTPUT_FIELDS]
)

_META_KEYS = (
    "warc_ts", "lang", "encoding", "dec_message",
    "n_blocks", "canvas_w", "canvas_h", "main_block_id",
)


def _make_stream_kernel(wrap: int, norm_mode: str = "aspect"):
    """Streaming-group kernel: consumes FLAT block rows (url-clustered and
    block_id-sorted within each partition) and flushes one url-group at a
    time. No collect_list/array_sort aggregation ever materializes an
    array<struct> of a whole document JVM-side — measured at 400k docs /
    local[16], the ObjectHashAggregate + re-shuffle version cost ~24 s where
    this streams through the already-partitioned rows. A url's blocks may
    span Arrow batch boundaries, so the in-progress group carries over and
    the final group flushes at iterator end."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out: dict[str, list] = {f.name: [] for f in FUSED_SCHEMA.fields}
        cur_url = None
        cur_meta = None
        cur_rects = None
        lines: list[str] = []

        def flush():
            for r in cur_rects:
                rect = (int(r["crop_x1"]), int(r["crop_y1"]),
                        int(r["crop_x2"]), int(r["crop_y2"]))
                text = crop_text(lines, rect)
                start, end = char_span(lines, rect)
                fields = extract_fields(text.split())
                out["url"].append(cur_url)
                out["rule"].append(r["rule"])
                for k, v in zip(_META_KEYS, cur_meta):
                    out[k].append(v)
                out["crop_x1"].append(rect[0])
                out["crop_y1"].append(rect[1])
                out["crop_x2"].append(rect[2])
                out["crop_y2"].append(rect[3])
                out["extracted_text"].append(text)
                out["main_start"].append(start)
                out["main_end"].append(end)
                for f in V.OUTPUT_FIELDS:
                    out[f].append(fields[f])

        for pdf in batches:
            for url, btext, n_lines, rects, *meta in zip(
                pdf["url"], pdf["btext"], pdf["n_lines"], pdf["rects"],
                *[pdf[k] for k in _META_KEYS],
            ):
                if url != cur_url:
                    if cur_url is not None:
                        flush()
                    cur_url, cur_rects, cur_meta, lines = url, rects, meta, []
                if norm_mode == "none":
                    lines.append(btext)
                else:
                    lines.extend(
                        btext[i * wrap : (i + 1) * wrap] for i in range(int(n_lines))
                    )
                lines.append("")
            if len(out["url"]) >= 1024:  # bound memory: emit completed groups
                yield pd.DataFrame(out)
                out = {f.name: [] for f in FUSED_SCHEMA.fields}
        if cur_url is not None:
            flush()
        if out["url"]:
            yield pd.DataFrame(out)

    return run


def fused_extract_df(
    laid: DataFrame,
    windows: DataFrame,
    cfg: ExtractConfig,
    assume_url_clustered: bool = False,
) -> DataFrame:
    """laid blocks + per-(url, rule) rects → (url, rule, extracted_text,
    span, 6 fields).

    Scale shape: rects (5 small ints × rules per url) are aggregated per url
    and joined onto the FLAT block rows — when ``laid`` is already
    hash-partitioned by url (plans/pipeline.py stages it that way), both the
    rects aggregation and the join are shuffle-free, and the only data
    movement left in the whole extract stage is the map-side sort of each
    partition. The text column is never shuffled again and never built into
    per-document arrays.

    Precondition: the streaming kernel flushes a url-group per contiguous
    run, so every url's rows must land in ONE partition. A shuffled url
    equijoin guarantees this, but when the rects side broadcasts, ``laid``'s
    own partitioning survives — a url split across partitions would emit
    duplicated (url, rule) rows with truncated text. Default
    ``assume_url_clustered=False`` therefore repartitions the joined rows by
    url; plans/pipeline.py passes True because it stages ``laid``
    url-partitioned (round-2 advice: assert-or-repartition, not assume)."""
    wg = (
        windows.filter(F.col("crop_x1").isNotNull())
        .groupBy("url")
        .agg(
            F.collect_list(
                F.struct("rule", "crop_x1", "crop_y1", "crop_x2", "crop_y2")
            ).alias("rects"),
            # doc-level meta: identical across a url's rule rows by
            # construction (it comes from the per-url main selection)
            *[F.first(k).alias(k) for k in _META_KEYS],
        )
    )
    flat = laid.select("url", "block_id", "btext", "n_lines").join(wg, "url")
    if not assume_url_clustered:
        n = flat.sparkSession.sparkContext.defaultParallelism * 2
        flat = flat.repartition(n, F.col("url"))
    flat = flat.sortWithinPartitions("url", "block_id")
    return flat.mapInPandas(
        _make_stream_kernel(cfg.wrap_width, cfg.norm_mode), FUSED_SCHEMA
    )
