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
    LongType, StringType, StructField, StructType,
)

from py_image_toolkit_spark.config import ExtractConfig
from py_image_toolkit_spark.functions import vocab as V
from py_image_toolkit_spark.oracle.extractor import char_span, crop_text
from py_image_toolkit_spark.oracle.labeling import extract_fields

FUSED_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("rule", StringType(), False),
        StructField("extracted_text", StringType(), True),
        StructField("main_start", LongType(), True),
        StructField("main_end", LongType(), True),
    ]
    + [StructField(f, StringType(), True) for f in V.OUTPUT_FIELDS]
)


def _make_kernel(wrap: int):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in FUSED_SCHEMA.fields}
            for url, blks, rects in zip(pdf["url"], pdf["blks"], pdf["rects"]):
                lines: list[str] = []
                for b in blks:  # already sorted by block_id
                    text = b["btext"]
                    n_lines = int(b["n_lines"])
                    lines.extend(text[i * wrap : (i + 1) * wrap] for i in range(n_lines))
                    lines.append("")
                for r in rects:
                    rect = (int(r["crop_x1"]), int(r["crop_y1"]),
                            int(r["crop_x2"]), int(r["crop_y2"]))
                    text = crop_text(lines, rect)
                    start, end = char_span(lines, rect)
                    fields = extract_fields(text.split())
                    out["url"].append(url)
                    out["rule"].append(r["rule"])
                    out["extracted_text"].append(text)
                    out["main_start"].append(start)
                    out["main_end"].append(end)
                    for f in V.OUTPUT_FIELDS:
                        out[f].append(fields[f])
            yield pd.DataFrame(out)

    return run


def fused_extract_df(laid: DataFrame, windows: DataFrame, cfg: ExtractConfig) -> DataFrame:
    """laid blocks + per-(url, rule) rects → (url, rule, extracted_text,
    span, 6 fields)."""
    bg = laid.groupBy("url").agg(
        F.array_sort(
            F.collect_list(F.struct("block_id", "btext", "n_lines"))
        ).alias("blks")
    )
    wg = (
        windows.filter(F.col("crop_x1").isNotNull())
        .groupBy("url")
        .agg(
            F.collect_list(
                F.struct("rule", "crop_x1", "crop_y1", "crop_x2", "crop_y2")
            ).alias("rects")
        )
    )
    j = bg.join(wg, "url")
    n = 2 * laid.sparkSession.sparkContext.defaultParallelism
    return j.repartition(n).mapInPandas(_make_kernel(cfg.wrap_width), FUSED_SCHEMA)
