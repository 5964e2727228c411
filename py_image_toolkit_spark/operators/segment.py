"""E1+E2 parse stage: pages → block rows, as one Arrow-batched mapInPandas.

This is the *only* Python on the hot path (BASELINE.json:6 "zero per-row
Python" refers to per-row interpretation of relational logic — the HTML parse
itself has no Column equivalent; it runs vectorized over Arrow batches with
per-partition amortized setup, ≙ the reference's once-per-process detector
init, crop.py:613-615, and NOT its engine-per-record anti-pattern,
ocr.py:108).

Output: one row per block, plus one ``block_id = -1`` marker row per
document that failed to decode (error containment ≙ reference J6: a failed
row never kills the task, resize.py:125-144).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from py_image_toolkit_spark.kernels.normalize import decode_html, strip_noncontent
from py_image_toolkit_spark.kernels.segment import (
    PDF_MAGIC,
    extract_pdf_blocks,
    segment_html,
)

BLOCKS_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        # H17 metadata passthrough (≙ reference EXIF preservation on save,
        # README.md): doc-level input metadata rides along per block row —
        # constant per doc, so parquet RLE/dictionary encodes it ~free, and
        # no extra join is needed to restore it on the output
        StructField("warc_ts", TimestampType(), True),
        StructField("lang", StringType(), True),
        StructField("block_id", IntegerType(), False),
        StructField("tag", StringType(), True),
        StructField("btext", StringType(), True),
        StructField("n_chars", LongType(), True),
        StructField("n_link_chars", LongType(), True),
        # per-block layout on the virtual text canvas — emitted by the
        # segmenter itself, ≙ the reference detector emitting bboxes
        # (crop.py:163-171); avoids window passes over the block table
        StructField("n_lines", LongType(), True),
        StructField("max_w", LongType(), True),
        StructField("start_line", LongType(), True),
        StructField("cum_chars", LongType(), True),
        # doc-level canvas, replicated per block row
        StructField("canvas_w", LongType(), True),
        StructField("canvas_h", LongType(), True),
        StructField("n_blocks", LongType(), True),
        StructField("encoding", StringType(), True),
        StructField("dec_message", StringType(), True),
        StructField("dec_success", BooleanType(), False),
    ]
)


def _make_segmenter(wrap: int, norm_mode: str = "aspect"):
    def _segment_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in BLOCKS_SCHEMA.fields}

            def emit_marker(url, warc_ts, lang, enc, msg, ok):
                out["url"].append(url)
                out["warc_ts"].append(warc_ts)
                out["lang"].append(lang)
                out["block_id"].append(-1)
                for c in ("tag", "btext"):
                    out[c].append(None)
                for c in ("n_chars", "n_link_chars", "n_lines", "max_w",
                          "start_line", "cum_chars", "canvas_w", "canvas_h",
                          "n_blocks"):
                    out[c].append(0)
                out["encoding"].append(enc)
                out["dec_message"].append(msg)
                out["dec_success"].append(ok)

            def emit_doc(url, warc_ts, lang, blocks, enc, msg):
                line = 0
                cum = 0
                canvas_w = 0
                laid = []
                for i, b in enumerate(blocks):
                    n_chars = len(b["text"])
                    # B8 normalization dispatch — must mirror
                    # oracle/extractor.layout_blocks exactly
                    if norm_mode == "none":
                        n_lines, max_w = 1, n_chars
                    else:
                        n_lines = (n_chars - 1) // wrap + 1
                        if norm_mode == "fixed":
                            max_w = wrap
                        else:
                            max_w = wrap if n_lines > 1 else n_chars
                    laid.append((i, b, n_chars, n_lines, max_w, line, cum))
                    canvas_w = max(canvas_w, max_w)
                    line += n_lines + 1
                    cum += n_chars
                for i, b, n_chars, n_lines, max_w, start_line, cum_chars in laid:
                    out["url"].append(url)
                    out["warc_ts"].append(warc_ts)
                    out["lang"].append(lang)
                    out["block_id"].append(i)
                    out["tag"].append(b["tag"])
                    out["btext"].append(b["text"])
                    out["n_chars"].append(n_chars)
                    out["n_link_chars"].append(b["n_link_chars"])
                    out["n_lines"].append(n_lines)
                    out["max_w"].append(max_w)
                    out["start_line"].append(start_line)
                    out["cum_chars"].append(cum_chars)
                    out["canvas_w"].append(canvas_w)
                    out["canvas_h"].append(line)
                    out["n_blocks"].append(len(laid))
                    out["encoding"].append(enc)
                    out["dec_message"].append(msg)
                    out["dec_success"].append(True)

            for url, warc_ts, lang, html in zip(
                pdf["url"], pdf["warc_ts"], pdf["lang"], pdf["html"]
            ):
                ts = None if pd.isna(warc_ts) else warc_ts
                lg = None if pd.isna(lang) else lang
                try:
                    html_b = bytes(html) if html is not None else None
                    dec = decode_html(html_b)
                    if not dec.success:
                        emit_marker(url, ts, lg, dec.encoding, dec.message, False)
                        continue
                    if html_b.startswith(PDF_MAGIC):
                        blocks = extract_pdf_blocks(html_b)
                    else:
                        blocks = segment_html(strip_noncontent(dec.text))
                    if not blocks:
                        emit_marker(url, ts, lg, dec.encoding, dec.message, True)
                        continue
                    emit_doc(url, ts, lg, blocks, dec.encoding, dec.message)
                except Exception as e:  # noqa: BLE001 — J6 error containment
                    emit_marker(url, ts, lg, "none",
                                f"parse error: {type(e).__name__}: {e}", False)
            yield pd.DataFrame(out)

    return _segment_batches


def segment_pages(
    pages: DataFrame, wrap_width: int = 80, norm_mode: str = "aspect"
) -> DataFrame:
    """pages(url, html, …) → laid block rows (1 doc → N blocks, ≙ J1 UDTF
    shape, with detector-emitted layout geometry). ``warc_ts``/``lang`` pass
    through (H17); inputs lacking them get nulls."""
    cols = [F.col("url")]
    cols.append(
        F.col("warc_ts") if "warc_ts" in pages.columns
        else F.lit(None).cast("timestamp").alias("warc_ts")
    )
    cols.append(
        F.col("lang") if "lang" in pages.columns
        else F.lit(None).cast("string").alias("lang")
    )
    cols.append(F.col("html"))
    return pages.select(*cols).mapInPandas(
        _make_segmenter(wrap_width, norm_mode), BLOCKS_SCHEMA
    )
