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
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
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
        StructField("block_id", IntegerType(), False),
        StructField("tag", StringType(), True),
        StructField("btext", StringType(), True),
        StructField("n_chars", LongType(), True),
        StructField("n_link_chars", LongType(), True),
        StructField("encoding", StringType(), True),
        StructField("dec_message", StringType(), True),
        StructField("dec_success", BooleanType(), False),
    ]
)


def _segment_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out: dict[str, list] = {f.name: [] for f in BLOCKS_SCHEMA.fields}

        def emit(url, block_id, tag, btext, n_link, enc, msg, ok):
            out["url"].append(url)
            out["block_id"].append(block_id)
            out["tag"].append(tag)
            out["btext"].append(btext)
            out["n_chars"].append(len(btext) if btext is not None else 0)
            out["n_link_chars"].append(n_link)
            out["encoding"].append(enc)
            out["dec_message"].append(msg)
            out["dec_success"].append(ok)

        for url, html in zip(pdf["url"], pdf["html"]):
            try:
                html_b = bytes(html) if html is not None else None
                dec = decode_html(html_b)
                if not dec.success:
                    emit(url, -1, None, None, 0, dec.encoding, dec.message, False)
                    continue
                if html_b.startswith(PDF_MAGIC):
                    blocks = extract_pdf_blocks(html_b)
                else:
                    blocks = segment_html(strip_noncontent(dec.text))
                if not blocks:
                    # marker row so the url still flows to the status output
                    emit(url, -1, None, None, 0, dec.encoding, dec.message, True)
                    continue
                for i, b in enumerate(blocks):
                    emit(url, i, b["tag"], b["text"], b["n_link_chars"],
                         dec.encoding, dec.message, True)
            except Exception as e:  # noqa: BLE001 — J6 error containment
                emit(url, -1, None, None, 0, "none", f"parse error: {type(e).__name__}: {e}", False)
        yield pd.DataFrame(out)


def segment_pages(pages: DataFrame) -> DataFrame:
    """pages(url, html, …) → block rows (1 doc → N blocks, ≙ J1 UDTF shape)."""
    return pages.select("url", "html").mapInPandas(_segment_batches, BLOCKS_SCHEMA)
