"""Head-metadata extraction from raw HTML — the sidecar fields every
Common-Crawl extraction pipeline emits next to the main content.

Production extractors (trafilatura/resiliparse) return ``title``,
``description``, ``canonical`` and the robots directive alongside the body
text; curation uses them for recrawl dedup (canonical), snippet quality
(description vs body), and compliance gating (noindex pages are dropped
from training corpora). The reference's analog surface is its per-image
metadata passthrough (``ocr.py`` carries filename/size next to the OCR
payload); here the carried metadata is mined from the document itself.

Extraction is deliberately regex-over-bytes, NOT a DOM parse: head metadata
sits in well-formed attribute-quoted tags for the overwhelming majority of
real pages, and one ``regexp_extract`` per field keeps the whole operator
inside whole-stage codegen (the DOM parser in kernels/segment.py remains
the authority for BODY structure). The convention is canonical
attribute-ordered head tags (``<meta name=".." content="..">``); pages
that deviate yield NULL for that field, never an error.

Every regex stays in the Java/RE2 common subset so the DuckDB oracle can
replay the identical patterns byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TITLE_RE = r"(?i)<title[^>]*>([^<]*)</title>"
DESCRIPTION_RE = r'(?i)<meta name="description" content="([^"]*)"'
CANONICAL_RE = r'(?i)<link rel="canonical" href="([^"]*)"'
OG_TITLE_RE = r'(?i)<meta property="og:title" content="([^"]*)"'
ROBOTS_RE = r'(?i)<meta name="robots" content="([^"]*)"'


def _first(html: Column, pattern: str) -> Column:
    # regexp_extract returns '' both for "no match" and "matched empty
    # group"; head metadata treats both as absent → NULL
    return F.nullif(F.regexp_extract(html, pattern, 1), F.lit(""))


def extract_meta(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Per-page head metadata: ``title``, ``description``, ``canonical``,
    ``og_title`` (each NULL when the tag is absent or empty) plus
    ``noindex`` — true iff a robots meta directive contains the token
    ``noindex`` (the field that legally gates a page out of a training
    corpus).

    Scale posture (100 TB): five codegen regexp passes over the html
    column, map-side only — the operator adds NO shuffle and the html
    column never moves; a downstream ``.filter(~noindex)`` prunes before
    any expensive stage runs.
    """
    html = F.col(html_col).cast("string")
    robots = _first(html, ROBOTS_RE)
    return pages.select(
        *pages.columns,
        _first(html, TITLE_RE).alias("title"),
        _first(html, DESCRIPTION_RE).alias("description"),
        _first(html, CANONICAL_RE).alias("canonical"),
        _first(html, OG_TITLE_RE).alias("og_title"),
        F.coalesce(
            F.lower(robots).rlike("(^|[, ])noindex([, ]|$)"), F.lit(False)
        ).alias("noindex"),
    ).drop(html_col)
