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


TABLE_RE = r"(?is)<table[^>]*>(.*?)</table>"
TR_RE = r"(?is)<tr[^>]*>(.*?)</tr>"
CELL_RE = r"(?is)<t[dh][^>]*>(.*?)</t[dh]>"


def extract_tables(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Structured-data mining: every ``<table>`` in the raw HTML becomes
    (url, table_idx, row_idx, col_idx, cell_text) rows — the tabular
    sidecar a trafilatura-class extractor emits next to main content
    (tables carry a disproportionate share of a page's factual data and
    are usually EXCLUDED from the prose stream, so they need their own
    channel).

    Same regex-over-bytes stance as extract_meta: three lazy-quantifier
    passes (tables → rows → cells, all in the Java/RE2 common subset with
    ``(?is)``), cell text tag-stripped and whitespace-collapsed. Markup
    that deviates yields fewer cells, never an error.

    Scale posture (10^12 pages): three map-side ``posexplode`` levels,
    zero shuffle — indices are per-parent positions, so the output is
    deterministic without any ordering pass.
    """
    html_text = F.col(html_col).cast("string")
    tables = pages.select(
        F.col(url_col),
        F.posexplode(
            F.regexp_extract_all(html_text, F.lit(TABLE_RE), 1)
        ).alias("table_idx", "_t"),
    )
    rows = tables.select(
        url_col,
        "table_idx",
        F.posexplode(
            F.regexp_extract_all(F.col("_t"), F.lit(TR_RE), 1)
        ).alias("row_idx", "_r"),
    )
    cells = rows.select(
        url_col,
        "table_idx",
        "row_idx",
        F.posexplode(
            F.regexp_extract_all(F.col("_r"), F.lit(CELL_RE), 1)
        ).alias("col_idx", "_c"),
    )
    text = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.col("_c"), r"<[^>]*>", ""), r"\s+", " "
        )
    )
    return cells.select(
        url_col,
        F.col("table_idx").cast("long").alias("table_idx"),
        F.col("row_idx").cast("long").alias("row_idx"),
        F.col("col_idx").cast("long").alias("col_idx"),
        text.alias("cell_text"),
    )


HEADING_RE = r"(?is)<h([1-6])[^>]*>(.*?)</h([1-6])>"


def extract_headings(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Document outline mining: every <h1>-<h6> in order becomes
    (url, heading_idx, level, heading_text) — the skeleton used for
    chunk titling (prepend the governing heading to each chunk), quality
    signals (no-outline pages are usually boilerplate), and
    section-aware dedup.

    Both the opening and closing levels are CAPTURED (RE2 has no
    backreferences, and the oracle replays these patterns in RE2) and
    compared after the match, so a mismatched ``<h2>…</h3>`` pair is
    dropped rather than mis-leveled. ``heading_idx`` is the position in
    the candidate-match stream, so it is deterministic without any
    ordering pass; tag-strip + whitespace-collapse like extract_tables.
    One map-side posexplode, zero shuffle.
    """
    html_text = F.col(html_col).cast("string")
    hs = pages.select(
        F.col(url_col),
        F.posexplode(
            F.regexp_extract_all(html_text, F.lit(HEADING_RE), 0)
        ).alias("heading_idx", "_h"),
    )
    open_lvl = F.regexp_extract(F.col("_h"), r"(?is)^<h([1-6])", 1)
    close_lvl = F.regexp_extract(F.col("_h"), r"(?is)</h([1-6])>$", 1)
    body = F.regexp_extract(F.col("_h"), HEADING_RE, 2)
    text = F.trim(
        F.regexp_replace(F.regexp_replace(body, r"<[^>]*>", ""), r"\s+", " ")
    )
    return hs.filter(open_lvl == close_lvl).select(
        url_col,
        F.col("heading_idx").cast("long").alias("heading_idx"),
        open_lvl.cast("long").alias("level"),
        text.alias("heading_text"),
    )
