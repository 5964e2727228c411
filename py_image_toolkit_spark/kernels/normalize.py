"""E1 normalize kernel: charset-sniff + decode + boilerplate-tag strip.

Graft of the reference's image decode / resize stage (reference
resize.py:104, crop.py:356-375): the "deserializer" that turns raw bytes into
the canonical in-memory representation. Error semantics mirror the
reference's typed failure taxonomy (Pillow's ``UnidentifiedImageError`` →
(success=False, message); reference resize.py:125-144): a malformed payload
never raises — it yields a status record.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_BOM_UTF8 = b"\xef\xbb\xbf"

# charset sniff inside the first 2 KiB, e.g. <meta charset="euc-kr"> or
# <meta http-equiv=... content="text/html; charset=utf-8">
_CHARSET_RE = re.compile(rb"charset\s*=\s*[\"']?\s*([A-Za-z0-9_\-]+)", re.IGNORECASE)

_CODEC_ALIASES = {
    "utf8": "utf-8",
    "utf-8": "utf-8",
    "euckr": "euc-kr",
    "euc-kr": "euc-kr",
    "ks_c_5601-1987": "euc-kr",
    "cp949": "cp949",
    "iso-8859-1": "latin-1",
    "latin-1": "latin-1",
    "latin1": "latin-1",
    "ascii": "ascii",
    "us-ascii": "ascii",
}

# Strip non-content markup before segmentation (≙ the reference's
# RGB→BGR representation normalization, crop.py:364-365 — the step that puts
# the payload into the form the detector expects).
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_SCRIPT_RE = re.compile(r"<script\b.*?</script\s*>", re.IGNORECASE | re.DOTALL)
_STYLE_RE = re.compile(r"<style\b.*?</style\s*>", re.IGNORECASE | re.DOTALL)
# unterminated script/style: drop to end of document
_OPEN_SCRIPT_RE = re.compile(r"<(?:script|style)\b.*\Z", re.IGNORECASE | re.DOTALL)


@dataclass(frozen=True)
class DecodeResult:
    text: str
    encoding: str
    success: bool
    message: str


def sniff_charset(data: bytes) -> str | None:
    """Return the canonical codec name declared in the payload, if any."""
    if data.startswith(_BOM_UTF8):
        return "utf-8-sig"
    m = _CHARSET_RE.search(data[:2048])
    if m:
        return _CODEC_ALIASES.get(m.group(1).decode("ascii", "ignore").lower())
    return None


def decode_html(data: bytes | None) -> DecodeResult:
    """bytes → unicode with declared-charset-first, utf-8 fallback.

    A *mismatching* declared charset (fixture case, FIXTURES.md §2) falls
    through to utf-8, then to utf-8 with replacement — always returns text,
    never raises.
    """
    if not data:
        return DecodeResult("", "none", False, "empty input")
    sniffed = sniff_charset(data)
    candidates = []
    if sniffed:
        candidates.append(sniffed)
    if "utf-8" not in candidates and "utf-8-sig" not in candidates:
        candidates.append("utf-8")
    for codec in candidates:
        try:
            return DecodeResult(data.decode(codec), codec, True, "")
        except (UnicodeDecodeError, LookupError):
            continue
    return DecodeResult(
        data.decode("utf-8", errors="replace"),
        "utf-8/replace",
        True,
        "decode fallback: undecodable bytes replaced",
    )


def strip_noncontent(html_text: str) -> str:
    """Remove comments, <script>…</script>, <style>…</style>."""
    out = _COMMENT_RE.sub("", html_text)
    out = _SCRIPT_RE.sub("", out)
    out = _STYLE_RE.sub("", out)
    out = _OPEN_SCRIPT_RE.sub("", out)
    return out
