"""E2 segmentation kernel: HTML → flat list of content blocks.

Graft of the reference's subject detection (reference crop.py:116-176,
``detect_faces_dnn``): each DOM block is a "detected subject" with a bbox in
the rendered-text coordinate space and a confidence score. The detector here
is a dependency-free ``html.parser``-based segmenter (this sandbox has no
lxml/selectolax/bs4); it runs once per document inside an Arrow-batched
``mapInPandas`` stage with a per-partition parser instance (≙ the reference's
once-per-process detector init, crop.py:613-615 — NOT its per-file engine
construction anti-pattern, ocr.py:108).

Output block record (the "face row", crop.py:163-171 analog):
    {"tag": str, "text": str (whitespace-collapsed), "n_link_chars": int}

Geometry (bbox, lines, canvas) is *derived* arithmetic computed downstream —
in pure Column expressions on the engine side, in plain Python in the oracle.
"""

from __future__ import annotations

import re
import zlib
from html import unescape
from html.parser import HTMLParser

# Tags that delimit blocks ("subjects"). Inline tags flow into the enclosing
# block; <a> content is tracked for link-density scoring.
BLOCK_TAGS = frozenset(
    {
        "p", "div", "article", "section", "main", "aside", "nav", "header",
        "footer", "blockquote", "pre", "li", "ul", "ol", "table", "tr", "td",
        "th", "h1", "h2", "h3", "h4", "h5", "h6", "title", "body",
    }
)

_WS_RE = re.compile(r"\s+")


def ws_collapse(s: str) -> str:
    """Canonical whitespace: runs → single space, stripped."""
    return _WS_RE.sub(" ", s).strip()


class _BlockSegmenter(HTMLParser):
    """Accumulates text runs into blocks delimited by BLOCK_TAGS boundaries."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[dict] = []
        self._stack: list[str] = []
        self._pieces: list[tuple[str, bool]] = []  # (raw text, inside <a>)
        self._link_depth = 0

    def _flush(self) -> None:
        if not self._pieces:
            return
        raw = "".join(p for p, _ in self._pieces)
        text = ws_collapse(raw)
        if text:
            n_link = sum(len(ws_collapse(p)) for p, is_link in self._pieces if is_link)
            tag = self._stack[-1] if self._stack else "body"
            self.blocks.append({"tag": tag, "text": text, "n_link_chars": n_link})
        self._pieces = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "a":
            self._link_depth += 1
        elif tag == "br":
            self._pieces.append(("\n", self._link_depth > 0))
        elif tag in BLOCK_TAGS:
            self._flush()
            self._stack.append(tag)

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag == "br":
            self._pieces.append(("\n", self._link_depth > 0))

    def handle_endtag(self, tag: str) -> None:
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
        elif tag in BLOCK_TAGS and tag in self._stack:
            self._flush()
            # lenient recovery on mismatched nesting: pop through `tag`
            while self._stack:
                if self._stack.pop() == tag:
                    break

    def handle_data(self, data: str) -> None:
        if data:
            self._pieces.append((data, self._link_depth > 0))

    def finish(self) -> list[dict]:
        self._flush()
        return self.blocks


def _segment_html_stdlib(html_text: str) -> list[dict]:
    """html.parser-driven segmentation — the reference semantics, and the
    fallback for anything the strict fast scanner below does not accept.

    Never raises on malformed markup — html.parser is lenient by design,
    mirroring the reference's skip-don't-die row handling (crop.py:133-136).
    """
    seg = _BlockSegmenter()
    try:
        seg.feed(html_text)
        seg.close()
    except Exception:  # noqa: BLE001 — malformed input yields partial blocks
        pass
    return seg.finish()


# --- fast path --------------------------------------------------------------
# One compiled regex tokenizes start/end tags in the STRICT agreement zone of
# html.parser and this scanner: plain tag names, well-formed (optionally
# quoted) attributes, '/>' immediately before '>'. Anything else — '<!', a
# bare '<' in text, exotic names, quote soup, CDATA elements — leaves an
# unconsumed '<' (or trips the pre-check) and routes the WHOLE document to
# the stdlib parser. Measured 1.9× on the fixture corpus (stage-level 1.67×,
# kernel docs/s/core 1,971 → 2,808 with the round-4 label work) at
# byte-identical output — differential-tested on the corpus + fuzz inputs.

_FAST_TAG_RE = re.compile(
    r"<(?:"
    r"(/)\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*"  # end tag: groups 1 (slash), 2
    r"|([a-zA-Z][-.a-zA-Z0-9:_]*)"  # start tag name: group 3
    r"((?:\s+[^\s>=/]+(?:\s*=\s*(?:\"[^\"<]*\"|'[^'<]*'|[^\s>'\"]*))?)*)"  # attrs
    r"\s*(/?)"  # self-close: group 5
    r"|![a-zA-Z][^<>\[\]]*"  # simple declaration (<!DOCTYPE html>): no-op;
    # bracketed internal subsets fall back (html.parser scans them specially)
    r")>"
)
_CDATA_RE = re.compile(r"<(script|style)(?![a-zA-Z0-9-])", re.IGNORECASE)


def _segment_html_fast(s: str) -> list[dict] | None:
    """Strict-subset scanner; returns None when the input must fall back.
    State machine is a line-for-line transliteration of _BlockSegmenter."""
    if _CDATA_RE.search(s):
        return None  # html.parser switches to CDATA mode inside these
    blocks: list[dict] = []
    stack: list[str] = []
    pieces: list[tuple[str, bool]] = []
    link_depth = 0
    has_link = False  # any piece in the current block inside <a>

    def flush() -> None:
        nonlocal pieces, has_link
        if not pieces:
            return
        raw = "".join(p for p, _ in pieces)
        text = ws_collapse(raw)
        if text:
            n_link = (
                sum(len(ws_collapse(p)) for p, is_link in pieces if is_link)
                if has_link
                else 0
            )
            tag = stack[-1] if stack else "body"
            blocks.append({"tag": tag, "text": text, "n_link_chars": n_link})
        pieces = []
        has_link = False

    pos = 0
    for m in _FAST_TAG_RE.finditer(s):
        if m.start() > pos:
            seg = s[pos : m.start()]
            if "<" in seg:
                return None  # a '<' the strict grammar could not consume
            if link_depth:
                has_link = True
            pieces.append((unescape(seg) if "&" in seg else seg, link_depth > 0))
        pos = m.end()
        if m.group(1):  # end tag
            tag = m.group(2).lower()
            if tag == "a":
                link_depth = max(0, link_depth - 1)
            elif tag in BLOCK_TAGS and tag in stack:
                flush()
                while stack:
                    if stack.pop() == tag:
                        break
        elif m.group(3) is None:
            continue  # simple declaration — html.parser's handle_decl no-op
        elif m.group(5):  # self-closing: only <br/> does anything
            if m.group(3).lower() == "br":
                if link_depth:
                    has_link = True
                pieces.append(("\n", link_depth > 0))
        else:  # start tag
            tag = m.group(3).lower()
            if tag == "a":
                link_depth += 1
            elif tag == "br":
                if link_depth:
                    has_link = True
                pieces.append(("\n", link_depth > 0))
            elif tag in BLOCK_TAGS:
                flush()
                stack.append(tag)
    tail = s[pos:]
    if "<" in tail:
        return None
    if tail:
        if link_depth:
            has_link = True
        pieces.append((unescape(tail) if "&" in tail else tail, link_depth > 0))
    flush()
    return blocks


def segment_html(html_text: str) -> list[dict]:
    """Parse stripped HTML into an ordered list of content blocks.

    Dispatcher: the strict fast scanner when the document is inside the
    parsers' agreement zone, else the stdlib html.parser — externally the
    two are byte-identical (tests/test_kernels.py differential + fuzz)."""
    out = _segment_html_fast(html_text)
    if out is None:
        return _segment_html_stdlib(html_text)
    return out


# --- PDF branch (north rule: application/pdf payloads) ----------------------
# Minimal layout-order text extraction for the deterministic PDFs produced by
# fixtures.py (closed world, SURVEY.md §7.4.6): BT…ET text objects with
# (…)Tj / […]TJ show operators, optionally inside FlateDecode streams.

PDF_MAGIC = b"%PDF-"

_BT_ET_RE = re.compile(rb"BT(.*?)ET", re.DOTALL)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.DOTALL)
_PAREN_RE = re.compile(rb"\((?:\\.|[^\\()])*\)", re.DOTALL)

_PDF_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape_pdf_string(raw: bytes) -> str:
    body = raw[1:-1]
    out = bytearray()
    i = 0
    while i < len(body):
        c = body[i : i + 1]
        if c == b"\\" and i + 1 < len(body):
            nxt = body[i + 1 : i + 2]
            out.extend(_PDF_ESCAPES.get(nxt, nxt))
            i += 2
        else:
            out.extend(c)
            i += 1
    return out.decode("utf-8", errors="replace")


def extract_pdf_blocks(data: bytes) -> list[dict]:
    """Layout-order text blocks from a PDF payload: one block per BT…ET
    object, runs within an object joined by a single space."""
    buffers = [data]
    for m in _STREAM_RE.finditer(data):
        raw = m.group(1)
        try:
            buffers.append(zlib.decompress(raw))
        except zlib.error:
            continue
    blocks: list[dict] = []
    for buf in buffers:
        for bt in _BT_ET_RE.finditer(buf):
            runs = [_unescape_pdf_string(p.group(0)) for p in _PAREN_RE.finditer(bt.group(1))]
            text = ws_collapse(" ".join(runs))
            if text:
                blocks.append({"tag": "pdf", "text": text, "n_link_chars": 0})
    return blocks
