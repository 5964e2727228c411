"""E1 decode/strip + E2 segmentation + PDF kernels."""

import zlib

from py_image_toolkit_spark.kernels.normalize import decode_html, strip_noncontent
from py_image_toolkit_spark.kernels.segment import (
    extract_pdf_blocks,
    segment_html,
    ws_collapse,
)


def test_decode_bom():
    r = decode_html(b"\xef\xbb\xbfhello")
    assert r.success and r.encoding == "utf-8-sig" and r.text == "hello"


def test_decode_declared_euckr():
    html = '<meta charset="euc-kr"><p>한글</p>'.encode("euc-kr")
    r = decode_html(html)
    assert r.success and r.encoding == "euc-kr" and "한글" in r.text


def test_decode_mismatched_meta_falls_back():
    # body is euc-kr but meta claims utf-8 → strict utf-8 fails → replace
    html = '<meta charset="utf-8"><p>한글</p>'.encode("euc-kr")
    r = decode_html(html)
    assert r.success and r.encoding == "utf-8/replace" and "�" in r.text


def test_decode_empty_is_typed_failure():
    assert not decode_html(b"").success
    assert not decode_html(None).success


def test_strip_noncontent():
    s = strip_noncontent(
        "<script>var x=1</script>a<style>p{}</style>b<!-- c -->d<script>open"
    )
    assert s == "abd"


def test_ws_collapse():
    assert ws_collapse("  a\t\nb   c ") == "a b c"


def test_segment_blocks_and_link_density():
    html = (
        "<body><nav><a href='/'>home</a> <a href='/x'>news</a></nav>"
        "<article>real content here</article>"
        "<p>para <a href='y'>link</a> tail</p></body>"
    )
    blocks = segment_html(html)
    texts = [b["text"] for b in blocks]
    assert "real content here" in texts
    nav = next(b for b in blocks if b["text"] == "home news")
    assert nav["n_link_chars"] == len("home") + len("news")
    p = next(b for b in blocks if b["text"].startswith("para"))
    assert p["n_link_chars"] == len("link")


def test_segment_malformed_never_raises():
    assert isinstance(segment_html("<div><p>a</div>< broken <<"), list)
    assert segment_html("") == []


def test_segment_nested_attribution():
    blocks = segment_html("<div>aa<p>bb</p>cc</div>")
    assert [(b["tag"], b["text"]) for b in blocks] == [
        ("div", "aa"), ("p", "bb"), ("div", "cc")
    ]


def test_pdf_plain_and_flate():
    body = b"BT (hello \\(world\\)) Tj ET\nBT (second) Tj ET"
    pdf = b"%PDF-1.4\n" + body + b"\n%%EOF"
    blocks = extract_pdf_blocks(pdf)
    assert [b["text"] for b in blocks] == ["hello (world)", "second"]

    stream = zlib.compress(b"BT (compressed text) Tj ET")
    pdf2 = (b"%PDF-1.4\n2 0 obj << /Filter /FlateDecode >>\nstream\n"
            + stream + b"\nendstream\n%%EOF")
    assert [b["text"] for b in extract_pdf_blocks(pdf2)] == ["compressed text"]


def test_blocks_are_disjoint_on_canvas():
    """B3 (NMS/overlap-dedup) is moot BY CONSTRUCTION: the virtual-canvas
    layout assigns each block a contiguous line range [start_line,
    start_line + n_lines) followed by one separator line, so block boxes can
    never overlap — this property test checks the invariant instead of
    assuming it (round-1 VERDICT item 9)."""
    from py_image_toolkit_spark.config import ExtractConfig
    from py_image_toolkit_spark.fixtures import pages_pandas
    from py_image_toolkit_spark.oracle.extractor import layout_blocks
    from py_image_toolkit_spark.kernels.normalize import decode_html, strip_noncontent
    from py_image_toolkit_spark.kernels.segment import PDF_MAGIC, extract_pdf_blocks, segment_html

    checked = 0
    for mode in ("aspect", "fixed", "none"):
        for _, row in pages_pandas(60).iterrows():
            html = bytes(row["html"])
            dec = decode_html(html)
            if not dec.success:
                continue
            raw = (extract_pdf_blocks(html) if html.startswith(PDF_MAGIC)
                   else segment_html(strip_noncontent(dec.text)))
            laid, canvas_w, canvas_h = layout_blocks(raw, ExtractConfig().wrap_width, mode)
            prev_end = -1
            for b in laid:
                assert b.start_line > prev_end, (mode, b.block_id)
                assert b.n_lines >= 1 and b.max_w <= canvas_w
                prev_end = b.start_line + b.n_lines - 1
                checked += 1
            if laid:
                assert canvas_h == prev_end + 2  # trailing separator line
    assert checked > 100  # non-vacuous across modes


def test_segment_fast_path_differential_corpus():
    """The fast scanner's dispatcher output must equal the stdlib parser on
    EVERY fixture document (all encodings, records, junk variants) — the
    fast path is a perf rewrite, not a semantic fork."""
    from py_image_toolkit_spark.fixtures import page_row
    from py_image_toolkit_spark.kernels.normalize import decode_html, strip_noncontent
    from py_image_toolkit_spark.kernels.segment import (
        PDF_MAGIC,
        _segment_html_stdlib,
        segment_html,
    )

    n_fast = 0
    for i in range(1500):
        r = page_row(i)
        if r["html"] is None or bytes(r["html"]).startswith(PDF_MAGIC):
            continue
        dec = decode_html(bytes(r["html"]))
        if not dec.success:
            continue
        s = strip_noncontent(dec.text)
        got = segment_html(s)
        ref = _segment_html_stdlib(s)
        assert got == ref, f"divergence at doc {i}"
        from py_image_toolkit_spark.kernels.segment import _segment_html_fast

        if _segment_html_fast(s) is not None:
            n_fast += 1
    # the fast path must actually cover the bulk of the corpus
    assert n_fast > 1000


def test_segment_fast_path_differential_fuzz():
    """Adversarial soup: random tag fragments, entities, quotes, '<!',
    truncations — whatever path the dispatcher takes, output equals the
    stdlib parser (fallback correctness is part of the contract)."""
    import random

    from py_image_toolkit_spark.kernels.segment import (
        _segment_html_stdlib,
        segment_html,
    )

    rng = random.Random(23)
    atoms = [
        "<p>", "</p>", "<div>", "</div>", "<a href='x'>", "<a>", "</a>",
        "<br>", "<br/>", "<br />", "text ", "&amp;", "&#65;", "&bogus;",
        "< notag", "<!doctype html>", "<!-- c -->", "<x-y>", "</x-y>",
        "<a b=c>", "<a b=\"c>d\">", "<a b='it", "'s>", "<p", ">", "plain<",
        "<A HREF=Z>", "</A>", "&lt;p&gt;", "\n", "  ", "<em>i</em>",
        "<li>item</li>", "<td>c</td>", "<h1>t</h1>", "<p/>", "<div/>",
    ]
    for trial in range(400):
        s = "".join(rng.choice(atoms) for _ in range(rng.randrange(0, 25)))
        assert segment_html(s) == _segment_html_stdlib(s), f"trial {trial}: {s!r}"


def test_segment_fast_path_handles_entities_and_links():
    from py_image_toolkit_spark.kernels.segment import (
        _segment_html_fast,
        _segment_html_stdlib,
    )

    s = ("<body><p>Tom &amp; Jerry &#65; &lt;tag&gt;</p>"
         "<p><a href='/x'>link one</a> rest</p></body>")
    fast = _segment_html_fast(s)
    assert fast is not None  # must take the fast path
    assert fast == _segment_html_stdlib(s)
    assert fast[0]["text"] == "Tom & Jerry A <tag>"
    assert fast[1]["n_link_chars"] == len("link one")
