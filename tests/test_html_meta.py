"""Unit tests for head-metadata extraction (operators/html_meta.py)."""

from py_image_toolkit_spark.operators.html_meta import extract_meta


def _pages(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, url string, html string")


def test_extract_meta_fields(spark):
    rows = [
        (
            1,
            "https://a.example/1",
            '<html><head><title>Hello</title>'
            '<meta name="description" content="A page">'
            '<link rel="canonical" href="https://a.example/c">'
            '<meta property="og:title" content="OG Hello">'
            '<meta name="robots" content="noindex, nofollow">'
            "</head><body>x</body></html>",
        ),
        # mixed-case tags must still match ((?i) patterns)
        (2, "https://a.example/2", "<HTML><HEAD><TITLE>Caps</TITLE></HEAD>"),
        # empty title → NULL, robots without noindex → false
        (
            3,
            "https://a.example/3",
            '<title></title><meta name="robots" content="index, follow">',
        ),
        # nothing at all
        (4, "https://a.example/4", "<p>no head</p>"),
        # noindex must match as a token, not a substring
        (
            5,
            "https://a.example/5",
            '<meta name="robots" content="nonoindexing">',
        ),
    ]
    out = {
        r.doc_id: r for r in extract_meta(_pages(spark, rows)).collect()
    }
    assert out[1].title == "Hello"
    assert out[1].description == "A page"
    assert out[1].canonical == "https://a.example/c"
    assert out[1].og_title == "OG Hello"
    assert out[1].noindex is True
    assert out[2].title == "Caps"
    assert out[2].noindex is False
    assert out[3].title is None
    assert out[3].noindex is False
    assert out[4].title is None
    assert out[4].description is None
    assert out[4].canonical is None
    assert out[4].og_title is None
    assert out[4].noindex is False
    assert out[5].noindex is False


def test_extract_meta_keeps_passthrough_columns_drops_html(spark):
    out = extract_meta(
        _pages(spark, [(1, "https://a.example/1", "<title>t</title>")])
    )
    assert "html" not in out.columns
    assert {"doc_id", "url", "title", "noindex"} <= set(out.columns)


def test_extract_meta_adds_no_shuffle(spark):
    from tests.test_plan_contracts import plan_of

    plan = plan_of(
        extract_meta(_pages(spark, [(1, "https://a.example/1", "x")]))
    )
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# HTML table extraction (q82)
# ---------------------------------------------------------------------------


def test_extract_tables_shapes_and_cleaning(spark):
    from py_image_toolkit_spark.operators.html_meta import extract_tables

    html = (
        "<p>prose</p>"
        "<table><tr><th>H1</th><th>H2</th></tr>"
        "<tr><td><b>bold</b> text</td><td>  spaced\n out  </td></tr></table>"
        "<TABLE id='x'><TR><TD>upper</TD></TR></TABLE>"
    ).encode()
    df = spark.createDataFrame([("u1", html)], "url string, html binary")
    out = extract_tables(df).collect()
    cells = {(r.table_idx, r.row_idx, r.col_idx): r.cell_text for r in out}
    assert cells[(0, 0, 0)] == "H1" and cells[(0, 0, 1)] == "H2"
    # nested tags stripped, whitespace collapsed
    assert cells[(0, 1, 0)] == "bold text"
    assert cells[(0, 1, 1)] == "spaced out"
    # case-insensitive tag matching finds the second table
    assert cells[(1, 0, 0)] == "upper"
    assert len(cells) == 5


def test_extract_tables_tableless_page_yields_nothing(spark):
    from py_image_toolkit_spark.operators.html_meta import extract_tables

    df = spark.createDataFrame(
        [("u1", b"<p>no tables here</p>"), ("u2", b"<table><tr>broken")],
        "url string, html binary",
    )
    # no <table> -> no rows; an unclosed table never matches the lazy regex
    assert extract_tables(df).count() == 0


def test_extract_headings_levels_order_and_mismatch_drop(spark):
    from py_image_toolkit_spark.operators.html_meta import extract_headings

    html = (
        "<h1>Top</h1><p>x</p><h2> Sub <em>one</em> </h2>"
        "<h2>bad</h3>"            # mismatched pair -> dropped
        "<H3>deep</H3>"           # mixed case
    ).encode()
    df = spark.createDataFrame([("u", html)], "url string, html binary")
    out = sorted(extract_headings(df).collect(), key=lambda r: r.heading_idx)
    assert [(r.level, r.heading_text) for r in out] == [
        (1, "Top"), (2, "Sub one"), (3, "deep"),
    ]
    # idx order follows document position even with the dropped candidate
    assert [r.heading_idx for r in out] == [0, 1, 3]
