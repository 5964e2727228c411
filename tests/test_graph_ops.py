"""Web-graph operator tests (link extraction + integer PageRank) against
brute-force Python references."""

from collections import defaultdict

from py_image_toolkit_spark.operators.graph import extract_links, pagerank


def test_extract_links_absolute_relative_and_junk(spark):
    pages = spark.createDataFrame(
        [
            (
                "https://a.com/x",
                '<a href="https://b.com/p">1</a><a href="/rel">2</a>'
                '<a href="http://c.com:8080/q?z=1">3</a>',
            ),
            ("https://a.com/y", '<a href="https://b.com/other">dup host</a>'),
            ("https://b.com/z", '<a href="mailto:x@y.z">not http</a>'),
            ("https://d.com/w", "no links at all"),
        ],
        "url string, html string",
    )
    out = {
        (r.src, r.dst) for r in extract_links(pages).collect()
    }
    assert out == {
        ("a.com", "b.com"),       # absolute (deduped across two pages)
        ("a.com", "a.com"),       # relative href -> source host
        ("a.com", "c.com"),       # port stripped from host
        ("b.com", "b.com"),       # non-http scheme treated as site-local
    }


def test_extract_links_accepts_binary_html(spark):
    pages = spark.createDataFrame(
        [("https://a.com/x", '<a href="https://b.com/">1</a>'.encode())],
        "url string, html binary",
    )
    assert extract_links(pages).collect()[0].asDict() == {
        "src": "a.com",
        "dst": "b.com",
    }


def _ref_pagerank(edges, iters, scale=1_000_000, damping=85):
    edges = sorted(set(edges))
    deg = defaultdict(int)
    for s, _ in edges:
        deg[s] += 1
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    rank = {n: scale for n in nodes}
    base = (scale * (100 - damping)) // 100
    for _ in range(iters):
        insum = defaultdict(int)
        for s, d in edges:
            insum[d] += rank[s] // deg[s]
        rank = {n: base + (damping * insum[n]) // 100 for n in nodes}
    return rank, deg


def test_pagerank_matches_integer_reference(spark):
    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("d", "c"), ("d", "c"),  # duplicate edge must collapse
        ("e", "e"),              # self-loop
        ("f", "c"),              # c is the hub
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    out = {r.node: (r.rank_micro, r.out_degree) for r in pagerank(df, iterations=4).collect()}
    want_rank, want_deg = _ref_pagerank(edges, 4)
    assert set(out) == set(want_rank)
    for n in want_rank:
        assert out[n] == (want_rank[n], want_deg.get(n, 0)), n
    # the hub outranks everyone; sinks with no in-links sit at the base term
    assert max(out, key=lambda n: out[n][0]) == "c"
    assert out["f"][0] == 150_000


def test_pagerank_zero_iterations_is_uniform(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    out = {r.node: r.rank_micro for r in pagerank(df, iterations=0).collect()}
    assert out == {"a": 1_000_000, "b": 1_000_000}


def test_anchor_texts_triples(spark):
    from py_image_toolkit_spark.operators.graph import anchor_texts

    pages = [
        (
            "https://s1.example/p/1",
            '<a href="https://t.example/x">read this</a>'
            '<a href="/rel">local link</a>'
            '<a href="https://t.example/y"></a>'          # empty anchor drops
            '<a href="https://i.example/z"><img src="a"></a>',  # markup anchor
        ),
        (
            "https://s1.example/p/2",
            '<a href="https://t.example/x">read this</a>',  # repeat → n=2
        ),
        ("https://s2.example/p/3", "<p>no links</p>"),
    ]
    df = spark.createDataFrame(pages, "url string, html string")
    out = {
        (r.src, r.dst, r.anchor): r.n for r in anchor_texts(df).collect()
    }
    assert out == {
        ("s1.example", "t.example", "read this"): 2,
        ("s1.example", "s1.example", "local link"): 1,
    }
