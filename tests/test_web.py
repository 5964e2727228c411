"""operators/web.py — URL canonicalization, host rollup, hash sampling."""

from pyspark.sql import functions as F

from py_image_toolkit_spark.operators.web import (
    canonical_dedup,
    canonical_url,
    hash_sample,
    host_of,
    host_rollup,
)


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r["c"] for r in df.select(canonical_url(F.col("url")).alias("c")).collect()]


def test_canonical_url_edge_cases(spark):
    got = _canon(
        spark,
        [
            "https://Example.COM:443/Path/",                      # port+case+slash
            "http://site.org:80/a?utm_source=x&utm_medium=y#f",   # all-tracking query
            "https://h.io/p?utm_a=1&keep=2",                      # leading tracking
            "https://h.io/p?keep=1&utm_a=2&also=3",               # interior tracking
            "https://h.io/p?utm_a=1&utm_b=2&keep=3",              # adjacent tracking
            "https://h.io/p#only-fragment",
            "https://h.io:8080/p",                                # non-default port kept
        ],
    )
    assert got == [
        "https://example.com/Path",
        "http://site.org/a",
        "https://h.io/p?keep=2",
        "https://h.io/p?keep=1&also=3",
        "https://h.io/p?keep=3",
        "https://h.io/p",
        "https://h.io:8080/p",
    ]


def test_canonical_dedup_groups_variants(spark):
    rows = [
        (1, "https://A.example:443/x?utm_source=s"),
        (2, "https://a.example/x"),
        (3, "https://a.example/y"),  # singleton → excluded
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = canonical_dedup(df).collect()
    assert len(out) == 1
    assert out[0]["canonical_url"] == "https://a.example/x"
    assert out[0]["canonical_id"] == 1 and out[0]["n_variants"] == 2


def test_host_rollup_counts(spark):
    rows = [
        (1, "https://A.example:443/x", 100, "en"),
        (2, "https://a.example/y", 300, "ko"),
        (3, "https://b.example/z", 50, "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, n_chars long, lang string")
    out = {r["host"]: r for r in host_rollup(df).collect()}
    a = out["a.example"]
    assert a["n_docs"] == 2 and a["total_chars"] == 400 and a["n_langs"] == 2
    assert a["short_share_micro"] == 500_000  # 1 of 2 docs < 200 chars
    assert out["b.example"]["short_share_micro"] == 1_000_000
    assert host_of(F.lit("x")) is not None  # Column builder importable alone


def test_hash_sample_deterministic_and_unbiased(spark):
    df = spark.createDataFrame([(i,) for i in range(4000)], "doc_id long")
    a = sorted(r["doc_id"] for r in hash_sample(df, 0.25).collect())
    b = sorted(r["doc_id"] for r in hash_sample(df, 0.25).collect())
    assert a == b  # reproducible
    assert 0.22 < len(a) / 4000 < 0.28  # near the target rate
    # monotone nesting: a lower rate yields a strict subset
    c = set(r["doc_id"] for r in hash_sample(df, 0.1).collect())
    assert c <= set(a)
    # boundary rates
    assert hash_sample(df, 0.0).count() == 0
    assert hash_sample(df, 1.0).count() == 4000


def test_canonical_url_is_idempotent(spark):
    """canon(canon(u)) == canon(u) over adversarial inputs — a canonical
    form that keeps changing would break url-keyed dedup joins."""
    import random

    rng = random.Random(17)
    parts = ["?utm_source=a", "?x=1&utm_b=2", "#frag", "/", ":443", ":80",
             "?utm_a=1&utm_b=2&utm_c=3", "?a=1&&b=2", "?", "&", ""]
    urls = [
        f"{'https' if i % 2 else 'http'}://HoSt-{i % 9}.Example"
        f"{rng.choice(parts)}{rng.choice(parts)}"
        for i in range(300)
    ] + ["https://a.io/p?utm_a=1", "notaurl", "", "ftp://x.y:80/z/"]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = canonical_url(F.col("url"))
    out = df.select(
        once.alias("c1"),
        # apply the chain a second time over the first result
        canonical_url(once).alias("c2"),
    ).collect()
    bad = [(r["c1"], r["c2"]) for r in out if r["c1"] != r["c2"]]
    assert not bad, bad[:5]


def test_url_filter_verdicts_and_precedence(spark):
    from py_image_toolkit_spark.operators.web import url_filter

    df = spark.createDataFrame(
        [
            (1, "https://www.bad.com/x"),        # suffix match on bad.com
            (2, "https://bad.com/y"),            # exact host match
            (3, "https://notbad.com/z"),         # NOT a suffix match
            (4, "https://ok.com/download.exe"),  # pattern match
            (5, "https://bad.com/download.exe"), # host rule wins over pattern
            (6, "https://ok.com/fine"),          # kept
            (7, "https://first.com/download.exe"),  # first host rule in list order
        ],
        "doc_id long, url string",
    )
    out = {
        r.doc_id: (r.verdict, r.rule)
        for r in url_filter(
            df,
            blocked_hosts=("first.com", "bad.com"),
            blocked_url_patterns=("[.]exe$", "[.]zip$"),
        ).collect()
    }
    assert out[1] == ("blocked_host", "bad.com")
    assert out[2] == ("blocked_host", "bad.com")
    assert out[3][0] == "kept" and out[3][1] is None
    assert out[4] == ("blocked_pattern", "[.]exe$")
    assert out[5] == ("blocked_host", "bad.com")
    assert out[6] == ("kept", None)
    assert out[7] == ("blocked_host", "first.com")


def test_url_filter_empty_lists_keep_everything(spark):
    from py_image_toolkit_spark.operators.web import url_filter

    df = spark.createDataFrame([(1, "https://a.com/x")], "doc_id long, url string")
    row = url_filter(df).collect()[0]
    assert (row.verdict, row.rule, row.host) == ("kept", None, "a.com")


def test_host_cap_matches_serial_rank(spark):
    import hashlib

    from py_image_toolkit_spark.operators.web import host_cap

    rows = [
        (i, f"https://h{i % 3}.example/p/{i}") for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r.doc_id: (r.host, r.host_rank) for r in host_cap(df, cap=5).collect()}

    # serial reference: per-host rank in (md5(id), id) order
    by_host = {}
    for i, url in rows:
        by_host.setdefault(f"h{i % 3}.example", []).append(i)
    want = {}
    for host, ids in by_host.items():
        ids.sort(key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        for rank, i in enumerate(ids[:5], start=1):
            want[i] = (host, rank)
    assert out == want


def test_latest_capture_keeps_newest_with_deterministic_ties(spark):
    import datetime

    from py_image_toolkit_spark.operators.web import latest_capture

    ts = lambda d: datetime.datetime(2024, 1, d)  # noqa: E731
    rows = [
        (1, "https://a.example/p", ts(1), "old"),
        (2, "https://a.example/p", ts(9), "new"),
        (3, "https://b.example/p", ts(5), "tie-lo"),
        (4, "https://b.example/p", ts(5), "tie-hi"),  # tie → max id wins
        (5, "https://c.example/p", ts(2), "only"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, url string, warc_ts timestamp, text string"
    )
    out = {
        r.url: (r.doc_id, r.text, r.n_captures)
        for r in latest_capture(df).collect()
    }
    assert out == {
        "https://a.example/p": (2, "new", 2),
        "https://b.example/p": (4, "tie-hi", 2),
        "https://c.example/p": (5, "only", 1),
    }


def test_latest_capture_is_single_aggregation(spark):
    import datetime

    from py_image_toolkit_spark.operators.web import latest_capture
    from tests.test_plan_contracts import plan_of

    df = spark.createDataFrame(
        [(1, "u", datetime.datetime(2024, 1, 1))],
        "doc_id long, url string, warc_ts timestamp",
    )
    plan = plan_of(latest_capture(df))
    assert "Join" not in plan
    assert plan.count("HashAggregate") <= 2 or "SortAggregate" in plan


ROBOTS_TXT = """# crawl policy
User-agent: *
Disallow: /private
Allow: /private/ok
Disallow:
DISALLOW: /tmp

User-agent: evilbot
Disallow: /
"""


def test_robots_rules_parses_star_group_only(spark):
    from py_image_toolkit_spark.operators.web import robots_rules

    df = spark.createDataFrame(
        [("a.example", ROBOTS_TXT)], "host string, robots_txt string"
    )
    out = {
        (r.rule_path, r.is_allow): r.rule_len
        for r in robots_rules(df).collect()
    }
    # comment, blank Disallow (allow-all no-op) and the evilbot group drop
    assert out == {
        ("/private", False): 8,
        ("/private/ok", True): 11,
        ("/tmp", False): 4,
    }


def test_robots_gate_longest_match_wins(spark):
    from py_image_toolkit_spark.operators.web import robots_gate, robots_rules

    robots = spark.createDataFrame(
        [("a.example", ROBOTS_TXT)], "host string, robots_txt string"
    )
    pages = spark.createDataFrame(
        [
            (1, "https://a.example/public/x"),      # no rule → allowed
            (2, "https://a.example/private/x"),     # Disallow /private
            (3, "https://a.example/private/ok/x"),  # longer Allow wins
            (4, "https://a.example/tmp"),           # exact prefix
            (5, "https://b.example/private/x"),     # host without robots
            (6, "https://a.example"),               # bare root path
        ],
        "doc_id long, url string",
    )
    out = {
        r.doc_id: (r.allowed, r.rule_path)
        for r in robots_gate(pages, robots_rules(robots)).collect()
    }
    assert out[1] == (True, None)
    assert out[2] == (False, "/private")
    assert out[3] == (True, "/private/ok")
    assert out[4] == (False, "/tmp")
    assert out[5] == (True, None)
    assert out[6] == (True, None)


def test_robots_gate_allow_beats_disallow_on_equal_length(spark):
    from py_image_toolkit_spark.operators.web import robots_gate, robots_rules

    robots = spark.createDataFrame(
        [("a.example", "User-agent: *\nDisallow: /dir\nAllow: /dir")],
        "host string, robots_txt string",
    )
    pages = spark.createDataFrame(
        [(1, "https://a.example/dir/page")], "doc_id long, url string"
    )
    row = robots_gate(pages, robots_rules(robots)).collect()[0]
    assert (row.allowed, row.rule_path) == (True, "/dir")


def test_robots_gate_plan_is_host_equijoin(spark):
    from py_image_toolkit_spark.operators.web import robots_gate, robots_rules
    from tests.test_plan_contracts import plan_of

    robots = spark.createDataFrame(
        [("a.example", "User-agent: *\nDisallow: /x")],
        "host string, robots_txt string",
    )
    pages = spark.createDataFrame(
        [(1, "https://a.example/x")], "doc_id long, url string"
    )
    plan = plan_of(robots_gate(pages, robots_rules(robots)))
    # the prefix test must never be a join condition
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# crawl-frontier assembly (q76)
# ---------------------------------------------------------------------------


def test_crawl_frontier_composes_all_gates(spark):
    from py_image_toolkit_spark.operators.web import crawl_frontier, robots_rules

    pages = spark.createDataFrame(
        [
            (
                "https://a.example/page1",
                b'<a href="https://b.example/new">x</a>'
                b'<a href="/local">y</a>'
                b'<a href="https://blocked.example/z">z</a>'
                b'<a href="https://a.example/page1#frag">self</a>'
                b'<a href="relative.html">dropped</a>',
            ),
        ],
        "url string, html binary",
    )
    robots = robots_rules(
        spark.createDataFrame(
            [("b.example", "User-agent: *\nDisallow: /new\n")],
            "host string, robots_txt string",
        )
    )
    out = crawl_frontier(
        pages,
        crawled=pages.select("url"),
        robots=robots,
        blocked_hosts=("blocked.example",),
        per_host_budget=5,
    ).collect()
    urls = sorted(r.url for r in out)
    # https://b.example/new -> robots-blocked; blocked.example -> blocklist;
    # #frag canonicalizes to the already-crawled page1 -> anti-joined;
    # bare-relative href dropped; only the root-relative survives
    assert urls == ["https://a.example/local"]
    assert out[0].host == "a.example" and out[0].host_rank == 1


def test_crawl_frontier_budget_caps_per_host(spark):
    from py_image_toolkit_spark.operators.web import crawl_frontier

    links = "".join(f'<a href="https://hot.example/p{i}">l</a>' for i in range(10))
    pages = spark.createDataFrame(
        [("https://seed.example/", links.encode())], "url string, html binary"
    )
    out = crawl_frontier(
        pages, crawled=pages.select("url"), per_host_budget=3
    ).collect()
    assert len(out) == 3
    assert sorted(r.host_rank for r in out) == [1, 2, 3]
    # rerun yields the same deterministic pick
    again = crawl_frontier(
        pages, crawled=pages.select("url"), per_host_budget=3
    ).collect()
    assert sorted(r.url for r in out) == sorted(r.url for r in again)


def test_crawl_delays_group_scoping_and_defaults(spark):
    from py_image_toolkit_spark.operators.web import crawl_delays

    rows = [
        # '*' in the middle; decoys on both sides must not leak
        ("a.example", "User-agent: bad\nCrawl-delay: 99\nUser-agent: *\nCrawl-delay: 5\nUser-agent: o\nCrawl-delay: 77\n"),
        # '*' group last (capture-to-end path)
        ("b.example", "User-agent: bad\nCrawl-delay: 99\nUser-agent: *\nCrawl-delay: 7\n"),
        # '*' group without a delay -> default
        ("c.example", "User-agent: *\nDisallow: /x\n"),
        # no '*' group at all -> default
        ("d.example", "User-agent: onlybot\nCrawl-delay: 42\n"),
    ]
    df = spark.createDataFrame(rows, "host string, robots_txt string")
    out = {r.host: r.crawl_delay_s for r in crawl_delays(df).collect()}
    assert out == {"a.example": 5, "b.example": 7, "c.example": 1, "d.example": 1}


def test_politeness_schedule_spaces_fetches(spark):
    from py_image_toolkit_spark.operators.web import crawl_delays, politeness_schedule

    ranked = spark.createDataFrame(
        [(1, "a.example", 1), (2, "a.example", 2), (3, "a.example", 3), (4, "z.example", 2)],
        "doc_id long, host string, host_rank long",
    )
    delays = crawl_delays(
        spark.createDataFrame(
            [("a.example", "User-agent: *\nCrawl-delay: 10\n")],
            "host string, robots_txt string",
        )
    )
    out = {r.doc_id: r.fetch_offset_s for r in politeness_schedule(ranked, delays).collect()}
    # 10s spacing on a.example; z.example (no robots) defaults to 1s spacing
    assert out == {1: 0, 2: 10, 3: 20, 4: 1}


def test_sitemap_entries_urls_index_and_lastmod(spark):
    from py_image_toolkit_spark.operators.web import sitemap_entries

    xml = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc> https://a.example/p1 </loc><lastmod>2024-03-01</lastmod></url>"
        "<url><loc>https://a.example/p2</loc></url>"
        "<url><lastmod>2024-01-01</lastmod></url>"  # no loc -> dropped
        "<sitemap><loc>https://a.example/more.xml</loc></sitemap>"
        "</urlset>"
    )
    df = spark.createDataFrame([("a.example", xml)], "host string, sitemap_xml string")
    out = sorted(sitemap_entries(df).collect(), key=lambda r: r.entry_idx)
    assert [(r.loc, r.lastmod, r.is_index) for r in out] == [
        ("https://a.example/p1", "2024-03-01", False),
        ("https://a.example/p2", None, False),
        ("https://a.example/more.xml", None, True),
    ]


def test_training_eligibility_gate_precedence(spark):
    from py_image_toolkit_spark.operators.web import robots_rules, training_eligibility

    def page(url, noindex=False):
        robots = "noindex" if noindex else "index"
        return (url, f'<html><head><meta name="robots" content="{robots}"></head></html>'.encode())

    pages = spark.createDataFrame(
        [
            page("https://ok.example/p"),
            page("https://bad.example/p", noindex=True),   # host-blocked wins over noindex
            page("https://ok.example/private/x"),           # robots disallow
            page("https://ok.example/q", noindex=True),     # meta noindex
        ],
        "url string, html binary",
    )
    robots = robots_rules(
        spark.createDataFrame(
            [("ok.example", "User-agent: *\nDisallow: /private/\n")],
            "host string, robots_txt string",
        )
    )
    out = {r.url: r for r in training_eligibility(
        pages, robots=robots, blocked_hosts=("bad.example",)
    ).collect()}
    assert out["https://ok.example/p"].eligible
    assert out["https://bad.example/p"].reason == "blocked_host"
    assert out["https://ok.example/private/x"].reason == "robots_disallow"
    assert out["https://ok.example/q"].reason == "meta_noindex"


def test_robots_sitemaps_case_padding_and_order(spark):
    from py_image_toolkit_spark.operators.web import robots_sitemaps

    body = (
        "User-agent: *\nDisallow: /\n"
        "Sitemap: https://a.example/s1.xml\n"
        "  sitemap:   https://a.example/s2.xml  \n"
        "NotASitemap: https://a.example/no.xml\n"
    )
    df = spark.createDataFrame([("a.example", body)], "host string, robots_txt string")
    out = sorted(robots_sitemaps(df).collect(), key=lambda r: r.sitemap_idx)
    assert [r.sitemap_url for r in out] == [
        "https://a.example/s1.xml", "https://a.example/s2.xml",
    ]


def test_url_templates_collapse_digit_families(spark):
    from py_image_toolkit_spark.operators.web import url_templates

    urls = [(f"https://s.example/product/{i}",) for i in range(20)]
    urls += [(f"https://s.example/page/{i}/view",) for i in range(5)]
    urls += [("https://s.example/about",), ("https://other.example/product/7",)]
    df = spark.createDataFrame(urls, "url string")
    out = url_templates(df, k=10).collect()
    top = out[0]
    assert (top.host, top.template, top.n_urls) == ("s.example", "/product/{n}", 20)
    by_tmpl = {(r.host, r.template): r.n_urls for r in out}
    assert by_tmpl[("s.example", "/page/{n}/view")] == 5
    assert by_tmpl[("s.example", "/about")] == 1
    assert by_tmpl[("other.example", "/product/{n}")] == 1


def test_host_language_diversity_bounds(spark):
    from py_image_toolkit_spark.operators.web import host_language_diversity

    rows = (
        [(f"https://mono.example/{i}", "en") for i in range(10)]
        + [(f"https://mixed.example/{i}", ["en", "de", "fr", "zh"][i % 4]) for i in range(8)]
    )
    df = spark.createDataFrame(rows, "url string, lang string")
    out = {r.host: r for r in host_language_diversity(df).collect()}
    assert out["mono.example"].diversity_micro == 0
    assert out["mono.example"].n_langs == 1
    # 4 languages, 2 docs each: 1 - 4*(2/8)^2 = 0.75 exactly
    assert out["mixed.example"].diversity_micro == 750_000
    assert out["mixed.example"].n_langs == 4


def test_shard_assignment_covers_all_docs_and_balances(spark):
    from pyspark.sql import functions as F

    from py_image_toolkit_spark.operators.web import shard_assignment

    df = spark.createDataFrame(
        [(i, 100) for i in range(800)], "doc_id long, n_chars long"
    )
    out = shard_assignment(df, n_shards=8).collect()
    assert len(out) == 8
    assert sum(r.n_docs for r in out) == 800
    # uniform sizes: deviation tracks doc-count skew only; md5 spreads well
    assert all(abs(r.dev_ppm) < 300_000 for r in out)
    # deterministic rerun
    again = shard_assignment(df, n_shards=8).collect()
    assert sorted((r.shard, r.n_docs) for r in out) == sorted(
        (r.shard, r.n_docs) for r in again
    )


def test_link_density_ratio(spark):
    from py_image_toolkit_spark.operators.web import link_density

    nav = '<a href="/1">x</a>' * 50
    df = spark.createDataFrame(
        [
            ("u1", nav.encode()),                       # link farm
            ("u2", ("<p>" + "word " * 500 + "</p>").encode()),  # prose, no links
            ("u3", b""),                                # empty page: guarded div
        ],
        "url string, html binary",
    )
    out = {r.url: r for r in link_density(df).collect()}
    assert out["u1"].n_anchors == 50 and out["u1"].anchors_per_10k > 400
    assert out["u2"].n_anchors == 0 and out["u2"].anchors_per_10k == 0
    assert out["u3"].anchors_per_10k == 0
