"""Web-graph operators — the link-structure side of a crawl pipeline.

A Common-Crawl-scale corpus carries a host graph (who links to whom), and
curation pipelines use link-centrality as a quality prior (seed lists,
crawl frontier ordering, spam demotion). Two operators:

- extract_links  : href targets per page from raw HTML via one
                   whole-stage-codegen regexp pass (no DOM parse needed for
                   link mining), normalized to (src_host, dst_host) edges
- pagerank       : damped PageRank over an edge table by power iteration in
                   EXACT integer micro-units — every engine computes the
                   identical ranks bit-for-bit (float power iteration
                   diverges in the last ulp across platforms, which would
                   break cross-engine hashing and run reproducibility)

Reference analog: py-image-toolkit has no graph layer; this is the standard
web-corpus structure analysis a 10^12-page pipeline adds (SURVEY.md §2
"LLM-pipeline" family). Iteration scaffolding (round-boundary checkpoint
truncation) is shared with cluster.py's connected components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from py_image_toolkit_spark.operators.cluster import _checkpointer

_HREF_RE = r'href="([^"]*)"'
_HOST_RE = r"^https?://([^/:?#]+)"


def extract_links(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Distinct (src_host, dst_host) edges from raw page HTML.

    Link mining deliberately skips the DOM parse: one regexp_extract_all
    over the decoded bytes finds href attributes (boilerplate links
    included — that is what a host graph wants), then a second regexp
    normalizes absolute targets to their host. Relative hrefs resolve to
    the source host. Everything is whole-stage-codegen Column code; the
    only shuffle is the final distinct on the (already small) edge set.

    Scale posture (100 TB): the html column never shuffles — hrefs are
    extracted map-side and pages collapse to host-pair rows before the
    distinct; hot hosts are just values of a keyed aggregation.
    """
    src_host = F.regexp_extract(F.col(url_col), _HOST_RE, 1)
    html_text = F.col(html_col).cast("string")
    target = F.explode(
        F.regexp_extract_all(html_text, F.lit(_HREF_RE), 1)
    ).alias("target")
    dst_host = F.when(
        F.col("target").rlike(_HOST_RE),
        F.regexp_extract(F.col("target"), _HOST_RE, 1),
    ).otherwise(F.col("src_host"))
    return (
        pages.select(src_host.alias("src_host"), target)
        .select("src_host", dst_host.alias("dst_host"))
        .where(F.col("dst_host") != "")
        .select(
            F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
        )
        .distinct()
    )


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 5,
    scale: int = 1_000_000,
    damping_pct: int = 85,
    checkpoint: str = "auto",
) -> DataFrame:
    """Damped PageRank by power iteration over a distinct edge table,
    entirely in BIGINT micro-units: every rank starts at ``scale`` and each
    round computes

        rank'(v) = base + (damping_pct * Σ_{u→v} (rank(u) DIV deg(u))) DIV 100
        base     = (scale * (100 - damping_pct)) DIV 100

    Floor division everywhere, so the result is bit-identical on any
    engine — the property the whole contract layer is built on. (Dangling
    mass is dropped rather than redistributed: a global redistribution
    term would add an all-nodes broadcast per round for no ordering
    benefit; ranks are a quality PRIOR here, not probabilities.)

    Returns one row per node: ``(node, rank_micro, out_degree)``.

    Scale posture (10^9-host graph): each round is one src-keyed equijoin
    (rank onto edges — deg rides along in the rank table, so a single
    join) + one dst-keyed groupBy, both map-side-combinable; the node
    table is never collected or broadcast. Round boundaries are
    lineage-truncated exactly like cluster_pairs (reliable checkpoint
    when the context has a checkpoint dir, else localCheckpoint), so a
    50-iteration run neither replays nor blows up the planner.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    # deg rides inside the rank table so the per-round join count stays at 1
    r = nodes.join(
        deg.select(F.col("src").alias("node"), "deg"), "node", "left"
    ).select(
        "node",
        F.lit(int(scale)).cast("long").alias("rank_micro"),
        F.coalesce(F.col("deg"), F.lit(0)).cast("long").alias("out_degree"),
    )
    e = _checkpointer(e, checkpoint)
    base = (scale * (100 - damping_pct)) // 100
    for _ in range(iterations):
        contrib = (
            e.join(
                r.where(F.col("out_degree") > 0).select(
                    F.col("node").alias("src"),
                    F.expr("rank_micro DIV out_degree").alias("_share"),
                ),
                "src",
            )
            .groupBy("dst")
            .agg(F.sum("_share").alias("_in"))
        )
        r = _checkpointer(
            r.join(contrib, r.node == contrib.dst, "left").select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"{damping_pct} * coalesce(_in, CAST(0 AS BIGINT)) DIV 100"
                    )
                ).cast("long").alias("rank_micro"),
                "out_degree",
            ),
            checkpoint,
        )
    return r


_ANCHOR_RE = r'<a href="[^"]*"[^>]*>[^<]*</a>'


def anchor_texts(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Anchor-text corpus: ``(src, dst, anchor, n)`` — how pages DESCRIBE
    the pages they link to, aggregated to host level. Anchor text is a
    classic web-scale training signal (it labels the target page with
    third-party language) and a crawl-frontier quality prior.

    One codegen regexp pass finds whole ``<a href="..">text</a>`` elements
    (match 0), two sub-extracts split href and anchor text, and relative
    hrefs resolve to the source host exactly as in ``extract_links``.
    Empty anchors (image links) are dropped; the only shuffle is the final
    (src, dst, anchor) count, which is map-side-combinable.

    Scale posture (100 TB): the html column never shuffles — anchors are
    extracted and collapsed to (host, host, text) rows map-side; the
    aggregation key space is links-distinct, orders of magnitude smaller
    than the corpus.
    """
    src_host = F.regexp_extract(F.col(url_col), _HOST_RE, 1)
    html_text = F.col(html_col).cast("string")
    el = F.explode(F.regexp_extract_all(html_text, F.lit(_ANCHOR_RE), 0))
    href = F.regexp_extract(F.col("el"), _HREF_RE, 1)
    anchor = F.regexp_extract(F.col("el"), r">([^<]*)</a>$", 1)
    dst = F.when(
        href.rlike(_HOST_RE), F.regexp_extract(href, _HOST_RE, 1)
    ).otherwise(F.col("src"))
    return (
        pages.select(src_host.alias("src"), el.alias("el"))
        .select("src", dst.alias("dst"), anchor.alias("anchor"))
        .where((F.col("anchor") != "") & (F.col("dst") != ""))
        .groupBy("src", "dst", "anchor")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def extract_outlinks(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Distinct outlink URLs (not hosts — the crawl-frontier variant of
    extract_links): absolute ``http(s)://`` targets are kept verbatim,
    root-relative targets (``/path``) resolve against the source host
    with the https scheme, and other relative forms are dropped (no
    base-path algebra — a production frontier treats those as same-page
    noise). One codegen regexp pass; the only shuffle is the distinct
    over the (already collapsed) URL set.
    """
    src_host = F.regexp_extract(F.col(url_col), _HOST_RE, 1)
    html_text = F.col(html_col).cast("string")
    target = F.explode(
        F.regexp_extract_all(html_text, F.lit(_HREF_RE), 1)
    ).alias("target")
    out_url = F.when(F.col("target").rlike(r"^https?://"), F.col("target")).when(
        F.col("target").startswith("/"),
        F.concat(F.lit("https://"), F.col("src_host"), F.col("target")),
    )
    return (
        pages.select(src_host.alias("src_host"), target)
        .select(out_url.alias("url"))
        .where(F.col("url").isNotNull())
        .distinct()
    )
