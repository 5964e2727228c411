"""Web-corpus hygiene operators — the URL-level half of a Common-Crawl-style
training-data pipeline (the document-level half lives in dedup.py /
cluster.py / text_stats.py).

- canonical_url      : deterministic URL normalization (lowercase
                       scheme+host, default-port strip, fragment strip,
                       tracking-param removal, trailing-slash trim) as a
                       pure Column expression — at 10^12 docs this runs in
                       whole-stage codegen, no Python anywhere.
- canonical_dedup    : duplicate-URL groups after canonicalization (the
                       url-level analog of exact_dedup's content hash).
- host_rollup        : per-host corpus accounting (doc counts, byte
                       volume, language mix) — one keyed groupBy with
                       map-side partials; the standard first look at a
                       crawl's host distribution and the input to host-
                       level quality decisions.
- hash_sample        : deterministic corpus subsampling by md5-prefix
                       threshold — hex strings compare uniformly, so a
                       lexicographic cut gives an unbiased rate-controlled
                       sample that is REPRODUCIBLE across engines and runs
                       (no rand(), no seed plumbing), and co-samples the
                       same keys in every derived table.
- url_filter         : UT1/RefinedWeb-style blocklist gating — domain-
                       suffix host rules + URL regex rules, first match
                       wins in list order, verdict + matched rule per row.

Every operator is Column-only and cross-engine reproducible (the q37-q39
DuckDB oracles apply byte-identical expressions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# tracking parameters stripped during canonicalization (the common
# click/campaign identifiers; extend per deployment)
TRACKING_PARAM_RE = r"(utm_[a-z]+|fbclid|gclid|ref)=[^&#]*"


def canonical_url(url: Column) -> Column:
    """Normalize a URL Column: lowercase scheme+authority, strip :80/:443,
    drop the fragment, remove tracking params, collapse dangling ?/& and a
    trailing slash. Pure deterministic regex chain (Java and RE2 agree on
    every pattern used here)."""
    head = F.lower(F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1))
    # repeated group so pathological ':443:443' inputs still canonicalize to
    # a fixed point (idempotence property-tested)
    head = F.regexp_replace(head, r"(:(80|443))+$", "")
    rest = F.regexp_replace(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "")
    rest = F.regexp_replace(rest, r"#.*$", "")  # fragment
    rest = F.regexp_replace(rest, TRACKING_PARAM_RE, "")
    # separator cleanup, in dependency order: collapse runs of '&', heal
    # '?&' → '?', then strip ONE combined trailing run of /?& — a split
    # slash-then-separator strip is not idempotent ('a/?' → 'a/' → 'a'
    # needs two passes; the property test caught it)
    rest = F.regexp_replace(rest, r"&&+", "&")
    rest = F.regexp_replace(rest, r"\?&", "?")
    rest = F.regexp_replace(rest, r"[/?&]+$", "")
    return F.concat(head, rest)


def canonical_dedup(df: DataFrame, url_col: str = "url", id_col: str = "doc_id") -> DataFrame:
    """Duplicate-URL groups after canonicalization:
    (canonical_url, canonical_id=min(id), n_variants>=2)."""
    return (
        df.select(F.col(id_col), canonical_url(F.col(url_col)).alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("n_variants"))
        .filter(F.col("n_variants") >= 2)
    )


def host_of(url: Column) -> Column:
    """Lowercased authority host (port stripped)."""
    return F.lower(
        F.regexp_replace(
            F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1),
            r":\d+$",
            "",
        )
    )


def host_rollup(
    df: DataFrame, url_col: str = "url", chars_col: str = "n_chars", lang_col: str = "lang"
) -> DataFrame:
    """Per-host corpus accounting: docs, total chars, distinct languages,
    share of short documents (< 200 chars) in micro-units. One shuffle on
    the host key, all aggregates algebraic (map-side combinable)."""
    return (
        df.select(
            host_of(F.col(url_col)).alias("host"),
            F.col(chars_col),
            F.col(lang_col),
        )
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(chars_col).alias("total_chars"),
            F.countDistinct(lang_col).alias("n_langs"),
            F.floor(
                F.sum(F.when(F.col(chars_col) < 200, 1).otherwise(0))
                * 1_000_000.0
                / F.count(F.lit(1))
                + F.lit(0.5)
            )
            .cast("long")
            .alias("short_share_micro"),
        )
    )


def hash_sample(
    df: DataFrame, rate: float, key_col: str = "doc_id"
) -> DataFrame:
    """Deterministic unbiased subsample: keep rows whose md5(key) 8-hex-char
    prefix falls below the rate threshold. Same rows on every run and every
    engine; correlated sampling across tables sharing the key. ``rate`` in
    [0, 1]."""
    t = int(rate * 16**8)
    # 'g' sorts above every lowercase hex digit → rate >= 1 keeps all rows
    # (format(16**8) would be 9 chars and break the 8-char lexicographic cut)
    threshold = "g" if t >= 16**8 else format(t, "08x")
    pfx = F.substring(F.md5(F.col(key_col).cast("string").cast("binary")), 1, 8)
    return df.filter(pfx < F.lit(threshold))


def url_filter(
    df: DataFrame,
    blocked_hosts: tuple[str, ...] = (),
    blocked_url_patterns: tuple[str, ...] = (),
    url_col: str = "url",
) -> DataFrame:
    """Blocklist gating of a crawl by URL — the UT1-blocklist curation
    stage. Two rule families, first match wins in list order:

    - ``blocked_hosts``: domain suffixes — a row is blocked when its host
      equals the entry or ends with ``"." + entry`` (so ``example.com``
      blocks ``www.example.com`` but never ``notexample.com``);
    - ``blocked_url_patterns``: regexes tested against the FULL url (keep
      them in the regex subset Java and RE2 agree on — char classes,
      anchors, alternation — since the oracle replays them in DuckDB).

    Host rules take precedence over pattern rules. Returns every input row
    plus ``host``, ``verdict`` (``blocked_host`` / ``blocked_pattern`` /
    ``kept``) and the first matching ``rule`` (NULL when kept) — verdict
    rows rather than a silent filter, so the drop REASON lands in corpus
    lineage and rule hit-rates are one groupBy away.

    Scale posture (10^12 urls): blocklists are literals folded into the
    plan (broadcast-free, whole-stage codegen) — real UT1 lists are a few
    MB, well inside codegen limits chunked across ``when`` chains; the
    operator adds no shuffle at all.
    """
    host = host_of(F.col(url_col))
    host_rule = F.lit(None).cast("string")
    for b in reversed(blocked_hosts):
        hit = (F.col("host") == b) | F.col("host").endswith("." + b)
        host_rule = F.when(hit, F.lit(b)).otherwise(host_rule)
    pat_rule = F.lit(None).cast("string")
    for p in reversed(blocked_url_patterns):
        pat_rule = F.when(F.col(url_col).rlike(p), F.lit(p)).otherwise(pat_rule)
    return (
        df.withColumn("host", host)
        .withColumn("_hr", host_rule)
        .withColumn("_pr", pat_rule)
        .select(
            *df.columns,
            "host",
            F.when(F.col("_hr").isNotNull(), "blocked_host")
            .when(F.col("_pr").isNotNull(), "blocked_pattern")
            .otherwise("kept")
            .alias("verdict"),
            F.coalesce(F.col("_hr"), F.col("_pr")).alias("rule"),
        )
    )


def host_cap(
    df: DataFrame,
    cap: int,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-host document cap — RefinedWeb/C4-style protection against any
    single site dominating the corpus: at most ``cap`` documents per host
    survive, chosen deterministically (md5(id) order, so reruns and other
    engines keep the SAME documents).

    This is exact-quota stratified sampling with host as the stratum, so
    it delegates to ``corpus.stratified_sample``'s two-phase rank — a hot
    host (40% of a crawl can be one domain) is ranked across 16 parallel
    hash sub-buckets rather than funneling through one partition, which is
    precisely the skew this operator exists to correct. Returns the kept
    rows with their in-host rank attached.
    """
    from py_image_toolkit_spark.operators.corpus import stratified_sample

    hosted = df.withColumn("host", host_of(F.col(url_col)))
    kept = stratified_sample(
        hosted, strata_col="host", default_quota=cap, id_col=id_col
    ).select(id_col, F.col("stratum_rank").alias("host_rank"))
    return hosted.join(kept, id_col)


def latest_capture(
    df: DataFrame,
    key_col: str = "url",
    ts_col: str = "warc_ts",
    id_col: str = "doc_id",
) -> DataFrame:
    """Recrawl collapse: Common Crawl captures the same URL in crawl after
    crawl; training corpora keep ONE capture per URL — the newest, with
    ties broken by id so the winner is deterministic. Adds ``n_captures``
    (how many snapshots collapsed) for lineage.

    Scale posture (10^12 captures): one groupBy on the key with max_by
    over a (ts, id) struct — a single map-side-combinable shuffle; no
    window over the corpus, no self-join against a "latest ts" table.
    """
    payload = F.struct(*[F.col(c) for c in df.columns])
    order = F.struct(F.col(ts_col), F.col(id_col))
    return (
        df.groupBy(key_col)
        .agg(
            F.max_by(payload, order).alias("_r"),
            F.count(F.lit(1)).cast("long").alias("n_captures"),
        )
        .select(
            *[F.col("_r." + c).alias(c) for c in df.columns], "n_captures"
        )
    )


def robots_rules(
    robots: DataFrame,
    host_col: str = "host",
    txt_col: str = "robots_txt",
    agent: str = "*",
) -> DataFrame:
    """Parse robots.txt bodies into a flat rule table: one row per
    Allow/Disallow line in the requested user-agent's group.

    Group membership is positional (a rule belongs to the most recent
    ``User-agent`` line above it), recovered with a forward-fill window
    per host — robots files are tiny, so the per-host window is cheap by
    construction. Comment lines, other agents' groups and empty-path
    rules (``Disallow:`` = allow-all no-op per the original spec) drop
    out. Output: (host, rule_path, is_allow, rule_len).
    """
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(txt_col), "\n")).alias("line_no", "raw"),
    ).select("host", "line_no", F.trim(F.col("raw")).alias("line"))
    ag = F.when(
        F.col("line").rlike("(?i)^user-agent:"),
        F.trim(F.regexp_replace(F.col("line"), "(?i)^user-agent:", "")),
    )
    verb = F.when(F.col("line").rlike("(?i)^allow:"), F.lit(1)).when(
        F.col("line").rlike("(?i)^disallow:"), F.lit(0)
    )
    path = F.trim(F.regexp_replace(F.col("line"), "(?i)^(dis)?allow:", ""))
    w = (
        Window.partitionBy("host")
        .orderBy("line_no")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        lines.select(
            "host",
            "line_no",
            ag.alias("_agent"),
            verb.alias("_verb"),
            path.alias("rule_path"),
        )
        .withColumn("agent", F.last("_agent", ignorenulls=True).over(w))
        .filter(
            (F.col("agent") == agent)
            & F.col("_verb").isNotNull()
            & (F.col("rule_path") != "")
        )
        .select(
            "host",
            "rule_path",
            (F.col("_verb") == 1).alias("is_allow"),
            F.length("rule_path").cast("long").alias("rule_len"),
        )
        .distinct()
    )


def robots_gate(
    pages: DataFrame, rules: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Apply parsed robots rules to a page table: per URL, the LONGEST
    matching rule wins; Allow beats Disallow on equal length (the
    Googlebot/REP tie-break); no matching rule means allowed. Emits every
    input row plus ``allowed`` and the winning ``rule_path`` (NULL when no
    rule matched) — verdict rows for lineage, like url_filter.

    Scale posture (10^12 pages): prefix matching is NOT a join predicate —
    pages join rules by host EQUIJOIN (rules-per-host is a small constant,
    so the fan-out is bounded), the prefix test filters map-side, and the
    winner is one max_by groupBy on url; pages with no rules survive via a
    final host-keyed left join, never a cartesian path.
    """
    host = host_of(F.col(url_col))
    path = F.regexp_replace(F.col(url_col), "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "")
    path = F.when(path == "", "/").otherwise(path)
    hosted = pages.withColumn("host", host).withColumn("_path", path)
    matched = (
        hosted.select(url_col, "host", "_path")
        .join(rules, "host")
        .filter(F.col("_path").startswith(F.col("rule_path")))
    )
    winners = matched.groupBy(url_col).agg(
        F.max_by(
            F.struct("is_allow", "rule_path"),
            F.struct("rule_len", "is_allow", "rule_path"),
        ).alias("_w")
    )
    return (
        hosted.join(winners, url_col, "left")
        .select(
            *pages.columns,
            "host",
            F.coalesce(F.col("_w.is_allow"), F.lit(True)).alias("allowed"),
            F.col("_w.rule_path").alias("rule_path"),
        )
    )


def crawl_frontier(
    pages: DataFrame,
    crawled: DataFrame,
    robots: DataFrame | None = None,
    blocked_hosts: tuple[str, ...] = (),
    blocked_url_patterns: tuple[str, ...] = (),
    per_host_budget: int = 10,
    url_col: str = "url",
) -> DataFrame:
    """Next-crawl frontier assembly — the composition that turns the
    individual gating operators into a crawler's scheduling stage:

      1. outlink mining from fetched pages (graph.extract_outlinks);
      2. URL canonicalization + distinct (one shuffle on the URL key);
      3. already-crawled removal by canonical-URL left_anti equijoin;
      4. blocklist gating (url_filter, plan-literal rules, zero shuffle);
      5. robots compliance (robots_gate host-equijoin, when rules given);
      6. per-host politeness budget (host_cap's two-phase rank, so a hot
         host never funnels through one partition).

    Output: url, host, host_rank (≤ per_host_budget) — the deterministic
    fetch list for the next crawl round.

    Scale posture (10^12 pages): every stage is keyed or map-side — the
    html column never shuffles (outlinks collapse map-side), frontier
    candidates shuffle once on url for the distinct/anti-join, robots
    rules fan out by host equijoin, and the budget rank is
    skew-sharded. No stage is new machinery: this IS q59/q37/q61/q69/q66
    composed, which is the point of relational operators.
    """
    from py_image_toolkit_spark.operators.graph import extract_outlinks

    cand = (
        extract_outlinks(pages, url_col=url_col)
        .select(canonical_url(F.col("url")).alias("url"))
        .distinct()
    )
    seen = crawled.select(canonical_url(F.col(url_col)).alias("url")).distinct()
    new = cand.join(seen, "url", "left_anti")
    kept = (
        url_filter(new, blocked_hosts, blocked_url_patterns)
        .filter(F.col("verdict") == "kept")
        .select("url")
    )
    if robots is not None:
        kept = robots_gate(kept, robots).filter(F.col("allowed")).select("url")
    return host_cap(kept, per_host_budget, url_col="url", id_col="url").select(
        "url", "host", "host_rank"
    )


def crawl_delays(
    robots: DataFrame,
    host_col: str = "host",
    txt_col: str = "robots_txt",
    default_s: int = 1,
) -> DataFrame:
    """Per-host ``Crawl-delay`` for the ``*`` agent group. The group's
    section is isolated WITHOUT lookahead (RE2 — the oracle's engine —
    has none): lazily capture up to the next ``User-agent:`` and fall
    back to capture-to-end when the ``*`` group is last; then read its
    ``Crawl-delay: N`` line, else ``default_s``. Same parse stance as
    robots_rules: no-robots hosts and delay-less groups get the default,
    never an error."""
    txt = F.col(txt_col)
    upto_next = F.regexp_extract(
        txt, r"(?is)User-agent:[ \t]*\*(.*?)User-agent:", 1
    )
    to_end = F.regexp_extract(txt, r"(?is)User-agent:[ \t]*\*(.*)$", 1)
    sect = F.when(upto_next != "", upto_next).otherwise(to_end)
    delay = F.regexp_extract(sect, r"(?i)Crawl-delay:[ \t]*([0-9]+)", 1)
    return robots.select(
        F.col(host_col),
        F.when(delay != "", delay.cast("long"))
        .otherwise(F.lit(default_s))
        .cast("long")
        .alias("crawl_delay_s"),
    )


def politeness_schedule(
    ranked: DataFrame,
    delays: DataFrame,
    host_col: str = "host",
    rank_col: str = "host_rank",
    default_s: int = 1,
) -> DataFrame:
    """Turn per-host fetch ranks into fetch times: the k-th URL of a host
    fetches at ``(k−1) · crawl_delay_s`` seconds into the crawl round —
    the politeness math every fetcher fleet runs. Input is any table
    carrying (host, host_rank) — host_cap / crawl_frontier output; hosts
    without a delay row use the default.

    Scale posture: one host-keyed equijoin against a hosts-sized delay
    table (broadcast) + pure Column arithmetic; the rank already exists,
    so no new window over the frontier."""
    return (
        ranked.join(F.broadcast(delays), host_col, "left")
        .withColumn(
            "crawl_delay_s",
            F.coalesce(F.col("crawl_delay_s"), F.lit(default_s)).cast("long"),
        )
        .withColumn(
            "fetch_offset_s",
            ((F.col(rank_col) - 1) * F.col("crawl_delay_s")).cast("long"),
        )
    )


def sitemap_entries(
    sitemaps: DataFrame, host_col: str = "host", xml_col: str = "sitemap_xml"
) -> DataFrame:
    """URL discovery from sitemap.xml bodies — the crawler's OTHER
    frontier source besides outlinks: ``<url>`` entries yield
    (url, lastmod); ``<sitemap>`` index entries yield nested sitemap
    locations flagged ``is_index`` (a production fetcher enqueues those
    for another parse round). Same regex-over-bytes stance as the HTML
    miners — lazy block captures then per-field extracts, all in the
    Java/RE2 common subset; missing <lastmod> is NULL, malformed blocks
    yield no entry, never an error.

    Output: host, entry_idx (position across both entry kinds), loc,
    lastmod, is_index.

    Scale posture (10^8 sitemaps): one map-side posexplode per body,
    zero shuffle; lastmod strings stay strings (crawl schedulers compare
    W3C datetime lexicographically — no timestamp parse needed).
    """
    xml = F.col(xml_col)
    blocks = F.concat(
        F.regexp_extract_all(xml, F.lit(r"(?is)(<url>.*?</url>)"), 1),
        F.regexp_extract_all(xml, F.lit(r"(?is)(<sitemap>.*?</sitemap>)"), 1),
    )
    e = sitemaps.select(
        F.col(host_col),
        F.posexplode(blocks).alias("entry_idx", "_b"),
    )
    loc = F.regexp_extract(F.col("_b"), r"(?is)<loc>\s*(.*?)\s*</loc>", 1)
    lastmod = F.regexp_extract(F.col("_b"), r"(?is)<lastmod>\s*(.*?)\s*</lastmod>", 1)
    return (
        e.select(
            host_col,
            F.col("entry_idx").cast("long").alias("entry_idx"),
            loc.alias("loc"),
            F.when(lastmod != "", lastmod).alias("lastmod"),
            F.col("_b").startswith("<sitemap>").alias("is_index"),
        )
        .filter(F.col("loc") != "")
    )


def training_eligibility(
    pages: DataFrame,
    robots: DataFrame | None = None,
    blocked_hosts: tuple[str, ...] = (),
    blocked_url_patterns: tuple[str, ...] = (),
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """Post-fetch compliance verdict: may this PAGE enter a training
    corpus? The crawl-side gates (q61 blocklist, q69 robots) say what to
    FETCH; this operator re-checks the fetched page itself, adding the
    in-document signal — a robots meta ``noindex`` — that is only
    visible after fetching. First failing gate wins:

        blocked_host / blocked_pattern  — operator blocklists
        robots_disallow                 — the host's robots rules (the
                                          page was fetched anyway — e.g.
                                          rules changed since fetch)
        meta_noindex                    — in-document opt-out

    Output: url, host, eligible (bool), reason (NULL when eligible) —
    verdict rows for lineage, like every gate in this module.

    Scale posture (10^12 pages): the meta probe is one map-side codegen
    regexp (html never shuffles), the blocklist folds into the plan as
    literals, robots fan out by host equijoin. One pass, no new
    machinery — url_filter ∘ robots_gate ∘ extract_meta composed.
    """
    from py_image_toolkit_spark.operators.html_meta import extract_meta

    meta = extract_meta(pages, url_col, html_col).select(url_col, "noindex")
    gated = url_filter(
        pages.select(url_col), blocked_hosts, blocked_url_patterns, url_col
    ).select(url_col, "host", F.col("verdict").alias("_block"))
    if robots is not None:
        rg = robots_gate(pages.select(url_col), robots, url_col).select(
            url_col, F.col("allowed").alias("_allowed")
        )
        gated = gated.join(rg, url_col)
    else:
        gated = gated.withColumn("_allowed", F.lit(True))
    j = gated.join(meta, url_col)
    reason = (
        F.when(F.col("_block") != "kept", F.col("_block"))
        .when(~F.col("_allowed"), F.lit("robots_disallow"))
        .when(F.col("noindex"), F.lit("meta_noindex"))
    )
    return j.select(
        url_col,
        "host",
        reason.isNull().alias("eligible"),
        reason.alias("reason"),
    )


def robots_sitemaps(
    robots: DataFrame, host_col: str = "host", txt_col: str = "robots_txt"
) -> DataFrame:
    """``Sitemap:`` directives from robots bodies — the link from the
    robots family (q69/q84) to the sitemap family (q85): per the spec
    these lines are GROUP-INDEPENDENT, so unlike Crawl-delay no agent
    scoping applies; every occurrence is collected in body order.
    One map-side posexplode, zero shuffle."""
    urls = F.regexp_extract_all(
        F.col(txt_col), F.lit(r"(?im)^[ \t]*Sitemap:[ \t]*([^\r\n]+)"), 1
    )
    return robots.select(
        F.col(host_col),
        F.posexplode(urls).alias("sitemap_idx", "sitemap_url"),
    ).select(
        host_col,
        F.col("sitemap_idx").cast("long").alias("sitemap_idx"),
        F.trim(F.col("sitemap_url")).alias("sitemap_url"),
    )


def url_templates(
    df: DataFrame, url_col: str = "url", k: int = 50
) -> DataFrame:
    """URL path-template mining: digit runs collapse to ``{n}`` and the
    top-k templates by frequency emerge — how crawl analysis finds the
    ``/product/{n}`` and ``/page/{n}`` families that dominate a site
    (for crawl-budget shaping and URL-pattern blocklists). Map-side
    regex + one template-keyed groupBy + TakeOrderedAndProject.
    """
    path = F.regexp_replace(
        F.col(url_col), r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", ""
    )
    tmpl = F.regexp_replace(path, "[0-9]+", "{n}")
    tmpl = F.when(tmpl == "", "/").otherwise(tmpl)
    return (
        df.select(host_of(F.col(url_col)).alias("host"), tmpl.alias("template"))
        .groupBy("host", "template")
        .agg(F.count(F.lit(1)).cast("long").alias("n_urls"))
        .orderBy(F.desc("n_urls"), "host", "template")
        .limit(k)
    )


def host_language_diversity(
    df: DataFrame,
    url_col: str = "url",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-host language diversity by the Gini–Simpson index — chosen
    over Shannon entropy because 1 − Σ pᵢ² is integer-exact:

        diversity_micro = 1e6 − (1e6 · Σ_l n_l²) DIV n²

    0 ⇒ monolingual host, →1e6 ⇒ evenly mixed. The curation signal: a
    host serving many languages is usually an aggregator/spam mill,
    while legit sites are near-monolingual.

    Scale posture: one (host, lang) groupBy (map-side combinable) + one
    host groupBy over the already-tiny per-language rows.
    """
    hosted = df.select(host_of(F.col(url_col)).alias("host"), F.col(lang_col))
    per_lang = hosted.groupBy("host", lang_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_l")
    )
    return (
        per_lang.groupBy("host")
        .agg(
            F.sum("n_l").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_langs"),
            F.sum(F.col("n_l") * F.col("n_l")).cast("long").alias("_ss"),
        )
        .withColumn(
            "diversity_micro",
            F.expr(
                "CAST(1000000 AS BIGINT)"
                " - CAST(1000000 AS BIGINT) * _ss DIV (n_docs * n_docs)"
            ),
        )
        .select("host", "n_docs", "n_langs", "diversity_micro")
    )


def shard_assignment(
    df: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
    size_col: str = "n_chars",
) -> DataFrame:
    """Deterministic output sharding with a balance report: docs hash to
    ``md5(id) mod n_shards`` (rerun-stable, engine-independent — the
    writer-side partitioning plan for a corpus release) and the report
    shows per-shard doc/byte totals plus each shard's exact ppm
    deviation from the mean byte load — the number that says whether
    hash sharding suffices or size-aware packing (q49) is needed.

    Scale posture: assignment is a per-row Column; the report is one
    shard-keyed groupBy (n_shards rows) + a broadcast 1-row total.
    """
    shard = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string").cast("binary")), 1, 8), 16, 10)
        .cast("long") % n_shards
    )
    per = df.select(shard.alias("shard"), F.col(size_col).cast("long").alias("_sz"))
    agg = per.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_sz").cast("long").alias("total_bytes"),
    )
    tot = agg.agg(F.sum("total_bytes").cast("long").alias("_grand"))
    return (
        agg.crossJoin(F.broadcast(tot))
        .withColumn(
            "dev_ppm",
            F.expr(
                f"CAST(1000000 AS BIGINT) * total_bytes * {n_shards} DIV _grand"
                " - CAST(1000000 AS BIGINT)"
            ),
        )
        .select("shard", "n_docs", "total_bytes", "dev_ppm")
    )


def link_density(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Outlink-density quality signal: anchors per 10k characters of raw
    HTML plus the anchor count itself — link farms and nav-only pages
    score high, article pages low; boilerpipe-class extractors use
    exactly this ratio at block level, this is the page-level rollup
    that gates BEFORE the expensive DOM parse runs.

    Map-side only: one regexp count + one length, exact ppm10k via
    BIGINT DIV; the html column never shuffles.
    """
    html_text = F.col(html_col).cast("string")
    n_anchors = F.size(
        F.regexp_extract_all(html_text, F.lit(r"(?i)<a[\s>]"), 0)
    ).cast("long")
    n_chars = F.length(html_text).cast("long")
    return pages.select(
        F.col(url_col),
        n_anchors.alias("n_anchors"),
        n_chars.alias("n_chars"),
    ).withColumn(
        "anchors_per_10k",
        F.expr(
            "CAST(10000 AS BIGINT) * n_anchors"
            " DIV GREATEST(n_chars, CAST(1 AS BIGINT))"
        ).cast("long"),
    )
