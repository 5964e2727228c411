"""Corpus-level assembly/statistics operators for training-data curation.

- vocab_topk         : corpus-wide token vocabulary with occurrence and
                       document frequencies, deterministic top-k
- tfidf_topk         : per-document top-k salient tokens by an integer-exact
                       TF-IDF proxy (no float logs — bit-reproducible)
- stratified_sample  : EXACT per-stratum quotas in a reproducible hash order,
                       with a two-phase rank so no stratum funnels through a
                       single partition
- bpe_pair_counts    : the inner loop of BPE tokenizer training — corpus-
                       weighted adjacent-symbol pair frequencies from the
                       word-frequency table
- pmi_bigrams        : collocation mining — adjacent-token bigrams scored by
                       an integer-exact PMI proxy against unigram counts
- length_percentiles : per-group token-length distribution (min/discrete
                       percentiles/max) via a value histogram — never a
                       global sort of the corpus

All pure Column code (whole-stage codegen, no Python on the hot path).
Reference analog: py-image-toolkit has no corpus layer; these are the
standard curation stages a Common-Crawl-scale text pipeline adds on top of
extraction (SURVEY.md §2 "LLM-pipeline" family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from py_image_toolkit_spark.operators.dedup import _md5, tokens_array
from py_image_toolkit_spark.operators.text_stats import BPE_RE


def _token_tf(df: DataFrame, id_col: str, text_col: str, pattern: str) -> DataFrame:
    """(id, token, _tf) — per-document term frequencies.

    Scale posture: explode happens map-side; the groupBy on (doc, token) is
    the only corpus-sized shuffle and benefits from partial (map-side)
    aggregation, so the shuffled rows are already per-(doc,token) counts,
    not raw token occurrences.
    """
    return (
        df.select(
            F.col(id_col),
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(pattern), 0)
            ).alias("token"),
        )
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )


def vocab_topk(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 100,
    pattern: str = BPE_RE,
) -> DataFrame:
    """Corpus vocabulary: top-``k`` tokens by total occurrences (ties broken
    lexicographically), with document frequency attached.

    Scale posture (100 TB): two keyed aggregations — (doc, token) with
    map-side combine, then token over the already-reduced rows — followed
    by ``ORDER BY … LIMIT k`` which Spark executes as TakeOrderedAndProject
    (per-partition top-k + driver merge of k·P rows), never a global sort
    shuffle of the vocabulary.
    """
    per = _token_tf(df, id_col, text_col, pattern)
    return (
        per.groupBy("token")
        .agg(
            F.sum("_tf").cast("long").alias("occurrences"),
            F.count(F.lit(1)).cast("long").alias("doc_freq"),
        )
        .orderBy(F.desc("occurrences"), "token")
        .limit(k)
    )


def tfidf_topk(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    pattern: str = BPE_RE,
    idf_scale: int = 1_000_000,
) -> DataFrame:
    """Per-document top-``k`` salient tokens by an integer-exact TF-IDF
    proxy: ``score = tf * (idf_scale * n_docs DIV doc_freq)``.

    The classical ``ln(N/df)`` idf is deliberately replaced by the scaled
    integer ratio: monotone in the same direction, but exact BIGINT
    arithmetic in every engine (IEEE ``ln`` may differ in the last ulp
    between JVM and C runtimes, which would break cross-engine hashing
    and run-to-run reproducibility of the selected keyword set).

    Scale posture (100 TB): tf table reduced map-side; doc_freq is a second
    aggregation over the reduced rows; the tf↔df join is a token-keyed
    equijoin (the vocabulary is NOT assumed broadcastable at web scale);
    the 1-row corpus count IS broadcast; final top-k is one doc-keyed
    window over rows already shrunk to (doc, token) granularity.
    """
    per = _token_tf(df, id_col, text_col, pattern)
    dfreq = per.groupBy("token").agg(F.count(F.lit(1)).alias("doc_freq"))
    n_docs = df.select(
        F.count_distinct(F.col(id_col)).cast("long").alias("_n_docs")
    )
    scored = (
        per.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "token",
            F.col("_tf").cast("long").alias("tf"),
            (
                F.col("_tf")
                * F.expr(f"CAST({idf_scale} AS BIGINT) * _n_docs DIV doc_freq")
            ).cast("long").alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), "token")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "token", "tf", "score", F.col("rank").cast("long").alias("rank"))
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str = "lang",
    quotas: dict[str, int] | None = None,
    default_quota: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT per-stratum quotas: the first ``quota(stratum)`` documents of
    each stratum in md5(id) order are kept, with their global in-stratum
    rank attached. Deterministic and engine-independent (pure md5 order),
    unlike rate-based sampling (q39/q43) which is approximate by design.

    Scale posture (100 TB): a naive ``ROW_NUMBER() OVER (PARTITION BY
    stratum)`` funnels each stratum through one partition — fatal when one
    language is 40% of the corpus. Here the rank is two-phase (the
    pack_sequences pattern): rows are sub-bucketed by the first hex nibble
    of their sort key, ranked per (stratum, bucket) in parallel, and a
    broadcast (stratum, bucket)-totals table supplies base offsets. Because
    the sort key begins with the bucket character, per-bucket rank + base
    equals the serial per-stratum rank exactly.
    """
    quotas = quotas or {}
    key = _md5(F.col(id_col).cast("string"))
    base = df.select(
        F.col(id_col),
        F.col(strata_col),
        key.alias("_key"),
        F.substring(key, 1, 1).alias("_bucket"),
    )
    w = Window.partitionBy(strata_col, "_bucket").orderBy("_key", id_col)
    local = base.withColumn("_rn", F.row_number().over(w))
    totals = base.groupBy(strata_col, "_bucket").agg(
        F.count(F.lit(1)).alias("_tot")
    )
    wb = (
        Window.partitionBy(strata_col)
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bases = totals.select(
        strata_col,
        "_bucket",
        F.coalesce(F.sum("_tot").over(wb), F.lit(0)).alias("_base"),
    )
    quota = F.lit(default_quota)
    for stratum, q in sorted(quotas.items()):
        quota = F.when(F.col(strata_col) == stratum, q).otherwise(quota)
    return (
        local.join(F.broadcast(bases), [strata_col, "_bucket"])
        .select(
            id_col,
            strata_col,
            (F.col("_base") + F.col("_rn")).cast("long").alias("stratum_rank"),
        )
        .filter(F.col("stratum_rank") <= quota)
    )


def bpe_pair_counts(
    df: DataFrame,
    text_col: str = "text",
    k: int = 50,
) -> DataFrame:
    """One round of the BPE tokenizer-training inner loop, distributed: the
    top-``k`` adjacent-symbol pairs by corpus-weighted frequency, computed
    from the word-frequency table (the merge candidates; iterating
    merge-then-recount yields the full BPE vocabulary).

    Words are whitespace tokens; symbols are single characters (the seed
    alphabet of round 0). Each word contributes ``freq(word)`` to every
    adjacent character pair inside it.

    Scale posture (100 TB): the corpus collapses to its word-frequency
    table FIRST (one map-side-combinable groupBy — the vocabulary is
    orders of magnitude smaller than the corpus); pair explosion then runs
    over distinct words only, weighted by freq, so a word repeated 10^9
    times is processed once. Top-k is TakeOrderedAndProject, never a
    global sort.
    """
    words = (
        df.select(F.explode(tokens_array(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("_freq"))
        .filter(F.length("word") >= 2)
    )
    pairs = words.select(
        "_freq",
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1), "
                "i -> struct(substring(word, i, 1) AS lhs, "
                "substring(word, i + 1, 1) AS rhs))"
            )
        ).alias("p"),
    )
    return (
        pairs.groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
        .agg(F.sum("_freq").cast("long").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "lhs", "rhs")
        .limit(k)
    )


def pmi_bigrams(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 2,
    scale: int = 1_000_000,
) -> DataFrame:
    """Collocation mining: adjacent-token bigrams scored by an integer-exact
    PMI proxy ``score = (scale * N * c_ab) DIV (c_a * c_b)`` where ``N`` is
    the corpus token count — monotone in ``exp(PMI)``, but exact BIGINT
    arithmetic so the mined collocation set is bit-reproducible across
    engines (float ``log`` would differ in the last ulp).

    Scale posture (100 TB): bigrams are built map-side from the token array
    (``transform(sequence …)`` — no per-doc window, no self-join); unigram
    and bigram tables are both map-side-combined groupBys; the two joins
    attach unigram counts by token key (the vocabulary is NOT assumed
    broadcastable); the 1-row N is broadcast. Overflow note: at 10^12-token
    scale ``scale * N * c_ab`` exceeds int64 — production would compute in
    DECIMAL(38,0); BIGINT kept here because the driver hash-gate compares
    integer types exactly.
    """
    arr = tokens_array(F.col(text_col))
    toks = df.select(F.explode(arr).alias("tok"))
    uni = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    n = toks.select(F.count(F.lit(1)).cast("long").alias("_n"))
    big = (
        df.select(arr.alias("_a"))
        # sequence(0, -2) would DESCEND, not come back empty — guard short docs
        .filter(F.size("_a") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(_a) - 2), "
                    "i -> struct(_a[i] AS w1, _a[i + 1] AS w2))"
                )
            ).alias("b")
        )
        .select(F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= min_count)
    )
    u1 = uni.select(F.col("tok").alias("w1"), F.col("c").alias("c_a"))
    u2 = uni.select(F.col("tok").alias("w2"), F.col("c").alias("c_b"))
    return (
        big.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(n))
        .select(
            "w1",
            "w2",
            F.col("c_ab").cast("long").alias("pair_count"),
            F.expr(
                f"CAST({scale} AS BIGINT) * _n * c_ab DIV (c_a * c_b)"
            ).cast("long").alias("pmi_micro"),
        )
    )


def length_percentiles(
    df: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    percentiles: tuple[int, ...] = (50, 90, 99),
) -> DataFrame:
    """Per-group token-length distribution summary: doc count, min, max and
    DISCRETE percentiles — ``p`` = the smallest length whose cumulative doc
    count reaches ``ceil(p% · n_docs)`` (an actual corpus value, integer
    exact; never interpolated floats).

    Scale posture (100 TB): the corpus collapses to a (group, length)
    HISTOGRAM first — one map-side-combinable groupBy — and the cumulative
    window then runs over distinct lengths only (thousands of rows, not
    trillions). Never a global sort or per-group funnel of document rows;
    this is the standard count-histogram percentile trick.
    """
    n_tok = F.size(tokens_array(F.col(text_col))).cast("long")
    hist = (
        df.select(F.col(group_col), n_tok.alias("_len"))
        .groupBy(group_col, "_len")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy("_len")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.withColumn("_cum", F.sum("_cnt").over(w)).withColumn(
        "_tot", F.sum("_cnt").over(Window.partitionBy(group_col))
    )
    aggs = [
        F.count(F.lit(1)).cast("long").alias("distinct_lengths"),
        F.max("_tot").cast("long").alias("n_docs"),
        F.min("_len").cast("long").alias("min_len"),
        F.max("_len").cast("long").alias("max_len"),
    ]
    for p in percentiles:
        # smallest length with cum >= ceil(p% of total); integer ceil-division
        # so no float enters the threshold
        thresh = F.expr(f"CAST((_tot * {p} + 99) DIV 100 AS BIGINT)")
        aggs.append(
            F.min(F.when(F.col("_cum") >= thresh, F.col("_len")))
            .cast("long")
            .alias(f"p{p}_len")
        )
    return cum.groupBy(group_col).agg(*aggs)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Release-to-release corpus diff by content hash: every doc id in
    either snapshot classified as added / removed / changed / unchanged —
    the audit table a dataset release ships alongside its manifest (what
    moved between v1 and v2, without diffing text bodies).

    Output: id, old_hash, new_hash (null when absent), status.

    Scale posture (100 TB): both snapshots reduce map-side to (id, md5)
    — text never shuffles — then one id-keyed full outer join; status is
    pure Column arithmetic on the joined hashes. Never a text comparison,
    never a sort.
    """
    o = old.select(F.col(id_col), _md5(F.col(text_col)).alias("old_hash"))
    n = new.select(F.col(id_col), _md5(F.col(text_col)).alias("new_hash"))
    j = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(F.col("old_hash") == F.col("new_hash"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(id_col, "old_hash", "new_hash", status.alias("status"))


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    qid_col: str = "query_id",
    qtext_col: str = "qtext",
    k: int = 5,
    k1_micro: int = 1_200_000,
    b_micro: int = 750_000,
) -> DataFrame:
    """Full-corpus BM25 retrieval, integer-exact: top-k documents per
    query under the Okapi ranking function with every factor carried in
    micro-units and BIGINT floor division (bit-reproducible cross-engine,
    like the q52 TF-IDF / q57 PMI proxies — the idf is the raw
    (N−df)/(df+1) ratio rather than its log, which preserves the
    more-selective-term-wins ordering without floats):

        idf_micro  = min(1e6·(N−df) DIV (df+1), 1e12)       [cap: int64
                      products stay < 2^63 even at web-scale N]
        rel_len    = 1e6·dl·N DIV total_tokens              [dl/avgdl]
        norm       = 1e6 − b + b·rel_len DIV 1e6
        denom      = 1e6·tf + k1·norm DIV 1e6
        tf_factor  = 1e6·tf·(k1+1e6) DIV denom              [≤ k1+1e6]
        contrib    = idf·tf_factor DIV 1e6
        score      = Σ_t contrib   (distinct query terms)

    Scale posture (100 TB): per-doc tf/dl reduce map-side into one
    doc+token groupBy; df is one token-keyed groupBy over distinct
    (doc, token); the query set is small by nature → broadcast on the
    token equijoin (the corpus never re-shuffles per query); corpus
    scalars (N, total tokens) ride along as a broadcast single row;
    final top-k is TakeOrderedAndProject-shaped per query via one
    (query)-keyed window. Ties break by doc id.
    """
    toks = docs.select(
        F.col(id_col), F.explode(tokens_array(F.col(text_col))).alias("tok")
    )
    tf = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).cast("long").alias("tf"))
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).cast("long").alias("dl"))
    df_tab = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("df"))
    scal = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    ).crossJoin(
        toks.agg(F.count(F.lit(1)).cast("long").alias("total_tokens"))
    )

    qtok = queries.select(
        F.col(qid_col), F.explode(tokens_array(F.col(qtext_col))).alias("tok")
    ).distinct()

    j = (
        tf.join(F.broadcast(qtok), "tok")
        .join(dl, id_col)
        .join(df_tab, "tok")
        .crossJoin(F.broadcast(scal))
    )
    M = "CAST(1000000 AS BIGINT)"
    j = (
        j.withColumn(
            "idf_micro",
            F.expr(
                f"LEAST({M} * (n_docs - df) DIV (df + 1),"
                " CAST(1000000000000 AS BIGINT))"
            ),
        )
        .withColumn("rel_len_micro", F.expr(f"{M} * dl * n_docs DIV total_tokens"))
        .withColumn(
            "norm_micro",
            F.expr(f"{M} - {b_micro} + {b_micro} * rel_len_micro DIV {M}"),
        )
        .withColumn(
            "denom_micro", F.expr(f"{M} * tf + {k1_micro} * norm_micro DIV {M}")
        )
        .withColumn(
            "tf_factor_micro",
            F.expr(f"{M} * tf * ({k1_micro} + 1000000) DIV denom_micro"),
        )
        .withColumn("contrib_micro", F.expr(f"idf_micro * tf_factor_micro DIV {M}"))
    )
    scores = j.groupBy(qid_col, id_col).agg(
        F.sum("contrib_micro").cast("long").alias("score_micro"),
        F.count(F.lit(1)).cast("long").alias("matched_terms"),
    )
    w = Window.partitionBy(qid_col).orderBy(
        F.col("score_micro").desc(), F.col(id_col)
    )
    return (
        scores.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(qid_col, "rank", id_col, "score_micro", "matched_terms")
    )


def release_gate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    langs: tuple[str, ...] = ("en",),
    min_tokens: int = 15,
    min_quality: int = 250_000,
    lm_model: DataFrame | None = None,
    min_fluency_micro: int = 640_000,
) -> DataFrame:
    """The corpus-release decision table: every document gets a kept/
    dropped verdict with its FIRST failing gate as the reason — the
    lineage a dataset release ships so every exclusion is auditable
    (the release-side sibling of q76's crawl-frontier composition).

    Gates in precedence order (first match wins):

      lang        — language not in the release set;
      too_short   — fewer than ``min_tokens`` whitespace tokens;
      low_quality — q25's composite curation score below threshold;
      low_fluency — q71's char-trigram LM score below threshold
                    (skipped when no model is given);
      exact_dup   — a non-canonical member of an md5(text) duplicate
                    group (min id is the keeper).

    Output: id, lang, n_tokens, quality_score, fluency_micro, kept,
    reason (NULL when kept).

    Scale posture (100 TB): quality features are pure per-row Columns;
    the LM score is one broadcast join + doc-keyed groupBy (q71's
    shape); exact-dup canonicalization is one hash-keyed groupBy + one
    id-keyed equijoin back. No gate re-reads text after its own pass.
    """
    from py_image_toolkit_spark.operators.text_stats import (
        char_lm_score,
        quality_score,
    )

    q = quality_score(docs, id_col, text_col)
    hashed = docs.select(F.col(id_col), _md5(F.col(text_col)).alias("_h"))
    canon = hashed.groupBy("_h").agg(F.min(id_col).alias("_canonical"))
    dup = hashed.join(canon, "_h").select(id_col, "_canonical")

    j = (
        docs.select(F.col(id_col), F.col(lang_col))
        .join(q.select(id_col, "n_tokens", "quality_score"), id_col)
        .join(dup, id_col)
    )
    if lm_model is not None:
        fl = char_lm_score(docs, lm_model, id_col, text_col).select(
            id_col, "fluency_micro"
        )
        j = j.join(fl, id_col, "left").withColumn(
            "fluency_micro", F.coalesce(F.col("fluency_micro"), F.lit(0)).cast("long")
        )
    else:
        j = j.withColumn("fluency_micro", F.lit(None).cast("long"))

    reason = (
        F.when(~F.col(lang_col).isin(*langs), F.lit("lang"))
        .when(F.col("n_tokens") < min_tokens, F.lit("too_short"))
        .when(F.col("quality_score") < min_quality, F.lit("low_quality"))
    )
    if lm_model is not None:
        reason = reason.when(
            F.col("fluency_micro") < min_fluency_micro, F.lit("low_fluency")
        )
    reason = reason.when(F.col(id_col) != F.col("_canonical"), F.lit("exact_dup"))

    return j.select(
        id_col,
        lang_col,
        "n_tokens",
        "quality_score",
        "fluency_micro",
        reason.isNull().alias("kept"),
        reason.alias("reason"),
    )


def budget_allocation(
    docs: DataFrame,
    budget_tokens: int,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Training-mix token-budget allocator: given a global token budget
    and per-source mix weights (a ``(source, weight_ppm)`` table), compute
    each source's token target, the deterministic md5-threshold keep-rate
    that realizes it, and the ACTUAL kept docs/tokens under that cut —
    the static DoReMi-style step that turns "mix 30% wiki / 60% web /
    10% code" into concrete reproducible per-source samples.

        target_s   = budget · w_s DIV Σw
        rate_ppm_s = min(1e6, 1e6·target_s DIV avail_s)   [under-supplied
                     sources cap at keep-everything; excess budget is NOT
                     redistributed — rerun with rebalanced weights if a
                     source runs dry, so allocations stay auditable]

    The keep decision reuses the hash_sample/weighted_sample mechanism
    (md5 8-hex prefix < per-source threshold), so budget cuts are nested:
    raising a source's weight strictly grows its sample.

    Output: source, n_docs, avail_tokens, target_tokens, rate_ppm,
    kept_docs, kept_tokens.

    Scale posture (100 TB): one source-keyed groupBy for availability
    (map-side combinable), the allocation table is sources-sized and
    broadcasts onto a map-side filter, one more source-keyed groupBy for
    the kept rollup. Integer products are ordered to stay < 2^63 at
    10^12-token budgets.
    """
    toks = docs.select(
        F.col(id_col),
        F.col(source_col),
        F.size(tokens_array(F.col(text_col))).cast("long").alias("n_tokens"),
        F.substring(
            F.md5(F.col(id_col).cast("string").cast("binary")), 1, 8
        ).alias("_pfx"),
    )
    avail = toks.groupBy(source_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("avail_tokens"),
    )
    wsum = weights.agg(F.sum("weight_ppm").cast("long").alias("_wsum"))
    alloc = (
        avail.join(weights, source_col, "left")
        .withColumn("weight_ppm", F.coalesce(F.col("weight_ppm"), F.lit(0)).cast("long"))
        .crossJoin(F.broadcast(wsum))
        .withColumn(
            "target_tokens",
            F.expr(f"CAST({budget_tokens} AS BIGINT) * weight_ppm DIV _wsum"),
        )
        .withColumn(
            "rate_ppm",
            F.expr(
                "LEAST(CAST(1000000 AS BIGINT),"
                " CAST(1000000 AS BIGINT) * target_tokens"
                " DIV GREATEST(avail_tokens, CAST(1 AS BIGINT)))"
            ),
        )
        .withColumn(
            "_thr",
            F.when(F.col("rate_ppm") >= 1_000_000, F.lit("g")).otherwise(
                F.lpad(
                    F.lower(
                        F.hex(F.expr("CAST(4294967296 AS BIGINT) * rate_ppm DIV 1000000"))
                    ),
                    8,
                    "0",
                )
            ),
        )
    )
    kept = toks.join(
        F.broadcast(alloc.select(source_col, "_thr")), source_col
    ).filter(F.col("_pfx") < F.col("_thr"))
    summary = kept.groupBy(source_col).agg(
        F.count(F.lit(1)).cast("long").alias("kept_docs"),
        F.sum("n_tokens").cast("long").alias("kept_tokens"),
    )
    return (
        alloc.join(summary, source_col, "left")
        .select(
            source_col,
            "n_docs",
            "avail_tokens",
            "target_tokens",
            "rate_ppm",
            F.coalesce(F.col("kept_docs"), F.lit(0)).cast("long").alias("kept_docs"),
            F.coalesce(F.col("kept_tokens"), F.lit(0)).cast("long").alias("kept_tokens"),
        )
    )


def source_health(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    min_tokens: int = 15,
) -> DataFrame:
    """Per-source corpus health rollup — the QA dashboard table a release
    pipeline emits per ingest feed: volume, duplication pressure, short-doc
    share and mean curation quality, all integer-exact.

        n_docs, total_tokens     — volume
        dup_docs                 — docs whose exact text also appears under
                                   a LOWER doc id anywhere in the corpus
                                   (cross-source: a feed that re-serves
                                   another feed's content shows it here)
        short_docs               — below the min_tokens floor
        mean_quality_micro       — q25 composite, summed then DIV'd

    Scale posture (100 TB): quality/token features are per-row Columns;
    duplicate detection is one hash-keyed groupBy (min id) + id equijoin
    back (exact_dedup's shape); the rollup is one source-keyed groupBy —
    every aggregate algebraic/map-side-combinable.
    """
    from py_image_toolkit_spark.operators.text_stats import quality_score

    q = quality_score(docs, id_col, text_col).select(
        id_col, "n_tokens", "quality_score"
    )
    hashed = docs.select(F.col(id_col), F.col(source_col), _md5(F.col(text_col)).alias("_h"))
    canon = hashed.groupBy("_h").agg(F.min(id_col).alias("_first"))
    j = hashed.join(canon, "_h").join(q, id_col)
    return (
        j.groupBy(source_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.sum((F.col(id_col) != F.col("_first")).cast("long"))
            .cast("long")
            .alias("dup_docs"),
            F.sum((F.col("n_tokens") < min_tokens).cast("long"))
            .cast("long")
            .alias("short_docs"),
            F.sum("quality_score").cast("long").alias("_qsum"),
        )
        .withColumn("mean_quality_micro", F.expr("_qsum DIV n_docs"))
        .select(
            source_col,
            "n_docs",
            "total_tokens",
            "dup_docs",
            "short_docs",
            "mean_quality_micro",
        )
    )


def weighted_topk_sample(
    df: DataFrame,
    weight_col: str,
    k: int = 100,
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, deterministic: the
    Efraimidis–Spirakis scheme with the md5 hash standing in for the
    uniform draw — item priority = hash32 DIV weight, keep the k LOWEST
    priorities. Higher weight ⇒ proportionally higher keep odds (halving
    the divisor doubles the survival chance of a uniform key), zero
    weight ⇒ never kept, and the whole draw replays bit-identically on
    any engine / any rerun — the property the float-pow textbook form
    (u^(1/w)) cannot give a cross-engine hash gate.

    Output: id, weight, priority, sample_rank (1..k by priority asc,
    id tie-break).

    Scale posture (100 TB): priority is a per-row Column; the k winners
    reduce via TakeOrderedAndProject (per-partition top-k + single
    merge), never a global sort. The classic use: quality-weighted
    corpus subsampling where high-quality docs should be over-represented
    but every doc keeps a nonzero, auditable chance.
    """
    h32 = F.conv(
        F.substring(_md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    base = (
        df.select(
            F.col(id_col),
            F.col(weight_col).cast("long").alias("weight"),
            h32.alias("_h"),
        )
        .withColumn(
            "priority", F.expr("CASE WHEN weight > 0 THEN _h DIV weight END")
        )
        .filter(F.col("priority").isNotNull())
    )
    wnd = Window.orderBy("priority", id_col)
    return (
        base.orderBy("priority", id_col)
        .limit(k)
        .withColumn("sample_rank", F.row_number().over(wnd).cast("long"))
        .select(id_col, "weight", "priority", "sample_rank")
    )


def best_snippet(
    docs: DataFrame,
    query_terms: tuple[str, ...],
    window_tokens: int = 12,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Retrieval snippet generation: for each document, the
    ``window_tokens``-wide token window containing the MOST query-term
    hits (earliest window wins ties — deterministic), plus the hit
    count. The display layer of a search stack: q74 ranks documents,
    this picks what to show.

    Scale posture (100 TB): query terms fold into the plan as a literal
    ``isin`` (no join); hit density is one doc-keyed frame window over
    dense positions; the winner is a max_by aggregation (no second
    window pass); the snippet re-joins from the token array map-side.
    One doc-keyed shuffle total.
    """
    toks = docs.select(
        F.col(id_col),
        F.posexplode(tokens_array(F.col(text_col))).alias("pos", "tok"),
    )
    hit = F.col("tok").isin(*query_terms).cast("long")
    w_frame = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.currentRow, window_tokens - 1)
    )
    scored = toks.withColumn("_hits", F.sum(hit).over(w_frame))
    # earliest max-density window start per doc: max_by on (hits, -pos)
    win = scored.groupBy(id_col).agg(
        F.max_by(
            F.struct(F.col("pos").alias("start"), F.col("_hits").alias("hits")),
            F.struct(F.col("_hits"), (-F.col("pos")).alias("np")),
        ).alias("_w"),
        F.count(F.lit(1)).cast("long").alias("_n"),
    )
    arr = docs.select(
        F.col(id_col), tokens_array(F.col(text_col)).alias("_arr")
    )
    return (
        win.join(arr, id_col)
        .select(
            id_col,
            F.col("_w.start").cast("long").alias("snippet_start"),
            F.col("_w.hits").cast("long").alias("snippet_hits"),
            F.array_join(
                F.slice(F.col("_arr"), F.col("_w.start") + 1, window_tokens), " "
            ).alias("snippet"),
        )
        .filter(F.col("snippet_hits") > 0)
    )


def oov_rate(
    docs: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "lang",
    token_col: str = "token",
) -> DataFrame:
    """Vocabulary coverage audit: per group, the share of corpus token
    OCCURRENCES not covered by the given vocabulary (out-of-vocabulary
    rate, exact ppm) — the number that says whether a tokenizer/vocab
    trained on one slice transfers to the rest of the corpus.

    Scale posture: tokens explode map-side and reduce to (group, tok)
    counts before joining the vocabulary (token-keyed left join — the
    vocab is NOT assumed broadcastable, matching tfidf_topk's stance);
    one final group rollup, all aggregates algebraic.
    """
    toks = (
        docs.select(
            F.col(group_col),
            F.explode(tokens_array(F.col(text_col))).alias("tok"),
        )
        .groupBy(group_col, "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    v = vocab.select(F.col(token_col).alias("tok")).distinct()
    j = toks.join(v.withColumn("_inv", F.lit(1)), "tok", "left")
    return (
        j.groupBy(group_col)
        .agg(
            F.sum("n").cast("long").alias("total_tokens"),
            F.sum(F.when(F.col("_inv").isNull(), F.col("n")).otherwise(0))
            .cast("long")
            .alias("oov_tokens"),
        )
        .withColumn(
            "oov_micro",
            F.expr("CAST(1000000 AS BIGINT) * oov_tokens DIV total_tokens"),
        )
    )
