"""E3 field extraction: token labeling → run-merge → first-wins pivot,
entirely as Column/Window code (the reference's hardest per-row logic,
ocr.py:135-432, with zero Python on the path).

Mapping (SURVEY.md §2):
- H9-H14 classifier      → one when/otherwise chain over broadcast keyword
  literals (C5) + a lag() road-number guard (C4)
- C2 name inference      → window-min anchors + conditional min() winner
  (fast path rrn_seq == title_seq+2 has no fallback scan — quirk preserved)
- C3 neighbor relabel    → lead() over pre-pass labels (the reference's
  forward in-place loop is equivalent — proven in oracle/labeling.py)
- D5/D6 run-merge        → change-flag running sum → segment ids; date runs
  chunk 3-at-a-time; conditional re-explode keeps invalid triples unmerged
- D4 first-wins pivot    → min(struct(seq, text)) per label (order-safe)

All windows partition by the same keys → a single hash partitioning is
reused across every pass (one shuffle for the whole stage).

Generic over ``keys`` so the same operators run both in the pages pipeline
(keys = url, rule) and in the driver-contract queries over synthesized token
tables (keys = doc_id) with a DuckDB SQL oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from py_image_toolkit_spark.functions import vocab as V

DIGITS_RE = "^[0-9]+$"

# Keyword tests compile to ONE Java regex alternation each instead of an
# OR-chain of Contains nodes: a 44-keyword veto as 44 Contains exprs makes
# the whole-stage-codegen method blow past janino's 64 KB limit → silent
# fallback to interpreted evaluation (~10× slower on the token table).
# Keywords are plain Korean words (no regex metachars), but escape anyway.


def _contains_any(c: Column, kws: Sequence[str]) -> Column:
    import re as _re

    return c.rlike("|".join(_re.escape(k) for k in kws))


def _endswith_any(c: Column, sfxs: Sequence[str]) -> Column:
    import re as _re

    return c.rlike("(" + "|".join(_re.escape(s) for s in sfxs) + ")$")


def _anchored(pattern: str) -> str:
    """Python re.fullmatch parity for rlike (search semantics)."""
    return f"^(?:{pattern})$"


def tokenize_df(
    df: DataFrame, keys: Sequence[str] = ("url", "rule"), text_col: str = "extracted_text"
) -> DataFrame:
    """text → ordered (seq, token) rows; explicit seq, never partition order
    (SURVEY.md §2 E1-window: determinism without implicit ordering)."""
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    return df.select(
        *keys, F.posexplode(toks).alias("seq", "token")
    ).withColumn("seq", F.col("seq").cast("long"))


def classify_token(t: Column, prev: Column, road_guard: Column | None = None) -> Column:
    """H9-H14 classifier for one token given the previous token (C4 road
    guard) — shared by the window implementation (prev = lag) and the
    zero-shuffle array implementation (prev = element_at(toks, i)).

    ``road_guard`` overrides the C4 guard predicate so the dictionary
    encoding in :func:`label_pass1` can evaluate both guard outcomes on the
    distinct-token table (where no ``prev`` exists)."""
    is_title = t.isin(*V.DOC_TITLE_KEYWORDS)
    rrn_clean = F.regexp_replace(F.regexp_replace(t, "-", ""), " ", "")
    is_rrn = t.rlike(_anchored(V.RRN_DASHED_RE)) | rrn_clean.rlike(_anchored(V.RRN_PLAIN_RE))
    is_issuer = (
        _endswith_any(t, V.ISSUER_SUFFIXES)
        | (_contains_any(t, V.ISSUER_ORG_KEYWORDS) & _endswith_any(t, V.ISSUER_ORG_SUFFIXES))
        | t.contains("학교장")
        | (t.endswith("학교") & ~t.contains("대학교"))
    )
    is_date_comp = (
        t.rlike(_anchored(V.YEAR_RE))
        | t.rlike(_anchored(V.MONTH_RE))
        | t.rlike(_anchored(V.DAY_RE))
    )
    if road_guard is None:
        road_guard = (
            prev.isNotNull()
            & _contains_any(prev, V.ROAD_KEYWORDS)
            & t.rlike(DIGITS_RE)
            & (F.length(t) <= 2)
        )
    is_addressish = (
        _contains_any(t, V.ADDRESS_KEYWORDS)
        | t.rlike(V.ADDR_UNIT_RE)
        | t.rlike(V.ADDR_ROAD_RE)
        | t.rlike(V.ADDR_SUFFIX_RE)
        | t.rlike(V.ADDR_NUMERIC_RE)
        | (
            (F.size(F.filter(F.split(t, r"\s+"), lambda x: x != "")) > 1)
            & _contains_any(t, V.MULTIWORD_ADDRESS_KEYWORDS)
        )
    )
    short_digit = t.rlike(DIGITS_RE) & (F.length(t) <= 2)
    clear_addr = _contains_any(t, V.CLEAR_ADDRESS_INDICATORS)

    return (
        F.when(is_title, "document_title")
        .when(is_rrn, "rrn")
        .when(is_issuer, "issuer")
        .when(is_date_comp & ~F.coalesce(road_guard, F.lit(False)), "issue_date")
        .when(is_addressish & ~(short_digit & ~clear_addr), "address")
        .otherwise("O")
    )


def label_pass1(
    tokens: DataFrame, keys: Sequence[str], dict_encode: bool = True
) -> DataFrame:
    """H9-H14 per-token classifier + C4 road-number guard (window form).

    ``dict_encode=True`` (default) runs the ~40 keyword/regex tests once per
    DISTINCT token and broadcast-joins the labels back, instead of once per
    token occurrence: natural-language vocabularies are Zipf-bounded, so at
    corpus scale this cuts classifier CPU by the occurrence/vocabulary ratio
    (map-side partial aggregation keeps the distinct cheap — only
    vocabulary-sized data shuffles). The C4 guard depends on the PREVIOUS
    token, so the dictionary carries both guard outcomes (`_lbl_base`,
    `_lbl_guard`) plus the two per-token guard inputs; the window pass then
    only evaluates a lag() and a boolean pick — byte-identical to the direct
    form (asserted by the q15-q17 SQL oracles and the engine parity suite).
    Broadcast-size bound (round-3 ADVICE): the dictionary keeps ONLY tokens
    whose classification is non-trivial (any label ≠ 'O', or a road/guard
    flag) — every other token misses the left join and lands on the existing
    ``coalesce(..., 'O')`` fallback, which is exactly its true label (the
    guard can only *remove* label branches, so base='O' ⟹ guard='O').
    On ID/hash-heavy corpora (near-all-unique vocabulary) random tokens
    match none of the ~40 patterns, so the broadcast stays bounded by the
    *pattern-matching* vocabulary, not the distinct-token count — the
    driver-OOM path the unconditional broadcast used to have. For a corpus
    adversarially full of distinct pattern-matching tokens pass
    ``dict_encode=False`` (direct per-occurrence classification, no
    dictionary at all)."""
    w = Window.partitionBy(*keys).orderBy("seq")
    if not dict_encode:
        return tokens.withColumn(
            "label", classify_token(F.col("token"), F.lag("token").over(w))
        )
    t = F.col("token")
    # Pushdown barrier: without it, Catalyst substitutes the aliases and
    # pushes the keep-predicate below the DISTINCT — the ~40-test classifier
    # chain then runs once per token OCCURRENCE in the filter (the exact
    # cost dictionary encoding exists to avoid; measured 2.2× on q17). The
    # predicate references a nondeterministic column (always-true term), so
    # the projection cannot be substituted through and the classifier is
    # evaluated exactly once per distinct token; the barrier column is
    # dropped and never affects output values.
    dic = (
        tokens.select("token")
        .distinct()
        .select(
            "token",
            classify_token(t, F.lit(None).cast("string")).alias("_lbl_base"),
            classify_token(t, None, road_guard=F.lit(True)).alias("_lbl_guard"),
            _contains_any(t, V.ROAD_KEYWORDS).alias("_is_road"),
            (t.rlike(DIGITS_RE) & (F.length(t) <= 2)).alias("_guardable"),
            F.monotonically_increasing_id().alias("_pushdown_barrier"),
        )
        .filter(
            (F.col("_pushdown_barrier") >= -1)  # always true; blocks pushdown
            & (
                (F.col("_lbl_base") != "O")
                | (F.col("_lbl_guard") != "O")
                | F.col("_is_road")
                | F.col("_guardable")
            )
        )
        .drop("_pushdown_barrier")
    )
    # broadcast keeps the input's (keys)-partitioning intact, so the lag()
    # window below still reuses the upstream exchange; size-bounded by the
    # filter above
    joined = tokens.join(F.broadcast(dic), "token", "left")
    prev_road = F.coalesce(F.lag("_is_road").over(w), F.lit(False))
    label = F.coalesce(
        F.when(prev_road & F.col("_guardable"), F.col("_lbl_guard")).otherwise(
            F.col("_lbl_base")
        ),
        F.lit("O"),  # null-token rows miss the dictionary; classifier says O
    )
    return joined.select(*tokens.columns, label.alias("label"))


def label_name_inference(labeled: DataFrame, keys: Sequence[str]) -> DataFrame:
    """C2: anchors via window mins, conditional winner, quirks preserved."""
    t = F.col("token")
    w_all = Window.partitionBy(*keys)

    step1 = labeled.withColumn(
        "title_seq",
        F.min(F.when(F.col("label") == "document_title", F.col("seq"))).over(w_all),
    )
    step2 = step1.withColumn(
        "rrn_seq",
        F.min(
            F.when((F.col("label") == "rrn") & (F.col("seq") > F.col("title_seq")), F.col("seq"))
        ).over(w_all),
    )

    name_pat = t.rlike(V.NAME_RE)
    veto = _contains_any(t, V.NAME_VETO_KEYWORDS)
    anchors_ok = F.col("title_seq").isNotNull() & F.col("rrn_seq").isNotNull()
    fast = F.col("rrn_seq") == F.col("title_seq") + 2
    fast_elig = (
        (F.col("seq") == F.col("title_seq") + 1)
        & name_pat
        & ~veto
        & ~F.col("label").isin("document_title", "rrn", "issuer")
    )
    scan_elig = (
        (F.col("seq") > F.col("title_seq"))
        & (F.col("seq") < F.col("rrn_seq"))
        & F.col("label").isin("O", "address", "issue_date")
        & name_pat
        & ~veto
        & ~((F.col("label") == "address") & (F.length(t) > 5))
    )
    elig = anchors_ok & F.when(fast, fast_elig).otherwise(scan_elig)

    step3 = step2.withColumn(
        "name_seq", F.min(F.when(elig, F.col("seq"))).over(w_all)
    )
    return step3.withColumn(
        "label",
        F.when(F.col("seq") == F.col("name_seq"), "name").otherwise(F.col("label")),
    ).drop("title_seq", "rrn_seq", "name_seq")


def label_neighbor_relabel(labeled: DataFrame, keys: Sequence[str]) -> DataFrame:
    """C3: token before an issuer token gets relabeled issuer (lead() over
    pre-pass labels — the in-place forward loop is equivalent)."""
    w = Window.partitionBy(*keys).orderBy("seq")
    nxt = F.lead("label").over(w)
    cond = (
        F.col("label").isin("address", "O")
        & (nxt == "issuer")
        & _contains_any(F.col("token"), V.REGION_KEYWORDS)
        & (F.length("token") < 10)
    )
    return labeled.withColumn("label", F.when(cond, "issuer").otherwise(F.col("label")))


def label_tokens_df(tokens: DataFrame, keys: Sequence[str] = ("url", "rule")) -> DataFrame:
    """Full labeling: pass1 → name inference → neighbor relabel."""
    return label_neighbor_relabel(
        label_name_inference(label_pass1(tokens, keys), keys), keys
    )


def merge_runs_df(
    labeled: DataFrame,
    keys: Sequence[str] = ("url", "rule"),
    drop_label: str | None = None,
) -> DataFrame:
    """D5/D6: sessionize-by-label-change, merge runs, conditional date
    triples. Output: keys + (seq, text, label) merged stream.

    ``drop_label`` discards that label's rows AFTER the sessionize window
    (segment numbering still sees the full sequence, and segments are
    label-homogeneous, so only whole segments disappear — surviving runs
    are byte-identical). Callers that only pivot the labeled fields pass
    'O': the filler label is the vast majority of tokens, and dropping it
    here keeps it out of the merge agg + explode + pivot shuffles."""
    klist = [F.col(k) for k in keys]
    w_ord = Window.partitionBy(*keys).orderBy("seq")
    chg = F.when(
        F.lag("label").over(w_ord).isNull() | (F.lag("label").over(w_ord) != F.col("label")), 1
    ).otherwise(0)
    seg = labeled.withColumn("segment", F.sum(chg).over(w_ord))
    if drop_label is not None:
        seg = seg.filter(F.col("label") != drop_label)

    w_seg = Window.partitionBy(*keys, "segment").orderBy("seq")
    pos = F.row_number().over(w_seg)
    chunk = (
        F.when(F.col("label") == "issue_date", F.floor((pos - 1) / 3))
        .when(F.col("label").isin("address", "issuer"), F.lit(0))
        .otherwise(pos)
    )
    seg = seg.withColumn("chunk", chunk.cast("long"))

    agg = seg.groupBy(*klist, "segment", "chunk", "label").agg(
        F.array_sort(F.collect_list(F.struct("seq", "token"))).alias("items")
    )

    items = F.col("items")
    n = F.size(items)
    seq0 = items[0]["seq"]
    t1, t2, t3 = items[0]["token"], items[1]["token"], items[2]["token"]
    triple_ok = (
        (n == 3)
        & t1.rlike(_anchored(V.YEAR_RE))
        & t2.rlike(_anchored(V.MONTH_RE))
        & t3.rlike(_anchored(V.DAY_RE))
    )
    joined = F.array_join(F.transform(items, lambda x: x["token"]), " ")
    out_arr = (
        F.when(
            F.col("label") == "issue_date",
            F.when(
                triple_ok,
                F.array(F.struct(seq0.alias("seq"), F.concat_ws(".", t1, t2, t3).alias("token"))),
            ).otherwise(items),
        )
        .when(
            F.col("label").isin("address", "issuer"),
            F.array(F.struct(seq0.alias("seq"), joined.alias("token"))),
        )
        .otherwise(items)
    )

    exploded = agg.select(*klist, "label", F.explode(out_arr).alias("m"))
    return exploded.select(
        *klist, F.col("m.seq").alias("seq"), F.col("m.token").alias("text"), "label"
    )


def pivot_fields_df(merged: DataFrame, keys: Sequence[str] = ("url", "rule")) -> DataFrame:
    """D4 first-wins pivot via min(struct(seq, text)) per label."""
    aggs = []
    for f in V.OUTPUT_FIELDS:
        cond = F.col("label") == f
        if f == "issue_date":
            cond = cond & F.col("text").contains(".") & (
                F.size(F.split(F.col("text"), r"\.", -1)) == 3
            )
        aggs.append(
            F.min(F.when(cond, F.struct("seq", "text")))["text"].alias(f)
        )
    return merged.groupBy(*keys).agg(*aggs)


def extract_fields_df(
    df: DataFrame, keys: Sequence[str] = ("url", "rule"), text_col: str = "extracted_text"
) -> DataFrame:
    """text column → 6-field record per key group (the whole E3 stage)."""
    tokens = tokenize_df(df, keys, text_col)
    labeled = label_tokens_df(tokens, keys)
    # pivot reads only the six output-field labels; 'O' segments never
    # reach the merge/pivot shuffles
    merged = merge_runs_df(labeled, keys, drop_label="O")
    return pivot_fields_df(merged, keys)


# ---------------------------------------------------------------------------
# Zero-shuffle array implementation (the production path)
# ---------------------------------------------------------------------------
# The window implementation above is the relational showcase (SQL-verified
# by contract q15-q17), but per-token windows over millions of ~100-token
# groups pay shuffle+sort constants per pass. Documents are small; the whole
# E3 stage fits in the row as higher-order array functions — one projection,
# no exchange, embarrassingly parallel at any corpus size. Byte-parity with
# the oracle (and hence with the window form) is enforced by
# tests/test_engine_parity.py.
#
# Every intermediate is staged as a real column so lambda bodies reference
# per-row attributes, never re-evaluate upstream expression trees per
# element.


def fields_from_text(df: DataFrame, text_col: str = "extracted_text") -> DataFrame:
    """Add the 6 field columns computed entirely within the row."""
    out = df.withColumn(
        "_toks", F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
    )
    toks = F.col("_toks")

    # pass 1: classify (prev token via element_at; i is 0-based)
    out = out.withColumn(
        "_lab1",
        F.transform(
            toks,
            lambda t, i: classify_token(
                t, F.when(i >= 1, F.element_at(toks, i))
            ),
        ),
    )
    lab1 = F.col("_lab1")

    # C2 anchors (1-based positions; 0/null = absent)
    out = out.withColumn("_title_pos", F.array_position(lab1, "document_title"))
    tp = F.col("_title_pos")
    out = out.withColumn(
        "_rrn_pos",
        F.get(
            F.filter(
                F.transform(
                    lab1, lambda l, i: F.when((l == "rrn") & (i + 1 > tp), i + 1)
                ),
                lambda x: x.isNotNull(),
            ),
            0,
        ),
    )
    rp = F.col("_rrn_pos")

    name_pat = lambda c: c.rlike(V.NAME_RE)  # noqa: E731
    veto = lambda c: _contains_any(c, V.NAME_VETO_KEYWORDS)  # noqa: E731

    fast_k = tp + 1
    fast_tok = F.element_at(toks, fast_k.cast("int"))
    fast_lab = F.element_at(lab1, fast_k.cast("int"))
    fast_elig = (
        name_pat(fast_tok)
        & ~veto(fast_tok)
        & ~fast_lab.isin("document_title", "rrn", "issuer")
    )
    scan_pos = F.get(
        F.filter(
            F.transform(
                lab1,
                lambda l, i: F.when(
                    (i + 1 > tp)
                    & (i + 1 < rp)
                    & l.isin("O", "address", "issue_date")
                    & name_pat(F.element_at(toks, (i + 1).cast("int")))
                    & ~veto(F.element_at(toks, (i + 1).cast("int")))
                    & ~((l == "address") & (F.length(F.element_at(toks, (i + 1).cast("int"))) > 5)),
                    i + 1,
                ),
            ),
            lambda x: x.isNotNull(),
        ),
        0,
    )
    out = out.withColumn(
        "_name_pos",
        F.when(
            (tp > 0) & rp.isNotNull(),
            F.when(rp == tp + 2, F.when(fast_elig, fast_k)).otherwise(scan_pos),
        ),
    )
    np_ = F.col("_name_pos")
    out = out.withColumn(
        "_lab2",
        F.transform(lab1, lambda l, i: F.when(i + 1 == np_, "name").otherwise(l)),
    )
    lab2 = F.col("_lab2")

    # C3 neighbor relabel: next label via get (0-based i+1 = next element)
    out = out.withColumn(
        "_lab3",
        F.transform(
            lab2,
            lambda l, i: F.when(
                l.isin("address", "O")
                & (F.get(lab2, (i + 1).cast("int")) == "issuer")
                & _contains_any(F.element_at(toks, (i + 1).cast("int")), V.REGION_KEYWORDS)
                & (F.length(F.element_at(toks, (i + 1).cast("int"))) < 10),
                "issuer",
            ).otherwise(l),
        ),
    )
    lab = F.col("_lab3")

    def first_pos(label: str) -> Column:
        return F.array_position(lab, label)

    def run_field(label: str, col_name: str) -> Column:
        start = first_pos(label)
        end = F.coalesce(
            F.get(
                F.filter(
                    F.transform(
                        lab, lambda l, i: F.when((i + 1 > start) & (l != label), i + 1)
                    ),
                    lambda x: x.isNotNull(),
                ),
                0,
            ),
            F.size(lab) + 1,
        )
        return F.when(
            start > 0,
            F.array_join(F.slice(toks, start.cast("int"), (end - start).cast("int")), " "),
        ).alias(col_name)

    def simple_field(label: str) -> Column:
        p = first_pos(label)
        return F.when(p > 0, F.element_at(toks, p.cast("int"))).alias(label)

    # D6 date chunks: per issue_date run, 3-at-a-time; first valid triple wins
    out = out.withColumn(
        "_date_starts",
        F.filter(
            F.transform(
                lab,
                lambda l, i: F.when(
                    (l == "issue_date")
                    & (F.coalesce(F.get(lab, (i - 1).cast("int")), F.lit("")) != "issue_date"),
                    i + 1,
                ),
            ),
            lambda x: x.isNotNull(),
        ),
    )
    starts = F.col("_date_starts")
    out = out.withColumn(
        "_date_runs",
        F.transform(
            starts,
            lambda s: F.struct(
                s.alias("s"),
                (
                    F.coalesce(
                        F.get(
                            F.filter(
                                F.transform(
                                    lab,
                                    lambda l, i: F.when(
                                        (i + 1 > s) & (l != "issue_date"), i + 1
                                    ),
                                ),
                                lambda x: x.isNotNull(),
                            ),
                            0,
                        ),
                        F.size(lab) + 1,
                    )
                    - s
                ).alias("len"),
            ),
        ),
    )
    runs = F.col("_date_runs")
    out = out.withColumn(
        "_date_chunks",
        F.flatten(
            F.transform(
                runs,
                lambda r: F.when(
                    r["len"] >= 3,
                    F.transform(
                        F.sequence(F.lit(0), (F.floor(r["len"] / 3) - 1).cast("long")),
                        lambda k: (r["s"] + 3 * k).cast("long"),
                    ),
                ).otherwise(F.array().cast("array<bigint>")),
            )
        ),
    )
    chunks = F.col("_date_chunks")

    def tok_at(p: Column) -> Column:
        return F.element_at(toks, p.cast("int"))

    valid_chunks = F.filter(
        chunks,
        lambda p: tok_at(p).rlike(_anchored(V.YEAR_RE))
        & tok_at(p + 1).rlike(_anchored(V.MONTH_RE))
        & tok_at(p + 2).rlike(_anchored(V.DAY_RE)),
    )
    out = out.withColumn("_date_pos", F.get(valid_chunks, 0))
    dp = F.col("_date_pos")
    issue_date = F.when(
        dp.isNotNull(), F.concat_ws(".", tok_at(dp), tok_at(dp + 1), tok_at(dp + 2))
    ).alias("issue_date")

    out = out.select(
        *df.columns,
        simple_field("document_title"),
        simple_field("name"),
        run_field("address", "address"),
        simple_field("rrn"),
        issue_date,
        run_field("issuer", "issuer"),
    )
    return out


def extract_fields_from_tokens_kernel(
    tokens: DataFrame,
    keys: Sequence[str] = ("doc_id",),
    order_cols: Sequence[str] = ("seq",),
    token_col: str = "token",
) -> DataFrame:
    """(keys, order, token) rows → 6-field record per key group via the
    oracle labeling function in ONE Arrow stage (guide §4.2 posture: Spark
    does the distribution/shuffle, the per-document logic runs as native
    CPython over whole batches — the same pure function the byte-parity
    suite pins).

    Plan shape: one keys-keyed groupBy (collect_list + array_sort — tokens
    shuffle once, partially aggregated map-side) then a group-sized Arrow
    stage. Replaces the ~7 window passes of the relational form
    (label_pass1 → name inference → neighbor relabel → sessionize → merge →
    pivot) with a single exchange; byte-identical by construction because
    oracle/labeling.py is the spec both forms implement (asserted by the
    q17 DuckDB oracle and tests/test_r6_optimizations.py)."""
    from collections.abc import Iterator

    import pandas as pd

    from pyspark.sql.types import StringType, StructField, StructType

    from py_image_toolkit_spark.oracle.labeling import extract_fields

    key_fields = [tokens.schema[k] for k in keys]
    out_schema = StructType(
        [StructField(f.name, f.dataType, f.nullable) for f in key_fields]
        + [StructField(f, StringType(), True) for f in V.OUTPUT_FIELDS]
    )

    ord_struct = F.struct(*[F.col(c) for c in order_cols], F.col(token_col))
    grouped = tokens.groupBy(*keys).agg(
        F.transform(
            F.array_sort(F.collect_list(ord_struct)), lambda s: s[token_col]
        ).alias("_toks")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = [extract_fields(list(toks)) for toks in pdf["_toks"]]
            out = {k: pdf[k] for k in keys}
            for f in V.OUTPUT_FIELDS:
                out[f] = [r[f] for r in recs]
            yield pd.DataFrame(out)

    return grouped.mapInPandas(run, out_schema)


# ---------------------------------------------------------------------------
# Arrow-kernel implementation (production default)
# ---------------------------------------------------------------------------
# Measured on this host (32 cores, 10k docs ≈ 2.1M tokens):
#   relational window form : ~215 s   (shuffle+sort per pass; correctness
#                                      showcase, SQL-verified by q15-q17)
#   in-row array lambdas   : ~110 s   (zero shuffle, but Catalyst evaluates
#                                      higher-order-function lambdas
#                                      interpreted — ~1 µs/node tree walks)
#   Arrow batch kernel     : ~0.4 s   (CPython regex engine is C; the same
#                                      pure function as the oracle spec)
# The kernel is the pragmatic Arrow-batched stage the parse already is
# (SURVEY.md §2 J2/J3 posture): per-partition amortized, no per-row Python
# *interpretation of relational logic* — the relational expression of E3
# exists above and is cross-validated against DuckDB by the driver contract.


def fields_from_text_kernel(df: DataFrame, text_col: str = "extracted_text") -> DataFrame:
    """Add the 6 field columns via an Arrow-batched kernel applying the
    oracle's pure labeling function (byte-identical by construction)."""
    from collections.abc import Iterator

    import pandas as pd

    from pyspark.sql.types import StringType, StructField, StructType

    from py_image_toolkit_spark.oracle.labeling import extract_fields

    out_schema = StructType(
        list(df.schema.fields)
        + [StructField(f, StringType(), True) for f in V.OUTPUT_FIELDS]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = [
                extract_fields(t.split()) if isinstance(t, str) else
                {f: None for f in V.OUTPUT_FIELDS}
                for t in pdf[text_col]
            ]
            for f in V.OUTPUT_FIELDS:
                pdf[f] = [r[f] for r in recs]
            yield pdf

    return df.mapInPandas(run, out_schema)
