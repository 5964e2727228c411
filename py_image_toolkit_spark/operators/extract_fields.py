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


def _contains_any(c: Column, kws: Sequence[str]) -> Column:
    out = c.contains(kws[0])
    for k in kws[1:]:
        out = out | c.contains(k)
    return out


def _endswith_any(c: Column, sfxs: Sequence[str]) -> Column:
    out = c.endswith(sfxs[0])
    for s in sfxs[1:]:
        out = out | c.endswith(s)
    return out


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


def label_pass1(tokens: DataFrame, keys: Sequence[str]) -> DataFrame:
    """H9-H14 per-token classifier + C4 road-number guard."""
    t = F.col("token")
    w = Window.partitionBy(*keys).orderBy("seq")

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
    prev = F.lag(t).over(w)
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

    label = (
        F.when(is_title, "document_title")
        .when(is_rrn, "rrn")
        .when(is_issuer, "issuer")
        .when(is_date_comp & ~F.coalesce(road_guard, F.lit(False)), "issue_date")
        .when(is_addressish & ~(short_digit & ~clear_addr), "address")
        .otherwise("O")
    )
    return tokens.withColumn("label", label)


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


def merge_runs_df(labeled: DataFrame, keys: Sequence[str] = ("url", "rule")) -> DataFrame:
    """D5/D6: sessionize-by-label-change, merge runs, conditional date
    triples. Output: keys + (seq, text, label) merged stream."""
    klist = [F.col(k) for k in keys]
    w_ord = Window.partitionBy(*keys).orderBy("seq")
    chg = F.when(
        F.lag("label").over(w_ord).isNull() | (F.lag("label").over(w_ord) != F.col("label")), 1
    ).otherwise(0)
    seg = labeled.withColumn("segment", F.sum(chg).over(w_ord))

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
    merged = merge_runs_df(labeled, keys)
    return pivot_fields_df(merged, keys)
