"""Corpus-level assembly/statistics operators for training-data curation.

- vocab_topk        : corpus-wide token vocabulary with occurrence and
                      document frequencies, deterministic top-k
- tfidf_topk        : per-document top-k salient tokens by an integer-exact
                      TF-IDF proxy (no float logs — bit-reproducible)
- stratified_sample : EXACT per-stratum quotas in a reproducible hash order,
                      with a two-phase rank so no stratum funnels through a
                      single partition

All pure Column code (whole-stage codegen, no Python on the hot path).
Reference analog: py-image-toolkit has no corpus layer; these are the
standard curation stages a Common-Crawl-scale text pipeline adds on top of
extraction (SURVEY.md §2 "LLM-pipeline" family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from py_image_toolkit_spark.operators.dedup import _md5
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
