"""Approximate-nearest-neighbor search over an embedding column.

- cosine_topk       : brute-force exact baseline (probe × corpus join,
                      sequential-fold dot products, row_number top-k)
- sign_lsh_bucket   : deterministic sign-LSH bucket code (sign bits of fixed
                      coordinate hyperplanes) — the scale path: candidates
                      come from the probe's bucket only, turning the O(P×N)
                      cross join into a bucket-equijoin. Recall is traded for
                      a ~2^bits candidate reduction; raise bits with corpus
                      size, or probe adjacent buckets (hamming-1) for higher
                      recall.

At 100 TB the corpus side is bucketed+broadcast-probed: probes are small →
broadcast them, never shuffle the corpus; the bucket join prunes candidates
before any dot product is computed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from py_image_toolkit_spark.operators.dedup import dot_cosine


def cosine_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k: (probe_id, rank, corpus_id, cos_micro)."""
    p = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("probe_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("corpus_id"), F.col(vec_col).alias("corpus_vec")
    )
    cos = dot_cosine(F.col("probe_vec"), F.col("corpus_vec"))
    scored = (
        F.broadcast(p)
        .join(c)
        .select(
            "probe_id",
            "corpus_id",
            F.floor(cos * 1_000_000 + F.lit(0.5)).cast("long").alias("cos_micro"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_micro"), "corpus_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "rank", "corpus_id", "cos_micro")
    )


def sign_lsh_bucket(vec_col, dims: tuple[int, ...] = (0, 8, 16, 24)) -> F.Column:
    """Deterministic sign-LSH bucket: bit i = (vec[dims[i]] >= 0)."""
    code = F.lit(0)
    for i, d in enumerate(dims):
        code = code + F.when(F.element_at(vec_col, d + 1) >= 0, 2 ** i).otherwise(0)
    return code.cast("int")


def cosine_topk_lsh(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: tuple[int, ...] = (0, 8, 16, 24),
) -> DataFrame:
    """Bucketed ANN: candidates restricted to the probe's sign-LSH bucket."""
    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("probe_vec"),
        sign_lsh_bucket(F.col(vec_col), dims).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("corpus_id"),
        F.col(vec_col).alias("corpus_vec"),
        sign_lsh_bucket(F.col(vec_col), dims).alias("bucket"),
    )
    cos = dot_cosine(F.col("probe_vec"), F.col("corpus_vec"))
    scored = (
        F.broadcast(p)
        .join(c, "bucket")
        .select(
            "probe_id",
            "corpus_id",
            F.floor(cos * 1_000_000 + F.lit(0.5)).cast("long").alias("cos_micro"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_micro"), "corpus_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "rank", "corpus_id", "cos_micro")
    )
