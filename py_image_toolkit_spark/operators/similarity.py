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


def _dot(x, y) -> F.Column:
    """The exact sequential-fold dot product dot_cosine uses (same float
    op order → identical doubles)."""
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k: (probe_id, rank, corpus_id, cos_micro).

    r6: each side's norm is computed once per VECTOR before the join (the
    interpreted array folds are the CPU cost here — guide §1.2 "don't
    compute things twice"); the per-pair work is one dot product instead
    of three. sqrt(dot(v, v)) is the identical float expression either
    way, so cos_micro is bit-identical."""
    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("probe_vec"),
        F.sqrt(_dot(F.col(vec_col), F.col(vec_col))).alias("_pn"),
    )
    c = corpus.select(
        F.col(id_col).alias("corpus_id"),
        F.col(vec_col).alias("corpus_vec"),
        F.sqrt(_dot(F.col(vec_col), F.col(vec_col))).alias("_cn"),
    )
    cos = _dot(F.col("probe_vec"), F.col("corpus_vec")) / (
        F.col("_pn") * F.col("_cn")
    )
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


def ivf_flat_topk(
    corpus: DataFrame,
    probes: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-flat ANN: assign every corpus vector to its nearest coarse
    centroid (its "cell"), search only the probe's ``nprobe`` nearest cells.

    The classic inverted-file index recast relationally:
    - **assignment** is a broadcast join (centroids are small by
      construction) followed by a per-vector argmax — expressed as
      ``max_by`` under ``groupBy(id)`` so Spark's map-side partial
      aggregation reduces each vector to ONE shuffled row; the corpus ×
      K dot products never leave the map side.
    - **search** joins the probe's cells to the corpus cells on
      centroid_id — a keyed equijoin, never the O(P×N) cross join; each
      corpus vector lives in exactly one cell, so multi-probe needs no
      dedup.
    - recall/cost knob: ``nprobe`` (cells probed per query), as in any IVF
      index; centroid count scales with corpus size (√N rule of thumb).

    ``centroids`` here are taken deterministically from the corpus (no
    k-means iteration) so the result is exactly reproducible and
    SQL-expressible for the oracle; swap in trained centroids at will —
    the plan shape is identical."""
    cents = centroids.select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("centroid_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("corpus_id"), F.col(vec_col).alias("corpus_vec")
    )
    p = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("probe_vec")
    )

    def _cell_cos(vec):
        return (
            F.floor(dot_cosine(vec, F.col("centroid_vec")) * 1_000_000 + F.lit(0.5))
            .cast("long")
            .alias("cell_cos")
        )

    # ties broken toward the LOWEST centroid_id (max of (cos, -id))
    ord_ = F.struct(F.col("cell_cos"), (-F.col("centroid_id")).alias("nid"))
    corpus_cells = (
        c.join(F.broadcast(cents))
        .select("corpus_id", "corpus_vec", "centroid_id", _cell_cos(F.col("corpus_vec")))
        .groupBy("corpus_id")
        .agg(
            F.max_by("centroid_id", ord_).alias("centroid_id"),
            F.any_value("corpus_vec").alias("corpus_vec"),  # constant per group
        )
    )
    w_cells = Window.partitionBy("probe_id").orderBy(
        F.desc("cell_cos"), "centroid_id"
    )
    probe_cells = (
        p.join(F.broadcast(cents))
        .select("probe_id", "probe_vec", "centroid_id", _cell_cos(F.col("probe_vec")))
        .withColumn("cell_rank", F.row_number().over(w_cells))
        .filter(F.col("cell_rank") <= nprobe)
        .select("probe_id", "probe_vec", "centroid_id")
    )

    cos = dot_cosine(F.col("probe_vec"), F.col("corpus_vec"))
    scored = (
        F.broadcast(probe_cells)
        .join(corpus_cells, "centroid_id")
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


def train_kmeans_centroids(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Seeded Lloyd's k-means over cosine similarity — trained IVF coarse
    centroids as pure DataFrame code (no MLlib, no driver-side loops over
    data; only the centroid table itself is ever broadcast/collected).

    Per iteration (the classic broadcast-assign → groupBy-update shape):
    - **assign**: corpus × broadcast(centroids) → per-vector argmax cosine
      via ``max_by`` under ``groupBy(id)`` — map-side partial aggregation
      reduces each vector to ONE shuffled row, the corpus × k dot products
      never leave the map side (same plan shape as ivf_flat_topk's cell
      assignment).
    - **update**: posexplode members → groupBy (centroid, coordinate) mean
      → re-assemble ordered arrays. Two keyed shuffles, both on small keys.
      Empty clusters keep their previous centroid.

    Cross-engine determinism (the q35 oracle hash-gate): vectors are
    quantized to int64 micro-units up front, so every dot product is a sum
    of exactly-representable integers (64 dims × ~1e12 ≪ 2^53) — EXACT, no
    float rounding, no summation-order sensitivity; centroid updates use
    FLOOR(double-division of exact ints), identical IEEE ops in Spark and
    DuckDB. Cosine is scale-invariant in the centroid, so the mean is not
    re-normalized (spherical k-means' normalization step changes no
    assignment). Init = the k lowest-id corpus vectors; ``iters`` is fixed,
    so the whole computation is reproducible and SQL-expressible.

    Returns (centroid_id int, ``vec_col`` array<double>) with coordinates
    in micro-units (scale-irrelevant to every cosine consumer)."""
    micro = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * 1_000_000 + F.lit(0.5)).cast("long"),
    )
    base = corpus.select(F.col(id_col).alias("_vid"), micro.alias("_mv"))
    w_init = Window.orderBy("_vid")
    cents = (
        base.orderBy("_vid")
        .limit(k)
        .select(
            (F.row_number().over(w_init) - 1).alias("centroid_id"),
            F.col("_mv").alias("_cv"),
        )
    )
    as_double = lambda c: F.transform(c, lambda m: m.cast("double"))  # noqa: E731
    for _ in range(iters):
        cos = dot_cosine(as_double(F.col("_mv")), as_double(F.col("_cv")))
        ord_ = F.struct(F.col("_cos"), (-F.col("centroid_id")).alias("nid"))
        assigned = (
            base.join(F.broadcast(cents))
            .select("_vid", "_mv", "centroid_id", cos.alias("_cos"))
            .groupBy("_vid")
            .agg(
                F.max_by("centroid_id", ord_).alias("centroid_id"),
                F.any_value("_mv").alias("_mv"),
            )
        )
        upd = (
            assigned.select("centroid_id", F.posexplode("_mv").alias("pos", "val"))
            .groupBy("centroid_id", "pos")
            .agg(
                F.floor(F.sum("val").cast("double") / F.count(F.lit(1)))
                .cast("long")
                .alias("nv")
            )
            .groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "nv"))),
                    lambda s: s["nv"],
                ).alias("_nv")
            )
        )
        cents = (
            cents.join(upd, "centroid_id", "left")
            .select(
                "centroid_id",
                F.coalesce(F.col("_nv"), F.col("_cv")).alias("_cv"),
            )
        )
    return cents.select(
        F.col("centroid_id").alias(id_col), as_double(F.col("_cv")).alias(vec_col)
    )


def quantize_embeddings_int8(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-vector symmetric int8 quantization — the storage/IO half of a
    100 TB ANN index (4× smaller than float32, 8× smaller than float64;
    dot products stay int32-safe at any realistic dimension).

    scale = max(|v|)/127; q_i = floor(v_i/scale + 0.5) ∈ [-127, 127]
    (round-half-up, IEEE-deterministic, identical in Spark and DuckDB —
    q40 hash-gates it). Zero vectors quantize to all-zero with scale 0.
    Reconstruction error is bounded by scale/2 per coordinate (property-
    tested). Columns out: (id, scale_nano int64, qvec array<int>) —
    scale_nano stores the scale at 1e-9 resolution (7 significant digits
    for unit-norm-ish embeddings; vectors with max|v| < ~1e-7 need a finer
    rendering before dequantization from the stored column)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    mx = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = mx / F.lit(127.0)
    qvec = F.when(
        mx > 0,
        F.transform(v, lambda x: F.floor(x / scale + F.lit(0.5)).cast("int")),
    ).otherwise(F.transform(v, lambda x: F.lit(0)))
    return emb.select(
        F.col(id_col),
        F.floor(scale * 1_000_000_000 + F.lit(0.5)).cast("long").alias("scale_nano"),
        qvec.alias("qvec"),
    )


def cosine_topk_lsh(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: tuple[int, ...] = (0, 8, 16, 24),
) -> DataFrame:
    """Bucketed ANN: candidates restricted to the probe's sign-LSH bucket.
    r6: per-vector norms precomputed before the join (see cosine_topk)."""
    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("probe_vec"),
        sign_lsh_bucket(F.col(vec_col), dims).alias("bucket"),
        F.sqrt(_dot(F.col(vec_col), F.col(vec_col))).alias("_pn"),
    )
    c = corpus.select(
        F.col(id_col).alias("corpus_id"),
        F.col(vec_col).alias("corpus_vec"),
        sign_lsh_bucket(F.col(vec_col), dims).alias("bucket"),
        F.sqrt(_dot(F.col(vec_col), F.col(vec_col))).alias("_cn"),
    )
    cos = _dot(F.col("probe_vec"), F.col("corpus_vec")) / (
        F.col("_pn") * F.col("_cn")
    )
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


def pool_embeddings(
    chunks: DataFrame,
    group_col: str = "doc_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Mean-pool chunk/passage vectors into one vector per group — how a
    long document gets its embedding from its chunk embeddings (the
    aggregation side of chunk_documents). Exact int64 micro-unit
    arithmetic: elements floor to micro ints up front, the per-group sum
    is an integer zip_with fold (commutative — immune to aggregation
    order), and the mean is FLOOR of an IEEE double division of exact
    ints, the same cross-engine-identical recipe as
    train_kmeans_centroids' update step.

    Output: (group, dim, mean_micro) EXPLODED rows — the relational shape
    any per-dimension consumer wants, and driver-hashable.

    Scale posture (100 TB): vectors stay PACKED through the one group
    shuffle (collect_list of bounded chunks-per-doc, then an in-row
    fold) — a posexplode-first plan would multiply shuffle rows by the
    dimensionality; the explode here happens after the per-group
    reduction, on one row per group.
    """
    micro = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * 1_000_000 + F.lit(0.5)).cast("long"),
    )
    g = chunks.select(F.col(group_col), micro.alias("_mv"))
    agg = g.groupBy(group_col).agg(
        F.collect_list("_mv").alias("_lst"),
        F.count(F.lit(1)).cast("long").alias("_n"),
    )
    zeros = F.transform(F.element_at(F.col("_lst"), 1), lambda _: F.lit(0).cast("long"))
    summed = F.aggregate(
        F.col("_lst"), zeros, lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b)
    )
    mean = F.transform(
        summed,
        lambda s: F.floor(s.cast("double") / F.col("_n")).cast("long"),
    )
    return agg.select(
        F.col(group_col), F.posexplode(mean).alias("dim", "mean_micro")
    ).select(group_col, F.col("dim").cast("long").alias("dim"), "mean_micro")


def rrf_fuse(
    rankings: list[DataFrame],
    probe_col: str = "probe_id",
    item_col: str = "corpus_id",
    rank_col: str = "rank",
    k: int = 10,
    c: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Büttcher) over any number
    of per-probe rankings — the standard way to ensemble retrieval
    systems (exact + LSH ANN, BM25 + dense, …) without calibrating their
    incomparable scores: only RANKS matter,

        rrf_micro(item) = Σ_systems 1e6 DIV (c + rank_in_system)

    in exact integer micro-units (bit-reproducible; c=60 per the paper).
    Items missing from a system simply contribute nothing — no
    imputation. Output: probe, rank (fused), item, rrf_micro, n_systems.

    Scale posture: inputs are already top-k-sized (k·probes rows each);
    one union + one (probe, item) groupBy + one per-probe window — the
    corpora behind the rankings are never touched again.
    """
    u = None
    for r in rankings:
        s = r.select(F.col(probe_col), F.col(item_col), F.col(rank_col))
        u = s if u is None else u.unionByName(s)
    fused = u.groupBy(probe_col, item_col).agg(
        F.sum(F.expr(f"CAST(1000000 AS BIGINT) DIV ({c} + {rank_col})"))
        .cast("long")
        .alias("rrf_micro"),
        F.count(F.lit(1)).cast("long").alias("n_systems"),
    )
    w = Window.partitionBy(probe_col).orderBy(
        F.col("rrf_micro").desc(), F.col(item_col)
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(probe_col, "rank", item_col, "rrf_micro", "n_systems")
    )
