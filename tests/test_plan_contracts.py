"""Plan-shape contracts for the scale-critical operators.

The 100 TB posture claims (broadcast the small side, keyed equijoins only,
one text shuffle in the extraction pipeline) are asserted here against the
EXECUTED physical plan, so a regression that silently flips a join to a
cartesian product or adds a wide shuffle fails CI instead of surviving as
stale documentation."""

import pytest

from pyspark.sql import functions as F


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def emb(spark):
    import numpy as np

    rng = np.random.RandomState(1)
    rows = [(i, [float(x) for x in rng.randn(16)]) for i in range(60)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_ivf_flat_plan_broadcasts_centroids_no_cartesian(emb):
    from py_image_toolkit_spark.operators.similarity import ivf_flat_topk

    plan = plan_of(
        ivf_flat_topk(
            emb.filter("vec_id >= 5"),
            emb.filter("vec_id < 5"),
            emb.filter("vec_id % 10 = 0"),
            k=5,
            nprobe=2,
        )
    )
    assert "CartesianProduct" not in plan
    # centroid assignment AND probe-cell search both broadcast a small side
    assert plan.count("BroadcastExchange") >= 2


def test_lsh_band_pairs_is_keyed_equijoin(spark):
    from py_image_toolkit_spark.operators.dedup import (
        lsh_band_pairs,
        minhash_signatures,
        shingle_df,
    )

    docs = spark.createDataFrame(
        [(i, f"tok{i} " * 3 + "common words shared across docs here") for i in range(20)],
        "doc_id long, text string",
    )
    sigs = minhash_signatures(shingle_df(docs, k=3))
    plan = plan_of(lsh_band_pairs(sigs))
    # the bucket self-join must be an equijoin on (band, bucket) — the whole
    # point of banding is to NEVER run the quadratic comparison
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_jaccard_verify_semi_join_reduces(spark):
    from py_image_toolkit_spark.operators.dedup import (
        jaccard_pairs,
        lsh_band_pairs,
        minhash_signatures,
        shingle_df,
    )

    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog variant " + str(i % 3))
         for i in range(12)],
        "doc_id long, text string",
    )
    sh = shingle_df(docs, k=3)
    cands = lsh_band_pairs(minhash_signatures(sh))
    plan = plan_of(jaccard_pairs(sh, candidates=cands))
    assert "LeftSemi" in plan  # shingles shrink to candidate ids FIRST
    assert "CartesianProduct" not in plan


def test_doc_pipeline_single_exchange_single_python_stage(spark, tmp_path):
    from py_image_toolkit_spark.fixtures import pages_df
    from py_image_toolkit_spark.plans.pipeline import extract

    # materialize the fixture so the pipeline input is a parquet SCAN (the
    # production shape) — pages_df itself is a mapInPandas generator and
    # would double-count the Python stages
    src = str(tmp_path / "pages")
    pages_df(spark, 8).write.parquet(src)
    plan = plan_of(extract(spark.read.parquet(src)))
    # the production plan: scan → ONE url repartition → ONE Arrow stage →
    # (no wide shuffle of document text anywhere)
    assert plan.count("Exchange") <= 1 + plan.count("AQEShuffleRead")
    assert plan.count("MapInPandas") + plan.count("ArrowEvalPython") == 1
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_canonical_dedup_single_aggregation_shuffle(spark):
    from py_image_toolkit_spark.operators.web import canonical_dedup

    df = spark.createDataFrame(
        [(i, f"https://h{i % 3}.io/p/{i}") for i in range(10)],
        "doc_id long, url string",
    )
    plan = plan_of(canonical_dedup(df))
    # partial + final hash aggregate around exactly one exchange
    assert plan.count("HashAggregate") >= 2
    assert plan.count("Exchange") <= 1 + plan.count("AQEShuffleRead")


def test_kmeans_trainer_broadcasts_centroids(emb):
    from py_image_toolkit_spark.operators.similarity import train_kmeans_centroids

    plan = plan_of(train_kmeans_centroids(emb, k=4, iters=1))
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan  # corpus × centroids via broadcast


def test_quantized_ivf_composition_plan(emb):
    """q47's composition (quantize → trained centroids → IVF search) must
    keep the scale shape: the probe↔corpus match is a centroid_id equijoin,
    never a nested-loop over the corpus."""
    from py_image_toolkit_spark.operators.similarity import (
        ivf_flat_topk,
        quantize_embeddings_int8,
        train_kmeans_centroids,
    )

    qd = quantize_embeddings_int8(emb).select(
        "vec_id",
        F.transform(F.col("qvec"), lambda x: x.cast("double")).alias("embedding"),
    )
    cents = train_kmeans_centroids(emb.filter("vec_id >= 5"), k=4, iters=1)
    plan = plan_of(
        ivf_flat_topk(
            qd.filter("vec_id >= 5"), qd.filter("vec_id < 5"), cents, k=5, nprobe=2
        )
    )
    assert "CartesianProduct" not in plan
    # the probe↔corpus match is a HASH equijoin on centroid_id — the only
    # nested-loop joins allowed are the intentional corpus × broadcast(tiny
    # centroid table) assignment scans, never probe × corpus
    assert "BroadcastHashJoin [centroid_id" in plan
    assert plan.count("BroadcastExchange") >= 2


def test_bucketed_join_and_agg_are_exchange_free(spark, tmp_path):
    """J5 co-location: two tables bucketed on the same key join WITHOUT any
    Exchange (the shuffle was paid once at write time), and a groupBy on
    the bucket key is likewise exchange-free."""
    from py_image_toolkit_spark.sources.tables import write_bucketed

    a = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("v")
    )
    b = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 5).alias("w")
    )
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        write_bucketed(a, "bkt_a", str(tmp_path / "a"), "doc_id", 4)
        write_bucketed(b, "bkt_b", str(tmp_path / "b"), "doc_id", 4)
        ta, tb = spark.table("bkt_a"), spark.table("bkt_b")

        # tiny test tables would auto-broadcast (which disables bucketed
        # reads); force the shuffle-join planner path — the production case
        # this contract protects is two tables both too big to broadcast
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = ta.join(tb, "doc_id")
        plan = plan_of(joined)
        assert "Exchange hashpartitioning" not in plan  # co-located: no shuffle
        assert "Bucketed: true" in plan
        assert joined.count() == 1000

        agg = ta.groupBy("doc_id").agg(F.sum("v").alias("s"))
        assert "Exchange hashpartitioning" not in plan_of(agg)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_vocab_topk_uses_per_partition_topk_not_global_sort(spark):
    from py_image_toolkit_spark.operators.corpus import vocab_topk

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta " * 3) for i in range(30)],
        "doc_id long, text string",
    )
    plan = plan_of(vocab_topk(docs, k=10))
    # ORDER BY + LIMIT over the vocabulary must compile to per-partition
    # top-k with a driver merge, never a full sort shuffle of all tokens
    assert "TakeOrderedAndProject" in plan


def test_pagerank_rounds_are_keyed_equijoins(spark):
    from py_image_toolkit_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(f"h{i}", f"h{(i * 3 + 1) % 17}") for i in range(40)],
        "src string, dst string",
    )
    plan = plan_of(pagerank(edges, iterations=2))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_url_filter_adds_no_shuffle(spark):
    from py_image_toolkit_spark.operators.web import url_filter

    df = spark.createDataFrame(
        [(i, f"https://h{i}.com/p") for i in range(10)], "doc_id long, url string"
    )
    plan = plan_of(url_filter(df, blocked_hosts=("h1.com",), blocked_url_patterns=("x$",)))
    # blocklists are plan literals: the verdict stage is pure codegen
    assert "Exchange" not in plan


def test_hashed_linear_score_has_single_aggregation_no_join_on_tokens(spark):
    from py_image_toolkit_spark.operators.text_stats import hashed_linear_score

    df = spark.createDataFrame(
        [(i, "some words here") for i in range(10)], "doc_id long, text string"
    )
    plan = plan_of(hashed_linear_score(df, weights=[1] * 256))
    # the weight lookup must be an array-literal element_at, never a join
    # against a weights table — and explode_outer keeps empty docs inside
    # the single aggregation, so the whole plan is join-free
    assert "Join" not in plan
    assert plan.count("HashAggregate") <= 2  # partial + final of ONE groupBy


def test_substring_span_dedup_plan_is_keyed_only(spark):
    from py_image_toolkit_spark.operators.dedup import substring_span_dedup

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta eta theta iota kappa") for i in range(12)],
        "doc_id long, text string",
    )
    plan = plan_of(substring_span_dedup(docs, k=8))
    # gram groupBy + gram semi-join + (doc,pos) equijoin + doc window/agg —
    # never a quadratic comparison path
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_winnow_neardup_plan_is_keyed_only(spark):
    from py_image_toolkit_spark.operators.dedup import winnow_neardup_pairs

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(i, i + 15))) for i in range(10)],
        "doc_id long, text string",
    )
    plan = plan_of(winnow_neardup_pairs(docs))
    # the pair producer must be an fp_hash equijoin, never all-pairs
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bm25_broadcasts_query_side(spark):
    from py_image_toolkit_spark.operators.corpus import bm25_topk

    docs = spark.createDataFrame(
        [(i, f"term{i % 5} filler common words") for i in range(30)],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [(1, "term1 common"), (2, "term2")], "query_id long, qtext string"
    )
    plan = plan_of(bm25_topk(docs, queries, k=3))
    assert "CartesianProduct" not in plan
    # the query token set rides a broadcast onto the corpus tf table (the
    # corpus never re-shuffles per query) and the scalar row broadcasts too
    assert plan.count("BroadcastExchange") >= 2


def test_release_gate_no_quadratic_paths(spark):
    from py_image_toolkit_spark.operators.corpus import release_gate
    from py_image_toolkit_spark.operators.text_stats import char_lm_model

    docs = spark.createDataFrame(
        [(i, "the cat sat on the mat again and again today", "en") for i in range(20)],
        "doc_id long, text string, lang string",
    )
    model = char_lm_model(docs)
    plan = plan_of(release_gate(docs, lm_model=model))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
