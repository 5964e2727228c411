"""cluster_pairs / apply_dedup — pair-graph connected components and the
corpus filter (the dedup family's last mile)."""

import random

import pytest
from pyspark.sql import functions as F

from py_image_toolkit_spark.operators.cluster import apply_dedup, cluster_pairs


def _pairs(spark, edges):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "id_a long, id_b long"
    )


def _labels(df):
    return {r["doc_id"]: r["component_id"] for r in df.collect()}


def _union_find(edges):
    """Driver-side reference implementation (test oracle only)."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical = min id per component
    comps = {}
    for x in list(parent):
        comps.setdefault(find(x), []).append(x)
    out = {}
    for root, members in comps.items():
        m = min(members)
        for x in members:
            out[x] = m
    return out


def test_chain_collapses_to_one_component(spark):
    """A length-9 path (worst diameter per node count) must collapse to a
    single min-rooted component — the convergence property the verdict
    demanded (chains of length > 2 collapse to one component)."""
    edges = [(i, i + 1) for i in range(1, 10)]
    got = _labels(cluster_pairs(_pairs(spark, edges)))
    assert got == {i: 1 for i in range(1, 11)}


def test_components_match_union_find_on_random_graph(spark):
    rng = random.Random(42)
    nodes = list(range(100))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(80)]
    edges = [(a, b) for a, b in edges if a != b]
    got = _labels(cluster_pairs(_pairs(spark, edges)))
    assert got == _union_find(edges)


def test_output_is_a_partition_of_pair_nodes(spark):
    edges = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)]
    out = cluster_pairs(_pairs(spark, edges))
    rows = out.collect()
    ids = [r["doc_id"] for r in rows]
    assert sorted(ids) == sorted(set(ids))  # one row per node
    assert set(ids) == {1, 2, 3, 10, 11, 20, 21, 22}
    # every component id is a member of its own component
    labels = _labels(out)
    assert all(labels[c] == c for c in set(labels.values()))


def test_self_loops_and_duplicate_pairs_are_harmless(spark):
    edges = [(5, 5), (1, 2), (2, 1), (1, 2)]
    got = _labels(cluster_pairs(_pairs(spark, edges)))
    assert got == {1: 1, 2: 1}


def test_apply_dedup_keeps_canonicals_and_untouched(spark):
    corpus = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(8)], "doc_id long, text string"
    )
    clusters = cluster_pairs(_pairs(spark, [(1, 2), (2, 3), (5, 6)]))
    kept = apply_dedup(corpus, clusters)
    assert sorted(r["doc_id"] for r in kept.collect()) == [0, 1, 4, 5, 7]


def test_nonconvergence_raises(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        cluster_pairs(_pairs(spark, [(i, i + 1) for i in range(1, 40)]), max_iter=1)


def test_reliable_checkpoint_mode(spark, tmp_path):
    """With a checkpoint dir configured, checkpoint='auto' must route rounds
    through reliable checkpoints (files appear under the dir) and produce
    identical components."""
    edges = [(i, i + 1) for i in range(1, 8)] + [(20, 21), (21, 22)]
    sc = spark.sparkContext
    ckpt = str(tmp_path / "ckpt")
    sc.setCheckpointDir(ckpt)
    try:
        got = _labels(cluster_pairs(_pairs(spark, edges)))
        import os

        found = any(files for _, _, files in os.walk(ckpt))
        assert found, "no reliable checkpoint files written"
    finally:
        # unset for other tests (py4j needs getattr for the $-named setter)
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(sc._jvm.scala.Option.apply(None))
    assert got == {**{i: 1 for i in range(1, 9)}, 20: 20, 21: 20, 22: 20}


def test_explicit_local_checkpoint_mode_ignores_dir(spark, tmp_path):
    edges = [(1, 2), (2, 3)]
    got = _labels(cluster_pairs(_pairs(spark, edges), checkpoint="local"))
    assert got == {1: 1, 2: 1, 3: 1}


def test_pool_embeddings_exact_mean_and_order_independence(spark):
    from py_image_toolkit_spark.operators.similarity import pool_embeddings

    rows = [
        (1, [1.0, -2.0, 0.5]),
        (1, [3.0, 4.0, -0.5]),
        (2, [10.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "doc_id long, embedding array<double>")
    out = {(r.doc_id, r.dim): r.mean_micro for r in pool_embeddings(df).collect()}
    # group 1: means (2.0, 1.0, 0.0) -> micro (2_000_000, 1_000_000, 0)
    assert out[(1, 0)] == 2_000_000 and out[(1, 1)] == 1_000_000 and out[(1, 2)] == 0
    # singleton group passes through
    assert out[(2, 0)] == 10_000_000
    # negative odd mean floors toward -inf (cross-engine FLOOR semantics):
    # (-1 + -2) / 2 = -1.5e6 -> -1_500_000; (1 + -2)/2 micro -> -500_000
    df2 = spark.createDataFrame(
        [(1, [-1.0, 1.0]), (1, [-2.0, -2.0])], "doc_id long, embedding array<double>"
    )
    out2 = {r.dim: r.mean_micro for r in pool_embeddings(df2).collect()}
    assert out2[0] == -1_500_000 and out2[1] == -500_000
    # order independence: reversed input, identical result
    out3 = {
        r.dim: r.mean_micro
        for r in pool_embeddings(
            spark.createDataFrame(
                [(1, [-2.0, -2.0]), (1, [-1.0, 1.0])],
                "doc_id long, embedding array<double>",
            )
        ).collect()
    }
    assert out3 == out2


def test_rrf_fusion_rank_math_and_missing_items(spark):
    from py_image_toolkit_spark.operators.similarity import rrf_fuse

    a = spark.createDataFrame(
        [(1, 1, 100), (1, 2, 200), (1, 3, 300)],
        "probe_id long, rank long, corpus_id long",
    )
    b = spark.createDataFrame(
        [(1, 1, 200), (1, 2, 999)],  # 200 ranked first here; 999 unseen by A
        "probe_id long, rank long, corpus_id long",
    )
    out = {r.corpus_id: r for r in rrf_fuse([a, b], k=10).collect()}
    # item 200: 1e6//62 + 1e6//61 from both systems — the consensus item wins
    assert out[200].rrf_micro == 1_000_000 // 62 + 1_000_000 // 61
    assert out[200].n_systems == 2 and out[200].rank == 1
    # single-system items score exactly their one reciprocal term
    assert out[100].rrf_micro == 1_000_000 // 61 and out[100].n_systems == 1
    assert out[999].rrf_micro == 1_000_000 // 62
    # fused order: consensus > best single > ...
    assert [r.corpus_id for r in sorted(out.values(), key=lambda r: r.rank)] == [
        200, 100, 999, 300,
    ]
