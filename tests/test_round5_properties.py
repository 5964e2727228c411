"""Property-based invariants for the round-5 operator family: the
example-based tests pin specific shapes; these sweep randomized inputs for
the structural guarantees each operator advertises (coverage, winnowing's
shared-run guarantee, span removal, budget nestedness)."""

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_spark = None


@pytest.fixture(scope="module", autouse=True)
def _bind_spark(spark):
    global _spark
    _spark = spark
    yield
    _spark = None


_PROP = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@given(
    n_tokens=st.integers(min_value=0, max_value=60),
    chunk=st.sampled_from([4, 8, 16]),
    overlap=st.sampled_from([0, 1, 3]),
)
@settings(**_PROP)
def test_chunker_covers_every_token_without_containment(n_tokens, chunk, overlap):
    from py_image_toolkit_spark.operators.text_stats import chunk_documents

    text = " ".join(f"t{i}" for i in range(n_tokens))
    df = _spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = sorted(
        chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect(),
        key=lambda r: r.chunk_id,
    )
    if n_tokens == 0:
        assert out == []
        return
    # every token appears in some chunk
    covered = set()
    for c in out:
        toks = c.chunk_text.split(" ")
        assert len(toks) == c.n_tokens
        covered.update(toks)
    assert covered == set(text.split(" "))
    # no chunk is fully contained in its predecessor, starts advance by stride
    stride = chunk - overlap
    for a, b in zip(out, out[1:]):
        assert b.chunk_start == a.chunk_start + stride
        assert b.chunk_start + b.n_tokens > a.chunk_start + a.n_tokens


@given(
    run_len=st.integers(min_value=8, max_value=20),
    pre_a=st.integers(min_value=0, max_value=6),
    pre_b=st.integers(min_value=0, max_value=6),
)
@settings(**_PROP)
def test_winnowing_shared_run_guarantee_randomized(run_len, pre_a, pre_b):
    from py_image_toolkit_spark.operators.dedup import winnow_fingerprints

    # any shared run of >= w+k-1 = 8 tokens must collide at least once,
    # regardless of where it sits in either document
    shared = " ".join(f"s{i}" for i in range(run_len))
    a = " ".join(f"a{i}" for i in range(pre_a)) + " " + shared
    b = " ".join(f"b{i}" for i in range(pre_b)) + " " + shared + " btail1 btail2"
    df = _spark.createDataFrame(
        [(1, a.strip()), (2, b.strip())], "doc_id long, text string"
    )
    fp = winnow_fingerprints(df, k=5, w=4).collect()
    hashes = {1: set(), 2: set()}
    for r in fp:
        hashes[r.doc_id].add(r.fp_hash)
    assert hashes[1] & hashes[2]


@given(
    span_len=st.integers(min_value=8, max_value=16),
    pre=st.integers(min_value=0, max_value=5),
    post=st.integers(min_value=0, max_value=5),
)
@settings(**_PROP)
def test_span_dedup_always_removes_injected_shared_span(span_len, pre, post):
    from py_image_toolkit_spark.operators.dedup import substring_span_dedup

    shared = " ".join(f"s{i}" for i in range(span_len))
    a = (" ".join(f"a{i}" for i in range(pre)) + f" {shared} "
         + " ".join(f"x{i}" for i in range(post))).strip()
    b = f"b0 b1 b2 {shared} b3"
    df = _spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    out = {r.doc_id: r for r in substring_span_dedup(df, k=8).collect()}
    for d in (1, 2):
        # the shared span is gone from the cleaned text...
        for tok in shared.split(" "):
            assert tok not in out[d].clean_text.split(" ")
        # ...and exactly the span's tokens were counted as duplicated
        assert out[d].dup_tokens == span_len


@given(
    budget=st.sampled_from([50, 200, 1000, 5000]),
    w_a=st.integers(min_value=0, max_value=10),
    w_b=st.integers(min_value=1, max_value=10),
)
@settings(**_PROP)
def test_budget_allocation_nested_and_bounded(budget, w_a, w_b):
    from py_image_toolkit_spark.operators.corpus import budget_allocation

    docs = _spark.createDataFrame(
        [(i, "tok " * 5, "a" if i % 2 == 0 else "b") for i in range(40)],
        "doc_id long, text string, source string",
    )
    weights = _spark.createDataFrame(
        [("a", w_a * 100_000), ("b", w_b * 100_000)], "source string, weight_ppm long"
    )
    out = {r.source: r for r in budget_allocation(docs, budget, weights).collect()}
    big = {r.source: r for r in budget_allocation(docs, budget * 2, weights).collect()}
    for s in ("a", "b"):
        assert 0 <= out[s].rate_ppm <= 1_000_000
        assert out[s].kept_docs <= out[s].n_docs
        # nestedness: a bigger budget never shrinks any source's sample
        assert big[s].kept_docs >= out[s].kept_docs
    if w_a == 0:
        assert out["a"].kept_docs == 0
