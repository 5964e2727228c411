"""Corpus-assembly operator tests (vocab/TF-IDF/stratified-sample/
incremental-dedup/novelty) against brute-force Python references."""

import hashlib
import re
from collections import Counter

import pytest

from py_image_toolkit_spark.operators import corpus as C
from py_image_toolkit_spark.operators import dedup as D
from py_image_toolkit_spark.operators.text_stats import BPE_RE


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat sat on the mat", "en"),
        (2, "the dog sat on the log", "en"),
        (3, "the cat sat on the mat", "en"),  # exact dup of 1
        (4, "entirely novel words here nothing shared", "de"),
        (5, "the cat sat on the mat extra tail", "de"),
        (6, "", "fr"),
        (7, "one", "fr"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _toks(text):
    return re.findall(BPE_RE, text)


def test_vocab_topk_matches_counter(docs):
    out = C.vocab_topk(docs, k=5).toPandas()
    occ = Counter()
    dfreq = Counter()
    for _, r in docs.toPandas().iterrows():
        toks = _toks(r.text)
        occ.update(toks)
        dfreq.update(set(toks))
    expected = sorted(occ.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert list(zip(out["token"], out["occurrences"])) == expected
    for _, r in out.iterrows():
        assert dfreq[r.token] == r.doc_freq


def test_tfidf_topk_rank_and_integer_score(docs):
    out = C.tfidf_topk(docs, k=3).toPandas()
    pdf = docs.toPandas()
    n_docs = pdf.doc_id.nunique()
    dfreq = Counter()
    for _, r in pdf.iterrows():
        dfreq.update(set(_toks(r.text)))
    for doc_id, grp in out.groupby("doc_id"):
        toks = Counter(_toks(pdf[pdf.doc_id == doc_id].text.iloc[0]))
        scores = {
            tok: tf * ((1_000_000 * n_docs) // dfreq[tok])
            for tok, tf in toks.items()
        }
        expect = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        got = list(zip(grp.sort_values("rank")["token"], grp.sort_values("rank")["score"]))
        assert got == expect
    # empty/short docs emit ≤ their token count rows, never crash
    assert set(out.doc_id) == {1, 2, 3, 4, 5, 7}


def test_stratified_sample_two_phase_equals_serial(docs):
    out = C.stratified_sample(
        docs, strata_col="lang", quotas={"en": 2}, default_quota=1
    ).toPandas()
    pdf = docs.toPandas()
    pdf["key"] = pdf.doc_id.map(lambda i: hashlib.md5(str(i).encode()).hexdigest())
    kept = []
    for lang, grp in pdf.groupby("lang"):
        quota = {"en": 2}.get(lang, 1)
        ordered = grp.sort_values(["key", "doc_id"])
        for rank, (_, r) in enumerate(ordered.iterrows(), start=1):
            if rank <= quota:
                kept.append((r.doc_id, lang, rank))
    assert sorted(map(tuple, out[["doc_id", "lang", "stratum_rank"]].values.tolist())) == sorted(kept)


def test_dedup_incremental_statuses(spark):
    index = spark.createDataFrame(
        [(1, "seen before"), (2, "also seen")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (10, "seen before"),   # dup_of_index
            (11, "brand new"),     # kept
            (12, "brand new"),     # dup_in_batch (11 wins by id)
            (13, "also seen"),     # dup_of_index
            (14, "other new"),     # kept
        ],
        "doc_id long, text string",
    )
    out = D.dedup_incremental(batch, index).toPandas().set_index("doc_id")
    assert out.loc[10, "status"] == "dup_of_index"
    assert out.loc[11, "status"] == "kept"
    assert out.loc[12, "status"] == "dup_in_batch"
    assert out.loc[13, "status"] == "dup_of_index"
    assert out.loc[14, "status"] == "kept"
    # accepts a pre-hashed index too (the committed-snapshot shape)
    hashed_index = index.select(
        D._md5(index.text).alias("content_hash")
    )
    out2 = D.dedup_incremental(batch, hashed_index).toPandas().set_index("doc_id")
    assert (out2["status"] == out["status"]).all()


def test_ngram_novelty_brute_force(docs):
    out = D.ngram_novelty(docs, k=3).toPandas().set_index("doc_id")
    pdf = docs.toPandas()
    grams = {}
    for _, r in pdf.sort_values("doc_id").iterrows():
        toks = r.text.split()
        gs = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
        grams[r.doc_id] = gs
    first = {}
    for doc_id in sorted(grams):
        for g in grams[doc_id]:
            first.setdefault(g, doc_id)
    for doc_id, gs in grams.items():
        if not gs:
            assert doc_id not in out.index
            continue
        novel = sum(1 for g in gs if first[g] == doc_id)
        assert out.loc[doc_id, "total_ngrams"] == len(gs)
        assert out.loc[doc_id, "novel_ngrams"] == novel
        assert out.loc[doc_id, "novelty_micro"] == (1_000_000 * novel) // len(gs)
    # the exact dup of doc 1 has zero novelty
    assert out.loc[3, "novelty_micro"] == 0


def test_bpe_pair_counts_brute_force(docs):
    out = C.bpe_pair_counts(docs, k=100).toPandas()
    freq = Counter()
    for _, r in docs.toPandas().iterrows():
        freq.update(w for w in r.text.split() if len(w) >= 2)
    pairs = Counter()
    for word, f in freq.items():
        for a, b in zip(word, word[1:]):
            pairs[(a, b)] += f
    expected = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
    got = [((r.lhs, r.rhs), r.pair_count) for _, r in out.iterrows()]
    assert got == expected[: len(got)]
    # the most frequent pair is the round's merge candidate
    assert (out.iloc[0].lhs, out.iloc[0].rhs) == expected[0][0]


def test_pmi_bigrams_brute_force(docs):
    out = C.pmi_bigrams(docs, min_count=1).toPandas()
    uni = Counter()
    big = Counter()
    for _, r in docs.toPandas().iterrows():
        toks = r.text.split()
        uni.update(toks)
        big.update(zip(toks, toks[1:]))
    n = sum(uni.values())
    assert len(out) == len(big)
    for _, r in out.iterrows():
        c_ab = big[(r.w1, r.w2)]
        assert r.pair_count == c_ab
        assert r.pmi_micro == (1_000_000 * n * c_ab) // (uni[r.w1] * uni[r.w2])
    # min_count filters singletons
    out2 = C.pmi_bigrams(docs, min_count=2).toPandas()
    assert set(map(tuple, out2[["w1", "w2"]].values.tolist())) == {
        k for k, v in big.items() if v >= 2
    }


def test_length_percentiles_brute_force(docs):
    out = C.length_percentiles(docs).toPandas().set_index("lang")
    pdf = docs.toPandas()
    pdf["l"] = pdf.text.map(lambda s: len(s.split()))
    for lang, grp in pdf.groupby("lang"):
        lens = sorted(grp.l)
        n = len(lens)
        row = out.loc[lang]
        assert row.n_docs == n
        assert row.min_len == lens[0] and row.max_len == lens[-1]
        assert row.distinct_lengths == len(set(lens))
        for p in (50, 90, 99):
            # smallest value whose cumulative count reaches ceil(p% of n)
            want = lens[-(-n * p // 100) - 1]
            assert row[f"p{p}_len"] == want, (lang, p)


def test_snapshot_diff_classifies_all_four_states(spark):
    from py_image_toolkit_spark.operators.corpus import snapshot_diff

    old = spark.createDataFrame(
        [(1, "same"), (2, "will change"), (3, "will vanish")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "changed!"), (4, "brand new")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.status for r in snapshot_diff(old, new).collect()}
    assert out == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_bm25_ranks_selective_terms_and_shorter_docs_higher(spark):
    from py_image_toolkit_spark.operators.corpus import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "rareword filler filler filler"),
            (2, "common filler filler filler"),
            (3, "common common filler filler filler filler filler filler"),
            (4, "common filler"),
            (5, "filler filler filler filler"),
        ],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [(1, "rareword"), (2, "common"), (3, "absent")],
        "query_id long, qtext string",
    )
    out = bm25_topk(docs, queries, k=5).collect()
    by_q = {}
    for r in sorted(out, key=lambda r: (r.query_id, r.rank)):
        by_q.setdefault(r.query_id, []).append(r)
    # q1: only doc 1 contains the rare word
    assert [r.doc_id for r in by_q[1]] == [1]
    # q2: docs 2/3/4 match; the short doc (4) outranks the long ones, and
    # the rare-term query scores doc 1 higher than any common-term hit
    assert set(r.doc_id for r in by_q[2]) == {2, 3, 4}
    assert by_q[2][0].doc_id == 4
    assert by_q[1][0].score_micro > by_q[2][0].score_micro
    # q3: no matches at all
    assert 3 not in by_q
    assert all(r.matched_terms == 1 for q in by_q.values() for r in q)


def test_release_gate_precedence_and_reasons(spark):
    from py_image_toolkit_spark.operators.corpus import release_gate
    from py_image_toolkit_spark.operators.text_stats import char_lm_model

    good = (
        "the cat sat on the mat and the dog ran to the park near the old "
        "mill where the children play on sunny days with their friends"
    )
    docs = spark.createDataFrame(
        [
            (1, good, "en"),                          # kept
            (2, good, "de"),                          # lang (wins over dup of 1? no - different id, same text as 1!)
            (3, "short text", "en"),                  # too_short
            (4, good, "en"),                          # exact_dup of 1 (min id keeps)
            (5, "!!! ??? *** !!! ??? *** !!! ??? *** !!! ??? *** !!! ??? ***", "en"),  # low_quality
        ],
        "doc_id long, text string, lang string",
    )
    model = char_lm_model(docs.filter("lang = 'en'"))
    out = {r.doc_id: r for r in release_gate(docs, lm_model=model).collect()}
    assert out[1].kept and out[1].reason is None
    # precedence: doc 2 duplicates doc 1's text but fails the lang gate first
    assert out[2].reason == "lang"
    assert out[3].reason == "too_short"
    assert out[4].reason == "exact_dup"
    assert out[5].reason in ("low_quality", "too_short")  # quality gate fires
    assert not out[5].kept


def test_budget_allocation_invariants(spark):
    from py_image_toolkit_spark.operators.corpus import budget_allocation

    rows = [
        (i, "tok " * 10, ["big", "small", "zero"][i % 3]) for i in range(90)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    weights = spark.createDataFrame(
        [("big", 900_000), ("small", 100_000), ("zero", 0)],
        "source string, weight_ppm long",
    )
    out = {r.source: r for r in budget_allocation(docs, 400, weights).collect()}
    # zero-weight source: no target, nothing kept
    assert out["zero"].target_tokens == 0 and out["zero"].kept_docs == 0
    # big gets 9x small's target
    assert out["big"].target_tokens == 360 and out["small"].target_tokens == 40
    # big's target > its 300 available tokens -> rate caps at keep-everything
    assert out["big"].rate_ppm == 1_000_000
    assert out["big"].kept_docs == out["big"].n_docs == 30
    # small keeps a proper subset, roughly on target (doc granularity = 10)
    assert 0 < out["small"].kept_docs < 30
    assert out["small"].kept_tokens == out["small"].kept_docs * 10

    # nested cuts: doubling the budget grows every source's sample
    out2 = {r.source: r for r in budget_allocation(docs, 800, weights).collect()}
    for s in ("big", "small"):
        assert out2[s].kept_docs >= out[s].kept_docs


def test_source_health_cross_source_duplication(spark):
    from py_image_toolkit_spark.operators.corpus import source_health

    docs = spark.createDataFrame(
        [
            (1, "original content one with plenty of words to pass the minimum token floor here right now", "feed_a"),
            (2, "original content two with plenty of words to pass the minimum token floor here right now", "feed_a"),
            # mirror re-serves doc 1's exact text under a higher id
            (3, "original content one with plenty of words to pass the minimum token floor here right now", "mirror"),
            (4, "tiny", "mirror"),
        ],
        "doc_id long, text string, source string",
    )
    out = {r.source: r for r in source_health(docs).collect()}
    # the ORIGINAL feed is clean; the mirror carries the duplication
    assert out["feed_a"].dup_docs == 0 and out["feed_a"].n_docs == 2
    assert out["mirror"].dup_docs == 1
    assert out["mirror"].short_docs == 1
    assert out["feed_a"].short_docs == 0


def test_weighted_topk_sample_bias_and_determinism(spark):
    from py_image_toolkit_spark.operators.corpus import weighted_topk_sample

    # 500 docs: half weight 10, half weight 1, a few weight 0
    rows = [(i, 10 if i % 2 == 0 else (0 if i % 97 == 0 else 1)) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, weight long")
    out = weighted_topk_sample(df, "weight", k=60).collect()
    assert len(out) == 60
    # zero-weight docs never appear
    assert all(r.weight > 0 for r in out)
    # heavy class dominates the sample well beyond its 50% population share
    heavy = sum(1 for r in out if r.weight == 10)
    assert heavy > 40
    # deterministic rerun
    again = weighted_topk_sample(df, "weight", k=60).collect()
    assert [(r.doc_id, r.sample_rank) for r in out] == [
        (r.doc_id, r.sample_rank) for r in again
    ]
    # ranks are 1..k ordered by priority
    assert [r.sample_rank for r in sorted(out, key=lambda r: r.priority)] == list(
        range(1, 61)
    )


def test_best_snippet_picks_densest_earliest_window(spark):
    from py_image_toolkit_spark.operators.corpus import best_snippet

    docs = spark.createDataFrame(
        [
            # dense cluster of hits late in the doc beats a lone early hit
            (1, "query a b c d e f g h i j k l query window query m n"),
            (2, "no hits here at all just filler words"),
            (3, "tie tie query x query y z w v u t s r q p o n"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in best_snippet(docs, ("query", "window"), window_tokens=4).collect()}
    # doc 1: window starting at the late cluster holds 3 hits
    assert out[1].snippet_hits == 3
    assert out[1].snippet.split(" ")[0] == "query" or "query" in out[1].snippet
    # both 3-hit windows (start 12 'l query window query' and start 13)
    # tie; earliest wins
    assert out[1].snippet_start == 12
    # zero-hit docs drop
    assert 2 not in out
    # doc 3: two equal-density windows -> earliest start wins
    assert out[3].snippet_start == 1 and out[3].snippet_hits == 2


def test_oov_rate_full_and_zero_coverage(spark):
    from py_image_toolkit_spark.operators.corpus import oov_rate

    docs = spark.createDataFrame(
        [
            (1, "a b a b", "en"),
            (2, "a b c", "de"),      # c uncovered -> 1/3
            (3, "x y z", "zh"),      # fully uncovered
        ],
        "doc_id long, text string, lang string",
    )
    vocab = spark.createDataFrame([("a",), ("b",)], "token string")
    out = {r.lang: r for r in oov_rate(docs, vocab).collect()}
    assert out["en"].oov_micro == 0
    assert out["de"].oov_tokens == 1 and out["de"].oov_micro == 333_333
    assert out["zh"].oov_micro == 1_000_000
