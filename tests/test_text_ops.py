"""redact_pii / weighted_sample (operators/text_stats.py)."""

from pyspark.sql import functions as F

from py_image_toolkit_spark.operators.text_stats import redact_pii, weighted_sample


def test_redact_pii_patterns_and_counts(spark):
    rows = [
        (1, "call 010-1234-5678 now"),
        (2, "rrn 880505-1122334 and plain 8805051122334 here"),
        (3, "mail a.b+c%d@sub.example.co.kr please"),
        (4, "clean text with digits 12345 and date 2021-03-05"),
        (5, "두 번호 123456 - 1234567 그리고 02-123-4567"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}

    assert out[1]["n_phone"] == 1 and "[PHONE]" in out[1]["redacted_text"]
    assert "010" not in out[1]["redacted_text"]
    assert out[2]["n_rrn"] == 1 and out[2]["n_rrn13"] == 1
    assert out[2]["redacted_text"] == "rrn [RRN] and plain [RRN] here"
    assert out[3]["n_email"] == 1
    assert out[3]["redacted_text"] == "mail [EMAIL] please"
    # no false positives: dates/short digit runs survive
    assert out[4]["redacted_text"] == rows[3][1]
    assert out[4]["n_rrn"] == out[4]["n_phone"] == out[4]["n_email"] == 0
    # spaced dashed rrn + 2-digit area phone, Korean context
    assert out[5]["n_rrn"] == 1 and out[5]["n_phone"] == 1
    assert out[5]["redacted_text"] == "두 번호 [RRN] 그리고 [PHONE]"


def test_weighted_sample_rates_and_nesting(spark):
    rows = [(i, "hot" if i % 2 == 0 else "cold") for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = weighted_sample(df, {"hot": 1.0, "cold": 0.2}).collect()
    hot = [r["doc_id"] for r in out if r["source"] == "hot"]
    cold = [r["doc_id"] for r in out if r["source"] == "cold"]
    assert len(hot) == 2000  # rate 1.0 keeps everything
    assert 0.15 < len(cold) / 2000 < 0.25
    # default rate applies to unknown groups
    none_kept = weighted_sample(df, {}, default_rate=0.0).count()
    assert none_kept == 0
    # nesting: the 0.2 cold sample is inside the 0.5 cold sample
    half = {
        r["doc_id"]
        for r in weighted_sample(df, {"hot": 1.0, "cold": 0.5}).collect()
        if r["source"] == "cold"
    }
    assert set(cold) <= half


def test_pack_sequences_matches_serial_layout(spark):
    """The two-phase bucketed prefix sum must produce EXACTLY the serial
    concat-and-split layout (same hash order, one global stream)."""
    import hashlib

    from py_image_toolkit_spark.operators.text_stats import pack_sequences

    docs = [(i, " ".join(f"t{i}_{j}" for j in range(1 + (i * 7) % 23))) for i in range(60)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in pack_sequences(df, budget=16).collect()}

    order = sorted(docs, key=lambda d: (hashlib.md5(str(d[0]).encode()).hexdigest(), d[0]))
    cum = 0
    for doc_id, text in order:
        n = len(text.split())
        r = got[doc_id]
        assert r["n_tokens"] == n
        assert r["pack_id"] == cum // 16
        assert r["pack_offset"] == cum % 16
        cum += n


def test_pack_sequences_offsets_within_budget(spark):
    from py_image_toolkit_spark.operators.text_stats import pack_sequences

    df = spark.createDataFrame(
        [(i, "a b c d e f g") for i in range(40)], "doc_id long, text string"
    )
    rows = pack_sequences(df, budget=32).collect()
    assert all(0 <= r["pack_offset"] < 32 for r in rows)
    assert len({(r["pack_id"], r["pack_offset"]) for r in rows}) == len(rows)


def test_hashed_linear_score_brute_force(spark):
    import hashlib

    from py_image_toolkit_spark.operators.text_stats import hashed_linear_score

    weights = [((i * 2654435761) % 1001) - 500 for i in range(256)]
    bias = 7
    rows = [
        (1, "the cat sat"),
        (2, "entirely different words appear here"),
        (3, ""),            # empty doc scores exactly the bias
        (4, "the the the"), # repeated token sums its weight 3x
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: (r.n_tokens, r.score, r.verdict)
        for r in hashed_linear_score(df, weights=weights, bias=bias).collect()
    }

    def bucket(tok):
        h = hashlib.md5(tok.encode()).hexdigest()
        return int(h[0], 16) * 16 + int(h[1], 16)

    for doc_id, text in rows:
        toks = text.split()
        score = bias + sum(weights[bucket(t)] for t in toks)
        assert out[doc_id] == (
            len(toks),
            score,
            "keep" if score >= 0 else "drop",
        ), doc_id


def test_hashed_linear_score_rejects_bad_dim(spark):
    import pytest as _pytest

    from py_image_toolkit_spark.operators.text_stats import hashed_linear_score

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        hashed_linear_score(df, weights=[1, 2, 3])


def test_clean_text_rewrites(spark):
    from py_image_toolkit_spark.operators.text_stats import clean_text

    rows = [
        (1, "plain text stays"),
        (2, "a\x01b\x02c"),                    # control chars removed
        (3, "a​b‌c‍d﻿e"),  # zero-width removed
        (4, "a b c　d"),         # exotic spaces → ' '
        (5, "  runs   of\t spaces  "),         # collapse + trim
        (6, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: (r.text, r.n_chars_raw, r.n_chars_clean)
        for r in clean_text(df).collect()
    }
    assert out[1] == ("plain text stays", 16, 16)
    assert out[2] == ("abc", 5, 3)
    assert out[3] == ("abcde", 9, 5)
    assert out[4] == ("a b c d", 7, 7)
    assert out[5] == ("runs of spaces", 21, 14)
    assert out[6] == ("", 0, 0)


def test_clean_text_preserves_newlines_and_other_columns(spark):
    from py_image_toolkit_spark.operators.text_stats import clean_text

    df = spark.createDataFrame(
        [(1, "en", "line1\nline2\r\nline3")], "doc_id long, lang string, text string"
    )
    row = clean_text(df).collect()[0]
    assert row.text == "line1\nline2\r\nline3"
    assert row.lang == "en"


# ---------------------------------------------------------------------------
# char-trigram LM fluency (CCNet-style quality filter, q71)
# ---------------------------------------------------------------------------


def test_char_lm_scores_reference_like_text_higher(spark):
    from py_image_toolkit_spark.operators.text_stats import char_lm_model, char_lm_score

    ref = spark.createDataFrame(
        [(i, "the cat sat on the mat and the dog ran to the park") for i in range(4)],
        "doc_id long, text string",
    )
    model = char_lm_model(ref)
    probe = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),       # in-distribution
            (2, "zqxj vwkp fjzq xqzw bnmp"),     # gibberish, mostly unseen
            (3, "ab"),                            # < 3 chars → no trigrams
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in char_lm_score(probe, model).collect()}
    assert out[1].fluency_micro > out[2].fluency_micro
    assert out[1].matched_tri == out[1].n_tri  # every trigram seen in ref
    assert 3 not in out  # no trigrams → no row
    # probability mass bound: mean conditional prob can never exceed 1
    assert all(0 <= r.fluency_micro <= 1_000_000 for r in out.values())


def test_char_lm_model_is_exact_conditional_probability(spark):
    from py_image_toolkit_spark.operators.text_stats import char_lm_model

    # "aab aab": trigrams aab×2, "ab "×1, "b a"×1, " aa"×1; bigram "aa"×2
    ref = spark.createDataFrame([(1, "aab aab")], "doc_id long, text string")
    m = {r.tri: r.score_micro for r in char_lm_model(ref).collect()}
    assert m["aab"] == 1_000_000  # p(b|aa) = 2/2
    assert m["ab "] == 500_000    # p(' '|ab) = 1/2


# ---------------------------------------------------------------------------
# sliding-window chunker (q72)
# ---------------------------------------------------------------------------


def test_chunk_documents_boundaries(spark):
    import pytest as _pytest

    from py_image_toolkit_spark.operators.text_stats import chunk_documents

    def toks(n):
        return " ".join(f"t{i}" for i in range(n))

    df = spark.createDataFrame(
        [(1, toks(10)), (2, toks(11)), (3, toks(25)), (4, ""), (5, "one")],
        "doc_id long, text string",
    )
    out = chunk_documents(df, chunk_tokens=10, overlap=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # exactly chunk_tokens → one chunk
    assert [(c.chunk_start, c.n_tokens) for c in by_doc[1]] == [(0, 10)]
    # one token past a full chunk → second chunk at stride covering the tail
    assert [(c.chunk_start, c.n_tokens) for c in by_doc[2]] == [(0, 10), (6, 5)]
    # 25 tokens, stride 6: ceil(15/6)=3 extra chunks; tail covered
    assert [(c.chunk_start, c.n_tokens) for c in by_doc[3]] == [
        (0, 10), (6, 10), (12, 10), (18, 7),
    ]
    last = by_doc[3][-1]
    assert last.chunk_text.endswith("t24")
    # empty doc emits nothing; 1-token doc emits itself
    assert 4 not in by_doc
    assert [(c.chunk_start, c.n_tokens, c.chunk_text) for c in by_doc[5]] == [(0, 1, "one")]
    # every token of doc 3 appears in some chunk
    covered = set()
    for c in by_doc[3]:
        covered.update(c.chunk_text.split(" "))
    assert covered == set(toks(25).split(" "))

    with _pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=8, overlap=8)


def test_script_mix_counts_and_dominance(spark):
    from py_image_toolkit_spark.operators.text_stats import script_mix

    df = spark.createDataFrame(
        [
            (1, "hello world"),
            (2, "데이터 처리 파이프라인"),
            (3, "数据 data 处理 системы"),   # CJK 4, latin 4, cyrillic 7
            (4, "123 456"),                  # no script chars at all
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in script_mix(df).collect()}
    assert out[1].dominant_script == "latin" and out[1].n_latin == 10
    assert out[2].dominant_script == "hangul" and out[2].n_hangul > 0
    assert out[3].dominant_script == "cyrillic"
    assert out[3].n_cjk == 4 and out[3].n_latin == 4 and out[3].n_cyrillic == 7
    # scriptless text: zero counts, first-in-table dominance, 0 ppm
    assert out[4].dominant_script == "latin" and out[4].dominant_ppm == 0
    # ppm is over non-space chars
    assert out[1].dominant_ppm == 1_000_000
