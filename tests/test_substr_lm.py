"""Exact substring duplicate-span detection (pipeline/substr.py) and
bigram-LM quality scoring (pipeline/lm.py) against hand-built truths."""

import math

import pytest

from mgspark.pipeline.lm import lm_score, lm_train
from mgspark.pipeline.substr import (
    dup_span_stats,
    dup_spans,
    dup_window_positions,
    remove_dup_spans,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            # docs 0/1 share "a b c d" -> two w=3 windows each, one span
            (0, "x a b c d y"),
            (1, "p q a b c d"),
            # doc 2 repeats its own trigram "r r r" (within-doc dup)
            (2, "r r r z r r r"),
            (3, "u v w m n"),
            (4, None),
            (5, ""),
        ],
        "doc_id long, text string",
    )


def test_dup_span_stats_hand_truth(corpus):
    rows = {r["id"]: r for r in dup_span_stats(corpus, w=3).collect()}
    assert set(rows) == {0, 1, 2}
    assert (rows[0]["n_dup_windows"], rows[0]["n_spans"], rows[0]["dup_tokens"]) == (2, 1, 4)
    assert (rows[1]["n_dup_windows"], rows[1]["n_spans"], rows[1]["dup_tokens"]) == (2, 1, 4)
    # "r r r" occurs at pos 1 and 5: two disjoint spans of 3 tokens
    assert (rows[2]["n_dup_windows"], rows[2]["n_spans"], rows[2]["dup_tokens"]) == (2, 2, 6)


def test_dup_spans_positions(corpus):
    spans = {
        (r["id"], r["span_start"]): r
    for r in dup_spans(corpus, w=3).collect()}
    assert spans[(0, 2)]["span_end"] == 5  # covers "a b c d"
    assert spans[(1, 3)]["span_end"] == 6
    assert spans[(2, 1)]["span_end"] == 3
    assert spans[(2, 5)]["span_end"] == 7


def test_remove_dup_spans_rewrites_only_flagged(corpus):
    out = {r["doc_id"]: r["text"] for r in remove_dup_spans(corpus, w=3).collect()}
    assert out[0] == "x y"
    assert out[1] == "p q"
    assert out[2] == "z"
    assert out[3] == "u v w m n"  # untouched
    assert out[4] is None  # null text passes through
    assert out[5] == ""


def test_hash_and_string_variants_agree(corpus):
    a = sorted(map(tuple, dup_window_positions(corpus, w=3, hash_grams=True).collect()))
    b = sorted(map(tuple, dup_window_positions(corpus, w=3, hash_grams=False).collect()))
    assert a == b


def test_min_count_threshold(spark):
    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "a b c"), (2, "a b c")], "doc_id long, text string"
    )
    # trigram occurs 3 times: flagged at min_count=3, all three docs
    assert dup_span_stats(docs, w=3, min_count=3).count() == 3
    assert dup_span_stats(docs, w=3, min_count=4).count() == 0
    with pytest.raises(ValueError):
        dup_window_positions(docs, w=3, min_count=1)
    with pytest.raises(ValueError):
        dup_window_positions(docs, w=0)


def test_touching_windows_merge_into_one_span(spark):
    # "a b a b a b": w=2 windows "a b"(1), "b a"(2), "a b"(3), "b a"(4),
    # "a b"(5) — all duplicated, positions 1..5 contiguous -> ONE span
    # covering all 6 tokens.
    docs = spark.createDataFrame([(0, "a b a b a b")], "doc_id long, text string")
    rows = dup_spans(docs, w=2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["span_start"], r["span_end"], r["span_tokens"], r["n_windows"]) == (1, 6, 6, 5)


# ---------------------------------------------------------------- LM --


@pytest.fixture(scope="module")
def ref_corpus(spark):
    # token counts: the=4, cat=2, sat=2, dog=1, ran=1
    return spark.createDataFrame(
        [
            (0, "the cat sat"),
            (1, "the cat sat"),
            (2, "the dog ran the"),
        ],
        "doc_id long, text string",
    )


def test_lm_train_counts_and_pruning(ref_corpus):
    lm = lm_train(ref_corpus, vocab_size=100, min_count=2)
    uni = {r["tok"]: r["n"] for r in lm.unigrams.collect()}
    assert uni == {"the": 4, "cat": 2, "sat": 2, "dog": 1, "ran": 1}
    assert lm.vocab_size == 5
    bi = {r["bg"]: r["n"] for r in lm.bigrams.collect()}
    # "the cat" x2 and "cat sat" x2 survive min_count=2; the rest are 1
    assert bi == {"the cat": 2, "cat sat": 2}


def test_lm_train_vocab_cap_deterministic(ref_corpus):
    lm = lm_train(ref_corpus, vocab_size=2, min_count=1)
    uni = {r["tok"]: r["n"] for r in lm.unigrams.collect()}
    # top-2 by (count desc, token asc): the=4, then cat (ties with sat at 2)
    assert uni == {"the": 4, "cat": 2}
    # bigrams restricted to in-vocab pairs: only "the cat" qualifies
    bi = {r["bg"]: r["n"] for r in lm.bigrams.collect()}
    assert bi == {"the cat": 2}


def test_lm_score_integers_and_logprob(spark, ref_corpus):
    lm = lm_train(ref_corpus, vocab_size=100, min_count=2)
    docs = spark.createDataFrame(
        [
            (10, "the cat sat"),   # bigrams: "the cat"(known,2), "cat sat"(known,2)
            (11, "zz the cat qq"), # "zz the"(unk), "the cat"(known), "cat qq"(unk)
            (12, "one"),           # no bigrams
            (13, None),
        ],
        "doc_id long, text string",
    )
    rows = {r["id"]: r for r in lm_score(docs, lm).collect()}
    assert (rows[10]["n_bigrams"], rows[10]["n_known_bigrams"], rows[10]["known_count_sum"]) == (2, 2, 4)
    assert (rows[11]["n_bigrams"], rows[11]["n_known_bigrams"], rows[11]["known_count_sum"]) == (3, 1, 2)
    assert (rows[12]["n_bigrams"], rows[12]["known_count_sum"]) == (0, 0)
    assert rows[12]["avg_logprob"] is None
    assert (rows[13]["n_bigrams"], rows[13]["avg_logprob"]) == (0, None)
    # hand-computed add-one logprobs, V=5:
    # "the cat": log2((2+1)/(4+6));  "cat sat": log2((2+1)/(2+6))
    expect10 = (math.log2(3 / 10) + math.log2(3 / 8)) / 2
    assert rows[10]["avg_logprob"] == pytest.approx(expect10, abs=1e-4)
    # "zz the": ctx zz unknown -> log2(1/6); "the cat": log2(3/10);
    # "cat qq": log2((0+1)/(2+6))
    expect11 = (math.log2(1 / 6) + math.log2(3 / 10) + math.log2(1 / 8)) / 3
    assert rows[11]["avg_logprob"] == pytest.approx(expect11, abs=1e-4)


def test_lm_score_broadcast_and_shuffle_agree(spark, ref_corpus):
    lm = lm_train(ref_corpus, vocab_size=100, min_count=2)
    docs = spark.createDataFrame(
        [(10, "the cat sat"), (11, "zz the cat qq")], "doc_id long, text string"
    )
    a = sorted(map(tuple, lm_score(docs, lm, broadcast_model=True).collect()))
    b = sorted(map(tuple, lm_score(docs, lm, broadcast_model=False).collect()))
    assert a == b
