"""BPE training/encoding (pipeline/bpe.py) vs an independently written
regex-based sequential reference (the Sennrich arXiv:1508.07909 paper
algorithm over space-joined symbol strings)."""

import re
from collections import Counter

from mgspark.pipeline.bpe import (
    END_OF_WORD,
    bpe_encode_words,
    bpe_train,
    bpe_train_from_word_counts,
    word_counts,
)


def _ref_train(word_cnt: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    """Reference: words as space-joined symbol strings, merges applied
    with a boundary-anchored regex substitution."""
    vocab = Counter()
    for w, c in word_cnt.items():
        vocab[" ".join(list(w) + [END_OF_WORD])] += c
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for word, c in vocab.items():
            syms = word.split(" ")
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        pat = re.compile(
            r"(?<!\S)" + re.escape(best[0] + " " + best[1]) + r"(?!\S)"
        )
        vocab = Counter(
            {pat.sub(best[0] + best[1], w): c for w, c in vocab.items()}
        )
    return merges


def _ref_encode(word: str, merges: list[tuple[str, str]]) -> list[str]:
    text = " ".join(list(word) + [END_OF_WORD])
    for a, b in merges:
        pat = re.compile(r"(?<!\S)" + re.escape(a + " " + b) + r"(?!\S)")
        text = pat.sub(a + b, text)
    return text.split(" ")


CORPUS = {
    "low": 5, "lower": 2, "newest": 6, "widest": 3,
    "new": 4, "west": 2, "lowest": 1,
}


def test_train_matches_regex_reference():
    got = bpe_train_from_word_counts(list(CORPUS.items()), 12)
    want = _ref_train(CORPUS, 12)
    assert got == want
    assert len(got) == 12


def test_train_exhausts_gracefully():
    # single 2-symbol word: only a couple of merges exist
    merges = bpe_train_from_word_counts([("ab", 1)], 50)
    assert merges == [("a", "b"), ("ab", END_OF_WORD)]


def test_tie_break_is_lexicographic():
    # "ab" and "cd" pairs both appear once; ('a','b') < ('c','d')
    merges = bpe_train_from_word_counts([("ab", 1), ("cd", 1)], 1)
    assert merges[0] == ("a", "b")


def test_encode_matches_reference_application(spark):
    merges = bpe_train_from_word_counts(list(CORPUS.items()), 10)
    words = list(CORPUS) + ["newer", "wide", "unseen", "x"]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {r["word"]: r["tokens"] for r in bpe_encode_words(df, "word", merges).collect()}
    for w in words:
        assert got[w] == _ref_encode(w, merges), w
        assert "".join(got[w]) == w + END_OF_WORD  # round trip


def test_spark_train_equals_local_train(spark):
    rows = [(i, (" ".join([w] * c))) for i, (w, c) in enumerate(CORPUS.items())]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = bpe_train(df, "text", n_merges=8)
    want = _ref_train(CORPUS, 8)
    assert got == want
    # word_counts agrees with the corpus multiset
    wc = {r["word"]: r["cnt"] for r in word_counts(df, "text").collect()}
    assert wc == CORPUS


def test_empty_corpus(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    assert bpe_train(df, "text", n_merges=5) == []
