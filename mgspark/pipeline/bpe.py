"""BPE tokenizer training and encoding over a document corpus.

The Sennrich et al. 2016 (arXiv:1508.07909) architecture, distributed
the way it actually scales: BPE trains on the WORD-FREQUENCY table, not
the corpus — so the one corpus-sized operation is a combiner-friendly
``explode + groupBy(word)`` scan, after which the merge loop runs
driver-side over a bounded vocabulary (``max_vocab_words`` top words by
frequency, the standard practice; a 100 TB corpus still has a
vocab-sized distinct-word table).  Encoding is the reverse shape: the
learned merge ranks broadcast to every executor, applied per DISTINCT
word inside Arrow-batched ``mapInPandas`` with a per-batch word cache —
never per-row Python over the raw corpus.

Determinism: merge selection orders by (count desc, pair lexicographic),
so the merge list is a pure function of the corpus and ``n_merges``;
tests pin it against an independently written sequential reference.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StringType, StructField, StructType

__all__ = [
    "word_counts",
    "bpe_train",
    "bpe_train_from_word_counts",
    "bpe_encode_words",
    "END_OF_WORD",
]

END_OF_WORD = "</w>"

# Whitespace as an EXPLICIT character class, not \s: Java regex \s
# includes vertical tab (\x0B) while RE2's (DuckDB string_split_regex)
# does not, so a document containing \x0B would tokenize differently in
# Spark vs an oracle replaying \s+.  Both engines support the \xHH
# escape, so the same literal class is pinned on both sides.
WS_REGEX = "[ \\t\\n\\f\\r\\x0B]+"


def word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(word, cnt) over whitespace-split text — one explode into a
    combiner groupBy; empty tokens from leading/trailing runs dropped."""
    return (
        df.select(F.explode(F.split(F.col(text_col), WS_REGEX)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> dict[tuple[str, str], int]:
    counts: dict[tuple[str, str], int] = {}
    for symbols, cnt in vocab.items():
        for a, b in zip(symbols, symbols[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + cnt
    return counts


def _merge_vocab(
    vocab: dict[tuple[str, ...], int], pair: tuple[str, str]
) -> dict[tuple[str, ...], int]:
    a, b = pair
    merged = a + b
    out: dict[tuple[str, ...], int] = {}
    for symbols, cnt in vocab.items():
        new: list[str] = []
        i = 0
        while i < len(symbols):
            if i + 1 < len(symbols) and symbols[i] == a and symbols[i + 1] == b:
                new.append(merged)
                i += 2
            else:
                new.append(symbols[i])
                i += 1
        key = tuple(new)
        out[key] = out.get(key, 0) + cnt
    return out


def bpe_train_from_word_counts(
    counts: Sequence[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """The driver-side merge loop: words start as character sequences
    plus the end-of-word marker; each round merges the most frequent
    adjacent pair (ties -> lexicographically smallest pair)."""
    vocab: dict[tuple[str, ...], int] = {}
    for word, cnt in counts:
        key = tuple(word) + (END_OF_WORD,)
        vocab[key] = vocab.get(key, 0) + int(cnt)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = _pair_counts(vocab)
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = _merge_vocab(vocab, best)
    return merges


def bpe_train(
    df: DataFrame,
    text_col: str,
    n_merges: int = 50,
    max_vocab_words: int = 100_000,
) -> list[tuple[str, str]]:
    """One distributed word-count scan, then the driver-side merge loop
    over the top ``max_vocab_words`` words by (cnt desc, word) — the
    ONLY driver materialization is the bounded vocabulary table
    (TakeOrdered, vocab-sized regardless of corpus size)."""
    rows = (
        word_counts(df, text_col)
        .orderBy(F.col("cnt").desc(), "word")
        .limit(max_vocab_words)
        .collect()
    )
    return bpe_train_from_word_counts([(r["word"], r["cnt"]) for r in rows], n_merges)


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    symbols = list(word) + [END_OF_WORD]
    while len(symbols) > 1:
        best_rank, best_i = None, -1
        for i in range(len(symbols) - 1):
            r = ranks.get((symbols[i], symbols[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        symbols[best_i : best_i + 2] = [symbols[best_i] + symbols[best_i + 1]]
    return symbols


_ENCODE_SCHEMA = StructType(
    [
        StructField("word", StringType(), False),
        StructField("tokens", ArrayType(StringType(), False), False),
        StructField("n_tokens", LongType(), False),
    ]
)


def bpe_encode_words(
    df: DataFrame, word_col: str, merges: list[tuple[str, str]]
) -> DataFrame:
    """Encode a words column with learned merges (lowest-rank adjacent
    pair first — the standard greedy order).  The rank table broadcasts
    with the closure; each Arrow batch encodes every DISTINCT word once
    and joins back through a local cache.  Output: (word, tokens,
    n_tokens)."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            words = pdf["_w"].astype(str)
            toks = []
            for w in words:
                t = cache.get(w)
                if t is None:
                    t = _encode_word(w, ranks)
                    cache[w] = t
                toks.append(t)
            yield pd.DataFrame(
                {
                    "word": words,
                    "tokens": toks,
                    "n_tokens": [len(t) for t in toks],
                }
            )

    return df.select(F.col(word_col).alias("_w")).mapInPandas(encode, _ENCODE_SCHEMA)
