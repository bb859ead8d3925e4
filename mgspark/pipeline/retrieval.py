"""BM25 retrieval over a document corpus.

Training-data pipelines use lexical retrieval constantly — fetching the
corpus documents most relevant to an eval prompt (retrieval-based
decontamination, the complement of ``pipeline/decontam``'s n-gram
overlap), mining topical subsets for mixture construction, and spot-
checking near-dup candidates.  This is Robertson/Spärck Jones BM25
(probabilistic relevance, the TREC/Okapi formulation Lucene implements)
expressed with the scale shape Spark wants:

- per-document term frequencies for the (few) query terms are pure-JVM
  array expressions (``filter`` + ``size`` over the whitespace token
  array) — a zero-shuffle projection, NOT an explode + join against a
  term table, because the query is tiny while the corpus is not;
- corpus statistics (N, total length, per-term document frequency) are
  ONE combiner aggregation returning q+2 numbers;
- the projection is persisted once, so scoring re-reads q+2 small
  columns instead of re-scanning text — one corpus scan total;
- the top-k is ``orderBy(score desc, id).limit(k)`` — TakeOrdered, a
  per-partition heap + driver merge, never a global sort.

Two IDF modes:

- ``idf="lucene"`` (default): ``ln(1 + (N - df + 0.5) / (df + 0.5))`` —
  the standard non-negative Lucene/BM25+ weight.  Involves a
  transcendental, so cross-engine bit-equality is not guaranteed.
- ``idf="rational"``: ``(N - df + 0.5) / (df + 0.5)`` — the same
  quantity without the log.  Every operation is IEEE +,*,/ on
  integer-derived doubles, so an oracle engine replaying the identical
  expression order reproduces the scores BIT-FOR-BIT (the same argument
  as pipeline/clustering.py's unrolled-Lloyd oracle).  The log is
  monotone, so single-term rankings agree with ``lucene``; multi-term
  rankings weight rare terms more steeply.  Used by the driver oracle
  row.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "bm25_topk",
    "bm25_oracle_sql",
    "BM25Index",
    "bm25_build",
    "bm25_topk_indexed",
    "bm25_topk_cached",
]


def _dedupe(terms: list[str]) -> list[str]:
    seen: set[str] = set()
    out = []
    for t in terms:
        if t not in seen:
            seen.add(t)
            out.append(t)
    return out


def _eq_lit(term: str):
    # A single-arg closure: F.filter inspects the lambda's arity, so a
    # two-parameter `lambda t, term=term:` would be called as
    # (element, index) and bind `term` to the index column.
    lit = F.lit(term)
    return lambda t: t == lit


def _tok_expr(text_col: str):
    # Whitespace tokens, empties dropped — matches textstats.token_stats
    # and the DuckDB `list_filter(string_split(text, ' '), x -> x <> '')`
    # convention used by every text oracle in the contract.
    return F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
        lambda t: t != "",
    )


def bm25_topk(
    df: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    idf: str = "lucene",
) -> DataFrame:
    """Top-``k`` documents by BM25 relevance to ``query_terms``.

    Returns (id, score), score descending, ties broken by ascending id.
    One corpus scan (persisted projection), one q+2-value combiner
    aggregation, TakeOrdered release — no join, no explode, no Python.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if idf not in ("lucene", "rational"):
        raise ValueError(f"idf must be 'lucene' or 'rational', got {idf!r}")
    terms = _dedupe([str(t) for t in query_terms])

    from mgspark.cacheutil import transient_persist

    # Materialize the token array once per row: higher-order functions
    # are not common-subexpression-eliminated, so referencing the
    # tokenization expression from dl + every per-term filter re-ran the
    # split q+1 times per document (see
    # textstats.word_ngrams_from_tokens_expr for the same pattern).
    proj = df.select(
        F.col(id_col).alias("id"), _tok_expr(text_col).alias("_toks")
    ).select(
        "id",
        F.size("_toks").alias("dl"),
        *[
            F.size(F.filter(F.col("_toks"), _eq_lit(term))).alias(f"tf{i}")
            for i, term in enumerate(terms)
        ],
    )
    proj = transient_persist(proj)
    stats = proj.agg(
        F.count("*").alias("n"),
        F.coalesce(F.sum("dl"), F.lit(0)).alias("total_dl"),
        *[
            F.coalesce(
                F.sum((F.col(f"tf{i}") > 0).cast("long")), F.lit(0)
            ).alias(f"df{i}")
            for i in range(len(terms))
        ],
    ).first()
    n = int(stats["n"])
    if n == 0:
        return proj.select(
            F.col("id"), F.lit(0.0).alias("score")
        ).where(F.lit(False))
    total_dl = int(stats["total_dl"])
    # Exact integer->double conversions; avgdl is one IEEE division, so
    # an oracle recomputing total_dl / n gets the identical double.
    avgdl = float(total_dl) / float(n) if total_dl > 0 else 1.0

    score = None
    for i in range(len(terms)):
        dfi = int(stats[f"df{i}"])
        ratio = (float(n) - float(dfi) + 0.5) / (float(dfi) + 0.5)
        w = math.log1p(ratio) if idf == "lucene" else ratio
        tf = F.col(f"tf{i}").cast("double")
        # Denominator order pinned left-to-right: tf + k1*((1-b) + b*dl/avgdl)
        denom = tf + F.lit(float(k1)) * (
            F.lit(1.0 - float(b))
            + F.lit(float(b)) * F.col("dl").cast("double") / F.lit(avgdl)
        )
        contrib = F.lit(float(w)) * (tf * F.lit(float(k1) + 1.0)) / denom
        score = contrib if score is None else score + contrib

    return (
        proj.select("id", score.alias("score"))
        .orderBy(F.col("score").desc(), F.col("id").asc())
        .limit(k)
    )


@dataclass
class BM25Index:
    """Prebuilt BM25 state: repeated queries never rescan the corpus.

    ``postings`` (term, id, tf, dl) and ``docs`` (id, dl) are persisted
    and materialized at build time; ``n``/``total_dl`` are the corpus
    scalars.  dl is denormalized into the postings so a query needs NO
    join back to the docs table — ``docs`` exists only for the zero-
    score fill when fewer than k documents match any query term.
    """

    postings: DataFrame
    docs: DataFrame
    n: int
    total_dl: int

    def unpersist(self) -> None:
        for rel in (self.postings, self.docs):
            try:
                rel.unpersist()
            except Exception:
                pass


def bm25_build(df: DataFrame, text_col: str, id_col: str) -> BM25Index:
    """Build the inverted index: two corpus scans at build time (one for
    the postings, one for the per-document lengths), zero afterwards —
    every subsequent :func:`bm25_topk_indexed` query reads only the
    persisted postings/docs relations, never the text column.

    Postings are ``groupBy(term, id)`` counts — combiner-aggregated, the
    exchange carries (term, id, tf) not raw text.  Both relations
    materialize eagerly so the query path cannot silently fall back to
    a lineage recompute of the corpus scan.  They persist DIRECTLY (not
    via ``transient_persist``): the index outlives the FIFO transient
    window — eviction there would silently reintroduce the corpus
    rescan (or crash on rotated source files) for an index still served
    by the plan-hash cache.  Same rule as the LSH/IVF index builds;
    drop the index with ``index.postings.unpersist()`` /
    ``index.docs.unpersist()`` or ``clear_index_cache()``.
    """
    from pyspark import StorageLevel

    toks = _tok_expr(text_col)
    docs = df.select(
        F.col(id_col).alias("id"), F.size(toks).alias("dl")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    postings = (
        df.select(F.col(id_col).alias("id"), F.size(toks).alias("dl"),
                  F.explode(toks).alias("term"))
        .groupBy("term", "id")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # ONE build job: the corpus-scalar aggregate crossJoined with a
    # 1-row postings count materializes BOTH persisted relations (their
    # cold caches fill while the aggregates scan them) and returns the
    # scalars — previously a postings.count() wave then a docs
    # aggregate wave.
    stats = (
        docs.agg(
            F.count("*").alias("n"),
            F.coalesce(F.sum("dl"), F.lit(0)).alias("total_dl"),
        )
        .crossJoin(postings.agg(F.count(F.lit(1)).alias("_np")))
        .first()
    )
    return BM25Index(
        postings=postings,
        docs=docs,
        n=int(stats["n"]),
        total_dl=int(stats["total_dl"]),
    )


def bm25_topk_indexed(
    index: BM25Index,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    idf: str = "lucene",
) -> DataFrame:
    """Top-``k`` by BM25 against a prebuilt :class:`BM25Index` —
    bit-identical scores to :func:`bm25_topk` (the per-term tf columns
    are pivoted back out of the postings and fed through the IDENTICAL
    expression in the identical order), zero corpus scans.

    Plan: postings filtered to the q query terms (tiny isin filter) →
    one small groupBy(term) for the document frequencies → one
    pivot-by-term groupBy(id) for the matching documents' tf vector →
    TakeOrdered top-k; documents matching no term score exactly 0.0 and
    fill the tail (lowest id first) only when fewer than k match.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if idf not in ("lucene", "rational"):
        raise ValueError(f"idf must be 'lucene' or 'rational', got {idf!r}")
    terms = _dedupe([str(t) for t in query_terms])
    n = index.n
    if n == 0:
        return index.docs.select(
            F.col("id"), F.lit(0.0).alias("score")
        ).where(F.lit(False))
    avgdl = float(index.total_dl) / float(n) if index.total_dl > 0 else 1.0

    hits = index.postings.where(F.col("term").isin(terms))
    # one combiner aggregate pivots the (few) query terms into per-term
    # tf columns and carries dl along — no join back to the docs table
    matched = hits.groupBy("id").agg(
        F.first("dl").alias("dl"),
        *[
            F.coalesce(
                F.sum(F.when(F.col("term") == t, F.col("tf"))), F.lit(0)
            ).alias(f"tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    if idf == "rational":
        # Rational IDF is pure IEEE arithmetic (no transcendental), so
        # the per-term document frequencies can stay IN the plan as a
        # broadcast 1-row crossJoin — the same (n - df + 0.5)/(df + 0.5)
        # AST evaluates bit-identically whether df arrives as a column
        # or a collected Python literal, and the separate dfs collect
        # job disappears.  The lucene path keeps the collect: log1p in
        # the JVM vs Python's math.log1p is not guaranteed ulp-identical
        # and the scores are hash-compared.
        dfs_row = F.broadcast(
            hits.groupBy().agg(
                *[
                    F.coalesce(
                        F.sum(F.when(F.col("term") == t, 1)), F.lit(0)
                    )
                    .cast("double")
                    .alias(f"df{i}")
                    for i, t in enumerate(terms)
                ]
            )
        )
        matched = matched.crossJoin(dfs_row)
        w_cols = {
            i: (F.lit(float(n)) - F.col(f"df{i}") + F.lit(0.5))
            / (F.col(f"df{i}") + F.lit(0.5))
            for i in range(len(terms))
        }
    else:
        dfs = {r["term"]: int(r["n_df"]) for r in
               hits.groupBy("term").agg(F.count(F.lit(1)).alias("n_df")).collect()}
        w_cols = {}
        for i, t in enumerate(terms):
            dfi = dfs.get(t, 0)
            ratio = (float(n) - float(dfi) + 0.5) / (float(dfi) + 0.5)
            w_cols[i] = F.lit(float(math.log1p(ratio)))

    score = None
    for i, t in enumerate(terms):
        tf = F.col(f"tf{i}").cast("double")
        denom = tf + F.lit(float(k1)) * (
            F.lit(1.0 - float(b))
            + F.lit(float(b)) * F.col("dl").cast("double") / F.lit(avgdl)
        )
        contrib = w_cols[i] * (tf * F.lit(float(k1) + 1.0)) / denom
        score = contrib if score is None else score + contrib

    top = (
        matched.select("id", score.alias("score"))
        .orderBy(F.col("score").desc(), F.col("id").asc())
        .limit(k)
    )
    # zero-score fill: matching docs score strictly > 0, so the fill can
    # only surface when fewer than k documents match any term
    fill = (
        index.docs.join(matched.select("id"), "id", "left_anti")
        .orderBy(F.col("id").asc())
        .limit(k)
        .select("id", F.lit(0.0).alias("score"))
    )
    return (
        top.unionByName(fill)
        .orderBy(F.col("score").desc(), F.col("id").asc())
        .limit(k)
    )


def bm25_topk_cached(
    df: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    idf: str = "lucene",
) -> DataFrame:
    """:func:`bm25_topk` semantics with a session-cached index: the
    first call on a logical input builds (and persists) the inverted
    index, repeated calls — ANY query terms — skip the corpus scan
    entirely.  Shares the plan-hash cache (and its eviction) with
    lsh_build/ivf_build."""
    from mgspark.pipeline.similarity import _index_cache_get

    index = _index_cache_get(
        "bm25",
        df,
        (text_col, id_col),
        lambda: bm25_build(df, text_col, id_col),
    )
    return bm25_topk_indexed(index, query_terms, k=k, k1=k1, b=b, idf=idf)


def bm25_oracle_sql(
    table: str,
    text_col: str,
    id_col: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """ANSI/DuckDB SQL replaying :func:`bm25_topk` with ``idf="rational"``
    in the identical IEEE operation order, so the scores hash-match
    bit-for-bit.  Float literals are emitted with ``repr`` of the exact
    Python doubles the Spark path uses."""
    terms = _dedupe([str(t) for t in query_terms])
    tf_cols = ", ".join(
        "len(list_filter(string_split(coalesce(%s, ''), ' '), x -> x = '%s')) AS tf%d"
        % (text_col, t.replace("'", "''"), i)
        for i, t in enumerate(terms)
    )
    df_cols = ", ".join(
        f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END)::BIGINT AS df{i}"
        for i in range(len(terms))
    )
    k1p1, omb, bl, k1l = repr(float(k1) + 1.0), repr(1.0 - float(b)), repr(float(b)), repr(float(k1))
    contribs = " + ".join(
        f"(((n::DOUBLE - df{i}::DOUBLE + 0.5) / (df{i}::DOUBLE + 0.5)) * "
        f"(tf{i}::DOUBLE * {k1p1}) / "
        f"(tf{i}::DOUBLE + {k1l} * ({omb} + {bl} * dl::DOUBLE / avgdl)))"
        for i in range(len(terms))
    )
    return (
        f"WITH proj AS (SELECT {id_col} AS id, "
        f"len(list_filter(string_split(coalesce({text_col}, ''), ' '), x -> x <> '')) AS dl, "
        f"{tf_cols} FROM {table}), "
        f"stats AS (SELECT count(*)::BIGINT AS n, "
        f"coalesce(sum(dl), 0)::BIGINT AS total_dl, {df_cols} FROM proj), "
        # avgdl mirrors the Spark driver: total_dl/n when total_dl > 0 else 1.0
        f"s2 AS (SELECT *, CASE WHEN total_dl > 0 THEN total_dl::DOUBLE / n::DOUBLE "
        f"ELSE 1.0 END AS avgdl FROM stats) "
        f"SELECT id, ({contribs}) AS score FROM proj, s2 "
        f"ORDER BY score DESC, id ASC LIMIT {int(k)}"
    )
