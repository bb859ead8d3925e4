"""BM25 retrieval (pipeline/retrieval.py) vs a sequential reference,
rational-mode oracle parity, tie-breaks, edges, and the plan pin."""

import math

import duckdb
import pytest

from mgspark.pipeline.retrieval import (
    bm25_build,
    bm25_oracle_sql,
    bm25_topk,
    bm25_topk_cached,
    bm25_topk_indexed,
)

DOCS = [
    (0, "merge sort merge join merge"),
    (1, "window scan window"),
    (2, "merge window scan scan scan"),
    (3, "the quick brown fox"),
    (4, ""),
    (5, "merge merge merge merge merge merge"),
    (6, "scan"),
]


def _seq_bm25(docs, terms, k1=1.2, b=0.75, idf="lucene"):
    toks = {i: [t for t in txt.split(" ") if t] for i, txt in docs}
    n = len(toks)
    total = sum(len(v) for v in toks.values())
    avgdl = float(total) / float(n) if total > 0 else 1.0
    out = {}
    for i, tk in toks.items():
        s = 0.0
        for term in terms:
            tf = float(tk.count(term))
            dfi = sum(1 for v in toks.values() if term in v)
            ratio = (float(n) - float(dfi) + 0.5) / (float(dfi) + 0.5)
            w = math.log1p(ratio) if idf == "lucene" else ratio
            s += w * (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * len(tk) / avgdl))
        out[i] = s
    return out


def _mk(spark, docs=DOCS):
    return spark.createDataFrame(docs, "doc_id long, text string")


def test_lucene_scores_match_sequential_reference(spark):
    df = _mk(spark)
    got = bm25_topk(df, "text", "doc_id", ["merge", "scan"], k=10).collect()
    ref = _seq_bm25(DOCS, ["merge", "scan"])
    assert len(got) == 7
    for r in got:
        assert r["score"] == pytest.approx(ref[r["id"]], abs=1e-12)
    # descending score, id tie-break
    keys = [(-r["score"], r["id"]) for r in got]
    assert keys == sorted(keys)


def test_rational_mode_matches_duckdb_oracle_bitwise(spark):
    df = _mk(spark)
    got = bm25_topk(
        df, "text", "doc_id", ["merge", "window", "scan"], k=5, idf="rational"
    ).collect()
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM (VALUES %s) t(doc_id, text)"
        % ", ".join("(%d, '%s')" % (i, s) for i, s in DOCS)
    )
    oracle = con.execute(
        bm25_oracle_sql("docs", "text", "doc_id", ["merge", "window", "scan"], k=5)
    ).fetchall()
    assert [(r["id"], r["score"]) for r in got] == oracle  # bit-for-bit


def test_duplicate_query_terms_counted_once(spark):
    df = _mk(spark)
    once = bm25_topk(df, "text", "doc_id", ["merge"], k=3).collect()
    dup = bm25_topk(df, "text", "doc_id", ["merge", "merge"], k=3).collect()
    assert [(r["id"], r["score"]) for r in once] == [(r["id"], r["score"]) for r in dup]


def test_limit_and_tiebreak(spark):
    # identical docs -> identical scores -> ascending-id order decides k
    df = _mk(spark, [(i, "merge scan") for i in range(6)])
    got = bm25_topk(df, "text", "doc_id", ["merge"], k=3).collect()
    assert [r["id"] for r in got] == [0, 1, 2]


def test_empty_corpus_and_bad_args(spark):
    df = _mk(spark, []) if False else spark.createDataFrame([], "doc_id long, text string")
    assert bm25_topk(df, "text", "doc_id", ["x"]).count() == 0
    with pytest.raises(ValueError):
        bm25_topk(df, "text", "doc_id", [])
    with pytest.raises(ValueError):
        bm25_topk(df, "text", "doc_id", ["x"], idf="nope")


def test_plan_has_no_python_node_and_takeordered(spark):
    df = _mk(spark)
    top = bm25_topk(df, "text", "doc_id", ["merge", "scan"], k=3)
    plan = top._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, marker
    assert "TakeOrderedAndProject" in plan  # heap top-k, not a global sort


def test_indexed_scores_bit_identical_to_cold_path(spark):
    # the warm path pivots tf back out of the postings and replays the
    # identical IEEE expression in the identical order -> exact equality
    df = _mk(spark)
    index = bm25_build(df, "text", "doc_id")
    for terms in (["merge"], ["merge", "scan"], ["merge", "window", "scan"]):
        for idf in ("lucene", "rational"):
            cold = [(r["id"], r["score"]) for r in
                    bm25_topk(df, "text", "doc_id", terms, k=7, idf=idf).collect()]
            warm = [(r["id"], r["score"]) for r in
                    bm25_topk_indexed(index, terms, k=7, idf=idf).collect()]
            assert cold == warm, (terms, idf)
    index.unpersist()


def test_indexed_zero_fill_when_few_matches(spark):
    # only one doc contains 'fox'; the k=3 result fills with the two
    # lowest-id non-matching docs at exactly 0.0, same as the cold path
    df = _mk(spark)
    index = bm25_build(df, "text", "doc_id")
    cold = [(r["id"], r["score"]) for r in
            bm25_topk(df, "text", "doc_id", ["fox"], k=3).collect()]
    warm = [(r["id"], r["score"]) for r in
            bm25_topk_indexed(index, ["fox"], k=3).collect()]
    assert cold == warm
    assert warm[0][0] == 3 and warm[0][1] > 0.0
    assert [w[1] for w in warm[1:]] == [0.0, 0.0]
    index.unpersist()


def test_indexed_query_never_rescans_corpus(spark, tmp_path):
    # build the index, then DELETE the source files: a second (and any
    # further) query must still answer -- proof that nothing in the warm
    # path re-reads the text column
    import shutil

    path = str(tmp_path / "corpus")
    _mk(spark).write.parquet(path)
    df = spark.read.parquet(path)
    index = bm25_build(df, "text", "doc_id")
    first = bm25_topk_indexed(index, ["merge"], k=3).collect()
    shutil.rmtree(path)
    second = bm25_topk_indexed(index, ["merge", "scan"], k=5).collect()
    third = bm25_topk_indexed(index, ["window"], k=2).collect()
    assert len(first) == 3 and len(second) == 5 and len(third) == 2
    index.unpersist()


def test_cached_index_reused_across_calls(spark):
    from mgspark.pipeline.similarity import _INDEX_CACHE, clear_index_cache

    clear_index_cache()
    df = _mk(spark)
    a = bm25_topk_cached(df, "text", "doc_id", ["merge"], k=3).collect()
    assert sum(1 for key in _INDEX_CACHE if key[0] == "bm25") == 1
    b = bm25_topk_cached(df, "text", "doc_id", ["scan", "window"], k=3).collect()
    assert sum(1 for key in _INDEX_CACHE if key[0] == "bm25") == 1  # reused
    cold_b = bm25_topk(df, "text", "doc_id", ["scan", "window"], k=3).collect()
    assert [(r["id"], r["score"]) for r in b] == [(r["id"], r["score"]) for r in cold_b]
    assert len(a) == 3
    clear_index_cache()


def test_indexed_empty_corpus_and_bad_args(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    index = bm25_build(empty, "text", "doc_id")
    assert index.n == 0
    assert bm25_topk_indexed(index, ["x"], k=3).count() == 0
    with pytest.raises(ValueError):
        bm25_topk_indexed(index, [])
    with pytest.raises(ValueError):
        bm25_topk_indexed(index, ["x"], idf="nope")
    index.unpersist()
