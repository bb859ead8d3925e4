"""BM25 retrieval (pipeline/retrieval.py) vs a sequential reference,
rational-mode oracle parity, tie-breaks, edges, and the plan pin."""

import math

import duckdb
import pytest

from mgspark.pipeline.retrieval import bm25_oracle_sql, bm25_topk

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
