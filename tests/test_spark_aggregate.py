"""End-to-end distributed MG tests against the sf0.001 testdata and the
synthetic repo table: exactness at cardinality <= k, the deterministic
error bound at cardinality > k, checkpoint resume, grouped+salted
sketches, and the sha256 ingest invariant."""

import hashlib
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from mgspark.aggregate import (
    decode_keys,
    encode_tokens,
    mg_partials,
    mg_sketch,
    mg_sketch_grouped,
    mg_topk,
    mg_tree_merge,
)
from mgspark.kernel import MGState
from mgspark.testgen import repo_table_pandas, write_repo_table
from mgspark.tokenize import content_tokens, ext_tokens, lang_tokens, sha256_invariant


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


@pytest.fixture(scope="module")
def repo_df(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("repos"))
    write_repo_table(path, n_rows=3000)
    return spark.read.parquet(os.path.join(path, "repos.parquet"))


def test_topk_exact_when_cardinality_below_k(spark, docs):
    result = {r["token"]: r["est"] for r in mg_topk(lang_tokens(docs), "token", 100).collect()}
    exact = {
        r["lang"]: r["cnt"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("cnt")).collect()
    }
    assert result == exact


def test_sketch_bound_content_tokens(spark, docs):
    k = 20
    tokens = content_tokens(docs, "text")
    encoded = encode_tokens(tokens, "token")
    state = mg_sketch(encoded, "key", k)
    exact = {
        r["key"]: r["cnt"]
        for r in encoded.groupBy("key").agg(F.count("*").alias("cnt")).collect()
    }
    total = sum(exact.values())
    assert state.n == total
    cap = total // (k + 1)
    assert state.d <= cap
    assert len(state.keys) <= k
    for key, est in zip(state.keys, state.counters):
        true = exact.get(int(key), 0)
        assert true - cap <= est <= true
    # every key with true count above the cap must survive
    survivors = set(int(key) for key in state.keys)
    for key, cnt in exact.items():
        if cnt > cap:
            assert key in survivors


def test_partials_lineage_and_tree_merge(spark, repo_df):
    tokens = encode_tokens(content_tokens(repo_df), "token")
    partials = mg_partials(tokens, "key", 16).cache()
    rows = partials.collect()
    assert len(rows) >= 1
    assert all(r["rows"] > 0 and r["wall_sec"] >= 0 for r in rows)
    assert all(len(r["keys"]) <= 16 for r in rows)
    total_rows = sum(r["rows"] for r in rows)
    assert total_rows == tokens.count()
    final = mg_tree_merge(partials, 16, fanout=2).collect()
    assert len(final) == 1
    assert final[0]["n"] == total_rows
    partials.unpersist()


def test_checkpoint_resume(spark, docs, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    tokens = encode_tokens(content_tokens(docs, "text"), "token")
    s1 = mg_sketch(tokens, "key", 10, checkpoint_dir=ckpt)
    assert os.path.exists(os.path.join(ckpt, "_SUCCESS"))
    # Second run resumes from the checkpoint (same partial set -> same result).
    s2 = mg_sketch(tokens.limit(0), "key", 10, checkpoint_dir=ckpt)
    assert s1.to_dict() == s2.to_dict()
    assert (s1.n, s1.d) == (s2.n, s2.d)


def test_checkpoint_resume_sparse_partition_ids(spark, tmp_path):
    """Checkpointed partial rows can have sparse partition ids (empty
    stage-1 partitions emit no row).  Round planning must bound rounds by
    max(partition_id)+1, not the row count, or the tree merge ends with
    multiple rows and drops partials (ADVICE r01)."""
    from mgspark.aggregate import PARTIAL_SCHEMA

    ckpt = str(tmp_path / "sparse_ckpt")
    rows = [
        (pid, [pid * 10 + 1, pid * 10 + 2], [5, 3], None, 8, 0, 8, 0.0)
        for pid in (0, 5, 13)  # sparse: count=3 but ids span 14 slots
    ]
    spark.createDataFrame(rows, PARTIAL_SCHEMA).write.mode("overwrite").parquet(ckpt)
    empty = spark.createDataFrame([], "key long")
    state = mg_sketch(empty, "key", k=16, checkpoint_dir=ckpt, fanout=2)
    # All three partials must have merged into one state.
    assert state.n == 24
    assert sorted(state.keys.tolist()) == [1, 2, 51, 52, 131, 132]


def test_mg_topk_exemplars_survive_checkpoint(spark, docs, tmp_path, monkeypatch):
    """Exemplar tokens ride the parquet checkpoint: a resumed combiner-path
    mg_topk decodes from the checkpointed partials with no input re-scan."""
    import mgspark.aggregate as agg

    ckpt = str(tmp_path / "tok_ckpt")
    langs = docs.select(F.col("lang").alias("token"))
    first = {r["token"]: r["est"] for r in agg.mg_topk(langs, "token", 64, checkpoint_dir=ckpt, pre_aggregate=True).collect()}

    def _boom(*args, **kwargs):
        raise AssertionError("resume must decode from checkpointed exemplars")

    monkeypatch.setattr(agg, "decode_keys", _boom)
    resumed = {
        r["token"]: r["est"]
        for r in agg.mg_topk(
            langs.limit(0), "token", 64, checkpoint_dir=ckpt, pre_aggregate=True
        ).collect()
    }
    assert resumed == first
    assert all(not t.isdigit() for t in resumed), "tokens must be decoded strings"


def test_grouped_sketch_salt_deterministic(spark, repo_df):
    """The salt must be a deterministic function of row content so task
    retries cannot re-salt rows (nondeterminism-with-shuffle hazard)."""
    df = repo_df.select(
        "lang", F.explode(F.split(F.col("content"), r"\s+")).alias("token")
    ).where(F.col("token") != "")
    df = encode_tokens(df, "token")
    a = {r["group"]: (r["keys"], r["counters"]) for r in mg_sketch_grouped(df, "lang", "key", 8, salt_buckets=4).collect()}
    b = {r["group"]: (r["keys"], r["counters"]) for r in mg_sketch_grouped(df, "lang", "key", 8, salt_buckets=4).collect()}
    assert a == b


def test_grouped_sketch_salted(spark, repo_df):
    k = 12
    encoded = encode_tokens(content_tokens(repo_df.select("lang", "content")), "token")
    # per-lang token sketches; recompute tokens with lang retained
    df = repo_df.select(
        "lang", F.explode(F.split(F.col("content"), r"\s+")).alias("token")
    ).where(F.col("token") != "")
    df = encode_tokens(df, "token")
    result = mg_sketch_grouped(df, "lang", "key", k, salt_buckets=4).collect()
    exact = {
        (r["lang"], r["key"]): r["cnt"]
        for r in df.groupBy("lang", "key").agg(F.count("*").alias("cnt")).collect()
    }
    totals = {}
    for (lang, _), cnt in exact.items():
        totals[lang] = totals.get(lang, 0) + cnt
    assert len(result) == len(totals)
    for row in result:
        lang = row["group"]
        assert row["n"] == totals[lang]
        cap = totals[lang] // (k + 1)
        assert row["d"] <= cap
        for key, est in zip(row["keys"], row["counters"]):
            true = exact.get((lang, int(key)), 0)
            assert true - cap <= est <= true


def test_mg_topk_combiner_decodes_from_exemplars_without_rescan(spark, docs, monkeypatch):
    """The combiner path must decode keys from exemplars carried in the
    partial rows — no decode_keys re-scan of the input (VERDICT r01 #3)."""
    import mgspark.aggregate as agg

    def _boom(*args, **kwargs):
        raise AssertionError("combiner path must not re-scan via decode_keys")

    monkeypatch.setattr(agg, "decode_keys", _boom)
    tokens = content_tokens(docs, "text")
    got = {r["token"]: r["est"] for r in agg.mg_topk(tokens, "token", 10, pre_aggregate=True).collect()}
    # cardinality > k here, so only check: tokens are real strings (decoded),
    # and every estimate is within the MG bound of the true count.
    exact = {
        r["token"]: r["cnt"]
        for r in tokens.groupBy("token").agg(F.count("*").alias("cnt")).collect()
    }
    n = sum(exact.values())
    cap = n // 11
    assert got, "sketch must release at least one key"
    for token, est in got.items():
        assert token in exact, f"exemplar {token!r} is not a real token"
        assert exact[token] - cap <= est <= exact[token]


def test_mg_topk_paths_agree_at_low_cardinality(spark, docs):
    """combiner / zero-shuffle / auto all produce the exact GROUP BY
    answer when cardinality <= k."""
    from mgspark.aggregate import mg_topk

    langs = docs.select(F.col("lang").alias("token"))
    expected = {
        r["token"]: r["cnt"]
        for r in langs.groupBy("token").agg(F.count("*").alias("cnt")).collect()
    }
    for mode in (True, False, "auto"):
        got = {r["token"]: r["est"] for r in mg_topk(langs, "token", 64, pre_aggregate=mode).collect()}
        assert got == expected, f"pre_aggregate={mode}"


def test_encode_decode_roundtrip(spark, docs):
    tokens = lang_tokens(docs)
    encoded = encode_tokens(tokens, "token")
    keys = [r["key"] for r in encoded.select("key").distinct().collect()]
    mapping = decode_keys(tokens, "token", keys)
    assert len(mapping) == len(keys)
    langs = {r["token"] for r in tokens.distinct().collect()}
    assert set(mapping.values()) == langs


def test_integral_column_passthrough_and_negatives_skipped(spark):
    df = spark.createDataFrame([(i % 5,) for i in range(100)] + [(-3,)] * 10, "v long")
    encoded = encode_tokens(df, "v")
    state = mg_sketch(encoded, "key", 10)
    # negatives skipped as invalid (pmg.py:82-83): n counts only valid rows
    assert state.n == 100
    assert state.to_dict() == {i: 20 for i in range(5)}


def test_sha256_ingest_invariant(spark, tmp_path):
    pdf = repo_table_pandas(500)
    path = str(tmp_path / "repos")
    write_repo_table(path, n_rows=500)
    df = spark.read.parquet(os.path.join(path, "repos.parquet"))
    spark_hashes = {
        r["commit"]: r["content_sha256"]
        for r in sha256_invariant(df).select("commit", "content_sha256").collect()
    }
    assert len(spark_hashes) == len(pdf)
    for commit, content in zip(pdf["commit"], pdf["content"]):
        assert spark_hashes[commit] == hashlib.sha256(content.encode()).hexdigest()


def test_repo_table_deterministic():
    a = repo_table_pandas(300)
    b = repo_table_pandas(300)
    assert a.equals(b)
    # skew: the top repo should dominate (Zipf)
    counts = a["repo"].value_counts()
    assert counts.iloc[0] > 3 * counts.iloc[len(counts) // 2]


def test_ext_tokens_view(spark, repo_df):
    toks = {r["token"] for r in ext_tokens(repo_df).distinct().collect()}
    assert toks <= {"py", "md", "rs", "js", "ts", "java", "go", "c", "h", "txt", "json", "yml"}
    assert "py" in toks


def test_mg_sketch_empty_input(spark):
    from mgspark.kernel import MGState

    empty = spark.createDataFrame([], "key long")
    state = mg_sketch(empty, "key", 5)
    assert state.to_dict() == {} and state.n == 0 and state.d == 0


def test_mg_sketch_all_invalid_keys(spark):
    df = spark.createDataFrame([(-1,), (-7,)], "key long")
    state = mg_sketch(df, "key", 5)
    assert state.to_dict() == {} and state.n == 0


def test_salt_buckets_auto_sizes_to_skew(spark):
    """salt_buckets='auto': a dominant group gets spread over ~parallelism
    buckets; balanced groups keep the small default."""
    from mgspark.aggregate import _salt_probe

    skewed = spark.createDataFrame(
        [("big" if i % 10 else "small", i) for i in range(5000)], "g string, key long"
    )
    balanced = spark.createDataFrame(
        [(f"g{i % 50}", i) for i in range(5000)], "g string, key long"
    )
    assert _salt_probe(skewed, "g") > 8 or spark.sparkContext.defaultParallelism <= 8
    assert _salt_probe(balanced, "g") == 8
    # and the grouped sketch still produces exact results under 'auto'
    from mgspark.aggregate import mg_sketch_grouped

    result = mg_sketch_grouped(skewed, "g", "key", k=6000, salt_buckets="auto").collect()
    got = {r["group"]: r["n"] for r in result}
    assert got == {"big": 4500, "small": 500}


def test_mg_topk_combiner_resume_from_tokenless_checkpoint(spark, docs, tmp_path):
    """A checkpoint written by the zero-shuffle path carries no exemplar
    tokens; a combiner-path resume must still decode real tokens (via the
    broadcast-decode fallback), never stringified hash keys."""
    from mgspark.aggregate import mg_topk

    ckpt = str(tmp_path / "cross_ckpt")
    langs = docs.select(F.col("lang").alias("token"))
    first = {r["token"]: r["est"] for r in mg_topk(langs, "token", 64, checkpoint_dir=ckpt, pre_aggregate=False).collect()}
    resumed = {
        r["token"]: r["est"]
        for r in mg_topk(langs, "token", 64, checkpoint_dir=ckpt, pre_aggregate=True).collect()
    }
    assert resumed == first
    assert all(not t.isdigit() for t in resumed), "must not emit hash-key strings"
