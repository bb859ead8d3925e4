"""Rolling-corpus maintenance operators: incremental dedup (exact +
MinHash batch-vs-corpus), snapshot delta reports, and SemDeDup-style
semantic dedup.  Hand-built truths — no reference parity (the reference
has no corpus-maintenance surface; these extend SURVEY §2's pipeline
family the same way dedup/similarity do)."""

import pytest

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# dedup_incremental (exact, batch vs corpus)
# ---------------------------------------------------------------------------


def test_dedup_incremental_truth(spark):
    from mgspark.pipeline.dedup import dedup_incremental

    corpus = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (10, "alpha"),   # already in corpus -> dropped
            (11, "delta"),   # fresh
            (12, "delta"),   # within-batch dup of 11 -> dropped (min id wins)
            (13, "epsilon"), # fresh
            (14, "beta"),    # already in corpus -> dropped
        ],
        "id long, text string",
    )
    kept = sorted(
        r["id"] for r in dedup_incremental(batch, corpus, "text", "id").collect()
    )
    assert kept == [11, 13]


def test_dedup_incremental_empty_corpus_equals_dedup_exact(spark):
    from mgspark.pipeline.dedup import dedup_exact, dedup_incremental

    batch = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "id long, text string"
    )
    empty = spark.createDataFrame([], "id long, text string")
    inc = {r["id"] for r in dedup_incremental(batch, empty, "text", "id").collect()}
    ex = {r["id"] for r in dedup_exact(batch, "text", "id").collect()}
    assert inc == ex == {1, 3}


def test_dedup_incremental_all_duplicate_batch(spark):
    from mgspark.pipeline.dedup import dedup_incremental

    corpus = spark.createDataFrame([(1, "x")], "id long, text string")
    batch = spark.createDataFrame([(9, "x"), (10, "x")], "id long, text string")
    assert dedup_incremental(batch, corpus, "text", "id").count() == 0


# ---------------------------------------------------------------------------
# minhash_incremental_pairs (near, batch vs corpus)
# ---------------------------------------------------------------------------


def _sentences(tag, n=6):
    base = (
        "the quick brown fox jumps over the lazy dog while the band "
        "plays on and the crowd cheers loudly in the warm summer rain "
    )
    return base * n + tag


def test_minhash_incremental_cross_pairs_only(spark):
    from mgspark.pipeline.dedup import minhash_incremental_pairs

    # Corpus holds two near-identical docs (1, 2); the batch holds a copy
    # of doc 1 plus an unrelated doc.  Released pairs must all be
    # (batch_id, corpus_id) — the within-corpus near-dup (1, 2) must NOT
    # appear.
    corpus = spark.createDataFrame(
        [(1, _sentences("v1")), (2, _sentences("v2"))],
        "id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (100, _sentences("v1")),  # identical to corpus doc 1
            (101, "completely different tiny text"),
        ],
        "id long, text string",
    )
    pairs = minhash_incremental_pairs(
        batch, corpus, "text", "id", threshold=0.8
    ).collect()
    assert all(r["batch_id"] >= 100 and r["corpus_id"] < 100 for r in pairs)
    exact = [r for r in pairs if r["batch_id"] == 100 and r["corpus_id"] == 1]
    assert len(exact) == 1 and exact[0]["est_jaccard"] == 1.0
    assert not any(r["batch_id"] == 101 for r in pairs)


def test_minhash_incremental_identical_docs_always_found(spark):
    from mgspark.pipeline.dedup import minhash_incremental_pairs

    # Identical text -> identical shingle set -> identical signature ->
    # collision in EVERY band: recall of exact cross-side duplicates is
    # 1 by construction (not probabilistic), as long as the bucket cap
    # does not drop the bucket.
    texts = [_sentences(f"doc{i}") for i in range(5)]
    corpus = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    batch = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    got = {
        (r["batch_id"], r["corpus_id"])
        for r in minhash_incremental_pairs(
            batch, corpus, "text", "id", threshold=0.99
        ).collect()
    }
    assert {(100 + i, i) for i in range(5)} <= got


def test_minhash_incremental_precomputed_signatures_match_oneshot(spark):
    from mgspark.pipeline.dedup import minhash_incremental_pairs, minhash_signatures

    # The daily loop passes the persisted signature table instead of raw
    # corpus text; results must be identical to the one-shot mode (same
    # seeded hash family on both paths).
    corpus = spark.createDataFrame(
        [(1, _sentences("v1")), (2, _sentences("v2"))], "id long, text string"
    )
    batch = spark.createDataFrame(
        [(100, _sentences("v1")), (101, "tiny unrelated")], "id long, text string"
    )
    oneshot = {
        (r["batch_id"], r["corpus_id"], r["est_jaccard"])
        for r in minhash_incremental_pairs(
            batch, corpus, "text", "id", threshold=0.8
        ).collect()
    }
    sig = minhash_signatures(corpus, "text", "id")
    incr = {
        (r["batch_id"], r["corpus_id"], r["est_jaccard"])
        for r in minhash_incremental_pairs(
            batch, None, "text", "id", threshold=0.8, corpus_sig=sig
        ).collect()
    }
    assert oneshot == incr and len(incr) >= 1


def test_minhash_incremental_corpus_text_never_read_with_signatures(spark):
    from pyspark.sql import functions as F

    from mgspark.pipeline.dedup import minhash_incremental_pairs, minhash_signatures

    # Poison the corpus text column: with a precomputed signature table
    # the operator must never evaluate it (the whole point of the
    # incremental mode is skipping the corpus re-sign).
    corpus = spark.createDataFrame([(1, _sentences("v1"))], "id long, text string")
    sig = minhash_signatures(corpus, "text", "id")
    sig = spark.createDataFrame(sig.collect(), sig.schema)  # detach lineage
    poisoned = corpus.withColumn(
        "text",
        F.when(F.length("text") >= 0, F.raise_error(F.lit("corpus text was read")))
        .otherwise(F.lit(""))
        .cast("string"),
    )
    batch = spark.createDataFrame([(100, _sentences("v1"))], "id long, text string")
    pairs = minhash_incremental_pairs(
        batch, poisoned, "text", "id", threshold=0.8, corpus_sig=sig
    ).collect()
    assert {(r["batch_id"], r["corpus_id"]) for r in pairs} == {(100, 1)}


def test_minhash_incremental_requires_a_corpus_side(spark):
    import pytest

    from mgspark.pipeline.dedup import minhash_incremental_pairs

    batch = spark.createDataFrame([(1, "x")], "id long, text string")
    with pytest.raises(ValueError, match="corpus"):
        minhash_incremental_pairs(batch, None, "text", "id")
    bad_sig = spark.createDataFrame([(1, "x")], "id long, nope string")
    with pytest.raises(ValueError, match="sig"):
        minhash_incremental_pairs(batch, None, "text", "id", corpus_sig=bad_sig)


def test_minhash_incremental_rejects_mismatched_signature_length(spark):
    import pytest

    from mgspark.pipeline.dedup import minhash_incremental_pairs, minhash_signatures

    # A signature table built with a DIFFERENT num_hashes must be
    # rejected loudly: the wrong band geometry + null zip_with estimates
    # would otherwise silently miss every cross-side near-duplicate.
    corpus = spark.createDataFrame([(1, _sentences("v1"))], "id long, text string")
    sig64 = minhash_signatures(corpus, "text", "id", num_hashes=64)
    batch = spark.createDataFrame([(100, _sentences("v1"))], "id long, text string")
    with pytest.raises(ValueError, match=r"length\(s\) \[64, 64\].*num_hashes=128"):
        minhash_incremental_pairs(batch, None, "text", "id", corpus_sig=sig64)


def test_minhash_incremental_rejects_mixed_build_signature_table(spark):
    """VERDICT r5 #3: the geometry check covers EVERY row (min==max==
    num_hashes over the whole table), so a mixed-build table whose
    FIRST row happens to have the right length still raises instead of
    silently nulling the bad rows' estimates."""
    import pytest

    from pyspark.sql import functions as F

    from mgspark.pipeline.dedup import minhash_incremental_pairs, minhash_signatures

    corpus = spark.createDataFrame(
        [(1, _sentences("v1")), (2, _sentences("v2"))], "id long, text string"
    )
    good = minhash_signatures(corpus, "text", "id", num_hashes=128)
    # corrupt ONE row: truncate its signature to 64 values
    mixed = good.withColumn(
        "sig", F.when(F.col("id") == 2, F.slice("sig", 1, 64)).otherwise(F.col("sig"))
    )
    batch = spark.createDataFrame([(100, _sentences("v1"))], "id long, text string")
    with pytest.raises(ValueError, match=r"length\(s\) \[64, 128\]"):
        minhash_incremental_pairs(batch, None, "text", "id", corpus_sig=mixed)


def test_minhash_incremental_hot_bucket_cap(spark):
    from mgspark.pipeline.dedup import minhash_incremental_pairs

    # 50 identical corpus docs, one matching batch doc, cap 8: the
    # corpus bucket (size 50) is dropped, so nothing is released —
    # boilerplate cannot multiply batch rows.
    t = _sentences("boiler")
    corpus = spark.createDataFrame(
        [(i, t) for i in range(50)], "id long, text string"
    )
    batch = spark.createDataFrame([(100, t)], "id long, text string")
    pairs = minhash_incremental_pairs(
        batch, corpus, "text", "id", threshold=0.8, max_bucket=8
    )
    assert pairs.count() == 0


# ---------------------------------------------------------------------------
# corpus_delta (snapshot diff)
# ---------------------------------------------------------------------------


def test_corpus_delta_truth(spark):
    from mgspark.pipeline.profile import corpus_delta

    old = spark.createDataFrame(
        [
            (1, "web", "a"),
            (2, "web", "b"),
            (3, "web", "b"),   # duplicate content -> one distinct entry
            (4, "books", "c"),
        ],
        "id long, source string, text string",
    )
    new = spark.createDataFrame(
        [
            (10, "web", "a"),      # unchanged
            (11, "web", "z"),      # added
            (12, "books", "d"),    # added (c removed)
            (13, "news", "n"),     # whole new group
        ],
        "id long, source string, text string",
    )
    rows = {
        r["source"]: (r["added"], r["removed"], r["unchanged"])
        for r in corpus_delta(old, new, "text", "source").collect()
    }
    assert rows == {
        "web": (1, 1, 1),
        "books": (1, 1, 0),
        "news": (1, 0, 0),
    }


def test_corpus_delta_null_group_and_null_text_unchanged(spark):
    from mgspark.pipeline.profile import corpus_delta

    old = spark.createDataFrame(
        [(1, None, "a"), (2, "web", None)], "id long, source string, text string"
    )
    new = spark.createDataFrame(
        [(3, None, "a"), (4, "web", None)], "id long, source string, text string"
    )
    rows = {
        r["source"]: (r["added"], r["removed"], r["unchanged"])
        for r in corpus_delta(old, new, "text", "source").collect()
    }
    # Null group and null content must match null-safely: both rows are
    # UNCHANGED, not an added+removed pair.
    assert rows == {None: (0, 0, 1), "web": (0, 0, 1)}


# ---------------------------------------------------------------------------
# semantic dedup (SemDeDup: k-means clusters bound the pair space)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def clustered_emb(spark, tmp_path_factory):
    from mgspark.testgen import write_clustered_embeddings_parquet

    path = str(tmp_path_factory.mktemp("semdedup") / "emb.parquet")
    write_clustered_embeddings_parquet(path)
    return spark.read.parquet(path)


def test_semantic_dedup_subset_and_recall_on_clustered(spark, clustered_emb):
    from mgspark.pipeline.similarity import (
        embedding_near_dup_pairs,
        semantic_dedup_pairs,
    )

    sem = {
        (r["id_a"], r["id_b"])
        for r in semantic_dedup_pairs(
            clustered_emb, "embedding", "vec_id", threshold=0.99, n_clusters=8
        ).collect()
    }
    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(
            clustered_emb, "embedding", "vec_id", threshold=0.99, method="exact"
        ).collect()
    }
    assert len(exact) > 0
    # precision is exact by construction (every candidate verified);
    # recall is complete on this fixture: near-identical pairs always
    # assign to the same nearest centroid.
    assert sem == exact


def test_semantic_single_cluster_equals_exact(spark, clustered_emb):
    from mgspark.pipeline.similarity import (
        embedding_near_dup_pairs,
        semantic_dedup_pairs,
    )

    sem = {
        (r["id_a"], r["id_b"])
        for r in semantic_dedup_pairs(
            clustered_emb, "embedding", "vec_id", threshold=0.9, n_clusters=1
        ).collect()
    }
    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(
            clustered_emb, "embedding", "vec_id", threshold=0.9, method="exact"
        ).collect()
    }
    assert sem == exact


def test_semantic_dedup_keeps_min_id_per_cluster(spark, clustered_emb):
    from mgspark.pipeline.similarity import semantic_dedup, semantic_dedup_pairs

    pairs = semantic_dedup_pairs(
        clustered_emb, "embedding", "vec_id", threshold=0.99, n_clusters=8
    ).collect()
    dropped = {max(r["id_a"], r["id_b"]) for r in pairs}
    kept = {
        r["vec_id"]
        for r in semantic_dedup(
            clustered_emb, "embedding", "vec_id", threshold=0.99, n_clusters=8
        ).collect()
    }
    total = {r["vec_id"] for r in clustered_emb.select("vec_id").collect()}
    assert kept <= total
    # every pair loses at least its max id; singletons all survive
    assert not (dropped & kept) or all(
        any(p["id_a"] == d or p["id_b"] == d for p in pairs) for d in dropped
    )
    assert (total - {i for r in pairs for i in (r["id_a"], r["id_b"])}) <= kept


def test_semantic_dedup_empty_corpus(spark):
    from mgspark.pipeline.similarity import semantic_dedup_pairs

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert semantic_dedup_pairs(empty, "embedding", "vec_id").count() == 0


def test_semantic_oversized_cluster_dropped(spark, clustered_emb):
    from mgspark.pipeline.similarity import semantic_dedup_pairs

    # max_cluster=1 drops every cluster from pairing: no pair can form.
    pairs = semantic_dedup_pairs(
        clustered_emb, "embedding", "vec_id", threshold=0.5,
        n_clusters=8, max_cluster=1,
    )
    assert pairs.count() == 0
