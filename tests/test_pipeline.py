"""Training-data pipeline tests: dedup (exact + LSH + simhash + jaccard),
similarity search (brute force + LSH recall), text stats, multimodal
plumbing — against sf0.001 testdata plus planted duplicates."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from mgspark.pipeline.dedup import (
    dedup_exact,
    exact_duplicate_groups,
    minhash_dedup_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_near_pairs,
)
from mgspark.pipeline.multimodal import (
    byte_histogram_features,
    decode_image,
    extract_asset_meta,
    sample_frames,
    synth_assets,
)
from mgspark.pipeline.similarity import ann_lsh_topk, cosine_topk
from mgspark.pipeline.textstats import fingerprint, lang_id, quality_score, token_stats


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


@pytest.fixture(scope="module")
def dup_fixture(spark, docs):
    """Documents plus planted exact and near duplicates.

    Returns (df, exact_pairs, near_pairs) where pairs are
    (original_doc_id, planted_doc_id)."""
    rows = docs.select("doc_id", "text").orderBy("doc_id").limit(20).collect()
    planted, exact_pairs, near_pairs = [], [], []
    for i, r in enumerate(rows[:10]):
        planted.append((10_000 + i, r["text"]))  # exact dup
        exact_pairs.append((r["doc_id"], 10_000 + i))
    for i, r in enumerate(rows[10:20]):
        words = r["text"].split()
        words[len(words) // 2] = "MUTATED"
        planted.append((20_000 + i, " ".join(words)))  # near dup
        near_pairs.append((r["doc_id"], 20_000 + i))
    base = docs.select("doc_id", "text")
    extra = spark.createDataFrame(planted, "doc_id long, text string")
    return base.unionByName(extra), exact_pairs, near_pairs


@pytest.fixture(scope="module")
def docs_with_dups(dup_fixture):
    return dup_fixture[0]


@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def test_exact_duplicate_groups(spark, docs_with_dups):
    groups = exact_duplicate_groups(docs_with_dups, "text", "doc_id").collect()
    assert len(groups) == 10
    assert all(g["dup_count"] == 2 for g in groups)
    assert all(g["keep_id"] < 10_000 for g in groups)


def test_dedup_exact(spark, docs_with_dups):
    total = docs_with_dups.count()
    deduped = dedup_exact(docs_with_dups, "text", "doc_id")
    assert deduped.count() == total - 10
    # planted exact dups removed, originals kept
    kept = {r["doc_id"] for r in deduped.select("doc_id").collect()}
    assert not any(10_000 <= d < 10_010 for d in kept)


def test_minhash_finds_planted_near_dups(spark, dup_fixture):
    df, exact_pairs, near_pairs = dup_fixture
    pairs = minhash_dedup_pairs(
        df, "text", "doc_id", threshold=0.5, num_hashes=128, num_bands=32
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    for orig, copy in exact_pairs:
        assert (min(orig, copy), max(orig, copy)) in found
    for r in pairs:
        assert 0.5 <= r["est_jaccard"] <= 1.0
    near_found = sum(
        1 for orig, copy in near_pairs if (min(orig, copy), max(orig, copy)) in found
    )
    assert near_found >= 8


def test_connected_components_chains_and_isolates(spark):
    """A~B, B~C must collapse into one cluster even without an A~C pair;
    disjoint pairs stay separate; unpaired docs survive dedup_near."""
    from mgspark.pipeline.dedup import connected_components, dedup_near, near_dup_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    # both execution paths must agree: single-task union-find (default
    # at this size) and the iterative label propagation (forced)
    for thr in (2_000_000, 0):
        labels = {
            r["id"]: r["comp"]
            for r in connected_components(pairs, local_threshold=thr).collect()
        }
        assert labels == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
    comps = {(r["keep_id"], r["size"]) for r in near_dup_components(pairs).collect()}
    assert comps == {(1, 3), (10, 2)}
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in [1, 2, 3, 10, 11, 99]], "doc_id long, text string"
    )
    kept = sorted(r["doc_id"] for r in dedup_near(docs, "doc_id", pairs).collect())
    assert kept == [1, 10, 99]


def test_connected_components_string_ids(spark):
    """Ids keep their native type: string/uuid ids must cluster (a long
    cast would null them out and silently keep every duplicate)."""
    from mgspark.pipeline.dedup import connected_components, dedup_near

    pairs = spark.createDataFrame(
        [("doc-b", "doc-a"), ("doc-b", "doc-c")], "id_a string, id_b string"
    )
    for thr in (2_000_000, 0):
        labels = {
            r["id"]: r["comp"]
            for r in connected_components(pairs, local_threshold=thr).collect()
        }
        assert labels == {"doc-a": "doc-a", "doc-b": "doc-a", "doc-c": "doc-a"}
    docs = spark.createDataFrame(
        [(i, "t") for i in ["doc-a", "doc-b", "doc-c", "doc-z"]],
        "doc_id string, text string",
    )
    kept = {r["doc_id"] for r in dedup_near(docs, "doc_id", pairs).collect()}
    assert kept == {"doc-a", "doc-z"}


def test_profile_table_empty_input(spark):
    """An empty table is exactly when a data-quality pass must report,
    not crash."""
    from mgspark.pipeline.profile import profile_table

    df = spark.createDataFrame([], "x long, s string")
    got = {r["column"]: r for r in profile_table(df, exact_distinct=True).collect()}
    for col in ("x", "s"):
        assert got[col]["n_rows"] == 0 and got[col]["n_nulls"] == 0
        assert got[col]["n_distinct"] == 0 and got[col]["min_str"] is None


def test_connected_components_long_chain_converges(spark):
    """Pointer jumping: a 40-hop path collapses within the default
    iteration budget (log2(40) ~ 6, not 40)."""
    from mgspark.pipeline.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "id_a long, id_b long"
    )
    # local_threshold=0 forces the ITERATIVE path — this test pins the
    # pointer-jumping convergence budget, which union-find would bypass
    labels = {
        r["id"]: r["comp"]
        for r in connected_components(pairs, max_iter=10, local_threshold=0).collect()
    }
    assert set(labels.values()) == {0} and len(labels) == 41


def test_dedup_near_on_minhash_pairs(spark, dup_fixture):
    """End-to-end near dedup: minhash pairs -> clusters -> keep one per
    cluster; every planted exact-dup copy is dropped, its original kept."""
    from mgspark.pipeline.dedup import dedup_near

    df, exact_pairs, _ = dup_fixture
    pairs = minhash_dedup_pairs(df, "text", "doc_id", threshold=0.7)
    from mgspark.pipeline.dedup import connected_components

    kept = {r["doc_id"] for r in dedup_near(df, "doc_id", pairs).collect()}
    all_ids = {r["doc_id"] for r in df.select("doc_id").collect()}
    # exactly ONE member of every near-dup component survives: its min id
    comps: dict = {}
    for r in connected_components(pairs).collect():
        comps.setdefault(r["comp"], set()).add(r["id"])
    for members in comps.values():
        assert kept & members == {min(members)}
    for orig, copy in exact_pairs:
        assert max(orig, copy) not in kept
    assert len(kept) < len(all_ids)


def test_minhash_signature_determinism(spark, docs):
    sig1 = minhash_signatures(docs.limit(50), "text", "doc_id").collect()
    sig2 = minhash_signatures(docs.limit(50), "text", "doc_id").collect()
    m1 = {r["id"]: r["sig"] for r in sig1}
    m2 = {r["id"]: r["sig"] for r in sig2}
    assert m1 == m2


def test_dedup_near_simhash_composition_sharp(spark, dup_fixture):
    """The contract query's composition (simhash pairs at radius 8 ->
    components -> kept set) on a fixture WHERE DUPS EXIST: the kept set
    is a strict subset of the docs, a subset of the exact-dedup kept set
    (both keep the min id), and every planted exact dup is removed.
    The sf tables have no exact dups, so the driver row's subset
    invariant is only sharp here."""
    from mgspark.pipeline.dedup import dedup_near, simhash_near_pairs

    df, exact_pairs, near_pairs = dup_fixture
    pairs = simhash_near_pairs(df, "text", "doc_id", max_hamming=8, max_bucket=1 << 20)
    kept = {r["doc_id"] for r in dedup_near(df, "doc_id", pairs).collect()}
    exact_keep = {
        r["k"]
        for r in df.groupBy("text").agg(F.min("doc_id").alias("k")).collect()
    }
    assert kept < {r["doc_id"] for r in df.select("doc_id").collect()}
    assert kept <= exact_keep
    for orig, copy in exact_pairs:
        # the planted copy shares a component with orig and copy > orig,
        # so it can never be the component min -> always removed (orig
        # itself may be removed too if near-linked to a smaller id)
        assert copy not in kept


def test_simhash_near_pairs(spark, dup_fixture):
    df, exact_pairs, _ = dup_fixture
    fps = {r["id"]: r["simhash"] for r in simhash_fingerprints(df, "text", "doc_id").collect()}
    assert len(fps) == df.count()
    pairs = simhash_near_pairs(df, "text", "doc_id", max_hamming=3).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    # exact dups have identical simhash -> hamming 0, all found
    for orig, copy in exact_pairs:
        assert (min(orig, copy), max(orig, copy)) in found
    for r in pairs:
        assert r["hamming"] <= 3


def test_simhash_full_recall_at_hamming_8(spark):
    """Pigeonhole guarantee at the driver query's radius (VERDICT r02
    #6): with n_chunks = max_hamming + 1 (default) EVERY pair at hamming
    <= 8 must be found — the old fixed 4x16-bit index missed pairs
    differing in all four chunks.  Ground truth is the all-pairs hamming
    over the collected fingerprints."""
    import numpy as np

    rng = np.random.default_rng(21)
    vocab = [f"w{i}" for i in range(400)]
    rows = []
    for i in range(60):
        words = rng.choice(vocab, size=120).tolist()
        rows.append((i, " ".join(words)))
        if i < 20:
            # perturbed copy: swap a few words -> small hamming distance
            mutated = list(words)
            for pos in rng.choice(len(words), size=3, replace=False):
                mutated[pos] = vocab[int(rng.integers(len(vocab)))]
            rows.append((1000 + i, " ".join(mutated)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {r["id"]: r["simhash"] for r in simhash_fingerprints(df, "text", "doc_id").collect()}
    ids = sorted(fps)
    expected = {
        (a, b): bin((fps[a] ^ fps[b]) & ((1 << 64) - 1)).count("1")
        for ai, a in enumerate(ids)
        for b in ids[ai + 1:]
        if bin((fps[a] ^ fps[b]) & ((1 << 64) - 1)).count("1") <= 8
    }
    # the fixture must exercise the regime the 4-chunk index missed
    assert any(4 <= h <= 8 for h in expected.values()), expected
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_pairs(df, "text", "doc_id", max_hamming=8).collect()
    }
    assert got == expected


def test_simhash_duplicate_rows_never_emit_self_pairs(spark):
    """The same (doc_id, text) row appearing twice (un-deduped upstream
    union) must not surface an id_a == id_b self-pair: bucket members
    are deduped by id before expansion."""
    rows = [(1, "alpha beta gamma delta"), (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_near_pairs(df, "text", "doc_id", max_hamming=3).collect()
    ]
    assert got == [(1, 2, 0)], got


def test_simhash_extreme_radius_degrades_to_all_pairs(spark):
    """max_hamming >= 63 cannot be served by any chunk index (ADVICE r3):
    it must degrade to the exact all-pairs join instead of raising, and
    release exactly the pairs within the radius."""
    rows = [(i, f"doc number {i} with words {'x ' * (i + 1)}") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {r["id"]: r["simhash"] for r in simhash_fingerprints(df, "text", "doc_id").collect()}
    ids = sorted(fps)
    for radius in (63, 64):
        expected = {
            (a, b)
            for ai, a in enumerate(ids)
            for b in ids[ai + 1:]
            if bin((fps[a] ^ fps[b]) & ((1 << 64) - 1)).count("1") <= radius
        }
        got = {
            (r["id_a"], r["id_b"])
            for r in simhash_near_pairs(df, "text", "doc_id", max_hamming=radius).collect()
        }
        assert got == expected
    # max_hamming=64 admits every pair by definition
    n = len(ids)
    assert (
        simhash_near_pairs(df, "text", "doc_id", max_hamming=64).count()
        == n * (n - 1) // 2
    )


def test_simhash_pair_index_survives_large_uniform_corpus(spark):
    """At max_hamming=8 the auto-selected chunk-PAIR index keeps bucket
    keys ~13 bits wide, so a large uniform corpus does NOT overflow the
    bucket cap (the single 7-bit-chunk index would drop nearly every
    bucket and silently lose recall): planted near-dup pairs must still
    be found among 3000 random docs."""
    import numpy as np

    rng = np.random.default_rng(33)
    vocab = [f"w{i}" for i in range(2000)]
    rows = []
    planted = []
    for i in range(3000):
        words = rng.choice(vocab, size=80).tolist()
        rows.append((i, " ".join(words)))
    for i in range(15):  # exact copies: hamming 0, must always surface
        rows.append((50_000 + i, rows[i][1]))
        planted.append((i, 50_000 + i))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    found = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_pairs(df, "text", "doc_id", max_hamming=8).collect()
    }
    for p in planted:
        assert p in found, p


def test_simhash_max_hamming_zero_no_overflow(spark):
    """max_hamming=0 (single 64-bit chunk) must not overflow the JVM
    long mask: identical docs pair up, everything else does not."""
    rows = [(0, "same text here"), (1, "same text here"), (2, "different words")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    found = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_pairs(df, "text", "doc_id", max_hamming=0).collect()
    }
    assert found == {(0, 1)}


def test_simhash_boilerplate_bucket_capped(spark):
    """1k documents sharing identical simhash chunks must not trigger a
    quadratic candidate join: the oversized bucket is dropped (VERDICT
    r01 #2), so the query completes and emits no pairs for the
    boilerplate cluster beyond the cap."""
    rows = [(i, "the same boilerplate text repeated everywhere") for i in range(1000)]
    # plus one genuine near-dup pair in a small bucket
    rows += [(5000, "unique document alpha beta gamma delta"),
             (5001, "unique document alpha beta gamma delta")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = simhash_near_pairs(df, "text", "doc_id", max_hamming=3, max_bucket=64).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (5000, 5001) in found
    # boilerplate cluster (1000 identical docs -> 499500 pairs) dropped by cap
    assert not any(a < 1000 and b < 1000 for a, b in found)


def test_minhash_signatures_computed_once(spark, docs):
    """minhash_dedup_pairs persists the signature stage: the plan of the
    verification join must reference InMemoryRelation (VERDICT r01 #1),
    not recompute the shingling mapInPandas three times."""
    out = minhash_dedup_pairs(docs.limit(100), "text", "doc_id", threshold=0.5)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan


def test_ngram_jaccard_exact(spark, dup_fixture):
    df, exact_pairs, _ = dup_fixture
    small_ids = {a for a, _ in exact_pairs} | {b for _, b in exact_pairs}
    small = df.where(
        F.col("doc_id").isin([int(x) for x in small_ids]) | (F.col("doc_id") < 30)
    )
    pairs = ngram_jaccard_pairs(small, "text", "doc_id", n=3, threshold=0.9, max_doc_freq=None).collect()
    found = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    for orig, copy in exact_pairs:
        key = (min(orig, copy), max(orig, copy))
        assert found.get(key) == 1.0, f"planted exact pair {key} -> {found.get(key)}"


def test_cosine_topk_exact(spark, embeddings):
    query = embeddings.where(F.col("vec_id") == 0).first()["embedding"]
    top = cosine_topk(embeddings, "embedding", "vec_id", query, k=5).collect()
    assert top[0]["id"] == 0 and abs(top[0]["cosine"] - 1.0) < 1e-9
    # verify against numpy brute force
    rows = embeddings.collect()
    mat = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    ids = np.array([r["vec_id"] for r in rows])
    q = np.asarray(query, dtype=np.float64)
    cos = mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = np.lexsort((ids, -cos))[:5]
    assert [r["id"] for r in top] == ids[order].tolist()


def test_ann_lsh_recall_on_clustered_vectors(spark):
    """LSH recall on data with actual neighbor structure.

    The driver testdata embeddings are near-uniform on the sphere (LSH's
    worst case), so recall is measured on planted clusters: 25 centers x
    20 perturbed members; a query near a center must retrieve mostly its
    own cluster."""
    rng = np.random.default_rng(42)
    centers = rng.standard_normal((25, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    for c_idx, c in enumerate(centers):
        for _ in range(20):
            v = c + 0.04 * rng.standard_normal(64)
            v /= np.linalg.norm(v)
            rows.append((vid, c_idx, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, cluster int, embedding array<float>")
    hits = total = 0
    for c_idx in range(3):
        query = rows[c_idx * 20][2]
        exact = {x["id"] for x in cosine_topk(df, "embedding", "vec_id", query, 10).collect()}
        approx = {
            x["id"]
            for x in ann_lsh_topk(
                df, "embedding", "vec_id", query, 10, n_planes=10, multiprobe=2
            ).collect()
        }
        hits += len(exact & approx)
        total += len(exact)
    recall = hits / total
    assert recall >= 0.8, f"ANN recall on clustered data {recall}"


def test_ann_lsh_prunes_on_real_embeddings(spark, embeddings):
    """On the (near-uniform) testdata: ANN must actually prune the scan
    and still return k results containing the trivial self-match."""
    row = embeddings.where(F.col("vec_id") == 7).first()
    approx = ann_lsh_topk(
        embeddings, "embedding", "vec_id", row["embedding"], 10, n_planes=8, multiprobe=2
    ).collect()
    assert len(approx) == 10
    assert approx[0]["id"] == 7 and abs(approx[0]["cosine"] - 1.0) < 1e-9


def test_token_stats_and_quality(spark, docs):
    stats = {r["id"]: r for r in token_stats(docs, "text", "doc_id").collect()}
    sample = docs.limit(20).collect()
    for r in sample:
        expected_tokens = len([t for t in r["text"].split(" ") if t])
        assert stats[r["doc_id"]]["n_tokens"] == expected_tokens
        assert stats[r["doc_id"]]["n_chars"] == len(r["text"])
    quality = quality_score(docs, "text", "doc_id").collect()
    for q in quality:
        assert 0.0 <= q["alpha_ratio"] <= 1.0
        assert 0.0 <= q["quality"] <= 1.0


def test_lang_id_accuracy(spark):
    # The testdata's `lang` labels are uncorrelated with its synthetic
    # text, so accuracy is checked on texts with real language signal.
    samples = [
        (1, "the cat sat on the mat and it is a good day for the walk", "en"),
        (2, "el perro corre en la casa y la luna es una luz que brilla", "es"),
        (3, "der hund ist in dem haus und die katze ist mit der maus im garten", "de"),
        (4, "le chat est dans la maison et les oiseaux sont dans le jardin pour une heure", "fr"),
        (5, "这是一个中文句子 关于天气和生活", "zh"),
        (6, "zzz qqq xxx www", "und"),
    ]
    df = spark.createDataFrame([(i, t) for i, t, _ in samples], "doc_id long, text string")
    preds = {r["id"]: r["lang_pred"] for r in lang_id(df, "text", "doc_id").collect()}
    for i, _, expected in samples:
        assert preds[i] == expected, f"doc {i}: {preds[i]} != {expected}"


def test_lang_id_total_coverage(spark, docs):
    out = lang_id(docs, "text", "doc_id")
    assert out.count() == docs.count()
    assert set(out.columns) == {"id", "lang_pred"}


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, " HELLO   WORLD  "), (4, "other")],
        "doc_id long, text string",
    )
    fps = {r["id"]: r["fp"] for r in fingerprint(df, "text", "doc_id").collect()}
    assert fps[1] == fps[2] == fps[3]
    assert fps[4] != fps[1]


def test_multimodal_meta_and_features(spark):
    assets = synth_assets(spark, n=64)
    meta = extract_asset_meta(assets).collect()
    assert len(meta) == 64
    kinds = {r["kind"] for r in meta}
    assert kinds <= {"image", "audio", "video"}
    for r in meta:
        assert 16 <= r["width"] < 512 and 16 <= r["height"] < 512
        assert r["payload_bytes"] == (r["width"] * r["height"]) % 4096
    feats = byte_histogram_features(assets).collect()
    assert len(feats) == 64
    for r in feats:
        assert len(r["features"]) == 16
        total = sum(r["features"])
        assert total == 0.0 or abs(total - 1.0) < 1e-9


def test_sample_frames(spark):
    assets = synth_assets(spark, n=64)
    frames = sample_frames(assets, every_ms=5000)
    meta = extract_asset_meta(assets).where(
        (F.col("kind") == "video") & (F.col("duration_ms") > 0)
    )
    expected = meta.select(
        F.sum(F.ceil(F.col("duration_ms") / 5000)).alias("n")
    ).first()["n"]
    assert frames.count() == expected


def test_decode_image_bmp_roundtrip(spark):
    """decode_image really decodes: encode known pixels as 24-bit BMP
    (incl. a padded-stride width and a top-down negative height), decode
    through Spark, and require exact pixel equality."""
    import numpy as np

    from mgspark.pipeline.multimodal import synth_bmp_bytes

    rng = np.random.default_rng(99)
    truth = {}
    rows = []
    for asset_id, (w, h) in enumerate([(8, 5), (10, 7), (33, 4), (4, 4)]):
        blob, pixels = synth_bmp_bytes(w, h, rng)
        truth[asset_id] = pixels
        rows.append((asset_id, bytearray(blob)))
    # top-down variant: negative height in the header, rows not flipped
    blob, pixels = synth_bmp_bytes(12, 6, rng)
    td = bytearray(blob)
    td[22:26] = (-6).to_bytes(4, "little", signed=True)
    # stored rows are bottom-up of `pixels`; interpreting them top-down
    # means the decoded truth is pixels flipped vertically
    truth[100] = pixels[::-1]
    rows.append((100, td))
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    got = {r["asset_id"]: r for r in decode_image(df).collect()}
    assert set(got) == set(truth)
    for asset_id, pixels in truth.items():
        r = got[asset_id]
        assert (r["width"], r["height"]) == (pixels.shape[1], pixels.shape[0])
        assert r["pixels"] == pixels.reshape(-1).astype(int).tolist()


def test_decode_image_png_roundtrip(spark):
    """decode_image really inflates PNG: encode known pixels (per-row
    filters cycling None/Sub/Up/Average/Paeth; gray, RGB, and RGBA color
    types), decode through Spark, require exact pixel equality."""
    import numpy as np

    from mgspark.pipeline.multimodal import synth_png_bytes

    rng = np.random.default_rng(31)
    truth = {}
    rows = []
    cases = [
        (0, 8, 7, 8, 0), (2, 13, 6, 8, 0), (2, 1, 1, 8, 0), (6, 9, 11, 8, 0),
        (0, 32, 5, 8, 0), (6, 5, 10, 8, 0),
        # paletted: PLTE lookup path (plain + Adam7)
        (3, 11, 8, 8, 0), (3, 1, 1, 8, 0), (3, 24, 6, 8, 1),
        # 16-bit depth (big-endian samples, high-byte normalization)
        (0, 9, 6, 16, 0), (2, 12, 7, 16, 0), (6, 6, 9, 16, 0),
        # Adam7 interlaced: seven independently filtered passes
        (0, 13, 11, 8, 1), (2, 8, 8, 8, 1), (6, 17, 4, 8, 1),
        (2, 3, 2, 8, 1),  # tiny: most passes empty
        (2, 20, 14, 16, 1),  # 16-bit AND interlaced
    ]
    for asset_id, (ct, w, h, depth, il) in enumerate(cases):
        blob, pixels = synth_png_bytes(w, h, rng, ct, depth=depth, interlace=il)
        truth[asset_id] = pixels
        rows.append((asset_id, bytearray(blob)))
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    got = {r["asset_id"]: r for r in decode_image(df).collect()}
    assert set(got) == set(truth)
    for asset_id, pixels in truth.items():
        r = got[asset_id]
        assert (r["width"], r["height"]) == (pixels.shape[1], pixels.shape[0])
        assert r["pixels"] == pixels.reshape(-1).astype(int).tolist()


def test_decode_image_png_unsupported_raises():
    """Sub-byte depths, 16-bit paletted, unknown interlace methods, and
    non-PNG magics raise NotImplementedError naming the missing codec,
    never mis-decode.  (8/16-bit and Adam7 are SUPPORTED — covered by
    the round-trip test above.)"""
    import struct

    import numpy as np
    import pytest

    from mgspark.pipeline.multimodal import (
        _decode_image_bytes,
        _decode_png,
        _png_chunk,
        _PNG_MAGIC,
        synth_png_bytes,
    )

    rng = np.random.default_rng(5)

    def patched(src, patch_off, val):
        # flip a field inside IHDR (starts at byte 16: 8 magic + 8
        # len/tag) and recompute the CRC so only the unsupported
        # feature is at fault
        bad = bytearray(src)
        bad[patch_off] = val
        ihdr = bytes(bad[16:29])
        import zlib as _z

        bad[29:33] = struct.pack(">I", _z.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
        return bytes(bad)

    blob, _ = synth_png_bytes(4, 4, rng, 2)
    pblob, _ = synth_png_bytes(4, 4, rng, 3)
    for src, patch_off, val in [
        (blob, 24, 4),   # sub-byte depth
        (blob, 24, 1),   # 1-bit depth
        (blob, 28, 7),   # unknown interlace method
        (pblob, 24, 16),  # 16-bit paletted (not a legal PNG combo)
    ]:
        with pytest.raises(NotImplementedError):
            _decode_png(patched(src, patch_off, val))
    with pytest.raises(NotImplementedError):
        _decode_image_bytes(b"\xff\xd8\xff\xe0 jpeg")
    with pytest.raises(ValueError, match="IHDR"):
        _decode_png(_PNG_MAGIC + _png_chunk(b"IEND", b""))  # missing IHDR


def test_decode_image_png_corrupt_payloads_raise_valueerror(spark):
    """Structural damage raises ValueError naming the defect (and the
    Spark path prefixes the asset id) — never a bare struct/zlib error
    from inside the Arrow task."""
    import struct
    import zlib as _z

    import numpy as np
    import pytest

    from mgspark.pipeline.multimodal import (
        _decode_png,
        _png_chunk,
        _PNG_MAGIC,
        decode_image,
        synth_png_bytes,
    )

    rng = np.random.default_rng(6)
    blob, _ = synth_png_bytes(6, 5, rng, 2)
    # 1. truncated: chunk declares more data than remains
    with pytest.raises(ValueError, match="truncated"):
        _decode_png(bytes(blob[: len(blob) // 2]))
    # 2. corrupt zlib stream in IDAT
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    bad_idat = (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", b"\x00not zlib at all")
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="inflate"):
        _decode_png(bad_idat)
    # 3. paletted without PLTE
    pblob, _ = synth_png_bytes(4, 4, rng, 3)
    no_plte = bytearray()
    pos = len(_PNG_MAGIC)
    no_plte += _PNG_MAGIC
    while pos + 8 <= len(pblob):
        (length,) = struct.unpack(">I", pblob[pos : pos + 4])
        tag = pblob[pos + 4 : pos + 8]
        if tag != b"PLTE":
            no_plte += pblob[pos : pos + 12 + length]
        pos += 12 + length
    with pytest.raises(ValueError, match="PLTE"):
        _decode_png(bytes(no_plte))
    # 4. palette index out of range: shrink the PLTE to 1 entry
    short = bytearray()
    pos = len(_PNG_MAGIC)
    short += _PNG_MAGIC
    while pos + 8 <= len(pblob):
        (length,) = struct.unpack(">I", pblob[pos : pos + 4])
        tag = pblob[pos + 4 : pos + 8]
        if tag == b"PLTE":
            short += _png_chunk(b"PLTE", bytes(pblob[pos + 8 : pos + 11]))
        else:
            short += pblob[pos : pos + 12 + length]
        pos += 12 + length
    with pytest.raises(ValueError, match="palette index"):
        _decode_png(bytes(short))
    # 5. the Spark path names the offending asset
    df = spark.createDataFrame(
        [(7, bytearray(blob[: len(blob) // 2]))], "asset_id long, payload binary"
    )
    with pytest.raises(Exception, match="asset_id=7"):
        decode_image(df).collect()


def test_resize_image_png_matches_numpy_truth(spark):
    """resize_image dispatches on magic: PNG payloads resize to the same
    nearest-neighbor ground truth as BMP ones."""
    import numpy as np

    from mgspark.pipeline.multimodal import resize_image, synth_png_bytes

    rng = np.random.default_rng(23)
    blob, pixels = synth_png_bytes(14, 9, rng, 2)
    df = spark.createDataFrame([(0, bytearray(blob))], "asset_id long, payload binary")
    out_w, out_h = 6, 6
    r = resize_image(df, out_w, out_h).collect()[0]
    ri = (np.arange(out_h) * 9) // out_h
    ci = (np.arange(out_w) * 14) // out_w
    assert r["pixels"] == pixels[ri[:, None], ci[None, :]].reshape(-1).astype(int).tolist()


def test_resize_image_nearest_neighbor_truth(spark):
    """resize_image must equal the numpy nearest-neighbor ground truth
    (exact integer index math) on known pixels, both down- and up-scale."""
    import numpy as np

    from mgspark.pipeline.multimodal import resize_image, synth_bmp_bytes

    rng = np.random.default_rng(17)
    truth = {}
    rows = []
    for asset_id, (w, h) in enumerate([(8, 12), (32, 4), (4, 4)]):
        blob, pixels = synth_bmp_bytes(w, h, rng)
        truth[asset_id] = pixels
        rows.append((asset_id, bytearray(blob)))
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    out_w, out_h = 6, 6
    got = {r["asset_id"]: r for r in resize_image(df, out_w, out_h).collect()}
    for asset_id, pixels in truth.items():
        h, w = pixels.shape[:2]
        ri = (np.arange(out_h) * h) // out_h
        ci = (np.arange(out_w) * w) // out_w
        expected = pixels[ri[:, None], ci[None, :]].reshape(-1).astype(int).tolist()
        r = got[asset_id]
        assert (r["width"], r["height"]) == (out_w, out_h)
        assert r["pixels"] == expected


def test_bpe_token_stats_properties(spark):
    """BPE-ish counts: >= whitespace counts, splits digits and
    punctuation runs the way the regex promises."""
    from mgspark.pipeline.textstats import bpe_token_stats

    rows = [
        (0, "hello world"),          # 2 ws, 2 bpe
        (1, "hello, world!!"),       # 2 ws, 4 bpe: hello , world !!
        (2, "abc123 x"),             # 2 ws, 5 bpe: abc 1 2 3 x
        (3, ""),                     # 0 / 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r for r in bpe_token_stats(df, "text", "doc_id").collect()}
    assert (got[0]["n_ws_tokens"], got[0]["n_bpe_tokens"]) == (2, 2)
    assert (got[1]["n_ws_tokens"], got[1]["n_bpe_tokens"]) == (2, 4)
    assert (got[2]["n_ws_tokens"], got[2]["n_bpe_tokens"]) == (2, 5)
    assert (got[3]["n_ws_tokens"], got[3]["n_bpe_tokens"]) == (0, 0)
    for r in got.values():
        assert r["n_bpe_tokens"] >= r["n_ws_tokens"]


def test_tfidf_top_terms_truth(spark):
    """TF-IDF ranking on a hand-checkable corpus: a term unique to one
    doc outranks a corpus-wide term with higher tf."""
    from mgspark.pipeline.textstats import tfidf_top_terms

    rows = [
        (0, "common common common rare0"),
        (1, "common common rare1 rare1"),
        (2, "common other"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id"], r["rank"]): (r["term"], r["tf"], r["doc_freq"])
        for r in tfidf_top_terms(df, "text", "doc_id", k=2).collect()
    }
    # 'common' appears in all 3 docs -> idf ln(4/4)=0: always outranked
    assert got[(0, 1)] == ("rare0", 1, 1)
    assert got[(1, 1)] == ("rare1", 2, 1)
    assert got[(2, 1)] == ("other", 1, 1)
    assert got[(0, 2)][0] == "common" and got[(1, 2)][0] == "common"


def test_profile_table_truth(spark):
    """Profiling stats match hand-computed truth, incl. a null-only
    column; approx mode stays within HLL error of exact."""
    from mgspark.pipeline.profile import profile_table

    rows = [(1, "a", None), (2, "b", None), (3, "a", None), (None, None, None)]
    df = spark.createDataFrame(rows, "x long, s string, z string")
    got = {r["column"]: r for r in profile_table(df, exact_distinct=True).collect()}
    assert got["x"]["n_rows"] == 4 and got["x"]["n_nulls"] == 1
    assert got["x"]["n_distinct"] == 3
    assert (got["x"]["min_str"], got["x"]["max_str"]) == ("1", "3")
    assert got["s"]["n_distinct"] == 2 and got["s"]["n_nulls"] == 1
    assert got["z"]["n_distinct"] == 0 and got["z"]["min_str"] is None
    approx = {r["column"]: r for r in profile_table(df).collect()}
    assert abs(approx["x"]["n_distinct"] - 3) <= 1


def test_pcm_waveform_stats_truth(spark):
    """PCM features must equal the numpy ground truth, including the
    empty-payload and single-sample edge cases."""
    import numpy as np

    from mgspark.pipeline.multimodal import pcm_waveform_stats

    header = b"\x00" * 13
    payloads = {
        0: np.array([0, 255, 0, 255], dtype=np.uint8),      # 3 crossings
        1: np.array([127, 128, 127], dtype=np.uint8),       # 2 crossings
        2: np.array([], dtype=np.uint8),                    # empty
        3: np.array([200], dtype=np.uint8),                 # single sample
        4: np.arange(256, dtype=np.uint8),                  # 1 crossing
    }
    rows = [(i, bytearray(header + p.tobytes())) for i, p in payloads.items()]
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    got = {r["asset_id"]: r for r in pcm_waveform_stats(df).collect()}
    for i, p in payloads.items():
        s = p.astype(np.int64)
        below = p < 128
        expected = (
            len(p),
            int(s.sum()),
            int((s * s).sum()),
            int(np.count_nonzero(below[1:] != below[:-1])) if len(p) else 0,
        )
        r = got[i]
        assert (
            r["n_samples"], r["amp_sum"], r["amp_sq_sum"], r["zero_crossings"]
        ) == expected, i


def test_decode_image_non_bmp_raises(spark):
    """Formats needing a codec stay an honest NotImplementedError."""
    from py4j.protocol import Py4JJavaError

    assets = synth_assets(spark, n=4)  # MGB1 payloads, not BMP
    with pytest.raises((NotImplementedError, Py4JJavaError, Exception)) as err:
        decode_image(assets).collect()
    assert "NotImplementedError" in str(err.value) or isinstance(
        err.value, NotImplementedError
    )


def test_curate_documents_pipeline(spark, docs_with_dups):
    """Curation composition: dedup removes planted exact dups, thresholds
    drop low-quality/short docs, every row carries a lang prediction."""
    from mgspark.pipeline.curate import curate_documents

    out = curate_documents(docs_with_dups, "text", "doc_id", min_quality=0.3, min_tokens=3)
    rows = out.collect()
    ids = [r["id"] for r in rows]
    assert len(ids) == len(set(ids))
    assert not any(10_000 <= i < 10_010 for i in ids), "planted exact dups must be gone"
    assert all(r["quality"] >= 0.3 and r["n_tokens"] >= 3 for r in rows)
    assert all(r["lang_pred"] is not None for r in rows)
    # language filter narrows the output
    en_only = curate_documents(
        docs_with_dups, "text", "doc_id", min_quality=0.3, min_tokens=3,
        keep_langs=["en"],
    ).collect()
    assert 0 < len(en_only) < len(rows)
    assert all(r["lang_pred"] == "en" for r in en_only)
    # near-dup stage: strictly narrows the kept set vs exact-only and
    # stays a subset of it
    near = curate_documents(
        docs_with_dups, "text", "doc_id", min_quality=0.3, min_tokens=3,
        near_dup_threshold=0.6,
    ).collect()
    assert {r["id"] for r in near} <= {r["id"] for r in rows}
    assert len(near) < len(rows)


def test_string_ids_minhash_and_curate(spark):
    """String/uuid doc ids must flow through the whole near-dup path
    natively — the historical cast('long') nulled them, every bucket saw
    one unique (null) id, and dedup became a silent no-op."""
    from mgspark.pipeline.curate import curate_documents
    from mgspark.pipeline.dedup import (
        minhash_dedup_pairs,
        simhash_near_pairs,
        ngram_jaccard_pairs,
        dedup_near,
    )

    base = "the quick brown fox jumps over the lazy dog " * 6
    rows = [
        ("doc-aaaa", base),
        ("doc-bbbb", base + "tail words here"),  # near dup of doc-aaaa
        ("doc-cccc", " ".join(f"tok{i}" for i in range(60))),
    ]
    df = spark.createDataFrame(rows, "uid string, text string")

    mh = {
        (r["id_a"], r["id_b"])
        for r in minhash_dedup_pairs(df, "text", "uid", threshold=0.5).collect()
    }
    assert ("doc-aaaa", "doc-bbbb") in mh, mh

    sh = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_pairs(df, "text", "uid", max_hamming=8).collect()
    }
    assert ("doc-aaaa", "doc-bbbb") in sh, sh

    ng = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(df, "text", "uid", threshold=0.5).collect()
    }
    assert ("doc-aaaa", "doc-bbbb") in ng, ng

    pairs = minhash_dedup_pairs(df, "text", "uid", threshold=0.5)
    kept = {r["uid"] for r in dedup_near(df, "uid", pairs).collect()}
    assert kept == {"doc-aaaa", "doc-cccc"}, kept

    curated = {
        r["id"]
        for r in curate_documents(
            df, "text", "uid", near_dup_threshold=0.5, min_quality=0.0, min_tokens=1
        ).collect()
    }
    assert "doc-bbbb" not in curated and "doc-aaaa" in curated, curated


def test_simhash_recall_at_hamming_63(spark):
    """max_hamming=63 must fall back to the single-chunk index: the
    chunk-PAIR index clamped to 64 chunks guarantees only one shared
    chunk (zero shared pairs) and would silently drop distant pairs."""
    from mgspark.pipeline.dedup import simhash_fingerprints, simhash_near_pairs

    texts = [(i, " ".join(f"w{i}t{j}" for j in range(30))) for i in range(6)]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    fps = {r["id"]: r["simhash"] for r in simhash_fingerprints(df, "text", "doc_id").collect()}
    expected = {
        (a, b)
        for a in fps
        for b in fps
        if a < b and bin((fps[a] ^ fps[b]) & ((1 << 64) - 1)).count("1") <= 63
    }
    found = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_pairs(df, "text", "doc_id", max_hamming=63).collect()
    }
    assert found == expected, (len(found), len(expected))


def test_profile_table_map_column(spark):
    """A map-typed column must not abort the profiling job: its null
    count is real, distinct/min/max report null, other columns profile
    normally."""
    from mgspark.pipeline.profile import profile_table

    df = spark.createDataFrame(
        [(1, {"a": "b"}), (2, None), (3, {"c": "d"})],
        "id long, meta map<string,string>",
    )
    prof = {r["column"]: r for r in profile_table(df).collect()}
    assert prof["meta"]["n_nulls"] == 1
    assert prof["meta"]["n_distinct"] is None
    assert prof["meta"]["min_str"] is None
    assert prof["id"]["n_distinct"] == 3
    assert prof["id"]["min_str"] == "1" and prof["id"]["max_str"] == "3"


def test_sampling_determinism_and_bounds(spark):
    """Deterministic sampling: same kept set at any partitioning, rate
    within binomial bounds, exact per-stratum counts, validation."""
    from mgspark.pipeline.sampling import (
        hash_sample,
        mixture_sample,
        stratified_sample,
    )

    df = spark.range(0, 20_000).withColumn(
        "grp", (F.col("id") % 7).cast("string")
    )
    kept1 = {r["id"] for r in hash_sample(df, "id", 0.2, seed=5).collect()}
    kept2 = {
        r["id"] for r in hash_sample(df.repartition(13), "id", 0.2, seed=5).collect()
    }
    assert kept1 == kept2  # partitioning-independent
    # binomial 5-sigma bounds around 4000
    assert abs(len(kept1) - 4000) < 5 * (20_000 * 0.2 * 0.8) ** 0.5
    assert {r["id"] for r in hash_sample(df, "id", 0.2, seed=6).collect()} != kept1

    strat = stratified_sample(df, "grp", "id", n_per_stratum=50, seed=1)
    counts = {r["grp"]: r["c"] for r in strat.groupBy("grp").agg(F.count("*").alias("c")).collect()}
    assert set(counts.values()) == {50} and len(counts) == 7
    # small stratum keeps all rows
    tiny = stratified_sample(df.where(F.col("id") < 3), "grp", "id", 50)
    assert tiny.count() == 3

    mix = mixture_sample(df, "grp", "id", {"0": 1.0, "1": 0.0}, default_rate=0.5)
    got = {r["grp"]: r["c"] for r in mix.groupBy("grp").agg(F.count("*").alias("c")).collect()}
    assert got["0"] == df.where("grp = '0'").count()
    assert "1" not in got
    assert all(0.4 < got[g] / df.where(F.col("grp") == g).count() < 0.6 for g in "23456")

    import pytest as _pytest

    with _pytest.raises(ValueError, match="rate"):
        hash_sample(df, "id", 1.5)
    with _pytest.raises(ValueError, match="n_per_stratum"):
        stratified_sample(df, "grp", "id", 0)


def test_hash_sample_is_pure_filter_no_shuffle(spark):
    """The Bernoulli forms must stay shuffle-free filters (they compose
    with any plan and scale embarrassingly)."""
    from mgspark.pipeline.sampling import (
        hash_sample,
        mixture_sample,
        weighted_sample,
    )

    df = spark.range(0, 1000).withColumn("src", F.lit("a")).withColumn(
        "w", F.lit(0.5)
    )
    for sampled in (
        hash_sample(df, "id", 0.5),
        mixture_sample(df, "src", "id", {"a": 0.5}),
        weighted_sample(df, "id", "w"),
    ):
        plan = sampled._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan


def test_sessionize_and_stats(spark):
    """Gap-based sessions: hand-built truth, tie-robust ids, stats."""
    from mgspark.pipeline.temporal import session_stats, sessionize

    rows = [
        # user 1: three events 10s apart, then a 1h gap, then one more
        (1, "2024-01-01 00:00:00"),
        (1, "2024-01-01 00:00:10"),
        (1, "2024-01-01 00:00:20"),
        (1, "2024-01-01 01:00:20"),
        # user 2: single event
        (2, "2024-01-01 05:00:00"),
        # user 3: two simultaneous events (tie) then one past the gap
        (3, "2024-01-01 00:00:00"),
        (3, "2024-01-01 00:00:00"),
        (3, "2024-01-01 02:00:00"),
    ]
    df = spark.createDataFrame(rows, "uid long, ts_s string").select(
        "uid", F.col("ts_s").cast("timestamp").alias("ts")
    )
    sess = sessionize(df, "uid", "ts", gap_seconds=600)
    got = {
        (r["uid"], str(r["ts"]), r["session_id"]) for r in sess.collect()
    }
    assert (1, "2024-01-01 00:00:20", 0) in got
    assert (1, "2024-01-01 01:00:20", 1) in got
    assert (2, "2024-01-01 05:00:00", 0) in got
    tie_ids = {r[2] for r in got if r[0] == 3 and r[1] == "2024-01-01 00:00:00"}
    assert tie_ids == {0}  # ties share a session regardless of order
    assert (3, "2024-01-01 02:00:00", 1) in got

    stats = {
        (r["uid"], r["session_id"]): (r["n_events"], r["duration_sec"])
        for r in session_stats(df, "uid", "ts", 600).collect()
    }
    assert stats[(1, 0)] == (3, 20.0)
    assert stats[(1, 1)] == (1, 0.0)
    assert stats[(3, 0)] == (2, 0.0)


def test_asof_join_semantics(spark):
    """Backward as-of: latest right row at-or-before each left ts, per
    key; inclusive at equal ts; null when no prior right row; null-key
    right rows never fill; exactly one output row per left row."""
    from mgspark.pipeline.temporal import asof_join

    left = spark.createDataFrame(
        [
            (100, 1, "2024-01-01 00:05:00"),
            (101, 1, "2024-01-01 00:10:00"),
            (102, 1, "2024-01-01 00:00:30"),  # before any right row
            (103, 2, "2024-01-01 09:00:00"),  # key with no right rows
            (104, 3, "2024-01-01 00:01:00"),  # equal-ts right row counts
        ],
        "event_id long, uid long, ts_s string",
    ).select("event_id", "uid", F.col("ts_s").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [
            (1, "2024-01-01 00:01:00", 10.0),
            (1, "2024-01-01 00:07:00", 20.0),
            (3, "2024-01-01 00:01:00", 77.0),
            (None, "2024-01-01 00:00:00", 999.0),  # must never fill
        ],
        "uid long, rts_s string, price double",
    ).select("uid", F.col("rts_s").cast("timestamp").alias("rts"), "price")

    out = asof_join(left, right, "uid", "ts", "rts", ["price"])
    got = {r["event_id"]: r["price_asof"] for r in out.collect()}
    assert out.count() == left.count()
    assert got == {100: 10.0, 101: 20.0, 102: None, 103: None, 104: 77.0}
    assert set(out.columns) == {"event_id", "uid", "ts", "price_asof"}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="value column"):
        asof_join(left, right, "uid", "ts", "rts", ["nope"])


def test_rolling_features_truth(spark):
    """Trailing-window features vs hand truth, incl. inclusive frame
    edges and tie handling (RANGE: equal-ts rows share the frame)."""
    from mgspark.pipeline.temporal import rolling_features

    rows = [
        (1, 0, 1.0),
        (1, 50, 2.0),
        (1, 60, 4.0),    # window 60: includes ts=0 (inclusive lower edge)
        (1, 200, 8.0),   # isolated
        (2, 60, 16.0),   # other key, never mixed
        (2, 60, 32.0),   # tie: both see both rows
    ]
    df = spark.createDataFrame(rows, "uid long, sec long, v double").select(
        "uid", F.timestamp_seconds(F.col("sec")).alias("ts"), "v"
    )
    out = {
        (r["uid"], r["sec"], r["v"]): (r["roll_n"], r["roll_sum"])
        for r in rolling_features(df, "uid", "ts", "v", 60.0)
        .withColumn("sec", F.unix_seconds(F.col("ts").cast("timestamp")))
        .collect()
    }
    assert out[(1, 0, 1.0)] == (1, 1.0)
    assert out[(1, 50, 2.0)] == (2, 3.0)
    assert out[(1, 60, 4.0)] == (3, 7.0)
    assert out[(1, 200, 8.0)] == (1, 8.0)
    assert out[(2, 60, 16.0)] == (2, 48.0)
    assert out[(2, 60, 32.0)] == (2, 48.0)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="window_seconds"):
        rolling_features(df, "uid", "ts", "v", -1)


def test_sampling_rejects_out_of_range_ids(spark):
    """Out-of-range ids must raise, not silently diverge from the
    cross-engine hash (negative ids: pmod vs sign-of-dividend %)."""
    import pytest as _pytest

    from mgspark.pipeline.sampling import hash_sample

    bad = spark.range(-5, 5)
    with _pytest.raises(Exception, match="outside \\[0, 2\\^31\\)"):
        hash_sample(bad, "id", 0.5).collect()
    with _pytest.raises(Exception, match="outside"):
        hash_sample(spark.range(1 << 31, (1 << 31) + 2), "id", 0.5).collect()


def test_asof_join_null_right_ts_never_fills(spark):
    """A right row with a null timestamp must not fill any left row
    (right.ts <= left.ts is never true for NULL), matching SQL ASOF."""
    from mgspark.pipeline.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 1, "2024-01-01 00:05:00")], "event_id long, uid long, ts_s string"
    ).select("event_id", "uid", F.col("ts_s").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [(1, None, 10.0)], "uid long, rts_s string, price double"
    ).select("uid", F.col("rts_s").cast("timestamp").alias("rts"), "price")
    out = asof_join(left, right, "uid", "ts", "rts", ["price"]).collect()
    assert len(out) == 1 and out[0]["price_asof"] is None

    import pytest as _pytest

    with _pytest.raises(ValueError, match="collides"):
        asof_join(
            left.withColumn("price_asof", F.lit(0.0)), right, "uid", "ts", "rts", ["price"]
        )
    from mgspark.pipeline.temporal import sessionize

    with _pytest.raises(ValueError, match="gap_seconds"):
        sessionize(left, "uid", "ts", -1)


def test_asof_join_null_value_columns_come_from_matched_row(spark):
    """A matching right row whose value column is NULL must yield NULL
    — not an older right row's value — and with several value columns
    all must come from the SAME latest matching right row (the per-row
    struct carry; per-column last(ignorenulls) fills would mix rows)."""
    from mgspark.pipeline.temporal import asof_join

    left = spark.createDataFrame(
        [(100, 1, "2024-01-01 00:10:00")], "event_id long, uid long, ts_s string"
    ).select("event_id", "uid", F.col("ts_s").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [
            # older row: both values present
            (1, "2024-01-01 00:01:00", 10.0, "old"),
            # latest matching row: price NULL, tag present — the match
            (1, "2024-01-01 00:07:00", None, "new"),
        ],
        "uid long, rts_s string, price double, tag string",
    ).select(
        "uid", F.col("rts_s").cast("timestamp").alias("rts"), "price", "tag"
    )
    out = asof_join(left, right, "uid", "ts", "rts", ["price", "tag"]).collect()
    assert len(out) == 1
    # both columns from the 00:07 row: null price, 'new' tag
    assert out[0]["price_asof"] is None
    assert out[0]["tag_asof"] == "new"


def test_asof_join_forward_and_nearest(spark):
    """direction='forward' picks the EARLIEST right row at-or-after each
    left ts; 'nearest' picks the closer side with ties going backward
    (pandas merge_asof convention); null left ts yields null in every
    direction (the desc sort would otherwise fill them forward)."""
    import pytest as _pytest

    from mgspark.pipeline.temporal import asof_join

    left = spark.createDataFrame(
        [
            (100, 1, "2024-01-01 00:05:00"),  # back 00:01->10, fwd 00:07->20
            (101, 1, "2024-01-01 00:07:00"),  # equal ts visible both ways
            (102, 1, "2024-01-01 00:00:30"),  # before all: back null, fwd 10
            (103, 1, "2024-01-01 00:09:00"),  # after all: fwd null, back 20
            (104, 1, None),                   # null ts: null everywhere
            (105, 1, "2024-01-01 00:04:00"),  # nearest tie 00:01/00:07 -> backward
        ],
        "event_id long, uid long, ts_s string",
    ).select("event_id", "uid", F.col("ts_s").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [
            (1, "2024-01-01 00:01:00", 10.0),
            (1, "2024-01-01 00:07:00", 20.0),
        ],
        "uid long, rts_s string, price double",
    ).select("uid", F.col("rts_s").cast("timestamp").alias("rts"), "price")

    def run(direction):
        return {
            r["event_id"]: r["price_asof"]
            for r in asof_join(
                left, right, "uid", "ts", "rts", ["price"], direction=direction
            ).collect()
        }

    assert run("backward") == {
        100: 10.0, 101: 20.0, 102: None, 103: 20.0, 104: None, 105: 10.0
    }
    assert run("forward") == {
        100: 20.0, 101: 20.0, 102: 10.0, 103: None, 104: None, 105: 20.0
    }
    # 100 at 00:05: back 4min vs fwd 2min -> 20; 105 at 00:04: exact tie
    # 3min both ways -> backward 10
    assert run("nearest") == {
        100: 20.0, 101: 20.0, 102: 10.0, 103: 20.0, 104: None, 105: 10.0
    }
    with _pytest.raises(ValueError, match="direction"):
        asof_join(left, right, "uid", "ts", "rts", ["price"], direction="sideways")


def test_sessionize_null_timestamps_sort_last_and_never_start_sessions(spark):
    """Null-ts rows must not spawn phantom sessions nor shift the real
    rows' ordinals: they sort last and inherit the entity's final
    session id (matching SQL engines' NULLS LAST window default)."""
    from mgspark.pipeline.temporal import session_stats, sessionize

    rows = [
        (1, "2024-01-01 00:00:00"),
        (1, None),  # must not become its own session or shift ids
        (1, "2024-01-01 01:00:00"),  # > gap: session 1
        (1, None),
        (2, None),  # entity with only null ts: one session, id 0
    ]
    df = spark.createDataFrame(rows, "uid long, ts_s string").select(
        "uid", F.col("ts_s").cast("timestamp").alias("ts")
    )
    got = {
        (r["uid"], str(r["ts"]), r["session_id"])
        for r in sessionize(df, "uid", "ts", gap_seconds=600).collect()
    }
    assert (1, "2024-01-01 00:00:00", 0) in got
    assert (1, "2024-01-01 01:00:00", 1) in got
    # null-ts rows inherit the final session
    assert (1, "None", 1) in got and (1, "None", 0) not in got
    assert (2, "None", 0) in got
    stats = {
        (r["uid"], r["session_id"]): r["n_events"]
        for r in session_stats(df, "uid", "ts", 600).collect()
    }
    assert stats[(1, 0)] == 1 and stats[(1, 1)] == 3 and stats[(2, 0)] == 1


def test_ngram_short_docs_yield_no_grams(spark):
    """Docs with fewer than n tokens (or empty) must contribute zero
    grams, not crash the job (sequence() turns descending for size<n)."""
    from mgspark.pipeline.dedup import ngram_jaccard_pairs

    df = spark.createDataFrame(
        [
            (1, "just two"),
            (2, ""),
            (3, "a b c d e f g h"),
            (4, "a b c d e f g h"),
        ],
        "doc_id long, text string",
    )
    pairs = ngram_jaccard_pairs(df, "text", "doc_id", n=3, threshold=0.5).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(3, 4)}


def test_hash_sample_null_ids_filtered_not_raised(spark):
    """NULL ids hash to NULL and are filtered consistently (SQL
    semantics), never raised."""
    from mgspark.pipeline.sampling import hash_sample

    df = spark.createDataFrame([(0,), (1,), (None,)], "id long")
    kept = hash_sample(df, "id", 1.0).collect()
    assert {r["id"] for r in kept} == {0, 1}


def test_weighted_sample_proportional_and_deterministic(spark):
    """weighted_sample keeps each row with probability = its weight:
    weight 1 keeps all, 0 keeps none, 0.5 keeps ~half; deterministic
    across partitionings; weights clamp to [0, 1]."""
    from mgspark.pipeline.sampling import weighted_sample

    df = spark.range(0, 30_000).select(
        "id",
        F.when(F.col("id") % 3 == 0, 1.0)
        .when(F.col("id") % 3 == 1, 0.0)
        .otherwise(0.5)
        .alias("w"),
    )
    kept = weighted_sample(df, "id", "w", seed=9)
    counts = {r["w"]: r["c"] for r in kept.groupBy("w").agg(F.count("*").alias("c")).collect()}
    assert counts[1.0] == 10_000
    assert 0.0 not in counts
    assert abs(counts[0.5] - 5_000) < 5 * (10_000 * 0.25) ** 0.5
    a = {r["id"] for r in kept.collect()}
    b = {r["id"] for r in weighted_sample(df.repartition(17), "id", "w", seed=9).collect()}
    assert a == b
    # out-of-range weights clamp
    clamped = weighted_sample(
        df.withColumn("w", F.col("w") * 10 - 2), "id", "w"
    )
    assert clamped.where("w <= 0").count() == 0


def test_repetition_stats_truth(spark):
    """Gopher repetition stats on a hand-checkable corpus: duplicate
    lines counted as extra instances, top bigram argmax with count-desc
    gram-asc tie-break, short/empty/null docs degrade to zeros."""
    from mgspark.pipeline.textstats import repetition_stats

    rows = [
        (0, "x y x y x z"),          # bigrams: "x y":2 "y x":2 "x z":1
        (1, "dup\ndup\ndup\nuniq"),  # 4 lines, 2 dup instances
        (2, ""),
        (3, None),
        (4, "a\n\n  \na"),           # blank/whitespace lines dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r for r in repetition_stats(df, "text", "doc_id").collect()}

    r0 = got[0]
    assert (r0["n_lines"], r0["n_dup_lines"]) == (1, 0)
    # tie at count 2 between "x y" and "y x" -> lexicographically first
    assert (r0["top_ngram"], r0["top_ngram_count"]) == ("x y", 2)
    assert r0["text_chars"] == len("x y x y x z")
    assert r0["top_ngram_char_frac"] == round(2 * 3 / 11, 4)

    r1 = got[1]
    assert (r1["n_lines"], r1["n_dup_lines"]) == (4, 2)
    assert r1["dup_line_chars"] == 6 and r1["line_chars"] == 13
    assert r1["dup_line_frac"] == 0.5
    assert r1["dup_line_char_frac"] == round(6 / 13, 4)
    # the only token contains newlines; size 1 < 2 -> empty top gram
    assert (r1["top_ngram"], r1["top_ngram_count"]) == ("", 0)

    for i in (2, 3):
        r = got[i]
        assert (r["n_lines"], r["n_dup_lines"], r["top_ngram_count"]) == (0, 0, 0)
        assert (r["dup_line_frac"], r["top_ngram"]) == (0.0, "")

    r4 = got[4]
    assert (r4["n_lines"], r4["n_dup_lines"], r4["dup_line_chars"]) == (2, 1, 1)


def test_repetition_stats_ngram_order_and_validation(spark):
    """n=3 trigrams; n < 2 rejected."""
    import pytest as _pytest

    from mgspark.pipeline.textstats import repetition_stats

    df = spark.createDataFrame([(0, "a b c a b c a b")], "doc_id long, text string")
    r = repetition_stats(df, "text", "doc_id", n=3).collect()[0]
    # trigrams: "a b c":2, "b c a":2, "c a b":2 -> lexicographic first
    assert (r["top_ngram"], r["top_ngram_count"]) == ("a b c", 2)
    with _pytest.raises(ValueError):
        repetition_stats(df, "text", "doc_id", n=1)


def test_redact_pii_truth(spark):
    """Emails, IPv4s, long digit runs redacted in order; counts equal
    substitutions; earlier redactions shield later patterns."""
    from mgspark.pipeline.textstats import redact_pii

    rows = [
        (0, "mail bob@example.com or 10.0.0.1 acct 12345678"),
        (1, "x 1.2.3.4@foo.com y"),       # IP-shaped local part -> email
        (2, "ip 9.8.7.6 short 123456"),   # 6 digits: not a long num
        (3, None),
        (4, "nums 1234567 and 999999999999"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r for r in redact_pii(df, "text", "doc_id").collect()}

    assert got[0]["redacted"] == "mail <EMAIL> or <IP> acct <NUM>"
    assert (got[0]["n_emails"], got[0]["n_ips"], got[0]["n_longnums"]) == (1, 1, 1)
    # the whole 1.2.3.4@foo.com is one email; no IP left afterwards
    assert got[1]["redacted"] == "x <EMAIL> y"
    assert (got[1]["n_emails"], got[1]["n_ips"]) == (1, 0)
    assert got[2]["redacted"] == "ip <IP> short 123456"
    assert (got[2]["n_ips"], got[2]["n_longnums"]) == (1, 0)
    assert got[3]["redacted"] == "" and got[3]["n_emails"] == 0
    assert got[4]["redacted"] == "nums <NUM> and <NUM>"
    assert got[4]["n_longnums"] == 2


def test_pack_sequences_truth(spark):
    """Packing layout on one shard: running offsets in id order, chunk
    spans, empty docs occupy no tokens."""
    from mgspark.pipeline.packing import pack_sequences

    rows = [(0, "a b c"), (1, "d e f g h"), (2, ""), (3, "i")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["id"]: r
        for r in pack_sequences(
            df, "text", "doc_id", budget=4, n_shards=1
        ).collect()
    }
    assert [got[i]["tok_start"] for i in range(4)] == [0, 3, 8, 8]
    assert (got[0]["seq_first"], got[0]["seq_last"]) == (0, 0)
    assert (got[1]["seq_first"], got[1]["seq_last"]) == (0, 1)
    assert (got[2]["seq_first"], got[2]["seq_last"]) == (2, 2)  # empty doc
    assert (got[3]["seq_first"], got[3]["seq_last"]) == (2, 2)
    assert all(r["shard"] == 0 for r in got.values())


def test_pack_sequences_deterministic_across_partitionings(spark):
    """Shard assignment and offsets are a pure function of (id, seed):
    identical output under any input partitioning, and shards match the
    Knuth hash computed in plain Python."""
    from mgspark.pipeline.packing import pack_sequences

    rows = [(i, "t " * (i % 7)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(
        (r["id"], r["shard"], r["tok_start"], r["seq_first"], r["seq_last"])
        for r in pack_sequences(df, "text", "doc_id", budget=8, n_shards=4, seed=3).collect()
    )
    b = sorted(
        (r["id"], r["shard"], r["tok_start"], r["seq_first"], r["seq_last"])
        for r in pack_sequences(
            df.repartition(13), "text", "doc_id", budget=8, n_shards=4, seed=3
        ).collect()
    )
    assert a == b
    for row in a:
        assert row[1] == ((row[0] + 3) * 2654435761) % (1 << 32) % 4


def test_packing_stats_truth(spark):
    """Per-shard summary: ceil sequences, exact integer fill basis
    points, float fill_frac consistent."""
    from mgspark.pipeline.packing import pack_sequences, packing_stats

    rows = [(0, "a b c"), (1, "d e f g h"), (2, ""), (3, "i")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = packing_stats(df, "text", "doc_id", budget=4, n_shards=1).collect()[0]
    assert (r["shard"], r["n_docs"], r["total_tokens"]) == (0, 4, 9)
    assert r["n_sequences"] == 3  # ceil(9/4)
    assert r["fill_bp"] == 7500 and r["fill_frac"] == 0.75
    # validation
    import pytest as _pytest

    with _pytest.raises(ValueError):
        pack_sequences(df, "text", "doc_id", budget=0)
    with _pytest.raises(ValueError):
        packing_stats(df, "text", "doc_id", budget=4, n_shards=0)


def test_pack_sequences_null_id_raises(spark):
    """A NULL id would make the packing layout nondeterministic (ties in
    the NULL shard's sort) — it must raise, not mis-pack."""
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    from mgspark.pipeline.packing import pack_sequences

    df = spark.createDataFrame([(0, "a"), (None, "b")], "doc_id long, text string")
    with _pytest.raises(Exception) as e:
        pack_sequences(df, "text", "doc_id", budget=4, n_shards=2).collect()
    assert "NULL doc_id" in str(e.value)


def test_contamination_report_truth(spark):
    """13-gram-style overlap on a hand-built corpus (n=3 for brevity):
    counts are distinct-gram intersections per (doc, bench) pair; both
    hash and string join paths agree."""
    from mgspark.pipeline.decontam import contamination_report

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "totally unrelated text with no overlap here"),
            (2, "quick brown fox quick brown fox"),  # repeated gram: once
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "a quick brown fox appears"), (101, "over the lazy dog")],
        "bench_id long, text string",
    )
    for hg in (True, False):
        got = {
            (r["doc_id"], r["bench_id"]): r["n_shared_grams"]
            for r in contamination_report(
                docs, bench, n=3, hash_grams=hg
            ).collect()
        }
        # doc0 vs 100: "quick brown fox"; doc0 vs 101: "over the lazy",
        # "the lazy dog"; doc2 vs 100: "quick brown fox" (distinct once)
        assert got == {(0, 100): 1, (0, 101): 2, (2, 100): 1}


def test_decontaminate_threshold_and_validation(spark):
    """min_overlap gates removal; kept rows pass through unchanged."""
    import pytest as _pytest

    from mgspark.pipeline.decontam import contamination_report, decontaminate

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "clean document nothing shared at all"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(9, "over the lazy dog indeed")], "bench_id long, text string"
    )
    kept1 = decontaminate(docs, bench, n=3, min_overlap=1)
    assert {r["doc_id"] for r in kept1.collect()} == {1}
    # doc0 shares exactly 2 trigrams; min_overlap=3 keeps it
    kept3 = decontaminate(docs, bench, n=3, min_overlap=3)
    assert {r["doc_id"] for r in kept3.collect()} == {0, 1}
    assert kept1.columns == docs.columns
    with _pytest.raises(ValueError):
        decontaminate(docs, bench, n=3, min_overlap=0)
    with _pytest.raises(ValueError):
        contamination_report(docs, bench, n=0)
    with _pytest.raises(ValueError):
        contamination_report(docs, bench, id_col="x", bench_id_col="x")


def test_contamination_empty_and_null_docs(spark):
    """Empty/NULL texts and too-short docs produce no gram rows and are
    never flagged; an empty bench contaminates nothing."""
    from mgspark.pipeline.decontam import decontaminate

    docs = spark.createDataFrame(
        [(0, None), (1, ""), (2, "one two")], "doc_id long, text string"
    )
    bench = spark.createDataFrame(
        [(9, "one two three")], "bench_id long, text string"
    )
    kept = decontaminate(docs, bench, n=3)
    assert {r["doc_id"] for r in kept.collect()} == {0, 1, 2}
    empty_bench = bench.filter("bench_id < 0")
    assert decontaminate(docs, empty_bench, n=1).count() == 3
