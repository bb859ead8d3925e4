"""Sharded sink (pipeline/sink.py): manifest oracle parity, write/verify
round trip, corruption detection, determinism across partitionings, and
the plan pin."""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from mgspark.pipeline.sink import (
    shard_expr,
    shard_manifest,
    shard_manifest_oracle_sql,
    verify_shards,
    write_sharded,
)

ROWS = [
    (i, f"doc {i} body {'x ' * (i % 5)}".strip(), ["en", "fr", None][i % 3])
    for i in range(40)
]
SCHEMA = "doc_id long, text string, lang string"


def _mk(spark, rows=ROWS):
    return spark.createDataFrame(rows, SCHEMA)


def test_manifest_matches_duckdb_oracle_exactly(spark):
    df = _mk(spark)
    got = {
        r["shard"]: (r["n_rows"], r["checksum"], r["n_tokens"])
        for r in shard_manifest(
            df, "doc_id", ["text", "lang"], n_shards=8, seed=7, text_col="text"
        ).collect()
    }
    con = duckdb.connect()
    con.register("docs_arrow", df.toPandas())
    con.execute("CREATE TABLE docs AS SELECT * FROM docs_arrow")
    oracle = con.execute(
        shard_manifest_oracle_sql(
            "docs", "doc_id", ["text", "lang"], n_shards=8, seed=7, text_col="text"
        )
    ).fetchall()
    assert got == {s: (n, c, t) for s, n, c, t in oracle}
    assert sum(n for n, _, _ in got.values()) == len(ROWS)


def test_manifest_independent_of_input_partitioning(spark):
    df = _mk(spark)
    one = shard_manifest(df.coalesce(1), "doc_id", ["text"], n_shards=4).collect()
    many = shard_manifest(df.repartition(13), "doc_id", ["text"], n_shards=4).collect()
    key = lambda rows: sorted((r["shard"], r["n_rows"], r["checksum"]) for r in rows)
    assert key(one) == key(many)


def test_write_verify_round_trip(spark, tmp_path):
    df = _mk(spark)
    path = str(tmp_path / "export")
    manifest = write_sharded(df, path, "doc_id", ["text", "lang"], n_shards=4, seed=1)
    assert manifest.agg(F.sum("n_rows")).first()[0] == len(ROWS)
    # each shard directory written by exactly one task -> one data file
    data_dir = os.path.join(path, "data")
    for d in os.listdir(data_dir):
        if d.startswith("shard="):
            files = [f for f in os.listdir(os.path.join(data_dir, d)) if f.endswith(".parquet")]
            assert len(files) == 1, (d, files)
    assert verify_shards(spark, path, "doc_id", ["text", "lang"], n_shards=4, seed=1).count() == 0
    # read-back preserves every row
    back = spark.read.parquet(data_dir)
    assert back.count() == len(ROWS)
    assert back.select("doc_id").distinct().count() == len(ROWS)


def test_write_verify_round_trip_jsonl(spark, tmp_path):
    # JSONL export: same shard assignment and manifest as parquet
    # (fingerprints are value-based, format-independent), verify_shards
    # empty, every row preserved on read-back.
    df = _mk(spark)
    path = str(tmp_path / "export_json")
    manifest = write_sharded(
        df, path, "doc_id", ["text", "lang"], n_shards=4, seed=1, format="json"
    )
    ppath = str(tmp_path / "export_pq")
    pq_manifest = write_sharded(df, ppath, "doc_id", ["text", "lang"], n_shards=4, seed=1)
    key = lambda m: sorted((r["shard"], r["n_rows"], r["checksum"]) for r in m.collect())
    assert key(manifest) == key(pq_manifest)
    data_dir = os.path.join(path, "data")
    for d in os.listdir(data_dir):
        if d.startswith("shard="):
            files = [f for f in os.listdir(os.path.join(data_dir, d)) if f.endswith(".json")]
            assert len(files) == 1, (d, files)
    assert (
        verify_shards(
            spark, path, "doc_id", ["text", "lang"], n_shards=4, seed=1,
            format="json", schema=df.schema,
        ).count()
        == 0
    )
    # schema is REQUIRED for json: inference drops all-null columns
    with pytest.raises(ValueError, match="schema"):
        verify_shards(
            spark, path, "doc_id", ["text", "lang"], n_shards=4, seed=1,
            format="json",
        )
    back = spark.read.schema(SCHEMA).json(data_dir)
    assert back.count() == len(ROWS)
    assert back.select("doc_id").distinct().count() == len(ROWS)
    # the files are genuine JSONL: one parseable object per line
    import json

    shard_dir = next(d for d in sorted(os.listdir(data_dir)) if d.startswith("shard="))
    fname = next(
        f for f in os.listdir(os.path.join(data_dir, shard_dir)) if f.endswith(".json")
    )
    with open(os.path.join(data_dir, shard_dir, fname)) as fh:
        lines = [json.loads(line) for line in fh if line.strip()]
    assert lines and all("doc_id" in obj for obj in lines)


def test_verify_json_survives_all_null_checksum_column(spark, tmp_path):
    # The failure mode the schema= requirement exists for: JSONL omits
    # null fields, so an all-null checksum column vanishes from every
    # written object; inference would never see it and the manifest
    # recompute would reference a nonexistent column.  With the explicit
    # schema the intact export verifies clean.
    df = _mk(spark).withColumn("lang", F.lit(None).cast("string"))
    path = str(tmp_path / "export_nulls")
    write_sharded(
        df, path, "doc_id", ["text", "lang"], n_shards=2, seed=1, format="json"
    )
    assert (
        verify_shards(
            spark, path, "doc_id", ["text", "lang"], n_shards=2, seed=1,
            format="json", schema=df.schema,
        ).count()
        == 0
    )


def test_write_sharded_rejects_unknown_format(spark, tmp_path):
    df = _mk(spark)
    with pytest.raises(ValueError, match="format"):
        write_sharded(df, str(tmp_path / "x"), "doc_id", ["text"], format="csv")
    with pytest.raises(ValueError, match="format"):
        verify_shards(spark, str(tmp_path / "x"), "doc_id", ["text"], format="orc")


def test_verify_detects_tampering(spark, tmp_path):
    df = _mk(spark)
    path = str(tmp_path / "export")
    write_sharded(df, path, "doc_id", ["text"], n_shards=2, seed=0)
    # drop one shard directory -> 'missing'
    import shutil

    data_dir = os.path.join(path, "data")
    victim = next(d for d in sorted(os.listdir(data_dir)) if d.startswith("shard="))
    shutil.rmtree(os.path.join(data_dir, victim))
    kinds = {
        r["kind"] for r in verify_shards(spark, path, "doc_id", ["text"], n_shards=2).collect()
    }
    assert kinds == {"missing"}


def test_verify_detects_content_mismatch(spark, tmp_path):
    df = _mk(spark)
    path = str(tmp_path / "export")
    write_sharded(df, path, "doc_id", ["text"], n_shards=2, seed=0)
    # rewrite one shard with altered text -> checksum mismatch
    data_dir = os.path.join(path, "data")
    victim = next(d for d in sorted(os.listdir(data_dir)) if d.startswith("shard="))
    vdir = os.path.join(data_dir, victim)
    # materialize before rewriting: a lazy plan over vdir would read
    # its own overwrite's deleted files
    rows = spark.read.parquet(vdir).collect()
    schema = spark.read.parquet(vdir).schema
    tampered = spark.createDataFrame(
        [tuple("evil" if f.name == "text" else r[f.name] for f in schema.fields) for r in rows],
        schema,
    )
    tampered.coalesce(1).write.mode("overwrite").parquet(vdir)
    kinds = {
        r["kind"] for r in verify_shards(spark, path, "doc_id", ["text"], n_shards=2).collect()
    }
    assert kinds == {"mismatch"}


def test_null_id_raises_and_bad_args(spark, tmp_path):
    df = spark.createDataFrame([(None, "t", "en")], SCHEMA)
    with pytest.raises(Exception, match="NULL"):
        shard_manifest(df, "doc_id", ["text"]).collect()
    with pytest.raises(ValueError):
        shard_manifest(_mk(spark), "doc_id", [])
    with pytest.raises(ValueError):
        shard_expr("doc_id", 0)
    # engine-dependent stringification rejected up front
    doubled = _mk(spark).withColumn("score", F.lit(1e8))
    with pytest.raises(ValueError, match="stringify"):
        shard_manifest(doubled, "doc_id", ["score"])
    # a pre-existing shard column would be silently destroyed -> reject
    with pytest.raises(ValueError, match="shard"):
        write_sharded(
            _mk(spark).withColumn("shard", F.lit(1)),
            str(tmp_path / "x"),
            "doc_id",
            ["text"],
        )


def test_null_vs_nul_byte_fingerprints_differ(spark):
    # 'N' tag vs 'V\x00' value: NULL and a literal NUL must not collide
    a = spark.createDataFrame([(1, "t", None)], SCHEMA)
    b = spark.createDataFrame([(1, "t", "\x00")], SCHEMA)
    ca = shard_manifest(a, "doc_id", ["lang"]).first()["checksum"]
    cb = shard_manifest(b, "doc_id", ["lang"]).first()["checksum"]
    assert ca != cb


def test_manifest_plan_is_pure_jvm_single_agg(spark):
    m = shard_manifest(_mk(spark), "doc_id", ["text"], n_shards=8, text_col="text")
    plan = m._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, marker
    # one exchange: the final-aggregate shuffle, nothing else
    assert plan.count("Exchange") == 1, plan
