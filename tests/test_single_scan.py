"""Single-scan release paths.

The DP / user-level / weighted / streaming release queries must decode
hashed keys from the exemplar tokens carried inside the sketch rows —
never via ``decode_keys`` (a second full scan of the input, which at
100 TB doubles the dominant cost of every DP query).  Pinned by
poisoning ``decode_keys`` and running the release paths end-to-end.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

import mgspark.aggregate as agg


@pytest.fixture()
def no_decode_rescan(monkeypatch):
    def boom(*args, **kwargs):  # pragma: no cover - failure path
        raise AssertionError(
            "decode_keys called: a release path re-scanned the input"
        )

    monkeypatch.setattr(agg, "decode_keys", boom)


def _tokens_df(spark):
    rows = [(tok,) for tok in ["apple"] * 40 + ["pear"] * 25 + ["plum"] * 10]
    return spark.createDataFrame(rows, "token string")


@pytest.mark.parametrize("pre_aggregate", [True, False])
def test_exemplars_cover_all_keys(spark, pre_aggregate, no_decode_rescan):
    df = agg.encode_tokens(_tokens_df(spark), "token")
    state, exemplars = agg.mg_sketch_with_tokens(
        df, "key", 8, token_col="token", pre_aggregate=pre_aggregate
    )
    assert len(state.keys) == 3
    assert {exemplars[int(k)] for k in state.keys} == {"apple", "pear", "plum"}


def test_weighted_build_carries_exemplars(spark, no_decode_rescan):
    pre = _tokens_df(spark).groupBy("token").agg(F.count("*").alias("w"))
    df = agg.encode_tokens(pre, "token")
    state, exemplars = agg.mg_sketch_with_tokens(
        df, "key", 8, token_col="token", weight_col="w"
    )
    est = {exemplars[int(k)]: int(c) for k, c in zip(state.keys, state.counters)}
    assert est == {"apple": 40, "pear": 25, "plum": 10}


def test_user_level_release_returns_tokens(spark, no_decode_rescan):
    rows = [(i % 7, ["click", "view", "buy"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, "user_id long, event string")
    released, mapping = agg.mg_user_level_release(
        df, "user_id", "event", k=5, epsilon=80.0, delta=1e-2,
        rng=np.random.default_rng(7), return_tokens=True,
    )
    # approx-DP never invents keys -> every released key decodes
    assert set(released) <= set(mapping)
    assert set(mapping.values()) <= {"click", "view", "buy"}


def test_driver_dp_queries_run_without_decode_rescan(
    spark, sf_dir, no_decode_rescan
):
    import __spark_entry__ as entry

    for q in (
        entry.q_mg_private_topk_event_type,
        entry.q_mg_user_level_event_type,
        entry.q_mg_topk_weighted,
    ):
        rows = q(spark, sf_dir).collect()
        # any released token must be a decoded string, not a hash rendered
        # as digits (the un-decoded fallback)
        for r in rows:
            assert not r["token"].isdigit(), (q.__name__, r)


def test_streaming_mg_decodes_from_state_tokens(spark, sf_dir, no_decode_rescan):
    import __spark_entry__ as entry

    rows = entry.q_streaming_mg_event_type(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert not r["token"].isdigit(), r
