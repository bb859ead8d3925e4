"""Line-level boilerplate removal (pipeline/boilerplate.py): hand-built
truths, order preservation, edge cases, and the broadcast-anti-join
plan pin."""

from mgspark.pipeline.boilerplate import (
    boilerplate_lines,
    line_doc_freq,
    remove_boilerplate_lines,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_line_doc_freq_counts_documents_not_occurrences(spark):
    # "dup" appears twice inside doc 0 but only in 2 distinct docs
    df = _docs(spark, ["dup\nunique-a\ndup", "dup\nunique-b", "unique-c"])
    freq = {r["line"]: r["doc_freq"] for r in line_doc_freq(df, "text", "doc_id").collect()}
    assert freq == {"dup": 2, "unique-a": 1, "unique-b": 1, "unique-c": 1}


def test_remove_boilerplate_preserves_order_and_counts(spark):
    texts = [
        "header\nalpha\nbeta\nfooter",
        "header\ngamma\nfooter",
        "header\ndelta\nfooter",
    ]
    df = _docs(spark, texts)
    out = {
        r["id"]: r
        for r in remove_boilerplate_lines(df, "text", "doc_id", max_doc_freq=2).collect()
    }
    assert out[0]["clean_text"] == "alpha\nbeta"
    assert (out[0]["n_kept"], out[0]["n_removed"]) == (2, 2)
    assert out[1]["clean_text"] == "gamma"
    assert out[2]["clean_text"] == "delta"


def test_remove_boilerplate_all_lines_removed_keeps_row(spark):
    df = _docs(spark, ["x", "x", "x", "x\ny"])
    out = {
        r["id"]: r
        for r in remove_boilerplate_lines(df, "text", "doc_id", max_doc_freq=2).collect()
    }
    assert len(out) == 4
    assert out[0]["clean_text"] == "" and out[0]["n_kept"] == 0 and out[0]["n_removed"] == 1
    assert out[3]["clean_text"] == "y" and out[3]["n_removed"] == 1


def test_remove_boilerplate_duplicate_line_within_doc_consistent(spark):
    # the repeated in-doc line is below threshold -> BOTH copies kept,
    # in order
    df = _docs(spark, ["a\nb\na", "c"])
    out = {
        r["id"]: r["clean_text"]
        for r in remove_boilerplate_lines(df, "text", "doc_id", max_doc_freq=1).collect()
    }
    assert out[0] == "a\nb\na"


def test_threshold_boundary_is_strictly_greater(spark):
    # doc_freq == max_doc_freq stays; only > is boilerplate
    df = _docs(spark, ["edge\nu1", "edge\nu2", "hot\nu3", "hot\nu4", "hot\nu5"])
    hot = {r["line"] for r in boilerplate_lines(df, "text", "doc_id", max_doc_freq=2).collect()}
    assert hot == {"hot"}


def test_remove_boilerplate_plan_broadcasts_hot_set(spark):
    df = _docs(spark, ["a\nb", "a\nc", "a\nd"])
    plan = (
        remove_boilerplate_lines(df, "text", "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, marker


def test_remove_boilerplate_shuffle_fallback_same_result_no_broadcast(spark):
    # broadcast_hot=False is the web-scale path: identical output, and
    # the optimized plan must not FORCE a broadcast hint on the hot set
    # (AQE may still pick one at this toy size; the logical plan is what
    # the gate controls, so pin the absence of the ResolvedHint).
    texts = ["header\nalpha\nfooter", "header\nbeta\nfooter", "header\ngamma\nfooter"]
    df = _docs(spark, texts)
    bc = {
        (r["id"], r["clean_text"], r["n_kept"], r["n_removed"])
        for r in remove_boilerplate_lines(df, "text", "doc_id", max_doc_freq=2).collect()
    }
    sh_df = remove_boilerplate_lines(
        df, "text", "doc_id", max_doc_freq=2, broadcast_hot=False
    )
    sh = {
        (r["id"], r["clean_text"], r["n_kept"], r["n_removed"])
        for r in sh_df.collect()
    }
    assert bc == sh
    logical = sh_df._jdf.queryExecution().optimizedPlan().toString()
    assert "UnresolvedHint" not in logical and "broadcast" not in logical.lower()


def test_remove_boilerplate_joins_on_line_hash_not_raw_string(spark):
    # the anti-join exchanges 8-byte xxhash64 keys, never raw line text
    df = _docs(spark, ["a\nb", "a\nc", "a\nd"])
    plan = (
        remove_boilerplate_lines(df, "text", "doc_id", broadcast_hot=False)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "xxhash64" in plan


def test_separator_is_literal_not_regex(spark):
    # sep='.' must split on the DOT, not on every character; sep='|'
    # must not be alternation
    df = spark.createDataFrame(
        [(0, "hot.u1"), (1, "hot.u2"), (2, "hot.u3")], "doc_id long, text string"
    )
    hot = {
        r["line"]
        for r in boilerplate_lines(df, "text", "doc_id", max_doc_freq=2, sep=".").collect()
    }
    assert hot == {"hot"}
    df2 = spark.createDataFrame(
        [(0, "nav|x"), (1, "nav|y"), (2, "nav|z")], "doc_id long, text string"
    )
    out = {
        r["id"]: r["clean_text"]
        for r in remove_boilerplate_lines(
            df2, "text", "doc_id", max_doc_freq=2, sep="|"
        ).collect()
    }
    assert out == {0: "x", 1: "y", 2: "z"}
