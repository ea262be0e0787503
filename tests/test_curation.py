"""Corpus-curation operators: deterministic splits/shards + sequence packing."""

import pytest
from pyspark.sql import functions as F

from tests.test_plans import explain_str


def test_hash_split_stable_and_corpus_independent(spark):
    """A document's split label is a pure function of its id: recomputing on
    a SUBSET of the corpus (a recrawl) yields identical labels, and labels
    cover exactly the declared names with roughly the declared mass."""
    from crawlee_spark.operators.curation import hash_split_col

    df = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    w = {"train": 90, "val": 5, "test": 5}
    full = {
        r["doc_id"]: r["s"]
        for r in df.select("doc_id", hash_split_col("doc_id", w).alias("s")).collect()
    }
    sub = {
        r["doc_id"]: r["s"]
        for r in df.filter(F.col("doc_id") % 3 == 0)
        .select("doc_id", hash_split_col("doc_id", w).alias("s"))
        .collect()
    }
    assert all(full[k] == v for k, v in sub.items())
    assert set(full.values()) == {"train", "val", "test"}
    n_train = sum(1 for v in full.values() if v == "train")
    assert 0.85 <= n_train / len(full) <= 0.95  # md5 buckets ~ uniform
    # an independent salt draws a DIFFERENT split
    resalted = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id", hash_split_col("doc_id", w, salt="v2").alias("s")
        ).collect()
    }
    assert any(resalted[k] != full[k] for k in full)


def test_shard_col_range_and_stability(spark):
    from crawlee_spark.operators.curation import shard_col

    df = spark.range(0, 500).select(F.col("id").alias("doc_id"))
    shards = df.select("doc_id", shard_col("doc_id", 8).alias("sh"))
    vals = {r["sh"] for r in shards.select("sh").distinct().collect()}
    assert vals == set(range(8))  # all shards populated, none out of range
    a = {r["doc_id"]: r["sh"] for r in shards.collect()}
    b = {r["doc_id"]: r["sh"] for r in shards.collect()}
    assert a == b


def test_global_prefix_sum_matches_sequential(spark):
    from crawlee_spark.operators.curation import global_prefix_sum

    rows = [(i, (i * 7) % 13) for i in range(300)]
    df = spark.createDataFrame(rows, "k long, v long").repartition(7)
    got = {
        r["k"]: r["_prefix"]
        for r in global_prefix_sum(df, "k", "v", partitions=5).collect()
    }
    acc = 0
    for k, v in rows:  # already in k order
        assert got[k] == acc, k
        acc += v


def test_pack_sequences_hand_vector(spark):
    from crawlee_spark.operators.curation import pack_sequences

    df = spark.createDataFrame(
        [(1, 5), (2, 3), (3, 4), (4, 10), (5, 0)], "doc_id long, n_tokens long"
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in pack_sequences(df, window_size=8, partitions=2).collect()
    }
    # starts: 0, 5, 8, 12, 22
    assert [got[i]["start_tok"] for i in (1, 2, 3, 4, 5)] == [0, 5, 8, 12, 22]
    assert [got[i]["window_id"] for i in (1, 2, 3, 4, 5)] == [0, 0, 1, 1, 2]
    assert [got[i]["offset_in_window"] for i in (1, 2, 3, 4, 5)] == [0, 5, 0, 4, 6]
    # last token positions 4, 7, 11, 21; empty doc 5 "lands" at its start
    assert [got[i]["end_window_id"] for i in (1, 2, 3, 4, 5)] == [0, 0, 1, 2, 2]


def test_pack_sequences_no_unpartitioned_window(spark):
    """The prefix sum must never funnel the corpus through one window task:
    every WindowExec in the plan carries a partition spec."""
    from crawlee_spark.operators.curation import pack_sequences

    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 50 + 1).alias("n_tokens")
    )
    plan = explain_str(pack_sequences(df, window_size=64), "simple")
    assert "Window" in plan
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            spec = line.split("windowspecdefinition")[1]
            assert "_pid" in spec[:80], f"unpartitioned window: {line.strip()}"


def test_hash_split_rejects_bad_weights(spark):
    from crawlee_spark.operators.curation import hash_split_col, shard_col

    with pytest.raises(ValueError):
        hash_split_col("doc_id", {})
    with pytest.raises(ValueError):
        hash_split_col("doc_id", {"train": 0})
    with pytest.raises(ValueError):
        shard_col("doc_id", 0)
