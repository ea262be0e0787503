"""Structured Streaming wrappers: enqueue sink, windowed stats, sessions."""

import os

import pytest
from pyspark.sql import functions as F

from crawlee_spark.operators.frontier import FrontierStore
from crawlee_spark.streaming.stream import (
    stream_enqueue,
    stream_sessionize,
    stream_statistics,
)


def _file_stream(spark, tmp_dir, rows, schema, name):
    src = os.path.join(tmp_dir, f"src_{name}")
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(src)
    return spark.readStream.schema(schema).parquet(src)


def test_stream_enqueue_dedups_into_frontier(spark, tmp_store_dir):
    store = FrontierStore(spark, os.path.join(tmp_store_dir, "frontier"), num_partitions=4)
    urls = [(f"http://example.com/{i % 4}",) for i in range(10)]  # heavy dups
    stream = _file_stream(spark, tmp_store_dir, urls, "url string", "urls")
    q = stream_enqueue(
        stream, store, checkpoint_dir=os.path.join(tmp_store_dir, "ckpt")
    )
    q.awaitTermination(120)
    assert store.read().count() == 4  # anti-join absorbed the duplicates
    # replaying the same batch is idempotent (at-least-once input, once effect)
    store.add_requests(spark.createDataFrame(urls, "url string"))
    assert store.read().count() == 4


def test_stream_statistics_windowed(spark, tmp_store_dir):
    rows = [
        ("2026-01-01 00:00:05", "success", 10),
        ("2026-01-01 00:00:20", "success", 30),
        ("2026-01-01 00:00:40", "fail", 50),
        ("2026-01-01 00:01:10", "success", 20),
    ]
    schema = "ts_s string, outcome string, duration_ms long"
    stream = _file_stream(spark, tmp_store_dir, rows, schema, "outcomes").withColumn(
        "ts", F.to_timestamp("ts_s")
    )
    agg = stream_statistics(stream, window_secs=60, watermark_secs=120)
    q = (
        agg.writeStream.format("memory")
        .queryName("stats_t")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["win"]["start"].second + r["win"]["start"].minute * 60, r["outcome"]): (
            r["n"],
            r["total_duration_ms"],
        )
        for r in spark.sql("SELECT * FROM stats_t").collect()
    }
    assert got[(0, "success")] == (2, 40)
    assert got[(0, "fail")] == (1, 50)
    assert got[(60, "success")] == (1, 20)


def test_stream_sessionize(spark, tmp_store_dir):
    rows = [
        (1, "2026-01-01 00:00:00"),
        (1, "2026-01-01 00:10:00"),   # same session (gap < 30 min)
        (1, "2026-01-01 02:00:00"),   # new session
        (2, "2026-01-01 00:00:00"),
    ]
    schema = "user_id long, ts_s string"
    stream = _file_stream(spark, tmp_store_dir, rows, schema, "events").withColumn(
        "ts", F.to_timestamp("ts_s")
    )
    agg = stream_sessionize(stream, gap_secs=1800, watermark_secs=7200)
    q = (
        agg.writeStream.format("memory")
        .queryName("sess_t")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT user_id, n_events FROM sess_t").collect()
    per_user = {}
    for r in rows:
        per_user.setdefault(r["user_id"], []).append(r["n_events"])
    assert sorted(per_user[1]) == [1, 2]  # two sessions: 2 events + 1 event
    assert per_user[2] == [1]


def test_stream_host_rate_limit_stateful(spark, tmp_store_dir):
    """applyInPandasWithState token bucket: credit carries ACROSS
    micro-batches (batch 1 under-uses the budget; batch 2 spends the carried
    credit), non-admitted rows are flagged, never dropped."""
    import time

    from crawlee_spark.streaming.stream import stream_host_rate_limit

    src = os.path.join(tmp_store_dir, "src_rl")
    schema = "host string, url string"
    # batch 1: host a uses 1 of 2 tokens (credit 1 carries); host b floods
    b1 = [("a", "http://a/1")] + [("b", f"http://b/{i}") for i in range(5)]
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)  # distinct mtimes → maxFilesPerTrigger splits batches
    # batch 2: host a brings 3 → 2 fresh + 1 carried = all admitted
    b2 = [("a", f"http://a/{i}") for i in range(2, 5)]
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    gated = stream_host_rate_limit(stream, budget_per_batch=2)
    q = (
        gated.writeStream.format("memory")
        .queryName("rl_t")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmp_store_dir, "ckpt_rl"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM rl_t").collect()
    admitted = {r["url"] for r in rows if r["admitted"]}
    refused = {r["url"] for r in rows if not r["admitted"]}
    # host a: all 4 admitted (1 in batch 1; 3 in batch 2 thanks to credit)
    assert {u for u in admitted if u.startswith("http://a/")} == {
        "http://a/1", "http://a/2", "http://a/3", "http://a/4"
    }
    # host b: exactly 2 of 5 admitted in batch 1 (deterministic: url order)
    assert {u for u in admitted if u.startswith("http://b/")} == {"http://b/0", "http://b/1"}
    assert len(refused) == 3
    # nothing lost: every input row emitted exactly once
    assert len(rows) == len(b1) + len(b2)
