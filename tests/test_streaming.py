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
