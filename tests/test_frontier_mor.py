"""Merge-on-read frontier: delta commits, compaction, resume, equivalence."""

import os

import pytest
from pyspark.sql import functions as F

from crawlee_spark.operators.engine import CrawlEngine, CrawlOptions
from crawlee_spark.operators.enqueue import EnqueueOptions
from crawlee_spark.operators.frontier import FrontierStore
from crawlee_spark.operators.scheduler import PolitenessPolicy
from crawlee_spark.sources.fixtures import make_pages, make_seeds


def crawl(spark, root, mor: bool, rounds: int = 3):
    store = FrontierStore(
        spark, root, num_partitions=4, merge_on_read=mor, compact_every=100
    )
    engine = CrawlEngine(
        spark,
        store,
        make_pages(spark, n_pages=40),
        policy=PolitenessPolicy(max_concurrency=16, per_host_cap=8),
        options=CrawlOptions(enqueue=EnqueueOptions(strategy="same-hostname")),
    )
    engine.add_seeds(make_seeds(spark, n=4))
    for _ in range(rounds):
        if engine.run_round().get("done"):
            break
    return store, engine


def snapshot_of(store):
    rows = store.read().select(
        "request_id", "url", "order_no", "handled_at", "failed", "state", "retry_count"
    ).collect()
    return sorted(tuple(r) for r in rows)


def test_mor_equals_full_rewrite(spark, tmp_store_dir):
    s_full, _ = crawl(spark, os.path.join(tmp_store_dir, "full"), mor=False)
    s_mor, _ = crawl(spark, os.path.join(tmp_store_dir, "mor"), mor=True)
    assert snapshot_of(s_mor) == snapshot_of(s_full)
    # MOR actually produced deltas (no base snapshot ever written)
    assert s_mor._manifest["deltas"], "expected outstanding delta files"
    # each delta touched O(claimed+fresh) rows, not the whole frontier
    touched = [h["rows_touched"] for h in s_mor._manifest["history"] if "delta" in h]
    total = s_mor.read().count()
    assert all(t <= total for t in touched) and len(touched) >= 3


def test_mor_compaction(spark, tmp_store_dir):
    store = FrontierStore(
        spark, tmp_store_dir, num_partitions=4, merge_on_read=True, compact_every=2
    )
    store.add_requests(
        spark.createDataFrame([(f"http://a.com/{i}",) for i in range(10)], "url string")
    )
    before = snapshot = None
    # two delta commits trigger a compaction into a base snapshot
    d1 = store.read().withColumn("retry_count", F.lit(1))
    store.commit_delta(d1.limit(3))
    before = sorted(r["request_id"] for r in store.read().collect())
    d2 = store.read().withColumn("retry_count", F.lit(2))
    store.commit_delta(d2.limit(2))  # hits compact_every=2 → compaction
    assert store._manifest["deltas"] == []  # absorbed into the base
    after = sorted(r["request_id"] for r in store.read().collect())
    assert after == before  # same key set survives compaction


def test_mor_resume_with_outstanding_deltas(spark, tmp_store_dir):
    store, _ = crawl(spark, tmp_store_dir, mor=True, rounds=2)
    expect = snapshot_of(store)
    # crash: brand-new store object over the same directory mid-delta-chain
    store2 = FrontierStore(spark, tmp_store_dir, num_partitions=4, merge_on_read=True)
    assert store2._manifest["deltas"] == store._manifest["deltas"]
    assert snapshot_of(store2) == expect
