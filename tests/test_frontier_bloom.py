"""FrontierStore with the Bloom prefilter enabled: identical semantics."""

from pyspark.sql import functions as F

from crawlee_spark.operators.frontier import FrontierStore


def test_store_bloom_dedup_idempotence(spark, tmp_store_dir):
    store = FrontierStore(spark, tmp_store_dir, num_partitions=4, bloom_buckets=8)
    store.add_requests(
        spark.createDataFrame([(f"http://example.com/{i}",) for i in range(50)], "url string")
    )
    assert store.read().count() == 50
    # re-add 30 seen + 20 new through the bloom path
    store.add_requests(
        spark.createDataFrame(
            [(f"http://example.com/{i}",) for i in range(20, 70)], "url string"
        )
    )
    assert store.read().count() == 70
    # every request_id unique (no duplicate slipped past the filter)
    assert store.read().select("request_id").distinct().count() == 70
