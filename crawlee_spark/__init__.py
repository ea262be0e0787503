"""crawlee_spark — a PySpark-native URL-frontier + fetch-scheduling engine.

A brand-new engine with the query/data-processing capabilities of
apify/crawlee's RequestQueue + crawler loop (reference at /root/reference,
v3.18.0), re-designed for Spark's execution model rather than ported:

- the request queue is a partitioned frontier table (parquet snapshots here,
  Iceberg in production) with deterministic FIFO/forefront `order_no` ordering
  (reference semantics: packages/memory-storage/src/resource-clients/
  request-queue.ts:661-667);
- URL-seen dedup is an exact left-anti join on SHA-256 request ids, prefiltered
  by per-partition Bloom filters (generalizing the reference's
  RequestDeduplicationCache, packages/core/src/storages/request_dedup_cache.ts);
- politeness / priority is window-ranked per-host token budgets with salted
  sub-buckets for hot-domain skew;
- extraction (htmlToText, extractUrlsFromCheerio) runs as vectorized Arrow
  pandas UDFs reproducing the reference byte-identically per URL
  (packages/utils/src/internals/cheerio.ts).

Everything here derives from public knowledge only: the Apache Spark / PySpark
API and the reference repo's observable behavior.
"""

__version__ = "0.1.0"

from crawlee_spark.session import get_spark  # noqa: F401
