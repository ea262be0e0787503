"""Crawl-order + URL-seen-set parity vs reference semantics (north rule).

An independent in-memory simulator reimplements Crawlee's RequestQueue
contract exactly as documented in the reference source — uniqueKey
normalization (request.ts:418-440), first-wins dedup (request-queue.ts:
384-396), signed orderNo FIFO/forefront ordering (request-queue.ts:661-667),
ascending-head claiming (request-queue.ts:224), breadth-first link discovery
— and the Spark engine must produce the identical per-round claim order and
the identical final URL-seen set on the same seed list + politeness budget.

The simulator shares NO code with the engine except the pure-Python
normalize kernel (which is itself pinned by golden vectors), so agreement is
two independent derivations of the reference contract."""

from collections import OrderedDict

import pytest
from pyspark.sql import functions as F

from crawlee_spark.functions.keying import normalize_url_py, request_id_py
from crawlee_spark.operators.engine import CrawlEngine, CrawlOptions
from crawlee_spark.operators.enqueue import EnqueueOptions
from crawlee_spark.operators.frontier import FrontierStore
from crawlee_spark.operators.scheduler import PolitenessPolicy

# deterministic 3-host page graph: each page links to two others
HOSTS = ["a.example.com", "b.example.com", "c.example.com"]
N_PER_HOST = 6


def page_url(host_i: int, page_i: int) -> str:
    return f"https://{HOSTS[host_i]}/p{page_i}"


def links_of(host_i: int, page_i: int) -> list[str]:
    # same-host next page + cross-host page (dropped by same-hostname gate)
    return [
        page_url(host_i, (page_i + 1) % N_PER_HOST),
        page_url((host_i + 1) % len(HOSTS), page_i),
    ]


def make_pages(spark):
    rows = []
    for h in range(len(HOSTS)):
        for p in range(N_PER_HOST):
            anchors = "".join(f'<a href="{u}">x</a>' for u in links_of(h, p))
            html = f"<html><body><p>page {h}-{p}</p>{anchors}</body></html>"
            rows.append((page_url(h, p), html.encode()))
    return spark.createDataFrame(rows, "url string, html binary")


SEEDS = [page_url(0, 0), page_url(1, 0), page_url(2, 3)]
PER_HOST_BUDGET = 1  # one fetch per registrable domain per round
MAX_CONCURRENCY = 2  # global pool cap per round


def simulate():
    """Reference-semantics simulator: returns (per-round claim lists, seen set)."""
    seen: OrderedDict[str, dict] = OrderedDict()  # request_id → row
    seq = 0

    def enqueue(urls):
        nonlocal seq
        for u in urls:
            key = normalize_url_py(u) or u
            rid = request_id_py(key)
            if rid in seen:
                continue  # wasAlreadyPresent: not updated
            seq += 1
            seen[rid] = {"url": u, "order_no": seq, "handled": False}

    enqueue(SEEDS)
    trace = []
    for _ in range(100):
        pending = sorted(
            (r for r in seen.values() if not r["handled"]), key=lambda r: r["order_no"]
        )
        # politeness: ≤ budget per registrable domain, in head order
        per_host: dict[str, int] = {}
        claimed = []
        for r in pending:
            host = r["url"].split("/")[2]
            domain = ".".join(host.split(".")[-2:])
            if per_host.get(domain, 0) >= PER_HOST_BUDGET:
                continue
            per_host[domain] = per_host.get(domain, 0) + 1
            claimed.append(r)
        claimed = claimed[:MAX_CONCURRENCY]
        if not claimed:
            break
        trace.append([r["url"] for r in claimed])
        discovered = []
        for r in claimed:
            r["handled"] = True
            host_i = HOSTS.index(r["url"].split("/")[2])
            page_i = int(r["url"].rsplit("p", 1)[1])
            for link in links_of(host_i, page_i):
                if link.split("/")[2] == r["url"].split("/")[2]:  # same-hostname gate
                    discovered.append(link)
        enqueue(discovered)
    return trace, set(seen)


def run_engine(spark, tmp_store_dir):
    store = FrontierStore(spark, tmp_store_dir, num_partitions=4)
    engine = CrawlEngine(
        spark,
        store,
        make_pages(spark),
        policy=PolitenessPolicy(
            max_concurrency=MAX_CONCURRENCY, per_host_cap=PER_HOST_BUDGET, salt_buckets=4
        ),
        options=CrawlOptions(enqueue=EnqueueOptions(strategy="same-hostname"), max_rounds=100),
    )
    engine.add_seeds(spark.createDataFrame([(u,) for u in SEEDS], "url string"))
    engine.run(None)
    # claim order per round from the outcomes log (one attempt row per claim)
    trace_rows = engine.outcomes().orderBy("round_id", "attempt").collect()
    by_round: dict[int, list[str]] = {}
    frontier = store.read()
    order = {r["request_id"]: r["order_no"] for r in frontier.collect()}
    for r in trace_rows:
        by_round.setdefault(r["round_id"], []).append((order[r["request_id"]], r["url"]))
    trace = [[u for _, u in sorted(v)] for _, v in sorted(by_round.items())]
    seen_ids = {r["request_id"] for r in frontier.collect()}
    return trace, seen_ids


def test_crawl_order_and_seen_set_parity(spark, tmp_store_dir):
    expected_trace, expected_seen = simulate()
    got_trace, got_seen = run_engine(spark, tmp_store_dir)
    assert got_seen == expected_seen  # identical URL-seen set (request ids)
    assert got_trace == expected_trace  # identical claim order, every round
