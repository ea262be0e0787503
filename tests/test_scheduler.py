"""Scheduling: per-host politeness budgets, skew-safe top-k, leases."""

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from crawlee_spark.operators.frontier import FrontierStore
from crawlee_spark.operators.scheduler import (
    PolitenessPolicy,
    claim_round,
    eligible_requests,
    per_key_topk,
)


def frontier_with(spark, tmp_store_dir, urls):
    store = FrontierStore(spark, tmp_store_dir, num_partitions=4)
    store.add_requests(spark.createDataFrame([(u,) for u in urls], "url string"))
    return store


def test_per_host_budget(spark, tmp_store_dir):
    urls = [f"https://a.com/{i}" for i in range(10)] + [f"https://b.com/{i}" for i in range(10)]
    store = frontier_with(spark, tmp_store_dir, urls)
    pol = PolitenessPolicy(max_concurrency=100, per_host_cap=3, salt_buckets=4)
    claimed = claim_round(store.read(), 1, pol).collect()
    by_host = {}
    for r in claimed:
        by_host.setdefault(r["host"], []).append(r["order_no"])
    assert set(by_host) == {"a.com", "b.com"}
    for host, orders in by_host.items():
        assert len(orders) == 3
        # budget takes the head (lowest order_no) of each host
        assert sorted(orders) == orders


def test_same_domain_delay_budget():
    pol = PolitenessPolicy(same_domain_delay_secs=5.0, round_secs=10.0)
    assert pol.host_budget == 2
    pol2 = PolitenessPolicy(same_domain_delay_secs=10.0, round_secs=10.0)
    assert pol2.host_budget == 1
    pol3 = PolitenessPolicy(same_domain_delay_secs=0.0, per_host_cap=25)
    assert pol3.host_budget == 25


def test_global_concurrency_cap(spark, tmp_store_dir):
    urls = [f"https://h{i}.com/p" for i in range(30)]
    store = frontier_with(spark, tmp_store_dir, urls)
    pol = PolitenessPolicy(max_concurrency=7, per_host_cap=5)
    claimed = claim_round(store.read(), 1, pol)
    rows = claimed.collect()
    assert len(rows) == 7
    # global cut keeps the lowest order_no overall (head of the queue)
    orders = sorted(r["order_no"] for r in rows)
    assert orders == list(range(1, 8))


def test_per_key_topk_exact_under_salting(spark):
    # 1 hot key with 500 rows, 3 cold keys with 5 each; k=4
    rows = [("hot", i) for i in range(500)] + [
        (f"cold{j}", 1000 + i) for j in range(3) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "k string, o long").withColumn(
        "request_id", F.concat(F.col("k"), F.lit("-"), F.col("o"))
    )
    got = per_key_topk(df, key="k", order_col="o", k=4, salt_buckets=8).collect()
    by_key = {}
    for r in got:
        by_key.setdefault(r["k"], []).append(r["o"])
    assert sorted(by_key["hot"]) == [0, 1, 2, 3]  # exact top-4 despite salting
    for j in range(3):
        assert sorted(by_key[f"cold{j}"]) == [1000, 1001, 1002, 1003]


def test_eligibility_lease_and_handled(spark, tmp_store_dir):
    store = frontier_with(spark, tmp_store_dir, [f"https://a.com/{i}" for i in range(4)])
    # order_no is a sparse sequence — key the scenario off the FIFO rank
    w = Window.orderBy("order_no")
    f = store.read().withColumn("_rk", F.row_number().over(w))
    # rank 1 handled, rank 2 leased in current round, rank 3 leased in old round
    f = (
        f.withColumn(
            "handled_at",
            F.when(F.col("_rk") == 1, F.to_timestamp(F.lit("2026-01-01"))).otherwise(None),
        )
        .withColumn(
            "lease_until",
            F.when(F.col("_rk") == 2, F.lit(5).cast("long"))
            .when(F.col("_rk") == 3, F.lit(2).cast("long"))
            .otherwise(F.lit(None).cast("long")),
        )
    )
    elig = eligible_requests(f, round_id=5)
    got = sorted(r["_rk"] for r in elig.collect())
    # rk1 handled (out), rk2 lease==5 not expired (out), rk3 lease 2<5 expired (in), rk4 free (in)
    assert got == [3, 4]


def test_global_row_number_matches_global_sort(spark):
    """Two-phase rank ≡ row_number over a global sort, for unique keys —
    including stability across a scrambled input order."""
    from crawlee_spark.operators.scheduler import global_row_number

    vals = [((i * 7919) % 1000,) for i in range(1000)]  # unique, scrambled
    df = spark.createDataFrame(vals, "order_no long").repartition(7)
    ranked = global_row_number(df, "order_no", col_name="rk", partitions=8)
    got = {r["order_no"]: r["rk"] for r in ranked.collect()}
    assert got == {v: v + 1 for v in range(1000)}


def test_global_row_number_empty_and_single(spark):
    from crawlee_spark.operators.scheduler import global_row_number

    empty = spark.createDataFrame([], "order_no long")
    assert global_row_number(empty, "order_no").count() == 0
    one = spark.createDataFrame([(42,)], "order_no long")
    assert global_row_number(one, "order_no", col_name="rk").collect()[0]["rk"] == 1


def test_global_row_number_small_path_equivalent(spark):
    """The adaptive small-claim path (lazy narrow window) must produce the
    identical ranking as the two-phase path."""
    from crawlee_spark.operators.scheduler import global_row_number

    vals = [((i * 37) % 100,) for i in range(100)]  # unique, scrambled
    df = spark.createDataFrame(vals, "order_no long")
    two = {(r["order_no"], r["rk"]) for r in global_row_number(df, "order_no", col_name="rk").collect()}
    small = {
        (r["order_no"], r["rk"])
        for r in global_row_number(df, "order_no", col_name="rk", approx_rows=100).collect()
    }
    assert small == two
    assert small == {(v, v + 1) for v in range(100)}


def test_null_domain_hosts_are_budget_exempt_singletons(spark, tmp_store_dir):
    """Hosts with NO registrable domain (IPs, localhost, bare public
    suffixes) are not throttled by the per-domain budget — the reference's
    delayRequest bails when tldts getDomain is null
    (basic-crawler.ts:1560-1564). claim_round keys them by request_id, so
    each is its own singleton politeness group, while domained hosts keep
    their shared budget; the salted two-phase top-k must stay exact under
    the mixed keying."""
    urls = (
        [f"https://a.com/{i}" for i in range(10)]           # one shared domain
        + [f"https://10.0.0.{i}/p" for i in range(6)]       # IPs: no domain
        + ["https://localhost/x", "https://github.io/y"]    # single-label / bare suffix
    )
    store = frontier_with(spark, tmp_store_dir, urls)
    f = store.read()
    # sanity: the null-domain rows really have registrable_domain IS NULL
    assert f.filter(F.col("registrable_domain").isNull()).count() == 8
    pol = PolitenessPolicy(max_concurrency=100, per_host_cap=3, salt_buckets=4)
    claimed = claim_round(f, 1, pol).collect()
    by_host = {}
    for r in claimed:
        by_host.setdefault(r["host"], []).append(r["order_no"])
    # the domained host is budget-capped to 3 (head of the queue, in order)
    assert len(by_host["a.com"]) == 3
    assert sorted(by_host["a.com"]) == by_host["a.com"]
    # every null-domain request is claimed (budget-exempt singletons)
    null_hosts = {f"10.0.0.{i}" for i in range(6)} | {"localhost", "github.io"}
    assert null_hosts <= set(by_host)
    assert sum(len(v) for h, v in by_host.items() if h in null_hosts) == 8
    # global cap still applies over the union
    assert len(claimed) == 3 + 8
