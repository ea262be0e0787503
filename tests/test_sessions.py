"""Session pool: reputation lifecycle (session.ts:205-296 semantics)."""

import pytest
from pyspark.sql import functions as F

from crawlee_spark.operators.sessions import (
    SessionPolicy,
    assign_sessions,
    make_pool,
    replenish_pool,
    update_pool,
    usable_sessions,
)

POLICY = SessionPolicy(max_pool_size=8, max_error_score=3.0, error_score_decrement=0.5,
                       max_usage_count=5, max_age_rounds=10)


def test_assignment_deterministic_and_uniform(spark):
    pool = make_pool(spark, 8)
    claims = spark.createDataFrame([(f"rid{i}",) for i in range(200)], "request_id string")
    a1 = {r["request_id"]: r["session_id"] for r in assign_sessions(claims, pool, 1, POLICY).collect()}
    a2 = {r["request_id"]: r["session_id"] for r in assign_sessions(claims, pool, 1, POLICY).collect()}
    assert a1 == a2  # deterministic per (request, round)
    used = set(a1.values())
    assert len(used) == 8  # all sessions participate
    a3 = {r["request_id"]: r["session_id"] for r in assign_sessions(claims, pool, 2, POLICY).collect()}
    assert a3 != a1  # rotation varies by round


def test_update_pool_good_bad_retire(spark):
    pool = make_pool(spark, 3)
    sid = lambda i: f"session_r0_{i}"
    outcomes = spark.createDataFrame(
        [
            (sid(0), "success"),
            (sid(0), "success"),
            (sid(1), "fail"),
            (sid(1), "retry"),
            (sid(2), "session_retry"),  # blocked status → retire
        ],
        "session_id string, outcome string",
    )
    updated = {r["session_id"]: r for r in update_pool(pool, outcomes, POLICY).collect()}
    assert updated[sid(0)]["usage_count"] == 2
    assert updated[sid(0)]["error_score"] == 0.0  # markGood floors at 0
    assert updated[sid(1)]["error_score"] == 2.0  # two markBad
    assert not updated[sid(1)]["retired"]
    assert updated[sid(2)]["retired"]
    assert updated[sid(2)]["error_score"] >= POLICY.max_error_score


def test_error_score_decrement_on_recovery(spark):
    pool = make_pool(spark, 1)
    bad = spark.createDataFrame([("session_r0_0", "fail")] * 2, "session_id string, outcome string")
    pool = update_pool(pool, bad, POLICY)
    good = spark.createDataFrame([("session_r0_0", "success")], "session_id string, outcome string")
    row = update_pool(pool, good, POLICY).collect()[0]
    assert row["error_score"] == 1.5  # 2 - 0.5 (session.ts:242-250)


def test_usable_and_replenish(spark):
    pool = make_pool(spark, 8)
    # wear out one session, block another, age the whole pool past a round
    worn = spark.createDataFrame(
        [("session_r0_0", "success")] * 5 + [("session_r0_1", "fail")] * 3,
        "session_id string, outcome string",
    )
    pool = update_pool(pool, worn, POLICY)
    assert usable_sessions(pool, 1, POLICY).count() == 6
    topped = replenish_pool(spark, pool, 1, POLICY)
    assert usable_sessions(topped, 1, POLICY).count() == 8
    # expiry: everything from round 0 dies at round 10; replacements survive
    assert usable_sessions(topped, 10, POLICY).count() == 2


def test_engine_with_session_pool(spark, tmp_store_dir):
    """C6 end-to-end: blocked statuses retire sessions; pool replenishes."""
    from crawlee_spark.operators.engine import CrawlEngine, CrawlOptions
    from crawlee_spark.operators.frontier import FrontierStore
    from crawlee_spark.operators.scheduler import PolitenessPolicy
    from crawlee_spark.operators.sessions import SessionPolicy, usable_sessions

    pages = spark.createDataFrame(
        [
            ("https://a.com/ok", b"<html><body>fine</body></html>", 200),
            ("https://b.com/blocked", b"<html><body>denied</body></html>", 403),
        ],
        "url string, html binary, status_code int",
    )
    store = FrontierStore(spark, tmp_store_dir, num_partitions=2)
    policy = SessionPolicy(max_pool_size=4, max_usage_count=50, max_age_rounds=100)
    engine = CrawlEngine(
        spark, store, pages,
        policy=PolitenessPolicy(max_concurrency=10, per_host_cap=10),
        options=CrawlOptions(max_rounds=2),
        session_policy=policy,
    )
    engine.add_seeds(
        spark.createDataFrame([("https://a.com/ok",), ("https://b.com/blocked",)], "url string")
    )
    engine.run_round()
    outcomes = engine.outcomes().collect()
    assert all(r["session_id"] is not None for r in outcomes)
    pool = engine.session_pool()
    retired = pool.filter("retired").count()
    assert retired == 1  # the 403 retired its session
    assert usable_sessions(pool, 1, policy).count() == 4  # replenished back up
    # the retry of the blocked request gets a session again next round
    engine.run_round()
    assert engine.outcomes().filter("round_id = 2").count() >= 1


def test_cookie_jar_merge_rules(spark):
    """session.ts:341-345/365-375: Set-Cookie headers upsert the jar — per
    cookie name the latest response (order_col) wins, other names carry."""
    pool = make_pool(spark, 2)
    sid = lambda i: f"session_r0_{i}"
    outcomes = spark.createDataFrame(
        [
            (sid(0), "success", ["a=1; Path=/", "b=2"], 1),
            (sid(0), "success", ["a=9; HttpOnly", "malformed"], 2),  # a overridden
            (sid(1), "retry", ["tok=x"], 1),
        ],
        "session_id string, outcome string, set_cookie array<string>, ord long",
    )
    updated = update_pool(
        pool, outcomes, POLICY, cookie_col="set_cookie", order_col="ord"
    )
    jars = {r["session_id"]: dict(r["cookies"]) for r in updated.collect()}
    assert jars[sid(0)] == {"a": "9", "b": "2"}  # latest a wins; malformed dropped
    assert jars[sid(1)] == {"tok": "x"}

    # next round: new names merge in, untouched names persist
    outcomes2 = spark.createDataFrame(
        [(sid(0), "success", ["c=3"], 1)],
        "session_id string, outcome string, set_cookie array<string>, ord long",
    )
    updated2 = update_pool(
        updated, outcomes2, POLICY, cookie_col="set_cookie", order_col="ord"
    )
    jars2 = {r["session_id"]: dict(r["cookies"]) for r in updated2.collect()}
    assert jars2[sid(0)] == {"a": "9", "b": "2", "c": "3"}
    assert jars2[sid(1)] == {"tok": "x"}  # no updates this round → carried


def test_assign_sessions_carries_cookie_jar(spark):
    pool = make_pool(spark, 1)
    outcomes = spark.createDataFrame(
        [("session_r0_0", "success", ["k=v"], 1)],
        "session_id string, outcome string, set_cookie array<string>, ord long",
    )
    pool = update_pool(pool, outcomes, POLICY, cookie_col="set_cookie", order_col="ord")
    claims = spark.createDataFrame([("rid1",)], "request_id string")
    got = assign_sessions(claims, pool, 1, POLICY).collect()[0]
    assert dict(got["session_cookies"]) == {"k": "v"}


def test_engine_cookie_carryover_across_rounds(spark, tmp_store_dir):
    """Cookies set in round 1 survive _update_sessions and are still in the
    persisted pool after round 2 (pool parquet round-trip included)."""
    from crawlee_spark.operators.engine import CrawlEngine, CrawlOptions
    from crawlee_spark.operators.enqueue import EnqueueOptions
    from crawlee_spark.operators.frontier import FrontierStore
    from crawlee_spark.operators.scheduler import PolitenessPolicy

    pages = spark.createDataFrame(
        [
            ("https://c.com/a", b"<a href='/b'>b</a>", 200, "text/html", ["r1=a"]),
            ("https://c.com/b", b"<p>done</p>", 200, "text/html", ["r2=b"]),
        ],
        "url string, html binary, status_code int, content_type string, "
        "set_cookie array<string>",
    )
    store = FrontierStore(spark, tmp_store_dir, num_partitions=2)
    policy = SessionPolicy(max_pool_size=1, max_usage_count=50, max_age_rounds=100)
    engine = CrawlEngine(
        spark,
        store,
        pages,
        policy=PolitenessPolicy(max_concurrency=8, per_host_cap=8),
        options=CrawlOptions(max_rounds=4, enqueue=EnqueueOptions(strategy="all")),
        session_policy=policy,
    )
    engine.run(spark.createDataFrame([("https://c.com/a",)], "url string"))
    jars = {r["session_id"]: dict(r["cookies"] or {}) for r in engine.session_pool().collect()}
    merged = {}
    for j in jars.values():
        merged.update(j)
    assert merged == {"r1": "a", "r2": "b"}  # both rounds' cookies persisted
